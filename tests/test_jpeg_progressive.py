"""Progressive JPEG (SOF2) codec tests.

The load-bearing property: progressive entropy coding is LOSSLESS over
the quantized coefficients, so decode(encode_progressive(img)) must be
pixel-IDENTICAL to decode(encode_jpeg(img)) at the same quant tables —
any scan-script / successive-approximation / EOB-run / correction-bit
bug breaks exact equality somewhere in the parametrized content grid.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyrope_spark.multimodal.jpeg import encode_jpeg, jpeg_decoder
from pyrope_spark.multimodal.jpeg_progressive import (
    decode_progressive,
    encode_jpeg_progressive,
)


def _smooth(rng, h, w, ch=None, scale=4.0, base=128.0):
    shape = (h, w) if ch is None else (h, w, ch)
    a = rng.standard_normal(shape).cumsum(0).cumsum(1) * scale + base
    return np.clip(a, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("quality", [30, 50, 75, 90])
def test_gray_matches_baseline(quality):
    rng = np.random.default_rng(quality)
    img = _smooth(rng, 24, 40)
    dec = jpeg_decoder()
    assert np.array_equal(
        dec(encode_jpeg(img, quality=quality)),
        dec(encode_jpeg_progressive(img, quality=quality)),
    )


@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("dims", [(16, 16), (37, 53), (64, 96)])
def test_color_matches_baseline(subsampling, dims):
    rng = np.random.default_rng(dims[0] * 100 + dims[1])
    img = _smooth(rng, dims[0], dims[1], 3)
    dec = jpeg_decoder()
    assert np.array_equal(
        dec(encode_jpeg(img, quality=60, subsampling=subsampling)),
        dec(encode_jpeg_progressive(img, quality=60,
                                    subsampling=subsampling)),
    )


def test_noise_forces_zrl_eobrun_and_corrections():
    # full-range noise at q90 populates high-frequency coefficients ->
    # ZRL runs, multi-block EOB runs, and refinement correction bits all
    # fire; exact equality proves every path
    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (64, 96, 3)).astype(np.uint8)
    dec = jpeg_decoder()
    assert np.array_equal(
        dec(encode_jpeg(img, quality=90, subsampling="444")),
        dec(encode_jpeg_progressive(img, quality=90, subsampling="444")),
    )


def test_flat_image_eob_runs():
    img = np.full((40, 40), 137, np.uint8)
    dec = jpeg_decoder()
    assert np.array_equal(
        dec(encode_jpeg(img, quality=50)),
        dec(encode_jpeg_progressive(img, quality=50)),
    )


def test_block_constant_closed_form():
    # the oracle query's discipline: q00=16 makes constant blocks
    # integer-exact through the lossy pipeline
    px = np.zeros((16, 16), dtype=np.uint8)
    vals = [[130, 200], [255, 129]]
    for by in range(2):
        for bx in range(2):
            px[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = vals[by][bx]
    out = decode_progressive(encode_jpeg_progressive(px, quality=50))
    for by in range(2):
        for bx in range(2):
            v = vals[by][bx]
            want = min(255, 128 + 2 * ((v - 127) // 2))
            got = out[by * 8 + 4, bx * 8 + 4, 0]
            assert got == want, (v, got, want)


def test_decode_progressive_rejects_baseline():
    img = np.full((16, 16), 90, np.uint8)
    with pytest.raises(ValueError, match="SOF2"):
        decode_progressive(encode_jpeg(img, quality=50))


def test_auto_decoder_routes_progressive():
    from pyrope_spark.multimodal.jpeg import auto_image_decoder

    rng = np.random.default_rng(5)
    img = _smooth(rng, 24, 24, 3)
    payload = encode_jpeg_progressive(img, quality=70)
    auto = auto_image_decoder()
    assert np.array_equal(auto(payload), jpeg_decoder()(payload))


def test_sof2_magic_present():
    img = np.full((8, 8), 100, np.uint8)
    b = encode_jpeg_progressive(img)
    assert b"\xff\xc2" in b and b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
