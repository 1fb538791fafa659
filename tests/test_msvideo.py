"""MS Video 1 (CRAM) + MS-RLE AVI codecs — the non-MJPEG '00dc' paths
(r9 VERDICT What's-missing #3 residue)."""

from __future__ import annotations

import numpy as np
import pytest

from pyrope_spark.multimodal.columns import avi_decoder
from pyrope_spark.multimodal.msvideo import (
    decode_msvc16_frame,
    encode_msvc16_frame,
    msrle_avi_bytes,
    msvc_avi_bytes,
    rgb555_to_rgb888,
    rgb888_to_rgb555,
)


def _mixed_kind_frame(h=12, w=16, salt=0):
    """One frame exercising all three intra codes: constant blocks,
    2-color checkers, 8-color quadrant blocks."""
    f = np.zeros((h, w), dtype=np.uint16)
    for by in range(h // 4):
        for bx in range(w // 4):
            kind = (by + bx) % 3
            ys, xs = slice(by * 4, by * 4 + 4), slice(bx * 4, bx * 4 + 4)
            if kind == 0:
                f[ys, xs] = (salt * 19 + by * 7 + bx * 5) % 0x8000
            elif kind == 1:
                a = (salt * 23 + by * 31 + bx * 17) % 0x8000
                b = (salt * 29 + by * 13 + bx * 29 + 1) % 0x8000
                chk = np.indices((4, 4)).sum(axis=0) % 2
                f[ys, xs] = np.where(chk == 0, a, b)
            else:
                for qy in (0, 2):
                    for qx in (0, 2):
                        a = (salt + by * 3 + bx * 5 + qy * 7 + qx * 11) % 0x8000
                        b = (salt * 2 + by * 5 + bx * 7 + qy * 11 + qx * 13 + 3) % 0x8000
                        f[by * 4 + qy : by * 4 + qy + 2,
                          bx * 4 + qx : bx * 4 + qx + 2] = [[a, b], [b, a]]
    return f


def test_msvc_frame_roundtrip_all_block_kinds():
    for salt in (0, 1, 7):
        f = _mixed_kind_frame(salt=salt)
        assert np.array_equal(decode_msvc16_frame(encode_msvc16_frame(f), 12, 16), f)


def test_msvc_skip_blocks_compress_and_roundtrip():
    f0 = _mixed_kind_frame()
    f1 = f0.copy()
    f1[0:4, 0:4] = 0x0123  # one block changes; 11 skip
    enc_full = encode_msvc16_frame(f1)
    enc_delta = encode_msvc16_frame(f1, f0)
    assert len(enc_delta) < len(enc_full) // 4
    assert np.array_equal(decode_msvc16_frame(enc_delta, 12, 16, f0), f1)


def test_msvc_skip_run_longer_than_0x3ff():
    """A 64x256 frame pair differing only in the LAST block forces a
    skip run > 1023 blocks, split across multiple skip codes."""
    h, w = 64, 256
    f0 = np.full((h, w), 0x0101, dtype=np.uint16)
    f1 = f0.copy()
    f1[-4:, -4:] = 0x0202
    enc = encode_msvc16_frame(f1, f0)
    assert np.array_equal(decode_msvc16_frame(enc, h, w, f0), f1)


def test_msvc_skip_code_color_collision_falls_back():
    """1-color values whose high byte lands in 0x84-0x87 after the
    0x8000 marker would read as skip codes; the encoder must emit them
    as degenerate 2-color blocks."""
    for v in (0x0400, 0x0456, 0x07FF):
        f = np.full((4, 4), v, dtype=np.uint16)
        assert np.array_equal(decode_msvc16_frame(encode_msvc16_frame(f), 4, 4), f)


def test_msvc_encoder_rejects_unrepresentable_and_bad_dims():
    rng = np.random.default_rng(3)
    with pytest.raises(ValueError, match="quadrant"):
        encode_msvc16_frame(
            rng.integers(0, 0x8000, (8, 8), dtype=np.uint16).astype(np.uint16)
        )
    with pytest.raises(ValueError, match="multiples of 4"):
        encode_msvc16_frame(np.zeros((6, 8), dtype=np.uint16))


def test_rgb555_scale_is_exact_and_invertible():
    v = np.arange(0x8000, dtype=np.uint16)
    px = rgb555_to_rgb888(v)
    assert np.array_equal(rgb888_to_rgb555(px), v)
    c = np.arange(32)
    assert np.array_equal(
        np.unique(px), np.unique(((c << 3) | (c >> 2)).astype(np.uint8))
    )


def test_msvc_avi_container_roundtrip():
    f0, f1 = _mixed_kind_frame(), _mixed_kind_frame(salt=5)
    frames = np.stack([rgb555_to_rgb888(f0), rgb555_to_rgb888(f1)])
    out, fps = avi_decoder()(msvc_avi_bytes(frames, fps=10))
    assert fps == 10
    assert np.array_equal(out, frames)


def test_msrle_avi_container_roundtrip():
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 16, (3, 8, 12), dtype=np.uint8).astype(np.uint8)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8).astype(np.uint8)
    out, fps = avi_decoder()(msrle_avi_bytes(idx, pal, fps=5))
    assert fps == 5
    assert np.array_equal(out, pal[idx])


def test_unknown_codec_still_gated():
    """An AVI with an unrecognized fourcc must raise the named env
    gate, not silently misdecode."""
    import struct

    from pyrope_spark.multimodal.msvideo import _avi_wrap

    avi = _avi_wrap(8, 8, 1, 10, b"XVID", 24, b"XVID", [b"\x00" * 16])
    with pytest.raises(NotImplementedError, match="XVID"):
        avi_decoder()(avi)


def test_mjpeg_and_raw_profiles_unaffected():
    from pyrope_spark.multimodal.columns import mjpeg_avi_bytes, raw_avi_bytes

    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8).astype(np.uint8)
    out, fps = avi_decoder()(raw_avi_bytes(frames, fps=10))
    assert np.array_equal(out, frames)
    out2, _ = avi_decoder()(mjpeg_avi_bytes(frames, fps=10, quality=90))
    assert out2.shape == frames.shape  # lossy: shape + plumbing check
