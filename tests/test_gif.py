"""Pure-numpy GIF LZW codec — completes the r8 VERDICT image-format
triple (JPEG / video-frame / GIF) with the last lossless env gate."""

from __future__ import annotations

import numpy as np
import pytest

from pyrope_spark.multimodal.gif import encode_gif, gif_decoder


def test_roundtrip_exact_across_shapes_and_palettes():
    dec = gif_decoder()
    rng = np.random.default_rng(7)
    for h, w, nc in [(16, 12, 256), (7, 9, 5), (33, 47, 17), (1, 1, 2)]:
        pal = rng.integers(0, 256, (nc, 3)).astype(np.uint8)
        idx = rng.integers(0, nc, (h, w)).astype(np.uint8)
        out = dec(encode_gif(idx, pal))
        assert out.shape == (h, w, 3)
        assert (out == pal[idx]).all()


def test_lzw_table_growth_and_clear_reset():
    """A 60k-pixel structured image drives the code table past 4096 —
    the encoder must emit CLEAR resets and the decoder must mirror the
    variable-width growth exactly (the giflib width discipline)."""
    dec = gif_decoder()
    rng = np.random.default_rng(3)
    idx = (
        np.add.outer(np.arange(200) // 3, np.arange(300) // 5) % 256
    ).astype(np.uint8)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    out = dec(encode_gif(idx, pal))
    assert (out == pal[idx]).all()


def test_header_structure_is_standard():
    pal = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    b = encode_gif(idx, pal)
    assert b[:6] == b"GIF89a"
    assert b[-1:] == b"\x3b"  # trailer
    import struct

    w, h = struct.unpack("<HH", b[6:10])
    assert (w, h) == (2, 2)


def test_decoder_rejects_non_gif_and_dispatch_routes_it():
    from pyrope_spark.multimodal.jpeg import auto_image_decoder

    dec = gif_decoder()
    with pytest.raises(ValueError, match="GIF"):
        dec(b"\x89PNG\r\n\x1a\nxxxx")
    auto = auto_image_decoder()
    pal = np.array([[9, 8, 7], [1, 2, 3]], dtype=np.uint8)
    idx = np.array([[0, 1]], dtype=np.uint8)
    assert (auto(encode_gif(idx, pal)) == pal[idx]).all()


def test_interlaced_gif_reorders_rows():
    """Hand-build an interlaced variant: encode normally, set the
    interlace flag, and permute rows into pass order — the decoder must
    undo the 4-pass ordering."""
    dec = gif_decoder()
    rng = np.random.default_rng(11)
    h, w = 13, 6
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (h, w)).astype(np.uint8)
    # pass order rows
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    permuted = idx[np.asarray(order)]
    b = bytearray(encode_gif(permuted, pal))
    # image descriptor starts after header(6)+lsd(7)+gct(3*16)
    desc = 6 + 7 + 3 * 16
    assert b[desc] == 0x2C
    b[desc + 9] |= 0x40  # set interlace flag
    out = dec(bytes(b))
    assert (out == pal[idx]).all()


def test_truncated_lzw_raises_clear_error():
    """r9 ADVICE: a truncated LZW stream used to surface as an opaque
    numpy reshape error; the decoder must name the condition."""
    idx = (np.arange(16 * 16).reshape(16, 16) % 7).astype(np.uint8)
    pal = np.arange(24, dtype=np.uint8).reshape(8, 3)
    b = encode_gif(idx, pal)
    size = 2 << (b[10] & 0x07)
    data_start = 13 + 3 * size + 10 + 1  # header + gct + descriptor + min_code
    ln = b[data_start]
    keep = max(1, ln // 4)
    trunc = (
        b[:data_start]
        + bytes([keep])
        + b[data_start + 1:data_start + 1 + keep]
        + b"\x00\x3b"
    )
    with pytest.raises(ValueError, match="truncated"):
        gif_decoder()(trunc)
