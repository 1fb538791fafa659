"""Pure-numpy BMP and baseline-TIFF codecs — the last two image magics
that previously required the Pillow gate (r9 VERDICT What's-missing #3
residue: ``auto_image_decoder``'s unknown-magic fallback)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyrope_spark.multimodal.bmp_tiff import (
    _packbits_decode,
    _packbits_encode,
    _tiff_lzw_decode,
    _tiff_lzw_encode,
    bmp_decoder,
    encode_bmp,
    encode_tiff,
    tiff_decoder,
)


def _rgb(h, w, seed=7):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    ).astype(np.uint8)


def _gray(h, w, seed=11):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w), dtype=np.uint8
    ).astype(np.uint8)


# --------------------------------------------------------------------------
# LZW / PackBits primitives
# --------------------------------------------------------------------------


def test_tiff_lzw_roundtrip_widths_and_clear():
    """50k random bytes push NextCode through the 511/1023/2047 early-
    change boundaries AND past the 4094 CLEAR reset; 10k constant bytes
    exercise the KwKwK deferred-entry path densely."""
    rng = np.random.default_rng(3)
    for data in (
        b"",
        b"A",
        b"ABABABA" * 5,
        bytes(rng.integers(0, 256, 50_000, dtype=np.uint8)),
        bytes(np.tile(np.arange(256, dtype=np.uint8), 300)),
        b"\x00" * 10_000,
    ):
        assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data


def test_tiff_lzw_truncation_raises():
    enc = _tiff_lzw_encode(b"hello world" * 10)
    with pytest.raises(ValueError, match="truncated LZW"):
        _tiff_lzw_decode(enc[: len(enc) // 2], 110)


def test_packbits_roundtrip_and_truncation():
    rng = np.random.default_rng(5)
    for data in (
        b"",
        b"A",
        b"AAAA",
        b"ABCD",
        b"AAABBBCCCD" * 50,
        bytes(rng.integers(0, 4, 1000, dtype=np.uint8)),
        b"AB" + b"C" * 200 + b"DE",  # >128 run splits
    ):
        assert _packbits_decode(_packbits_encode(data), len(data)) == data
    with pytest.raises(ValueError, match="truncated PackBits"):
        _packbits_decode(_packbits_encode(b"X" * 300)[:1], 300)


# --------------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------------


def test_bmp_roundtrip_rgb_gray_rle8():
    dec = bmp_decoder()
    for h, w in [(17, 13), (8, 8), (1, 5), (5, 1)]:
        rgb = _rgb(h, w, seed=h * 100 + w)
        assert np.array_equal(dec(encode_bmp(rgb)), rgb)
        gray = _gray(h, w, seed=h * 100 + w + 1)
        g3 = np.repeat(gray[:, :, None], 3, axis=2)
        assert np.array_equal(dec(encode_bmp(gray)), g3)
        assert np.array_equal(dec(encode_bmp(gray, rle=True)), g3)


def test_bmp_row_padding_is_honored():
    # w=13 -> 39-byte rows pad to 40; a wrong stride shears the image
    rgb = _rgb(5, 13)
    assert np.array_equal(bmp_decoder()(encode_bmp(rgb)), rgb)


def test_bmp_top_down_and_32bit():
    """Hand-built BGRX top-down BMP (negative height, 32-bit) — shapes
    the encoder never emits but real corpora contain."""
    h, w = 3, 2
    rgb = _rgb(h, w, seed=42)
    bgrx = np.zeros((h, w, 4), dtype=np.uint8)
    bgrx[:, :, :3] = rgb[:, :, ::-1]  # top-down: no row flip
    data = bgrx.tobytes()
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(data), 2835, 2835, 0, 0
    )
    head = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    out = bmp_decoder()(head + info + data)
    assert np.array_equal(out, rgb)


def test_bmp_rle8_absolute_and_delta_modes():
    """The encoder only emits runs; decode a hand-built stream using
    absolute mode (word-aligned literals) and a delta escape."""
    h, w = 2, 6
    # bottom-up: first encoded row is image row 1 (the last array row)
    stream = (
        b"\x03\x07"  # run: 3x index 7
        + b"\x00\x03\x01\x02\x03\x00"  # absolute: 3 literals + pad byte
        + b"\x00\x00"  # end of line
        + b"\x02\x09"  # run: 2x index 9
        + b"\x00\x02\x02\x00"  # delta: skip +2 x (stay on row)
        + b"\x02\x05"  # run: 2x index 5 -> lands at x=4..5
        + b"\x00\x01"  # end of bitmap
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(stream), 0, 0, 256, 0
    )
    pal = bytes(b for v in range(256) for b in (v, v, v, 0))
    off = 14 + 40 + len(pal)
    head = struct.pack("<2sIHHI", b"BM", off + len(stream), 0, 0, off)
    out = bmp_decoder()(head + info + pal + stream)
    want_bottom = np.array([7, 7, 7, 1, 2, 3], dtype=np.uint8)
    want_top = np.array([9, 9, 0, 0, 5, 5], dtype=np.uint8)
    assert np.array_equal(out[1, :, 0], want_bottom)
    assert np.array_equal(out[0, :, 0], want_top)


def test_bmp_rle8_malformed_raises_named_errors():
    from pyrope_spark.multimodal.bmp_tiff import _rle8_decode

    with pytest.raises(ValueError, match="exceeds bitmap bounds"):
        _rle8_decode(b"\xff\x07\x00\x01", 2, 6)  # 255-run into a 6-wide row
    with pytest.raises(ValueError, match="exceeds bitmap bounds"):
        _rle8_decode(b"\x00\x09\x01\x02", 1, 4)  # absolute 9 into 4-wide


def test_bmp_rejects_exotics():
    dec = bmp_decoder()
    with pytest.raises(ValueError, match="bad magic"):
        dec(b"XX" + b"\x00" * 60)
    payload = bytearray(encode_bmp(_rgb(4, 4)))
    payload[28] = 16  # biBitCount -> 16-bit
    with pytest.raises(ValueError, match="16-bit"):
        dec(bytes(payload))


# --------------------------------------------------------------------------
# TIFF
# --------------------------------------------------------------------------


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("bo", ["II", "MM"])
def test_tiff_roundtrip_matrix(comp, bo):
    dec = tiff_decoder()
    rgb = _rgb(17, 13)
    gray = _gray(17, 13)
    g3 = np.repeat(gray[:, :, None], 3, axis=2)
    for rps in (None, 5):
        assert np.array_equal(
            dec(encode_tiff(rgb, compression=comp, byteorder=bo,
                            rows_per_strip=rps)),
            rgb,
        )
        assert np.array_equal(
            dec(encode_tiff(gray, compression=comp, byteorder=bo,
                            rows_per_strip=rps)),
            g3,
        )


@pytest.mark.parametrize("comp", ["packbits", "lzw"])
def test_tiff_predictor2(comp):
    """Horizontal differencing rides on top of the compression and must
    be undone per-strip with a per-sample cumulative sum."""
    dec = tiff_decoder()
    smooth = (np.arange(64)[:, None] + np.arange(96)[None, :]).astype(
        np.uint8
    )
    assert np.array_equal(
        dec(encode_tiff(smooth, compression=comp, predictor=2,
                        rows_per_strip=7)),
        np.repeat(smooth[:, :, None], 3, axis=2),
    )
    rgb = _rgb(20, 30)
    assert np.array_equal(
        dec(encode_tiff(rgb, compression=comp, predictor=2)), rgb
    )


def test_tiff_lzw_width_growth_inside_container():
    big = _rgb(64, 96, seed=1)
    assert np.array_equal(
        tiff_decoder()(encode_tiff(big, compression="lzw")), big
    )


def _patch_tag_short(payload: bytes, tag: int, new_value: int) -> bytes:
    """Rewrite an inline SHORT IFD value (test helper for photometric
    variants the encoder does not emit)."""
    bo = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    (n,) = struct.unpack_from(bo + "H", payload, ifd_off)
    buf = bytearray(payload)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        (t,) = struct.unpack_from(bo + "H", payload, base)
        if t == tag:
            struct.pack_into(bo + "H", buf, base + 8, new_value)
            return bytes(buf)
    raise AssertionError(f"tag {tag} not present")


def test_tiff_white_is_zero_inverts():
    gray = _gray(9, 9)
    enc = _patch_tag_short(encode_tiff(gray), 262, 0)
    out = tiff_decoder()(enc)
    assert np.array_equal(out, np.repeat((255 - gray)[:, :, None], 3, 2))


def test_tiff_palette_colormap():
    """Hand-built photometric-3 TIFF: indices resolve through the
    16-bit ColorMap (high byte)."""
    gray = (np.arange(12, dtype=np.uint8) % 5).reshape(3, 4)
    enc = bytearray(_patch_tag_short(encode_tiff(gray), 262, 3))
    # append a ColorMap tag: 3*256 SHORTs after the IFD, then splice the
    # entry into the IFD (entries must stay tag-sorted; 320 is max here)
    bo = "<"
    (ifd_off,) = struct.unpack_from(bo + "I", enc, 4)
    (n,) = struct.unpack_from(bo + "H", enc, ifd_off)
    rng = np.random.default_rng(9)
    cmap16 = rng.integers(0, 65536, (3, 256), dtype=np.uint16)
    # the 12-byte IFD entry inserted below shifts everything after the
    # IFD — including the colormap we are appending at the current end
    cmap_off = len(enc) + 12
    enc += cmap16.astype("<u2").tobytes()
    entry = struct.pack(bo + "HHII", 320, 3, 768, cmap_off)
    insert_at = ifd_off + 2 + 12 * n  # after the last (lower-tag) entry
    enc[insert_at:insert_at] = entry
    struct.pack_into(bo + "H", enc, ifd_off, n + 1)
    out = tiff_decoder()(bytes(enc))
    pal = (cmap16.T >> 8).astype(np.uint8)
    assert np.array_equal(out, pal[gray])


def test_tiff_rejects_exotics():
    dec = tiff_decoder()
    with pytest.raises(ValueError, match="bad magic"):
        dec(b"XXXX" + b"\x00" * 20)
    gray = _gray(6, 6)
    with pytest.raises(ValueError, match="planar"):
        dec(_patch_tag_short(encode_tiff(gray), 284, 2))
    with pytest.raises(ValueError, match="8-bit"):
        dec(_patch_tag_short(encode_tiff(gray), 258, 16))
    with pytest.raises(ValueError):
        encode_tiff(gray, compression="none", predictor=2)


# --------------------------------------------------------------------------
# auto dispatch
# --------------------------------------------------------------------------


def test_auto_image_decoder_routes_bmp_and_tiff():
    from pyrope_spark.multimodal.jpeg import auto_image_decoder

    dec = auto_image_decoder()
    rgb = _rgb(10, 14, seed=23)
    assert np.array_equal(dec(encode_bmp(rgb)), rgb)
    assert np.array_equal(dec(encode_tiff(rgb, compression="lzw")), rgb)
    assert np.array_equal(
        dec(encode_tiff(rgb, byteorder="MM", compression="packbits")), rgb
    )
