"""MS Video 1 (CRAM) and MS-RLE — the two classic AVI codecs that are
not Motion-JPEG, closing most of the remaining '00dc' env gate
(``columns.avi_decoder``; r9 VERDICT What's-missing #3 residue:
"non-MJPEG AVI codecs").

MS Video 1, 16-bit RGB555 variant (fourcc CRAM/MSVC/WHAM,
``biBitCount=16``): the frame is a stream of 4x4 blocks ordered
bottom-up (BMP heritage), each coded as one of

- **skip run** — ``byte_b & 0xFC == 0x84``: ``((byte_b - 0x84) << 8) +
  byte_a`` blocks copied from the previous frame (temporal coding);
- **1-color** — ``byte_b >= 0x80`` otherwise: the word IS the RGB555
  color (bit 15 set by construction);
- **2-color** — ``byte_b < 0x80``: the word is a 16-bit LSB-first flag
  mask followed by two RGB555 words A, B; flag bit 1 -> A, 0 -> B
  (so bit 15 of the mask being 0 forces the last pixel to B — the
  encoder swaps A/B to satisfy it);
- **8-color** — like 2-color but color word A has bit 15 set: six more
  words follow, one (A, B) pair per 2x2 quadrant, quadrant index
  ``((y & 2) << 1) + (x & 2)``.

Within a block, pixels run bottom-up by row, left-to-right — the same
direction as the block stream.  RGB555 -> RGB888 uses the standard
``(c << 3) | (c >> 2)`` replication, which is an exact integer map a
SQL oracle can replay.

MS-RLE (``biCompression = 1``, 8-bit palettized): every frame is a
BI_RLE8 stream — byte-identical encoding to the BMP RLE8 path, so the
codec is :func:`pyrope_spark.multimodal.bmp_tiff._rle8_decode` applied
per frame plus a palette lookup from the ``strf`` color table.

Both are lossless over representable inputs (555-quantized colors with
<= 2 colors per quadrant; palette indices), so the PNG oracle
discipline applies (``queries.py::msvc_rle_video_stats``).
"""

from __future__ import annotations

import struct

import numpy as np

from pyrope_spark.multimodal.bmp_tiff import _rle8_decode, _rle8_encode

# --------------------------------------------------------------------------
# RGB555 <-> RGB888
# --------------------------------------------------------------------------


def rgb555_to_rgb888(v: np.ndarray) -> np.ndarray:
    """(..., ) uint16 RGB555 -> (..., 3) uint8 via 5->8 bit replication."""
    v = v.astype(np.uint16) & 0x7FFF
    out = np.empty(v.shape + (3,), dtype=np.uint8)
    for i, shift in enumerate((10, 5, 0)):
        c = (v >> shift) & 0x1F
        out[..., i] = ((c << 3) | (c >> 2)).astype(np.uint8)
    return out


def rgb888_to_rgb555(px: np.ndarray) -> np.ndarray:
    """(..., 3) uint8 -> (...) uint16 RGB555 by truncation (c >> 3)."""
    r = (px[..., 0].astype(np.uint16) >> 3) << 10
    g = (px[..., 1].astype(np.uint16) >> 3) << 5
    b = px[..., 2].astype(np.uint16) >> 3
    return r | g | b


# --------------------------------------------------------------------------
# MSVC-16 frame codec
# --------------------------------------------------------------------------


def _block_iter(h: int, w: int):
    """Blocks bottom-up, left-to-right; yields the slice of the TOP-DOWN
    array covering each block (rows reversed to the stream's order by
    the caller)."""
    for by in range(h // 4 - 1, -1, -1):
        for bx in range(w // 4):
            yield by, bx


def _pixel_order(block555: np.ndarray) -> np.ndarray:
    """(4, 4) block in top-down row order -> 16 values in the stream's
    bottom-up, left-to-right pixel order."""
    return block555[::-1].reshape(16)


def encode_msvc16_frame(
    frame555: np.ndarray, prev555: np.ndarray | None = None
) -> bytes:
    """(h, w) uint16 RGB555 -> one CRAM frame.  Blocks equal to
    ``prev555`` become skip runs; constant blocks 1-color; <= 2 distinct
    colors 2-color; <= 2 per 2x2 quadrant 8-color; anything else
    raises (this encoder is a lossless fixture writer, not an
    approximating compressor)."""
    h, w = frame555.shape
    if h % 4 or w % 4:
        raise ValueError("MSVC: dimensions must be multiples of 4")
    out = bytearray()
    skip = 0

    def flush_skip() -> None:
        nonlocal skip
        while skip > 0:
            run = min(skip, 0x3FF)
            out.append(run & 0xFF)
            out.append(0x84 + (run >> 8))
            skip -= run

    for by, bx in _block_iter(h, w):
        blk = frame555[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4]
        if prev555 is not None and np.array_equal(
            blk, prev555[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4]
        ):
            skip += 1
            continue
        flush_skip()
        px = _pixel_order(blk)
        uniq = np.unique(px)
        if len(uniq) == 1:
            v = int(uniq[0])
            word = 0x8000 | v
            if ((word >> 8) & 0xFC) == 0x84:
                # color collides with the skip-code space: emit as a
                # degenerate 2-color block instead (flags 0 -> all B)
                out += struct.pack("<HHH", 0x0000, v, v)
            else:
                out += struct.pack("<H", word)
            continue
        if len(uniq) == 2:
            a, b = int(uniq[0]), int(uniq[1])
            # bit 15 of the mask must be 0 (byte_b < 0x80): the LAST
            # pixel in stream order has to map to B (flag 0)
            if px[15] == a:
                a, b = b, a
            flags = 0
            for i in range(16):
                if px[i] == a:
                    flags |= 1 << i
            out += struct.pack("<HHH", flags, a, b)
            continue
        # 8-color: one (A, B) pair per 2x2 quadrant of the top-down block
        pairs = []
        ok = True
        for qy in (0, 2):
            for qx in (0, 2):
                quad = blk[qy : qy + 2, qx : qx + 2].reshape(4)
                u = np.unique(quad)
                if len(u) > 2:
                    ok = False
                pairs.append((int(u[0]), int(u[-1])))
        if not ok:
            raise ValueError(
                "MSVC fixture encoder: block needs > 2 colors per quadrant"
            )
        # quadrant index of a pixel (stream order) = ((y & 2) << 1) + (x & 2)
        # with y counted in the BLOCK's bottom-up order
        flags = 0
        colors = [0] * 8
        bott = blk[::-1]  # stream-order rows
        for i in range(16):
            y, x = i // 4, i % 4
            # quadrant in top-down coords: stream y -> top-down 3 - y
            q = (((3 - y) & 2) << 1) + (x & 2)
            qi = {0: 0, 2: 1, 4: 2, 6: 3}[q]
            a, b = pairs[qi]
            if int(bott[y, x]) == a and a != b:
                flags |= 1 << i
            colors[q] = a
            colors[q + 1] = b
        if flags & 0x8000:
            # swap that quadrant's pair so the last pixel carries flag 0
            y, x = 3, 3
            q = (((3 - y) & 2) << 1) + (x & 2)
            colors[q], colors[q + 1] = colors[q + 1], colors[q]
            inv = 0
            for i in range(16):
                yy, xx = i // 4, i % 4
                if ((((3 - yy) & 2) << 1) + (xx & 2)) == q:
                    inv |= 1 << i
            flags ^= inv
        colors[0] |= 0x8000  # 8-color marker
        out += struct.pack("<H", flags & 0x7FFF)
        out += struct.pack("<8H", *colors)
    flush_skip()
    return bytes(out)


def decode_msvc16_frame(
    data: bytes, h: int, w: int, prev555: np.ndarray | None = None
) -> np.ndarray:
    """One CRAM frame -> (h, w) uint16 RGB555 (top-down row order)."""
    if h % 4 or w % 4:
        raise ValueError("MSVC: dimensions must be multiples of 4")
    out = (
        prev555.copy()
        if prev555 is not None
        else np.zeros((h, w), dtype=np.uint16)
    )
    pos = 0
    skip = 0
    blocks = list(_block_iter(h, w))
    bi = 0
    n = len(data)
    while bi < len(blocks):
        by, bx = blocks[bi]
        if skip > 0:
            skip -= 1
            bi += 1
            continue
        if pos + 2 > n:
            break  # EOF: remaining blocks keep previous content
        byte_a, byte_b = data[pos], data[pos + 1]
        pos += 2
        # NB: a 0x0000 word here is a legal 2-color flags word, NOT an
        # EOF marker — EOF only exists past the last block (ffmpeg's
        # total_blocks==0 guard), which this loop never reads
        if (byte_b & 0xFC) == 0x84:
            skip = ((byte_b - 0x84) << 8) + byte_a
            continue  # the skip count INCLUDES this block
        ys = slice(by * 4, by * 4 + 4)
        xs = slice(bx * 4, bx * 4 + 4)
        if byte_b >= 0x80:  # 1-color
            out[ys, xs] = ((byte_b << 8) | byte_a) & 0x7FFF
            bi += 1
            continue
        flags = (byte_b << 8) | byte_a
        (a,) = struct.unpack_from("<H", data, pos)
        pos += 2
        blk = np.empty((4, 4), dtype=np.uint16)  # stream-order rows
        if a & 0x8000:  # 8-color
            rest = struct.unpack_from("<7H", data, pos)
            pos += 14
            colors = [a & 0x7FFF, *rest]
            for i in range(16):
                y, x = i // 4, i % 4
                q = (((3 - y) & 2) << 1) + (x & 2)
                blk[y, x] = colors[q + (0 if (flags >> i) & 1 else 1)] & 0x7FFF
        else:  # 2-color
            (b,) = struct.unpack_from("<H", data, pos)
            pos += 2
            for i in range(16):
                blk[i // 4, i % 4] = a if (flags >> i) & 1 else b
        out[ys, xs] = blk[::-1]  # back to top-down
        bi += 1
    return out


# --------------------------------------------------------------------------
# AVI writers (strh/strf-carrying twins of raw_avi_bytes)
# --------------------------------------------------------------------------


def _avi_wrap(
    w: int,
    h: int,
    n: int,
    fps: int,
    fourcc: bytes,
    bitcount: int,
    compression: bytes | int,
    frame_chunks: list[bytes],
    palette: bytes = b"",
) -> bytes:
    usec = 1_000_000 // fps
    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<14I", usec, 0, 0, 0x10, n, 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh_body = (
        b"vids"
        + fourcc
        + struct.pack("<IHH", 0, 0, 0)  # flags, priority, language
        # initial, scale, rate, start, length, sugg. buffer, quality, sample
        + struct.pack("<8I", 0, 1, fps, 0, n, 0, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)  # rcFrame
    )
    strh = b"strh" + struct.pack("<I", len(strh_body)) + strh_body
    comp = (
        struct.pack("<I", compression)
        if isinstance(compression, int)
        else compression
    )
    bmih = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, bitcount, comp, 0, 0, 0,
        len(palette) // 4, 0,
    )
    strf = b"strf" + struct.pack("<I", 40 + len(palette)) + bmih + palette
    strl_body = b"strl" + strh + strf
    strl = b"LIST" + struct.pack("<I", len(strl_body)) + strl_body
    hdrl_body = b"hdrl" + avih + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    parts = []
    for fb in frame_chunks:
        parts.append(b"00dc" + struct.pack("<I", len(fb)) + fb)
        if len(fb) & 1:
            parts.append(b"\x00")
    movi_body = b"movi" + b"".join(parts)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def msvc_avi_bytes(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 frames -> MS Video 1 AVI (fourcc CRAM, 16-bit).
    Colors are 555-quantized by the codec; feed 555-representable pixels
    (``rgb555_to_rgb888(rgb888_to_rgb555(px))``) for lossless trips."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, _ = f.shape
    chunks = []
    prev = None
    for i in range(n):
        cur = rgb888_to_rgb555(f[i])
        chunks.append(encode_msvc16_frame(cur, prev))
        prev = cur
    return _avi_wrap(w, h, n, fps, b"CRAM", 16, b"CRAM", chunks)


def msrle_avi_bytes(
    indices: np.ndarray, palette: np.ndarray, fps: int = 10
) -> bytes:
    """(n, h, w) uint8 palette indices + (m, 3) palette -> MS-RLE AVI
    (biCompression = 1); every frame a full BI_RLE8 keyframe."""
    idx = np.ascontiguousarray(indices, dtype=np.uint8)
    n, h, w = idx.shape
    pal = np.zeros((256, 4), dtype=np.uint8)
    pal[: len(palette), 0] = palette[:, 2]  # strf palette is BGRX
    pal[: len(palette), 1] = palette[:, 1]
    pal[: len(palette), 2] = palette[:, 0]
    chunks = [_rle8_encode(idx[i]) for i in range(n)]
    return _avi_wrap(w, h, n, fps, b"MRLE", 8, 1, chunks, pal.tobytes())
