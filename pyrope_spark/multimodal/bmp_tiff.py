"""Pure-numpy BMP and baseline-TIFF codecs — the last two image magics
that previously fell through ``auto_image_decoder`` to the Pillow gate.

A real crawl corpus carries BMP and TIFF alongside PNG/JPEG/GIF
(reference ingest accepts arbitrary binary payloads; see
``src/Pyrope.Core/Payloads`` parity notes in SURVEY §2.1 S4).  Both
formats are lossless containers over integer samples, so the PNG oracle
discipline applies verbatim: pixels are a pure integer function of
doc_id, encoded into genuine compressed bytes executor-side, decoded
back through ``decode_image``'s ``mapInPandas`` plumbing, and DuckDB
verifies the stats straight from the generating formula
(``queries.py::bmp_tiff_codec_roundtrip``).

- :func:`encode_bmp` / :func:`bmp_decoder` — BITMAPFILEHEADER +
  BITMAPINFOHEADER; 24-bit ``BI_RGB`` (bottom-up BGR, 4-byte row pad),
  8-bit paletted, 32-bit BGRX, top-down (negative height), and ``BI_RLE8``
  run-length (encoded runs, absolute mode, EOL/EOB/delta escapes).
- :func:`encode_tiff` / :func:`tiff_decoder` — baseline TIFF 6.0, both
  byte orders (II/MM), multi-strip, Compression 1 (none), 32773
  (PackBits) and 5 (LZW — MSB-first variable-width codes with the
  libtiff "early change" width bump), horizontal-differencing
  Predictor 2, Photometric 0 (WhiteIsZero), 1 (BlackIsZero), 2 (RGB)
  and 3 (palette via 16-bit ColorMap).

Scale shape: per-payload codecs inside Arrow ``mapInPandas`` batches —
embarrassingly parallel, no shuffle, no driver involvement.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------------


def encode_bmp(px: np.ndarray, *, rle: bool = False) -> bytes:
    """REAL .bmp bytes.  ``px`` is (h, w, 3) uint8 RGB -> 24-bit BI_RGB,
    or (h, w) uint8 -> 8-bit paletted grayscale (identity palette),
    RLE8-compressed when ``rle=True`` (8-bit only)."""
    if px.dtype != np.uint8:
        raise ValueError("encode_bmp expects uint8 pixels")
    if px.ndim == 3 and px.shape[2] == 3:
        if rle:
            raise ValueError("BI_RLE8 applies to 8-bit data only")
        h, w, _ = px.shape
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
        data = rows.tobytes()
        bpp, ncolors, palette, compression = 24, 0, b"", 0
    elif px.ndim == 2:
        h, w = px.shape
        palette = bytes(
            b for v in range(256) for b in (v, v, v, 0)
        )  # BGRX identity-gray
        ncolors, bpp = 256, 8
        if rle:
            data = _rle8_encode(px)
            compression = 1  # BI_RLE8
        else:
            stride = (w + 3) & ~3
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, :w] = px[::-1]
            data = rows.tobytes()
            compression = 0
    else:
        raise ValueError("encode_bmp expects (h, w, 3) RGB or (h, w) gray")
    offset = 14 + 40 + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, compression, len(data),
        2835, 2835, ncolors, 0,
    )
    head = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    return head + info + palette + data


def _rle8_encode(px: np.ndarray) -> bytes:
    """BI_RLE8: bottom-up scanlines of (count, index) runs, 0x00 0x00
    end-of-line after each, 0x00 0x01 end-of-bitmap."""
    out = bytearray()
    for row in px[::-1]:
        i, w = 0, len(row)
        while i < w:
            v = row[i]
            run = 1
            while i + run < w and row[i + run] == v and run < 255:
                run += 1
            out += bytes((run, int(v)))
            i += run
        out += b"\x00\x00"
    out += b"\x00\x01"
    return bytes(out)


def _rle8_decode(data: bytes, h: int, w: int) -> np.ndarray:
    out = np.zeros((h, w), dtype=np.uint8)
    x, y, i, n = 0, 0, 0, len(data)
    try:
        while i + 1 < n:
            a, b = data[i], data[i + 1]
            i += 2
            if a > 0:  # encoded run
                if y >= h or x + a > w:
                    raise ValueError("BMP: RLE8 run exceeds bitmap bounds")
                out[y, x : x + a] = b
                x += a
            elif b == 0:  # end of line
                x, y = 0, y + 1
            elif b == 1:  # end of bitmap
                break
            elif b == 2:  # delta
                x += data[i]
                y += data[i + 1]
                i += 2
            else:  # absolute mode: b literal indices, word-aligned
                if y >= h or x + b > w or i + b > n:
                    raise ValueError("BMP: RLE8 run exceeds bitmap bounds")
                out[y, x : x + b] = np.frombuffer(
                    data, np.uint8, count=b, offset=i
                )
                x += b
                i += b + (b & 1)
    except IndexError as exc:
        raise ValueError("BMP: truncated RLE8 stream") from exc
    return out[::-1]  # stored bottom-up


def bmp_decoder():
    """Dependency-free REAL codec for BMP -> (h, w, 3) uint8.

    Handles BITMAPINFOHEADER-and-later DIB headers (the first 40 bytes
    carry everything needed), 8-bit paletted, 24-bit BGR and 32-bit
    BGRX ``BI_RGB``, ``BI_RLE8``, bottom-up and top-down (negative
    height) row orders, and 4-byte row padding.  1/4/16-bit and
    bitfield compressions raise — rare in web corpora; a real cluster
    would use ``pil_decoder()``."""

    def dec(payload: bytes) -> np.ndarray:
        if payload[:2] != b"BM":
            raise ValueError("BMP: bad magic")
        try:
            return _dec_body(payload)
        except struct.error as exc:
            raise ValueError("BMP: truncated or corrupt header") from exc

    def _dec_body(payload: bytes) -> np.ndarray:
        (offset,) = struct.unpack_from("<I", payload, 10)
        (hdr_size,) = struct.unpack_from("<I", payload, 14)
        if hdr_size < 40:
            raise ValueError("BMP: BITMAPCOREHEADER not supported")
        w, h_raw, _planes, bpp, comp, _sz, _xp, _yp, ncolors, _imp = (
            struct.unpack_from("<iiHHIIiiII", payload, 18)
        )
        top_down = h_raw < 0
        h = -h_raw if top_down else h_raw
        if w <= 0 or h <= 0:
            raise ValueError("BMP: bad dimensions")
        if bpp == 8:
            n = ncolors or 256
            pal_off = 14 + hdr_size
            pal = np.frombuffer(
                payload, np.uint8, count=n * 4, offset=pal_off
            ).reshape(n, 4)[:, [2, 1, 0]]  # BGRX -> RGB
            if comp == 1:  # BI_RLE8 (always bottom-up per spec)
                idx = _rle8_decode(payload[offset:], h, w)
                return pal[idx]
            if comp != 0:
                raise ValueError(f"BMP: unsupported 8-bit compression {comp}")
            stride = (w + 3) & ~3
            rows = np.frombuffer(
                payload, np.uint8, count=h * stride, offset=offset
            ).reshape(h, stride)[:, :w]
            idx = rows if top_down else rows[::-1]
            return pal[idx]
        if bpp in (24, 32):
            if comp not in (0, 3):  # BI_RGB / BI_BITFIELDS-with-default
                raise ValueError(f"BMP: unsupported compression {comp}")
            nb = bpp // 8
            stride = (w * nb + 3) & ~3
            rows = np.frombuffer(
                payload, np.uint8, count=h * stride, offset=offset
            ).reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
            rgb = rows[:, :, [2, 1, 0]]  # BGR(X) -> RGB
            return np.ascontiguousarray(rgb if top_down else rgb[::-1])
        raise ValueError(
            f"BMP: {bpp}-bit payloads not supported by the numpy codec; "
            "decode via pil_decoder()"
        )

    return dec


# --------------------------------------------------------------------------
# TIFF LZW (differs from GIF LZW: MSB-first bit packing, fixed CLEAR=256 /
# EOI=257, and the libtiff "early change" — code width bumps when the NEXT
# table entry would overflow, one code earlier than the GIF rule).
# --------------------------------------------------------------------------

_CLEAR, _EOI = 256, 257


def _tiff_lzw_encode(data: bytes) -> bytes:
    out_bits = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out_bits.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes((i,)): i for i in range(256)}
    next_code, width = 258, 9
    emit(_CLEAR, width)
    cur = b""
    for byte in data:
        sym = bytes((byte,))
        nxt = cur + sym
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        # early change: widen when NextCode reaches 511/1023/2047, one
        # code earlier than GIF's 512/1024/2048 (TIFF6 spec, LZW section)
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:  # reset before the table is unrepresentable
            emit(_CLEAR, width)
            table = {bytes((i,)): i for i in range(256)}
            next_code, width = 258, 9
        cur = sym
    if cur:
        emit(table[cur], width)
        # the decoder appends one entry after consuming this final code;
        # mirror its width bump so EOI is read at the right width
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(_EOI, width)
    if nbits:
        out_bits.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out_bits)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    bitbuf = bitlen = pos = 0
    width = 9
    table: list[bytes] = [bytes((i,)) for i in range(256)] + [b"", b""]
    prev: bytes | None = None

    def read_code() -> int:
        nonlocal bitbuf, bitlen, pos
        while bitlen < width:
            if pos >= len(data):
                return _EOI
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            bitlen += 8
        bitlen -= width
        return (bitbuf >> bitlen) & ((1 << width) - 1)

    while len(out) < expected:
        code = read_code()
        if code == _EOI:
            break
        if code == _CLEAR:
            table = table[:258]
            width, prev = 9, None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF: corrupt LZW stream")
        out += entry
        # early-change mirror: the decoder's table lags the encoder's by
        # one entry (the classic deferred KwKwK entry), so its bump fires
        # at len == 2^w - 2 to widen the SAME position in the code stream
        # where the encoder (NextCode == 2^w - 1) widened
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError("TIFF: truncated LZW strip")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes((257 - run, data[i]))
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 2 < n and data[i] == data[i + 1] == data[i + 2])
        ):
            i += 1
        out += bytes((i - lit - 1,)) + data[lit:i]
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c < 128:  # literal copy of c+1 bytes
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            if i >= n:
                break
            out += bytes((data[i],)) * (257 - c)
            i += 1
        # c == 128: noop
    if len(out) < expected:
        raise ValueError("TIFF: truncated PackBits strip")
    return bytes(out[:expected])


# --------------------------------------------------------------------------
# TIFF container
# --------------------------------------------------------------------------

_COMP = {"none": 1, "lzw": 5, "packbits": 32773}


def encode_tiff(
    px: np.ndarray,
    *,
    compression: str = "none",
    predictor: int = 1,
    byteorder: str = "II",
    rows_per_strip: int | None = None,
) -> bytes:
    """REAL baseline-TIFF bytes.  ``px`` is (h, w, 3) uint8 RGB or
    (h, w) uint8 grayscale; ``compression`` in none/lzw/packbits;
    ``predictor=2`` applies horizontal differencing before compression
    (spec-legal with LZW); ``byteorder`` 'II' or 'MM'; strips split at
    ``rows_per_strip`` (default: single strip)."""
    if px.dtype != np.uint8 or px.ndim not in (2, 3):
        raise ValueError("encode_tiff expects (h, w[, 3]) uint8")
    if compression not in _COMP:
        raise ValueError(f"compression must be one of {sorted(_COMP)}")
    if predictor == 2 and compression == "none":
        raise ValueError("predictor 2 requires a compression scheme")
    bo = {"II": "<", "MM": ">"}[byteorder]
    h, w = px.shape[:2]
    spp = 1 if px.ndim == 2 else 3
    rps = h if rows_per_strip is None else rows_per_strip
    strips = []
    for y0 in range(0, h, rps):
        band = px[y0 : y0 + rps]
        if predictor == 2:
            band = band.astype(np.int16)
            band = np.concatenate(
                [band[:, :1], (band[:, 1:] - band[:, :-1]) % 256], axis=1
            ).astype(np.uint8)
        raw = band.tobytes()
        if compression == "lzw":
            strips.append(_tiff_lzw_encode(raw))
        elif compression == "packbits":
            strips.append(_packbits_encode(raw))
        else:
            strips.append(raw)
    nstrips = len(strips)

    # layout: header(8) | strip data | [bps array for RGB] | IFD | offsets
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    bps_extra_off = 0
    if spp == 3:  # BitsPerSample needs 3 SHORTs -> out-of-line value
        bps_extra_off = pos
        pos += 6
    arrays_off = pos  # out-of-line strip offset/bytecount arrays (if >1)

    def entry(tag: int, typ: int, cnt: int, val: int) -> bytes:
        if typ == 3 and cnt == 1:  # SHORT packs left-justified
            return struct.pack(bo + "HHI", tag, typ, cnt) + struct.pack(
                bo + "HH", val, 0
            )
        return struct.pack(bo + "HHII", tag, typ, cnt, val)

    extra = bytearray()
    off_cursor = arrays_off

    def array_entry(tag: int, values: list[int]) -> bytes:
        nonlocal off_cursor
        if len(values) == 1:
            return entry(tag, 4, 1, values[0])
        here = off_cursor
        extra.extend(struct.pack(bo + f"{len(values)}I", *values))
        off_cursor += 4 * len(values)
        return entry(tag, 4, len(values), here)

    entries = [
        entry(256, 4, 1, w),  # ImageWidth
        entry(257, 4, 1, h),  # ImageLength
        (
            entry(258, 3, 1, 8)
            if spp == 1
            else entry(258, 3, 3, bps_extra_off)
        ),  # BitsPerSample
        entry(259, 3, 1, _COMP[compression]),
        entry(262, 3, 1, 1 if spp == 1 else 2),  # Photometric
        array_entry(273, strip_offsets),
        entry(277, 3, 1, spp),
        entry(278, 4, 1, rps),
        array_entry(279, [len(s) for s in strips]),
        entry(284, 3, 1, 1),  # PlanarConfiguration: chunky
    ]
    if predictor == 2:
        entries.append(entry(317, 3, 1, 2))
    entries.sort(key=lambda e: struct.unpack_from(bo + "H", e)[0])
    ifd_off = off_cursor
    ifd = (
        struct.pack(bo + "H", len(entries))
        + b"".join(entries)
        + struct.pack(bo + "I", 0)
    )
    head = struct.pack(
        bo + "2sHI", b"II" if bo == "<" else b"MM", 42, ifd_off
    )
    bps_blob = struct.pack(bo + "HHH", 8, 8, 8) if spp == 3 else b""
    return head + b"".join(strips) + bps_blob + bytes(extra) + ifd


def tiff_decoder():
    """Dependency-free REAL codec for baseline TIFF -> (h, w, 3) uint8.

    Both byte orders, multi-strip, Compression 1/5/32773 with
    Predictor 2, Photometric 0/1 (gray, 0 inverted), 2 (RGB) and 3
    (palette via the 16-bit ColorMap, high byte).  Planar
    configuration 2, tiled layout, and non-8-bit samples raise —
    ``pil_decoder()`` covers those exotics."""

    def dec(payload: bytes) -> np.ndarray:
        magic = payload[:4]
        if magic[:2] == b"II" and magic[2:4] == b"\x2a\x00":
            bo = "<"
        elif magic[:2] == b"MM" and magic[2:4] == b"\x00\x2a":
            bo = ">"
        else:
            raise ValueError("TIFF: bad magic")
        try:
            return _dec_body(payload, bo)
        except struct.error as exc:
            raise ValueError("TIFF: truncated or corrupt header") from exc

    def _dec_body(payload: bytes, bo: str) -> np.ndarray:
        (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
        (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
        tags: dict[int, tuple[int, int, int]] = {}
        for i in range(n_entries):
            base = ifd_off + 2 + 12 * i
            tag, typ, cnt = struct.unpack_from(bo + "HHI", payload, base)
            tags[tag] = (typ, cnt, payload[base + 8 : base + 12])

        _SIZES = {1: 1, 3: 2, 4: 4}

        def values(tag: int, default=None) -> list[int]:
            if tag not in tags:
                if default is None:
                    raise ValueError(f"TIFF: missing required tag {tag}")
                return default
            typ, cnt, raw = tags[tag]
            if typ not in _SIZES:
                raise ValueError(f"TIFF: unsupported type {typ} for tag {tag}")
            size = _SIZES[typ] * cnt
            if size <= 4:
                blob = raw[:size]
            else:
                (off,) = struct.unpack_from(bo + "I", raw)
                blob = payload[off : off + size]
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            return list(struct.unpack(bo + f"{cnt}{fmt}", blob))

        w = values(256)[0]
        h = values(257)[0]
        spp = values(277, [1])[0]
        bps = values(258, [8])
        if any(b != 8 for b in bps):
            raise ValueError(
                "TIFF: only 8-bit samples supported by the numpy codec; "
                "decode via pil_decoder()"
            )
        comp = values(259, [1])[0]
        photo = values(262)[0]
        if values(284, [1])[0] != 1:
            raise ValueError("TIFF: planar configuration 2 not supported")
        if 322 in tags or 323 in tags:
            raise ValueError("TIFF: tiled layout not supported")
        predictor = values(317, [1])[0]
        offsets = values(273)
        counts = values(279)
        rps = values(278, [h])[0]

        stride = w * spp
        bands = []
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            rows = min(rps, h - si * rps)
            expected = rows * stride
            blob = payload[off : off + cnt]
            if comp == 1:
                raw = blob[:expected]
                if len(raw) < expected:
                    raise ValueError("TIFF: truncated strip")
            elif comp == 5:
                raw = _tiff_lzw_decode(blob, expected)
            elif comp == 32773:
                raw = _packbits_decode(blob, expected)
            else:
                raise ValueError(f"TIFF: unsupported compression {comp}")
            band = np.frombuffer(raw, np.uint8).reshape(rows, stride)
            if predictor == 2:
                band = (
                    np.cumsum(
                        band.reshape(rows, w, spp).astype(np.int64), axis=1
                    )
                    % 256
                ).astype(np.uint8).reshape(rows, stride)
            bands.append(band)
        img = np.concatenate(bands, axis=0)

        if photo == 2:
            if spp < 3:
                raise ValueError("TIFF: RGB photometric needs 3 samples")
            return np.ascontiguousarray(
                img.reshape(h, w, spp)[:, :, :3]
            )
        if photo == 3:
            cmap = values(320)
            n = len(cmap) // 3
            pal = (
                np.array(cmap, dtype=np.uint16).reshape(3, n).T >> 8
            ).astype(np.uint8)
            return pal[img.reshape(h, w)]
        if photo in (0, 1):
            g = img.reshape(h, w)
            if photo == 0:
                g = 255 - g
            return np.repeat(g[:, :, None], 3, axis=2)
        raise ValueError(f"TIFF: unsupported photometric {photo}")

    return dec
