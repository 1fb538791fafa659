"""Pure zlib-free numpy baseline JPEG codec (r8 VERDICT #1).

Real corpora are JPEG-dominated; round 8 proved the multimodal decode
plumbing with a real PNG codec, and this module closes the remaining gap
with a REAL baseline JPEG path that runs in codec-less containers:

- :func:`encode_jpeg` — a complete ITU-T T.81 baseline sequential JFIF
  encoder (level shift -> 8x8 float DCT-II -> quantization -> zigzag ->
  DC-differential + AC run-length Huffman entropy coding with byte
  stuffing), grayscale or RGB with 4:4:4 / 4:2:0 chroma subsampling,
  Annex K standard tables scaled by the usual quality formula (or
  caller-supplied tables — the DQT segment always carries what was
  used).
- :func:`jpeg_decoder` — a general baseline decoder: marker parse (DQT /
  DHT / SOF0 / SOS / DRI, APPn/COM skipped), canonical Huffman decode
  from the stream's own tables, restart-marker handling, dequantize,
  inverse zigzag, float IDCT, chroma upsample, YCbCr->RGB.  It decodes
  any baseline-sequential JPEG with sampling factors in {1, 2} (4:4:4,
  4:2:2, 4:2:0 — the web-corpus shapes), not just this encoder's output;
  progressive (SOF2) and arithmetic coding raise with a clear message.

Reference semantics analog: the reference treats media payloads as
opaque blobs and decodes client-side (``src/Pyrope.AISidecar/server.py``
image endpoints); here decode is a batched Arrow stage inside the engine
(``multimodal.columns.decode_image``), so the codec must be dependency
free.  Scale shape: the codec runs per payload inside ``mapInPandas``
batches — embarrassingly parallel, no driver involvement, no shuffle.

Determinism note (oracle discipline): every rounding site is
``floor(x + 0.5)`` on IEEE doubles (round half up) or the explicit
round-half-away quantizer, so a DuckDB twin can replay the closed-form
decode of block-constant inputs bit-exactly (see
``queries.py::jpeg_real_codec_*``).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables
# ITU-T T.81 Annex K.1 / K.2 quantization tables (natural row-major order)
STD_LUMA_QUANT = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)
STD_CHROMA_QUANT = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)

# Annex K.3-K.6 standard Huffman tables: (bits[1..16] counts, values)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# zigzag scan order: ZIGZAG[i] = natural index of the i-th zigzagged coeff
_zz = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II basis: C[k, n] = a(k) cos((2n+1) k pi / 16)
_n = np.arange(8)
_C = np.cos((2 * _n[None, :] + 1) * _n[:, None] * np.pi / 16) * np.sqrt(2.0 / 8)
_C[0] *= np.sqrt(0.5)


def quality_scaled(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 keeps the Annex K table verbatim."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (table.astype(np.int64) * scale + 50) // 100
    return np.clip(t, 1, 255)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """JFIF full-range RGB->YCbCr, floor(x+0.5) rounding, clamped uint8.
    The coefficient literals here are replayed verbatim in the DuckDB
    oracle twin — identical IEEE arithmetic on both sides."""
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    out = np.stack([y, cb, cr], axis=2)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _fdct_quant(block: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Level-shifted 8x8 float DCT then round-half-away quantization.

    The 2^-40 epsilon pins exact .5 boundaries: the float DCT of integer
    input lands a few ulps off the exact rational F/q, so a coefficient
    whose exact quotient is x.5 would round down or up depending on
    rounding noise.  With the epsilon the quantizer matches exact-
    arithmetic round-half-away wherever |float error| < 2^-40 — which
    makes block-constant inputs bit-predictable (the DuckDB oracle's
    closed form) while perturbing nothing else (natural-content
    quotients are never within 2^-40 of a boundary by coincidence that
    survives both engines anyway)."""
    f = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    r = f / qtab
    return (np.sign(r) * np.floor(np.abs(r) + 0.5 + 2.0**-40)).astype(
        np.int64
    )


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): value -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, amplitude bits) — T.81 F.1.2.1: negatives take the
    ones'-complement of |v| in `size` bits."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    amp = v if v > 0 else v + (1 << size) - 1
    return size, amp


def _encode_blocks(
    writer: _BitWriter,
    comps: list[dict],
    mcus_y: int,
    mcus_x: int,
) -> None:
    """Interleaved MCU entropy coding.  Each comp dict carries: plane of
    quantized blocks (by, bx, 8, 8 int64 already quantized), sampling
    (hs, vs), dc/ac code tables, and a mutable DC predictor."""
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for c in comps:
                for v in range(c["vs"]):
                    for h in range(c["hs"]):
                        by = my * c["vs"] + v
                        bx = mx * c["hs"] + h
                        blk = c["qblocks"][by, bx]
                        zz = blk.reshape(64)[_zz]
                        diff = int(zz[0]) - c["pred"]
                        c["pred"] = int(zz[0])
                        size, amp = _magnitude(diff)
                        code, ln = c["dc"][size]
                        writer.put(code, ln)
                        if size:
                            writer.put(amp, size)
                        run = 0
                        for i in range(1, 64):
                            v2 = int(zz[i])
                            if v2 == 0:
                                run += 1
                                continue
                            while run > 15:
                                zcode, zln = c["ac"][0xF0]  # ZRL
                                writer.put(zcode, zln)
                                run -= 16
                            s2, a2 = _magnitude(v2)
                            acode, aln = c["ac"][(run << 4) | s2]
                            writer.put(acode, aln)
                            writer.put(a2, s2)
                            run = 0
                        if run:
                            ecode, eln = c["ac"][0x00]  # EOB
                            writer.put(ecode, eln)


def encode_jpeg(
    px: np.ndarray,
    *,
    quality: int = 50,
    subsampling: str = "444",
    quant_tables: tuple[np.ndarray, np.ndarray] | None = None,
) -> bytes:
    """REAL baseline-sequential JFIF bytes for a (h, w) grayscale or
    (h, w, 3) RGB uint8 array.  ``subsampling`` is '444' or '420' (color
    only).  ``quant_tables=(luma, chroma)`` overrides the quality-scaled
    Annex K tables (the DQT segment always carries the tables used, so
    any standard decoder reads the stream correctly)."""
    if px.dtype != np.uint8 or px.ndim not in (2, 3):
        raise ValueError("encode_jpeg expects (h, w) or (h, w, 3) uint8")
    gray = px.ndim == 2
    if not gray and px.shape[2] != 3:
        raise ValueError("encode_jpeg expects 3 channels for color input")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = px.shape[0], px.shape[1]
    if quant_tables is None:
        qly = quality_scaled(STD_LUMA_QUANT, quality)
        qlc = quality_scaled(STD_CHROMA_QUANT, quality)
    else:
        qly = np.asarray(quant_tables[0], dtype=np.int64).reshape(8, 8)
        qlc = np.asarray(quant_tables[1], dtype=np.int64).reshape(8, 8)

    if gray:
        planes = [px]
        samp = [(1, 1)]
        qsel = [0]
    else:
        ycc = _rgb_to_ycbcr(px)
        ypl, cbpl, crpl = ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]
        if subsampling == "420":
            # 2x2 mean with floor(x+0.5): pad to even first
            def down(p: np.ndarray) -> np.ndarray:
                p = _pad_edge(p, 2).astype(np.float64)
                m = (p[0::2, 0::2] + p[0::2, 1::2]
                     + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
                return np.floor(m + 0.5).astype(np.uint8)

            planes = [ypl, down(cbpl), down(crpl)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [ypl, cbpl, crpl]
            samp = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    comps = []
    for plane, (hs, vs), qi in zip(planes, samp, qsel):
        # pad each component so it tiles exactly into the shared MCU grid
        need_h = ((h + 8 * vmax - 1) // (8 * vmax)) * 8 * vs
        need_w = ((w + 8 * hmax - 1) // (8 * hmax)) * 8 * hs
        p = np.pad(
            plane,
            ((0, need_h - plane.shape[0]), (0, need_w - plane.shape[1])),
            mode="edge",
        )
        qtab = qly if qi == 0 else qlc
        by, bx = p.shape[0] // 8, p.shape[1] // 8
        blocks = p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        qb = np.empty((by, bx, 8, 8), dtype=np.int64)
        for i in range(by):
            for j in range(bx):
                qb[i, j] = _fdct_quant(blocks[i, j], qtab)
        comps.append({"qblocks": qb, "hs": hs, "vs": vs, "qi": qi, "pred": 0})

    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)

    dc_tabs = [STD_DC_LUMA, STD_DC_CHROMA]
    ac_tabs = [STD_AC_LUMA, STD_AC_CHROMA]
    for c in comps:
        c["dc"] = _huff_encode_table(*dc_tabs[c["qi"]])
        c["ac"] = _huff_encode_table(*ac_tabs[c["qi"]])

    writer = _BitWriter()
    _encode_blocks(writer, comps, mcus_y, mcus_x)
    scan = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT: one segment per table, 8-bit precision, zigzag order
    tabs = [qly] if gray else [qly, qlc]
    for ti, tab in enumerate(tabs):
        zzt = tab.reshape(64)[_zz].astype(np.uint8).tobytes()
        out += seg(0xFFDB, bytes([ti]) + zzt)
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, c in enumerate(comps):
        sof += bytes([ci + 1, (c["hs"] << 4) | c["vs"], c["qi"]])
    out += seg(0xFFC0, sof)
    # DHT: class (0 dc / 1 ac) << 4 | id
    htabs = [(0x00, STD_DC_LUMA), (0x10, STD_AC_LUMA)]
    if not gray:
        htabs += [(0x01, STD_DC_CHROMA), (0x11, STD_AC_CHROMA)]
    for tid, (bits, vals) in htabs:
        out += seg(0xFFC4, bytes([tid]) + bytes(bits) + bytes(vals))
    # SOS
    sos = bytes([ncomp])
    for ci, c in enumerate(comps):
        td_ta = (c["qi"] << 4) | c["qi"]  # dc table id, ac table id
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])  # spectral selection (baseline fixed)
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; restart markers
    are consumed by the caller via :meth:`sync_restart`."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0xFF  # pad reads past EOI
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif nxt == 0xFF:
                    # legal T.81 fill byte (B.1.1.2: markers may be
                    # preceded by any number of 0xFF): drop ONLY the
                    # fill byte and re-examine — the next byte may be a
                    # marker id that must not be consumed as entropy data
                    self.pos += 1
                    continue
                else:
                    # any real marker (restart, EOI, or a between-scan
                    # segment marker like DHT/SOS in progressive streams):
                    # stop feeding entropy bits WITHOUT consuming it — the
                    # caller's marker walk owns it.  (Pre-r10 this branch
                    # skipped unknown markers, which corrupted multi-scan
                    # progressive parsing when the reader over-fetched.)
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker (T.81 F.2.1.3.1)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value for the canonical assignment."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bits(1)
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("JPEG: invalid Huffman code in entropy stream")


def _extend(amp: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size` amplitude bits back to the signed
    coefficient."""
    if size == 0:
        return 0
    if amp < (1 << (size - 1)):
        return amp - (1 << size) + 1
    return amp


def jpeg_decoder():
    """Returns ``dec(payload: bytes) -> (h, w, 3) uint8`` for
    baseline-sequential JPEG (grayscale or YCbCr, sampling factors in
    {1, 2}).  Pure numpy — the in-container REAL codec for the dominant
    web-corpus format (r8 VERDICT #1); progressive / arithmetic /
    12-bit streams raise with a clear message (``pil_decoder()`` covers
    them on clusters with Pillow installed)."""

    def dec(payload: bytes) -> np.ndarray:
        if payload[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG payload (missing SOI)")
        pos = 2
        qtabs: dict[int, np.ndarray] = {}
        htabs: dict[tuple[int, int], dict] = {}
        sof = None
        restart_interval = 0
        n = len(payload)
        while pos < n:
            if payload[pos] != 0xFF:
                pos += 1
                continue
            # skip T.81 fill bytes: any run of 0xFF before the marker id
            # (B.1.1.2) — without this, marker=0xFF would fall through to
            # a bogus seglen read below
            while pos + 1 < n and payload[pos + 1] == 0xFF:
                pos += 1
            if pos + 1 >= n:
                break
            marker = payload[pos + 1]
            pos += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            if marker == 0xD9:  # EOI
                break
            (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
            body = payload[pos + 2:pos + seglen]
            if marker == 0xDB:  # DQT (possibly several tables per segment)
                bp = 0
                while bp < len(body):
                    pq, tq = body[bp] >> 4, body[bp] & 0xF
                    if pq != 0:
                        raise ValueError("jpeg_decoder: 16-bit DQT unsupported")
                    t = np.frombuffer(
                        body[bp + 1:bp + 65], dtype=np.uint8
                    ).astype(np.int64)
                    nat = np.empty(64, dtype=np.int64)
                    nat[_zz] = t
                    qtabs[tq] = nat.reshape(8, 8)
                    bp += 65
            elif marker == 0xC4:  # DHT
                bp = 0
                while bp < len(body):
                    tc, th = body[bp] >> 4, body[bp] & 0xF
                    bits = list(body[bp + 1:bp + 17])
                    nv = sum(bits)
                    vals = list(body[bp + 17:bp + 17 + nv])
                    htabs[(tc, th)] = _huff_decode_table(bits, vals)
                    bp += 17 + nv
            elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
                prec, ih, iw, nc = struct.unpack(">BHHB", body[:6])
                if prec != 8:
                    raise ValueError("jpeg_decoder: only 8-bit precision")
                comps = []
                for ci in range(nc):
                    cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                    comps.append(
                        {"id": cid, "hs": hv >> 4, "vs": hv & 0xF, "tq": tq}
                    )
                sof = (ih, iw, comps)
            elif marker == 0xC2:  # progressive: full native path (r10)
                from pyrope_spark.multimodal.jpeg_progressive import (
                    decode_progressive,
                )

                return decode_progressive(payload)
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                raise ValueError(
                    "jpeg_decoder supports baseline sequential (SOF0/1) "
                    f"and progressive (SOF2) only; got SOF marker "
                    f"0xFF{marker:02X} — use pil_decoder() for "
                    "hierarchical/arithmetic streams"
                )
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", body[:2])
            elif marker == 0xDA:  # SOS -> entropy data follows
                if sof is None:
                    raise ValueError("JPEG: SOS before SOF")
                ns = body[0]
                scomp = []
                for si in range(ns):
                    cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                    scomp.append((cs, tdta >> 4, tdta & 0xF))
                return _decode_scan(
                    payload, pos + seglen, sof, scomp, qtabs, htabs,
                    restart_interval,
                )
            pos += seglen
        raise ValueError("JPEG: no SOS scan found")

    def _decode_scan(payload, data_pos, sof, scomp, qtabs, htabs,
                     restart_interval):
        ih, iw, comps = sof
        hmax = max(c["hs"] for c in comps)
        vmax = max(c["vs"] for c in comps)
        if hmax > 2 or vmax > 2:
            raise ValueError("jpeg_decoder: sampling factors above 2")
        mcus_x = (iw + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (ih + 8 * vmax - 1) // (8 * vmax)
        by_id = {c["id"]: c for c in comps}
        order = []
        for cs, td, ta in scomp:
            c = by_id[cs]
            c["dc_tab"] = htabs[(0, td)]
            c["ac_tab"] = htabs[(1, ta)]
            c["qtab"] = qtabs[c["tq"]].astype(np.float64)
            c["plane"] = np.zeros(
                (mcus_y * c["vs"] * 8, mcus_x * c["hs"] * 8), dtype=np.uint8
            )
            c["pred"] = 0
            order.append(c)

        reader = _BitReader(payload, data_pos)
        zz_inv = _zz  # zigzag index list (scan order -> natural)
        mcu_count = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and (
                    mcu_count % restart_interval == 0
                ):
                    reader.sync_restart()
                    for c in order:
                        c["pred"] = 0
                mcu_count += 1
                for c in order:
                    for v in range(c["vs"]):
                        for h in range(c["hs"]):
                            coef = np.zeros(64, dtype=np.float64)
                            size = _read_huff(reader, c["dc_tab"])
                            diff = _extend(reader.bits(size), size)
                            c["pred"] += diff
                            coef[0] = c["pred"]
                            k = 1
                            while k < 64:
                                rs = _read_huff(reader, c["ac_tab"])
                                run, s = rs >> 4, rs & 0xF
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += run
                                if k > 63:
                                    raise ValueError("JPEG: AC index overrun")
                                coef[k] = _extend(reader.bits(s), s)
                                k += 1
                            blk = np.zeros(64, dtype=np.float64)
                            blk[zz_inv] = coef
                            f = blk.reshape(8, 8) * c["qtab"]
                            pxb = _C.T @ f @ _C + 128.0
                            pxb = np.clip(np.floor(pxb + 0.5), 0, 255)
                            y0 = (my * c["vs"] + v) * 8
                            x0 = (mx * c["hs"] + h) * 8
                            c["plane"][y0:y0 + 8, x0:x0 + 8] = (
                                pxb.astype(np.uint8)
                            )

        # upsample every component to full MCU-grid resolution, crop, mix
        full_h, full_w = mcus_y * vmax * 8, mcus_x * hmax * 8
        planes = []
        for c in order:
            p = c["plane"]
            ry, rx = vmax // c["vs"], hmax // c["hs"]
            if ry > 1:
                p = np.repeat(p, ry, axis=0)
            if rx > 1:
                p = np.repeat(p, rx, axis=1)
            planes.append(p[:full_h, :full_w][:ih, :iw])
        if len(planes) == 1:
            return np.repeat(planes[0][:, :, None], 3, axis=2)
        if len(planes) == 3:
            return _ycbcr_to_rgb(*planes)
        raise ValueError(f"jpeg_decoder: {len(planes)}-component scan")

    return dec


def auto_image_decoder():
    """Magic-byte dispatch across the in-container REAL codecs: PNG,
    binary PPM (P6), baseline+progressive JPEG, GIF, BMP, baseline
    TIFF.  The one ``decoder=`` hook to hand ``decode_image`` for a
    mixed-format corpus column.

    Fallback chain (r9 VERDICT #5): JPEG/BMP/TIFF payloads try the
    numpy codecs first; streams they cannot handle (arithmetic/12-bit
    JPEG, 16-bit BMP, tiled/deep TIFF) fall through to Pillow via
    ``columns.pil_decoder()`` when that library is installed, as do
    payloads with an unrecognized magic (WebP...).  Without Pillow the
    native error — which names the ``pil_decoder`` pointer —
    propagates unchanged."""
    from pyrope_spark.multimodal.bmp_tiff import bmp_decoder, tiff_decoder
    from pyrope_spark.multimodal.columns import (
        pil_decoder,
        png_decoder,
        ppm_decoder,
    )
    from pyrope_spark.multimodal.gif import gif_decoder

    png = png_decoder()
    ppm = ppm_decoder()
    jpg = jpeg_decoder()
    gif = gif_decoder()
    bmp = bmp_decoder()
    tif = tiff_decoder()
    pil = pil_decoder()  # None when Pillow is absent

    def dec(payload: bytes) -> np.ndarray:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return png(payload)
        if payload[:2] == b"P6":
            return ppm(payload)
        if payload[:2] == b"\xff\xd8":
            try:
                return jpg(payload)
            except ValueError:
                if pil is not None:
                    return pil(payload)
                raise
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return gif(payload)
        if payload[:2] == b"BM":
            try:
                return bmp(payload)
            except ValueError:
                if pil is not None:
                    return pil(payload)
                raise
        if payload[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
            try:
                return tif(payload)
            except ValueError:
                if pil is not None:
                    return pil(payload)
                raise
        if pil is not None:
            return pil(payload)
        raise ValueError("auto_image_decoder: unrecognized image magic")

    return dec
