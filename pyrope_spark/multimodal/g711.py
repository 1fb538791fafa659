"""G.711 (mu-law / A-law) and IMA ADPCM audio codecs, dependency-free.

Closes the compressed-audio gate that :func:`columns.wav_decoder` used to
raise ``NotImplementedError`` for (WAV ``fmt`` tags 6 = A-law, 7 = mu-law,
0x11 = IMA/DVI4 ADPCM).  All three are pure-integer transforms, so the
decode side is exactly replayable in a DuckDB oracle:

- G.711 companding is MEMORYLESS — ``decode(encode(s))`` is a closed-form
  per-sample quantizer (segment + mantissa bit math), expressible directly
  in SQL.  The byte layout follows the canonical CCITT/Sun ``g711.c``
  convention: mu-law bytes are fully inverted (0xFF = 0, 0x00 = -32124);
  A-law bytes are XOR 0x55 (0x55 = -8, 0xD5 = +8).
- IMA ADPCM is a SELF-SYNCHRONIZING recurrence: the encoder maintains the
  identical (predictor, step-index) state the decoder reconstructs, so the
  composite encode+decode map is ONE recurrence replayable per sample in a
  recursive CTE.

Encoders exist so oracled round-trip queries can build real compressed
payloads from table columns (the ``wav_decode_stats`` discipline): any
table-driven PCM stream -> companded/ADPCM bytes -> RIFF container ->
:func:`columns.wav_decoder` -> integer-exact stats, with DuckDB replaying
the quantizer math from the same table values.  A Huffman-free but real
bit-level contract — any table/segment/nibble bug breaks the value hash.

Scale shape: all kernels are whole-array numpy (LUTs for decode, vectorized
segment search for G.711 encode); ADPCM's per-sample loop runs only in
fixture ENCODING (driver-side, tiny) and per-payload DECODING inside
``mapInPandas`` Arrow batches — embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- G.711 core
# Canonical constants (ITU-T G.711 / CCITT, as in the public-domain Sun
# g711.c): mu-law BIAS 0x84, clip 32635; A-law operates on 13-bit samples.

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635
_SEG_END_U = np.array(
    [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF], np.int32
)
_SEG_END_A = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], np.int32
)


def _ulaw_decode_table() -> np.ndarray:
    """256-entry mu-law byte -> int16, from the standard decode formula."""
    b = np.arange(256, dtype=np.int32)
    v = ~b & 0xFF
    t = ((v & 0x0F) << 3) + _ULAW_BIAS
    t = t << ((v & 0x70) >> 4)
    out = np.where(v & 0x80, _ULAW_BIAS - t, t - _ULAW_BIAS)
    return out.astype(np.int16)


def _alaw_decode_table() -> np.ndarray:
    """256-entry A-law byte -> int16.  The decode magnitudes are already
    16-bit-domain (8 .. 32256, the canonical published table: 0x00 ->
    -5504, 0x55 -> -8, 0xD5 -> +8, 0xFF -> +848); the 13-bit scaling
    lives on the ENCODE side (``s >> 3``)."""
    b = np.arange(256, dtype=np.int32)
    v = b ^ 0x55
    t = (v & 0x0F) << 4
    seg = (v & 0x70) >> 4
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108,
                                           (t + 0x108) << np.maximum(seg - 1, 0)))
    out = np.where(v & 0x80, t, -t)
    return out.astype(np.int16)


ULAW_DECODE = _ulaw_decode_table()
ALAW_DECODE = _alaw_decode_table()


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 PCM -> mu-law bytes (vectorized canonical segment search)."""
    s = np.asarray(samples, dtype=np.int32)
    sign_neg = s < 0
    x = np.where(sign_neg, -s, s)
    x = np.minimum(x, _ULAW_CLIP) + _ULAW_BIAS
    seg = np.searchsorted(_SEG_END_U, x)  # first seg_end >= x
    m = (x >> (seg + 3)) & 0x0F
    u = ((seg << 4) | m).astype(np.int32)
    out = np.where(sign_neg, u ^ 0x7F, u ^ 0xFF)
    return out.astype(np.uint8)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 PCM -> A-law bytes (13-bit domain per the standard)."""
    s = np.asarray(samples, dtype=np.int32) >> 3
    neg = s < 0
    ax = np.where(neg, -s - 1, s)
    seg = np.searchsorted(_SEG_END_A, ax)
    clip = seg >= 8
    seg = np.minimum(seg, 7)
    m = np.where(seg < 2, (ax >> 1) & 0x0F, (ax >> seg) & 0x0F)
    m = np.where(clip, 0x0F, m)
    a = ((seg << 4) | m).astype(np.int32)
    out = np.where(neg, a ^ 0x55, a ^ 0xD5)
    return out.astype(np.uint8)


# ----------------------------------------------------------------- IMA ADPCM
# Standard DVI4/IMA tables (spec constants, identical in every
# implementation).

IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], np.int32)

IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)


def _ima_step(sample: int, pred: int, idx: int) -> tuple[int, int, int]:
    """One joint encode+decode IMA step: (input sample, state) ->
    (nibble, new predictor = reconstructed sample, new index).  The
    predictor update is the DECODER's arithmetic — the encoder tracks the
    decoder exactly, which is what makes the recurrence oracle-replayable."""
    step = int(IMA_STEP_TABLE[idx])
    diff = sample - pred
    nib = 0
    if diff < 0:
        nib = 8
        diff = -diff
    d = diff
    if d >= step:
        nib |= 4
        d -= step
    if d >= step >> 1:
        nib |= 2
        d -= step >> 1
    if d >= step >> 2:
        nib |= 1
    # decoder-side reconstruction from the nibble
    vpdiff = step >> 3
    if nib & 4:
        vpdiff += step
    if nib & 2:
        vpdiff += step >> 1
    if nib & 1:
        vpdiff += step >> 2
    pred = pred - vpdiff if nib & 8 else pred + vpdiff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + int(IMA_INDEX_TABLE[nib & 7])))
    return nib, pred, idx


def ima_adpcm_encode(samples: np.ndarray, *, init_index: int = 0) -> bytes:
    """Mono int16 PCM -> ONE IMA ADPCM block: 4-byte header (predictor =
    first sample verbatim, step index, reserved 0) + packed nibbles (low
    nibble first) for samples[1:], zero-padded to a whole byte."""
    s = np.asarray(samples, dtype=np.int64)
    if len(s) == 0:
        raise ValueError("ADPCM block needs at least one sample")
    pred, idx = int(s[0]), int(init_index)
    hdr = struct.pack("<hBB", pred, idx, 0)
    nibs = []
    for v in s[1:]:
        nib, pred, idx = _ima_step(int(v), pred, idx)
        nibs.append(nib)
    if len(nibs) % 2:
        nibs.append(0)
    packed = bytes(
        (nibs[i] & 0x0F) | ((nibs[i + 1] & 0x0F) << 4)
        for i in range(0, len(nibs), 2)
    )
    return hdr + packed


def ima_adpcm_decode_block(block: bytes, n_samples: int) -> np.ndarray:
    """One mono IMA block -> int16 samples (header sample + one per
    nibble, truncated to ``n_samples`` per the fact chunk)."""
    if len(block) < 4:
        raise ValueError("ADPCM block shorter than its 4-byte header")
    pred, idx, _ = struct.unpack("<hBB", block[:4])
    if idx > 88:
        raise ValueError(f"ADPCM step index {idx} out of range")
    out = [pred]
    for byte in block[4:]:
        for nib in (byte & 0x0F, byte >> 4):
            step = int(IMA_STEP_TABLE[idx])
            vpdiff = step >> 3
            if nib & 4:
                vpdiff += step
            if nib & 2:
                vpdiff += step >> 1
            if nib & 1:
                vpdiff += step >> 2
            pred = pred - vpdiff if nib & 8 else pred + vpdiff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(IMA_INDEX_TABLE[nib & 7])))
            out.append(pred)
            if len(out) >= n_samples:
                return np.array(out[:n_samples], dtype=np.int16)
    return np.array(out[:n_samples], dtype=np.int16)


# ------------------------------------------------------------ WAV containers

def _riff(fmt_body: bytes, data: bytes, extra_chunks: bytes = b"") -> bytes:
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + extra_chunks
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def g711_wav_bytes(
    samples: np.ndarray, *, law: str = "ulaw", sample_rate: int = 8000
) -> bytes:
    """Encode mono/interleaved int16 samples as a format-7 (mu-law) or
    format-6 (A-law) RIFF/WAVE payload — fixture twin of the extended
    :func:`columns.wav_decoder`."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    flat = s.reshape(-1)
    enc = ulaw_encode(flat) if law == "ulaw" else alaw_encode(flat)
    tag = 7 if law == "ulaw" else 6
    fmt = struct.pack(
        "<HHIIHHH", tag, ch, sample_rate, sample_rate * ch, ch, 8, 0
    )
    fact = b"fact" + struct.pack("<II", 4, n)
    return _riff(fmt, enc.tobytes(), fact)


def ima_adpcm_wav_bytes(
    samples: np.ndarray, *, sample_rate: int = 8000
) -> bytes:
    """Encode mono int16 samples as a single-block format-0x11 IMA ADPCM
    RIFF/WAVE payload (block_align sized to the stream; fact chunk carries
    the true sample count, which the decoder honors)."""
    s = np.asarray(samples, dtype=np.int16).reshape(-1)
    block = ima_adpcm_encode(s)
    n = len(s)
    block_align = len(block)
    samples_per_block = 1 + (block_align - 4) * 2
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, sample_rate,
        # nominal byte rate: blocks per second * block size
        max(1, (sample_rate * block_align) // max(samples_per_block, 1)),
        block_align, 4, 2, samples_per_block,
    )
    fact = b"fact" + struct.pack("<II", 4, n)
    return _riff(fmt, block, fact)


def decode_compressed_wav_data(
    audio_fmt: int,
    data: bytes,
    *,
    ch: int,
    block_align: int,
    n_samples: int | None,
) -> np.ndarray:
    """Decode the ``data`` chunk of a format 6/7/0x11 WAV into int16
    samples (flat, interleaved).  Called by :func:`columns.wav_decoder`."""
    if audio_fmt == 7:
        return ULAW_DECODE[np.frombuffer(data, dtype=np.uint8)]
    if audio_fmt == 6:
        return ALAW_DECODE[np.frombuffer(data, dtype=np.uint8)]
    if audio_fmt == 0x11:
        if ch != 1:
            raise NotImplementedError(
                "IMA ADPCM decode ships mono-only; multi-channel interleave "
                "needs the 4-byte-group channel layout (not yet implemented)"
            )
        if block_align < 5:
            raise ValueError(f"IMA ADPCM block_align {block_align} invalid")
        per_block = 1 + (block_align - 4) * 2
        blocks = [
            data[i: i + block_align]
            for i in range(0, len(data) - len(data) % block_align, block_align)
        ]
        remaining = n_samples if n_samples is not None else per_block * len(blocks)
        parts = []
        for b in blocks:
            take = min(per_block, remaining)
            if take <= 0:
                break
            parts.append(ima_adpcm_decode_block(b, take))
            remaining -= take
        if not parts:
            raise ValueError("IMA ADPCM payload has no complete block")
        return np.concatenate(parts)
    raise NotImplementedError(f"unsupported compressed WAV format {audio_fmt}")
