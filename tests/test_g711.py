"""G.711 (mu-law/A-law) + IMA ADPCM codec tests.

The table spot-checks pin the canonical CCITT/Sun values (any published
G.711 table agrees on them), so a segment/mask/bias bug cannot pass; the
round-trip properties bound the quantization error by the segment step,
which a mis-shifted mantissa breaks immediately.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyrope_spark.multimodal.g711 import (
    ALAW_DECODE,
    IMA_STEP_TABLE,
    ULAW_DECODE,
    alaw_encode,
    decode_compressed_wav_data,
    g711_wav_bytes,
    ima_adpcm_decode_block,
    ima_adpcm_encode,
    ima_adpcm_wav_bytes,
    ulaw_encode,
)


# ------------------------------------------------------------- table values

def test_ulaw_table_canonical_values():
    # published mu-law decode table endpoints/midpoints
    assert ULAW_DECODE[0x00] == -32124
    assert ULAW_DECODE[0x80] == 32124
    assert ULAW_DECODE[0xFF] == 0
    assert ULAW_DECODE[0x7F] == -0  # negative zero collapses to 0
    assert ULAW_DECODE[0xFE] == 8  # smallest positive step


def test_alaw_table_canonical_values():
    assert ALAW_DECODE[0x55] == -8
    assert ALAW_DECODE[0xD5] == 8
    assert ALAW_DECODE[0x00] == -5504
    assert ALAW_DECODE[0x80] == 5504
    assert ALAW_DECODE[0xFF] == 848
    assert int(np.abs(ALAW_DECODE.astype(np.int32)).max()) == 32256


def test_ulaw_roundtrip_error_bounded():
    s = np.arange(-32768, 32768, dtype=np.int16)
    rec = ULAW_DECODE[ulaw_encode(s)].astype(np.int32)
    s32 = s.astype(np.int32)
    # segment step for |s| (biased) bounds the quantization error
    x = np.minimum(np.abs(s32), 32635) + 132
    seg = np.digitize(x, [0x100, 0x200, 0x400, 0x800, 0x1000, 0x2000, 0x4000])
    half_step = (1 << (seg + 3)) // 2
    err = np.abs(rec - np.clip(s32, -32635, 32635))
    assert int((err > half_step).sum()) == 0
    # codec fixed point: decode(encode(decode(b))) == decode(b)
    allb = np.arange(256, dtype=np.uint8)
    assert np.array_equal(ULAW_DECODE[ulaw_encode(ULAW_DECODE[allb])],
                          ULAW_DECODE[allb])


def test_alaw_roundtrip_error_bounded():
    s = np.arange(-32768, 32768, dtype=np.int16)
    rec = ALAW_DECODE[alaw_encode(s)].astype(np.int32)
    s32 = s.astype(np.int32)
    # 13-bit domain segments scale x8 in the 16-bit domain: step is 16
    # at the bottom, up to 2048 at the top -> error <= step (mid-rise)
    ax = np.abs(s32 >> 3)
    seg = np.digitize(ax, [0x20, 0x40, 0x80, 0x100, 0x200, 0x400, 0x800])
    step16 = np.where(seg < 2, 16, (1 << (seg - 1)) * 16)
    err = np.abs(rec - s32)
    assert int((err > step16).sum()) == 0
    allb = np.arange(256, dtype=np.uint8)
    assert np.array_equal(ALAW_DECODE[alaw_encode(ALAW_DECODE[allb])],
                          ALAW_DECODE[allb])


def test_ulaw_encode_monotonic():
    s = np.arange(-32768, 32768, dtype=np.int16)
    rec = ULAW_DECODE[ulaw_encode(s)].astype(np.int32)
    assert np.all(np.diff(rec) >= 0)


# ---------------------------------------------------------------- IMA ADPCM

def test_adpcm_first_sample_verbatim_and_tracking():
    rng = np.random.default_rng(7)
    s = (rng.standard_normal(501) * 3000).astype(np.int16)
    block = ima_adpcm_encode(s)
    rec = ima_adpcm_decode_block(block, len(s))
    assert rec[0] == s[0]
    # tracking error bounded by the max step the index walk can reach:
    # conservative bound 2 * step_table[index]; assert against the global
    # p99-style bound that catches sign/shift bugs (which explode it)
    err = np.abs(rec.astype(np.int32) - s.astype(np.int32))
    assert int(err.max()) <= 2 * int(IMA_STEP_TABLE.max() // 8) + 4096
    assert float(err.mean()) < 900.0


def test_adpcm_constant_signal_locks():
    s = np.full(100, 1234, dtype=np.int16)
    rec = ima_adpcm_decode_block(ima_adpcm_encode(s), len(s))
    # after convergence the reconstruction sits within the minimum step
    assert np.all(np.abs(rec[10:].astype(np.int32) - 1234) <= 16)


def test_adpcm_hand_case():
    # one step from pred=0, idx=0 (step=7): sample 100 -> diff=100 >= 7
    # -> nib 4+2+1=7, vpdiff = 0+7+3+1 = 11 -> pred 11, idx 0+8=8
    block = ima_adpcm_encode(np.array([0, 100], dtype=np.int16))
    assert block[:4] == b"\x00\x00\x00\x00"
    assert block[4] & 0x0F == 7
    rec = ima_adpcm_decode_block(block, 2)
    assert list(rec) == [0, 11]


def test_adpcm_fact_truncation_and_padding():
    s = np.array([5, 6, 7, 8], dtype=np.int16)  # 3 nibbles -> padded to 4
    block = ima_adpcm_encode(s)
    assert len(block) == 4 + 2
    rec = ima_adpcm_decode_block(block, 4)
    assert len(rec) == 4


# ------------------------------------------------------------ WAV container

def test_g711_wav_roundtrip_via_wav_decoder():
    from pyrope_spark.multimodal.columns import wav_decoder

    rng = np.random.default_rng(11)
    s = (rng.standard_normal(400) * 8000).astype(np.int16)
    dec = wav_decoder()
    for law in ("ulaw", "alaw"):
        payload = g711_wav_bytes(s, law=law, sample_rate=16000)
        out, rate = dec(payload)
        assert rate == 16000 and out.shape == (400, 1)
        table = ULAW_DECODE if law == "ulaw" else ALAW_DECODE
        enc = ulaw_encode(s) if law == "ulaw" else alaw_encode(s)
        assert np.array_equal(out[:, 0], table[enc])


def test_g711_wav_stereo():
    from pyrope_spark.multimodal.columns import wav_decoder

    s = np.tile(np.array([[100, -100]], dtype=np.int16), (50, 1))
    out, rate = wav_decoder()(g711_wav_bytes(s, law="ulaw"))
    assert out.shape == (50, 2)
    assert np.all(out[:, 0] > 0) and np.all(out[:, 1] < 0)


def test_adpcm_wav_roundtrip_via_wav_decoder():
    from pyrope_spark.multimodal.columns import wav_decoder

    rng = np.random.default_rng(13)
    s = np.cumsum(rng.integers(-300, 300, 777)).astype(np.int16)
    payload = ima_adpcm_wav_bytes(s, sample_rate=8000)
    out, rate = wav_decoder()(payload)
    assert rate == 8000 and out.shape == (777, 1)
    block = ima_adpcm_encode(s)
    assert np.array_equal(out[:, 0], ima_adpcm_decode_block(block, 777))


def test_adpcm_multichannel_raises():
    with pytest.raises(NotImplementedError):
        decode_compressed_wav_data(
            0x11, b"\x00" * 12, ch=2, block_align=12, n_samples=10
        )


def test_decode_audio_end_to_end(spark):
    from pyrope_spark.multimodal.columns import decode_audio

    rng = np.random.default_rng(5)
    rows = []
    for i in range(6):
        s = (rng.standard_normal(200 + 50 * i) * 5000).astype(np.int16)
        law = "ulaw" if i % 2 == 0 else "alaw"
        rows.append((f"a{i}", bytearray(g711_wav_bytes(s, law=law))))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {r["media_id"]: r for r in decode_audio(df).collect()}
    assert len(out) == 6
    for i in range(6):
        assert out[f"a{i}"]["n_samples"] == 200 + 50 * i
        assert out[f"a{i}"]["sample_rate"] == 8000
        assert out[f"a{i}"]["peak_abs"] > 0
