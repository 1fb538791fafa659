"""Property-based tests (hypothesis) for the deterministic kernels — the
randomized coverage the reference lacks entirely (SURVEY §5 'Absent')."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pyrope_spark.operators.simhash import simhash_np, simhash_projections

# ---- pure-python mirrors of the column expressions (kept in lockstep) ----


def round_k_py(k: int) -> int:
    for b in (5, 10, 20, 50, 100):
        if k <= b:
            return b
    return k


def sq8_py(vec: list[float]) -> tuple[list[int], float, float]:
    vmin, vmax = min(vec), max(vec)
    rng = vmax - vmin
    if rng <= 0:
        return [0] * len(vec), vmin, vmax
    codes = [
        min(255, max(0, int(np.floor((x - vmin) * 255.0 / rng + 0.5)))) for x in vec
    ]
    return codes, vmin, vmax


def sq8_dequant_py(codes, vmin, vmax):
    rng = vmax - vmin
    return [vmin + c * rng / 255.0 for c in codes]


@given(st.integers(min_value=1, max_value=500))
def test_round_k_monotone_and_bucketed(k):
    rk = round_k_py(k)
    assert rk >= k or rk in (5, 10, 20, 50, 100)
    assert rk >= k - 0  # never below a smaller bucket than k's bucket
    if k <= 100:
        assert rk in (5, 10, 20, 50, 100)
    else:
        assert rk == k


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=1,
        max_size=64,
    )
)
@settings(max_examples=200)
def test_sq8_roundtrip_error_bound(vec):
    codes, vmin, vmax = sq8_py(vec)
    assert all(0 <= c <= 255 for c in codes)
    deq = sq8_dequant_py(codes, vmin, vmax)
    bound = (vmax - vmin) / 255.0 / 2.0 + 1e-9 + abs(vmax - vmin) * 1e-12
    for d, x in zip(deq, vec):
        assert abs(d - x) <= bound * 1.0000001


@given(st.integers(min_value=2, max_value=64), st.integers(min_value=0, max_value=10))
@settings(max_examples=50)
def test_simhash_deterministic_per_seed(dim, salt):
    rng = np.random.default_rng(salt)
    v = rng.random((3, dim))
    p1 = simhash_projections(dim, seed=42)
    p2 = simhash_projections(dim, seed=42)
    assert (simhash_np(v, p1) == simhash_np(v, p2)).all()
    # scaling a vector by a positive constant never changes its simhash
    assert (simhash_np(v, p1) == simhash_np(v * 7.5, p1)).all()


@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=2,
        max_size=32,
    )
)
@settings(max_examples=100)
def test_score_convention_self_is_best(vec):
    """For L2 and cosine, a vector's best match is itself (score convention:
    higher is better)."""
    v = np.asarray(vec, dtype=np.float64)
    others = [v + 1.0, v * 0.5 + 3.0]
    self_l2 = -float(np.sum((v - v) ** 2))
    assert all(self_l2 >= -float(np.sum((v - o) ** 2)) for o in others)
    nv = np.linalg.norm(v)
    if nv > 1e-6:
        self_cos = 1.0
        for o in others:
            no = np.linalg.norm(o)
            if no > 1e-6:
                assert self_cos >= float(v @ o / (nv * no)) - 1e-12


# ---- round-4 session-4 kernels ----


def bq_pack_py(vec: list[float]) -> list[int]:
    """Word-path mirror of operators/bq.bq_words (32-bit words in longs)."""
    words = []
    for j in range((len(vec) + 31) // 32):
        w = 0
        for i in range(32):
            p = 32 * j + i
            if p < len(vec) and vec[p] > 0:
                w |= 1 << i
        words.append(w)
    return words


@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=1,
        max_size=70,
    )
)
@settings(max_examples=200)
def test_bq_pack_bits_match_numpy_path(vec):
    """The numpy byte packing and the word packing carry identical bits."""
    from pyrope_spark.operators.bq import _pack_bits

    arr = np.asarray([vec], dtype=np.float32)
    bytes_path = np.unpackbits(_pack_bits(arr), axis=1, bitorder="little")[
        0, : len(vec)
    ]
    words = bq_pack_py([float(np.float32(x)) for x in vec])
    word_bits = [(words[p // 32] >> (p % 32)) & 1 for p in range(len(vec))]
    assert list(bytes_path) == word_bits


@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 21) - 1), min_size=2, max_size=2),
    st.lists(st.integers(min_value=0, max_value=(1 << 21) - 1), min_size=2, max_size=2),
)
@settings(max_examples=100)
def test_zorder_preserves_quadrant_order(a, b):
    """If every coordinate of A <= the same coordinate of B AND they share
    the same high bits above any differing position... simplest sound
    property: z is a bijection on the grid and equals the bit-interleave
    reference."""

    def z_ref(x, y, bits=21):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    z1 = z_ref(a[0], a[1])
    z2 = z_ref(b[0], b[1])
    assert (z1 == z2) == (a == b)  # injective


def hll_rho_py(u: int, p: int) -> tuple[int, int]:
    """Mirror of the bucket/rho split in sketch.hll_build."""
    bw = 40 - p
    m = 1 << p
    bucket = u % m
    w = u // m
    rho = bw + 1 if w == 0 else bw + 1 - w.bit_length()
    return bucket, rho


@given(st.integers(min_value=0, max_value=(1 << 40) - 1), st.integers(min_value=4, max_value=12))
@settings(max_examples=300)
def test_hll_rho_ranges(u, p):
    bucket, rho = hll_rho_py(u, p)
    assert 0 <= bucket < (1 << p)
    assert 1 <= rho <= (40 - p) + 1
