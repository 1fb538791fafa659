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
