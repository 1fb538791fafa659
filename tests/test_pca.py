"""Distributed PCA (operators/pca.py): planted-component recovery,
variance accounting, projection round-trip, layout stability."""

from __future__ import annotations

import numpy as np
import pytest

from pyrope_spark.operators.pca import pca_fit, pca_project


def _planted_df(spark, n=400, d=16, seed=7):
    """x = 10*z1*v1 + 3*z2*v2 + 0.05*noise with orthonormal v1 ⟂ v2."""
    r = np.random.default_rng(seed)
    v1 = np.zeros(d)
    v1[0] = 1.0
    v2 = np.zeros(d)
    v2[1] = 1.0
    z = r.standard_normal((n, 2))
    x = 10.0 * np.outer(z[:, 0], v1) + 3.0 * np.outer(z[:, 1], v2)
    x += 0.05 * r.standard_normal((n, d))
    rows = [(i, x[i].tolist()) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, v1, v2, x


def test_pca_recovers_planted_components(spark):
    df, v1, v2, _ = _planted_df(spark)
    m = pca_fit(df, n_components=3)
    assert abs(float(np.dot(m.components[0], v1))) > 0.99
    assert abs(float(np.dot(m.components[1], v2))) > 0.99
    assert m.eigvals[0] > m.eigvals[1] > m.eigvals[2] >= 0
    # the two planted directions carry ~all the variance
    assert (m.eigvals[0] + m.eigvals[1]) / m.total_var > 0.99


def test_pca_projection_roundtrip(spark):
    df, _, _, x = _planted_df(spark, n=200, d=8)
    m = pca_fit(df, n_components=8)  # full rank: lossless
    out = pca_project(df, m).orderBy("vec_id").collect()
    proj = np.array([r["pca"] for r in out])
    recon = proj @ m.components + m.mean
    assert np.max(np.abs(recon - x)) < 1e-8


def test_pca_sign_pinned_and_layout_stable(spark):
    df, _, _, _ = _planted_df(spark, n=300, d=12, seed=11)
    a = pca_fit(df, n_components=4)
    b = pca_fit(df.repartition(7), n_components=4)
    # sign pin: largest-|coord| entry positive
    for c in a.components:
        assert c[int(np.argmax(np.abs(c)))] > 0
    assert np.allclose(a.components, b.components, atol=1e-8)
    assert np.allclose(a.eigvals, b.eigvals, atol=1e-8)
    assert a.n == b.n == 300


def test_pca_explained_ratio_and_guards(spark):
    df, _, _, _ = _planted_df(spark, n=100, d=6)
    m = pca_fit(df, n_components=6)
    assert abs(float(m.explained_ratio.sum()) - 1.0) < 1e-9
    one = df.limit(1)
    with pytest.raises(ValueError):
        pca_fit(one)
    empty = df.filter("vec_id < 0")
    with pytest.raises(ValueError):
        pca_fit(empty)
