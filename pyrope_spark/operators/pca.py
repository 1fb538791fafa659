"""Distributed PCA over an embedding column.

The scale story is the textbook one for 100 TB: PCA on a d-dim column
needs only the (d, d) second-moment matrix plus the d-vector sum — both
are commutative-monoid sufficient statistics, so the corpus pass is ONE
``mapInPandas`` sweep emitting a (n, sum, gram) partial per Arrow batch
(d=64 → ~33 KB each), summed on the driver (thousands of partial rows
even at 1000 executors — never the data). The eigendecomposition runs
on the driver over the (d, d) covariance — microseconds — and the
projection broadcasts the (d, k) component matrix back through one
vectorized pandas UDF. No corpus-sized shuffle anywhere; the whole
operator is two linear passes.

Determinism: partial float sums arrive in partition order, so the last
reduction is done in a SORTED order over the partial rows (stable
regardless of scheduling); component signs are pinned by making each
eigenvector's largest-|coordinate| entry positive (numpy ``eigh`` is
deterministic given identical input). Cross-partitioning runs agree to
float tolerance (the partial-sum grouping differs), which is why the
oracled gate query (``embedding_gram_micro`` in queries.py) checks the
integer-micro Gram pipeline instead — exact BIGINT sums over
``floor(x·1e6)`` values are layout-free on both engines.

No reference analog (the reference has no decomposition op); PCA is the
standard embedding-column companion (whitening before near-dup /
cluster passes, variance audits, Matryoshka-style truncation checks).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PcaModel:
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (k, d) rows = top components, sign-pinned
    eigvals: np.ndarray       # (k,) descending
    total_var: float          # trace of the covariance
    n: int

    @property
    def explained_ratio(self) -> np.ndarray:
        return self.eigvals / self.total_var if self.total_var > 0 else self.eigvals * 0.0


def _suffstats(df: DataFrame, vec_col: str) -> tuple[int, np.ndarray, np.ndarray]:
    """One corpus pass -> (n, sum (d,), gram (d,d)) via per-batch partials."""

    def part(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [np.int64(x.shape[0])],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    parts = (
        df.select(vec_col)
        .mapInPandas(part, "n long, s array<double>, g array<double>")
        .collect()
    )
    if not parts:
        raise ValueError("empty input")
    # sort partials so the float reduction order is scheduling-independent
    parts = sorted(parts, key=lambda r: (r["n"], r["s"], r["g"]))
    d = len(parts[0]["s"])
    n = 0
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in parts:
        n += r["n"]
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    return n, s, g


def pca_fit(
    df: DataFrame, *, vec_col: str = "embedding", n_components: int = 8
) -> PcaModel:
    n, s, g = _suffstats(df, vec_col)
    if n < 2:
        raise ValueError(f"need >= 2 rows, got {n}")
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    cov = (cov + cov.T) / 2.0
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T                  # (k, d)
    # sign pin: largest-|coordinate| entry positive (first index on ties)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PcaModel(
        mean=mean,
        components=comps,
        eigvals=vals[order],
        total_var=float(np.trace(cov)),
        n=int(n),
    )


def pca_project(
    df: DataFrame,
    model: PcaModel,
    *,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append ``out_col`` = (x - mean) @ components.T as array<double> —
    one Arrow-vectorized map, components ride the closure broadcast."""
    mean = model.mean.copy()
    comps = model.components.copy()

    @F.pandas_udf("array<double>")
    def proj(col):
        import pandas as pd

        out = []
        for v in col:
            x = np.asarray(v, dtype=np.float64) - mean
            out.append((comps @ x).tolist())
        return pd.Series(out)

    return df.withColumn(out_col, proj(F.col(vec_col)))
