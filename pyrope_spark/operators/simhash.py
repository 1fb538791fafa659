"""64-bit sign-random-projection simhash for vectors (LSH).

Reference: ``src/Pyrope.GarnetServer/Services/LshService.cs:14-70`` —
deterministic projections per (seed + dim), uniform [-1, 1), bit i set when
``dot(vector, plane_i) > 0`` (strictly greater), packed into a signed int64
as ``1L << i``.

Semantics ported exactly (seeded determinism, strict inequality, bit order);
the RNG is numpy ``default_rng(seed + dim)`` rather than C# ``Random`` — the
construction is what matters for LSH behavior, per-engine hashes only need to
be self-consistent.

Spark-first: one Arrow-batched pandas UDF computing all 64 dots as a single
(batch x dim) @ (dim x 64) GEMM. Near-duplicate queries land on the same
hash, which powers the L1 cache tier and simhash-based dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

DEFAULT_SEED = 42
DEFAULT_BITS = 64


def simhash_projections(dim: int, bits: int = DEFAULT_BITS, seed: int = DEFAULT_SEED) -> np.ndarray:
    """(bits x dim) float64 projection planes, uniform [-1, 1), seeded by
    seed + dim for independent per-dimension streams (LshService.cs:30-47)."""
    if bits > 64:
        raise ValueError("max 64 bits supported")
    rng = np.random.default_rng(seed + dim)
    return rng.uniform(-1.0, 1.0, size=(bits, dim))


def simhash_np(vectors: np.ndarray, projections: np.ndarray) -> np.ndarray:
    """(N x dim) -> int64 hashes. Bit i set iff dot > 0 (strict)."""
    dots = vectors.astype(np.float64) @ projections.T  # N x bits
    bits = (dots > 0).astype(np.uint64)
    weights = np.left_shift(np.uint64(1), np.arange(projections.shape[0], dtype=np.uint64))
    return (bits * weights[None, :]).sum(axis=1, dtype=np.uint64).view(np.int64)


def simhash_udf(dim: int, bits: int = DEFAULT_BITS, seed: int = DEFAULT_SEED):
    proj = simhash_projections(dim, bits, seed)

    @pandas_udf("long")
    def _simhash(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        mat = np.vstack(vecs.to_numpy())
        return pd.Series(simhash_np(mat, proj))

    return _simhash


def with_simhash(df, vector_col: str = "vector", out_col: str = "simhash",
                 dim: int | None = None, bits: int = DEFAULT_BITS, seed: int = DEFAULT_SEED):
    if dim is None:
        dim = len(df.select(vector_col).first()[0])
    return df.withColumn(out_col, simhash_udf(dim, bits, seed)(F.col(vector_col)))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 simhashes — native bit_count on the
    XOR, stays in codegen (used by simhash near-dup joins)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_oracle_sql(dim: int, vec_expr: str, bits: int = DEFAULT_BITS,
                       seed: int = DEFAULT_SEED, decimals: int = 7) -> str:
    """DuckDB expression computing the identical simhash: the projection
    matrix is inlined as rounded literals (both engines parse the same decimal
    to the same double), dots via list_dot_product in double.

    NOTE: the Spark UDF must use the same rounded projections for bit-exact
    parity — pass ``projections_rounded=True`` helpers below.
    """
    proj = np.round(simhash_projections(dim, bits, seed), decimals)
    rows = []
    for i in range(bits):
        w = "[" + ", ".join(repr(float(x)) for x in proj[i]) + "]"
        # DuckDB binds :: tighter than unary minus; spell out -2^63 safely
        weight = "(-9223372036854775807 - 1)" if i == 63 else f"(1::BIGINT << {i})"
        rows.append(f"({i}, {w}::DOUBLE[], {weight}::BIGINT)")
    values = ",\n".join(rows)
    return (
        f"(SELECT CAST(sum(CASE WHEN list_dot_product(CAST({vec_expr} AS DOUBLE[]), p.w) > 0 "
        f"THEN p.weight ELSE 0 END) AS BIGINT) "
        f"FROM (VALUES {values}) AS p(bit, w, weight))"
    )


def simhash_udf_rounded(dim: int, bits: int = DEFAULT_BITS, seed: int = DEFAULT_SEED,
                        decimals: int = 7):
    """Simhash with projections rounded to ``decimals`` — pairs with
    :func:`simhash_oracle_sql` for cross-engine bit-exactness."""
    proj = np.round(simhash_projections(dim, bits, seed), decimals)

    @pandas_udf("long")
    def _simhash(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        mat = np.vstack(vecs.to_numpy())
        return pd.Series(simhash_np(mat, proj))

    return _simhash
