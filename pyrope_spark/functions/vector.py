"""Distance kernels as native Spark SQL column expressions.

Reference kernels: SIMD dot / L2² / norm / cosine over float32
(``src/Pyrope.GarnetServer/Vector/VectorMath.cs:8-125``). The Spark-first
equivalent is ``zip_with`` + ``aggregate`` — these stay inside whole-stage
codegen on the JVM, so there is no Python/serde cost, and Tungsten's columnar
Parquet reads give the "contiguous float buffer" memory layout the reference
hand-builds.

Accumulation is done in DOUBLE regardless of the input element type so that
results are hash-comparable with the DuckDB oracle (which promotes to double).

Score convention (higher is better), ported from
``Vector/BruteForceVectorIndex.cs:350-356``:
  L2           -> negative squared distance
  InnerProduct -> dot product
  Cosine       -> cosine similarity (0.0 when either norm < 1e-6,
                  ``Vector/VectorMath.cs:105``)

For the batch hot loop (millions of vectors x many queries) prefer the
vectorized GEMM path in ``pyrope_spark.operators.knn`` — BLAS beats per-row
codegen by a wide margin at dim >= 64; these expressions are the exact,
oracle-parity path and the building block for derived columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ZERO_NORM_EPS = 1e-6

VALID_METRICS = ("l2", "ip", "cosine")


def _as_double(c: Column) -> Column:
    return c.cast("double")


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i in double precision (reference: VectorMath.cs:8-37)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _as_double(x) * _as_double(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_sq(a: Column, b: Column) -> Column:
    """Σ (a_i - b_i)² in double precision (reference: VectorMath.cs:39-70)."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (_as_double(x) - _as_double(y)) * (_as_double(x) - _as_double(y))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """Euclidean norm (reference: VectorMath.cs:72-100)."""
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column, norm_a: Column | None = None, norm_b: Column | None = None) -> Column:
    """Cosine similarity with zero-norm guard -> 0.0
    (reference: VectorMath.cs:102-125; guard at :105).

    Pass precomputed ``norm_a`` / ``norm_b`` columns to reuse stored norms —
    the reference caches per-record norms the same way
    (``BruteForceVectorIndex.cs:146``).
    """
    na = norm(a) if norm_a is None else norm_a
    nb = norm(b) if norm_b is None else norm_b
    return F.when(
        (na < F.lit(ZERO_NORM_EPS)) | (nb < F.lit(ZERO_NORM_EPS)), F.lit(0.0)
    ).otherwise(dot(a, b) / (na * nb))


def score(metric: str, query: Column, vec: Column, norm_q: Column | None = None, norm_v: Column | None = None) -> Column:
    """Metric dispatch, higher-is-better
    (reference: BruteForceVectorIndex.cs:350-356, KMeansUtils.cs:78-84)."""
    metric = normalize_metric(metric)
    if metric == "l2":
        return -l2_sq(query, vec)
    if metric == "ip":
        return dot(query, vec)
    return cosine_sim(query, vec, norm_q, norm_v)


def normalize_metric(metric: str) -> str:
    m = metric.strip().lower()
    aliases = {
        "l2": "l2",
        "euclidean": "l2",
        "ip": "ip",
        "innerproduct": "ip",
        "inner_product": "ip",
        "dot": "ip",
        "cosine": "cosine",
        "cos": "cosine",
    }
    if m not in aliases:
        raise ValueError(f"unknown metric {metric!r}; expected one of {VALID_METRICS}")
    return aliases[m]


def oracle_score_sql(metric: str, query_expr: str, vec_expr: str) -> str:
    """The DuckDB-SQL rendering of :func:`score` — kept next to the Spark
    expression so the two stay in lockstep for the correctness gate."""
    metric = normalize_metric(metric)
    q = f"CAST({query_expr} AS DOUBLE[])"
    v = f"CAST({vec_expr} AS DOUBLE[])"
    if metric == "l2":
        return f"(0.0 - (list_distance({q}, {v}) ^ 2))"
    if metric == "ip":
        return f"list_dot_product({q}, {v})"
    return (
        f"(CASE WHEN sqrt(list_dot_product({q}, {q})) < 1e-6 "
        f"OR sqrt(list_dot_product({v}, {v})) < 1e-6 THEN 0.0 "
        f"ELSE list_dot_product({q}, {v}) / "
        f"(sqrt(list_dot_product({q}, {q})) * sqrt(list_dot_product({v}, {v}))) END)"
    )
