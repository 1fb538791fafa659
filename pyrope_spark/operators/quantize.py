"""SQ8 scalar quantization as native column expressions.

Reference: per-vector min-max quantization to bytes 0..255 with (min, max)
params + dequantize (``src/Pyrope.GarnetServer/Vector/ScalarQuantizer.cs:8-86``),
used to cut memory bandwidth on brute-force scans
(``VectorMath.cs:435-681``, 1.54x QPS in BASELINE.md).

Spark-first: the quantizer is arithmetic over arrays — ``array_min/max`` +
``transform`` — which stays in whole-stage codegen. Rounding is written as
``floor(x + 0.5)`` explicitly so the DuckDB oracle computes the identical
integer (no engine-specific round-half modes). Codes are ``ARRAY<INT>``
(0..255); production storage would pack to BINARY, but Parquet's dictionary +
byte-packing already stores small ints compactly.

In Spark the primary win of SQ8 at 100 TB is scan I/O: a 128-dim float32
vector is 512 B, its SQ8 form 128 B + 16 B params — a 4x smaller columnar
scan before any kernel runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sq8_min(vec: Column) -> Column:
    return F.array_min(vec).cast("double")


def sq8_max(vec: Column) -> Column:
    return F.array_max(vec).cast("double")


def sq8_codes(vec: Column, vmin: Column | None = None, vmax: Column | None = None) -> Column:
    """Quantize to 0..255 (reference ScalarQuantizer.cs:22-43; constant
    vector -> all zeros, range 0, ``:45-51``)."""
    vmin = sq8_min(vec) if vmin is None else vmin
    vmax = sq8_max(vec) if vmax is None else vmax
    rng = vmax - vmin
    q = lambda x: F.least(  # noqa: E731
        F.lit(255),
        F.greatest(
            F.lit(0),
            F.floor((x.cast("double") - vmin) * F.lit(255.0) / rng + F.lit(0.5)).cast("int"),
        ),
    )
    return F.when(rng <= 0, F.transform(vec, lambda x: F.lit(0))).otherwise(
        F.transform(vec, q)
    )


def sq8_dequantize(codes: Column, vmin: Column, vmax: Column) -> Column:
    """codes -> ARRAY<DOUBLE> (reference ScalarQuantizer.cs:64-86)."""
    rng = vmax - vmin
    return F.transform(
        codes, lambda c: vmin + c.cast("double") * rng / F.lit(255.0)
    )


def with_sq8(df: DataFrame, vector_col: str = "vector", prefix: str = "sq8") -> DataFrame:
    """Attach ``{prefix}_codes/_min/_max`` columns — the storage layout for a
    quantized index table."""
    vec = F.col(vector_col)
    return (
        df.withColumn(f"{prefix}_min", sq8_min(vec))
        .withColumn(f"{prefix}_max", sq8_max(vec))
        .withColumn(f"{prefix}_codes", sq8_codes(vec, F.col(f"{prefix}_min"), F.col(f"{prefix}_max")))
    )


def sq8_oracle_sql(vec_expr: str) -> dict[str, str]:
    """DuckDB renderings kept in lockstep with the Spark expressions."""
    vmin = f"CAST(list_min({vec_expr}) AS DOUBLE)"
    vmax = f"CAST(list_max({vec_expr}) AS DOUBLE)"
    rng = f"({vmax} - {vmin})"
    codes = (
        f"CASE WHEN {rng} <= 0 THEN list_transform({vec_expr}, x -> 0) "
        f"ELSE list_transform({vec_expr}, x -> CAST(least(255, greatest(0, "
        f"floor((CAST(x AS DOUBLE) - {vmin}) * 255.0 / {rng} + 0.5))) AS INT)) END"
    )
    return {"vmin": vmin, "vmax": vmax, "codes": codes}


def sq8_reconstruction_error(
    df: DataFrame,
    *,
    vector_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Quantization QA: encode→decode every vector through the SQ8 path
    ([[sq8_codes]]/[[sq8_dequantize]], reference ScalarQuantizer.cs
    round-trip) and report the corpus-level reconstruction error — the
    audit run before trading recall for 4× smaller segments (theoretical
    per-element bound: range/510, so ~1,961 micro on a unit-range
    corpus).

    Hash-stable float discipline: the per-ELEMENT error is floored into
    integer micro units first (both engines execute the identical IEEE
    expression per element), and only the integers are summed — a float
    SUM then floor would inherit summation-order ulps.

    Output one row: vector/element counts, max and mean error in micro.

    Scale shape: one mapPartitions-free expression pass over the corpus
    + one 1-row aggregate; nothing leaves the executors but suffstats.
    """
    vec = F.col(vector_col)
    vmin = sq8_min(vec)
    vmax = sq8_max(vec)
    deq = sq8_dequantize(sq8_codes(vec, vmin, vmax), vmin, vmax)
    errs = F.zip_with(
        vec, deq, lambda x, d: F.floor(F.abs(x.cast("double") - d) * scale)
    )
    per_vec = df.select(
        F.aggregate(
            errs, F.lit(0).cast("long"), lambda acc, e: acc + e.cast("long")
        ).alias("err_sum"),
        F.array_max(errs).cast("long").alias("err_max"),
        F.size(vec).cast("long").alias("dim"),
    )
    return per_vec.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum("dim").cast("long").alias("n_elems"),
        F.max("err_max").cast("long").alias("max_err_micro"),
        F.expr(
            "CAST(CAST(SUM(err_sum) AS DECIMAL(38,0)) DIV SUM(dim) "
            "AS BIGINT)"
        ).alias("mean_err_micro"),
    )


def sq8_reconstruction_error_oracle_sql(
    *,
    table: str = "embeddings",
    vector_sql: str = "embedding",
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of [[sq8_reconstruction_error]] (same per-element
    IEEE expression, same integer-micro-first discipline)."""
    o = sq8_oracle_sql(vector_sql)
    vmin, vmax, codes = o["vmin"], o["vmax"], o["codes"]
    rng = f"({vmax} - {vmin})"
    deq = (
        f"list_transform({codes}, c -> {vmin} + CAST(c AS DOUBLE)"
        f" * {rng} / 255.0)"
    )
    return f"""
WITH per_vec AS (
  SELECT list_transform(
           list_zip({vector_sql}, {deq}),
           p -> CAST(floor(abs(CAST(p[1] AS DOUBLE) - p[2]) * {scale})
                     AS BIGINT)
         ) AS errs,
         CAST(len({vector_sql}) AS BIGINT) AS dim
  FROM {table}
),
stats AS (
  SELECT list_sum(errs) AS err_sum, list_max(errs) AS err_max, dim
  FROM per_vec
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(dim) AS BIGINT) AS n_elems,
       CAST(MAX(err_max) AS BIGINT) AS max_err_micro,
       CAST(SUM(err_sum) // SUM(dim) AS BIGINT) AS mean_err_micro
FROM stats
"""
