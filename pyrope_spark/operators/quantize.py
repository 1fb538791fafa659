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
