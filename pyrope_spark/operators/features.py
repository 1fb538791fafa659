"""Feature hashing (the "hashing trick", Weinberger et al. 2009): fixed-
dimension sparse bag-of-words vectors with NO vocabulary table.

A 100 TB corpus can't build-and-broadcast a vocabulary index before
vectorizing; the hashing trick maps each token straight to a bucket in
[0, dim) with a second hash bit supplying a ±1 sign (which makes the
collision noise zero-mean — the Weinberger et al. unbiasing). The whole
vectorizer is one tokenize → explode → keyed aggregate: linear, one
shuffle on (doc, bucket), no global state of any kind.

Determinism: buckets and signs derive from the repo's Horner rolling
character hash (``char_fp_rolling``, exact integer arithmetic inside
int64) through the CMS affine-mix family — every value replicates
bit-for-bit in the DuckDB oracle. Exact zero cancellations (equal-count
tokens colliding with opposite signs) are dropped on BOTH engines, so
the sparse output is canonical.

No reference analog; this is the training-data-pipeline vectorization
primitive next to TF-IDF (which needs the corpus DF table) and BM25.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyrope_spark.functions.text import (
    FP_ROLL_P,
    char_fp_rolling,
    char_fp_rolling_sql,
    tokens,
    tokens_sql,
)

# distinct affine mixes for bucket and sign (CMS-family constants)
_BUCKET_MULT, _BUCKET_OFF = 31, 17
_SIGN_MULT, _SIGN_OFF = 37, 257


def _mix(fp: Column, mult: int, off: int) -> Column:
    return F.pmod(fp * F.lit(mult) + F.lit(off), F.lit(FP_ROLL_P))


def _mix_sql(fp_expr: str, mult: int, off: int) -> str:
    return (
        f"((({fp_expr}) * {mult} + {off}) % {FP_ROLL_P} + {FP_ROLL_P})"
        f" % {FP_ROLL_P}"
    )


def hashed_features(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    signed: bool = True,
) -> DataFrame:
    """Sparse hashed BoW: (id_col, bucket, feat_val) with
    ``bucket = mix1(fp) % dim`` and ``feat_val = Σ sign(token)·count``;
    exact zeros dropped. ``signed=False`` gives plain collision-summed
    counts (always positive, nothing to drop)."""
    if dim < 2:
        raise ValueError(f"dim must be >= 2, got {dim}")
    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    counted = tok.groupBy(id_col, "tok").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    fp = char_fp_rolling(F.col("tok"))
    bucket = (_mix(fp, _BUCKET_MULT, _BUCKET_OFF) % dim).cast("long")
    if signed:
        sign = (F.lit(1) - F.lit(2) * (_mix(fp, _SIGN_MULT, _SIGN_OFF) % 2)).cast(
            "long"
        )
    else:
        sign = F.lit(1).cast("long")
    return (
        counted.select(
            F.col(id_col),
            bucket.alias("bucket"),
            (sign * F.col("_c")).alias("_sc"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("_sc").cast("long").alias("feat_val"))
        .filter(F.col("feat_val") != 0)
    )


def hashed_features_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    signed: bool = True,
) -> str:
    """DuckDB twin of :func:`hashed_features`."""
    fp = char_fp_rolling_sql("tok")
    bucket = f"({_mix_sql(fp, _BUCKET_MULT, _BUCKET_OFF)}) % {dim}"
    sign = (
        f"(1 - 2 * (({_mix_sql(fp, _SIGN_MULT, _SIGN_OFF)}) % 2))"
        if signed
        else "1"
    )
    return f"""
WITH tk AS (SELECT {id_col}, unnest({tokens_sql(text_col)}) AS tok
            FROM {table}),
counted AS (
  SELECT {id_col}, tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1, 2
), mapped AS (
  SELECT {id_col}, CAST({bucket} AS BIGINT) AS bucket,
         {sign} * c AS sc
  FROM counted
)
SELECT {id_col}, bucket, CAST(SUM(sc) AS BIGINT) AS feat_val
FROM mapped GROUP BY 1, 2 HAVING SUM(sc) <> 0
"""
