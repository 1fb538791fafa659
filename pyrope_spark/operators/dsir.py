"""DSIR-style importance weights for targeted data selection (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling" —
beyond the reference, per the BASELINE.json north star). Given a *target*
corpus (what you want more of: wiki-like, high-quality, in-domain) and the
*raw* pool, every raw document gets ``log p_target(x) - p_raw(x)`` under
hashed bag-of-n-gram multinomial models; resampling raw data with these
weights shifts the mixture toward the target distribution.

Features are word unigrams + bigrams hashed into ``n_buckets`` (the paper
uses hashed n-grams precisely so the model is two count arrays). The hash
is the engine-portable ``char_fp_rolling`` (Horner rolling fingerprint,
``functions/text.py`` — upgraded from char_fp, whose arithmetic-progression
weights collide systematically on structured vocabularies and would bias
bucket counts) mod n_buckets — NOT an engine-native hash — so the DuckDB
oracle replicates bucketing bit-for-bit. Laplace (+1) smoothing
makes unseen buckets finite:

    contrib(b) = ln(c_target[b]+1) - ln(T_target+B)
               - ln(c_raw[b]+1)   + ln(T_raw+B)
    log_ratio(doc) = sum over the doc's feature occurrences of contrib

100 TB shape: each model IS a bucket-count DataFrame of at most ``n_buckets``
rows (tiny; AQE broadcasts them into the scoring joins). Training is one
explode + groupBy per corpus — the shuffle carries buckets, not documents.
Scoring is one explode + two broadcast joins + one groupBy(doc). No driver
state anywhere.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyrope_spark.functions.text import (
    char_fp_rolling,
    char_fp_rolling_sql,
    tokens,
    tokens_sql,
    word_ngrams_from_tokens,
    word_ngrams_from_tokens_sql,
)

N_BUCKETS_DEFAULT = 4096


class BucketModel(NamedTuple):
    counts: DataFrame  # (bucket, c)
    totals: DataFrame  # 1 row: (total,)


def doc_features(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> DataFrame:
    """(doc_id, bucket) per feature OCCURRENCE (unigrams + bigrams, hashed).
    Occurrences, not distinct features — the multinomial model counts every
    token, exactly as the paper's bag-of-ngrams does."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_t")
    )
    feats = F.concat(F.col("_t"), word_ngrams_from_tokens(F.col("_t"), 2))
    return toks.select("doc_id", F.explode(feats).alias("_f")).select(
        "doc_id", F.pmod(char_fp_rolling(F.col("_f")), F.lit(n_buckets)).alias("bucket")
    )


def train_bucket_model(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> BucketModel:
    feats = doc_features(
        docs, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    )
    counts = feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(F.sum("c").cast("long").alias("total"))
    return BucketModel(counts, totals)


def dsir_log_ratio(
    docs: DataFrame,
    target: BucketModel,
    raw: BucketModel,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> DataFrame:
    """Per-doc ``(doc_id, n_features, log_ratio)``; higher = more
    target-like. Docs with zero features keep NULL log_ratio."""
    feats = doc_features(
        docs, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    )
    tcounts = target.counts.select("bucket", F.col("c").alias("c_t"))
    rcounts = raw.counts.select("bucket", F.col("c").alias("c_r"))
    ttot = target.totals.select(F.col("total").alias("t_t"))
    rtot = raw.totals.select(F.col("total").alias("t_r"))
    scored = (
        feats.join(tcounts, "bucket", "left")
        .join(rcounts, "bucket", "left")
        .crossJoin(F.broadcast(ttot))
        .crossJoin(F.broadcast(rtot))
        .withColumn(
            "_contrib",
            F.log(F.coalesce(F.col("c_t"), F.lit(0)).cast("double") + F.lit(1.0))
            - F.log((F.col("t_t") + F.lit(n_buckets)).cast("double"))
            - F.log(F.coalesce(F.col("c_r"), F.lit(0)).cast("double") + F.lit(1.0))
            + F.log((F.col("t_r") + F.lit(n_buckets)).cast("double")),
        )
    )
    stats = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_features"),
        F.round(F.sum("_contrib"), 6).alias("log_ratio"),
    )
    all_docs = docs.select(F.col(id_col).alias("doc_id"))
    return all_docs.join(stats, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_features"), F.lit(0).cast("long")).alias("n_features"),
        "log_ratio",
    )


def dsir_log_ratio_self(
    docs: DataFrame,
    *,
    target_pred: F.Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> DataFrame:
    """Fused train-and-score for the common self-referential setup where
    the RAW model is the full ``docs`` table and the TARGET model is the
    rows matching ``target_pred`` (a boolean Column over ``docs``).

    Value-identical to ``train_bucket_model(docs.filter(target_pred))`` +
    ``train_bucket_model(docs)`` + ``dsir_log_ratio(docs, ...)`` — the
    bucket counts, totals, and per-occurrence contribution terms are the
    same numbers — but the tokenize+bigram+explode+hash pipeline runs
    ONCE over the corpus instead of three times (r10 opt, guide §1.2):
    the exploded feature table is persisted, both models come out of a
    single bucket-keyed aggregate over it (c_raw = count, c_target =
    conditional count), and scoring broadcast-joins the one counts table
    (<= n_buckets rows) back onto the same persisted features.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        target_pred.cast("boolean").alias("_is_t"),
        tokens(F.col(text_col)).alias("_t"),
    )
    feat_arr = F.concat(F.col("_t"), word_ngrams_from_tokens(F.col("_t"), 2))
    feats = (
        toks.select("doc_id", "_is_t", F.explode(feat_arr).alias("_f"))
        .select(
            "doc_id",
            "_is_t",
            F.pmod(char_fp_rolling(F.col("_f")), F.lit(n_buckets)).alias(
                "bucket"
            ),
        )
        .persist()
    )
    counts = feats.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("c_r"),
        F.sum(F.col("_is_t").cast("int")).alias("c_t"),
    )
    totals = counts.agg(
        F.sum("c_r").cast("long").alias("t_r"),
        # nullif: the UN-fused composition aggregates target totals over
        # the target-only counts table, which is EMPTY when target_pred
        # matches no rows (or only token-less docs) — its t_t is NULL and
        # poisons every contribution to NULL log_ratio. The fused
        # conditional sum would yield 0 there; 0 cannot otherwise occur
        # (per-bucket counts are >= 1), so mapping 0 -> NULL reproduces
        # the composition exactly (r10 ADVICE).
        F.nullif(F.sum("c_t").cast("long"), F.lit(0)).alias("t_t"),
    )
    scored = (
        feats.join(F.broadcast(counts), "bucket")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "_contrib",
            F.log(F.coalesce(F.col("c_t"), F.lit(0)).cast("double") + F.lit(1.0))
            - F.log((F.col("t_t") + F.lit(n_buckets)).cast("double"))
            - F.log(F.coalesce(F.col("c_r"), F.lit(0)).cast("double") + F.lit(1.0))
            + F.log((F.col("t_r") + F.lit(n_buckets)).cast("double")),
        )
    )
    stats = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_features"),
        F.round(F.sum("_contrib"), 6).alias("log_ratio"),
    )
    all_docs = docs.select(F.col(id_col).alias("doc_id"))
    out = all_docs.join(stats, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_features"), F.lit(0).cast("long")).alias("n_features"),
        "log_ratio",
    )
    # doc-sized result: materialize so the occurrence-sized feats blocks
    # release before returning (the source_shingle_overlap discipline)
    out = out.localCheckpoint(eager=True)
    feats.unpersist()
    return out


def dsir_oracle_sql(
    *,
    n_buckets: int = N_BUCKETS_DEFAULT,
    docs_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    target_pred: str = "lang = 'en'",
) -> str:
    """DuckDB rendering: same rolling-fp bucketing, counts, smoothing, and
    branch-free contribution sum. Raw model = the full table."""
    t = tokens_sql(text_col)
    ngrams = word_ngrams_from_tokens_sql("tk", 2)
    fp = char_fp_rolling_sql("u.f")
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, {target_pred} AS is_target, {t} AS tk
  FROM {docs_table}
),
featdocs AS (
  SELECT doc_id, is_target, list_concat(tk, {ngrams}) AS fs FROM base
),
feats AS (
  SELECT doc_id, is_target, ({fp}) % {n_buckets} AS bucket
  FROM featdocs, unnest(fs) AS u(f)
),
tcounts AS (
  SELECT bucket, count(*) AS c_t FROM feats WHERE is_target GROUP BY bucket
),
rcounts AS (
  SELECT bucket, count(*) AS c_r FROM feats GROUP BY bucket
),
ttot AS (SELECT COALESCE(sum(c_t), 0) AS t_t FROM tcounts),
rtot AS (SELECT COALESCE(sum(c_r), 0) AS t_r FROM rcounts),
scored AS (
  SELECT f.doc_id,
         ln(CAST(COALESCE(tc.c_t, 0) AS DOUBLE) + 1.0)
         - ln(CAST(tt.t_t + {n_buckets} AS DOUBLE))
         - ln(CAST(COALESCE(rc.c_r, 0) AS DOUBLE) + 1.0)
         + ln(CAST(rt.t_r + {n_buckets} AS DOUBLE)) AS contrib
  FROM feats f
  LEFT JOIN tcounts tc USING (bucket)
  LEFT JOIN rcounts rc USING (bucket)
  CROSS JOIN ttot tt CROSS JOIN rtot rt
),
stats AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_features,
         round(sum(contrib), 6) AS log_ratio
  FROM scored GROUP BY doc_id
)
SELECT b.doc_id, COALESCE(s.n_features, 0) AS n_features, s.log_ratio
FROM base b LEFT JOIN stats s USING (doc_id)
"""
