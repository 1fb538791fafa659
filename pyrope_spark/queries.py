"""The declared query surface: every operator exposed through
``__spark_entry__.queries()`` with a DuckDB oracle where SQL-expressible.

Each entry is ``name -> (spark_fn, oracle_sql | None)``. The driver runs both
at sf=0.01 and hash-compares (row count + schema + order-insensitive value
hash), so every computed column is aliased identically on both sides, floats
are rounded, and ranks/ counts are cast to BIGINT.

The vector workload uses the ``embeddings`` table (vec_id BIGINT,
embedding ARRAY<FLOAT> dim 64, label INT); the first ``N_QUERIES`` rows
double as the query set (deterministic, self-contained).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyrope_spark.catalog import load_table
from pyrope_spark.functions.vector import oracle_score_sql
from pyrope_spark.operators.knn import knn_bruteforce
from pyrope_spark.session import configure_for_oracle

N_QUERIES = 8
TOP_K = 10

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


# --------------------------------------------------------------------------
# Brute-force KNN over embeddings (reference: BruteForceVectorIndex.cs:275-379)
# --------------------------------------------------------------------------

def _knn_oracle(metric: str) -> str:
    score = oracle_score_sql(metric, "q.qv", "v.embedding")
    return f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}
), s AS (
  SELECT CAST(q.qid AS VARCHAR) AS query_id,
         CAST(v.vec_id AS VARCHAR) AS id,
         {score} AS score
  FROM q CROSS JOIN embeddings v
), r AS (
  SELECT query_id, id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id ASC) AS rnk
  FROM s
)
SELECT query_id, id, CAST(rnk AS BIGINT) AS rank, round(score, 6) AS score
FROM r WHERE rnk <= {TOP_K}
"""


def _knn_spark(spark: SparkSession, sf_dir: str, metric: str) -> DataFrame:
    configure_for_oracle(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    vectors = emb.select(F.col("vec_id").cast("string").alias("id"), F.col("embedding").alias("vector"))
    qs = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").cast("string").alias("query_id"), F.col("embedding").alias("vector")
    )
    hits = knn_bruteforce(vectors, qs, k=TOP_K, metric=metric, impl="expr")
    return hits.select(
        "query_id",
        "id",
        F.col("rank").cast("long").alias("rank"),
        F.round(F.col("score"), 6).alias("score"),
    )


for _metric in ("l2", "ip", "cosine"):
    register(f"knn_bruteforce_{_metric}", _knn_oracle(_metric))(
        lambda spark, sf_dir, m=_metric: _knn_spark(spark, sf_dir, m)
    )


# --------------------------------------------------------------------------
# IVF-Flat (reference: IvfFlatVectorIndex.cs:85-231)
# --------------------------------------------------------------------------

IVF_NLIST = 16


def _ivf_spark(spark: SparkSession, sf_dir: str, nprobe: int) -> DataFrame:
    from pyrope_spark.operators.ivf import build_ivf, ivf_search

    configure_for_oracle(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    vectors = emb.select(
        F.col("vec_id").cast("string").alias("id"), F.col("embedding").alias("vector")
    )
    qs = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").cast("string").alias("query_id"), F.col("embedding").alias("vector")
    )
    assigned, model = build_ivf(vectors, nlist=IVF_NLIST, metric="l2")
    hits = ivf_search(assigned, model, qs, k=TOP_K, nprobe=nprobe)
    return hits.select(
        "query_id",
        "id",
        F.col("rank").cast("long").alias("rank"),
        F.round(F.col("score"), 6).alias("score"),
    )


# nprobe = nlist ⇒ exact: the brute-force SQL oracle applies verbatim
register("ivf_flat_search_exact", _knn_oracle("l2"))(
    lambda spark, sf_dir: _ivf_spark(spark, sf_dir, IVF_NLIST)
)
# approximate path: no SQL oracle (recall-gated in tests/test_ivf.py instead)
register("ivf_flat_search_nprobe3", None)(
    lambda spark, sf_dir: _ivf_spark(spark, sf_dir, 3)
)


# --------------------------------------------------------------------------
# SQ8 scalar quantization (reference: ScalarQuantizer.cs:8-86)
# --------------------------------------------------------------------------

def _sq8_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyrope_spark.operators.quantize import with_sq8

    configure_for_oracle(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = with_sq8(emb.select(F.col("vec_id"), F.col("embedding").alias("vector")))
    return q.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.aggregate(F.col("sq8_codes"), F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "code_sum"
        ),
        F.round(F.col("sq8_min"), 6).alias("vmin"),
        F.round(F.col("sq8_max"), 6).alias("vmax"),
    )


def _sq8_oracle() -> str:
    from pyrope_spark.operators.quantize import sq8_oracle_sql

    o = sq8_oracle_sql("embedding")
    return f"""
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(list_sum({o['codes']}) AS BIGINT) AS code_sum,
       round({o['vmin']}, 6) AS vmin,
       round({o['vmax']}, 6) AS vmax
FROM embeddings
"""


register("sq8_quantize", _sq8_oracle())(_sq8_spark)


# ---------------------------------------------------------------------------
# PQ / IVF-PQ (reference: ProductQuantizer.cs, IvfPqVectorIndex.cs) —
# k-means-trained codebooks are not SQL-expressible; recall thresholds are
# asserted in tests/test_quantize.py, the driver records a rows-only check.
# ---------------------------------------------------------------------------

def _pq_adc_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyrope_spark.operators.pq import pq_adc_search, pq_encode, train_pq

    configure_for_oracle(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    vectors = emb.select(
        F.col("vec_id").cast("string").alias("id"), F.col("embedding").alias("vector")
    )
    qs = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").cast("string").alias("query_id"), F.col("embedding").alias("vector")
    )
    model = train_pq(vectors, m=8, k=64)
    enc = pq_encode(vectors, model)
    hits = pq_adc_search(enc, model, qs, k=TOP_K)
    return hits.select(
        "query_id", "id", F.col("rank").cast("long").alias("rank"),
        F.round(F.col("score"), 6).alias("score"),
    )


register("pq_adc_search", None)(_pq_adc_spark)


def _ivf_pq_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyrope_spark.operators.pq import build_ivf_pq, ivf_pq_search

    configure_for_oracle(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    vectors = emb.select(
        F.col("vec_id").cast("string").alias("id"), F.col("embedding").alias("vector")
    )
    qs = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").cast("string").alias("query_id"), F.col("embedding").alias("vector")
    )
    encoded, model = build_ivf_pq(vectors, nlist=8, m=8, k=64)
    hits = ivf_pq_search(encoded, model, qs, k=TOP_K, nprobe=3)
    return hits.select(
        "query_id", "id", F.col("rank").cast("long").alias("rank"),
        F.round(F.col("score"), 6).alias("score"),
    )


register("ivf_pq_search", None)(_ivf_pq_spark)


# --------------------------------------------------------------------------
# Simhash LSH (reference: Services/LshService.cs:14-70) — bit-exact across
# engines via rounded projection literals inlined into the oracle SQL.
# --------------------------------------------------------------------------

EMB_DIM = 64


def _simhash_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyrope_spark.operators.simhash import simhash_udf_rounded

    configure_for_oracle(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        simhash_udf_rounded(EMB_DIM)(F.col("embedding")).alias("simhash"),
    )


def _simhash_oracle() -> str:
    from pyrope_spark.operators.simhash import simhash_oracle_sql

    return (
        "SELECT CAST(vec_id AS BIGINT) AS vec_id, "
        + simhash_oracle_sql(EMB_DIM, "embedding")
        + " AS simhash FROM embeddings"
    )


register("simhash64", _simhash_oracle())(_simhash_spark)


# --------------------------------------------------------------------------
# QueryKey RoundK buckets (reference: Model/QueryKey.cs:52-60)
# --------------------------------------------------------------------------

def _round_k_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyrope_spark.operators.cache import round_k

    configure_for_oracle(spark)
    ev = load_table(spark, sf_dir, "events")
    k = (F.col("event_id") % 130 + 1).cast("int")
    return ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        round_k(k).cast("long").alias("rk"),
    )


register(
    "querykey_round_k",
    """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(CASE WHEN k <= 5 THEN 5 WHEN k <= 10 THEN 10 WHEN k <= 20 THEN 20
                 WHEN k <= 50 THEN 50 WHEN k <= 100 THEN 100 ELSE k END AS BIGINT) AS rk
FROM (SELECT event_id, CAST(event_id % 130 + 1 AS INT) AS k FROM events)
""",
)(_round_k_spark)
