"""N-gram language-model scoring for corpus quality filtering (beyond the
reference, per the BASELINE.json north star). The CCNet/Gopher-family
pipelines bucket documents by LM perplexity against a reference corpus; this
module is that signal as a pure DataFrame job: train bigram/unigram counts on
a reference split, score every document with Stupid Backoff (Brants et al.
2007 — no discounting, a fixed backoff multiplier, the standard web-scale
choice because counts stay raw and the whole model is two count tables).

Scoring per token position i >= 2 (natural log; alpha = 0.4):

    bigram seen:    logp = ln( c(w_{i-1}, w_i) / c(w_{i-1}) )
    unigram backoff: logp = ln( alpha * c(w_i) / T )        # T = corpus tokens
    OOV floor:       logp = ln( alpha * 1 / T )

Doc outputs: position count, mean logp (higher = more reference-like), and
the backoff fraction (how often the bigram table missed — its own junk
signal).

100 TB shape: the model IS two count DataFrames — no driver state, no
pickled artifact. Training is two explode + groupBy passes (map-side partial
aggregation; the shuffle carries the *vocabulary*, not the corpus). Scoring
joins the document bigram stream against the count tables keyed (w1, w2) /
(w) — plain shuffle hash joins that AQE converts to broadcast when the
reference split is small — then one groupBy(doc_id). Count tables for a
fixed reference corpus are materialized once and reused across scoring runs.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyrope_spark.functions.text import tokens, tokens_sql

ALPHA_DEFAULT = 0.4


class BigramLm(NamedTuple):
    """Two count tables + the scalar total as a 1-row DataFrame (collect-free)."""

    unigrams: DataFrame  # (w, c1)
    bigrams: DataFrame  # (w1, w2, c12)
    totals: DataFrame  # (total_tokens,)


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, w1, w2) per adjacent token pair — one projection + explode."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_t")
    )
    pairs = F.arrays_zip(
        F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))).alias("w1"),
        F.slice(F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))).alias("w2"),
    )
    return toks.select("doc_id", F.explode(pairs).alias("_p")).select(
        "doc_id", F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )


def train_bigram_lm(
    train_docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> BigramLm:
    toks = train_docs.select(tokens(F.col(text_col)).alias("_t"))
    unigrams = (
        toks.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bigrams = (
        _doc_bigrams(train_docs, text_col, id_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    totals = unigrams.agg(F.sum("c1").cast("long").alias("total_tokens"))
    return BigramLm(unigrams, bigrams, totals)


def score_stupid_backoff(
    score_docs: DataFrame,
    lm: BigramLm,
    *,
    alpha: float = ALPHA_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc LM stats: ``(doc_id, n_positions, avg_logp, backoff_ratio)``.

    Docs with < 2 tokens have no scoreable position and come back with
    ``n_positions = 0`` and NULL avg_logp / backoff_ratio (kept, not dropped:
    a curation filter wants to see them).
    """
    pairs = _doc_bigrams(score_docs, text_col, id_col)
    uni_w1 = lm.unigrams.select(F.col("w").alias("w1"), F.col("c1").alias("c1_w1"))
    uni_w2 = lm.unigrams.select(F.col("w").alias("w2"), F.col("c1").alias("c1_w2"))
    scored = (
        pairs.join(lm.bigrams, ["w1", "w2"], "left")
        .join(uni_w1, "w1", "left")
        .join(uni_w2, "w2", "left")
        .crossJoin(F.broadcast(lm.totals))
        .withColumn(
            "_logp",
            F.when(
                F.col("c12").isNotNull(),
                F.log(F.col("c12").cast("double") / F.col("c1_w1").cast("double")),
            )
            .when(
                F.col("c1_w2").isNotNull(),
                F.log(
                    F.lit(alpha)
                    * F.col("c1_w2").cast("double")
                    / F.col("total_tokens").cast("double")
                ),
            )
            .otherwise(
                F.log(F.lit(alpha) / F.col("total_tokens").cast("double"))
            ),
        )
        .withColumn("_backoff", F.when(F.col("c12").isNull(), 1).otherwise(0))
    )
    stats = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_positions"),
        F.round(F.avg("_logp"), 6).alias("avg_logp"),
        F.round(F.avg(F.col("_backoff").cast("double")), 6).alias("backoff_ratio"),
    )
    all_docs = score_docs.select(F.col(id_col).alias("doc_id"))
    return all_docs.join(stats, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_positions"), F.lit(0).cast("long")).alias("n_positions"),
        "avg_logp",
        "backoff_ratio",
    )


def stupid_backoff_oracle_sql(
    *,
    alpha: float = ALPHA_DEFAULT,
    docs_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    train_pred: str = "doc_id % 2 = 0",
    score_pred: str = "doc_id % 2 = 1",
) -> str:
    """DuckDB rendering: identical count tables, joins, and branch order."""
    t = tokens_sql(text_col)
    return f"""
WITH train_toks AS (
  SELECT {t} AS tk FROM {docs_table} WHERE {train_pred}
),
uni AS (
  SELECT u.w, count(*) AS c1
  FROM train_toks, unnest(tk) AS u(w) GROUP BY u.w
),
tot AS (SELECT sum(c1) AS total_tokens FROM uni),
train_pairs AS (
  SELECT tk[i] AS w1, tk[i+1] AS w2
  FROM train_toks, unnest(range(1, len(tk))) AS r(i)
),
big AS (SELECT w1, w2, count(*) AS c12 FROM train_pairs GROUP BY w1, w2),
score_docs AS (
  SELECT {id_col} AS doc_id, {t} AS tk FROM {docs_table} WHERE {score_pred}
),
score_pairs AS (
  SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
  FROM score_docs, unnest(range(1, len(tk))) AS r(i)
),
scored AS (
  SELECT p.doc_id,
         CASE
           WHEN b.c12 IS NOT NULL THEN ln(CAST(b.c12 AS DOUBLE) / CAST(u1.c1 AS DOUBLE))
           WHEN u2.c1 IS NOT NULL THEN ln({alpha} * CAST(u2.c1 AS DOUBLE) / CAST(t.total_tokens AS DOUBLE))
           ELSE ln({alpha} / CAST(t.total_tokens AS DOUBLE))
         END AS logp,
         CASE WHEN b.c12 IS NULL THEN 1.0 ELSE 0.0 END AS backoff
  FROM score_pairs p
  LEFT JOIN big b ON p.w1 = b.w1 AND p.w2 = b.w2
  LEFT JOIN uni u1 ON p.w1 = u1.w
  LEFT JOIN uni u2 ON p.w2 = u2.w
  CROSS JOIN tot t
),
stats AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_positions,
         round(avg(logp), 6) AS avg_logp,
         round(avg(backoff), 6) AS backoff_ratio
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(s.n_positions, 0) AS n_positions,
       s.avg_logp, s.backoff_ratio
FROM score_docs d LEFT JOIN stats s USING (doc_id)
"""


def perplexity_buckets(
    scored: DataFrame,
    *,
    n_buckets: int = 3,
    mode: str = "exact",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): split scored
    documents into quality buckets by LM score — bucket 1 = most
    reference-like (highest avg_logp = lowest perplexity), as CCNet's
    head/middle/tail with ``n_buckets=3``.

    ``mode='exact'``: global ntile over (avg_logp DESC, doc_id) — fully
    deterministic and SQL-replicable, but a single global sort; right for
    oracle runs and moderate corpora.
    ``mode='cutoff'``: the 100 TB path — bucket boundaries from
    approx_percentile on avg_logp, then a pure comparison map (no global
    sort, no shuffle beyond the tiny cutoff aggregate). Bucket populations
    are approximate at the boundaries (ties and sketch error), which is the
    published pipeline's own behavior (CCNet computes cutoffs on a sample).

    Unscoreable docs (NULL avg_logp) keep a NULL bucket in both modes.
    """
    if mode == "exact":
        from pyspark.sql import Window

        w = Window.orderBy(F.desc("avg_logp"), F.asc("doc_id"))
        bucketed = (
            scored.where(F.col("avg_logp").isNotNull())
            .withColumn("bucket", F.ntile(n_buckets).over(w).cast("long"))
        )
        return scored.join(
            bucketed.select("doc_id", "bucket"), "doc_id", "left"
        )
    if mode == "cutoff":
        qs = [i / n_buckets for i in range(1, n_buckets)]
        cuts_row = (
            scored.where(F.col("avg_logp").isNotNull())
            .agg(
                F.expr(
                    f"approx_percentile(avg_logp, array({', '.join(str(1 - q) for q in qs)}), 10000)"
                ).alias("cuts")
            )
        )
        cuts = F.col("cuts")
        # bucket = 1 + number of cutoffs the score falls below
        expr = F.lit(1)
        for i in range(len(qs)):
            expr = expr + (F.col("avg_logp") < F.element_at(cuts, i + 1)).cast("int")
        return (
            scored.crossJoin(F.broadcast(cuts_row))
            .withColumn(
                "bucket",
                F.when(F.col("avg_logp").isNotNull(), expr.cast("long")),
            )
            .drop("cuts")
        )
    raise ValueError(f"mode must be exact|cutoff, got {mode!r}")


def perplexity_buckets_oracle_sql(
    *,
    n_buckets: int = 3,
    alpha: float = ALPHA_DEFAULT,
    **kwargs,
) -> str:
    """DuckDB rendering of LM scoring + exact-mode bucketing."""
    inner = stupid_backoff_oracle_sql(alpha=alpha, **kwargs)
    return f"""
WITH scored_docs AS ({inner})
SELECT s.*, b.bucket
FROM scored_docs s
LEFT JOIN (
  SELECT doc_id,
         CAST(ntile({n_buckets}) OVER (ORDER BY avg_logp DESC, doc_id) AS BIGINT)
           AS bucket
  FROM scored_docs WHERE avg_logp IS NOT NULL
) b USING (doc_id)
"""


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Top collocations by pointwise mutual information, exact-rational.

    PMI ranks bigrams by ``ln(P(w1,w2) / (P(w1)P(w2)))``; for a FIXED
    corpus the total-bigram factor is a constant, so the ranking is
    identical under the ln-free integer surrogate
    ``score_ppb = c12 * 1e9 div (c1 * c2)`` — same move as the TF-IDF and
    lift queries: ln() ulps differ across libm builds and can flip
    equal-score ranks, floor division cannot.  ``c1``/``c2`` are the
    bigram-slot marginals (times w appears as first / second element), the
    2x2 contingency-table formulation.  ``min_count`` kills the
    hapax-pair noise PMI is notorious for.

    Scale shape (100 TB): one explode over adjacent token pairs, one hash
    aggregate on (w1, w2); the marginals are re-aggregates of that
    (already tiny) bigram table, broadcast back; the global top-n lowers
    to TakeOrderedAndProject (per-partition heads, no full sort).  At
    counts beyond ~1e9 pairs move the score to DECIMAL(38,0) to keep
    ``c12 * 1e9`` inside 64 bits.
    """
    bi = _doc_bigrams(docs, text_col, id_col)
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2 = c12.groupBy("w2").agg(F.sum("c12").alias("c2"))
    scored = (
        c12.filter(F.col("c12") >= min_count)
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .withColumn(
            "score_ppb",
            F.expr("c12 * CAST(1000000000 AS BIGINT) DIV (c1 * c2)"),
        )
    )
    return (
        scored.orderBy(
            F.col("score_ppb").desc(), F.col("w1").asc(), F.col("w2").asc()
        )
        .limit(top_n)
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.col("c1").cast("long").alias("c1"),
            F.col("c2").cast("long").alias("c2"),
            "score_ppb",
        )
    )
