"""Ranking-quality evaluation: recall@k, MRR@k, nDCG@k per query.

The evaluation stage of a retrieval pipeline (trec_eval semantics):
``results`` are ranked hits per query, ``qrels`` the graded relevance
labels; metrics aggregate per query, macro-average in the caller.

Cross-engine determinism by construction:

- recall and MRR are single divisions of integers;
- nDCG's discount factors ``1/log2(rank+1)`` are PYTHON-computed double
  LITERALS embedded identically in the Spark expression and the SQL
  oracle — no transcendental function ever runs inside either engine
  (their ``log`` implementations may differ in the last ulp);
- DCG/IDCG fold the (gain x discount) terms SEQUENTIALLY over rank-sorted
  lists (``aggregate`` / ``list_reduce``), so the float sum has ONE
  well-defined association on both engines and any partitioning.

Gains are the standard ``2^rel - 1`` (exact integers for integer grades).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _discount_literals(k: int) -> list[float]:
    import math

    return [1.0 / math.log2(r + 1) for r in range(1, k + 1)]


def _discount_array_sql(k: int) -> str:
    return "[" + ", ".join(repr(d) for d in _discount_literals(k)) + "]"


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    *,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """(query_id, n_rel, n_rel_ret, recall_k, mrr_k, ndcg_k).

    ``results``: (query, doc, rank 1-based); ``qrels``: (query, doc,
    rel >= 1 integer grade; absent pairs are irrelevant). Queries present
    in qrels but retrieving nothing still emit a row (zeros).

    Shape: hits join qrels on (query, doc) — both sides slim; per-query
    folds run over <= k collected structs.
    """
    disc = _discount_literals(k)
    disc_arr = F.array(*[F.lit(d) for d in disc])

    r = results.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).alias("_rank"),
    ).filter(F.col("_rank") <= k)
    q = qrels.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rel_col).cast("long").alias("_rel"),
    )
    hits = r.join(q, ["_q", "_d"]).select("_q", "_rank", "_rel")
    per_q_hits = hits.groupBy("_q").agg(
        F.count(F.lit(1)).alias("n_rel_ret"),
        F.min("_rank").alias("_first_rank"),
        F.sort_array(F.collect_list(F.struct("_rank", "_rel"))).alias("_hl"),
    )
    rel_totals = q.groupBy("_q").agg(
        F.count(F.lit(1)).alias("n_rel"),
        # ideal gain list: grades sorted DESC, top k
        F.slice(
            F.sort_array(F.collect_list("_rel"), asc=False), 1, k
        ).alias("_ideal"),
    )
    j = rel_totals.join(per_q_hits, "_q", "left").fillna(
        0, subset=["n_rel_ret"]
    )
    # sequential folds over rank-sorted structs / desc-sorted grades with
    # literal discounts (index via the discount array)
    dcg = F.expr(
        "aggregate(coalesce(_hl, array()), cast(0.0 as double), "
        "(acc, h) -> acc + (cast(shiftleft(cast(1 as bigint), "
        "cast(h._rel as int)) - 1 as double)) "
        "* element_at(_darr, cast(h._rank as int)))"
    )
    idcg = F.expr(
        "aggregate(coalesce(_ideal, array()), "
        "named_struct('s', cast(0.0 as double), 'i', 1), "
        "(acc, g) -> named_struct("
        "'s', acc.s + (cast(shiftleft(cast(1 as bigint), cast(g as int)) - 1 "
        "as double)) * element_at(_darr, acc.i), "
        "'i', acc.i + 1), acc -> acc.s)"
    )
    out = (
        j.withColumn("_darr", disc_arr)
        .withColumn("_dcg", dcg)
        .withColumn("_idcg", idcg)
        .select(
            F.col("_q").alias(query_col),
            F.col("n_rel").cast("long").alias("n_rel"),
            F.col("n_rel_ret").cast("long").alias("n_rel_ret"),
            F.round(F.col("n_rel_ret") / F.col("n_rel"), 6).alias("recall_k"),
            F.round(
                F.when(
                    F.col("_first_rank").isNotNull(),
                    F.lit(1.0) / F.col("_first_rank"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("mrr_k"),
            F.round(
                F.when(F.col("_idcg") > 0, F.col("_dcg") / F.col("_idcg"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg_k"),
        )
    )
    return out


def ranking_metrics_oracle_sql(
    k: int,
    *,
    results_cte: str,
    qrels_cte: str,
) -> str:
    """DuckDB rendering; ``results_cte`` must define results(query_id,
    doc_id, rank), ``qrels_cte`` qrels(query_id, doc_id, rel)."""
    darr = _discount_array_sql(k)
    return f"""
WITH {results_cte},
{qrels_cte},
hits AS (
  SELECT r.query_id, r.rank, CAST(q.rel AS BIGINT) AS rel
  FROM results r JOIN qrels q USING (query_id, doc_id)
  WHERE r.rank <= {k}
),
per_q AS (
  SELECT query_id, COUNT(*) AS n_rel_ret, MIN(rank) AS first_rank,
         list_sort(list(struct_pack(r := rank, g := rel))) AS hl
  FROM hits GROUP BY query_id
),
totals AS (
  SELECT query_id, COUNT(*) AS n_rel,
         list_reverse_sort(list(CAST(rel AS BIGINT)))[1:{k}] AS ideal
  FROM qrels GROUP BY query_id
),
j AS (
  SELECT t.query_id, t.n_rel, COALESCE(p.n_rel_ret, 0) AS n_rel_ret,
         p.first_rank, p.hl, t.ideal
  FROM totals t LEFT JOIN per_q p USING (query_id)
),
m AS (
  SELECT query_id, n_rel, n_rel_ret, first_rank,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(COALESCE(hl, []),
               h -> CAST((CAST(1 AS BIGINT) << CAST(h.g AS INT)) - 1 AS DOUBLE)
                    * ({darr})[h.r])),
           (acc, x) -> acc + x) AS dcg,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, len(COALESCE(ideal, [])) + 1),
               i -> CAST((CAST(1 AS BIGINT) << CAST(ideal[i] AS INT)) - 1 AS DOUBLE)
                    * ({darr})[i])),
           (acc, x) -> acc + x) AS idcg
  FROM j
)
SELECT query_id,
       CAST(n_rel AS BIGINT) AS n_rel,
       CAST(n_rel_ret AS BIGINT) AS n_rel_ret,
       round(n_rel_ret / n_rel, 6) AS recall_k,
       round(CASE WHEN first_rank IS NOT NULL THEN 1.0 / first_rank
                  ELSE 0.0 END, 6) AS mrr_k,
       round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END, 6) AS ndcg_k
FROM m
"""
