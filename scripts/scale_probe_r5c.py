#!/usr/bin/env python
"""Round-5 session-2 scale probes: the six operators added this session at
1M-row scale on local[32] — association rules (with planted whale baskets
so the cap path is exercised at scale), winnowing fingerprints, blocklist
phrase matching, incremental agg maintenance (merge vs recompute),
3-iteration PageRank at 10M edges, and TF-IDF top-terms at 1M docs.

Every timing forces computation with an aggregate over computed columns
(never a bare .count() that lets Catalyst prune the expensive
expressions — the round-4 probe-trap lesson). One JSON line out;
results go to PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyrope_spark.session import get_spark  # noqa: E402

PARTS = 32
VOCAB = 50_000


def synth_docs(spark, n, n_tokens=40):
    """Deterministic token docs over a 50k vocabulary (id-hash driven)."""
    return (
        spark.range(0, n, 1, PARTS)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(n_tokens)),
                    lambda i: F.concat(
                        F.lit("w"),
                        F.pmod(F.xxhash64(F.col("id") * 1000 + i), VOCAB),
                    ),
                ),
                " ",
            ).alias("text"),
        )
    )


def main() -> None:
    spark = get_spark()
    t: dict[str, float] = {}
    d: dict[str, object] = {}

    # ---- 1. association rules: 200k baskets x ~20 items + 50 whales of
    # 5k items each. Cap 200 keeps whale cost at C(200,2) pairs instead
    # of C(5000,2) = 12.5M each.
    from pyrope_spark.operators.analytics import item_association_rules

    normal = spark.range(0, 4_000_000, 1, PARTS).select(
        F.pmod(F.xxhash64("id"), 200_000).alias("user_id"),
        F.pmod(F.xxhash64(F.col("id") + 7), 10_000).alias("item"),
    )
    whales = spark.range(0, 250_000, 1, PARTS).select(
        (F.lit(1_000_000) + F.pmod(F.xxhash64("id"), 50)).alias("user_id"),
        F.pmod(F.col("id"), 5_000).alias("item"),
    )
    ev = normal.union(whales).cache()
    n_ev = ev.count()
    t0 = time.time()
    rules = item_association_rules(ev, min_support=3, max_basket_items=200)
    agg = rules.agg(
        F.count(F.lit(1)).alias("n_rules"),
        F.sum("lift").alias("s"),
    ).collect()[0]
    t["assoc_rules_4M25_events"] = round(time.time() - t0, 1)
    d["assoc_n_rules"] = agg["n_rules"]
    d["assoc_events"] = n_ev
    ev.unpersist()

    # ---- 2. winnowing: arrow (vectorized numpy, the 100 TB path) at 1M
    # docs vs the expression oracle twin at 100k — same fingerprints
    # (parity pytest-gated), ~order-of-magnitude throughput gap expected.
    from pyrope_spark.operators.passages import winnow_fingerprints

    docs = synth_docs(spark, 1_000_000).cache()
    docs.agg(F.sum(F.length("text"))).collect()

    def _force(wf):
        # force fp materialization without int64-overflowing the sum
        # (~30M fingerprints x ~1e15 each): fold mod 1e6 first
        return wf.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.col("fp"), 1_000_000)).alias("s"),
        ).collect()[0]

    t0 = time.time()
    row = _force(winnow_fingerprints(docs, mode="arrow"))
    t["winnow_arrow_1M_docs"] = round(time.time() - t0, 1)
    d["winnow_fingerprints_1M"] = row["n"]
    sub = docs.filter(F.col("doc_id") < 100_000)
    t0 = time.time()
    row = _force(winnow_fingerprints(sub, mode="expr"))
    t["winnow_expr_100k_docs"] = round(time.time() - t0, 1)
    d["winnow_fingerprints_100k_expr"] = row["n"]
    t0 = time.time()
    row2 = _force(winnow_fingerprints(sub, mode="arrow"))
    t["winnow_arrow_100k_docs"] = round(time.time() - t0, 1)
    d["winnow_100k_paths_agree"] = (
        row["n"] == row2["n"] and row["s"] == row2["s"]
    )

    # ---- 3. blocklist: 10k 3-token phrases vs the same 1M docs.
    from pyrope_spark.operators.curation import blocklist_phrase_matches

    phrases = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("phrase_id"),
        F.array_join(
            F.slice(F.split("text", " "), 5, 3), " "
        ).alias("phrase"),
    )
    t0 = time.time()
    bm = blocklist_phrase_matches(docs, phrases)
    row = bm.agg(
        F.count(F.lit(1)).alias("n"), F.sum("token_pos").alias("s")
    ).collect()[0]
    t["blocklist_1M_docs_10k_phrases"] = round(time.time() - t0, 1)
    d["blocklist_matches"] = row["n"]
    docs.unpersist()

    # ---- 4. incremental agg maintenance: 1M-key base + 1M-row delta
    # merge vs 5M-row full recompute.
    from pyrope_spark.operators.maintenance import (
        build_agg_view,
        maintain_agg_view,
    )

    changelog = spark.range(0, 5_000_000, 1, PARTS).select(
        F.pmod(F.xxhash64("id"), 1_000_000).alias("k"),
        (F.pmod(F.xxhash64(F.col("id") + 3), 1000) / 10.0).alias("value"),
        F.when(F.pmod(F.xxhash64(F.col("id") + 9), 10) == 0, -1)
        .otherwise(1).alias("op"),
        F.col("id").alias("rid"),
    ).cache()
    changelog.count()
    base_src = changelog.filter(F.col("rid") < 4_000_000)
    delta_src = changelog.filter(F.col("rid") >= 4_000_000)
    base = build_agg_view(base_src, keys=["k"], op_col="op").cache()
    base.count()
    t0 = time.time()
    merged = maintain_agg_view(base, delta_src, keys=["k"], op_col="op")
    row = merged.agg(F.count(F.lit(1)), F.sum("sum_value")).collect()[0]
    t["inc_agg_merge_1M_keys_1M_delta"] = round(time.time() - t0, 1)
    t0 = time.time()
    full = build_agg_view(changelog, keys=["k"], op_col="op")
    full.agg(F.count(F.lit(1)), F.sum("sum_value")).collect()
    t["inc_agg_full_recompute_5M"] = round(time.time() - t0, 1)
    d["inc_agg_keys"] = row[0]
    base.unpersist()
    changelog.unpersist()

    # ---- 5. PageRank: 10M distinct-ish edges over 1M nodes, 3 iters.
    from pyrope_spark.operators.graph import pagerank_fixed_iters

    edges = spark.range(0, 10_000_000, 1, PARTS).select(
        F.pmod(F.xxhash64("id"), 1_000_000).alias("src"),
        F.pmod(F.xxhash64(F.col("id") + 13), 1_000_000).alias("dst"),
    ).cache()
    edges.count()
    t0 = time.time()
    pr = pagerank_fixed_iters(edges, iters=3)
    row = pr.agg(
        F.count(F.lit(1)).alias("n"), F.sum("rank_micro").alias("mass")
    ).collect()[0]
    t["pagerank_10M_edges_3iter"] = round(time.time() - t0, 1)
    d["pagerank_nodes"] = row["n"]
    d["pagerank_retained_mass_frac"] = round(row["mass"] / 10**12, 4)
    edges.unpersist()

    # ---- 6. TF-IDF top-terms at 1M docs (40 tokens, 50k vocab).
    from pyrope_spark.functions.text import tokens
    from pyspark.sql import Window as W

    docs = synth_docs(spark, 1_000_000).cache()
    docs.count()
    t0 = time.time()
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df_), "term").withColumn(
        "score_micro", F.expr("(tf * 1000000 * 1000000) DIV df")
    )
    rk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(
            F.col("score_micro").desc(), F.col("term").asc())
    )
    top = scored.withColumn("rk", rk).filter(F.col("rk") <= 5)
    row = top.agg(
        F.count(F.lit(1)).alias("n"), F.sum("score_micro").alias("s")
    ).collect()[0]
    t["tfidf_top5_1M_docs"] = round(time.time() - t0, 1)
    d["tfidf_rows"] = row["n"]
    docs.unpersist()

    print(json.dumps({
        "probe": "r5c_session2_operators", "timings_s": t, "derived": d,
    }))


if __name__ == "__main__":
    main()
