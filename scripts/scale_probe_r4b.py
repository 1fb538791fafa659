#!/usr/bin/env python
"""Round-4 (session 2) 1M-row scale probes for the new text/retrieval
operators: BM25 postings build + search, Stupid-Backoff LM train + score,
bucketed interval join. Prints one JSON line; results recorded in PLANS.md.

Inputs are generated distributed with the same deterministic patterns as
scale_probe_r4.py (docs: hash-mixed 40-token sequences over a 50k vocab).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyrope_spark.session import get_spark  # noqa: E402
from scale_probe_r4 import synth_docs  # noqa: E402

N_DOCS = int(os.environ.get("PROBE_DOCS", "1000000"))


def main() -> None:
    spark = get_spark("scale_probe_r4b")
    t: dict[str, float] = {}
    d: dict[str, float] = {}
    out: dict = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        t[name] = round(time.time() - t0, 1)
        print(f"[probe] {name}: {t[name]}s", file=sys.stderr)

    docs = synth_docs(spark, N_DOCS).cache()
    timed("gen_docs_1M", docs.count)

    # ---- BM25: index built + materialized once, then a 100-query batch
    from pyrope_spark.operators.fulltext import Bm25Index, bm25_topk, build_bm25_index

    def bm_build():
        idx = build_bm25_index(docs)
        idx.postings.cache()
        idx.termdf.cache()
        idx.stats.cache()
        out["idx"] = Bm25Index(idx.postings, idx.termdf, idx.stats)
        out["postings_rows"] = idx.postings.count()
        idx.termdf.count()
        idx.stats.count()

    timed("bm25_index_build_1M", bm_build)
    d["bm25_postings_rows"] = out["postings_rows"]

    queries = spark.createDataFrame(
        [(i, f"w{(i * 131) % 50_000} w{(i * 17 + 3) % 50_000} w{(i * 7 + 11) % 50_000}")
         for i in range(100)],
        "query_id long, query_text string",
    )

    def bm_search():
        out["bm25_rows"] = bm25_topk(out["idx"], queries, k=10).count()

    timed("bm25_search_1M_q100", bm_search)
    d["bm25_result_rows"] = out["bm25_rows"]

    # ---- stored (bucket-partitioned) index: cold search with pruning
    import shutil
    import tempfile

    from pyrope_spark.operators.fulltext import write_bm25_index

    store_dir = tempfile.mkdtemp(prefix="bm25_store_")
    try:
        def bm_store():
            out["sidx"] = write_bm25_index(
                out["idx"], store_dir, n_buckets=256
            )

        timed("bm25_index_store_1M_b256", bm_store)

        def bm_search_cold():
            out["bm25_cold_rows"] = bm25_topk(out["sidx"], queries, k=10).count()

        timed("bm25_search_stored_pruned_q100", bm_search_cold)
        d["bm25_cold_rows"] = out["bm25_cold_rows"]

        # single 3-term query: the pruning regime (3 buckets of 256 read)
        def bm_search_one():
            out["one"] = bm25_topk(out["sidx"], queries.limit(1), k=10).count()

        timed("bm25_search_stored_pruned_q1", bm_search_one)

        def bm_search_one_nopruning():
            out["one_np"] = bm25_topk(
                out["sidx"], queries.limit(1), k=10, prune_buckets=False
            ).count()

        timed("bm25_search_stored_fullscan_q1", bm_search_one_nopruning)
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)

    # ---- Stupid-Backoff LM: train on half, score the other half
    from pyrope_spark.operators.lm import score_stupid_backoff, train_bigram_lm

    train = docs.filter(F.col("doc_id") % 2 == 0)
    score = docs.filter(F.col("doc_id") % 2 == 1)

    def lm_train():
        lm = train_bigram_lm(train)
        lm.unigrams.cache()
        lm.bigrams.cache()
        out["lm"] = lm
        out["uni"] = lm.unigrams.count()
        out["big"] = lm.bigrams.count()

    timed("lm_train_500k_docs", lm_train)
    d["lm_unigrams"] = out["uni"]
    d["lm_bigrams"] = out["big"]

    def lm_score():
        out["scored"] = score_stupid_backoff(score, out["lm"]).count()

    timed("lm_score_500k_docs", lm_score)
    d["lm_scored_docs"] = out["scored"]

    # ---- interval join: 1M point events vs 100k intervals, bucketed
    from pyrope_spark.operators.temporal import interval_join

    n_keys = 10_000
    pts = spark.range(N_DOCS).select(
        (F.col("id") % n_keys).alias("user_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % 86_400).alias("ts"),
    )
    iv = spark.range(100_000).select(
        (F.col("id") % n_keys).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") * 37) % 86_400
        ).alias("start_ts"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") * 37) % 86_400 + 1800
        ).alias("end_ts"),
    )

    def ij():
        out["pairs"] = interval_join(
            pts, iv, key_cols=["user_id"], bucket_s=1800
        ).count()

    timed("interval_join_1M_pts_100k_iv", ij)
    d["interval_join_pairs"] = out["pairs"]

    print(json.dumps({"probe": "r4b_1M", "timings_s": t, "derived": d}))


if __name__ == "__main__":
    main()
