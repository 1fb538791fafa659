#!/usr/bin/env python
"""Round-4 (session 4b) scale probes: MaxSim late interaction over 200k
doc tokens, BM25+PRF at 1M docs, embedding pooling at 1M x d64, CMS
join-cardinality at 1M-doc halves. Prints one JSON line; results recorded
in PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pyrope_spark.session import get_spark  # noqa: E402
from scale_probe_r4 import synth_docs, synth_embeddings  # noqa: E402

N_DOCS = int(os.environ.get("PROBE_DOCS", "1000000"))
N_TOKENS = int(os.environ.get("PROBE_TOKENS", "200000"))  # 50k docs x 4
DIM = int(os.environ.get("PROBE_DIM", "64"))


def main() -> None:
    spark = get_spark("scale_probe_r4e")
    t: dict[str, float] = {}
    d: dict = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 1)
        print(f"[probe] {name}: {t[name]}s", file=sys.stderr)
        return out

    # ---------------- MaxSim: 50k docs x 4 tokens, 16 queries x 4 tokens
    from pyrope_spark.operators.colbert import maxsim_topk, pool_embeddings

    toks = synth_embeddings(spark, N_TOKENS, DIM, dup_frac=0.0).select(
        (F.col("vec_id") / 4).cast("long").alias("doc_id"),
        F.expr("transform(embedding, x -> x - cast(0.5 as float))").alias(
            "vector"
        ),
    ).cache()
    toks.count()
    qt = toks.filter(F.col("doc_id") < 16).select(
        F.col("doc_id").alias("query_id"),
        F.monotonically_increasing_id().alias("token_no"),
        "vector",
    )
    # token_no only labels query tokens; determinism not needed for timing
    timed(
        f"maxsim_grouped_{N_TOKENS}tok_q16",
        lambda: maxsim_topk(toks, qt, 10, impl="grouped").count(),
    )
    timed(
        f"maxsim_packed_{N_TOKENS}tok_q16",
        lambda: maxsim_topk(toks, qt, 10, impl="packed").count(),
    )
    timed(
        f"pool_mean_{N_TOKENS}tok",
        lambda: pool_embeddings(toks).count(),
    )
    toks.unpersist()

    # ---------------- pooling at full 1M x d64
    vecs = synth_embeddings(spark, N_DOCS, DIM, dup_frac=0.0).select(
        (F.col("vec_id") / 8).cast("long").alias("doc_id"),
        F.col("embedding").alias("vector"),
    )
    timed(
        "pool_mean_1M_vectors",
        lambda: pool_embeddings(vecs).count(),
    )

    # ---------------- BM25 + PRF at 1M docs
    from pyrope_spark.operators.fulltext import (
        bm25_prf_topk,
        bm25_topk,
        build_bm25_index,
    )

    docs = synth_docs(spark, N_DOCS).cache()
    docs.count()
    idx = build_bm25_index(docs)
    idx = type(idx)(
        postings=idx.postings.cache(),
        termdf=idx.termdf.cache(),
        stats=idx.stats.cache(),
        n_buckets=idx.n_buckets,
    )
    idx.postings.count()
    qs = spark.createDataFrame(
        [(i, f"w{100 + i} w{5000 + i} w{20000 + i}") for i in range(100)],
        "query_id long, query_text string",
    )
    timed("bm25_q100_1M", lambda: bm25_topk(idx, qs, 10).count())
    timed("bm25_prf_q100_1M", lambda: bm25_prf_topk(idx, qs, 10).count())

    # ---------------- CMS join cardinality at 1M-doc halves
    from pyrope_spark.operators.sketch import cms_build, cms_join_cardinality

    def cms_join():
        a = cms_build(docs.filter(F.col("doc_id") % 2 == 0), width=65536)
        b = cms_build(docs.filter(F.col("doc_id") % 2 == 1), width=65536)
        return cms_join_cardinality(a, b).collect()[0]["est_join_rows"]

    d["cms_join_est_rows"] = timed("cms_join_card_1M", cms_join)

    print(json.dumps({"timings": t, "derived": d, "n_docs": N_DOCS,
                      "n_tokens": N_TOKENS}))


if __name__ == "__main__":
    main()
