#!/usr/bin/env python
"""Round-6 session-2 follow-up probes:

1. setsim_prefix_join vs DF-capped ngram_jaccard on a corpus WITH hot
   shingles: every doc shares a boilerplate header (the realistic
   template/SEO shape), so the DF cap silently drops the shared shingles
   — and with them, pairs whose overlap rides the boilerplate. The
   prefix join must find strictly more (= all) qualifying pairs.
2. bfs_khop + label_prop_fixed_iters at 2M edges — the per-iteration
   join shape at graph scale (the pagerank probe discipline).

One JSON line at the end; recorded in PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pyrope_spark.session import get_spark  # noqa: E402

PARTS = 32
out: dict = {}


def timed(name, fn):
    t0 = time.time()
    r = fn()
    out[name] = round(time.time() - t0, 1)
    print(f"[probe] {name}: {out[name]}s -> {r}", flush=True)
    return r


def synth_boilerplate_docs(spark, n_docs=100_000):
    """Every doc: a 24-word shared boilerplate header + 6 body words from
    a 2k vocab; 5% of docs are 1-body-word-mutated copies of the previous
    doc. A mutated pair's Jaccard is ~0.87 WITH the boilerplate (qualifies
    at 0.8) but ~0.5 on body shingles alone — so a DF cap that drops the
    hot header shingles LOSES exactly these pairs."""

    def gen(it):
        import pandas as pd

        vocab = [f"w{i}" for i in range(2000)]
        header = ("terms of service apply all rights reserved inc "
                  "contact us for more information about our products "
                  "and services copyright notice privacy policy page")
        for pdf in it:
            for pid in pdf["pid"]:
                rng = np.random.default_rng(51 + int(pid))
                lo, hi = int(pid) * n_docs // PARTS, (int(pid) + 1) * n_docs // PARTS
                ids, texts = [], []
                prev = None
                for d in range(lo, hi):
                    if prev is not None and rng.random() < 0.05:
                        words = list(prev)
                        words[int(rng.integers(24, len(words)))] = vocab[
                            int(rng.integers(0, len(vocab)))
                        ]
                    else:
                        words = header.split() + [
                            vocab[int(x)]
                            for x in rng.integers(0, len(vocab), 6)
                        ]
                    prev = words
                    ids.append(d)
                    texts.append(" ".join(words))
                yield pd.DataFrame({"doc_id": ids, "text": texts})

    base = spark.createDataFrame([(i,) for i in range(PARTS)], "pid int").repartition(
        PARTS
    )
    return base.mapInPandas(gen, "doc_id long, text string")


def synth_edges(spark, n_edges=2_000_000, n_nodes=200_000):
    def gen(it):
        import pandas as pd

        for pdf in it:
            for pid in pdf["pid"]:
                rng = np.random.default_rng(61 + int(pid))
                lo, hi = int(pid) * n_edges // PARTS, (int(pid) + 1) * n_edges // PARTS
                rows = hi - lo
                yield pd.DataFrame(
                    {
                        "src": rng.integers(0, n_nodes, rows),
                        "dst": rng.integers(0, n_nodes, rows),
                    }
                )

    base = spark.createDataFrame([(i,) for i in range(PARTS)], "pid int").repartition(
        PARTS
    )
    return base.mapInPandas(gen, "src long, dst long")


def main():
    spark = get_spark()
    from pyrope_spark.operators.dedup import ngram_jaccard_pairs, setsim_prefix_join
    from pyrope_spark.operators.graph import bfs_khop, label_prop_fixed_iters

    docs = synth_boilerplate_docs(spark).cache()
    timed("docs_materialize_100k_boilerplate", lambda: docs.count())
    pref = setsim_prefix_join(docs, n=2, t_num=8, t_den=10)
    n_pref = timed("setsim_prefix_100k_boilerplate", lambda: pref.count())
    # DF cap at 200 drops the boilerplate bigrams (df = corpus size)
    capped = ngram_jaccard_pairs(docs, n=2, threshold=0.8, max_shingle_df=200)
    n_capped = timed("ngram_jaccard_dfcap200_100k_boilerplate",
                     lambda: capped.count())
    out["pairs_prefix"] = n_pref
    out["pairs_dfcap"] = n_capped
    out["pairs_lost_by_dfcap"] = n_pref - n_capped
    docs.unpersist()

    edges = synth_edges(spark).cache()
    timed("edges_materialize_2m", lambda: edges.count())
    seeds = spark.range(100).select((F.col("id") * 1997).alias("node"))
    bf = bfs_khop(edges, seeds, k=3)
    timed("bfs_3hop_2m_edges", lambda: bf.count())
    lp = label_prop_fixed_iters(edges, iters=3)
    timed("label_prop_3it_2m_edges", lambda: lp.count())
    edges.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
