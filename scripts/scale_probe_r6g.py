#!/usr/bin/env python
"""Round-6 session-5 scale probes: link prediction at 2M edges with and
without the hub cap, phrase search at 1M docs, term keyness at 1M docs,
hard-negative mining at the 50k exact bound.

All inputs are hash-derived (no RNG on executors): endpoints/terms come
from xxhash64-style integer mixes so the probe is deterministic and
generation never bottlenecks the measurement.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pyrope_spark.session import get_spark


def probe(name, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"[probe] {name}: {dt:.1f}s — {out}")


def main() -> None:
    spark = get_spark("scale_probe_r6g", cores=32, shuffle_partitions=64)

    # ---- link prediction: 2M edges / 200k nodes, quadratic-skew degrees
    n_nodes = 200_000
    edges = (
        spark.range(2_000_000)
        .select(
            (F.xxhash64("id") % n_nodes).alias("src"),
            # quadratic skew: square a uniform hash so low ids become hubs
            (
                (F.abs(F.xxhash64("id", F.lit(1))) % n_nodes)
                * (F.abs(F.xxhash64("id", F.lit(1))) % n_nodes)
                / n_nodes
            )
            .cast("long")
            .alias("dst"),
        )
        .select(F.abs("src").alias("src"), "dst")
    )
    edges = edges.cache()
    edges.count()

    from pyrope_spark.operators.graph import link_prediction_ra

    probe(
        "linkpred_2M_edges_capped_deg64",
        lambda: link_prediction_ra(
            edges, min_common=2, top_n=1000, max_hub_degree=64
        ).count(),
    )
    probe(
        "linkpred_2M_edges_uncapped",
        lambda: link_prediction_ra(edges, min_common=2, top_n=1000).count(),
    )
    edges.unpersist()

    # ---- phrase search: 1M docs, phrase planted in ~1/64 of them
    docs = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha bravo charlie delta echo foxtrot golf hotel "),
            F.when(
                F.xxhash64("id") % 64 == 0, F.lit("needle phrase here ")
            ).otherwise(F.lit("india juliet kilo lima ")),
            F.lit("mike november oscar papa quebec romeo sierra tango"),
        ).alias("text"),
    )
    docs = docs.cache()
    docs.count()

    from pyrope_spark.operators.fulltext import phrase_search, term_keyness

    probe(
        "phrase_search_1M_docs",
        lambda: phrase_search(docs, phrase="needle phrase", k=20).count(),
    )

    # ---- term keyness: 1M docs split in two groups on doc_id parity
    probe(
        "term_keyness_1M_docs",
        lambda: term_keyness(
            docs,
            group_expr=(F.col("doc_id") % 2 == 0).cast("string"),
            k=50,
            min_term_count=100,
        ).count(),
    )
    docs.unpersist()

    # ---- hard negatives at the 50k exact bound, d=64
    import numpy as np

    def gen(it):
        import pandas as pd

        for pdf in it:
            for pid in pdf["pid"]:
                rng = np.random.default_rng(1234 + int(pid))
                lo, hi = int(pid) * 50_000 // 32, (int(pid) + 1) * 50_000 // 32
                mat = rng.random((hi - lo, 64), dtype=np.float32)
                yield pd.DataFrame(
                    {
                        "vec_id": range(lo, hi),
                        "embedding": list(mat),
                        "label": [i % 16 for i in range(lo, hi)],
                    }
                )

    emb = (
        spark.createDataFrame([(i,) for i in range(32)], "pid int")
        .repartition(32)
        .mapInPandas(gen, "vec_id long, embedding array<float>, label int")
        .cache()
    )
    emb.count()

    from pyrope_spark.operators.similarity import hard_negative_mining

    probe(
        "hard_negatives_50k_d64_k5_arrow",
        lambda: hard_negative_mining(
            emb, k=5, mode="arrow", rows_per_block=4096
        ).count(),
    )
    emb.unpersist()


if __name__ == "__main__":
    main()
