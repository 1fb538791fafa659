#!/usr/bin/env python
"""Round-5 session-3 scale probes: the new analytics at event/edge scale.

- mad_anomalies at 5M events x 1k keys (two key-partitioned window passes)
- histogram_drift at 5M events x 1k keys (one (key,half,bin) aggregate)
- triangle_counts on a 2M-edge power-law-ish graph (degree-ordered
  orientation vs the naive id-ordered wedge join, same graph)
- pmi_collocations at 1M synthetic docs (~31M bigrams)
- rfm_segments at 5M orders x 1M customers (windows over the aggregate)

Prints one JSON line with per-step wall timings; recorded in PLANS.md.
All inputs generated distributed (one RNG stream per partition).
Timings force full materialization with count() over a computed column
where pruning could cheat (probe-trap rule: an agg over the value column,
never a bare count of a prunable projection).
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
out: dict[str, float] = {}


def timed(name, fn):
    t0 = time.time()
    r = fn()
    out[name] = round(time.time() - t0, 1)
    print(f"[probe] {name}: {out[name]}s -> {r}", flush=True)


def synth_events(spark, n, n_keys, seed=7):
    def gen(it):
        import pandas as pd

        for pdf in it:
            for pid in pdf["pid"]:
                rng = np.random.default_rng(seed + int(pid))
                lo, hi = int(pid) * n // PARTS, (int(pid) + 1) * n // PARTS
                rows = hi - lo
                yield pd.DataFrame(
                    {
                        "id": np.arange(lo, hi, dtype=np.int64),
                        "k": rng.integers(0, n_keys, rows).astype(np.int64),
                        "value": np.round(rng.normal(100, 15, rows), 2),
                        "tse": rng.integers(1_700_000_000, 1_700_864_000, rows),
                    }
                )

    base = spark.createDataFrame([(i,) for i in range(PARTS)], "pid int").repartition(PARTS)
    return base.mapInPandas(gen, "id long, k long, value double, tse long")


def synth_edges(spark, n_edges, n_nodes, seed=11):
    """Skewed graph: endpoint = floor(n_nodes * u^2) concentrates degree
    on low ids (power-law-ish hubs) — the case orientation exists for."""

    def gen(it):
        import pandas as pd

        for pdf in it:
            for pid in pdf["pid"]:
                rng = np.random.default_rng(seed + int(pid))
                rows = n_edges // PARTS
                a = (n_nodes * rng.random(rows) ** 2).astype(np.int64)
                b = (n_nodes * rng.random(rows) ** 2).astype(np.int64)
                lo = np.minimum(a, b)
                hi = np.maximum(a, b)
                m = lo != hi
                yield pd.DataFrame({"a": lo[m], "b": hi[m]})

    base = spark.createDataFrame([(i,) for i in range(PARTS)], "pid int").repartition(PARTS)
    return base.mapInPandas(gen, "a long, b long").distinct()


def synth_docs(spark, n, seed=13):
    def gen(it):
        import pandas as pd

        words = np.array([f"w{i}" for i in range(5000)])
        for pdf in it:
            for pid in pdf["pid"]:
                rng = np.random.default_rng(seed + int(pid))
                lo, hi = int(pid) * n // PARTS, (int(pid) + 1) * n // PARTS
                texts = [
                    " ".join(words[rng.integers(0, 5000, 32) // (rng.integers(1, 3))])
                    for _ in range(hi - lo)
                ]
                yield pd.DataFrame(
                    {"doc_id": np.arange(lo, hi, dtype=np.int64), "text": texts}
                )

    base = spark.createDataFrame([(i,) for i in range(PARTS)], "pid int").repartition(PARTS)
    return base.mapInPandas(gen, "doc_id long, text string")


def main():
    spark = get_spark("probe_r5d")

    ev = synth_events(spark, 5_000_000, 1000)
    ev.cache().count()

    from pyrope_spark.operators.temporal import mad_anomalies

    df_ev = ev.select(
        F.col("k").cast("string").alias("k"), "id", "value",
        F.to_timestamp(F.from_unixtime("tse")).alias("ts"),
    ).cache()
    df_ev.count()

    timed(
        "mad_anomalies_5M_1k_keys",
        lambda: mad_anomalies(df_ev, "k", "value", "id", k=3)
        .agg(F.count("*"), F.sum("value_micro"))
        .collect()[0][0],
    )

    from pyrope_spark.operators.profile import histogram_drift

    timed(
        "histogram_drift_5M_1k_keys",
        lambda: histogram_drift(df_ev, "k", "value", "ts")
        .agg(F.count("*"), F.sum("l1_drift_ppm"))
        .collect()[0][0],
    )
    df_ev.unpersist()
    ev.unpersist()

    edges = synth_edges(spark, 2_000_000, 50_000)
    edges.cache()
    n_edges = edges.count()
    print(f"[probe] edges: {n_edges}")

    from pyrope_spark.operators.graph import triangle_counts

    timed(
        f"triangles_degree_oriented_{n_edges}e",
        lambda: triangle_counts(edges)
        .agg(F.count("*"), F.sum("n_triangles"))
        .collect()[0],
    )

    # naive id-ordered orientation on the SAME graph (what the operator
    # would cost without the degree trick) — edges already a<b
    def naive():
        e2 = edges.select(F.col("a").alias("v2"), F.col("b").alias("w"))
        wedges = edges.join(e2, F.col("b") == F.col("v2")).select("a", "b", "w")
        e3 = edges.select(F.col("a").alias("u3"), F.col("b").alias("w3"))
        tri = wedges.join(
            e3, (F.col("a") == F.col("u3")) & (F.col("w") == F.col("w3"))
        )
        return tri.count()

    timed(f"triangles_naive_id_order_{n_edges}e", naive)
    edges.unpersist()

    docs = synth_docs(spark, 1_000_000)
    docs.cache().count()

    from pyrope_spark.operators.lm import pmi_collocations

    timed(
        "pmi_collocations_1M_docs",
        lambda: pmi_collocations(docs, min_count=5, top_n=50)
        .agg(F.count("*"), F.sum("score_ppb"))
        .collect()[0],
    )
    docs.unpersist()

    def synth_orders(spark, n, n_cust, seed=17):
        def gen(it):
            import pandas as pd

            for pdf in it:
                for pid in pdf["pid"]:
                    rng = np.random.default_rng(seed + int(pid))
                    lo, hi = int(pid) * n // PARTS, (int(pid) + 1) * n // PARTS
                    rows = hi - lo
                    yield pd.DataFrame(
                        {
                            "o_custkey": rng.integers(0, n_cust, rows).astype(np.int64),
                            "days": rng.integers(0, 2000, rows),
                            "o_totalprice": np.round(rng.uniform(10, 500000, rows), 2),
                        }
                    )

        base = spark.createDataFrame([(i,) for i in range(PARTS)], "pid int").repartition(PARTS)
        return base.mapInPandas(
            gen, "o_custkey long, days long, o_totalprice double"
        ).withColumn(
            "o_orderdate",
            F.to_timestamp(F.from_unixtime(F.lit(1_500_000_000) + F.col("days") * 86400)),
        )

    orders = synth_orders(spark, 5_000_000, 1_000_000)
    orders.cache().count()

    from pyrope_spark.operators.analytics import rfm_segments

    timed(
        "rfm_segments_5M_orders_1M_cust",
        lambda: rfm_segments(orders)
        .agg(F.count("*"), F.sum("rfm_code"))
        .collect()[0],
    )
    orders.unpersist()

    print(json.dumps({"probe": "r5d", **out}))


if __name__ == "__main__":
    main()
