#!/usr/bin/env python
"""Round-4 (session 4) scale probes: BQ sign-bit search at 1M vectors,
HLL build at 5M keys, bottom-k sample at 5M events, domain_cap under a
pathologically skewed domain, cluster_drift histograms at 1M embeddings,
and the quality classifier at 100k-train / 1M-score. Prints one JSON
line; results recorded in PLANS.md.
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
from scale_probe_r4c import synth_events  # noqa: E402

N_VECS = int(os.environ.get("PROBE_VECS", "1000000"))
DIM = int(os.environ.get("PROBE_DIM", "64"))
N_EVENTS = int(os.environ.get("PROBE_EVENTS", "5000000"))
N_DOCS = int(os.environ.get("PROBE_DOCS", "1000000"))


def main() -> None:
    spark = get_spark("scale_probe_r4d")
    t: dict[str, float] = {}
    d: dict = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 1)
        print(f"[probe] {name}: {t[name]}s", file=sys.stderr)
        return out

    # ---------------- BQ at 1M vectors
    from pyrope_spark.operators.bq import pack_segments_bq, segment_knn_bq
    from pyrope_spark.operators.similarity import exact_rerank

    # center the uniform [0,1) synthetic embeddings: sign-bit codes of an
    # all-positive corpus are degenerate (every bit 1)
    vecs = synth_embeddings(spark, N_VECS, DIM, dup_frac=0.0).select(
        F.col("vec_id").cast("string").alias("id"),
        F.expr(
            "transform(embedding, x -> x - cast(0.5 as float))"
        ).alias("vector"),
    ).cache()
    vecs.count()

    seg = pack_segments_bq(vecs).cache()
    timed("pack_bq_1M", lambda: seg.count())

    qdf = vecs.limit(100).withColumnRenamed("id", "query_id").collect()
    qrows = [(r["query_id"], np.asarray(r["vector"])) for r in qdf]
    timed("bq_coarse_q100_1M", lambda: segment_knn_bq(seg, qrows, 30).count())

    queries = spark.createDataFrame(
        [(qid, list(map(float, v))) for qid, v in qrows],
        "query_id string, vector array<float>",
    )

    def bq_rr():
        coarse = segment_knn_bq(seg, qrows, 30).select("query_id", "id")
        return exact_rerank(coarse, vecs, queries, 10, "cosine").count()

    timed("bq_rerank_q100_1M", bq_rr)
    seg.unpersist()

    # ---------------- cluster drift at 1M embeddings (fixed random centroids)
    from pyrope_spark.operators.ivf import IvfModel, assign_by_centroids_gemm
    from pyrope_spark.operators.profile import cluster_drift

    rng = np.random.default_rng(7)
    model = IvfModel(
        centroids=(rng.random((64, DIM)) - 0.5), metric="l2", nlist=64
    )

    def drift():
        a = assign_by_centroids_gemm(
            vecs.filter(F.col("id").cast("long") % 2 == 0), model
        ).select("cluster_id")
        b = assign_by_centroids_gemm(
            vecs.filter(F.col("id").cast("long") % 2 == 1), model
        ).select("cluster_id")
        return cluster_drift(a, b).count()

    d["drift_clusters"] = timed("cluster_drift_1M", drift)
    vecs.unpersist()

    # ---------------- HLL at 5M keys / bottom-k at 5M events
    from pyrope_spark.operators.analytics import nearest_rank_percentiles
    from pyrope_spark.operators.sketch import (
        bottomk_sample,
        hll_build,
        hll_estimate,
    )

    ev = synth_events(spark, N_EVENTS, 1_000_000).cache()
    ev.count()

    sk = hll_build(ev, "user_id", group_cols=("event_type",), p=12).cache()
    timed("hll_build_5M_p12", lambda: sk.count())
    est = hll_estimate(sk, group_cols=("event_type",), p=12).collect()
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    errs = [
        abs(r["est_distinct"] - exact[r["event_type"]]) / exact[r["event_type"]]
        for r in est
    ]
    d["hll_p12_max_rel_err"] = round(max(errs), 4)

    timed(
        "bottomk_4096_5M",
        lambda: bottomk_sample(
            ev, 4096, id_col="user_id", keep_cols=("value",)
        ).count(),
    )

    def bk_quant():
        s = bottomk_sample(ev, 4096, id_col="user_id", keep_cols=("value",))
        return nearest_rank_percentiles(s, "value", None, [0.5, 0.99]).collect()

    timed("bottomk_quantiles_5M", bk_quant)
    ev.unpersist()

    # ---------------- domain_cap under pathological skew
    from pyrope_spark.operators.curation import domain_cap

    skewed = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        # one domain owns half the corpus; the rest spread over 10k domains
        F.when(F.col("id") % 2 == 0, F.lit("megadomain"))
        .otherwise(F.concat(F.lit("d"), (F.col("id") % 10000).cast("string")))
        .alias("source"),
    )
    d["domain_cap_rows_kept"] = timed(
        "domain_cap_1M_skewed", lambda: domain_cap(skewed, 100).count()
    )

    # ---------------- quality classifier: 100k train, 1M score
    from pyrope_spark.operators.quality_model import (
        score_quality_model,
        train_quality_classifier,
    )

    docs = synth_docs(spark, N_DOCS).cache()
    docs.count()
    labeled = docs.limit(100_000).withColumn(
        "label", (F.xxhash64("doc_id") % 2 == 0).cast("int")
    )
    # labels are hash-random here: the probe measures THROUGHPUT shape
    # (fit on bounded sample, score full corpus), not accuracy (gated in
    # tests/test_quality_model.py on separable data)
    res = timed(
        "quality_clf_train_100k", lambda: train_quality_classifier(labeled)
    )
    # count() alone would let Catalyst prune the probability column and
    # skip the scoring work entirely - aggregate the score to force it
    timed(
        "quality_clf_score_1M",
        lambda: score_quality_model(res, docs.select("doc_id", "text"))
        .agg(F.avg("quality_prob"))
        .collect(),
    )

    print(json.dumps({"timings": t, "derived": d, "n_vecs": N_VECS,
                      "n_events": N_EVENTS, "n_docs": N_DOCS}))


if __name__ == "__main__":
    main()
