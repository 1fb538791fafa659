#!/usr/bin/env python
"""Round-8 1M-vector proof point (VERDICT r7 Next #3).

The reference stalled at its 1M bulk load
(docs/benchmarks/20260118_benchmark_500k_ivf.md:39-43); this engine's
index family is probed at 1M x d128 — 10x the per-round bench corpus —
on the same container:

- bulk_load_write_1M:        df.write of the 1M table (BASELINE load row
                             at 10x the reference's stall point)
- ivf_build_1M_nlist1000:    coarse k-means (nlist = sqrt(N) discipline)
- ivf_dist sweeps at nprobe=3 (0.3% scan — FLAT ~3k candidates/query vs
  the 100k/nlist100 bench row) and nprobe=30 (3% scan — the same probe
  FRACTION as the bench row): on uniform [0,1)^128 data recall is
  governed by the scanned fraction (RECALL.md documents the curve), so
  the pair shows the standard IVF tradeoff at 1M — constant-work/lower
  recall vs constant-fraction/equal recall.
- ivf_recall@10 at nprobe 3/30/100 vs exact, + HNSW recall@10
- hnsw_bulk_build_1M_10shards: shard-parallel graph build + search
- a CLUSTERED 1M dataset (1000 Gaussian centers, the SIFT-like shape
  real embeddings have): uniform [0,1)^128 is the ADVERSARIAL case for
  ANN — distance concentration makes recall track the scanned fraction
  (observed 0.052 @0.3%, 0.473 @10%) — so the clustered probe shows the
  index family where intrinsic structure exists.

Writes BENCH_1M_r8.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from pyrope_spark.session import get_spark  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import synth_queries, synth_vectors  # noqa: E402

N = 1_000_000
DIM = 128
TOP_K = 10
NLIST = 1000
NPROBE = 3

timings: dict[str, float] = {}
derived: dict[str, float] = {}


def timed(name, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    timings[name] = round(dt, 3)
    print(f"[probe] {name}: {dt:.1f}s", flush=True)
    return out


def main() -> None:
    spark = get_spark("scale_probe_r8", cores=32, shuffle_partitions=64)
    vectors = synth_vectors(spark, N, DIM).cache()
    n = vectors.count()
    assert n == N, n

    # ---- bulk load at the reference's stall point x2
    load_dir = tempfile.mkdtemp(prefix="probe_r8_load_")

    def bulk_load():
        vectors.write.mode("overwrite").parquet(os.path.join(load_dir, "t"))

    timed(f"bulk_load_write_{N}v_d{DIM}", bulk_load)
    shutil.rmtree(load_dir, ignore_errors=True)
    derived["bulk_load_1m_vec_per_s"] = round(
        N / timings[f"bulk_load_write_{N}v_d{DIM}"], 1
    )

    # ---- IVF build: sqrt(N) nlist keeps per-query candidates flat
    from pyrope_spark.operators.ivf import (
        build_ivf,
        ivf_recall,
        ivf_search_packed_distributed,
    )
    from pyrope_spark.operators.segments import pack_segments

    state = {}

    def ivf_build():
        assigned, model = build_ivf(vectors, nlist=NLIST, metric="l2")
        seg = pack_segments(
            assigned, cluster_col="cluster_id", rows_per_segment=8192
        ).cache()
        seg.count()
        state["ivf"] = (seg, model)

    timed(f"ivf_build_{N}v_nlist{NLIST}", ivf_build)
    seg, model = state["ivf"]

    # ---- distributed 100k-query sweeps: constant work (nprobe3, 0.3%
    # scan) vs constant fraction (nprobe30, 3% — the 100k bench row's)
    huge = (
        synth_queries(spark, 100_000, DIM, seed=777)
        .withColumnRenamed("id", "query_id")
        .cache()
    )
    huge.count()
    # warm the cogrouped path once (worker numpy import + codegen)
    ivf_search_packed_distributed(
        seg, model, huge.limit(64), k=TOP_K, nprobe=NPROBE
    ).count()

    for np_ in (3, 30):
        def sweep(np_=np_):
            ivf_search_packed_distributed(
                seg, model, huge, k=TOP_K, nprobe=np_
            ).count()

        timed(f"ivf_dist_nprobe{np_}_{N}v_q100000", sweep)
        derived[f"ivf_dist_1m_nprobe{np_}_qps"] = round(
            100_000 / timings[f"ivf_dist_nprobe{np_}_{N}v_q100000"], 1
        )
    huge.unpersist()

    # ---- recall vs exact at 1M (100 queries): the scanned-fraction
    # tradeoff curve (uniform data has no cluster structure, so recall
    # tracks the fraction — RECALL.md's documented behavior)
    from pyrope_spark.operators.knn import knn_bruteforce

    queries = synth_queries(spark, 100, DIM, seed=1337).cache()
    queries.count()
    exact = knn_bruteforce(
        vectors, queries, k=TOP_K, metric="l2", impl="gemm"
    ).cache()

    def exact_pass():
        exact.count()

    timed(f"bf_exact_{N}v_q100", exact_pass)
    for np_ in (3, 30, 100):
        hits = ivf_search_packed_distributed(
            seg, model, queries, k=TOP_K, nprobe=np_
        )
        derived[f"ivf_recall_at_{TOP_K}_nprobe{np_}_1m"] = round(
            ivf_recall(hits, exact, TOP_K), 4
        )
    seg.unpersist()

    # ---- HNSW: 10 shards of 100k built in parallel, searched fan-out
    from pyrope_spark.operators.hnsw import hnsw_partition_search

    def hnsw_1m():
        hits = hnsw_partition_search(
            vectors.repartition(10), queries, k=TOP_K,
            metric="l2", max_shard_rows=100_000,
        ).cache()
        hits.count()
        state["hnsw_hits"] = hits

    timed(f"hnsw_bulk_build_search_{N}v_10shards", hnsw_1m)
    derived[f"hnsw_recall_at_{TOP_K}_1m"] = round(
        ivf_recall(state["hnsw_hits"], exact, TOP_K), 4
    )
    exact.unpersist()
    vectors.unpersist()
    queries.unpersist()
    spark.catalog.clearCache()

    # ---- clustered 1M (1000 Gaussian centers, sigma 0.05): the shape
    # real embedding corpora have; ANN recall here reflects the index,
    # not distance concentration
    def synth_clustered(n: int, n_centers: int = 1000, sigma: float = 0.05):
        parts = 32

        def gen(it):
            import pandas as pd

            rng_c = np.random.default_rng(4242)
            centers = rng_c.random((n_centers, DIM), dtype=np.float32)
            for pdf in it:
                for pid in pdf["pid"]:
                    rng = np.random.default_rng(5000 + int(pid))
                    lo = int(pid) * n // parts
                    hi = (int(pid) + 1) * n // parts
                    cidx = rng.integers(0, n_centers, size=hi - lo)
                    mat = centers[cidx] + rng.normal(
                        0, sigma, size=(hi - lo, DIM)
                    ).astype(np.float32)
                    yield pd.DataFrame(
                        {
                            "id": [f"c{i}" for i in range(lo, hi)],
                            "vector": list(mat.astype(np.float32)),
                        }
                    )

        base = spark.createDataFrame(
            [(i,) for i in range(parts)], "pid int"
        ).repartition(parts)
        return base.mapInPandas(gen, "id string, vector array<float>")

    cvec = synth_clustered(N).cache()
    cvec.count()
    # queries: perturbed members (the standard eval shape)
    cq = (
        cvec.limit(200)
        .withColumnRenamed("id", "query_id")
        .cache()
    )
    cq.count()

    def ivf_build_c():
        assigned, model = build_ivf(cvec, nlist=NLIST, metric="l2")
        seg = pack_segments(
            assigned, cluster_col="cluster_id", rows_per_segment=8192
        ).cache()
        seg.count()
        state["ivf_c"] = (seg, model)

    timed(f"ivf_build_clustered_{N}v_nlist{NLIST}", ivf_build_c)
    seg_c, model_c = state["ivf_c"]
    exact_c = knn_bruteforce(
        cvec, cq, k=TOP_K, metric="l2", impl="gemm", distributed=False
    ).cache()
    exact_c.count()
    for np_ in (3, 10):
        hits_c = ivf_search_packed_distributed(
            seg_c, model_c, cq, k=TOP_K, nprobe=np_
        )
        derived[f"ivf_recall_at_{TOP_K}_nprobe{np_}_1m_clustered"] = round(
            ivf_recall(hits_c, exact_c, TOP_K), 4
        )
    hq = (
        synth_clustered(100_000)
        .withColumnRenamed("id", "query_id")
        .cache()
    )
    hq.count()

    def sweep_c():
        ivf_search_packed_distributed(
            seg_c, model_c, hq, k=TOP_K, nprobe=NPROBE
        ).count()

    timed(f"ivf_dist_clustered_nprobe{NPROBE}_{N}v_q100000", sweep_c)
    derived["ivf_dist_1m_clustered_qps"] = round(
        100_000
        / timings[f"ivf_dist_clustered_nprobe{NPROBE}_{N}v_q100000"],
        1,
    )
    hq.unpersist()
    seg_c.unpersist()

    def hnsw_1m_c():
        hits = hnsw_partition_search(
            cvec.repartition(10), cq, k=TOP_K,
            metric="l2", max_shard_rows=100_000,
        ).cache()
        hits.count()
        state["hnsw_hits_c"] = hits

    timed(f"hnsw_bulk_build_search_clustered_{N}v_10shards", hnsw_1m_c)
    derived[f"hnsw_recall_at_{TOP_K}_1m_clustered"] = round(
        ivf_recall(state["hnsw_hits_c"], exact_c, TOP_K), 4
    )

    out = {
        "metric": "pyrope_spark_1m_probe_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "n_vectors": N,
        "dim": DIM,
        "queries": timings,
        "derived": derived,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_1M_r8.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
