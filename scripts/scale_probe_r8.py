#!/usr/bin/env python
"""Round-8 1M-vector proof point (VERDICT r7 Next #3).

The reference stalled at its 1M bulk load
(docs/benchmarks/20260118_benchmark_500k_ivf.md:39-43); this engine's
index family is probed at 1M x d128 — 10x the per-round bench corpus —
on the same container:

- bulk_load_write_1M:        df.write of the 1M table (BASELINE load row
                             at 10x the reference's stall point)
- ivf_build_1M_nlist1000:    coarse k-means (nlist = sqrt(N) discipline:
                             cluster size stays ~1k vectors, so nprobe=3
                             probes ~3k candidates/query — FLAT per-query
                             work vs the 100k/nlist100 bench row)
- ivf_dist_nprobe3_1M_q100000: the distributed 100k-query sweep at 1M
- ivf_recall@10 vs exact:    quality check for the nlist/nprobe choice
- hnsw_bulk_build_1M_10shards: shard-parallel graph build + search

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

    # ---- distributed 100k-query sweep (mirrors the 100k-corpus bench row)
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

    def sweep():
        ivf_search_packed_distributed(
            seg, model, huge, k=TOP_K, nprobe=NPROBE
        ).count()

    timed(f"ivf_dist_nprobe{NPROBE}_{N}v_q100000", sweep)
    derived["ivf_dist_1m_qps"] = round(
        100_000 / timings[f"ivf_dist_nprobe{NPROBE}_{N}v_q100000"], 1
    )
    huge.unpersist()

    # ---- recall vs exact at 1M (100 queries)
    from pyrope_spark.operators.knn import knn_bruteforce

    queries = synth_queries(spark, 100, DIM, seed=1337).cache()
    queries.count()
    exact = knn_bruteforce(
        vectors, queries, k=TOP_K, metric="l2", impl="gemm"
    ).cache()

    def exact_pass():
        exact.count()

    timed(f"bf_exact_{N}v_q100", exact_pass)
    hits = ivf_search_packed_distributed(
        seg, model, queries, k=TOP_K, nprobe=NPROBE
    )
    derived[f"ivf_recall_at_{TOP_K}_nprobe{NPROBE}_1m"] = round(
        ivf_recall(hits, exact, TOP_K), 4
    )
    seg.unpersist()

    # ---- HNSW: 10 shards of 100k built in parallel, searched fan-out
    from pyrope_spark.operators.hnsw import hnsw_partition_search

    def hnsw_1m():
        hnsw_partition_search(
            vectors.repartition(10), queries.limit(100), k=TOP_K,
            metric="l2", max_shard_rows=100_000,
        ).count()

    timed(f"hnsw_bulk_build_search_{N}v_10shards", hnsw_1m)

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
