#!/usr/bin/env python
"""r10 10M probe (VERDICT r9 #6): push the scale proof one decade past
the r8/r9 1M sweeps.  10M x d128 uniform corpus (~5.1 GB float32),
nlist = sqrt(N) ~= 3162, 100k-query distributed sweep at nprobe 3 — the
claims under test:

1. build cost stays ~linear in N (r9: 71.6 s at 1M / nlist 1000);
2. the sqrt-N nlist rule keeps per-query candidate volume FLAT across
   the decade (nprobe/nlist fraction shrinks as corpus grows, so
   candidates/query ~= nprobe * N / nlist ~= nprobe * sqrt(N) — 3.2x
   the 1M row's candidates here, NOT 10x);
3. the 100k-query sweep completes with no driver materialization.

Writes scale_probe_r10.json next to the other BENCH artifacts.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import DIM, synth_vectors  # noqa: E402
from pyrope_spark.session import get_spark  # noqa: E402

N = 10_000_000
NLIST = 3_162  # sqrt(10M)


def main() -> None:
    spark = get_spark("probe_r10_10m")
    from pyrope_spark.operators.ivf import (
        build_ivf,
        ivf_search_packed_distributed,
    )
    from pyrope_spark.operators.segments import (
        pack_segments,
        write_segments_bucketed,
    )

    out = {"n": N, "nlist": NLIST, "dim": DIM}
    t0 = time.time()
    vectors = synth_vectors(spark, N, DIM).cache()
    vectors.count()
    out["generate_cache_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    assigned, model = build_ivf(vectors, nlist=NLIST, metric="l2")
    seg = pack_segments(
        assigned, cluster_col="cluster_id", rows_per_segment=8192
    ).cache()
    seg.count()
    out["ivf_build_s"] = round(time.time() - t0, 1)
    vectors.unpersist()

    t0 = time.time()
    segb = write_segments_bucketed(
        seg, "probe_r10_seg", "spark-warehouse/probe_r10_seg", n_buckets=32
    )
    out["write_bucketed_s"] = round(time.time() - t0, 1)
    seg.unpersist()

    hq = (
        synth_vectors(spark, 100_000, DIM, seed=777)
        .withColumnRenamed("id", "query_id")
        .cache()
    )
    hq.count()
    times = []
    for _ in range(3):
        t0 = time.time()
        ivf_search_packed_distributed(segb, model, hq, k=10, nprobe=3).count()
        times.append(round(time.time() - t0, 2))
    out["sweep_100kq_nprobe3_s"] = times
    out["sweep_qps_min_n"] = round(100_000 / min(times), 0)
    # candidate-volume check: mean probed-cluster ROWS * nprobe per query
    # (size of the ids array per segment, summed per cluster — counting
    # segment rows alone under-reports by rows_per_segment x)
    from pyspark.sql import functions as F

    sizes = (
        segb.select("cluster_id", F.size("ids").alias("n"))
        .groupBy("cluster_id")
        .agg(F.sum("n").alias("rows"))
    )
    row = sizes.agg(
        F.avg("rows").alias("mean"),
        F.max("rows").alias("max"),
        F.expr("percentile_approx(rows, 0.99)").alias("p99"),
        F.count("*").alias("nonempty"),
    ).collect()[0]
    out["mean_cluster_rows"] = round(float(row["mean"]), 1)
    out["max_cluster_rows"] = int(row["max"])
    out["p99_cluster_rows"] = int(row["p99"])
    out["nonempty_clusters"] = int(row["nonempty"])
    out["candidates_per_query"] = round(float(row["mean"]) * 3, 0)
    with open("/root/repo/scale_probe_r10.json", "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
