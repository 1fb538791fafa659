#!/usr/bin/env python
"""r9 1M probe: confirm the float32 probe-transport fix at 10x the bench
scale.  Same shapes as scripts/scale_probe_r8.py's uniform sweep —
1M x d128 corpus, nlist=1000 (sqrt-N), 100k-query distributed sweep at
nprobe 3 — so the q/s compares directly to BENCH_1M_r8.json's 6,711."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import DIM, synth_vectors  # noqa: E402
from pyrope_spark.session import get_spark  # noqa: E402

N = 1_000_000
NLIST = 1_000


def main() -> None:
    spark = get_spark("probe_r9_1m")
    from pyrope_spark.operators.ivf import (
        build_ivf,
        ivf_search_packed_distributed,
    )
    from pyrope_spark.operators.segments import (
        pack_segments,
        write_segments_bucketed,
    )

    out = {}
    vectors = synth_vectors(spark, N, DIM).cache()
    vectors.count()
    t0 = time.time()
    assigned, model = build_ivf(vectors, nlist=NLIST, metric="l2")
    seg = pack_segments(
        assigned, cluster_col="cluster_id", rows_per_segment=8192
    ).cache()
    seg.count()
    out["ivf_build_s"] = round(time.time() - t0, 1)
    segb = write_segments_bucketed(
        seg, "probe_r9_seg", "spark-warehouse/probe_r9_seg", n_buckets=32
    )
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
    print(json.dumps(out))


if __name__ == "__main__":
    main()
