#!/usr/bin/env python
"""Round-5 session-3 wave-2 probes at 5M events x 1k keys: winsorize,
cusum_changepoint, categorical_association, equal-frequency binning
(ntile windows), rolling HLL over 365 daily register sets. One JSON line."""

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
out = {}


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
                        "day_i": rng.integers(0, 365, rows),
                        "tse": rng.integers(1_700_000_000, 1_730_000_000, rows),
                    }
                )

    base = spark.createDataFrame([(i,) for i in range(PARTS)], "pid int").repartition(PARTS)
    return base.mapInPandas(
        gen, "id long, k long, value double, day_i long, tse long"
    )


def main():
    spark = get_spark("probe_r5e")
    ev = synth_events(spark, 5_000_000, 1000).withColumn(
        "ts", F.to_timestamp(F.from_unixtime("tse"))
    ).withColumn(
        "day", F.date_add(F.lit("2024-01-01").cast("date"), F.col("day_i").cast("int"))
    ).withColumn("ks", F.col("k").cast("string")).cache()
    ev.count()

    from pyrope_spark.operators.curation import winsorize

    timed(
        "winsorize_5M_1k_keys",
        lambda: winsorize(ev, "ks", "value", "id")
        .agg(F.count("*"), F.sum("clipped_micro"))
        .collect()[0][0],
    )

    from pyrope_spark.operators.temporal import cusum_changepoint

    timed(
        "cusum_5M_1k_keys",
        lambda: cusum_changepoint(ev, "ks", "value", "ts", "id")
        .agg(F.count("*"), F.sum("cusum_peak_micro"))
        .collect()[0][0],
    )

    from pyrope_spark.operators.profile import categorical_association

    ev2 = ev.withColumn("dow", F.dayofweek("ts").cast("long"))
    timed(
        "chi_square_5M",
        lambda: categorical_association(ev2, "ks", "dow")
        .agg(F.count("*"), F.sum("chi2_contrib_micro"))
        .collect()[0][0],
    )

    from pyspark.sql import Window as W

    def eqbin():
        w = W.partitionBy("ks").orderBy(
            F.round(F.col("value") * 1_000_000).cast("long").asc(),
            F.col("id").asc(),
        )
        binned = ev.select(
            "ks", F.ntile(10).over(w).cast("long").alias("decile"),
            F.round(F.col("value") * 1_000_000).cast("long").alias("vm"),
        )
        return (
            binned.groupBy("ks", "decile")
            .agg(F.count("*"), F.sum("vm"))
            .agg(F.count("*"))
            .collect()[0][0]
        )

    timed("equal_freq_binning_5M_1k_keys", eqbin)

    from pyrope_spark.operators.sketch import (
        hll_build,
        hll_estimate,
        hll_rolling_merge,
    )

    def rolling():
        daily = hll_build(ev, "id", group_cols=("day",))
        merged = hll_rolling_merge(daily, "day", window_days=7)
        est = hll_estimate(merged, group_cols=("day",))
        return est.agg(F.count("*"), F.sum("s_scaled")).collect()[0][0]

    timed("rolling_hll_5M_365_days", rolling)

    print(json.dumps({"probe": "r5e", **out}))


if __name__ == "__main__":
    main()
