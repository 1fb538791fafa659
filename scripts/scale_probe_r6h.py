#!/usr/bin/env python
"""Round-6 session-5 wave-4/5/6 scale probes at event scale:
interval-union coverage, cohort LTV, EMD drift, and conversion lags at
5M rows / 200k users — all should hold their 1-3-shuffle linear shapes.
Inputs are hash-derived (deterministic, generation never dominates)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pyrope_spark.session import get_spark


def probe(name, fn):
    t0 = time.time()
    out = fn()
    print(f"[probe] {name}: {time.time() - t0:.1f}s — {out}")


def main() -> None:
    spark = get_spark("scale_probe_r6h", cores=32, shuffle_partitions=64)

    n = 5_000_000
    users = 200_000
    ev = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            (F.abs(F.xxhash64("id")) % users).alias("user_id"),
            (F.lit(1_700_000_000) + F.abs(F.xxhash64("id", F.lit(1))) % (90 * 86400))
            .alias("es"),
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase"))[
                (F.abs(F.xxhash64("id", F.lit(2))) % 3).cast("int")
            ].alias("event_type"),
            (F.abs(F.xxhash64("id", F.lit(3))) % 360).cast("double").alias("value"),
        )
        .withColumn("ts", F.timestamp_seconds(F.col("es")))
        .cache()
    )
    ev.count()

    from pyrope_spark.operators.temporal import interval_union_coverage

    iv = ev.select(
        "user_id",
        F.col("es").alias("start_s"),
        (F.col("es") + 600 + (F.col("value").cast("long") * 20)).alias("end_s"),
    )
    probe(
        "interval_union_5M_intervals_200k_users",
        lambda: interval_union_coverage(iv).count(),
    )

    from pyrope_spark.operators.analytics import cohort_ltv_curve

    probe("cohort_ltv_5M_events_200k_users", lambda: cohort_ltv_curve(ev).count())

    from pyrope_spark.operators.profile import emd_value_drift

    probe(
        "emd_drift_5M_events_3_keys",
        lambda: emd_value_drift(
            ev.withColumn("half", (F.col("event_id") % 2).cast("int")),
            key_col="event_type",
            value_col="value",
            split_col="half",
            bucket_width=10,
        ).count(),
    )

    from pyrope_spark.operators.funnel import conversion_lag_percentiles

    probe(
        "conversion_lags_5M_events",
        lambda: conversion_lag_percentiles(ev).count(),
    )
    ev.unpersist()


if __name__ == "__main__":
    main()
