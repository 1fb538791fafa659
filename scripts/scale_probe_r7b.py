#!/usr/bin/env python
"""Round-7 wave scale probes: the r7 additions at 5M events / 1M docs —
executed-plan exchange counts + wall time, same harness as
scale_probe_r7.py. Inputs hash-derived (deterministic, generation never
dominates)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pyrope_spark.session import get_spark


def probe(name, fn):
    t0 = time.time()
    out = fn()
    extra = ""
    if hasattr(out, "_jdf"):
        # noop write, not just count(): count() lets Catalyst prune
        # every column the row count doesn't need, silently skipping
        # aggregate-value work (caught in r7c: the bootstrap's 320M md5
        # draws were optimized out of the counted plan)
        out.write.format("noop").mode("overwrite").save()
        n = out.count()
        plan = out._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        extra = (f" rows={n} exchanges={plan.count('Exchange ')} "
                 f"single_partition={'SinglePartition' in plan} "
                 f"cartesian={'CartesianProduct' in plan}")
    print(f"[probe] {name}: {time.time() - t0:.1f}s —{extra}", flush=True)


def main() -> None:
    spark = get_spark("scale_probe_r7b", cores=32, shuffle_partitions=64)

    n = 5_000_000
    users = 200_000
    ev = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            (F.abs(F.xxhash64("id")) % users).alias("user_id"),
            (F.lit(1_700_000_000) + F.abs(F.xxhash64("id", F.lit(1))) % (90 * 86400))
            .alias("es"),
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase"), F.lit("search"))[
                (F.abs(F.xxhash64("id", F.lit(2))) % 4).cast("int")
            ].alias("event_type"),
            ((F.abs(F.xxhash64("id", F.lit(3))) % 3600) + 60).cast("double")
            .alias("value"),
        )
        .withColumn("ts", F.timestamp_seconds(F.col("es")))
        .cache()
    )
    ev.count()

    from pyrope_spark.operators.privacy import t_closeness_report

    qi = ev.select(
        (F.col("user_id") % 200).cast("long").alias("user_bucket"),
        F.col("event_type"),
        F.floor(F.col("value") / 100).cast("long").alias("value_band"),
    )
    probe(
        "t_closeness_5M_events_800_classes",
        lambda: t_closeness_report(qi, ["user_bucket", "event_type"], "value_band"),
    )

    from pyrope_spark.operators.temporal import (
        ma_crossover_signals,
        rate_burst_windows,
    )

    probe(
        "rate_burst_5M_events_2160_windows",
        lambda: rate_burst_windows(ev, key_col="event_type", window_s=3600),
    )
    probe(
        "ma_crossover_5M_events_90d",
        lambda: ma_crossover_signals(
            ev.select("event_type", "ts", F.floor(F.col("value")).cast("long").alias("v")),
            key_col="event_type", ts_col="ts", value_col="v",
        ),
    )

    from pyrope_spark.operators.scd import interval_integrity_audit

    iv = ev.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.timestamp_seconds(F.col("es") + F.col("value").cast("long"))
        .alias("valid_to"),
    )
    probe(
        "interval_integrity_5M_rows_200k_keys",
        lambda: interval_integrity_audit(iv),
    )

    from pyrope_spark.operators.analytics import (
        behavioral_concentration,
        coverage_count_by_group,
        ols_slope_by_group,
    )

    probe(
        "behavioral_concentration_5M_events",
        lambda: behavioral_concentration(ev),
    )
    probe(
        "coverage_count_5M_events_200k_members",
        lambda: coverage_count_by_group(
            ev.select((F.col("user_id") % 25).alias("g"), "user_id",
                      F.floor("value").cast("long").alias("v")),
            group_cols=("g",), member_col="user_id", value_col="v",
        ),
    )
    probe(
        "ols_slope_5M_rows_100_groups",
        lambda: ols_slope_by_group(
            ev.select((F.col("user_id") % 100).alias("g"),
                      (F.col("event_id") % 50).cast("long").alias("x"),
                      F.floor("value").cast("long").alias("y")),
            group_cols=("g",), x_col="x", y_col="y",
        ),
    )

    from pyrope_spark.operators.profile import fd_discovery_matrix

    probe(
        "fd_discovery_5M_rows_4cols_12pairs",
        lambda: fd_discovery_matrix(
            ev.select("event_id", "user_id", "event_type",
                      (F.col("user_id") % 7).alias("bucket")),
            ["event_id", "user_id", "event_type", "bucket"],
        ),
    )

    # ---- docs-shaped probes at 1M docs
    docs = (
        spark.range(1_000_000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % 8).cast("string"))
            .alias("source"),
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit("w"),
                        (F.abs(F.xxhash64("id", F.lit(j))) % 30_000)
                        .cast("string"),
                    )
                    for j in range(30)
                ],
            ).alias("text"),
        )
        .cache()
    )
    docs.count()
    from pyrope_spark.operators.dedup import source_shingle_overlap

    probe(
        "source_shingle_overlap_1M_docs_8_sources",
        lambda: source_shingle_overlap(docs, ngram_n=2),
    )

    from pyrope_spark.operators.similarity import embedding_norm_outliers

    emb = (
        spark.range(1_000_000)
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    (
                        ((F.abs(F.xxhash64("id", F.lit(j + 7))) % 2001) - 1000)
                        / 1000.0
                    ).cast("float")
                    for j in range(64)
                ]
            ).alias("embedding"),
        )
        .cache()
    )
    emb.count()
    probe(
        "embedding_norm_outliers_1M_vectors",
        lambda: embedding_norm_outliers(emb),
    )


if __name__ == "__main__":
    main()
