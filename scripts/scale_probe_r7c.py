#!/usr/bin/env python
"""Round-7 experimentation-wave scale probes: the wave-6/7 operators at
5M events / 6M lineitem rows — executed-plan exchange counts + wall
time, same harness as scale_probe_r7.py/r7b.py. Inputs hash-derived
(deterministic, generation never dominates)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pyrope_spark.session import get_spark


def probe(name, fn):
    """Times fn() through a noop WRITE, not count(): under count(),
    Catalyst prunes every column the row count doesn't need — the
    poisson-bootstrap probe 'ran' in 1.0s because the 320M md5 weight
    draws were optimized out of the counted plan (collect() showed the
    real 19-36s). A noop sink materializes every output column."""
    t0 = time.time()
    out = fn()
    extra = ""
    if hasattr(out, "_jdf"):
        out.write.format("noop").mode("overwrite").save()
        n = out.count()
        plan = out._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        extra = (f" rows={n} exchanges={plan.count('Exchange ')} "
                 f"single_partition={'SinglePartition' in plan} "
                 f"cartesian={'CartesianProduct' in plan}")
    print(f"[probe] {name}: {time.time() - t0:.1f}s —{extra}", flush=True)


def main() -> None:
    spark = get_spark("scale_probe_r7c", cores=32, shuffle_partitions=64)

    n = 5_000_000
    users = 200_000
    ev = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            (F.abs(F.xxhash64("id")) % users).alias("user_id"),
            (F.lit(1_700_000_000)
             + F.abs(F.xxhash64("id", F.lit(1))) % (90 * 86400))
            .alias("es"),
            F.array(
                F.lit("view"), F.lit("click"), F.lit("purchase"),
                F.lit("search"),
            )[(F.abs(F.xxhash64("id", F.lit(2))) % 4).cast("int")]
            .alias("event_type"),
            ((F.abs(F.xxhash64("id", F.lit(3))) % 3600) + 60).cast("double")
            .alias("value"),
        )
        .withColumn("ts", F.timestamp_seconds(F.col("es")))
        .cache()
    )
    ev.count()
    cents = F.floor(F.col("value") * 100).cast("long")
    variant = (F.col("user_id") % 2).cast("long")

    from pyrope_spark.operators.experiment import (
        bh_fdr_event_lift,
        calibration_ece,
        churn_label_windows,
        covariate_balance_audit,
        cuped_adjusted_lift,
        dispersion_index_daily,
        forecast_backtest_sma,
        mann_whitney_u,
        poisson_bootstrap_mean,
    )

    probe(
        "cuped_5M_events_200k_users",
        lambda: cuped_adjusted_lift(
            ev,
            variant_expr=variant,
            pre_expr=F.col("es") < 1_700_000_000 + 45 * 86400,
            value_cents_expr=cents,
        ),
    )
    # value domain: 3,600 distinct cents values -> domain-sized rank window
    probe(
        "mann_whitney_5M_events",
        lambda: mann_whitney_u(
            ev, group_expr=variant, value_cents_expr=cents
        ),
    )
    probe(
        "calibration_ece_5M_events",
        lambda: calibration_ece(
            ev, label_expr=F.col("event_type") == "purchase"
        ),
    )
    probe(
        "bh_fdr_5M_events_4_metrics",
        lambda: bh_fdr_event_lift(
            ev,
            metric_types=["view", "click", "purchase", "search"],
            variant_expr=variant,
        ),
    )
    probe(
        "churn_labels_5M_events_200k_users",
        lambda: churn_label_windows(
            ev,
            cutoff_sql="TIMESTAMP '2023-12-30'",
            horizon_days=14,
            value_cents_expr=cents,
        ),
    )
    probe(
        "covariate_balance_5M_events",
        lambda: covariate_balance_audit(ev, variant_expr=variant),
    )
    probe(
        "forecast_backtest_5M_events_4_keys_90d",
        lambda: forecast_backtest_sma(ev, value_cents_expr=cents),
    )
    probe(
        "dispersion_index_5M_events",
        lambda: dispersion_index_daily(ev),
    )
    # the heavy one: 5M rows x 64 replicates = 320M (row, rep) md5 draws
    probe(
        "poisson_bootstrap_5M_rows_64_reps",
        lambda: poisson_bootstrap_mean(
            ev, id_col="event_id", value_cents_expr=cents
        ),
    )

    # price-volume-mix on a 6M-row synthetic lineitem over 50k parts
    from pyrope_spark.operators.experiment import price_volume_mix

    li = (
        spark.range(6_000_000)
        .select(
            (F.abs(F.xxhash64("id")) % 50_000).alias("l_partkey"),
            ((F.abs(F.xxhash64("id", F.lit(1))) % 50) + 1).cast("double")
            .alias("l_quantity"),
            ((F.abs(F.xxhash64("id", F.lit(2))) % 90_000) / 100.0 + 1.0)
            .alias("l_extendedprice"),
            ((F.abs(F.xxhash64("id", F.lit(3))) % 11) / 100.0)
            .alias("l_discount"),
            F.timestamp_seconds(
                F.lit(850_000_000)
                + F.abs(F.xxhash64("id", F.lit(4))) % (200_000_000)
            ).alias("l_shipdate"),
        )
        .cache()
    )
    li.count()
    part = spark.range(50_000).select(
        F.col("id").alias("p_partkey"),
        F.concat(F.lit("B"), (F.col("id") % 25).cast("string"))
        .alias("p_brand"),
    )
    probe(
        "price_volume_mix_6M_lineitem_50k_parts",
        lambda: price_volume_mix(li, part),
    )


if __name__ == "__main__":
    main()
