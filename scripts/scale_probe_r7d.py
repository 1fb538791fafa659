#!/usr/bin/env python
"""Round-7 wave-8/9 scale probes: power/stratification/SPC/churn/lift,
quantization audit, seasonal anomalies, dup-shape, smoothing, and the
split-leakage audit at 5M events / 1M vectors / 1M docs. noop-write
materialization (see scale_probe_r7c.py docstring for the count-prune
hazard this avoids)."""

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
        out.write.format("noop").mode("overwrite").save()
        n = out.count()
        plan = out._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        extra = (f" rows={n} exchanges={plan.count('Exchange ')} "
                 f"single_partition={'SinglePartition' in plan} "
                 f"cartesian={'CartesianProduct' in plan}")
    print(f"[probe] {name}: {time.time() - t0:.1f}s —{extra}", flush=True)


def main() -> None:
    spark = get_spark("scale_probe_r7d", cores=32, shuffle_partitions=64)

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
            (F.abs(F.xxhash64("id", F.lit(4))) % 2000).alias("item_id"),
        )
        .withColumn("ts", F.timestamp_seconds(F.col("es")))
        .cache()
    )
    ev.count()
    cents = F.floor(F.col("value") * 100).cast("long")
    variant = (F.col("user_id") % 2).cast("long")

    from pyrope_spark.operators.experiment import (
        ab_power_sample_size,
        feature_lift_deciles,
        post_stratified_lift,
        proportion_control_chart,
        smoothed_group_rates,
        topk_churn_daily,
    )

    probe(
        "ab_power_5M_events",
        lambda: ab_power_sample_size(
            ev, convert_expr=F.col("event_type") == "purchase"
        ),
    )
    probe(
        "post_stratified_5M_events",
        lambda: post_stratified_lift(
            ev,
            variant_expr=variant,
            pre_expr=F.col("es") < 1_700_000_000 + 45 * 86400,
            convert_expr=F.col("event_type") == "purchase",
        ),
    )
    probe(
        "p_chart_5M_events_90_days",
        lambda: proportion_control_chart(
            ev,
            group_expr=F.expr(
                "CAST((es - 1700000000) DIV 86400 AS BIGINT)"
            ),
            flag_expr=F.col("event_type") == "purchase",
        ),
    )
    probe(
        "topk_churn_5M_events_2000_items_k20",
        lambda: topk_churn_daily(
            ev, item_expr=F.col("item_id"), value_cents_expr=cents, k=20
        ),
    )
    probe(
        "smoothed_rates_5M_events_2000_groups",
        lambda: smoothed_group_rates(
            ev,
            group_expr=F.col("item_id"),
            flag_expr=F.col("event_type") == "purchase",
        ),
    )

    from pyrope_spark.operators.experiment import churn_label_windows

    labeled = churn_label_windows(
        ev,
        cutoff_sql="TIMESTAMP '2023-12-30'",
        horizon_days=14,
        value_cents_expr=cents,
    )
    # 200k-unit ntile window: unit-sized single partition by design —
    # the probe documents the bound (billion-unit inputs: global_rank)
    probe(
        "feature_lift_200k_labeled_users",
        lambda: feature_lift_deciles(
            labeled,
            feature_col="n_events",
            label_col="churned",
            id_col="user_id",
        ),
    )

    from pyrope_spark.operators.temporal import dow_adjusted_anomalies

    probe(
        "dow_anomalies_5M_events_90_days",
        lambda: dow_adjusted_anomalies(ev, k=5),
    )

    # SQ8 reconstruction audit at 1M x d64
    from pyrope_spark.operators.quantize import sq8_reconstruction_error

    def synth_vec():
        import numpy as np  # noqa: F401

        def gen(it):
            import numpy as np
            import pandas as pd

            for pdf in it:
                for pid in pdf["pid"]:
                    rng = np.random.default_rng(100 + int(pid))
                    m = rng.random((1_000_000 // 32, 64), dtype=np.float32)
                    yield pd.DataFrame({"embedding": list(m)})

        base = spark.createDataFrame(
            [(i,) for i in range(32)], "pid int"
        ).repartition(32)
        return base.mapInPandas(gen, "embedding array<float>")

    vecs = synth_vec().cache()
    vecs.count()
    probe(
        "sq8_reconstruction_1M_x_d64",
        lambda: sq8_reconstruction_error(vecs),
    )
    vecs.unpersist()

    # component size bands over a 2M-edge pair table (hash-derived)
    from pyrope_spark.operators.graph import (
        component_size_bands,
        connected_components_star,
    )

    pairs = spark.range(2_000_000).select(
        (F.abs(F.xxhash64("id")) % 1_000_000).alias("ia"),
        (F.abs(F.xxhash64("id", F.lit(1))) % 1_000_000).alias("ib"),
    ).filter(F.col("ia") != F.col("ib"))
    comp = connected_components_star(pairs, src_col="ia", dst_col="ib")
    probe(
        "component_size_bands_2M_edges",
        lambda: component_size_bands(comp),
    )

    # split-leakage audit at 1M synthetic docs (word-soup text)
    from pyrope_spark.operators.dedup import split_leakage_audit

    words = F.array(*[F.lit(f"w{i}") for i in range(500)])
    docs = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                words[(F.abs(F.xxhash64("id", F.lit(j))) % 500).cast("int")]
                for j in range(30)
            ],
        ).alias("text"),
    ).cache()
    docs.count()
    probe(
        "split_leakage_1M_docs_30_tokens",
        lambda: split_leakage_audit(docs),
    )


if __name__ == "__main__":
    main()
