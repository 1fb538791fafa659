#!/usr/bin/env python
"""Round-7 scale probes (VERDICT r6 ask #6): the round-6 session-4/5
analytics not yet in PLANS.md, at 5M+ events:

- attribution_credit: per-user lookback range join, 5M events / 200k users
- dau_mau_stickiness: trailing-28d range join over the compacted activity
  table, 5M events / 50k users / 180 days
- lorenz_curve_deciles + quantile_normalize: the two global_rank consumers,
  probed at 5M members AFTER the r7 pinned-splitter rewrite (no
  localCheckpoint materialization anymore — this measures the recompute
  trade directly)
- item_item_cosine_topk: basket self-join under a skewed hot basket
  (one basket holding 5,000 items) with and without the max_basket_size
  cap — the cap is the Σn² fanout bound

Inputs are hash-derived (xxhash64 mixes — deterministic, generation never
dominates the measurement). Each probe reports wall time, output count,
and the EXECUTED plan's exchange count (AQE final plan only).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pyrope_spark.session import get_spark


def probe(name, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
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
        nex = plan.count("Exchange ")  # excludes ReusedExchange reuse rows
        nreuse = plan.count("ReusedExchange")
        single = "SinglePartition" in plan
        cart = "CartesianProduct" in plan
        extra = (f" rows={n} exchanges={nex} reused={nreuse} "
                 f"single_partition={single} cartesian={cart}")
        out = ""
    print(f"[probe] {name}: {time.time() - t0:.1f}s —{extra} {out}")


def main() -> None:
    spark = get_spark("scale_probe_r7", cores=32, shuffle_partitions=64)

    n = 5_000_000
    users = 200_000
    ev = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            (F.abs(F.xxhash64("id")) % users).alias("user_id"),
            (F.lit(1_700_000_000) + F.abs(F.xxhash64("id", F.lit(1))) % (180 * 86400))
            .alias("es"),
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase"))[
                (F.abs(F.xxhash64("id", F.lit(2))) % 3).cast("int")
            ].alias("event_type"),
            (F.abs(F.xxhash64("id", F.lit(3))) % 360).cast("double").alias("value"),
        )
        .withColumn("ts", F.timestamp_seconds(F.col("es")))
        .withColumn("ts_ns", (F.col("es") * F.lit(1_000_000_000)).cast("long"))
        .cache()
    )
    ev.count()

    # ---- attribution: per-user lookback join (7d) at 5M events
    from pyrope_spark.operators.attribution import attribution_credit

    probe(
        "attribution_credit_5M_events_200k_users_7d",
        lambda: attribution_credit(ev),
    )

    # ---- DAU/MAU: 5M events compact to <= 50k users x 180 days activity
    from pyrope_spark.operators.analytics import dau_mau_stickiness

    ev50 = ev.withColumn("user_id", F.col("user_id") % 50_000)
    probe(
        "dau_mau_stickiness_5M_events_50k_users_180d",
        lambda: dau_mau_stickiness(ev50),
    )

    # ---- global_rank consumers at 5M members (post pinned-splitter)
    from pyrope_spark.operators.analytics import lorenz_curve_deciles

    members = (
        spark.range(n)
        .select(
            F.col("id").alias("member_id"),
            (F.abs(F.xxhash64("id", F.lit(7))) % 1_000_000).cast("double")
            .alias("spend"),
        )
        .cache()
    )
    members.count()
    probe(
        "lorenz_deciles_5M_members",
        lambda: lorenz_curve_deciles(
            members, id_col="member_id", value_col="spend"
        ),
    )

    from pyrope_spark.operators.curation import quantile_normalize

    docs = members.select(
        F.col("member_id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("member_id") % 4).cast("string")).alias(
            "source"
        ),
        (F.col("spend") * 3).cast("long").alias("n_chars"),
    )
    probe(
        "quantile_normalize_5M_docs_4_groups",
        lambda: quantile_normalize(docs),
    )

    # ---- item-item cosine under a hot basket: 2M rows, one 5k-item basket
    from pyrope_spark.operators.recommend import item_item_cosine_topk

    base = spark.range(2_000_000).select(
        (F.abs(F.xxhash64("id")) % 400_000).alias("basket_id"),
        (F.abs(F.xxhash64("id", F.lit(11))) % 50_000).alias("item_id"),
    )
    hot = spark.range(5_000).select(
        F.lit(999_999_999).alias("basket_id"), F.col("id").alias("item_id")
    )
    baskets = base.unionByName(hot).cache()
    baskets.count()
    probe(
        "item_item_cosine_2M_rows_hot5000_cap128",
        lambda: item_item_cosine_topk(baskets, max_basket_size=128),
    )
    probe(
        "item_item_cosine_2M_rows_no_hot_cap128",
        lambda: item_item_cosine_topk(base, max_basket_size=128),
    )


if __name__ == "__main__":
    main()
