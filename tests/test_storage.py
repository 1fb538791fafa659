"""Bucketed storage (pyrope_spark/storage.py) — the co-located join must
plan WITHOUT an Exchange on either side, and results must match the plain
join."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyrope_spark.storage import bucketed_join_ready, read_bucketed, write_bucketed


def test_bucketed_join_is_exchange_free(spark):
    left = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "t_left", bucket_cols=["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed(right, "t_right", bucket_cols=["k"], n_buckets=8, sort_cols=["k"])
    try:
        assert bucketed_join_ready(spark, "t_left", "t_right")
        lt, rt = read_bucketed(spark, "t_left"), read_bucketed(spark, "t_right")
        # disable broadcast so the test exercises the sort-merge path a
        # 100 TB fact-fact join would take
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = lt.join(rt, "k")
        joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "Exchange" not in final, final[:2000]
        # correctness: same result as the plain join
        plain = left.join(right, "k").select("k", "a", "b")
        assert sorted(map(tuple, joined.select("k", "a", "b").collect())) == \
            sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_left")
        spark.sql("DROP TABLE IF EXISTS t_right")


def test_bucketed_aggregate_reuses_layout(spark):
    df = spark.range(5000).select((F.col("id") % 100).alias("k"), F.col("id").alias("v"))
    write_bucketed(df, "t_agg", bucket_cols=["k"], n_buckets=4)
    try:
        agg = read_bucketed(spark, "t_agg").groupBy("k").agg(F.sum("v").alias("s"))
        agg.count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # same-key aggregation over the bucketed layout: no Exchange either
        assert "Exchange" not in final
        got = {r["k"]: r["s"] for r in agg.collect()}
        exp = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
        assert got == exp
    finally:
        spark.sql("DROP TABLE IF EXISTS t_agg")
