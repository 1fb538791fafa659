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


def test_zorder_key_bit_exact(spark):
    """Morton interleave vs a python reference on a small grid."""
    from pyrope_spark.storage import zorder_key

    def z_ref(a, b, bits=10):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    rows = [(a, b) for a in range(8) for b in range(8)] + [(1023, 1023), (512, 3)]
    df = spark.createDataFrame(rows, "_a long, _b long")
    got = df.select("_a", "_b", zorder_key(["_a", "_b"], bits=10).alias("z")).collect()
    for r in got:
        assert r["z"] == z_ref(r["_a"], r["_b"]), (r["_a"], r["_b"])
    # canonical low-order values
    z = {(r["_a"], r["_b"]): r["z"] for r in got}
    assert z[(0, 0)] == 0 and z[(1, 0)] == 1 and z[(0, 1)] == 2 and z[(1, 1)] == 3
    assert z[(2, 0)] == 4


def test_zorder_key_guards(spark):
    import pytest

    from pyrope_spark.storage import zorder_key

    with pytest.raises(ValueError, match="2 or 3"):
        zorder_key(["a"])
    with pytest.raises(ValueError, match="exceeds 63"):
        zorder_key(["a", "b", "c"], bits=22)


def test_zorder_three_columns(spark):
    from pyrope_spark.storage import zorder_key

    df = spark.createDataFrame([(1, 1, 1), (0, 0, 2)], "_a long, _b long, _c long")
    z = {
        (r["_a"], r["_b"], r["_c"]): r["z"]
        for r in df.select("_a", "_b", "_c", zorder_key(["_a", "_b", "_c"], bits=4).alias("z")).collect()
    }
    assert z[(1, 1, 1)] == 7      # bits 0,1,2
    assert z[(0, 0, 2)] == 32     # c bit1 -> position 1*3+2 = 5


def test_versioned_write_read_and_pinning(spark, tmp_path):
    from pyrope_spark.storage import list_versions, read_versioned, write_versioned

    p = str(tmp_path / "corpus")
    v1 = write_versioned(
        spark.createDataFrame([(1, "a")], "id long, t string"), p, note="first"
    )
    v2 = write_versioned(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, t string"), p
    )
    assert (v1, v2) == (1, 2)
    assert read_versioned(spark, p).count() == 2          # LATEST
    assert read_versioned(spark, p, version=1).count() == 1  # pinned
    ms = list_versions(p)
    assert [m["version"] for m in ms] == [1, 2]
    assert ms[0]["note"] == "first" and ms[0]["count"] == 1


def test_versioned_read_requires_manifest(spark, tmp_path):
    import os

    import pytest

    from pyrope_spark.storage import read_versioned, write_versioned

    p = str(tmp_path / "corpus2")
    write_versioned(spark.createDataFrame([(1,)], "id long"), p)
    # simulate a crashed write: data dir without manifest
    os.makedirs(os.path.join(p, "v=2"))
    with pytest.raises(FileNotFoundError, match="no manifest"):
        read_versioned(spark, p, version=2)


def test_forget_keys_removes_and_audits(spark, tmp_path):
    from pyrope_spark.operators.audit import read_audit_log
    from pyrope_spark.storage import forget_keys

    t1, t2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "user_id long, v string"
    ).write.parquet(t1)
    spark.createDataFrame(
        [(10, 2), (11, 2), (12, 9)], "row long, user_id long"
    ).write.parquet(t2)
    nokey = str(tmp_path / "t3")
    spark.createDataFrame([(5,)], "other long").write.parquet(nokey)

    keys = spark.createDataFrame([(2,), (99,)], "user_id long")
    audit = str(tmp_path / "audit")
    removed = forget_keys(
        spark, {"t1": t1, "t2": t2, "t3": nokey}, keys,
        key_col="user_id", audit_log_path=audit,
    )
    assert removed == {"t1": 1, "t2": 2, "t3": -1}
    assert {r["user_id"] for r in spark.read.parquet(t1).collect()} == {1, 3}
    assert {r["user_id"] for r in spark.read.parquet(t2).collect()} == {9}
    trail = read_audit_log(spark, audit).collect()
    assert {r["resource_id"] for r in trail} == {"t1", "t2"}
    assert all(r["action"] == "FORGET_KEYS" and r["success"] for r in trail)
