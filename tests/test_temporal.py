from __future__ import annotations

from datetime import datetime, timedelta

from pyrope_spark.operators.temporal import as_of_join, sessionize


def _ts(m):
    return datetime(2024, 1, 1) + timedelta(minutes=m)


def test_sessionize_gap_breaks(spark):
    rows = [
        ("u1", _ts(0)), ("u1", _ts(10)), ("u1", _ts(100)), ("u1", _ts(105)),
        ("u2", _ts(0)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = sessionize(df, gap_s=1800).collect()  # 30 min gap
    got = {(r["user_id"], r["ts"].minute + r["ts"].hour * 60): r["session_id"] for r in out}
    assert got[("u1", 0)] == 0 and got[("u1", 10)] == 0
    assert got[("u1", 100)] == 1 and got[("u1", 105)] == 1
    assert got[("u2", 0)] == 0


def test_as_of_join_basic(spark):
    left = spark.createDataFrame(
        [("k", _ts(5), "a"), ("k", _ts(20), "b"), ("k", _ts(1), "c")],
        "key string, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [("k", _ts(2), 100), ("k", _ts(10), 200)],
        "key string, ts timestamp, val int",
    )
    out = {r["name"]: r["right_val"] for r in
           as_of_join(left, right, key_cols=["key"]).collect()}
    assert out == {"c": None, "a": 100, "b": 200}


def test_as_of_join_equal_ts_inclusive_vs_strict(spark):
    left = spark.createDataFrame([("k", _ts(10), "x")], "key string, ts timestamp, name string")
    right = spark.createDataFrame([("k", _ts(10), 7)], "key string, ts timestamp, val int")
    inc = as_of_join(left, right, key_cols=["key"]).collect()[0]["right_val"]
    strict = as_of_join(left, right, key_cols=["key"], strict=True).collect()[0]["right_val"]
    assert inc == 7
    assert strict is None
