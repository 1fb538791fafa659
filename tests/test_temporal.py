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


def test_interval_join_bucket_boundaries(spark):
    """Pairs must match regardless of where interval/point fall relative to
    bucket edges — including intervals spanning many buckets and points on
    exact interval endpoints (closed='both')."""
    from pyrope_spark.operators.temporal import interval_join

    base = datetime(2026, 1, 1, 0, 0, 0)
    pts = spark.createDataFrame(
        [
            ("u1", base, 1.0),  # on start boundary
            ("u1", base + timedelta(seconds=3600 * 5), 2.0),  # mid, far bucket
            ("u1", base + timedelta(seconds=3600 * 10), 3.0),  # on end boundary
            ("u1", base + timedelta(seconds=3600 * 10, microseconds=1), 4.0),  # after
            ("u2", base + timedelta(seconds=30), 5.0),  # other key
        ],
        "user_id string, ts timestamp, v double",
    )
    iv = spark.createDataFrame(
        [("u1", "w", base, base + timedelta(seconds=3600 * 10))],
        "user_id string, win string, start_ts timestamp, end_ts timestamp",
    )
    got = interval_join(pts, iv, key_cols=["user_id"], bucket_s=3600).collect()
    assert sorted(r.v for r in got) == [1.0, 2.0, 3.0]


def test_interval_join_closed_modes(spark):
    from pyrope_spark.operators.temporal import interval_join

    base = datetime(2026, 1, 1)
    pts = spark.createDataFrame(
        [("k", base, "at_start"), ("k", base + timedelta(seconds=100), "at_end")],
        "user_id string, ts timestamp, tag string",
    )
    iv = spark.createDataFrame(
        [("k", base, base + timedelta(seconds=100))],
        "user_id string, start_ts timestamp, end_ts timestamp",
    )
    def tags(closed):
        rows = interval_join(
            pts, iv, key_cols=["user_id"], bucket_s=60, closed=closed
        ).collect()
        return sorted(r.tag for r in rows)

    assert tags("both") == ["at_end", "at_start"]
    assert tags("left") == ["at_start"]
    assert tags("right") == ["at_end"]


def test_interval_join_no_duplicate_pairs_and_plan(spark):
    """An interval spanning N buckets must still yield each matching pair
    once, and the join must be an equi-join (hash/sort-merge), not a
    nested-loop range join."""
    from pyrope_spark.operators.temporal import interval_join

    base = datetime(2026, 1, 1)
    pts = spark.createDataFrame(
        [("k", base + timedelta(seconds=s), float(s)) for s in range(0, 1000, 100)],
        "user_id string, ts timestamp, v double",
    )
    iv = spark.createDataFrame(
        [("k", base, base + timedelta(seconds=1000))],
        "user_id string, start_ts timestamp, end_ts timestamp",
    )
    out = interval_join(pts, iv, key_cols=["user_id"], bucket_s=60)
    rows = out.collect()
    assert len(rows) == 10 == len({r.v for r in rows})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
