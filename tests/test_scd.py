"""SCD2 builder (operators/scd.py) — no-op collapse, interval chaining,
versioning, NULL-attribute handling, and plan shape."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyrope_spark.operators.scd import scd2_build


def _changes(spark, rows):
    base = datetime(2026, 1, 1)
    return spark.createDataFrame(
        [(k, base + timedelta(seconds=s), a, i) for i, (k, s, a) in enumerate(rows)],
        "k long, ts timestamp, status string, seq long",
    )


def _build(df):
    return scd2_build(
        df, key_cols=["k"], ts_col="ts", attr_cols=["status"],
        tiebreak_cols=["seq"],
    )


def test_scd2_intervals_chain_and_version(spark):
    df = _changes(spark, [(1, 0, "a"), (1, 10, "b"), (1, 20, "c")])
    rows = _build(df).orderBy("version").collect()
    assert [r["status"] for r in rows] == ["a", "b", "c"]
    assert rows[0]["valid_to"] == rows[1]["valid_from"]
    assert rows[1]["valid_to"] == rows[2]["valid_from"]
    assert rows[2]["valid_to"] is None and rows[2]["is_current"]
    assert [r["version"] for r in rows] == [1, 2, 3]


def test_scd2_noop_changes_collapse(spark):
    df = _changes(
        spark, [(1, 0, "a"), (1, 5, "a"), (1, 10, "b"), (1, 15, "b"), (1, 20, "a")]
    )
    rows = _build(df).orderBy("version").collect()
    # a (re-emitted a collapses) -> b (dup collapses) -> a again = new version
    assert [r["status"] for r in rows] == ["a", "b", "a"]
    assert rows[0]["valid_from"].second == 0 and rows[1]["valid_from"].second == 10


def test_scd2_null_attr_transitions(spark):
    df = _changes(spark, [(1, 0, None), (1, 5, None), (1, 10, "x"), (1, 15, None)])
    rows = _build(df).orderBy("version").collect()
    assert [r["status"] for r in rows] == [None, "x", None]


def test_scd2_keys_independent_and_plan(spark):
    df = _changes(spark, [(1, 0, "a"), (2, 0, "z"), (1, 10, "b")])
    out = _build(df)
    rows = {(r["k"], r["version"]): r for r in out.collect()}
    assert rows[(1, 2)]["status"] == "b" and rows[(2, 1)]["is_current"]
    # AdaptiveSparkPlan prints Final AND Initial copies — count the final only
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # one key-hash exchange total; collapse + interval windows share it
    assert final.count("Exchange hashpartitioning") == 1
    assert "Join" not in final
