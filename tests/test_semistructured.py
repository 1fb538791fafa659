"""JSON schema-on-read + quarantine (operators/semistructured.py)."""

from __future__ import annotations

from pyrope_spark.operators.semistructured import (
    parse_json_column,
    quarantine_split,
)


def test_parse_typed_fields_and_corrupt_flag(spark):
    df = spark.createDataFrame(
        [
            (1, '{"k": 5, "device": "ios"}'),
            (2, '{"k": "not-an-int"}'),       # schema violation -> corrupt
            (3, "{{{ nonsense"),               # malformed -> corrupt
            (4, None),                         # absent -> null fields, NOT corrupt
        ],
        "id long, props string",
    )
    out = {r["id"]: r for r in parse_json_column(
        df, "props", "k INT, device STRING"
    ).collect()}
    assert out[1]["k"] == 5 and out[1]["device"] == "ios"
    assert out[1]["props_corrupt"] is False
    # Spark PERMISSIVE treats a type violation as corrupt (the raw record
    # lands in the corrupt column) — the declared-schema contract
    assert out[2]["k"] is None and out[2]["props_corrupt"] is True
    assert out[3]["props_corrupt"] is True and out[3]["k"] is None
    assert out[4]["props_corrupt"] is False and out[4]["k"] is None


def test_quarantine_split_routes(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 1}'), (2, "oops{")], "id long, props string"
    )
    parsed = parse_json_column(df, "props", "k INT")
    clean, bad = quarantine_split(parsed, "props")
    assert [r["id"] for r in clean.collect()] == [1]
    assert [r["id"] for r in bad.collect()] == [2]


def test_prefix(spark):
    df = spark.createDataFrame([(1, '{"k": 2}')], "id long, props string")
    row = parse_json_column(df, "props", "k INT", prefix="p_").collect()[0]
    assert row["p_k"] == 2


def test_json_key_profile_closed_form(spark):
    from datetime import datetime

    from pyrope_spark.operators.semistructured import json_key_profile

    rows = [
        (1, '{"a": 1, "b": "x"}', datetime(2024, 1, 1)),
        (2, '{"a": 2}', datetime(2024, 1, 2)),
        (3, '{"c_new": true}', datetime(2024, 1, 3)),
        (4, None, datetime(2024, 1, 3)),
    ]
    df = spark.createDataFrame(rows, "event_id LONG, props STRING, ts TIMESTAMP")
    out = {r.key: r for r in json_key_profile(df).collect()}
    assert set(out) == {"a", "b", "c_new"}
    assert out["a"].n_rows == 2 and out["a"].n_days == 2
    assert out["b"].n_rows == 1
    assert out["c_new"].first_day == out["c_new"].last_day
    assert out["a"].first_day < out["c_new"].first_day
