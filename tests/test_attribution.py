"""Multi-touch attribution (operators/attribution.py) — hand-traced
credit splits, window edges, and credit conservation."""

from __future__ import annotations

from pyrope_spark.operators.attribution import attribution_credit

SCHEMA = "user_id long, event_id long, ts_ns long, event_type string, value double"
S = 1_000_000_000  # ns per second


def _run(spark, rows, **kw):
    ev = spark.createDataFrame(rows, SCHEMA)
    out = attribution_credit(ev, **kw)
    return {r["channel"]: r for r in out.collect()}


def test_three_touch_journey_splits(spark):
    # view@1s, click@2s, view@3s -> purchase@10s of 10.0
    rows = [
        (1, 101, 1 * S, "view", 0.0),
        (1, 102, 2 * S, "click", 0.0),
        (1, 103, 3 * S, "view", 0.0),
        (1, 104, 10 * S, "purchase", 10.0),
    ]
    by = _run(spark, rows)
    assert set(by) == {"view", "click"}
    v, c = by["view"], by["click"]
    assert (v["n_touches"], c["n_touches"]) == (2, 1)
    assert v["first_micro"] == 10_000_000 and c["first_micro"] == 0
    assert v["last_micro"] == 10_000_000 and c["last_micro"] == 0
    # linear: 10e6 div 3 = 3_333_333 per touch (truncating)
    assert v["linear_micro"] == 6_666_666
    assert c["linear_micro"] == 3_333_333


def test_direct_conversion_goes_to_none(spark):
    rows = [
        (2, 201, 50 * S, "purchase", 4.5),
        # touch AFTER the purchase never counts
        (2, 202, 60 * S, "click", 0.0),
    ]
    by = _run(spark, rows)
    assert set(by) == {"(none)"}
    n = by["(none)"]
    assert n["n_first"] == 1 and n["n_touches"] == 0
    assert n["first_micro"] == n["last_micro"] == n["linear_micro"] == 4_500_000


def test_window_edges_strict_before_inclusive_start(spark):
    look = 100
    rows = [
        (3, 301, 0 * S, "view", 0.0),        # exactly lookback ago: IN
        (3, 302, 100 * S, "click", 0.0),     # same instant as conv: OUT
        (3, 303, 100 * S, "purchase", 2.0),
    ]
    by = _run(spark, rows, lookback_s=look)
    assert set(by) == {"view"}
    assert by["view"]["first_micro"] == 2_000_000
    assert by["view"]["n_touches"] == 1


def test_credit_conservation_multi_user(spark):
    rows = [
        (1, 1, 1 * S, "view", 0.0),
        (1, 2, 2 * S, "click", 0.0),
        (1, 3, 5 * S, "purchase", 7.0),
        (2, 4, 1 * S, "click", 0.0),
        (2, 5, 9 * S, "purchase", 3.0),
        (4, 6, 9 * S, "purchase", 1.0),  # direct
    ]
    by = _run(spark, rows)
    total = 11_000_000
    assert sum(r["first_micro"] for r in by.values()) == total
    assert sum(r["last_micro"] for r in by.values()) == total
    # linear loses only sub-micro truncation: 7e6 div 2 = 3.5e6 (exact here)
    assert sum(r["linear_micro"] for r in by.values()) == total


def test_first_last_tiebreak_on_event_id(spark):
    # two touches at the SAME ts: (ts, event_id) order picks lower id first
    rows = [
        (5, 501, 1 * S, "view", 0.0),
        (5, 502, 1 * S, "click", 0.0),
        (5, 503, 2 * S, "purchase", 1.0),
    ]
    by = _run(spark, rows)
    assert by["view"]["first_micro"] == 1_000_000   # id 501 < 502
    assert by["click"]["last_micro"] == 1_000_000   # id 502 is the max key
