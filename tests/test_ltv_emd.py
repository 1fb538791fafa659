"""Closed-form tests for the cohort LTV curve and EMD value drift
(round-6 session-5 wave 5)."""

from __future__ import annotations

from datetime import datetime

from pyrope_spark.operators.analytics import cohort_ltv_curve
from pyrope_spark.operators.profile import emd_value_drift

WEEK = 604_800


def test_cohort_ltv_hand_traced(spark):
    # epoch week w0: users a (10.0) and b (20.0) first seen;
    # week w0+1: a spends 5.0 again, new user c spends 1.0
    base = datetime(2024, 1, 8)  # some Monday; exact week index irrelevant
    rows = [
        ("a", base, 10.0),
        ("b", base, 20.0),
        ("a", datetime(2024, 1, 16), 5.0),
        ("c", datetime(2024, 1, 16), 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id STRING, ts TIMESTAMP, value DOUBLE")
    out = cohort_ltv_curve(df).collect()
    w0 = min(r.cohort_week for r in out)
    by = {(r.cohort_week - w0, r.age_weeks): r for r in out}
    c0a0 = by[(0, 0)]
    assert c0a0.week_revenue_micro == 30_000_000
    assert c0a0.cum_revenue_micro == 30_000_000
    assert c0a0.cohort_users == 2
    assert c0a0.ltv_per_user_micro == 15_000_000
    c0a1 = by[(0, 1)]
    assert c0a1.week_revenue_micro == 5_000_000
    assert c0a1.cum_revenue_micro == 35_000_000
    assert c0a1.ltv_per_user_micro == 17_500_000
    c1a0 = by[(1, 0)]
    assert c1a0.cohort_users == 1 and c1a0.cum_revenue_micro == 1_000_000


def test_cohort_ltv_cumulative_monotone(spark):
    rows = [
        (f"u{i}", datetime(2024, 1, 1 + (i % 4) * 7 + (i % 3)), float(i % 9))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "user_id STRING, ts TIMESTAMP, value DOUBLE")
    out = cohort_ltv_curve(df).collect()
    series: dict[int, list] = {}
    for r in out:
        series.setdefault(r.cohort_week, []).append((r.age_weeks, r.cum_revenue_micro))
    for vals in series.values():
        vals.sort()
        cums = [c for _, c in vals]
        assert cums == sorted(cums)


def _drift_df(spark, a_vals, b_vals):
    rows = [("k", 0, float(v)) for v in a_vals] + [
        ("k", 1, float(v)) for v in b_vals
    ]
    return spark.createDataFrame(rows, "event_type STRING, half INT, value DOUBLE")


def test_emd_identical_halves_zero(spark):
    df = _drift_df(spark, [5, 15, 25, 25], [5, 15, 25, 25])
    r = emd_value_drift(
        df, key_col="event_type", value_col="value", split_col="half",
        bucket_width=10,
    ).collect()[0]
    assert r.emd_cross == 0 and r.emd_ppm == 0


def test_emd_shift_distance_scales(spark):
    # half A all in bucket 0, half B all in bucket 2: every bucket step
    # pays |cum diff| = n_a*n_b -> emd_cross = 2 * 4 * 4 = 32 over 3 buckets
    near = emd_value_drift(
        _drift_df(spark, [1, 2, 3, 4], [11, 12, 13, 14]),
        key_col="event_type", value_col="value", split_col="half",
        bucket_width=10,
    ).collect()[0]
    far = emd_value_drift(
        _drift_df(spark, [1, 2, 3, 4], [21, 22, 23, 24]),
        key_col="event_type", value_col="value", split_col="half",
        bucket_width=10,
    ).collect()[0]
    assert far.emd_cross == 32 and near.emd_cross == 16
    # chi-square would score both shifts identically; EMD must not
    assert far.emd_cross > near.emd_cross
    assert far.n_buckets == 3 and near.n_buckets == 2


def test_emd_gap_buckets_still_pay(spark):
    # empty middle buckets keep contributing the constant CDF gap
    r = emd_value_drift(
        _drift_df(spark, [5], [95]),
        key_col="event_type", value_col="value", split_col="half",
        bucket_width=10,
    ).collect()[0]
    # buckets 0..9 dense: cum diff |1*1 - 0*1| = 1 for buckets 0..8
    assert r.n_buckets == 10
    assert r.emd_cross == 9
