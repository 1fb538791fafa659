from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from pyrope_spark.operators.canary import canary_p99_evaluation


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m, tzinfo=timezone.utc)


def _log(spark, spec):
    """spec: list of (hour, arm, latencies). One row per latency."""
    rows = []
    for h, arm, lats in spec:
        for i, v in enumerate(lats):
            rows.append((_ts(h, i % 60), arm, float(v)))
    return spark.createDataFrame(rows, "ts timestamp, arm string, latency_ms double")


def test_canary_degradation_streak_and_rollback(spark):
    """model_manager.py:160-196 semantics in batch form: min-sample guard,
    1.2x ratio, 3-window streak -> rollback, reset on a healthy window."""
    base_ok = [10.0] * 12  # p99 = 10 -> threshold 12
    spec = [
        (0, "baseline", base_ok), (0, "canary", [11.0, 11.5]),   # healthy
        (1, "baseline", base_ok), (1, "canary", [13.0]),         # degraded 1
        (2, "baseline", base_ok), (2, "canary", [20.0]),         # degraded 2
        (3, "baseline", base_ok), (3, "canary", [15.0]),         # degraded 3 -> rollback
        (4, "baseline", base_ok), (4, "canary", [11.0]),         # healthy: reset
        (5, "baseline", [10.0] * 5), (5, "canary", [99.0]),      # guard: baseline_n < 10
        (6, "baseline", base_ok),                                # no canary traffic
    ]
    out = {
        r["win"]: r
        for r in canary_p99_evaluation(_log(spark, spec), window_secs=3600).collect()
    }
    w = sorted(out)
    assert [out[k]["degraded"] for k in w] == [False, True, True, True, False, False, False]
    assert [out[k]["streak"] for k in w] == [0, 1, 2, 3, 0, 0, 0]
    assert [out[k]["rollback"] for k in w] == [False, False, False, True, False, False, False]
    # the guard window and the no-traffic window carry their evidence
    assert out[w[5]]["baseline_n"] == 5 and out[w[5]]["canary_n"] == 1
    assert out[w[6]]["canary_n"] == 0 and out[w[6]]["canary_p99"] is None


def test_canary_group_cols_independent_streaks(spark):
    """group_cols evaluates independent canaries: a streak in one group must
    not leak into the other."""
    bad = [(h, "baseline", [10.0] * 12) for h in range(3)] + [
        (h, "canary", [30.0]) for h in range(3)
    ]
    good = [(h, "baseline", [10.0] * 12) for h in range(3)] + [
        (h, "canary", [10.5]) for h in range(3)
    ]
    df_bad = _log(spark, bad).withColumn("pair", F.lit("m1"))
    df_good = _log(spark, good).withColumn("pair", F.lit("m2"))
    out = canary_p99_evaluation(
        df_bad.unionByName(df_good), window_secs=3600, group_cols=("pair",)
    ).collect()
    by = {(r["pair"], r["win"]): r for r in out}
    m1 = [by[k] for k in sorted(k for k in by if k[0] == "m1")]
    m2 = [by[k] for k in sorted(k for k in by if k[0] == "m2")]
    assert [r["streak"] for r in m1] == [1, 2, 3]
    assert m1[-1]["rollback"] is True
    assert all(r["streak"] == 0 for r in m2)
