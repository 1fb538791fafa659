"""Canary model evaluation: windowed p99 baseline-vs-canary comparison.

The reference's ``ModelManager`` auto-rolls back a canary model when its
latency degrades vs baseline traffic
(``src/Pyrope.AISidecar/model_manager.py:22-25`` config,
``record_latency_p99`` :160-196): baseline p99 samples accumulate from
non-canary traffic (rolling window of 100), and once at least
``canary_min_baseline_samples`` (10) exist, a canary sample above
``mean(baseline) * canary_p99_degradation_ratio`` (1.2x) extends a
degradation streak; ``canary_auto_rollback_streak`` (3) consecutive
degradations trigger rollback.

The rollout machinery is serving-layer; the comparison itself is a
legitimate batch operator — this module is that operator over a metrics /
request-log table. Batch translation (documented deviations from the
serving loop's online shape):

- tumbling time windows replace the rolling sample deque (a batch job sees
  the whole log; the window is the unit of comparison);
- both arms are summarized by nearest-rank p99 per window (the log carries
  raw latencies; the serving loop received pre-aggregated p99 gauges, so
  its "mean of baseline samples" is a mean of p99s — here the baseline
  window p99 plays that role);
- the degradation streak is consecutive DEGRADED WINDOWS, evaluated with
  one analytic pass (gaps-and-islands), not a mutable counter.

Scale shape: one hash shuffle on (group, window) for the per-arm p99s, then
one tiny analytic pass over window summaries (output is one row per window
per group — control-plane sized however big the input log is).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: model_manager.py:22-25 defaults
DEGRADATION_RATIO = 1.2
MIN_BASELINE_SAMPLES = 10
ROLLBACK_STREAK = 3


def canary_p99_evaluation(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    latency_col: str = "latency_ms",
    canary_expr: F.Column | None = None,
    arm_col: str = "arm",
    canary_value: str = "canary",
    window_secs: int = 3600,
    degradation_ratio: float = DEGRADATION_RATIO,
    min_baseline_samples: int = MIN_BASELINE_SAMPLES,
    rollback_streak: int = ROLLBACK_STREAK,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-window canary health: (win, baseline_n, canary_n, baseline_p99,
    canary_p99, degraded, streak, rollback).

    ``canary_expr`` marks canary-arm rows (defaults to
    ``col(arm_col) == canary_value``). A window is ``degraded`` iff the
    baseline window carries at least ``min_baseline_samples`` rows (the
    min-sample guard, model_manager.py:171-172), the canary arm has
    traffic, and ``canary_p99 > baseline_p99 * degradation_ratio``
    (:174-177). ``streak`` counts consecutive degraded windows ending at
    this one (missing windows break the run by construction — no traffic,
    no evidence); ``rollback`` fires at ``rollback_streak`` (:179-188).

    ``group_cols`` evaluates independent canaries (per tenant cohort, per
    model pair) in one pass."""
    if canary_expr is None:
        canary_expr = F.col(arm_col) == canary_value
    g = [F.col(c) for c in group_cols]
    win = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / window_secs) * window_secs
    ).cast("long")
    # nearest-rank p99 per (group, win, arm) via the shared rank analytic —
    # same single-shuffle shape as system_metrics_windows
    keys = [*group_cols, "win", "_canary"]
    w = Window.partitionBy(*keys).orderBy(latency_col)
    wn = Window.partitionBy(*keys)
    r = (
        events.withColumn("win", win)
        .withColumn("_canary", canary_expr.cast("boolean"))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
    )
    p99_at = F.ceil(0.99 * F.col("_n")).cast("long")
    arm = r.groupBy(*group_cols, "win", "_canary").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.when(F.col("_rn") == p99_at, F.col(latency_col))).alias("p99"),
    )
    summary = arm.groupBy(*group_cols, "win").agg(
        F.sum(F.when(~F.col("_canary"), F.col("n"))).cast("long").alias("_bn"),
        F.sum(F.when(F.col("_canary"), F.col("n"))).cast("long").alias("_cn"),
        F.max(F.when(~F.col("_canary"), F.col("p99"))).alias("baseline_p99"),
        F.max(F.when(F.col("_canary"), F.col("p99"))).alias("canary_p99"),
    ).select(
        *group_cols,
        "win",
        F.coalesce("_bn", F.lit(0)).alias("baseline_n"),
        F.coalesce("_cn", F.lit(0)).alias("canary_n"),
        "baseline_p99",
        "canary_p99",
    )
    degraded = (
        (F.col("baseline_n") >= min_baseline_samples)
        & (F.col("canary_n") > 0)
        & (F.col("canary_p99") > F.col("baseline_p99") * degradation_ratio)
    )
    wo = Window.partitionBy(*g).orderBy("win") if g else Window.orderBy("win")
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        summary.withColumn("degraded", degraded)
        .withColumn("_rn", F.row_number().over(wo))
        .withColumn(
            "_last_ok",
            F.max(F.when(~F.col("degraded"), F.col("_rn"))).over(run),
        )
        .withColumn(
            "streak",
            F.when(
                F.col("degraded"),
                F.col("_rn") - F.coalesce(F.col("_last_ok"), F.lit(0)),
            ).otherwise(F.lit(0)).cast("long"),
        )
        .withColumn("rollback", F.col("streak") >= rollback_streak)
    )
    return out.drop("_rn", "_last_ok")
