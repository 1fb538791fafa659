"""Multi-touch marketing attribution over an event log.

For every conversion event, the user's touch events inside a lookback
window (strictly before the conversion) split the conversion's value
across channels under three standard credit models:

- ``first``  — all credit to the earliest touch in the window;
- ``last``   — all credit to the latest touch before the conversion;
- ``linear`` — equal credit to every touch (integer truncating split:
  each touch gets ``value_micro div n``; the sub-micro remainder
  ``value_micro - n * (value_micro div n)`` is deliberately dropped, the
  same truncation both engines perform — documented, deterministic).

Conversions with NO touch in the window surface as the ``(none)``
channel carrying full credit under every model, so credit is never
silently lost (``sum(first_micro)`` over the output equals
``sum(value_micro)`` over all conversions; same for ``last``).

Determinism rules (repo-wide): conversion value enters as
``floor(value * 1e6)`` micro-units via one IEEE multiply+floor on both
engines; first/last touches are picked by the (ts_ns, event_id) total
order (struct min/max — no ties possible); all credit arithmetic is
BIGINT adds and one truncating ``div`` with positive operands.

Scale shape: the touch-to-conversion association is an equi-join on
``user_id`` with a range predicate — both sides shuffle once on the
user key, per-user fanout is bounded by per-user activity in the
window (journeys are short; a pathological power-user can be banded by
day the way ``interval_join`` documents). Everything after is two
keyed aggregations on conversion ids, then a channel-level rollup of
|channels| rows. No collect, no UDFs, whole-stage codegen end to end —
the shape survives a 100 TB event log.

No reference analog (the reference engine has no attribution op); this
extends the events-analytics suite (funnel, retention, growth
accounting) per the training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def attribution_credit(
    events: DataFrame,
    *,
    touch_types: tuple[str, ...] = ("view", "click"),
    convert_type: str = "purchase",
    lookback_s: int = 7 * 86_400,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_ns_col: str = "ts_ns",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-channel credit table:
    (channel, n_touches, n_first, n_last, first_micro, last_micro,
    linear_micro), channels = touch_types plus ``(none)``.
    """
    conv = events.filter(F.col(type_col) == convert_type).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("_cid"),
        F.col(ts_ns_col).alias("_cts"),
        F.expr(f"CAST(floor({value_col} * 1e6) AS BIGINT)").alias("_v"),
    )
    touch = events.filter(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("_tid"),
        F.col(ts_ns_col).alias("_tts"),
        F.col(type_col).alias("channel"),
    )
    look_ns = F.lit(int(lookback_s) * 1_000_000_000)
    j = conv.join(
        touch,
        on=[
            conv["_u"] == touch["_u"],
            touch["_tts"] < conv["_cts"],
            touch["_tts"] >= conv["_cts"] - look_ns,
        ],
    ).select(conv["_cid"], conv["_v"], "_tts", "_tid", "channel")

    # per (conversion, channel): touch count + channel-local first/last key
    per_ch = j.groupBy("_cid", "_v", "channel").agg(
        F.count(F.lit(1)).cast("long").alias("_c"),
        F.min(F.struct("_tts", "_tid")).alias("_mn"),
        F.max(F.struct("_tts", "_tid")).alias("_mx"),
    )
    w = Window.partitionBy("_cid")
    flagged = (
        per_ch.withColumn("_n", F.sum("_c").over(w))
        .withColumn("_gmn", F.min("_mn").over(w))
        .withColumn("_gmx", F.max("_mx").over(w))
        .select(
            "channel",
            "_c",
            (F.col("_mn") == F.col("_gmn")).cast("long").alias("_is_first"),
            (F.col("_mx") == F.col("_gmx")).cast("long").alias("_is_last"),
            "_v",
            "_n",
        )
    )
    attributed = flagged.groupBy("channel").agg(
        F.sum("_c").cast("long").alias("n_touches"),
        F.sum("_is_first").cast("long").alias("n_first"),
        F.sum("_is_last").cast("long").alias("n_last"),
        F.sum(F.col("_is_first") * F.col("_v")).cast("long").alias("first_micro"),
        F.sum(F.col("_is_last") * F.col("_v")).cast("long").alias("last_micro"),
        F.sum(F.expr("_c * (_v div _n)")).cast("long").alias("linear_micro"),
    )

    none = (
        conv.join(j.select("_cid").distinct(), "_cid", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_first"),
            F.coalesce(F.sum("_v"), F.lit(0)).cast("long").alias("first_micro"),
        )
        .select(
            F.lit("(none)").alias("channel"),
            F.lit(0).cast("long").alias("n_touches"),
            "n_first",
            F.col("n_first").alias("n_last"),
            "first_micro",
            F.col("first_micro").alias("last_micro"),
            F.col("first_micro").alias("linear_micro"),
        )
        .filter(F.col("n_first") > 0)
    )
    return attributed.unionByName(none)


def attribution_oracle_sql(
    *,
    touch_types: tuple[str, ...] = ("view", "click"),
    convert_type: str = "purchase",
    lookback_s: int = 7 * 86_400,
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`attribution_credit` — identical op sequence
    (micro floor, (ts, id) struct order via tuple min/max, truncating
    linear split)."""
    tt = ", ".join(f"'{t}'" for t in touch_types)
    look_ns = int(lookback_s) * 1_000_000_000
    return f"""
WITH conv AS (
  SELECT user_id AS u, event_id AS cid, epoch_ns(ts) AS cts,
         CAST(floor(value * 1e6) AS BIGINT) AS v
  FROM {table} WHERE event_type = '{convert_type}'
), touch AS (
  SELECT user_id AS u, event_id AS tid, epoch_ns(ts) AS tts,
         event_type AS channel
  FROM {table} WHERE event_type IN ({tt})
), j AS (
  SELECT c.cid, c.v, t.tts, t.tid, t.channel
  FROM conv c JOIN touch t
    ON c.u = t.u AND t.tts < c.cts AND t.tts >= c.cts - {look_ns}
), per_ch AS (
  SELECT cid, v, channel, CAST(count(*) AS BIGINT) AS c,
         min(ROW(tts, tid)) AS mn, max(ROW(tts, tid)) AS mx
  FROM j GROUP BY 1, 2, 3
), flagged AS (
  SELECT channel, c,
         CASE WHEN mn = min(mn) OVER (PARTITION BY cid) THEN 1 ELSE 0 END
           AS is_first,
         CASE WHEN mx = max(mx) OVER (PARTITION BY cid) THEN 1 ELSE 0 END
           AS is_last,
         v, SUM(c) OVER (PARTITION BY cid) AS n
  FROM per_ch
), attributed AS (
  SELECT channel, CAST(SUM(c) AS BIGINT) AS n_touches,
         CAST(SUM(is_first) AS BIGINT) AS n_first,
         CAST(SUM(is_last) AS BIGINT) AS n_last,
         CAST(SUM(is_first * v) AS BIGINT) AS first_micro,
         CAST(SUM(is_last * v) AS BIGINT) AS last_micro,
         CAST(SUM(c * (v // n)) AS BIGINT) AS linear_micro
  FROM flagged GROUP BY 1
), none_side AS (
  SELECT '(none)' AS channel, CAST(0 AS BIGINT) AS n_touches,
         CAST(count(*) AS BIGINT) AS n_first,
         CAST(count(*) AS BIGINT) AS n_last,
         CAST(COALESCE(SUM(v), 0) AS BIGINT) AS first_micro,
         CAST(COALESCE(SUM(v), 0) AS BIGINT) AS last_micro,
         CAST(COALESCE(SUM(v), 0) AS BIGINT) AS linear_micro
  FROM conv WHERE cid NOT IN (SELECT DISTINCT cid FROM j)
)
SELECT * FROM attributed
UNION ALL
SELECT * FROM none_side WHERE n_first > 0
"""
