"""Temporal operators over event streams: sessionization and as-of joins.

Not present in the reference (its only temporal logic is the 1 s QPS window
and 60 s write-heat window, SURVEY §2.7) but core to the batch analytics a
query/usage log pipeline needs, and standard OLAP surface for this engine.

Scale notes:
- ``sessionize`` is one shuffle on the session key; the gap-cumsum pattern
  keeps everything inside window functions (no self-join).
- ``as_of_join`` uses the union + last-carried-forward window — the shuffle
  is a single hash partition by key + sort by time, which beats the naive
  range join (O(n*m) per key) and needs no bucketing pass. Spark has no
  native ASOF; this is the scalable formulation (the pandas
  ``merge_asof``-per-group alternative needs the whole key group in memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    order_cols: list[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per user: a new session starts when the
    time since the previous event exceeds ``gap_s``. session_id is 0-based
    per user (cumsum of gap breaks)."""
    order = order_cols or [ts_col]
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in order])
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # full-precision epoch seconds (timestamp->double keeps microseconds;
    # matches DuckDB epoch()) — whole-second truncation would mis-bucket
    # events near gap boundaries
    gap = F.col(ts_col).cast("double") - prev_ts.cast("double")
    new_session = (prev_ts.isNull() | (gap > gap_s)).cast("long")
    return events.withColumn(
        session_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    key_cols: list[str],
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_s: int = 3600,
    closed: str = "both",
) -> DataFrame:
    """Join point events to the intervals containing them (same key), the
    scalable way: Spark plans a raw ``l.ts BETWEEN r.start AND r.end``
    predicate join as per-key nested loops (O(points x intervals) per key),
    so both sides are first mapped onto coarse time buckets of ``bucket_s``
    seconds — intervals explode into every bucket they overlap, points into
    exactly one — turning the range join into an equi-join on
    ``(key, bucket)`` plus a residual range filter. Each qualifying
    (point, interval) pair meets in exactly one bucket (the point's), so no
    dedup pass is needed.

    The shuffle carries points + sum(interval spans)/bucket_s rows; pick
    ``bucket_s`` near the typical interval length so intervals explode into
    O(1) buckets. Long stragglers fan out linearly (documented trade — cap
    them upstream or raise ``bucket_s``).

    ``closed``: 'both' (default) keeps start <= ts <= end; 'left' start <=
    ts < end; 'right' start < ts <= end.
    """
    if closed not in ("both", "left", "right"):
        raise ValueError(f"closed must be both|left|right, got {closed!r}")
    b = float(bucket_s)
    ivals = intervals.filter(F.col(end_col) >= F.col(start_col)).withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("double") / b).cast("long"),
                F.floor(F.col(end_col).cast("double") / b).cast("long"),
            )
        ),
    )
    pts = points.withColumn(
        "_bkt", F.floor(F.col(point_ts).cast("double") / b).cast("long")
    )
    lo = (
        F.col(point_ts) >= F.col(start_col)
        if closed in ("both", "left")
        else F.col(point_ts) > F.col(start_col)
    )
    hi = (
        F.col(point_ts) <= F.col(end_col)
        if closed in ("both", "right")
        else F.col(point_ts) < F.col(end_col)
    )
    return pts.join(ivals, [*key_cols, "_bkt"]).filter(lo & hi).drop("_bkt")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with the same key and
    right_ts <= left_ts (< if ``strict``). NULLs where no prior right row.

    Implementation: tag and union both sides, one window per key ordered by
    (time, right-first), carry the last right values forward, keep left rows.
    """
    rvals = right_value_cols or [
        c for c in right.columns if c not in key_cols and c != right_ts
    ]
    lt = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = right.withColumn("_t", F.col(right_ts)).withColumn("_side", F.lit(0))
    for c in rvals:
        lt = lt.withColumn(f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
        rt = rt.withColumn(f"_r_{c}", F.col(c))
    lcols = [c for c in left.columns]
    l_union = lt.select(*key_cols, "_t", "_side", *[f"_r_{c}" for c in rvals],
                        *[F.col(c).alias(f"_l_{c}") for c in lcols if c not in key_cols])
    r_union = rt.select(*key_cols, "_t", "_side", *[f"_r_{c}" for c in rvals],
                        *[F.lit(None).cast(dict(lt.dtypes)[c]).alias(f"_l_{c}")
                          for c in lcols if c not in key_cols])
    u = l_union.unionByName(r_union)
    # right rows sort before left rows at equal time unless strict,
    # so an exact-timestamp right row is visible to the left row (<=);
    # strict flips the order so it is not (<).
    side_order = F.asc("_side") if not strict else F.desc("_side")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_t").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in rvals:
        u = u.withColumn(f"_r_{c}", F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1)
    sel = list(key_cols)
    for c in lcols:
        if c not in key_cols:
            sel.append(F.col(f"_l_{c}").alias(c))
    for c in rvals:
        sel.append(F.col(f"_r_{c}").alias(f"right_{c}"))
    return out.select(*sel)
