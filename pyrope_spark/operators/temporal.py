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


def gapfill(
    events: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_s: int = 3600,
    agg: str = "avg",
    observation_round: int | None = None,
) -> DataFrame:
    """Dense time-bucket aggregation with gap filling — the hypertable
    ``time_bucket_gapfill`` + ``locf`` / ``interpolate`` recipe (TimescaleDB
    semantics) as a batch operator.

    Per key: bucket events into ``bucket_s``-second epoch buckets, aggregate
    ``value_col`` with ``agg`` (avg|sum|min|max|count), then densify the
    bucket axis from each key's first to last bucket and fill the gaps two
    ways at once:

    - ``v_locf``  — last observation carried forward (NULL before the first
      observation);
    - ``v_lerp`` — linear interpolation between the surrounding
      observations (NULL outside them).

    Output: (*key_cols, bucket_ts_s BIGINT epoch seconds, v_raw, v_locf,
    v_lerp, is_gap). Epoch-second buckets (not timestamps) keep the output
    timezone-free — the cross-engine timestamp pitfall documented in
    catalog.py.

    Scale shape: bucket agg is one (key, bucket) hash shuffle with map-side
    partials; the spine is generated distributed (per-key sequence explode —
    rows = time-span/bucket_s per key, no driver range); fills are window
    functions over one (key) sort. A key whose span/bucket_s is huge
    produces a proportionally huge spine — that is the semantics of
    densification; bound it by bucketing coarser, not by sampling.

    ``observation_round``: round the aggregated observation to this many
    decimals BEFORE computing the fills. Float aggregation is not
    associative, so two engines (or two partitionings) can disagree on the
    last ulp of ``avg``; interpolating from unrounded endpoints amplifies
    that ulp across every gap row (measured: 101 of 1M rows flipped a
    6-decimal rounding boundary vs the DuckDB oracle at sf0.1). In this mode
    the interpolation itself runs in exact integer micro-units
    (value * 10^r as BIGINT, half-away-from-zero rational rounding) — from
    6-decimal endpoints and small-rational time fractions the interpolated
    value lands on an exact 7th-digit 5 so often that even bit-identical
    input doubles diverge under the engines' different round() tie paths
    (Spark shortest-repr HALF_UP vs DuckDB scale-multiply std::round; still
    101/1M mismatches after endpoint rounding alone). Integer math sidesteps
    float ties entirely. Leave None when layout-exact reproducibility is not
    needed.
    """
    aggs = {
        "avg": F.avg,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "count": lambda c: F.count(c).cast("double"),
    }
    if agg not in aggs:
        raise ValueError(f"agg must be one of {sorted(aggs)}, got {agg!r}")
    bucket = (
        F.floor(F.col(ts_col).cast("double") / bucket_s).cast("long") * bucket_s
    )
    per_bucket = (
        events.select(*key_cols, bucket.alias("bucket_ts_s"), F.col(value_col))
        .groupBy(*key_cols, "bucket_ts_s")
        .agg(aggs[agg](F.col(value_col)).alias("v_raw"))
    )
    if observation_round is not None:
        per_bucket = per_bucket.withColumn(
            "v_raw", F.round("v_raw", observation_round)
        )
    # Densify via a spine left-join. The lead()+explode union alternative
    # (gap rows generated from consecutive-observation pairs, no join) was
    # measured 3x SLOWER at 5M events / 7.2M dense rows (1.44 s vs 0.44 s
    # warm): it pays a full sort for lead() plus a re-sort of the union for
    # the fills, while here the (key, bucket) aggregation partitioning is
    # reused by the join and the spine side is tiny (bounds + sequence).
    spine = (
        per_bucket.groupBy(*key_cols)
        .agg(F.min("bucket_ts_s").alias("_mn"), F.max("bucket_ts_s").alias("_mx"))
        .select(
            *key_cols,
            F.explode(
                F.sequence(F.col("_mn"), F.col("_mx"), F.lit(bucket_s))
            ).alias("bucket_ts_s"),
        )
    )
    dense = spine.join(per_bucket, [*key_cols, "bucket_ts_s"], "left")
    w = Window.partitionBy(*key_cols).orderBy("bucket_ts_s")
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Forward fill as a REVERSE-ordered cumulative frame, not
    # [currentRow, unboundedFollowing]: Spark's
    # UnboundedFollowingWindowFunctionFrame recomputes the aggregate from
    # scratch for every row — O(rows²) per key partition (measured 12 s
    # of a 13 s total at 1M dense rows; the desc-cumulative form is the
    # O(n) UnboundedPreceding frame plus one extra in-partition sort and
    # runs the same stage in ~1 s).
    fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("bucket_ts_s").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_t = F.when(F.col("v_raw").isNotNull(), F.col("bucket_ts_s"))
    # Materialize the four fill inputs ONCE, then build lerp from the
    # materialized columns: referencing the raw window Columns inside the
    # lerp expression instantiates a separate window expression per
    # reference (measured: 28 _we slots in the Window operator vs 4).
    dense = dense.select(
        *key_cols,
        "bucket_ts_s",
        "v_raw",
        F.last("v_raw", ignorenulls=True).over(back).alias("_pv"),
        F.last(obs_t, ignorenulls=True).over(back).alias("_pt"),
        F.last("v_raw", ignorenulls=True).over(fwd).alias("_nv"),
        F.last(obs_t, ignorenulls=True).over(fwd).alias("_nt"),
    )
    prev_v, prev_t = F.col("_pv"), F.col("_pt")
    next_v, next_t = F.col("_nv"), F.col("_nt")
    if observation_round is not None:
        # Exact rational path: v_lerp = num/den in micro-units with
        # half-away-from-zero rounding, then one exact BIGINT / 10^r
        # division — identical IEEE result in any engine. Magnitude bound:
        # |num| <= max|v|*10^r * span_s; keep below 2^62 by bucketing
        # coarser or lowering observation_round for extreme spans.
        scale = 10 ** observation_round
        pv_i = F.round(prev_v * scale).cast("long")
        nv_i = F.round(next_v * scale).cast("long")
        den = next_t - prev_t
        num = pv_i * den + (nv_i - pv_i) * (F.col("bucket_ts_s") - prev_t)
        half_up = (2 * num + den).cast("long")
        half_dn = (-2 * num + den).cast("long")
        # floor-division on guaranteed-positive operands == truncation in
        # every engine; the negative branch mirrors to positive first.
        # The double division inside floor() is exact: operands stay under
        # 2^53, so quotient ties/integers are represented exactly.
        lerp_i = F.when(
            num >= 0, F.floor(half_up / (2 * den)).cast("long")
        ).otherwise(-F.floor(half_dn / (2 * den)).cast("long"))
        lerp = F.when(F.col("v_raw").isNotNull(), F.col("v_raw")).otherwise(
            F.when(
                prev_v.isNotNull() & next_v.isNotNull(),
                lerp_i.cast("double") / F.lit(float(scale)),
            )
        )
    else:
        lerp = F.when(F.col("v_raw").isNotNull(), F.col("v_raw")).otherwise(
            F.when(
                prev_v.isNotNull() & next_v.isNotNull(),
                prev_v
                + (next_v - prev_v)
                * (F.col("bucket_ts_s") - prev_t)
                / (next_t - prev_t),
            )
        )
    return dense.select(
        *key_cols,
        "bucket_ts_s",
        "v_raw",
        prev_v.alias("v_locf"),
        lerp.alias("v_lerp"),
        F.col("v_raw").isNull().alias("is_gap"),
    )


def gapfill_oracle_sql(
    *,
    table: str = "events",
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_s: int = 3600,
    round_to: int = 6,
) -> str:
    """DuckDB rendering of :func:`gapfill` (avg aggregation, single key),
    column-for-column, with the same epoch-second buckets and rounding."""
    return f"""
WITH pb AS (
  SELECT {key},
         CAST(floor(epoch({ts_col}) / {bucket_s}) AS BIGINT) * {bucket_s} AS bucket_ts_s,
         round(avg({value_col}), {round_to}) AS v_raw
  FROM {table}
  GROUP BY 1, 2
), bounds AS (
  SELECT {key}, min(bucket_ts_s) AS mn, max(bucket_ts_s) AS mx FROM pb GROUP BY 1
), spine AS (
  SELECT {key}, CAST(i AS BIGINT) AS bucket_ts_s
  FROM bounds, unnest(range(mn, mx + 1, {bucket_s})) AS u(i)
), dense AS (
  SELECT s.{key}, s.bucket_ts_s, pb.v_raw
  FROM spine s LEFT JOIN pb ON s.{key} = pb.{key} AND s.bucket_ts_s = pb.bucket_ts_s
), filled AS (
  SELECT {key}, bucket_ts_s, v_raw,
    last_value(v_raw IGNORE NULLS) OVER (
      PARTITION BY {key} ORDER BY bucket_ts_s
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    last_value(CASE WHEN v_raw IS NOT NULL THEN bucket_ts_s END IGNORE NULLS) OVER (
      PARTITION BY {key} ORDER BY bucket_ts_s
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
    first_value(v_raw IGNORE NULLS) OVER (
      PARTITION BY {key} ORDER BY bucket_ts_s
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    first_value(CASE WHEN v_raw IS NOT NULL THEN bucket_ts_s END IGNORE NULLS) OVER (
      PARTITION BY {key} ORDER BY bucket_ts_s
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
  FROM dense
), lint AS (
  -- exact integer micro-unit interpolation, mirroring gapfill()'s
  -- observation_round path: num/den rational, half-away-from-zero
  SELECT *,
         CAST(round(prev_v * {10 ** round_to}) AS BIGINT) AS pv_i,
         CAST(round(next_v * {10 ** round_to}) AS BIGINT) AS nv_i,
         next_t - prev_t AS den
  FROM filled
), num AS (
  SELECT *, pv_i * den + (nv_i - pv_i) * (bucket_ts_s - prev_t) AS num
  FROM lint
)
SELECT {key}, bucket_ts_s,
       round(v_raw, {round_to}) AS v_raw,
       round(prev_v, {round_to}) AS v_locf,
       CASE WHEN v_raw IS NOT NULL THEN round(v_raw, {round_to})
            WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
            THEN (CASE WHEN num >= 0
                       THEN CAST(floor((2 * num + den) / (2.0 * den)) AS BIGINT)
                       ELSE -CAST(floor((-2 * num + den) / (2.0 * den)) AS BIGINT)
                  END) / {float(10 ** round_to)}
       END AS v_lerp,
       (v_raw IS NULL) AS is_gap
FROM num
"""


def rolling_zscore(
    events: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_cols: list[str] | None = None,
    window_n: int = 24,
    min_obs: int = 5,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Rolling z-score anomaly detection: each point judged against the
    trailing ``window_n`` observations EXCLUDING itself (a spike must not
    inflate its own baseline). z is NULL while history is shorter than
    ``min_obs`` or the trailing std is ~0; ``is_anomaly`` = |z| > thresh.

    One key-hash shuffle + one sort; mean/std/count are three aggregates
    over the same row frame, one Window operator. The trailing frame is
    O(window_n) state per row — constant memory at any corpus size.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    frame = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(-window_n, -1)
    )
    mean = F.avg(value_col).over(frame)
    std = F.stddev_samp(value_col).over(frame)
    cnt = F.count(F.col(value_col)).over(frame)
    z = F.when(
        (cnt >= min_obs) & std.isNotNull() & (std > 1e-12),
        (F.col(value_col) - mean) / std,
    )
    return events.select(
        *key_cols,
        *[F.col(c) for c in (tiebreak_cols or [])],
        F.col(ts_col),
        F.col(value_col),
        # floor(z*1e6) BIGINT micro-units — one IEEE multiply then floor,
        # the identical op sequence DuckDB renders; engine round() tie
        # paths differ (Spark HALF_UP vs DuckDB std::round), so a rounded
        # double in a hash-compared column is a latent cross-engine red.
        F.floor(z * F.lit(1e6)).cast("long").alias("zscore_micro"),
        F.coalesce(F.abs(z) > z_thresh, F.lit(False)).alias("is_anomaly"),
    )


def rolling_zscore_oracle_sql(
    *,
    table: str = "events",
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
    window_n: int = 24,
    min_obs: int = 5,
    z_thresh: float = 3.0,
) -> str:
    """DuckDB rendering of :func:`rolling_zscore` (epoch-micro ts output)."""
    frame = (
        f"OVER (PARTITION BY {key} ORDER BY {ts_col}, {tiebreak} "
        f"ROWS BETWEEN {window_n} PRECEDING AND 1 PRECEDING)"
    )
    return f"""
WITH r AS (
  SELECT {key}, {tiebreak}, epoch_us({ts_col}) AS ts_us, {value_col},
         avg({value_col}) {frame} AS m,
         stddev_samp({value_col}) {frame} AS s,
         count({value_col}) {frame} AS c
  FROM {table}
), z AS (
  SELECT {key}, {tiebreak}, ts_us, {value_col},
         CASE WHEN c >= {min_obs} AND s IS NOT NULL AND s > 1e-12
              THEN ({value_col} - m) / s END AS zraw
  FROM r
)
SELECT {key}, {tiebreak}, ts_us, {value_col},
       CAST(floor(zraw * 1e6) AS BIGINT) AS zscore_micro,
       COALESCE(abs(zraw) > {z_thresh}, FALSE) AS is_anomaly
FROM z
"""


# ------------------------------------------------------ EWMA smoothing

def ewma(
    events: DataFrame,
    alpha: float,
    *,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    out_col: str = "ewma_micro",
    impl: str = "partitioned",
) -> DataFrame:
    """Per-key exponential smoothing: ``s_1 = x_1; s_t = alpha * x_t +
    (1 - alpha) * s_{t-1}`` over the (ts, id) total order — the baseline
    smoother/forecaster for metric streams (next-value forecast = current
    s_t), and the denominator for simple deviation alarms.

    A sequential recurrence has no native window form. Two shapes:

    - ``impl='partitioned'`` (default): repartition by key +
      sortWithinPartitions(key, ts, id), then ONE python pass per task
      carrying a {key: s} dict across its Arrow batches — state survives a
      key's rows splitting over batches because only the last double per
      key is carried, never rows. Measured 106 s -> seconds at 5M rows x
      1M keys, where per-key groups are invocation-bound (the maxsim
      'packed' lesson applied to recurrences).
    - ``impl='grouped'``: one ``applyInPandas`` group per key (fine for
      few, long series).

    Python floats ARE IEEE doubles, and the DuckDB oracle's recursive CTE
    evaluates literally the same ``alpha * x + (1 - alpha) * s`` per step,
    so the running state agrees bit-for-bit (same ops, same order; only +
    and * — no transcendental). The EMITTED value is the integer micro-unit
    ``floor(s * 1e6)`` (one IEEE multiply then floor — identical op
    sequence in python and DuckDB), NOT ``round(s, 6)``: python round is
    half-even on the exact decimal value while DuckDB round goes through a
    multiply-by-1e6 path, and the two disagree on half-ties/1-ulp cases
    (observed as a driver hash_match:false in round 5 — the same hazard the
    gapfill observation_round discipline exists for).

    Output: key cols + (id, value, out_col BIGINT micro-units).
    """
    import math
    from collections.abc import Iterator

    import pandas as pd

    keyc = list(key_cols)
    a = float(alpha)

    src = events.select(
        *keyc,
        F.col(id_col),
        F.col(value_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_ts_ns"),
    )
    schema = ", ".join(
        f"{c} {t}" for c, t in src.drop("_ts_ns").dtypes
    ) + f", {out_col} long"

    if impl == "grouped":
        def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["_ts_ns", id_col])
            s = None
            out = []
            for x in pdf[value_col].tolist():
                s = x if s is None else a * x + (1.0 - a) * s
                out.append(int(math.floor(s * 1e6)))
            pdf = pdf.copy()
            pdf[out_col] = out
            return pdf[keyc + [id_col, value_col, out_col]]

        return src.groupBy(*keyc).applyInPandas(smooth, schema=schema)
    if impl != "partitioned":
        raise ValueError(f"impl must be 'partitioned' or 'grouped', got {impl!r}")

    def smooth_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            keys = list(zip(*(pdf[c].tolist() for c in keyc)))
            xs = pdf[value_col].tolist()
            out = []
            for k, x in zip(keys, xs):
                s = state.get(k)
                s = x if s is None else a * x + (1.0 - a) * s
                state[k] = s
                out.append(int(math.floor(s * 1e6)))
            res = pdf.copy()
            res[out_col] = out
            yield res[keyc + [id_col, value_col, out_col]]

    ordered = src.repartition(*[F.col(c) for c in keyc]).sortWithinPartitions(
        *keyc, "_ts_ns", id_col
    )
    return ordered.mapInPandas(smooth_part, schema=schema)


def ewma_oracle_sql(
    alpha: float,
    *,
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> str:
    """Recursive-CTE rendering: one recursion level per within-key rank
    (depth = max series length per key; all keys advance together)."""
    a = repr(float(alpha))
    return f"""
WITH RECURSIVE ordered AS (
  SELECT {key_col}, {id_col}, {value_col},
         row_number() OVER (PARTITION BY {key_col}
                            ORDER BY {ts_col}, {id_col}) AS rn
  FROM {table}
), rec AS (
  SELECT {key_col}, {id_col}, {value_col}, rn,
         CAST({value_col} AS DOUBLE) AS s
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.{key_col}, o.{id_col}, o.{value_col}, o.rn,
         {a} * CAST(o.{value_col} AS DOUBLE) + (1.0 - {a}) * r.s
  FROM ordered o JOIN rec r
    ON o.{key_col} = r.{key_col} AND o.rn = r.rn + 1
)
SELECT {key_col}, CAST({id_col} AS BIGINT) AS {id_col},
       {value_col}, CAST(floor(s * 1e6) AS BIGINT) AS ewma_micro
FROM rec
"""


def holt(
    events: DataFrame,
    alpha: float,
    beta: float,
    *,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key Holt double exponential smoothing (level + linear trend) over
    the (ts, id) total order — the one-step-ahead forecaster for metrics
    with drift, where plain EWMA ([[ewma]]) systematically lags a trending
    series:

        l_1 = x_1;  b_1 = 0
        l_t = alpha * x_t + (1 - alpha) * (l_{t-1} + b_{t-1})
        b_t = beta * (l_t - l_{t-1}) + (1 - beta) * b_{t-1}

    Same execution shape as ``ewma impl='partitioned'``: repartition by key
    + sortWithinPartitions, then ONE python pass per task carrying a
    {key: (l, b)} dict across Arrow batches — linear, one shuffle,
    invocation-bound regardless of key count.

    Cross-engine determinism: python floats are IEEE doubles and the DuckDB
    recursive-CTE oracle evaluates literally the same +/* expression per
    step (the trend row recomputes l_t with the identical expression — IEEE
    ops are deterministic, so recomputation equals reuse). Emitted values
    are integer micro-units ``floor(v * 1e6)`` (the ewma/gapfill
    discipline), never engine round().

    Output: key cols + (id, value, level_micro, trend_micro,
    forecast_micro) where forecast is the next-step prediction l_t + b_t.
    """
    import math
    from collections.abc import Iterator

    import pandas as pd

    keyc = list(key_cols)
    a = float(alpha)
    bt = float(beta)

    src = events.select(
        *keyc,
        F.col(id_col),
        F.col(value_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_ts_us"),
    )
    schema = ", ".join(
        f"{c} {t}" for c, t in src.drop("_ts_us").dtypes
    ) + ", level_micro long, trend_micro long, forecast_micro long"

    def smooth_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            keys = list(zip(*(pdf[c].tolist() for c in keyc)))
            xs = pdf[value_col].tolist()
            lo, to, fo = [], [], []
            for k, x in zip(keys, xs):
                st = state.get(k)
                if st is None:
                    l, b = float(x), 0.0
                else:
                    l0, b0 = st
                    l = a * x + (1.0 - a) * (l0 + b0)
                    b = bt * (l - l0) + (1.0 - bt) * b0
                state[k] = (l, b)
                lo.append(int(math.floor(l * 1e6)))
                to.append(int(math.floor(b * 1e6)))
                fo.append(int(math.floor((l + b) * 1e6)))
            res = pdf.copy()
            res["level_micro"] = lo
            res["trend_micro"] = to
            res["forecast_micro"] = fo
            yield res[keyc + [id_col, value_col,
                             "level_micro", "trend_micro", "forecast_micro"]]

    ordered = src.repartition(*[F.col(c) for c in keyc]).sortWithinPartitions(
        *keyc, "_ts_us", id_col
    )
    return ordered.mapInPandas(smooth_part, schema=schema)


def holt_oracle_sql(
    alpha: float,
    beta: float,
    *,
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> str:
    """Recursive-CTE twin of [[holt]]: the b_t row recomputes l_t with the
    identical IEEE expression (deterministic, so recompute == reuse)."""
    a = repr(float(alpha))
    bt = repr(float(beta))
    lexpr = (
        f"{a} * CAST(o.{value_col} AS DOUBLE) + (1.0 - {a}) * (r.l + r.b)"
    )
    return f"""
WITH RECURSIVE ordered AS (
  SELECT {key_col}, {id_col}, {value_col},
         row_number() OVER (PARTITION BY {key_col}
                            ORDER BY {ts_col}, {id_col}) AS rn
  FROM {table}
), rec AS (
  SELECT {key_col}, {id_col}, {value_col}, rn,
         CAST({value_col} AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.{key_col}, o.{id_col}, o.{value_col}, o.rn,
         {lexpr},
         {bt} * (({lexpr}) - r.l) + (1.0 - {bt}) * r.b
  FROM ordered o JOIN rec r
    ON o.{key_col} = r.{key_col} AND o.rn = r.rn + 1
)
SELECT {key_col}, CAST({id_col} AS BIGINT) AS {id_col}, {value_col},
       CAST(floor(l * 1e6) AS BIGINT) AS level_micro,
       CAST(floor(b * 1e6) AS BIGINT) AS trend_micro,
       CAST(floor((l + b) * 1e6) AS BIGINT) AS forecast_micro
FROM rec
"""


# ------------------------------------------------------ concurrency curve

def concurrency_curve(
    intervals: DataFrame,
    *,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """How many intervals are active at every moment — the capacity-planning
    curve (peak concurrent sessions/leases/jobs) over any (start, end)
    interval table, half-open ``[start, end)``.

    Boundary events (+1 at start, -1 at end) collapse per distinct
    timestamp FIRST (so ordering among same-instant boundaries can never
    matter), then one running sum over the distinct-boundary table yields
    ``concurrent`` = active count during ``[ts, next_ts)``. All-integer —
    replicates exactly in SQL.

    Scale note: the running sum is a global prefix sum over the
    DISTINCT-boundary table (already collapsed — bounded by 2x intervals,
    typically far less). For calendar-scale inputs, bucket by day and seed
    each day's curve with the prior day's closing count — the standard
    prefix-sum partitioning; the one-window form here is the
    correctness-grade path.
    """
    from pyspark.sql.window import Window

    starts = intervals.select(F.col(start_col).alias("ts")).groupBy("ts").agg(
        F.count(F.lit(1)).alias("n_starts")
    )
    ends = intervals.select(F.col(end_col).alias("ts")).groupBy("ts").agg(
        F.count(F.lit(1)).alias("n_ends")
    )
    b = starts.join(ends, "ts", "full_outer").fillna(0, ["n_starts", "n_ends"])
    w = Window.orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    return b.select(
        "ts",
        F.col("n_starts").cast("long").alias("n_starts"),
        F.col("n_ends").cast("long").alias("n_ends"),
        F.sum(F.col("n_starts") - F.col("n_ends")).over(w).cast("long").alias(
            "concurrent"
        ),
    )


def counter_rate(
    events: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-sample rate of change of a (mostly) monotone counter — the
    PromQL ``rate()`` primitive as a batch operator: per key ordered by
    (ts, id), ``rate = delta_value / delta_seconds`` against the previous
    sample, with COUNTER RESETS handled the Prometheus way (a negative
    delta means the counter restarted; the increase since the reset is the
    current value). First sample per key and zero-gap duplicates emit NULL.

    One key-hash shuffle, one window pass (lag x2) — no self-join; the
    only float op is a single division, deterministic cross-engine.
    Output: key cols + (id, ts, value, rate rounded 6).
    """
    from pyspark.sql.window import Window

    keyc = list(key_cols)
    w = Window.partitionBy(*keyc).orderBy(F.col(ts_col), F.col(id_col))
    prev_v = F.lag(F.col(value_col)).over(w)
    prev_t = F.lag(F.col(ts_col).cast("double")).over(w)
    dt = F.col(ts_col).cast("double") - prev_t
    raw_delta = F.col(value_col) - prev_v
    inc = F.when(raw_delta < 0, F.col(value_col)).otherwise(raw_delta)
    rate = F.when(
        prev_v.isNull() | (dt <= 0), F.lit(None).cast("double")
    ).otherwise(inc / dt)
    return events.select(
        *keyc,
        F.col(id_col),
        F.col(ts_col),
        F.col(value_col),
        F.round(rate, 6).alias("rate"),
    )


def mad_anomalies(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    k: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Median-absolute-deviation outliers per key, fully deterministic.

    The robust twin of the rolling z-score (``rolling_zscore``): median and
    MAD shrug off the very outliers a mean/stddev gate lets poison its own
    threshold.  Both medians are NEAREST-RANK LOWER (row ``(n+1)//2`` of
    the (value, id) total order), not interpolated — interpolation halves
    are float-ulp hazards cross-engine, rank selection is exact.  Values
    enter as integer micro-units (``round(v*scale)``), so the flag
    ``|v - med| > k*MAD`` is a pure BIGINT compare.

    Scale shape (100 TB): two window passes partitioned by key (each one
    hash-shuffle of the fact table on the key) + two tiny per-key median
    tables joined back (aggregated side, orders of magnitude smaller —
    Spark broadcasts it under AQE when it fits).  No driver collect.
    MAD == 0 (constant-majority key) flags every deviating row, the
    standard MAD caveat — callers on near-constant streams should gate on
    ``mad > 0`` downstream.
    """
    mv = df.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("id"),
        F.round(F.col(value_col) * scale).cast("long").alias("v"),
    )
    w_rank = Window.partitionBy("k").orderBy("v", "id")
    w_all = Window.partitionBy("k")
    ranked = mv.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "n", F.count("*").over(w_all)
    )
    med = (
        ranked.filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select(F.col("k").alias("mk"), F.col("v").alias("med"))
    )
    dev = mv.join(med, F.col("k") == F.col("mk")).select(
        "k", "id", "v", "med", F.abs(F.col("v") - F.col("med")).alias("dev")
    )
    w_rank2 = Window.partitionBy("k").orderBy("dev", "id")
    ranked2 = dev.withColumn("rn", F.row_number().over(w_rank2)).withColumn(
        "n", F.count("*").over(Window.partitionBy("k"))
    )
    mad = (
        ranked2.filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select(F.col("k").alias("dk"), F.col("dev").alias("mad"))
    )
    return (
        dev.join(mad, F.col("k") == F.col("dk"))
        .filter(F.col("dev") > F.lit(k) * F.col("mad"))
        .select(
            F.col("k").alias(key_col),
            F.col("id").cast("long").alias(id_col),
            F.col("v").alias("value_micro"),
            F.col("med").alias("median_micro"),
            F.col("mad").alias("mad_micro"),
        )
    )


def seasonal_profile(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Day-of-week seasonal index per key — the seasonal-naive baseline.

    For each (key, dow): mean value in micro-units (floor div — exact),
    plus the key's overall mean and the seasonal index
    ``dow_mean * 1e6 div key_mean`` (1e6 = flat).  A Monday that indexes
    at 1.8e6 carries 80% more value than the key's average day; the
    forecasting/anomaly baseline is then "compare against your dow
    index", which needs no model and survives any scale.

    Scale shape (100 TB): ONE hash aggregate on (key, dow) — map-side
    partials — then a re-aggregate of that 7-rows-per-key table for the
    key means; everything after the first aggregate is tiny.  Sums fit
    int64 up to ~9e12 micro-unit value-sum per (key,dow) cell; beyond,
    switch the sums to DECIMAL(38,0).

    Assumes non-negative values (metering/usage series): the integer
    means use ``div``, which truncates in Spark but floors in DuckDB —
    identical only when numerators are non-negative (use the
    offset-shift from ``profile.cluster_quality_report`` for signed
    series).
    """
    base = df.select(
        F.col(key_col).alias("k"),
        # dayofweek is locale-pinned in Spark (1=Sunday); DuckDB's dow()
        # is 0=Sunday — oracle maps dow()+1
        F.dayofweek(F.col(ts_col)).cast("long").alias("dow"),
        F.round(F.col(value_col) * scale).cast("long").alias("v"),
    )
    per_dow = base.groupBy("k", "dow").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).cast("long").alias("n")
    )
    per_key = per_dow.groupBy(F.col("k").alias("kk")).agg(
        F.sum("s").alias("ks"), F.sum("n").alias("kn")
    )
    return (
        per_dow.join(per_key, F.col("k") == F.col("kk"))
        .select(
            F.col("k").alias(key_col),
            "dow",
            F.col("n").alias("n_obs"),
            F.expr("s DIV n").alias("dow_mean_micro"),
            F.expr("ks DIV kn").alias("key_mean_micro"),
            F.expr(f"(s DIV n) * {scale} DIV (ks DIV kn)").alias(
                "seasonal_index_micro"
            ),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    id_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Mean-shift change-point per key: the argmax of |CUSUM| — exact.

    Classic offline CUSUM: center the series on its per-key integer mean
    (times n to avoid the division entirely: the centered cumulative sum
    ``S_i = n*sum(v_1..v_i) - i*total`` is a pure BIGINT, and argmax of
    |S_i| is invariant to the n scaling), then report the position where
    |S| peaks — the most likely single mean-shift point — plus the peak
    magnitude normalized back to micro-units (one final div).  Ties on
    |S| break to the earliest (ts, id).

    The monitoring use: a feed whose mean jumped mid-window gets a
    change-point near the jump with a large magnitude; a stationary feed
    peaks at noise level — rank keys by magnitude, alarm the top.

    Scale shape (100 TB): one window cumsum per key (single hash
    shuffle + per-key sort) and a per-key argmax aggregate; no joins on
    fact-scale rows beyond the one shuffle.  n*sum stays in int64 up to
    ~3e9 micro-rows per key (n * total < 2^63).
    """
    mv = df.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("id"),
        F.col(ts_col).alias("ts"),
        F.round(F.col(value_col) * scale).cast("long").alias("v"),
    )
    w_all = Window.partitionBy("k")
    w_ord = (
        Window.partitionBy("k")
        .orderBy("ts", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = mv.withColumn("n", F.count("*").over(w_all)).withColumn(
        "total", F.sum("v").over(w_all)
    ).withColumn("csum", F.sum("v").over(w_ord)).withColumn(
        "i", F.count("*").over(w_ord)
    )
    scored = cum.withColumn(
        "s_abs",
        F.abs(F.col("n") * F.col("csum") - F.col("i") * F.col("total")),
    )
    pick = F.row_number().over(
        Window.partitionBy("k").orderBy(
            F.col("s_abs").desc(), F.col("ts").asc(), F.col("id").asc()
        )
    )
    return (
        scored.withColumn("_rk", pick)
        .filter(F.col("_rk") == 1)
        .select(
            F.col("k").alias(key_col),
            F.col("id").cast("long").alias(id_col),
            F.col("ts").alias(ts_col),
            F.col("i").cast("long").alias("position"),
            F.col("n").cast("long").alias("n_rows"),
            # peak |S|/n back in micro-units: max mean deviation x i
            F.expr("s_abs DIV n").alias("cusum_peak_micro"),
        )
    )


def time_weighted_avg(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_ns_col: str = "ts_ns",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-(key, epoch-day) time-weighted average value — the TWAP-style
    aggregate a plain mean misrepresents whenever observations arrive
    unevenly (a value holding for 20 h should dominate one that held for
    a minute).

    Each observation is weighted by how long it REMAINED CURRENT: the
    duration until the next observation in the same (key, day), the last
    one carrying to the day boundary. All arithmetic is integer —
    ``floor(value·1e6)`` micro values, truncating-div millisecond
    durations (positive, so truncate == floor cross-engine), one final
    ``div`` against NULLIF(total_dur, 0) on both engines (product bound:
    5e8 micro · 8.64e7 ms/day ≈ 4e16 per day-key, far under int64) —
    with the (ts_ns, event_id) total order pinning tie durations. The
    plain mean rides along so the report shows the sampling bias it
    corrects.

    One window pass + one aggregate, both keyed on (key, day): linear,
    shuffle-bounded, 100 TB-shaped.
    """
    day = F.expr(f"{ts_ns_col} div 86400000000000").alias("day_epoch")
    src = events.select(
        F.col(key_col).alias("_k"),
        day,
        F.col(ts_ns_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.expr(f"CAST(floor({value_col} * 1e6) AS BIGINT)").alias("_v"),
    )
    timed = src.withColumn(
        "_dur_ms",
        F.expr(
            "(coalesce(lead(_ts) OVER (PARTITION BY _k, day_epoch"
            " ORDER BY _ts, _id), (day_epoch + 1) * 86400000000000)"
            " - _ts) div 1000000"
        ),
    )
    return (
        timed.groupBy(F.col("_k").alias(key_col), "day_epoch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("_dur_ms").cast("long").alias("total_dur_ms"),
            F.expr("sum(_v * _dur_ms) div nullif(sum(_dur_ms), 0)").alias(
                "twap_micro"
            ),
            F.expr("sum(_v) div count(*)").alias("mean_micro"),
        )
    )


def time_weighted_avg_oracle_sql(
    *,
    key_col: str = "event_type",
    value_col: str = "value",
    table: str = "events",
    id_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`time_weighted_avg` — identical op sequence."""
    return f"""
WITH src AS (
  SELECT {key_col} AS k, epoch_ns(ts) // 86400000000000 AS day_epoch,
         epoch_ns(ts) AS tsn, {id_col} AS id,
         CAST(floor({value_col} * 1e6) AS BIGINT) AS v
  FROM {table}
), timed AS (
  SELECT *, (COALESCE(lead(tsn) OVER (PARTITION BY k, day_epoch
                                      ORDER BY tsn, id),
                      (day_epoch + 1) * 86400000000000) - tsn) // 1000000
            AS dur_ms
  FROM src
)
SELECT k AS {key_col}, CAST(day_epoch AS BIGINT) AS day_epoch,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(dur_ms) AS BIGINT) AS total_dur_ms,
       CAST(SUM(v * dur_ms) // NULLIF(SUM(dur_ms), 0) AS BIGINT)
         AS twap_micro,
       CAST(SUM(v) // count(*) AS BIGINT) AS mean_micro
FROM timed GROUP BY 1, 2
"""


def debounce_events(
    events: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_ns_col: str = "ts_ns",
    id_col: str = "event_id",
    gap_s: int = 300,
) -> DataFrame:
    """Burst debouncing: within each key, events closer than ``gap_s`` to
    their predecessor belong to the same burst; only the burst's FIRST
    event survives, annotated with how much it absorbed — the telemetry
    dedup pass that turns retry storms / double-clicks / sensor chatter
    into one representative row without losing the burst's size or span.

    Burst assignment is the sessionize gap rule (lag > gap starts a new
    burst) keyed by ``key_cols``; the survivor is the (ts_ns, id) minimum
    of its burst. Output: one row per burst — (key_cols..., event_id,
    ts_ns of the survivor, n_suppressed, burst_span_ms). All integer
    arithmetic; one keyed window pass + one keyed aggregate.
    """
    ks = [F.col(k) for k in key_cols]
    w = Window.partitionBy(*ks).orderBy(ts_ns_col, id_col)
    gap_ns = int(gap_s) * 1_000_000_000
    src = events.withColumn(
        "_brk",
        (
            F.lag(F.col(ts_ns_col)).over(w).isNull()
            | (F.col(ts_ns_col) - F.lag(F.col(ts_ns_col)).over(w) > gap_ns)
        ).cast("long"),
    ).withColumn(
        "burst_id",
        F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )
    return (
        src.groupBy(*ks, "burst_id")
        .agg(
            F.min(F.struct(ts_ns_col, id_col)).alias("_first"),
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.min(ts_ns_col).alias("_t0"),
            F.max(ts_ns_col).alias("_t1"),
        )
        .select(
            *key_cols,
            F.col("burst_id").cast("long").alias("burst_id"),
            F.col(f"_first.{id_col}").alias(id_col),
            F.col(f"_first.{ts_ns_col}").alias(ts_ns_col),
            (F.col("_n") - 1).cast("long").alias("n_suppressed"),
            F.expr("(_t1 - _t0) div 1000000").alias("burst_span_ms"),
        )
    )


def interval_union_coverage(
    intervals: DataFrame,
    *,
    key_col: str = "user_id",
    start_col: str = "start_s",
    end_col: str = "end_s",
) -> DataFrame:
    """Total covered length per key of the UNION of (possibly overlapping)
    intervals — "how long was this user actually active", where naively
    summing durations double-counts overlaps.

    The classic sweep, expressed as two key-partitioned windows: order
    intervals by (start, end), carry the running max end over PRECEDING
    rows; an interval whose start exceeds that max opens a new segment
    (flag cumsum = segment id); per (key, segment) the covered length is
    ``max(end) − min(start)``, summed per key.  All integer (callers
    supply epoch seconds), so the result replicates bit-for-bit.

    Output: (key, n_intervals, n_segments, covered_s, span_s) — span is
    last end − first start; covered < span exposes the idle gaps.

    Scale shape (100 TB): every window and aggregate partitions on the
    key; nothing global, no join at all.
    """
    from pyspark.sql.window import Window

    base = intervals.select(
        F.col(key_col).alias("k"),
        F.col(start_col).cast("long").alias("s"),
        F.col(end_col).cast("long").alias("e"),
    ).filter(F.col("e") >= F.col("s"))
    w_ord = Window.partitionBy("k").orderBy(F.col("s").asc(), F.col("e").asc())
    prev_max = F.max("e").over(w_ord.rowsBetween(Window.unboundedPreceding, -1))
    flagged = base.withColumn(
        "_new",
        F.when(
            prev_max.isNull() | (F.col("s") > prev_max), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_seg",
        F.sum("_new").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
    )
    segs = flagged.groupBy("k", "_seg").agg(
        F.min("s").alias("_ss"),
        F.max("e").alias("_se"),
        F.count("*").alias("_n"),
    )
    return (
        segs.groupBy("k")
        .agg(
            F.sum("_n").cast("long").alias("n_intervals"),
            F.count("*").cast("long").alias("n_segments"),
            F.sum(F.col("_se") - F.col("_ss")).cast("long").alias("covered_s"),
            (F.max("_se") - F.min("_ss")).cast("long").alias("span_s"),
        )
        .select(
            F.col("k").alias(key_col),
            "n_intervals",
            "n_segments",
            "covered_s",
            "span_s",
        )
    )


def interval_union_oracle_sql(
    intervals_sql: str,
    *,
    key_col: str = "user_id",
) -> str:
    """DuckDB twin of [[interval_union_coverage]] — ``intervals_sql``
    yields (k, s, e) integer-second intervals."""
    return f"""
WITH base AS (
  SELECT k, s, e FROM ({intervals_sql}) WHERE e >= s
),
flagged AS (
  SELECT k, s, e,
         CASE WHEN max(e) OVER (PARTITION BY k ORDER BY s ASC, e ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                OR s > max(e) OVER (PARTITION BY k ORDER BY s ASC, e ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_seg
  FROM base
),
segd AS (
  SELECT k, s, e,
         SUM(new_seg) OVER (PARTITION BY k ORDER BY s ASC, e ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
  FROM flagged
),
segs AS (
  SELECT k, seg, MIN(s) AS ss, MAX(e) AS se, COUNT(*) AS n
  FROM segd GROUP BY 1, 2
)
SELECT k AS {key_col},
       CAST(SUM(n) AS BIGINT) AS n_intervals,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(se - ss) AS BIGINT) AS covered_s,
       CAST(MAX(se) - MIN(ss) AS BIGINT) AS span_s
FROM segs GROUP BY 1
"""


def rate_burst_windows(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_s: int = 3600,
    baseline_windows: int = 24,
    factor_micro: int = 3_000_000,
) -> DataFrame:
    """Rate-burst detection: per key and fixed window, flag windows whose
    event count exceeds ``factor_micro``/1e6 times the trailing
    ``baseline_windows``-window mean — the ops-alert primitive behind
    "traffic on this endpoint is 3x its last-24h rate" (a bounded-state
    sibling of [[cusum_changepoint]]; CUSUM finds level SHIFTS, this
    flags transient spikes against a rolling local baseline).

    Exact integer comparison — no float rate ever computed:
    ``burst = c * baseline_windows * 1e6 > factor_micro * base_sum``
    (cross-multiplied; a window with zero trailing traffic and any
    current traffic is a burst by this form, which is the wanted
    semantics). Windows are fixed-epoch ``unix_ts div window_s`` integers
    and the spine is DENSE per key (missing windows count 0 — without
    gapfill, a key quiet for an hour would shrink its own baseline
    denominator). Early windows (fewer than ``baseline_windows``
    predecessors) are never flagged: a partial baseline reads too hot.

    Scale shape (100 TB): one (key, window) hash aggregate over the fact
    table; the dense spine is |keys| x |span windows| (bounded by
    calendar time, not events) built from a broadcast 1-row bounds
    aggregate; the trailing sum is a key-partitioned ROWS window.

    Output: (key, win_start, n_events, base_sum, n_base, burst).
    """
    from pyspark.sql.window import Window

    win = F.expr(f"unix_timestamp({ts_col}) div {window_s}")
    counts = (
        events.select(F.col(key_col).alias("key"), win.alias("w"))
        .groupBy("key", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    bounds = counts.agg(
        F.min("w").alias("_wmin"), F.max("w").alias("_wmax")
    )
    keys = counts.select("key").distinct()
    spine = keys.crossJoin(F.broadcast(bounds)).select(
        "key", F.explode(F.sequence("_wmin", "_wmax")).alias("w")
    )
    dense = spine.join(counts, ["key", "w"], "left").na.fill({"_c": 0})
    trail = (
        Window.partitionBy("key")
        .orderBy("w")
        .rowsBetween(-baseline_windows, -1)
    )
    return (
        dense.withColumn("base_sum", F.sum("_c").over(trail).cast("long"))
        .withColumn("n_base", F.count(F.lit(1)).over(trail).cast("long"))
        .select(
            F.col("key"),
            (F.col("w") * window_s).cast("long").alias("win_start"),
            F.col("_c").alias("n_events"),
            F.coalesce("base_sum", F.lit(0)).alias("base_sum"),
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            (
                (F.col("n_base") == baseline_windows)
                & (
                    F.col("_c") * baseline_windows * F.lit(1_000_000)
                    > F.lit(factor_micro) * F.coalesce("base_sum", F.lit(0))
                )
            ).alias("burst"),
        )
    )


def rate_burst_oracle_sql(
    *,
    table: str = "events",
    key_sql: str = "event_type",
    ts_sql: str = "ts",
    window_s: int = 3600,
    baseline_windows: int = 24,
    factor_micro: int = 3_000_000,
) -> str:
    """DuckDB twin of [[rate_burst_windows]] — same dense spine, same
    cross-multiplied integer burst test (epoch seconds floored per the
    cross-engine cookbook)."""
    return f"""
WITH counts AS (
  SELECT {key_sql} AS key,
         CAST(floor(epoch(CAST({ts_sql} AS TIMESTAMP))) AS BIGINT)
           // {window_s} AS w,
         CAST(count(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1, 2
),
bounds AS (SELECT MIN(w) AS wmin, MAX(w) AS wmax FROM counts),
spine AS (
  SELECT k.key, r.w
  FROM (SELECT DISTINCT key FROM counts) k
  CROSS JOIN (SELECT unnest(range(wmin, wmax + 1)) AS w FROM bounds) r
),
dense AS (
  SELECT s.key, s.w, COALESCE(c.c, 0) AS c
  FROM spine s LEFT JOIN counts c ON s.key = c.key AND s.w = c.w
),
trail AS (
  SELECT key, w, c,
         CAST(COALESCE(SUM(c) OVER fr, 0) AS BIGINT) AS base_sum,
         CAST(COALESCE(COUNT(*) OVER fr, 0) AS BIGINT) AS n_base
  FROM dense
  WINDOW fr AS (PARTITION BY key ORDER BY w
                ROWS BETWEEN {baseline_windows} PRECEDING AND 1 PRECEDING)
)
SELECT key, CAST(w * {window_s} AS BIGINT) AS win_start,
       c AS n_events, base_sum, n_base,
       (n_base = {baseline_windows}
        AND c * {baseline_windows} * 1000000 > {factor_micro} * base_sum)
         AS burst
FROM trail
"""


def ma_crossover_signals(
    df: DataFrame,
    *,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    short_days: int = 7,
    long_days: int = 28,
) -> DataFrame:
    """Moving-average crossover detector over a daily value series: days
    where the trailing ``short_days`` mean crosses the trailing
    ``long_days`` mean — the trend-turn readout ("golden cross" up,
    "death cross" down) for revenue/traffic monitoring, kin to
    [[rate_burst_windows]] (bursts are spikes; crossings are regime
    turns).

    No float mean is ever computed: the comparison is the exact
    cross-multiplied sign of ``sum_short*n_long - sum_long*n_short``
    over a DENSE per-key day spine (quiet days contribute 0 — without
    gapfill, window row-frames would silently span calendar gaps). A day
    emits a signal when both frames are FULL and the sign differs from
    the previous day's; sign 0 (exact tie) participates so a
    touch-and-reverse is two signals, which keeps the rule total and
    engine-portable.

    Scale shape (100 TB): one (key, day) aggregate over the fact table;
    spine + windows run on keys x days rows (calendar-bounded).

    Output: (key, day, short_sum, long_sum, sig, prev_sig, direction)
    for signal days only; direction 'up' when the short side rises
    through, 'down' otherwise.
    """
    from pyspark.sql.window import Window

    day = F.expr(f"unix_timestamp({ts_col}) div 86400")
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            day.alias("d"),
            F.col(value_col).cast("long").alias("v"),
        )
        .groupBy("key", "d")
        .agg(F.sum("v").cast("long").alias("_v"))
    )
    bounds = daily.agg(F.min("d").alias("_d0"), F.max("d").alias("_d1"))
    spine = (
        daily.select("key").distinct()
        .crossJoin(F.broadcast(bounds))
        .select("key", F.explode(F.sequence("_d0", "_d1")).alias("d"))
    )
    dense = spine.join(daily, ["key", "d"], "left").na.fill({"_v": 0})
    ws = (
        Window.partitionBy("key").orderBy("d")
        .rowsBetween(-(short_days - 1), 0)
    )
    wl = (
        Window.partitionBy("key").orderBy("d")
        .rowsBetween(-(long_days - 1), 0)
    )
    wp = Window.partitionBy("key").orderBy("d")
    sig = F.signum(
        F.col("short_sum") * long_days - F.col("long_sum") * short_days
    ).cast("int")
    scored = (
        dense.withColumn("short_sum", F.sum("_v").over(ws).cast("long"))
        .withColumn("long_sum", F.sum("_v").over(wl).cast("long"))
        .withColumn("n_long", F.count(F.lit(1)).over(wl))
        .withColumn("sig", sig)
        .withColumn("prev_sig", F.lag("sig").over(wp))
        .withColumn("prev_full", F.lag("n_long").over(wp))
    )
    return (
        scored.filter(
            (F.col("n_long") == long_days)
            & (F.col("prev_full") == long_days)
            & (F.col("sig") != F.col("prev_sig"))
        )
        .select(
            "key",
            F.col("d").cast("long").alias("day"),
            "short_sum",
            "long_sum",
            F.col("sig").cast("long").alias("sig"),
            F.col("prev_sig").cast("long").alias("prev_sig"),
            F.when(F.col("sig") > F.col("prev_sig"), F.lit("up"))
            .otherwise(F.lit("down"))
            .alias("direction"),
        )
    )


def ma_crossover_oracle_sql(
    *,
    table: str,
    key_sql: str,
    ts_sql: str,
    value_sql: str,
    short_days: int = 7,
    long_days: int = 28,
) -> str:
    """DuckDB twin of [[ma_crossover_signals]]."""
    return f"""
WITH daily AS (
  SELECT {key_sql} AS key,
         CAST(floor(epoch(CAST({ts_sql} AS TIMESTAMP))) AS BIGINT) // 86400
           AS d,
         CAST(SUM(CAST({value_sql} AS BIGINT)) AS BIGINT) AS v
  FROM {table} GROUP BY 1, 2
),
bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
spine AS (
  SELECT k.key, r.d
  FROM (SELECT DISTINCT key FROM daily) k
  CROSS JOIN (SELECT unnest(range(d0, d1 + 1)) AS d FROM bounds) r
),
dense AS (
  SELECT s.key, s.d, COALESCE(daily.v, 0) AS v
  FROM spine s LEFT JOIN daily ON s.key = daily.key AND s.d = daily.d
),
scored AS (
  SELECT key, d,
         CAST(SUM(v) OVER ws AS BIGINT) AS short_sum,
         CAST(SUM(v) OVER wl AS BIGINT) AS long_sum,
         COUNT(*) OVER wl AS n_long
  FROM dense
  WINDOW ws AS (PARTITION BY key ORDER BY d
                ROWS BETWEEN {short_days - 1} PRECEDING AND CURRENT ROW),
         wl AS (PARTITION BY key ORDER BY d
                ROWS BETWEEN {long_days - 1} PRECEDING AND CURRENT ROW)
),
sigd AS (
  SELECT *,
         CAST(sign(short_sum * {long_days} - long_sum * {short_days})
              AS INT) AS sig,
         lag(CAST(sign(short_sum * {long_days} - long_sum * {short_days})
              AS INT)) OVER wp AS prev_sig,
         lag(n_long) OVER wp AS prev_full
  FROM scored
  WINDOW wp AS (PARTITION BY key ORDER BY d)
)
SELECT key, CAST(d AS BIGINT) AS day, short_sum, long_sum,
       CAST(sig AS BIGINT) AS sig, CAST(prev_sig AS BIGINT) AS prev_sig,
       CASE WHEN sig > prev_sig THEN 'up' ELSE 'down' END AS direction
FROM sigd
WHERE n_long = {long_days} AND prev_full = {long_days} AND sig <> prev_sig
"""


def dow_adjusted_anomalies(
    events: DataFrame,
    *,
    k: int = 5,
) -> DataFrame:
    """Seasonality-aware daily-volume anomalies: residual = the day's
    count minus its DAY-OF-WEEK baseline mean, then a MAD gate over the
    residuals — the alarm that doesn't page every Saturday because
    weekends are always quiet (a raw-count gate like [[mad_anomalies]]
    flags the weekly rhythm itself; this one flags departures FROM it).

    All integer: dow via fixed-epoch arithmetic ``(epoch_day+4) % 7``
    (1970-01-01 was a Thursday — no locale date parts), the dow baseline
    as ``sum·1000 div n`` milli, residual in milli, and both median and
    MAD as NEAREST-RANK-LOWER order statistics over the (residual, day)
    total order (the [[mad_anomalies]] discipline — no interpolation).
    Quiet calendar days are real zero counts on the dense spine.

    Output per day: count, dow, expected milli, residual milli, and the
    ``|resid − med| > k·MAD`` flag (with the standard MAD==0 caveat).

    Scale shape: one (day) fact aggregate; everything after runs on the
    calendar spine (days-sized — the rank windows are domain-sized,
    never fact-sized).
    """
    day = F.expr("datediff(ts, DATE '1970-01-01')")
    daily = events.groupBy(day.alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    bounds = daily.groupBy().agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("d")
    )
    dense = spine.join(daily, "d", "left").select(
        "d",
        F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
        F.expr("(d + 4) % 7").cast("long").alias("dow"),
    )
    per_dow = dense.groupBy("dow").agg(
        F.sum("c").cast("long").alias("dsum"),
        F.count(F.lit(1)).cast("long").alias("dn"),
    )
    resid = dense.join(per_dow, "dow").select(
        "d",
        "dow",
        "c",
        F.expr("CAST(dsum * 1000 DIV dn AS BIGINT)").alias("expected_milli"),
        F.expr("CAST(c * 1000 - dsum * 1000 DIV dn AS BIGINT)").alias(
            "resid_milli"
        ),
    )
    # Single lineage: med and MAD are picked by rank windows and smeared
    # back over the same days-sized relation with whole-frame windows —
    # a scalar-subquery formulation would re-execute the FACT aggregate
    # once per branch (measured: 3 extra corpus scans at 5M events).
    # Every window here is unpartitioned but runs on the calendar spine
    # (days-sized), never the fact table.
    w_rank = Window.orderBy("resid_milli", "d")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    with_med = (
        resid.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("n", F.count("*").over(w_all))
        .withColumn(
            "med",
            F.max(
                F.when(
                    F.col("rn") == F.floor((F.col("n") + 1) / 2),
                    F.col("resid_milli"),
                )
            ).over(w_all),
        )
        .withColumn("dev", F.abs(F.col("resid_milli") - F.col("med")))
    )
    w_rank2 = Window.orderBy("dev", "d")
    with_mad = (
        with_med.withColumn("rn2", F.row_number().over(w_rank2))
        .withColumn(
            "mad",
            F.max(
                F.when(
                    F.col("rn2") == F.floor((F.col("n") + 1) / 2),
                    F.col("dev"),
                )
            ).over(w_all),
        )
    )
    return with_mad.select(
        "d",
        "dow",
        "c",
        "expected_milli",
        "resid_milli",
        F.when(F.col("dev") > F.lit(k) * F.col("mad"), 1)
        .otherwise(0).cast("long").alias("flagged"),
    ).orderBy("d")


def dow_adjusted_oracle_sql(
    *,
    table: str = "events",
    k: int = 5,
) -> str:
    """DuckDB twin of [[dow_adjusted_anomalies]]."""
    return f"""
WITH daily AS (
  SELECT datediff('day', DATE '1970-01-01', ts) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1
),
bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
spine AS (
  SELECT gs.d FROM bounds
  CROSS JOIN LATERAL (SELECT unnest(range(d0, d1 + 1)) AS d) gs
),
dense AS (
  SELECT s.d, COALESCE(daily.c, 0) AS c,
         CAST((s.d + 4) % 7 AS BIGINT) AS dow
  FROM spine s LEFT JOIN daily ON daily.d = s.d
),
per_dow AS (
  SELECT dow, CAST(SUM(c) AS BIGINT) AS dsum,
         CAST(COUNT(*) AS BIGINT) AS dn
  FROM dense GROUP BY 1
),
resid AS (
  SELECT d, dense.dow, c,
         CAST(dsum * 1000 // dn AS BIGINT) AS expected_milli,
         CAST(c * 1000 - dsum * 1000 // dn AS BIGINT) AS resid_milli
  FROM dense JOIN per_dow ON dense.dow = per_dow.dow
),
med AS (
  SELECT resid_milli AS med
  FROM (SELECT resid_milli,
               row_number() OVER (ORDER BY resid_milli, d) AS rn,
               COUNT(*) OVER () AS n
        FROM resid)
  WHERE rn = (n + 1) // 2
),
dev AS (
  SELECT resid.*, med, abs(resid_milli - med) AS dv
  FROM resid CROSS JOIN med
),
mad AS (
  SELECT dv AS mad
  FROM (SELECT dv, d, row_number() OVER (ORDER BY dv, d) AS rn,
               COUNT(*) OVER () AS n
        FROM dev)
  WHERE rn = (n + 1) // 2
)
SELECT d, dow, CAST(c AS BIGINT) AS c, expected_milli, resid_milli,
       CAST(CASE WHEN abs(resid_milli - med) > {k} * mad
                 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM dev CROSS JOIN mad
ORDER BY d
"""
