"""Windowed funnel analysis over event streams.

The ClickHouse ``windowFunnel`` / product-analytics staple: how far does
each user progress through an ordered chain of event types, with the whole
chain constrained to a time window anchored at the first step.

Semantics here are **greedy-from-earliest** (documented deviation from
ClickHouse's any-anchor sliding scan): the chain anchors at the user's
EARLIEST step-1 event; each subsequent step matches its earliest event
STRICTLY after the previous step (and within ``within_s`` of the anchor).
Greedy-earliest is deterministic and exactly SQL-replicable; the any-anchor
variant can only convert MORE users when a window is set and a later anchor
would fit — for window-free funnels the two agree exactly.

Scale shape: one filtered aggregate per step — step i is a groupBy(key)
min() over events filtered to that step's type, joined to the accumulated
chain on the key. k steps = k key-hash shuffles over *filtered* subsets
(each far smaller than the corpus; the event scan pushes the type filter
down). No collect_list of a user's full history (unbounded per-key memory),
no per-key nested loop.

No reference analog (the reference has no event-sequence operator); this is
part of the engine's general OLAP surface alongside sessionize/gapfill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    *,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_s: int | None = None,
) -> DataFrame:
    """Per-key funnel progression.

    Output: (key, t1_us .. tk_us BIGINT epoch-micros of each matched step
    — NULL from the first unmatched step on, max_step, completed,
    duration_us between anchor and final step for completed chains).
    Epoch-micros keep the output timezone-free and exact.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    us = F.unix_micros(F.col(ts_col))
    chain = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(us).alias("t1_us"))
    )
    for i, step in enumerate(steps[1:], start=2):
        ev = events.where(F.col(type_col) == step).select(
            F.col(key_col), us.alias("_ts_us")
        )
        cond = (ev["_ts_us"] > chain[f"t{i - 1}_us"])
        if within_s is not None:
            cond = cond & (ev["_ts_us"] <= chain["t1_us"] + within_s * 1_000_000)
        nxt = (
            chain.join(ev, on=(chain[key_col] == ev[key_col]) & cond, how="inner")
            .groupBy(chain[key_col])
            .agg(F.min("_ts_us").alias(f"t{i}_us"))
        )
        chain = chain.join(nxt, on=key_col, how="left")
    k = len(steps)
    max_step = sum(
        (F.col(f"t{i}_us").isNotNull().cast("int") for i in range(2, k + 1)),
        F.lit(1),
    ).cast("long")
    completed = F.col(f"t{k}_us").isNotNull()
    return chain.select(
        key_col,
        *[f"t{i}_us" for i in range(1, k + 1)],
        max_step.alias("max_step"),
        completed.alias("completed"),
        F.when(completed, F.col(f"t{k}_us") - F.col("t1_us")).alias("duration_us"),
    )


def funnel_counts(funnel_df: DataFrame) -> DataFrame:
    """Conversion summary: users reaching at least each level (classic
    monotone funnel chart), one tiny aggregate over the per-key table."""
    per_level = funnel_df.groupBy("max_step").agg(
        F.count(F.lit(1)).cast("long").alias("n_at_level")
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.desc("max_step"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_level.select(
        "max_step",
        "n_at_level",
        F.sum("n_at_level").over(w).cast("long").alias("n_reached"),
    )


def funnel_oracle_sql(
    *,
    steps: list[str],
    table: str = "events",
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_s: int | None = None,
) -> str:
    """DuckDB rendering of :func:`funnel`, step-for-step."""
    k = len(steps)
    ctes = [
        f"""s1 AS (
  SELECT {key}, min(epoch_us({ts_col})) AS t1_us
  FROM {table} WHERE {type_col} = '{steps[0]}' GROUP BY 1
)"""
    ]
    for i, step in enumerate(steps[1:], start=2):
        win = (
            f" AND epoch_us(e.{ts_col}) <= c.t1_us + {within_s * 1_000_000}"
            if within_s is not None
            else ""
        )
        prev_chain = "s1" if i == 2 else f"c{i - 1}"
        ctes.append(
            f"""c{i} AS (
  SELECT p.*, n.t{i}_us FROM {prev_chain} p
  LEFT JOIN (
    SELECT c.{key}, min(epoch_us(e.{ts_col})) AS t{i}_us
    FROM {prev_chain} c JOIN {table} e ON e.{key} = c.{key}
    WHERE e.{type_col} = '{step}'
      AND epoch_us(e.{ts_col}) > c.t{i - 1}_us{win}
    GROUP BY 1
  ) n USING ({key})
)"""
        )
    max_step = " + ".join(
        [f"CASE WHEN t{i}_us IS NOT NULL THEN 1 ELSE 0 END" for i in range(2, k + 1)]
    )
    tcols = ", ".join(f"t{i}_us" for i in range(1, k + 1))
    return f"""
WITH {', '.join(ctes)}
SELECT {key}, {tcols},
       CAST(1 + {max_step} AS BIGINT) AS max_step,
       (t{k}_us IS NOT NULL) AS completed,
       CASE WHEN t{k}_us IS NOT NULL THEN t{k}_us - t1_us END AS duration_us
FROM c{k}
"""


def cohort_retention(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    period_s: int = 7 * 86400,
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity period, then
    the fraction of each cohort active again k periods later.

    Output: (cohort_s BIGINT epoch-seconds of the cohort period start,
    offset BIGINT periods since the cohort period, n_cohort, n_active,
    retention DOUBLE rounded 6). offset 0 is the cohort period itself
    (retention 1.0 by construction).

    Scale shape: first-activity is one key-hash groupBy; per-period activity
    is one distinct over (key, period) — both with map-side partials; the
    cohort join shuffles on the key; the matrix aggregate is trivial
    (cohorts x offsets rows). All linear, no windows over the raw stream.
    """
    period = F.floor(F.col(ts_col).cast("double") / period_s).cast("long")
    first = (
        events.select(F.col(key_col).alias("k"), period.alias("p"))
        .groupBy("k")
        .agg(F.min("p").alias("cohort_p"))
    )
    active = (
        events.select(F.col(key_col).alias("k"), period.alias("p")).distinct()
    )
    joined = active.join(first, "k").select(
        "k", "cohort_p", (F.col("p") - F.col("cohort_p")).alias("offset")
    )
    sizes = first.groupBy("cohort_p").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    matrix = (
        joined.groupBy("cohort_p", "offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(sizes, "cohort_p")
    )
    return matrix.select(
        (F.col("cohort_p") * period_s).alias("cohort_s"),
        F.col("offset").cast("long").alias("offset"),
        "n_cohort",
        "n_active",
        F.round(F.col("n_active") / F.col("n_cohort"), 6).alias("retention"),
    )


def cohort_retention_oracle_sql(
    *,
    table: str = "events",
    key: str = "user_id",
    ts_col: str = "ts",
    period_s: int = 7 * 86400,
) -> str:
    """DuckDB rendering of :func:`cohort_retention`."""
    p = f"CAST(floor(epoch({ts_col}) / {period_s}) AS BIGINT)"
    return f"""
WITH first AS (
  SELECT {key} AS k, min({p}) AS cohort_p FROM {table} GROUP BY 1
), active AS (
  SELECT DISTINCT {key} AS k, {p} AS p FROM {table}
), joined AS (
  SELECT a.k, f.cohort_p, a.p - f.cohort_p AS offset
  FROM active a JOIN first f ON a.k = f.k
), sizes AS (
  SELECT cohort_p, CAST(count(*) AS BIGINT) AS n_cohort FROM first GROUP BY 1
)
SELECT j.cohort_p * {period_s} AS cohort_s,
       CAST(j.offset AS BIGINT) AS offset,
       s.n_cohort,
       CAST(count(*) AS BIGINT) AS n_active,
       round(count(*) * 1.0 / s.n_cohort, 6) AS retention
FROM joined j JOIN sizes s ON j.cohort_p = s.cohort_p
GROUP BY j.cohort_p, j.offset, s.n_cohort
"""


def conversion_lag_percentiles(
    events: DataFrame,
    *,
    from_event: str = "view",
    to_event: str = "purchase",
    horizon_s: int = 7 * 86400,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-to-convert distribution: per user, the lag from their FIRST
    ``from_event`` to their first ``to_event`` at-or-after it (within
    ``horizon_s``); one output row with exact nearest-rank percentiles
    of that lag plus conversion counts — the funnel-speed readout that
    [[funnel_within_24h]]'s counts don't give ("converters converted,
    but HOW FAST?").

    All integer: lags are epoch-second differences; percentiles are the
    nearest-rank order statistics (rank = ceil(p·n)) over converting
    users.  Same-instant conversion counts as lag 0 (>= comparison).

    Scale shape (100 TB): two user-keyed aggregates (first-from, then
    min eligible to-ts via one conditional agg after a user-keyed join),
    then percentiles over the CONVERTING-USER lag column — a
    single-partition rank window bounded by converter count; swap in
    [[exact_quantiles_two_pass]] when converters are corpus-scale.
    """
    from pyrope_spark.operators.analytics import nearest_rank_percentiles

    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.unix_timestamp(ts_col).cast("long").alias("s"),
    )
    first_from = (
        ev.filter(F.col("t") == from_event)
        .groupBy("u")
        .agg(F.min("s").alias("fs"))
    )
    tos = ev.filter(F.col("t") == to_event).select("u", F.col("s").alias("ts2"))
    lags = (
        first_from.join(tos, "u")
        .filter(
            (F.col("ts2") >= F.col("fs"))
            & (F.col("ts2") <= F.col("fs") + horizon_s)
        )
        .groupBy("u")
        .agg((F.min("ts2") - F.min("fs")).cast("long").alias("lag_s"))
    )
    pct = nearest_rank_percentiles(
        lags, "lag_s", percentiles=list(percentiles)
    )
    counts = first_from.agg(
        F.count("*").cast("long").alias("n_from_users")
    ).crossJoin(lags.agg(F.count("*").cast("long").alias("n_converted")))
    return counts.crossJoin(pct).select(
        "n_from_users",
        "n_converted",
        *[
            F.col(f"p{int(p * 100)}").cast("long").alias(f"p{int(p * 100)}")
            for p in percentiles
        ],
    )


def conversion_lag_oracle_sql(
    *,
    from_event: str = "view",
    to_event: str = "purchase",
    horizon_s: int = 7 * 86400,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of [[conversion_lag_percentiles]]."""
    pct_cols = []
    for p in percentiles:
        name = f"p{int(p * 100)}"
        pct_cols.append(
            f"CAST(MAX(CASE WHEN rn = CAST(ceil({p} * n) AS BIGINT)"
            f" THEN lag_s END) AS BIGINT) AS {name}"
        )
    return f"""
WITH ev AS (
  SELECT {user_col} AS u, {type_col} AS t,
         CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP))) AS BIGINT) AS s
  FROM {table}
),
ff AS (SELECT u, MIN(s) AS fs FROM ev WHERE t = '{from_event}' GROUP BY 1),
lags AS (
  SELECT ff.u, CAST(MIN(ev.s) - MIN(ff.fs) AS BIGINT) AS lag_s
  FROM ff JOIN ev ON ev.u = ff.u
  WHERE ev.t = '{to_event}' AND ev.s >= ff.fs AND ev.s <= ff.fs + {horizon_s}
  GROUP BY 1
),
ranked AS (
  SELECT lag_s, row_number() OVER (ORDER BY lag_s) AS rn,
         COUNT(*) OVER () AS n
  FROM lags
),
pct AS (SELECT {", ".join(pct_cols)} FROM ranked),
counts AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ff) AS n_from_users,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lags) AS n_converted
)
SELECT counts.n_from_users, counts.n_converted, pct.*
FROM counts CROSS JOIN pct
"""
