"""Slowly-changing-dimension (type 2) builder — the standard warehouse
operator that turns a change log into a versioned dimension table with
validity intervals.

From (key, ts, attrs...) change events:

1. order each key's changes by (ts, *tiebreak);
2. collapse no-op changes (rows whose attributes equal the previous row's —
   re-emitting an unchanged record must not open a new version);
3. emit one row per surviving change with ``valid_from`` = its ts,
   ``valid_to`` = the next change's ts (half-open interval, NULL for the
   open current version), ``version`` = 1-based per key, ``is_current``.

Scale shape: ONE hash shuffle on the key + one sort; the collapse filter
and interval assignment are lag/lead over the same window spec, so Spark
plans a single Window operator chain with no extra exchange. The join-free
formulation matters at 100 TB: the naive MERGE-per-batch SCD build is a
self-join per load, this is a linear pass.

No reference analog (the reference stores only latest-wins vectors); this
extends the engine's warehouse surface (as-of joins consume exactly these
validity intervals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str = "ts",
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Build the SCD2 table. Output: (*key_cols, *attr_cols, valid_from,
    valid_to, version BIGINT, is_current). ``tiebreak_cols`` break equal
    timestamps deterministically (e.g. a change-log sequence id)."""
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # eqNullSafe, not ==: three-valued logic would make `~same` NULL when an
    # attribute transitions to/from NULL and the filter would drop the row
    same_as_prev = F.lit(True)
    for c in attr_cols:
        same_as_prev = same_as_prev & F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    first_row = F.lag(F.col(ts_col)).over(w).isNull()
    collapsed = changes.withColumn(
        "_keep", first_row | ~same_as_prev
    ).where(F.col("_keep"))
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return collapsed.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead(F.col(ts_col)).over(w2).isNull().alias("is_current"),
    )


def scd2_oracle_sql(
    *,
    table: str = "events",
    key: str = "user_id",
    ts_col: str = "ts",
    attr: str = "event_type",
    tiebreak: str = "event_id",
) -> str:
    """DuckDB rendering over a single key/attr with epoch-micro outputs
    (timezone-free cross-engine compare)."""
    return f"""
WITH ordered AS (
  SELECT {key}, {attr}, epoch_us({ts_col}) AS ts_us, {tiebreak} AS tb,
         lag({attr}) OVER (PARTITION BY {key} ORDER BY {ts_col}, {tiebreak})
           AS prev_attr,
         lag({ts_col}) OVER (PARTITION BY {key} ORDER BY {ts_col}, {tiebreak})
           AS prev_ts
  FROM {table}
), collapsed AS (
  SELECT {key}, {attr}, ts_us, tb FROM ordered
  WHERE prev_ts IS NULL OR ({attr} IS DISTINCT FROM prev_attr)
)
SELECT {key}, {attr},
       ts_us AS valid_from_us,
       lead(ts_us) OVER (PARTITION BY {key} ORDER BY ts_us, tb) AS valid_to_us,
       CAST(row_number() OVER (PARTITION BY {key} ORDER BY ts_us, tb) AS BIGINT)
         AS version,
       (lead(ts_us) OVER (PARTITION BY {key} ORDER BY ts_us, tb) IS NULL)
         AS is_current
FROM collapsed
"""


def interval_integrity_audit(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    start_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """Integrity audit for SCD2 / validity-interval tables: per key, count
    OVERLAPS (a row starting before its predecessor ended) and GAPS
    (a row starting after it ended) under the half-open [from, to)
    contract [[scd2_build]] produces — the check that catches a merge job
    that double-writes a version or drops one, which point-in-time joins
    ([[scd2_point_in_time]]) then silently mis-answer.

    Rows order per key by (start, end, all-columns tiebreak is
    unnecessary: equal (start, end) duplicates count as overlaps by the
    lag comparison). NULL end = open row; more than one open row per key
    is also flagged. Epochs are fixed-epoch integer seconds.

    Scale shape (100 TB): one key-partitioned lag window + one key
    aggregate — version-table volume, no joins.

    Output per key with any defect: (key, n_rows, n_overlaps, n_gaps,
    n_open_rows).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    s = F.expr(f"unix_timestamp({start_col})")
    e = F.when(
        F.col(end_col).isNull(), F.lit(None).cast("long")
    ).otherwise(F.expr(f"unix_timestamp({end_col})"))
    base = df.select(
        F.col(key_col).alias("key"), s.alias("_s"), e.alias("_e")
    )
    w = Window.partitionBy("key").orderBy(
        F.col("_s").asc(), F.col("_e").asc_nulls_last()
    )
    lagged = base.withColumn("_pe", F.lag("_e").over(w))
    return (
        lagged.groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(
                (
                    F.col("_pe").isNotNull() & (F.col("_s") < F.col("_pe"))
                ).cast("long")
            )
            .cast("long")
            .alias("n_overlaps"),
            F.sum(
                (
                    F.col("_pe").isNotNull() & (F.col("_s") > F.col("_pe"))
                ).cast("long")
            )
            .cast("long")
            .alias("n_gaps"),
            F.sum(F.col("_e").isNull().cast("long"))
            .cast("long")
            .alias("n_open_rows"),
        )
        .filter(
            (F.col("n_overlaps") > 0)
            | (F.col("n_gaps") > 0)
            | (F.col("n_open_rows") > 1)
        )
        .select(
            F.col("key").cast("long").alias(key_col),
            "n_rows",
            "n_overlaps",
            "n_gaps",
            "n_open_rows",
        )
    )


def interval_integrity_oracle_sql(
    *,
    table: str,
    key_sql: str = "user_id",
    start_sql: str = "valid_from",
    end_sql: str = "valid_to",
) -> str:
    """DuckDB twin of [[interval_integrity_audit]]."""
    return f"""
WITH base AS (
  SELECT {key_sql} AS key,
         CAST(floor(epoch(CAST({start_sql} AS TIMESTAMP))) AS BIGINT) AS s,
         CASE WHEN {end_sql} IS NULL THEN NULL
              ELSE CAST(floor(epoch(CAST({end_sql} AS TIMESTAMP))) AS BIGINT)
         END AS e
  FROM {table}
),
lagged AS (
  SELECT key, s, e,
         lag(e) OVER (PARTITION BY key ORDER BY s ASC, e ASC NULLS LAST)
           AS pe
  FROM base
),
agg AS (
  SELECT key,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN pe IS NOT NULL AND s < pe THEN 1 ELSE 0 END)
              AS BIGINT) AS n_overlaps,
         CAST(SUM(CASE WHEN pe IS NOT NULL AND s > pe THEN 1 ELSE 0 END)
              AS BIGINT) AS n_gaps,
         CAST(SUM(CASE WHEN e IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_open_rows
  FROM lagged GROUP BY 1
)
SELECT CAST(key AS BIGINT) AS user_id, n_rows, n_overlaps, n_gaps,
       n_open_rows
FROM agg
WHERE n_overlaps > 0 OR n_gaps > 0 OR n_open_rows > 1
"""
