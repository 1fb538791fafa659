"""Semi-structured (JSON) column processing: schema-on-read + quarantine.

Event pipelines carry loosely-typed JSON payload columns (the testdata's
``events.props``); the batch contract is: parse with a declared schema,
NEVER drop rows silently — malformed payloads go to a quarantine flag the
pipeline routes to a dead-letter table, and typed fields flow on.

Spark-first: ``from_json`` with PERMISSIVE mode + a corrupt-record column
is JVM-side schema-on-read (whole-stage codegen, no Python), so parsing
100 TB of payloads is a map-only pass. A payload that violates the
declared schema — malformed JSON or a field of the wrong type — yields
null typed fields and the corrupt flag; a null input stays null without
being quarantined (absent payload is not malformed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_json_column(
    df: DataFrame,
    col: str,
    schema: str,
    *,
    prefix: str = "",
    keep_corrupt: bool = True,
) -> DataFrame:
    """Parse a JSON string column into typed fields appended to the row.

    ``schema`` is a DDL fragment (e.g. ``"k INT, device STRING"``). Adds
    one column per field (optionally prefixed) plus ``{col}_corrupt``:
    true iff the payload was present but unparsable under PERMISSIVE mode.
    """
    corrupt_field = "_corrupt"
    full_schema = f"{schema}, {corrupt_field} STRING"
    parsed = df.withColumn(
        "_j",
        F.from_json(
            F.col(col),
            full_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_field},
        ),
    )
    field_names = [
        f.strip().split()[0] for f in schema.split(",") if f.strip()
    ]
    out = parsed.select(
        "*",
        *[
            F.col(f"_j.{name}").alias(f"{prefix}{name}")
            for name in field_names
        ],
    )
    if keep_corrupt:
        out = out.withColumn(
            f"{col}_corrupt",
            F.col(col).isNotNull() & F.col(f"_j.{corrupt_field}").isNotNull(),
        )
    return out.drop("_j")


def quarantine_split(
    df: DataFrame, col: str
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) after :func:`parse_json_column` — the routing a
    dead-letter pipeline needs; both sides are filters on the same parse
    pass (one scan when the plan is reused)."""
    flag = F.col(f"{col}_corrupt")
    return df.filter(~flag), df.filter(flag)


def json_key_profile(
    df: DataFrame,
    *,
    json_col: str = "props",
    ts_col: str = "ts",
) -> DataFrame:
    """Schema-drift profile of a semi-structured JSON column: per top-level
    key, how many rows carry it, over how many distinct days, and its
    first/last day of appearance — the monitoring view that catches a
    producer silently adding/dropping/renaming fields long before a
    parse job fails on them.

    Keys are extracted with a PORTABLE regex anchored on a preceding
    ``{`` or ``,`` (``[{,]␣"key"␣?:`` — the engine's props are flat by
    contract), so the same extraction replicates in the DuckDB twin
    without relying on either engine's JSON-path quirks. The anchor
    stops string VALUES containing an escaped quote + colon (e.g.
    ``{"k": "a\\":b"}``) from yielding bogus keys (ADVICE r6); a value
    that itself contains ``,"x":`` verbatim can still false-positive —
    flat non-adversarial producer payloads are the contract.  Days are
    fixed-epoch ``epoch-seconds div 86400`` integers.

    Scale shape: one regexp_extract_all + explode + one (key) aggregate —
    word-count shaped.
    """
    keys = df.select(
        F.explode(
            F.expr(
                f"""regexp_extract_all({json_col}, '[{{,]\\\\s*"([^"]+)"\\\\s*:', 1)"""
            )
        ).alias("key"),
        F.expr(f"unix_timestamp({ts_col}) div 86400").alias("day"),
    )
    return keys.groupBy("key").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("day").cast("long").alias("n_days"),
        F.min("day").cast("long").alias("first_day"),
        F.max("day").cast("long").alias("last_day"),
    )


def json_key_profile_oracle_sql(
    *,
    table: str = "events",
    json_col: str = "props",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of [[json_key_profile]]."""
    return f"""
WITH keys AS (
  SELECT unnest(regexp_extract_all({json_col}, '[{{,]\\s*"([^"]+)"\\s*:', 1))
           AS key,
         CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP))) AS BIGINT) // 86400
           AS day
  FROM {table}
)
SELECT key,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT day) AS BIGINT) AS n_days,
       CAST(MIN(day) AS BIGINT) AS first_day,
       CAST(MAX(day) AS BIGINT) AS last_day
FROM keys GROUP BY 1
"""
