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
