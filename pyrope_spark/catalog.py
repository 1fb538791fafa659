"""Test-data catalog: loads the driver-provided parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under an sf dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    if name == "events":
        # events.ts has shipped as TIMESTAMP(NANOS) (unreadable by Spark
        # unless nanos are surfaced as long) and as µs TIMESTAMP_NTZ,
        # depending on the generator. Normalize both layouts to the same
        # surface: ts = µs timestamp (session tz is pinned UTC, so the NTZ
        # wall time equals the UTC instant — parity with DuckDB's naive
        # ``epoch(ts)``), ts_ns = epoch nanos as long.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # both ts and ts_ns are only correct with the session tz pinned
        # UTC; enforce it here rather than relying on the caller having
        # gone through configure_for_oracle
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if isinstance(df.schema["ts"].dataType, LongType):  # nanos-as-long
            return df.withColumn("ts_ns", F.col("ts").cast("long")).withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
        ts_utc = F.col("ts").cast("timestamp")
        return df.withColumn("ts_ns", F.unix_micros(ts_utc) * 1000).withColumn(
            "ts", ts_utc
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view so the engine's SQL
    surface (``spark.sql``) works against the corpus directly — the same
    names the DuckDB oracle binds, so a sufficiently portable ANSI query
    string runs VERBATIM on both engines (proven by the
    ``sql_shared_text_query`` gate entry, whose Spark side and oracle are
    one literal)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
