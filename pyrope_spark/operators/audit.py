"""Audit-event log: append, filtered query, retention.

Reference parity: ``Services/AuditLogger.cs`` + ``Model/AuditEvent.cs`` —
management operations append (event_id, ts, tenant, user, action,
resource_type, resource_id, details, ip, success) events to an in-memory
ring with JSONL persistence; ``Query`` filters by tenant (ordinal), time
range (inclusive), action (case-INSENSITIVE), returns reverse-chronological
top ``limit`` (AuditLogger.cs:63-94); retention trims to the newest
``maxInMemoryEvents`` (AuditLogger.cs:40-55).

Batch shape: the log is an append-only JSONL/parquet table (audit tables
must be greppable by ops tooling — JSONL, like the reference's file sink);
the filtered query lowers to ``ORDER BY ts DESC LIMIT k`` =
``TakeOrderedAndProject`` (no global sort at 100 TB: per-partition heads
only); retention is one timestamp-threshold filter rewrite, run as a
scheduled job instead of inline trimming.

Documented deviation: the reference's reverse-chronological order is
stable on arrival order for equal timestamps; a distributed log has no
arrival order, so ties break deterministically by ``event_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

AUDIT_SCHEMA = (
    "event_id string, ts timestamp, tenant_id string, user_id string, "
    "action string, resource_type string, resource_id string, "
    "details string, ip_address string, success boolean"
)


def append_audit_events(events: DataFrame, path: str) -> None:
    """Append to the JSONL audit log (one object per line, ISO timestamps —
    the reference's PersistToFile format)."""
    events.write.mode("append").json(path)


def read_audit_log(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(AUDIT_SCHEMA).json(path)


def audit_query(
    events: DataFrame,
    *,
    tenant_id: str | None = None,
    ts_from=None,
    ts_to=None,
    action: str | None = None,
    limit: int = 100,
) -> DataFrame:
    """Reference Query semantics: optional tenant (exact), inclusive time
    bounds, case-insensitive action, newest-first top ``limit`` (ties by
    event_id asc — see the module deviation note)."""
    out = events
    if tenant_id is not None:
        out = out.filter(F.col("tenant_id") == tenant_id)
    if ts_from is not None:
        out = out.filter(F.col("ts") >= F.lit(ts_from))
    if ts_to is not None:
        out = out.filter(F.col("ts") <= F.lit(ts_to))
    if action is not None:
        out = out.filter(F.lower(F.col("action")) == action.lower())
    return out.orderBy(F.desc("ts"), F.asc("event_id")).limit(limit)


def audit_retention(
    events: DataFrame,
    *,
    max_events: int | None = None,
    keep_after=None,
) -> DataFrame:
    """The batch retention job: keep rows newer than ``keep_after`` and/or
    the newest ``max_events`` (reference trim semantics over a durable
    table). Returns the retained view; the caller tmp+swap-rewrites the
    log with it."""
    out = events
    if keep_after is not None:
        out = out.filter(F.col("ts") >= F.lit(keep_after))
    if max_events is not None:
        out = out.orderBy(F.desc("ts"), F.asc("event_id")).limit(max_events)
    return out
