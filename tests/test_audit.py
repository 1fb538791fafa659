"""Audit log (operators/audit.py): append/read round-trip, Query filter
semantics (AuditLogger.cs:63-94), retention."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from pyrope_spark.operators.audit import (
    append_audit_events,
    audit_query,
    audit_retention,
    read_audit_log,
)


def _events(spark):
    rows = [
        ("e1", datetime(2026, 1, 1, 10, 0), "t1", "u1", "CREATE_INDEX",
         "Index", "idx1", None, "1.1.1.1", True),
        ("e2", datetime(2026, 1, 1, 11, 0), "t1", "u2", "update_policy",
         "Policy", "p1", None, None, True),
        ("e3", datetime(2026, 1, 1, 12, 0), "t2", "u3", "CREATE_INDEX",
         "Index", "idx2", None, None, False),
        ("e4", datetime(2026, 1, 1, 12, 0), "t1", "u1", "CREATE_INDEX",
         "Index", "idx3", None, None, True),
    ]
    return spark.createDataFrame(
        rows,
        "event_id string, ts timestamp, tenant_id string, user_id string, "
        "action string, resource_type string, resource_id string, "
        "details string, ip_address string, success boolean",
    )


def test_audit_roundtrip_jsonl(spark, tmp_path):
    p = str(tmp_path / "audit")
    append_audit_events(_events(spark), p)
    back = read_audit_log(spark, p)
    assert back.count() == 4
    assert {r["event_id"] for r in back.collect()} == {"e1", "e2", "e3", "e4"}


def test_audit_query_filters_and_order(spark):
    ev = _events(spark)
    # case-insensitive action + tenant filter
    got = [r["event_id"] for r in audit_query(
        ev, tenant_id="t1", action="create_index"
    ).collect()]
    assert got == ["e4", "e1"]  # newest first, e4 (12:00) before e1 (10:00)
    # time range inclusive
    got = [r["event_id"] for r in audit_query(
        ev, ts_from=datetime(2026, 1, 1, 11, 0), ts_to=datetime(2026, 1, 1, 12, 0)
    ).collect()]
    assert got == ["e3", "e4", "e2"]  # ties at 12:00 break by event_id asc
    # limit
    assert audit_query(ev, limit=2).count() == 2


def test_audit_retention(spark):
    ev = _events(spark)
    kept = audit_retention(ev, max_events=2).collect()
    assert [r["event_id"] for r in kept] == ["e3", "e4"]
    kept2 = audit_retention(ev, keep_after=datetime(2026, 1, 1, 11, 30))
    assert {r["event_id"] for r in kept2.collect()} == {"e3", "e4"}
