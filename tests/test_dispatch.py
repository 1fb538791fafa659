"""Batch LLM dispatch: coalescing, budget, retry, advice parsing
(operators/dispatch.py — llm_worker.py / llm_dispatcher.py contracts)."""

import pyspark.sql.functions as F
import pytest


def test_coalesce_dispatch_dedups_and_fans_back(spark):
    """Identical prompts issue ONE client call; every requester gets the
    response."""
    from pyrope_spark.operators.dispatch import (
        coalesce_dispatch,
        dispatch_stats,
    )

    calls = []

    def client(p):
        calls.append(p)
        return f"r:{p}"

    reqs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "a")],
        "request_id long, prompt string",
    )
    out = coalesce_dispatch(reqs.coalesce(1), client, max_retries=1).collect()
    assert len(out) == 4
    assert {r["request_id"]: r["response"] for r in out} == {
        1: "r:a", 2: "r:a", 3: "r:b", 4: "r:a"
    }
    assert all(r["status"] == "ok" for r in out)
    stats = dispatch_stats(
        coalesce_dispatch(reqs.coalesce(1), client, max_retries=1)
    ).collect()[0]
    assert stats["requests_total"] == 4
    assert stats["unique_prompts"] == 2
    assert stats["calls_saved"] == 2


def test_coalesce_dispatch_budget_and_retry(spark):
    """Prompts ranked beyond max_calls are budget-dropped without a call;
    a client returning None exhausts max_retries -> 'failed'."""
    from pyrope_spark.operators.dispatch import coalesce_dispatch

    def client(p):
        return None if p == "bad" else f"r:{p}"

    reqs = spark.createDataFrame(
        [(1, "a"), (2, "bad"), (3, "z")], "request_id long, prompt string"
    )
    out = {r["prompt"]: r for r in coalesce_dispatch(
        reqs, client, max_calls=2, max_retries=3
    ).collect()}
    # rank by prompt asc: a(1), bad(2), z(3) -> z over budget
    assert out["a"]["status"] == "ok"
    assert out["bad"]["status"] == "failed" and out["bad"]["response"] is None
    assert out["z"]["status"] == "budget_exceeded"


def test_coalesce_dispatch_null_prompt_surfaced(spark):
    """A NULL-prompt request is routed to status='invalid_prompt' — one
    output row per input request even when the prompt can't join back
    (NULL == NULL is false in the fan-back equi-join), and the client is
    never called with None."""
    from pyrope_spark.operators.dispatch import coalesce_dispatch

    def client(p):
        assert p is not None
        return f"r:{p}"

    reqs = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "request_id long, prompt string"
    )
    out = {r["request_id"]: r for r in coalesce_dispatch(
        reqs, client, max_retries=1
    ).collect()}
    assert len(out) == 3
    assert out[2]["status"] == "invalid_prompt"
    assert out[2]["response"] is None
    assert out[1]["status"] == "ok" and out[3]["status"] == "ok"


def test_parse_prefetch_confidence_gate(spark):
    """Dispatch iff cluster_id present AND confidence strictly > 0.5;
    missing confidence defaults to 0.5 (no dispatch); malformed JSON
    drops (llm_dispatcher.py:33-50)."""
    from pyrope_spark.operators.dispatch import parse_prefetch_predictions

    rows = [
        ("t", "i", '{"prediction": "x", "confidence": 0.8, "cluster_id": 1}'),
        ("t", "i", '{"prediction": "x", "confidence": 0.5, "cluster_id": 2}'),
        ("t", "i", '{"cluster_id": 3}'),          # default 0.5 -> no
        ("t", "i", '{"confidence": 0.9}'),        # no cluster -> no
        ("t", "i", "garbage"),                    # parse error -> dropped
    ]
    df = spark.createDataFrame(
        rows, "tenant_id string, index_name string, response string"
    )
    got = parse_prefetch_predictions(df).collect()
    assert [(r["cluster_id"], r["confidence"]) for r in got] == [(1, 0.8)]


def test_parse_ttl_advice_last_wins(spark):
    """shorten sets TTL, evict sets 0, keep/missing-ttl ignored; the LAST
    advice per (tenant, index, cluster) wins (llm_dispatcher.py:74-105)."""
    from pyrope_spark.operators.dispatch import parse_ttl_advice

    rows = [
        (1, "t", "i", '{"action": "shorten", "ttl_seconds": 30, "cluster_id": 7}'),
        (2, "t", "i", '{"action": "evict", "cluster_id": 7}'),
        (3, "t", "i", '{"action": "keep", "cluster_id": 8}'),
        (4, "t", "i", '{"action": "shorten", "cluster_id": 9}'),  # no ttl
        (5, "t", "i", '{"action": "shorten", "ttl_seconds": 99, "cluster_id": 10}'),
        (6, "t", "i", "garbage"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, tenant_id string, index_name string, response string"
    )
    got = {r["cluster_id"]: r["ttl_s_override"]
           for r in parse_ttl_advice(df, order_col="event_id").collect()}
    assert got == {7: 0, 10: 99}  # evict (later) beats shorten on 7
