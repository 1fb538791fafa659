from __future__ import annotations

from pyrope_spark.operators.policy import (
    AGGRESSIVE_POLICY,
    DEFAULT_POLICY,
    heuristic_policy,
    miss_rate_from_stats,
    static_policy,
)


def test_static_policy_always_caches():
    p = static_policy(45.0)
    assert p.should_cache and p.ttl_s == 45.0


def test_heuristic_policy_thresholds():
    """policy_engine.py:19-25: miss_rate > 0.5 -> aggressive (300s/0.05/1),
    else default (60s/0.1/0); boundary 0.5 stays default."""
    assert heuristic_policy(0.0) == DEFAULT_POLICY
    assert heuristic_policy(0.5) == DEFAULT_POLICY
    assert heuristic_policy(0.51) == AGGRESSIVE_POLICY
    assert AGGRESSIVE_POLICY.ttl_s == 300.0
    assert AGGRESSIVE_POLICY.admission_threshold == 0.05
    assert AGGRESSIVE_POLICY.eviction_priority == 1


def test_miss_rate_from_stats():
    assert miss_rate_from_stats({"L0": 3, "L1": 1}, 4) == 0.5
    assert miss_rate_from_stats({}, 0) == 0.0


def test_llm_policy_engine_parse_clamp_cache_fallback():
    """B12 closure: the model-driven engine with a stubbed client — JSON
    extraction from surrounding text, range clamping, bucketed decision
    cache with TTL, and heuristic fallback on failure/absence (reference
    llm_policy_engine.py:100-220 contract)."""
    from pyrope_spark.operators.policy import (
        AGGRESSIVE_POLICY,
        DEFAULT_POLICY,
        LlmPolicyEngine,
        SystemMetrics,
        stub_model_client,
    )

    good = ('Sure! Here you go: {"ttl_seconds": 120, "admission_threshold": 0.2, '
            '"eviction_priority": 1, "reasoning": "ok"} hope that helps')
    now = [1000.0]
    eng = LlmPolicyEngine(stub_model_client(good), cache_ttl_s=60, clock=lambda: now[0])
    m = SystemMetrics(qps=42.0, miss_rate=0.3, latency_p99_ms=12.0, cpu_utilization=55.0)
    cfg = eng.compute_policy(m)
    assert (cfg.ttl_s, cfg.admission_threshold, cfg.eviction_priority) == (120.0, 0.2, 1)
    assert cfg.should_cache

    # clamping: out-of-range values pulled into 30..3600 / 0..1 / 0..2
    wild = '{"ttl_seconds": 99999, "admission_threshold": -3, "eviction_priority": 9}'
    clamped = LlmPolicyEngine.parse_response(wild)
    assert (clamped.ttl_s, clamped.admission_threshold, clamped.eviction_priority) == (3600.0, 0.0, 2)

    # bucketed cache: nearby metrics share a key; TTL expiry refreshes
    m2 = SystemMetrics(qps=44.0, miss_rate=0.31, latency_p99_ms=17.0, cpu_utilization=51.0)
    assert LlmPolicyEngine.cache_key(m) == LlmPolicyEngine.cache_key(m2)
    eng._client = stub_model_client(None)     # model goes away
    assert eng.compute_policy(m2) == cfg      # served from cache
    now[0] += 61
    assert eng.compute_policy(m2) == DEFAULT_POLICY  # expired -> fallback

    # failures fall back to the heuristic (aggressive above 0.5 miss rate)
    hot = SystemMetrics(miss_rate=0.9)
    assert LlmPolicyEngine(None).compute_policy(hot) == AGGRESSIVE_POLICY
    assert LlmPolicyEngine(stub_model_client("no json here")).compute_policy(hot) == AGGRESSIVE_POLICY
    assert LlmPolicyEngine(stub_model_client('{"ttl_seconds": 10}')).compute_policy(hot) == AGGRESSIVE_POLICY

    def boom(prompt):
        raise TimeoutError("model timeout")

    assert LlmPolicyEngine(boom).compute_policy(hot) == AGGRESSIVE_POLICY


# ------------------------------------------------- dynamic policy store

def test_policy_store_crud_and_defaults(spark, tmp_path):
    """PolicyConfigStore: upsert replaces whole rows with a version bump,
    delete removes keys, get() falls back to the reference defaults
    (CachePolicyConfig.cs: enable=true ttl=60) for missing keys, and a
    disabled or ttl<=0 row evaluates to NoCache
    (DynamicPolicyEngine.cs:17-27)."""
    from pyrope_spark.operators.policy_store import (
        CONFIG_SCHEMA,
        PolicyConfigStore,
    )

    store = PolicyConfigStore(spark, str(tmp_path / "policy"))
    assert store.current().count() == 0
    # missing key -> reference defaults
    d = store.get("t0", "idx")
    assert d.should_cache and d.ttl_s == 60.0 and d.admission_threshold == 0.1

    store.upsert(spark.createDataFrame(
        [("t0", "idx", True, 120, 0.2, 1, 0),
         ("t1", "idx", False, 120, 0.2, 1, 0),
         ("t2", "idx", True, 0, 0.2, 1, 0)],
        CONFIG_SCHEMA,
    ))
    assert store.get("t0", "idx").ttl_s == 120.0
    assert not store.get("t1", "idx").should_cache  # disabled -> NoCache
    assert not store.get("t2", "idx").should_cache  # ttl<=0 -> NoCache

    # whole-row replace + version bump (UpdatePolicy semantics)
    store.upsert(spark.createDataFrame(
        [("t0", "idx", True, 300, 0.05, 2, 0)], CONFIG_SCHEMA
    ))
    rows = {(r["tenant_id"], r["index_name"]): r
            for r in store.current().collect()}
    assert rows[("t0", "idx")]["ttl_s"] == 300
    assert rows[("t0", "idx")]["version"] > rows[("t1", "idx")]["version"]

    store.delete(spark.createDataFrame([("t1", "idx")],
                                       "tenant_id string, index_name string"))
    assert ("t1", "idx") not in {
        (r["tenant_id"], r["index_name"]) for r in store.current().collect()
    }
    # deleted key -> defaults again
    assert store.get("t1", "idx").ttl_s == 60.0


def test_policy_store_feeds_write_back(spark, tmp_path):
    """The config-store lookup drives write_back's TTL — the
    DynamicPolicyEngine -> cache wiring."""
    from pyrope_spark.operators.cache import ResultCacheTable
    from pyrope_spark.operators.policy_store import (
        CONFIG_SCHEMA,
        PolicyConfigStore,
    )

    store = PolicyConfigStore(spark, str(tmp_path / "policy"))
    store.upsert(spark.createDataFrame(
        [("t", "i", True, 300, 0.05, 1, 0)], CONFIG_SCHEMA
    ))
    cfg = store.get("t", "i")
    cache = ResultCacheTable(spark, str(tmp_path / "cache"))
    results = spark.createDataFrame(
        [(11, 22, 10, 1, "r")],
        "key_hash long, simhash long, round_k int, cluster_id int, "
        "result string",
    )
    assert cfg.should_cache
    cache.write_back(results, epoch=1, ttl_s=cfg.ttl_s)
    row = spark.read.parquet(str(tmp_path / "cache")).collect()[0]
    assert row["ttl_s"] == 300.0


def test_evaluate_policy_decisions_broadcast_no_request_shuffle(spark):
    """The decision join broadcasts the config side (the request stream
    must not shuffle for a KB-scale dim)."""
    from pyrope_spark.operators.policy_store import (
        CONFIG_SCHEMA,
        evaluate_policy_decisions,
    )

    cfg = spark.createDataFrame([("t", "i", True, 120, 0.1, 0, 1)],
                                CONFIG_SCHEMA)
    keys = spark.createDataFrame(
        [(f"t{i % 3}", "i") for i in range(100)],
        "tenant_id string, index_name string",
    )
    out = evaluate_policy_decisions(cfg, keys)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == 3
