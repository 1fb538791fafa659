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
