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
