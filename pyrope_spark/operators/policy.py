"""Cache policy engines (B12) as config producers for the result cache.

Reference:
- static: always cache with the configured TTL
  (``Policies/StaticPolicyEngine.cs:6-35``);
- dynamic: TTL updated from a config store
  (``Policies/DynamicPolicyEngine.cs:6-47``);
- heuristic: miss_rate > 0.5 -> aggressive (ttl 300 s, admission 0.05,
  eviction priority 1), else default (ttl 60 s, admission 0.1, priority 0)
  (``src/Pyrope.AISidecar/policy_engine.py:12-25``);
- the LLM policy engine (Gemini JSON with 50 ms budget + fallback) is an
  external-service concern — out of the batch engine, its *fallback* IS the
  heuristic below, which is what the reference serves on timeout anyway.

In the batch engine a policy is just the (should_cache, ttl_s,
admission_threshold) passed to ``ResultCacheTable.write_back``; the
heuristic's miss_rate input comes from ``SearchStats`` or the usage-metering
job, closing the metrics -> policy loop the sidecar implements over gRPC.
"""

from __future__ import annotations

from dataclasses import dataclass

DEFAULT_POLICY_TTL_S = 60.0
AGGRESSIVE_TTL_S = 300.0
MISS_RATE_AGGRESSIVE = 0.5


@dataclass(frozen=True)
class PolicyConfig:
    should_cache: bool
    ttl_s: float
    admission_threshold: float
    eviction_priority: int


DEFAULT_POLICY = PolicyConfig(True, DEFAULT_POLICY_TTL_S, 0.1, 0)
AGGRESSIVE_POLICY = PolicyConfig(True, AGGRESSIVE_TTL_S, 0.05, 1)


def static_policy(ttl_s: float = DEFAULT_POLICY_TTL_S) -> PolicyConfig:
    """Always cache with the given TTL (StaticPolicyEngine.Evaluate)."""
    return PolicyConfig(True, ttl_s, 0.1, 0)


def heuristic_policy(miss_rate: float) -> PolicyConfig:
    """miss_rate > 0.5 -> aggressive, else default
    (policy_engine.py:19-25)."""
    return AGGRESSIVE_POLICY if miss_rate > MISS_RATE_AGGRESSIVE else DEFAULT_POLICY


def miss_rate_from_stats(hits_by_tier: dict, misses: int) -> float:
    total = misses + sum(hits_by_tier.values())
    return (misses / total) if total else 0.0
