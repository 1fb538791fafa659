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


# ------------------------------------------------------- LLM policy engine

@dataclass(frozen=True)
class SystemMetrics:
    """Metrics snapshot feeding a policy decision (reference
    ``llm_policy_engine.py:24-32``)."""

    qps: float = 0.0
    miss_rate: float = 0.0
    latency_p99_ms: float = 0.0
    cpu_utilization: float = 0.0
    gpu_utilization: float = 0.0


def stub_model_client(response: str | None):
    """A model client for tests/air-gapped runs: ignores the prompt and
    returns a canned response (None = model unavailable)."""

    def client(prompt: str) -> str | None:
        return response

    return client


class LlmPolicyEngine:
    """Model-driven TTL/admission decisions with the heuristic fallback —
    the batch-engine analog of the reference's Gemini policy engine
    (``src/Pyrope.AISidecar/llm_policy_engine.py:34-220``), closing B12.

    The model is a PLUGGABLE callable ``prompt -> str | None`` (inject a
    real API client on a connected cluster; :func:`stub_model_client` or
    ``None`` elsewhere). Faithful pieces of the reference contract:

    - prompt built from the same five metrics;
    - response parsing: first ``{...}`` JSON object anywhere in the text,
      all three fields required, else the decision falls back
      (``_parse_response``, :116-146);
    - clamping to safe ranges: ttl 30..3600 s (int), admission 0..1,
      eviction priority 0..2 (``_validate_and_clamp``, :100-114);
    - decision cache keyed on BUCKETED metrics (qps//10*10, miss_rate
      rounded to 1 dp, latency//10*10, cpu//10*10, gpu//10*10) with a TTL
      (``_get_cache_key``, :148-157);
    - any client failure/timeout/None -> heuristic fallback — the behavior
      the reference serves under its 50 ms budget anyway.

    Documented deviation: the reference fires the model call async and
    returns the heuristic immediately (a serving-loop latency concern);
    the batch engine calls the client inline — per policy refresh, not per
    request — so the async/inflight machinery has no analog here."""

    TTL_MIN_S, TTL_MAX_S = 30, 3600

    def __init__(
        self,
        model_client=None,
        *,
        cache_ttl_s: float = 60.0,
        clock=None,
    ):
        import time as _time

        self._client = model_client
        self._cache_ttl = cache_ttl_s
        self._clock = clock or _time.time
        self._cache: dict[str, tuple[PolicyConfig, float]] = {}

    def build_prompt(self, m: SystemMetrics) -> str:
        return (
            "Cache-policy controller for a vector database. Goals: hold p99 "
            "under 50 ms, maximize hit rate, keep CPU below 80%.\n"
            f"Metrics: qps={m.qps} miss_rate={m.miss_rate} "
            f"p99_ms={m.latency_p99_ms} cpu={m.cpu_utilization}% "
            f"gpu={m.gpu_utilization}%\n"
            'Reply with ONLY one JSON object: {"ttl_seconds": <int 30..3600>, '
            '"admission_threshold": <float 0..1>, "eviction_priority": <int 0..2>, '
            '"reasoning": "<short>"}'
        )

    @classmethod
    def parse_response(cls, response: str | None) -> PolicyConfig | None:
        import json
        import re

        if not response:
            return None
        m = re.search(r"\{[^}]+\}", response)
        if not m:
            return None
        try:
            data = json.loads(m.group())
            if not all(
                k in data
                for k in ("ttl_seconds", "admission_threshold", "eviction_priority")
            ):
                return None
            ttl = max(cls.TTL_MIN_S, min(cls.TTL_MAX_S, int(data["ttl_seconds"])))
            adm = max(0.0, min(1.0, float(data["admission_threshold"])))
            evict = max(0, min(2, int(data["eviction_priority"])))
            return PolicyConfig(True, float(ttl), adm, evict)
        except (json.JSONDecodeError, ValueError, TypeError):
            return None

    @staticmethod
    def cache_key(m: SystemMetrics) -> str:
        return (
            f"{int(m.qps / 10) * 10}:{round(m.miss_rate, 1)}:"
            f"{int(m.latency_p99_ms / 10) * 10}:"
            f"{int(m.cpu_utilization / 10) * 10}:"
            f"{int(m.gpu_utilization / 10) * 10}"
        )

    def compute_policy(self, metrics: SystemMetrics) -> PolicyConfig:
        key = self.cache_key(metrics)
        hit = self._cache.get(key)
        if hit is not None:
            config, ts = hit
            if self._clock() - ts < self._cache_ttl:
                # re-insert so dict order tracks recency: the size-bound
                # eviction below pops oldest-inserted, which without this
                # would evict hot long-lived buckets before cold new ones
                del self._cache[key]
                self._cache[key] = (config, ts)
                return config
            del self._cache[key]
        if self._client is not None:
            try:
                parsed = self.parse_response(self._client(self.build_prompt(metrics)))
            except Exception:
                parsed = None
            if parsed is not None:
                # bound the bucket cache: expired entries are swept (not
                # only on re-hit) and drifting metrics can't grow the
                # bucket space without limit in an always-on refresh loop
                now = self._clock()
                if len(self._cache) >= 1024:
                    self._cache = {
                        k: v
                        for k, v in self._cache.items()
                        if now - v[1] < self._cache_ttl
                    }
                    while len(self._cache) >= 1024:
                        self._cache.pop(next(iter(self._cache)))
                self._cache[key] = (parsed, now)
                return parsed
        return heuristic_policy(metrics.miss_rate)
