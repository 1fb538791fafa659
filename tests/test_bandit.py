"""B11 contextual bandit (reference src/Pyrope.AISidecar/bandit_engine.py)."""

from __future__ import annotations

import numpy as np

from pyrope_spark.operators.bandit import (
    BanditPolicy,
    apply_policy,
    bandit_labels,
    train_bandit,
)


def _log_df(spark, n=2000, seed=11):
    """Synthetic decision log where 'Aggressive' (1) is right when the miss
    rate is high and cpu is low: reward observed per (state, action)."""
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n):
        qps = float(rng.uniform(10, 1000))
        miss = float(rng.uniform(0, 1))
        lat = float(rng.uniform(1, 200))
        cpu = float(rng.uniform(0, 1))
        best = 1 if (miss > 0.5 and cpu < 0.7) else 0
        action = int(rng.integers(0, 2))
        reward = 1.0 if action == best else -1.0
        rows.append((qps, miss, lat, cpu, action, reward))
    return spark.createDataFrame(
        rows,
        "qps double, miss_rate double, latency_p99_ms double, "
        "cpu_utilization double, action int, reward double",
    )


def test_label_reduction(spark):
    """Positive reward reinforces the action; negative trains the opposite
    (reference update():52-76)."""
    df = spark.createDataFrame(
        [(1, 1.0), (1, -1.0), (0, 1.0), (0, -1.0)], "action int, reward double"
    )
    got = [r["_label"] for r in bandit_labels(df).collect()]
    assert got == [1, 0, 0, 1]


def test_train_and_policy_quality(spark):
    log = _log_df(spark)
    policy = train_bandit(log, epsilon=0.0)
    # held-out states: the learned policy should pick the planted action
    rng = np.random.default_rng(99)
    correct = 0
    trials = 200
    for _ in range(trials):
        miss = float(rng.uniform(0, 1))
        cpu = float(rng.uniform(0, 1))
        feats = [float(rng.uniform(10, 1000)), miss, float(rng.uniform(1, 200)), cpu]
        best = 1 if (miss > 0.5 and cpu < 0.7) else 0
        if policy.select(feats, rng) == best:
            correct += 1
    assert correct / trials >= 0.8, correct / trials


def test_epsilon_exploration_rate():
    policy = BanditPolicy(
        coefficients=np.array([0.0, 10.0, 0.0, 0.0]),
        intercept=-5.0,
        feature_cols=["qps", "miss_rate", "latency_p99_ms", "cpu_utilization"],
        epsilon=0.5,
    )
    rng = np.random.default_rng(0)
    feats = [100.0, 0.0, 10.0, 0.5]  # exploit action = 0 (score ~ 0)
    picks = [policy.select(feats, rng) for _ in range(2000)]
    # exploit = 0; any 1s come from the exploration branch (~eps/2 of picks)
    frac_ones = sum(picks) / len(picks)
    assert 0.15 <= frac_ones <= 0.35


def test_apply_policy_batch(spark):
    log = _log_df(spark)
    policy = train_bandit(log, epsilon=0.0)
    metrics = spark.createDataFrame(
        [(100.0, 0.9, 50.0, 0.2), (100.0, 0.1, 50.0, 0.9)],
        "qps double, miss_rate double, latency_p99_ms double, cpu_utilization double",
    )
    rows = apply_policy(metrics, policy).collect()
    by_miss = {round(r["miss_rate"], 1): r["action"] for r in rows}
    assert by_miss[0.9] == 1  # high miss, low cpu -> Aggressive
    assert by_miss[0.1] == 0
