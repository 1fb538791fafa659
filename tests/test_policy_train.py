from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyrope_spark.operators.policy_train import (
    evaluate_policy_simulation,
    policy_training_examples,
    train_policy_model,
)


def _metrics(spark, n=4000):
    """Deterministic synthetic system-metrics table spanning all three
    heuristic thresholds (miss_rate 0..0.49, cpu 0..99.4, latency 0..71.4)."""
    return spark.range(n).select(
        ((F.col("id") % 97) / 9.7).alias("qps"),
        ((F.col("id") % 50) / 100.0).alias("miss_rate"),
        ((F.col("id") % 120) * 0.6).alias("latency"),
        ((F.col("id") % 160) * 0.625).alias("cpu"),
    )


def test_heuristic_label_truth_table(spark):
    """Label 1 iff miss_rate > 0.3 OR cpu > 80 OR latency > 50
    (train_model.py:52-58), boundary values excluded."""
    rows = [
        # (qps, miss, latency, cpu) -> label
        (1.0, 0.0, 10.0, 10.0, 0),
        (1.0, 0.31, 10.0, 10.0, 1),
        (1.0, 0.3, 10.0, 10.0, 0),  # strict >
        (1.0, 0.0, 50.1, 10.0, 1),
        (1.0, 0.0, 50.0, 10.0, 0),
        (1.0, 0.0, 10.0, 80.5, 1),
        (1.0, 0.0, 10.0, 80.0, 0),
        (9.0, 0.9, 99.0, 99.0, 1),
    ]
    df = spark.createDataFrame(
        [r[:4] for r in rows],
        "qps double, miss_rate double, latency double, cpu double",
    )
    got = [r["label"] for r in policy_training_examples(df).collect()]
    assert got == [r[4] for r in rows]


def test_train_heldout_accuracy(spark):
    """The reference-hyperparameter GBDT must recover the heuristic rule on
    held-out data (the label is a deterministic function of the features, as
    in the sidecar's own logs): accuracy >= 0.95."""
    ex = policy_training_examples(_metrics(spark))
    res = train_policy_model(ex)
    assert res.train_rows + res.test_rows == 4000
    assert 0.1 < res.test_rows / 4000 < 0.3  # ~1/5 hash buckets
    assert res.accuracy >= 0.95, res.report
    # report invariants (evaluate_model.py:28-40)
    rep = res.report
    assert rep["tp"] + rep["fn"] == rep["high_load_events"]
    assert rep["tp"] + rep["fp"] == rep["ai_interventions"]


def test_single_class_raises(spark):
    """train_model.py:79-81 skips training on one-class data; here that is
    an explicit error."""
    ex = policy_training_examples(
        spark.range(50).select(
            F.lit(1.0).alias("qps"),
            F.lit(0.0).alias("miss_rate"),
            F.lit(1.0).alias("latency"),
            F.lit(1.0).alias("cpu"),
        )
    )
    with pytest.raises(ValueError, match="single class"):
        train_policy_model(ex)


def test_evaluate_simulation_counterfactual(spark):
    """TP/FN/FP counts and the 'aggressive halves latency under load'
    simulation (evaluate_model.py:42-75) against hand-computed values."""
    rows = [
        # label, prediction, latency
        (1, 1.0, 100.0),  # TP: simulated 50
        (1, 0.0, 80.0),  # FN: stays 80
        (0, 1.0, 20.0),  # FP: stays 20
        (0, 0.0, 10.0),  # TN: stays 10
    ]
    df = spark.createDataFrame(rows, "label int, prediction double, latency double")
    r = evaluate_policy_simulation(df).collect()[0]
    assert (r["total_events"], r["high_load_events"], r["ai_interventions"]) == (4, 2, 2)
    assert (r["tp"], r["fn"], r["fp"]) == (1, 1, 1)
    assert r["baseline_latency_sum"] == 210.0
    assert r["ai_latency_sum"] == 160.0
    assert abs(r["p99_improvement_pct"] - (50.0 / 210.0 * 100)) < 1e-9
