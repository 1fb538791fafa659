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

def test_filter_type_encoding_map(spark):
    """infer_filter_type truth table (feature_engineering.py:22-31) +
    encoding map incl. the 'unknown' -1.0 fallback
    (feature_engineering.py:9-15,102)."""
    from pyrope_spark.operators.policy_train import (
        encode_filter_type_expr,
        query_feature_columns,
    )

    rows = [
        (1, ["a"], {"x": 1.0}, 3.0),   # hybrid
        (2, ["a"], None, 1.0),         # tag
        (3, None, {"x": 1.0}, 2.0),    # numeric
        (4, None, None, 0.0),          # none
        (5, [], {}, 0.0),              # empty == falsy (python bool())
    ]
    df = spark.createDataFrame(
        [(i, t, nf, 10) for i, t, nf, _ in rows],
        "id long, tags array<string>, nf map<string,double>, top_k int",
    ).withColumn("vector", F.array(F.lit(3.0), F.lit(4.0)))
    out = {
        r["id"]: r
        for r in query_feature_columns(
            df, vector_col="vector", top_k_col="top_k",
            tags_col="tags", numeric_filters_col="nf",
        ).collect()
    }
    for i, _, _, want in rows:
        assert out[i]["filter_type"] == want, (i, out[i]["filter_type"])
    assert out[1]["norm"] == 5.0  # sqrt(9+16)
    assert out[1]["top_k"] == 10.0
    # unknown string -> -1.0
    enc = spark.createDataFrame([("weird",)], "ft string").select(
        encode_filter_type_expr(F.col("ft")).alias("e")
    ).collect()[0]["e"]
    assert enc == -1.0


def test_query_history_strictly_prior(spark):
    """HistoryFeatures over strictly prior events: first sight of a key ->
    (0.0 hit_rate, -1.0 sentinel); later sights -> prior hits/total and ms
    since last seen (feature_engineering.py:60-86)."""
    from pyrope_spark.operators.policy_train import query_history_features

    rows = [
        ("q1", "2024-01-01 00:00:00", True, 1),
        ("q1", "2024-01-01 00:00:02", False, 2),
        ("q1", "2024-01-01 00:00:05", True, 3),
        ("q2", "2024-01-01 00:00:04", False, 4),
    ]
    df = spark.createDataFrame(
        rows, "query_id string, ts string, hit boolean, seq long"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["seq"]: r
        for r in query_history_features(
            df, query_id_col="query_id", hit_col="hit",
            ts_col="ts", tiebreak_cols=("seq",),
        ).collect()
    }
    assert (out[1]["hit_rate"], out[1]["revisit_interval_ms"]) == (0.0, -1.0)
    assert (out[2]["hit_rate"], out[2]["revisit_interval_ms"]) == (1.0, 2000.0)
    assert (out[3]["hit_rate"], out[3]["revisit_interval_ms"]) == (0.5, 3000.0)
    assert (out[4]["hit_rate"], out[4]["revisit_interval_ms"]) == (0.0, -1.0)


def test_gbdt_consumes_extended_feature_vector(spark):
    """The policy GBDT trains on FEATURES + QUERY_FEATURES (the
    FeatureEngineer extension): a label partially driven by the query
    features is recovered with high held-out accuracy — proof the extended
    vector actually reaches the model."""
    from pyrope_spark.operators.policy_train import (
        FEATURES,
        QUERY_FEATURES,
        train_policy_model,
    )

    ex = spark.range(4000).select(
        ((F.col("id") % 97) / 9.7).alias("qps"),
        ((F.col("id") % 50) / 100.0).alias("miss_rate"),
        ((F.col("id") % 120) * 0.6).alias("latency"),
        ((F.col("id") % 160) * 0.625).alias("cpu"),
        ((F.col("id") % 23) / 2.0).alias("norm"),
        ((F.col("id") % 4 + 1) * 10.0).alias("top_k"),
        (F.col("id") % 5 - 1).cast("double").alias("filter_type"),
        ((F.col("id") % 11) / 10.0).alias("hit_rate"),
        ((F.col("id") % 7) * 500.0 - 1.0).alias("revisit_interval_ms"),
    ).withColumn(
        # label depends on BOTH a system feature and two query features
        "label",
        ((F.col("miss_rate") > 0.3)
         | ((F.col("norm") > 8.0) & (F.col("hit_rate") < 0.3))).cast("int"),
    )
    res = train_policy_model(ex, features=FEATURES + QUERY_FEATURES)
    assert res.accuracy >= 0.93, res.report
