"""Offline policy-model training pipeline (B12's batch companion).

The reference's AI sidecar trains a GradientBoostingClassifier over query
logs with heuristic labels and ships it as the serving policy model
(``src/Pyrope.AISidecar/train_model.py:20-80``: features qps / miss_rate /
latency / cpu; label 1 "Aggressive" iff miss_rate > 0.3 OR cpu > 80 OR
latency p99 > 50 ms; GBDT n_estimators=100, learning_rate=0.1, max_depth=3,
seed=42, 80/20 split), evaluates it with an intervention report and a
latency simulation (``evaluate_model.py:15-75``), and hands the artifact to
``model_manager.py`` for staged rollout.

This module is the Spark-shaped analog — the most Spark-native job in the
whole sidecar:

- :func:`system_metrics_windows` turns a raw request/event log into the
  per-window system-metrics table the sidecar logs natively (the reference
  consumes pre-aggregated ``system_metrics`` JSONL; an engine ingesting raw
  logs at 100 TB derives them — one hash shuffle on the window key).
- :func:`policy_training_examples` applies the reference's heuristic
  labeling as a pure column expression (``train_model.py:52-58``) —
  SQL-replicable, oracle-checked by the ``policy_training_labels`` driver
  query.
- :func:`train_policy_model` fits MLlib's ``GBTClassifier`` with the
  reference's hyperparameters on a deterministic hash split (layout-stable,
  unlike ``randomSplit``) and returns the model + the held-out evaluation
  report.
- :func:`evaluate_policy_simulation` is ``evaluate_simulation``'s
  intervention/latency report as a one-row aggregate (TP / FN / FP, the
  "aggressive halves latency under load" counterfactual, improvement %).

ONNX export is serving-layer plumbing and out of scope; the MLlib model
writes/loads with its own persistence (``model.write().save(path)``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: feature order fed to the classifier (train_model.py:73)
FEATURES = ("qps", "miss_rate", "latency", "cpu")

#: per-query features from FeatureEngineer (feature_engineering.py:34-51):
#: QueryFeatures(norm, top_k, filter_type) + HistoryFeatures(hit_rate,
#: revisit_interval_ms) — appended to FEATURES for the extended GBDT vector
QUERY_FEATURES = ("norm", "top_k", "filter_type", "hit_rate", "revisit_interval_ms")

#: filter-type encoding map (feature_engineering.py:9-15); anything not in
#: the map encodes as the 'unknown' sentinel -1.0
FILTER_TYPE_ENCODING = {
    "none": 0.0,
    "tag": 1.0,
    "numeric": 2.0,
    "hybrid": 3.0,
    "unknown": -1.0,
}

#: heuristic thresholds (train_model.py:52-58)
MISS_RATE_THRESHOLD = 0.3
CPU_THRESHOLD = 80.0
LATENCY_P99_THRESHOLD_MS = 50.0


def heuristic_label_expr(
    miss_rate: F.Column, cpu: F.Column, latency: F.Column
) -> F.Column:
    """Label 1 (Aggressive) iff miss_rate > 0.3 OR cpu > 80 OR p99 > 50 ms
    (train_model.py:52-58) — a pure expression, so labeling a 100 TB log is
    a map-only pass."""
    return (
        (miss_rate > MISS_RATE_THRESHOLD)
        | (cpu > CPU_THRESHOLD)
        | (latency > LATENCY_P99_THRESHOLD_MS)
    ).cast("int")


def infer_filter_type_expr(
    tags_col: F.Column | None, numeric_filters_col: F.Column | None
) -> F.Column:
    """``infer_filter_type`` (feature_engineering.py:22-31) as a column
    expression: python ``bool(x)`` truthiness on a sequence/mapping is
    "not NULL and not empty", so both predicates are null-safe size
    checks. Returns the string type; encode with
    :func:`encode_filter_type_expr`."""
    has_tags = (
        F.lit(False) if tags_col is None
        else tags_col.isNotNull() & (F.size(tags_col) > 0)
    )
    has_numeric = (
        F.lit(False) if numeric_filters_col is None
        else numeric_filters_col.isNotNull() & (F.size(numeric_filters_col) > 0)
    )
    return (
        F.when(has_tags & has_numeric, F.lit("hybrid"))
        .when(has_tags, F.lit("tag"))
        .when(has_numeric, F.lit("numeric"))
        .otherwise(F.lit("none"))
    )


def encode_filter_type_expr(filter_type: F.Column) -> F.Column:
    """FILTER_TYPE_ENCODING lookup with the 'unknown' -1.0 fallback
    (feature_engineering.py:102: ``.get(filter_type, encoding['unknown'])``)."""
    expr = None
    for name, code in FILTER_TYPE_ENCODING.items():
        branch = F.when(filter_type == name, F.lit(code))
        expr = branch if expr is None else expr.when(filter_type == name, F.lit(code))
    return expr.otherwise(F.lit(FILTER_TYPE_ENCODING["unknown"]))


def query_feature_columns(
    queries: DataFrame,
    *,
    vector_col: str = "vector",
    top_k_col: str = "top_k",
    tags_col: str | None = None,
    numeric_filters_col: str | None = None,
    filter_type_col: str | None = None,
) -> DataFrame:
    """``FeatureEngineer.extract_query_features``
    (feature_engineering.py:93-103) as three appended columns:

    - ``norm``: L2 norm of the query vector — a sequential left fold of
      the squares (``F.aggregate``), then ``sqrt`` (exact-rounded per
      IEEE-754, so bit-stable across engines); NULL/empty vector -> 0.0
      (python ``if vector:`` falsiness).
    - ``top_k``: the requested k as double.
    - ``filter_type``: encoded filter type — from ``filter_type_col``
      when the log already carries the string, else inferred from
      ``tags_col``/``numeric_filters_col`` via
      :func:`infer_filter_type_expr`.

    Pure column expressions — featurizing a 100 TB query log is a
    map-only pass, no shuffle."""
    ft = (
        F.col(filter_type_col)
        if filter_type_col is not None
        else infer_filter_type_expr(
            F.col(tags_col) if tags_col else None,
            F.col(numeric_filters_col) if numeric_filters_col else None,
        )
    )
    vec = F.col(vector_col)
    norm = F.when(
        vec.isNotNull() & (F.size(vec) > 0),
        F.sqrt(
            F.aggregate(
                F.transform(vec, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
    ).otherwise(F.lit(0.0))
    keep = [c for c in queries.columns if c not in ("norm", "top_k", "filter_type")]
    return queries.select(
        *keep,
        norm.alias("norm"),
        F.col(top_k_col).cast("double").alias("top_k"),
        encode_filter_type_expr(ft).alias("filter_type"),
    )


def query_history_features(
    log: DataFrame,
    *,
    query_id_col: str = "query_id",
    hit_col: str = "hit",
    ts_col: str = "ts",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``QueryHistory.features`` (feature_engineering.py:60-86) as a
    window over the query log: for every query event, the history state
    the sidecar would have served it with — i.e. over STRICTLY PRIOR
    events of the same query key (the serving loop calls ``features()``
    before ``record()``):

    - ``hit_rate``: prior hits / prior total; 0.0 with no history.
    - ``revisit_interval_ms``: ms since the key was last seen
      (``max(0, now - last_seen)``); the -1.0 NO-HISTORY SENTINEL when
      the key has never been seen (feature_engineering.py:83).

    One hash shuffle on the query key + one sort — O(1) running state
    per row. Deviation from the reference: no 10,000-entry LRU eviction
    (``QueryHistory._max_entries``, feature_engineering.py:61-77) — that
    bound is single-node dict capacity, not semantics; the distributed
    window keeps exact per-key history at any cardinality."""
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols]
    w = (
        Window.partitionBy(query_id_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior_total = F.count(F.lit(1)).over(w)
    prior_hits = F.sum(F.col(hit_col).cast("long")).over(w)
    last_seen = F.lag(F.unix_micros(F.col(ts_col).cast("timestamp"))).over(
        Window.partitionBy(query_id_col).orderBy(*order)
    )
    now_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return log.select(
        "*",
        F.when(
            prior_total > 0,
            prior_hits.cast("double") / prior_total.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("hit_rate"),
        # integer clamp first, ONE double divide last (identical IEEE op
        # sequence in the DuckDB oracle — the repo's deferred-division rule)
        F.when(
            last_seen.isNotNull(),
            F.greatest(now_us - last_seen, F.lit(0).cast("bigint"))
            .cast("double") / F.lit(1000.0),
        )
        .otherwise(F.lit(-1.0))
        .alias("revisit_interval_ms"),
    )


def system_metrics_windows(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    miss_expr: F.Column | None = None,
    window_secs: int = 3600,
    p99_scale: float = 1.0,
    cpu_scale: float = 1.0,
) -> DataFrame:
    """Per-window system metrics from a raw event log:
    (win, qps, miss_rate, latency, cpu).

    - ``qps``: rows / window_secs
    - ``miss_rate``: fraction of rows where ``miss_expr`` holds
    - ``latency``: nearest-rank p99 of ``value_col`` x ``p99_scale``
    - ``cpu``: avg(``value_col``) x ``cpu_scale`` (a load proxy when the log
      has no host gauge; pass scaled real gauges in production)

    Scale shape: the rank analytic and the groupBy share the same window
    key, so the whole derivation is ONE hash shuffle on ``win`` — no
    driver state, layout-independent."""
    if miss_expr is None:
        miss_expr = F.lit(False)
    win = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / window_secs) * window_secs
    ).cast("long")
    w = Window.partitionBy("win").orderBy(value_col)
    wn = Window.partitionBy("win")
    r = (
        events.withColumn("win", win)
        .withColumn("_miss", miss_expr.cast("int"))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
    )
    p99_at = F.ceil(0.99 * F.col("_n")).cast("long")
    return r.groupBy("win").agg(
        (F.count(F.lit(1)) / F.lit(float(window_secs))).alias("qps"),
        (F.sum("_miss") / F.count(F.lit(1))).alias("miss_rate"),
        (
            F.max(F.when(F.col("_rn") == p99_at, F.col(value_col)))
            * F.lit(float(p99_scale))
        ).alias("latency"),
        (F.avg(value_col) * F.lit(float(cpu_scale))).alias("cpu"),
    )


def policy_training_examples(
    metrics: DataFrame,
    *,
    qps_col: str = "qps",
    miss_rate_col: str = "miss_rate",
    latency_col: str = "latency",
    cpu_col: str = "cpu",
) -> DataFrame:
    """Feature + label columns from a system-metrics table
    (``extract_features_and_labels``, train_model.py:36-63): selects the
    four features under their canonical names and appends the heuristic
    ``label``."""
    return metrics.select(
        "*",
        heuristic_label_expr(
            F.col(miss_rate_col), F.col(cpu_col), F.col(latency_col)
        ).alias("label"),
    )


def evaluate_policy_simulation(
    scored: DataFrame,
    *,
    label_col: str = "label",
    pred_col: str = "prediction",
    latency_col: str = "latency",
) -> DataFrame:
    """``evaluate_simulation``'s report (evaluate_model.py:15-75) as a
    one-row aggregate: intervention counts (TP / FN / FP), and the latency
    counterfactual — an aggressive policy halves latency during high load
    (label=1 AND pred=1 -> latency x 0.5), every other cell unchanged."""
    lab = F.col(label_col)
    pred = F.col(pred_col).cast("int")
    lat = F.col(latency_col)
    sim = F.when((lab == 1) & (pred == 1), lat * 0.5).otherwise(lat)
    base_sum = F.sum(lat)
    sim_sum = F.sum(sim)
    return scored.agg(
        F.count(F.lit(1)).alias("total_events"),
        F.sum(lab).cast("long").alias("high_load_events"),
        F.sum(pred).cast("long").alias("ai_interventions"),
        F.sum(((pred == 1) & (lab == 1)).cast("int")).cast("long").alias("tp"),
        F.sum(((pred == 0) & (lab == 1)).cast("int")).cast("long").alias("fn"),
        F.sum(((pred == 1) & (lab == 0)).cast("int")).cast("long").alias("fp"),
        F.sum((pred == lab.cast("int")).cast("int")).cast("long").alias("correct"),
        base_sum.alias("baseline_latency_sum"),
        sim_sum.alias("ai_latency_sum"),
        F.when(base_sum > 0, (base_sum - sim_sum) / base_sum * 100.0)
        .otherwise(F.lit(0.0))
        .alias("p99_improvement_pct"),
    )


@dataclass
class PolicyTrainResult:
    model: object  # GBTClassificationModel
    report: dict  # held-out evaluation report row (evaluate_simulation)
    accuracy: float
    train_rows: int
    test_rows: int


def train_policy_model(
    examples: DataFrame,
    *,
    features: tuple[str, ...] = FEATURES,
    label_col: str = "label",
    n_buckets: int = 5,
    test_bucket: int = 0,
    max_iter: int = 100,
    step_size: float = 0.1,
    max_depth: int = 3,
    seed: int = 42,
) -> PolicyTrainResult:
    """Train the policy GBDT and evaluate on a held-out split.

    Mirrors ``train_and_export`` (train_model.py:66-95): same features,
    same hyperparameters (100 trees, lr 0.1, depth 3, seed 42), 1/n_buckets
    held out (default 20%). The split hashes the feature tuple instead of
    calling ``train_test_split`` — deterministic AND partition-layout
    independent, which a resumable cluster job needs (``randomSplit``
    changes membership when the input layout changes).

    Raises ``ValueError`` when the labeled data has a single class (the
    reference skips training, train_model.py:79-81).
    """
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.feature import VectorAssembler

    n_classes = examples.select(label_col).distinct().count()
    if n_classes < 2:
        raise ValueError("training data contains a single class; not training")
    bucket = F.pmod(
        F.xxhash64(*[F.col(c) for c in features], F.lit(seed)), F.lit(n_buckets)
    )
    tagged = examples.withColumn("_test", bucket == test_bucket)
    asm = VectorAssembler(
        inputCols=list(features), outputCol="features", handleInvalid="skip"
    )
    train = asm.transform(tagged.filter(~F.col("_test")))
    test = asm.transform(tagged.filter(F.col("_test")))
    clf = GBTClassifier(
        labelCol=label_col,
        featuresCol="features",
        maxIter=max_iter,
        stepSize=step_size,
        maxDepth=max_depth,
        seed=seed,
    )
    model = clf.fit(train)
    scored = model.transform(test)
    rep = evaluate_policy_simulation(scored, label_col=label_col).collect()[0]
    report = rep.asDict()
    total = report["total_events"]
    acc = report["correct"] / total if total else 0.0
    return PolicyTrainResult(
        model=model,
        report=report,
        accuracy=acc,
        train_rows=train.count(),
        test_rows=total,
    )
