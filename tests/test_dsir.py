"""DSIR importance weights (operators/dsir.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pyrope_spark.operators.dsir import (
    doc_features,
    dsir_log_ratio,
    train_bucket_model,
)


def test_doc_features_counts_occurrences(spark):
    docs = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    # features: unigrams a, b, a + bigrams "a b", "b a" = 5 occurrences
    feats = doc_features(docs, n_buckets=64).collect()
    assert len(feats) == 5


def test_log_ratio_closed_form_single_bucket(spark):
    """One-token docs, n_buckets=1: every feature hashes to bucket 0, so the
    log-ratio collapses to n * [ln(cT+1) - ln(TT+1) - ln(cR+1) + ln(TR+1)]."""
    target = spark.createDataFrame(
        [(1, "x"), (2, "y")], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(i, "z") for i in range(10)], "doc_id long, text string"
    )
    tm = train_bucket_model(target, n_buckets=1)
    rm = train_bucket_model(raw, n_buckets=1)
    doc = spark.createDataFrame([(5, "q q q")], "doc_id long, text string")
    row = dsir_log_ratio(doc, tm, rm, n_buckets=1).collect()[0]
    # doc features: 3 unigrams + 2 bigrams = 5 occurrences, all bucket 0
    per = math.log(2 + 1) - math.log(2 + 1) - math.log(10 + 1) + math.log(10 + 1)
    assert row.n_features == 5
    assert abs(row.log_ratio - round(5 * per, 6)) < 2e-6


def test_target_like_docs_weighted_higher(spark):
    """Docs matching the target distribution must get higher log-ratio than
    raw-typical docs — the resampling property DSIR exists for."""
    target = spark.createDataFrame(
        [(i, "science physics theorem proof") for i in range(20)],
        "doc_id long, text string",
    )
    raw_pool = spark.createDataFrame(
        [(i, "science physics theorem proof") for i in range(20)]
        + [(100 + i, "buy cheap pills now click") for i in range(80)],
        "doc_id long, text string",
    )
    tm = train_bucket_model(target)
    rm = train_bucket_model(raw_pool)
    out = {r.doc_id: r.log_ratio for r in dsir_log_ratio(raw_pool, tm, rm).collect()}
    sci = out[0]
    spam = out[100]
    assert sci > spam
    assert sci > 0 > spam


def test_empty_doc_kept_with_null_ratio(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, None)], "doc_id long, text string"
    )
    tm = train_bucket_model(docs.filter(F.col("doc_id") == 1))
    rm = train_bucket_model(docs)
    out = {r.doc_id: r for r in dsir_log_ratio(docs, tm, rm).collect()}
    assert len(out) == 3
    assert out[2].n_features == 0 and out[2].log_ratio is None
    assert out[3].n_features == 0 and out[3].log_ratio is None
    assert out[1].n_features == 3  # a, b, "a b"


def test_self_fused_empty_target_matches_composition(spark):
    """r11 (r10 ADVICE): when target_pred matches zero docs, the un-fused
    composition's target totals aggregate over an EMPTY counts table (NULL
    t_t) and every log_ratio is NULL — the fused path must reproduce that,
    not emit finite scores from t_t=0."""
    from pyrope_spark.operators.dsir import (
        dsir_log_ratio,
        dsir_log_ratio_self,
        train_bucket_model,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    pred = F.col("doc_id") < 0  # matches nothing
    fused = {
        r.doc_id: r
        for r in dsir_log_ratio_self(docs, target_pred=pred).collect()
    }
    tm = train_bucket_model(docs.filter(pred))
    rm = train_bucket_model(docs)
    comp = {r.doc_id: r for r in dsir_log_ratio(docs, tm, rm).collect()}
    assert set(fused) == set(comp) == {1, 2}
    for d in (1, 2):
        assert fused[d].log_ratio is None and comp[d].log_ratio is None
        assert fused[d].n_features == comp[d].n_features
