"""fastText-style quality classifier (operators/quality_model.py):
held-out accuracy, score ordering, determinism of the split, guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyrope_spark.operators.quality_model import (
    reference_vs_crawl_labels,
    score_quality_model,
    train_quality_classifier,
)

_VOCAB = (
    "the of and to in a is that for with as on by at from this it are was "
    "be or an which you not have has had one all we they their more will"
).split()


def _good_text(r: np.random.Generator) -> str:
    n = int(r.integers(20, 40))
    return " ".join(r.choice(_VOCAB, size=n))


def _junk_text(r: np.random.Generator) -> str:
    n = int(r.integers(20, 40))
    chars = "abcdefghijklmnopqrstuvwxyz0123456789"
    return " ".join(
        "".join(r.choice(list(chars), size=int(r.integers(3, 12))))
        for _ in range(n)
    )


@pytest.fixture(scope="module")
def labeled(spark):
    r = np.random.default_rng(7)
    rows = [(i, _good_text(r), 1) for i in range(250)]
    rows += [(1000 + i, _junk_text(r), 0) for i in range(250)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, label int"
    ).cache()


def test_quality_classifier_heldout_accuracy(spark, labeled):
    res = train_quality_classifier(labeled)
    assert res.test_rows > 0
    assert res.train_rows + res.test_rows == 500
    assert res.accuracy >= 0.9, res.accuracy


def test_quality_scores_separate_classes(spark, labeled):
    res = train_quality_classifier(labeled)
    scored = score_quality_model(res, labeled.select("doc_id", "text"))
    joined = scored.join(labeled.select("doc_id", "label"), "doc_id")
    means = {
        r["label"]: r["m"]
        for r in joined.groupBy("label").agg(F.avg("quality_prob").alias("m")).collect()
    }
    assert means[1] > 0.8 > 0.2 > means[0]


def test_quality_single_class_raises(spark, labeled):
    with pytest.raises(ValueError, match="single class"):
        train_quality_classifier(labeled.filter(F.col("label") == 1))


def test_reference_vs_crawl_labels(spark):
    ref = spark.createDataFrame([(1, "good text")], "doc_id long, text string")
    crawl = spark.createDataFrame([(1, "junk")], "doc_id long, text string")
    lab = reference_vs_crawl_labels(ref, crawl).collect()
    assert sorted((r["doc_id"], r["label"]) for r in lab) == [
        ("crawl:1", 0), ("ref:1", 1),
    ]


def test_split_is_layout_independent(spark, labeled):
    res1 = train_quality_classifier(labeled)
    res2 = train_quality_classifier(labeled.repartition(13))
    assert res1.test_rows == res2.test_rows
    assert res1.train_rows == res2.train_rows


def test_isotonic_calibrate_pools_and_invariants(spark):
    """PAVA: hand-checked pooling on a violating sequence, monotone pool
    means, exact weight conservation, bit-stable integer means."""
    from pyrope_spark.operators.quality_model import isotonic_calibrate

    # y: 1, 3, 2 -> pools (1), (3,2)->mean 2.5; then 5 stays alone
    rows = [("k", 0.1, 1.0), ("k", 0.2, 3.0), ("k", 0.3, 2.0), ("k", 0.4, 5.0)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = sorted(
        isotonic_calibrate(df, "k", "x", "y").collect(),
        key=lambda r: r["x_lo"],
    )
    assert [(r["n"], r["mean_micro"]) for r in out] == [
        (1, 1_000_000), (2, 2_500_000), (1, 5_000_000)
    ]
    assert out[1]["x_lo"] == 0.2 and out[1]["x_hi"] == 0.3
    # monotone means
    means = [r["mean_micro"] for r in out]
    assert means == sorted(means)
    # weight conservation: sum(n * mean) == sum(y) when means are exact
    assert sum(r["n"] * r["mean_micro"] for r in out) == 11_000_000


def test_isotonic_calibrate_full_violation_collapses(spark):
    """A strictly decreasing series pools into ONE block at the global
    mean; an increasing series stays unpooled."""
    from pyrope_spark.operators.quality_model import isotonic_calibrate

    dec = [("d", float(i), float(10 - i)) for i in range(5)]
    inc = [("i", float(i), float(i)) for i in range(5)]
    df = spark.createDataFrame(dec + inc, "k string, x double, y double")
    out = isotonic_calibrate(df, "k", "x", "y").collect()
    d_pools = [r for r in out if r["k"] == "d"]
    i_pools = [r for r in out if r["k"] == "i"]
    assert len(d_pools) == 1 and d_pools[0]["mean_micro"] == 8_000_000
    assert d_pools[0]["n"] == 5
    assert len(i_pools) == 5
