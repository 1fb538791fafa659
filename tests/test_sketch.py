"""Count-min sketch (operators/sketch.py) — over-estimate guarantee,
collision behavior, unseen terms, and sketch-table shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyrope_spark.functions.text import tokens
from pyrope_spark.operators.sketch import cms_build, cms_estimate


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _exact(docs):
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("exact"))
    )


def test_cms_overestimates_never_under(spark):
    docs = _docs(
        spark,
        ["apple banana apple cherry", "banana apple durian", "cherry cherry apple"],
    )
    sketch = cms_build(docs, depth=4, width=64)
    exact = _exact(docs)
    est = cms_estimate(sketch, exact.select("term"), depth=4, width=64)
    rows = est.join(exact, "term").collect()
    assert len(rows) == 4
    for r in rows:
        assert r["est_count"] >= r["exact"]


def test_cms_exact_at_wide_width(spark):
    # width >> distinct terms: collisions vanishingly unlikely for this
    # fixed vocabulary -> estimates equal exact counts
    docs = _docs(spark, ["alpha beta alpha", "beta gamma alpha"])
    sketch = cms_build(docs, depth=4, width=4096)
    exact = _exact(docs)
    rows = cms_estimate(sketch, exact.select("term"), depth=4, width=4096) \
        .join(exact, "term").collect()
    assert all(r["est_count"] == r["exact"] for r in rows)
    assert {r["term"]: r["exact"] for r in rows} == {
        "alpha": 3, "beta": 2, "gamma": 1,
    }


def test_cms_width_one_sums_everything(spark):
    # degenerate width=1: every term collides into one counter per row,
    # so every estimate equals the total token count
    docs = _docs(spark, ["a b c", "d e"])
    sketch = cms_build(docs, depth=2, width=1)
    exact = _exact(docs)
    rows = cms_estimate(sketch, exact.select("term"), depth=2, width=1).collect()
    assert all(r["est_count"] == 5 for r in rows)


def test_cms_unseen_term_zero(spark):
    docs = _docs(spark, ["only these words"])
    sketch = cms_build(docs, depth=4, width=1024)
    terms = spark.createDataFrame([("absent",)], "term string")
    row = cms_estimate(sketch, terms, depth=4, width=1024).collect()[0]
    # width 1024 vs 3 distinct terms: no collision in any of 4 rows
    assert row["est_count"] == 0


def test_cms_sketch_table_bounded(spark):
    docs = _docs(spark, ["w%d w%d" % (i, i % 7) for i in range(50)])
    sketch = cms_build(docs, depth=3, width=32)
    assert sketch.count() <= 3 * 32
    # total mass per row d equals the token stream length
    per_d = {r["d"]: r["s"] for r in
             sketch.groupBy("d").agg(F.sum("cnt").alias("s")).collect()}
    assert set(per_d) == {0, 1, 2} and all(v == 100 for v in per_d.values())


def test_bloom_no_false_negatives(spark):
    from pyrope_spark.operators.sketch import bloom_build, bloom_might_contain

    terms = spark.createDataFrame(
        [("t%d" % i,) for i in range(200)], "term string"
    )
    bloom = bloom_build(terms, n_bits=1 << 14, n_hashes=4)
    out = bloom_might_contain(bloom, terms, n_bits=1 << 14, n_hashes=4)
    assert all(r["might_contain"] for r in out.collect())


def test_bloom_rejects_most_unseen(spark):
    from pyrope_spark.operators.sketch import bloom_build, bloom_might_contain

    build = spark.createDataFrame([("in%d" % i,) for i in range(100)], "term string")
    probes = spark.createDataFrame([("out%d" % i,) for i in range(500)], "term string")
    bloom = bloom_build(build, n_bits=1 << 16, n_hashes=4)
    out = bloom_might_contain(bloom, probes, n_bits=1 << 16, n_hashes=4)
    hits = sum(1 for r in out.collect() if r["might_contain"])
    # 100 keys in 65536 bits, 4 hashes: fp rate << 1%; allow slack
    assert hits <= 5


def test_bloom_bits_bounded(spark):
    from pyrope_spark.operators.sketch import bloom_build

    terms = spark.createDataFrame([("x%d" % i,) for i in range(1000)], "term string")
    bloom = bloom_build(terms, n_bits=64, n_hashes=3)
    assert bloom.count() <= 64
