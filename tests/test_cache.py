from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyrope_spark.operators.cache import (
    ResultCacheTable,
    cluster_close_enough,
    estimate_cost,
    round_k,
    with_query_keys,
)
from pyrope_spark.operators.simhash import (
    hamming64,
    simhash_np,
    simhash_projections,
    with_simhash,
)
from tests.conftest import make_queries_df


def test_round_k_buckets(spark):
    df = spark.createDataFrame([(k,) for k in [1, 5, 6, 10, 11, 20, 21, 50, 51, 100, 101]], "k int")
    got = [r["rk"] for r in df.select(round_k(F.col("k")).alias("rk")).collect()]
    assert got == [5, 5, 10, 10, 20, 20, 50, 50, 100, 100, 101]


def test_simhash_deterministic_and_near_dup(spark):
    """F6: identical vector -> identical hash; eps-perturbed copy -> identical
    hash for >= 8/10 base vectors."""
    rng = np.random.default_rng(7)
    base = rng.random((10, 32))
    proj = simhash_projections(32)
    h1 = simhash_np(base, proj)
    h2 = simhash_np(base.copy(), proj)
    assert (h1 == h2).all()
    pert = base + rng.normal(0, 1e-4, base.shape)
    hp = simhash_np(pert, proj)
    assert (h1 == hp).sum() >= 8


def test_simhash_udf_matches_numpy(spark):
    qs = make_queries_df(spark, n=20, dim=16)
    got = {r["query_id"]: r["simhash"] for r in with_simhash(qs).collect()}
    rows = qs.collect()
    proj = simhash_projections(16)
    for r in rows:
        expect = simhash_np(np.asarray([r["vector"]]), proj)[0]
        assert got[r["query_id"]] == expect


def test_hamming64(spark):
    df = spark.createDataFrame([(0b1011, 0b0001), (-1, 0)], "a long, b long")
    got = [r["h"] for r in df.select(hamming64(F.col("a"), F.col("b")).alias("h")).collect()]
    assert got == [2, 64]


def test_cluster_close_enough_table(spark):
    """Table-driven port of IsClusterCloseEnough (VectorCommandSet.cs:913-944)."""
    cases = [
        # (metric, score, cost, expected)
        ("l2", 0.04, 0.0, True),    # under base 0.05
        ("l2", 0.06, 0.0, False),   # over base, no relax
        ("l2", 0.09, 9.0, True),    # relax = 1+log10(10) = 2 -> 0.10
        ("l2", 0.11, 9.0, False),
        ("cosine", 0.96, 0.0, True),   # over base 0.95
        ("cosine", 0.94, 0.0, False),
        ("cosine", 0.91, 9.0, True),   # threshold 1-0.05*2 = 0.90
        ("cosine", 0.89, 9.0, False),
    ]
    for metric, score, cost, expected in cases:
        df = spark.createDataFrame([(score, cost)], "score double, cost double")
        got = df.select(
            cluster_close_enough(F.col("score"), metric, F.col("cost")).alias("ok")
        ).collect()[0]["ok"]
        assert got == expected, (metric, score, cost)


def test_estimate_cost(spark):
    df = spark.createDataFrame([(10_000, 128), (100_000, 1024)], "n long, d int")
    got = [r["c"] for r in df.select(estimate_cost(F.col("n"), F.col("d")).alias("c")).collect()]
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(80.0)


@pytest.fixture()
def keyed(spark):
    qs = make_queries_df(spark, n=6, dim=8, k=10)
    centroids = np.random.default_rng(3).random((4, 8))
    return with_query_keys(qs, "l2", centroids=centroids), centroids


def test_cache_l0_roundtrip_and_epoch_invalidation(spark, tmp_path, keyed):
    keyed_q, _ = keyed
    cache = ResultCacheTable(spark, str(tmp_path / "cache"))
    # miss on empty cache
    first = cache.lookup(keyed_q, epoch=1, metric="l2")
    assert first.filter(F.col("cache_tier").isNotNull()).count() == 0
    # write-back computed results at epoch 1
    results = keyed_q.withColumn("result", F.concat(F.lit("res-"), F.col("query_id")))
    cache.write_back(results, epoch=1)
    hit = cache.lookup(keyed_q, epoch=1, metric="l2")
    assert hit.filter(F.col("cache_tier") == "L0").count() == 6
    assert hit.filter(F.col("cached_result").startswith("res-")).count() == 6
    # epoch bump -> all stale (C8)
    stale = cache.lookup(keyed_q, epoch=2, metric="l2")
    assert stale.filter(F.col("cache_tier").isNotNull()).count() == 0


def test_cache_l1_simhash_hit(spark, tmp_path, keyed):
    """Perturbed queries (same simhash, different exact key) hit L1."""
    keyed_q, centroids = keyed
    cache = ResultCacheTable(spark, str(tmp_path / "cache1"))
    results = keyed_q.withColumn("result", F.concat(F.lit("res-"), F.col("query_id")))
    cache.write_back(results, epoch=1)
    pert = keyed_q.drop(
        "round_k", "cache_key", "key_hash", "simhash", "cluster_id", "cluster_score"
    ).withColumn("vector", F.transform(F.col("vector"), lambda x: x + F.lit(1e-7)))
    pert_keyed = with_query_keys(pert, "l2", centroids=centroids)
    hit = cache.lookup(pert_keyed, epoch=1, metric="l2")
    tiers = {r["query_id"]: r["cache_tier"] for r in hit.collect()}
    assert sum(1 for t in tiers.values() if t == "L1") >= 4  # most share simhash


def test_cache_l2_cluster_hit_gated_by_threshold(spark, tmp_path, keyed):
    keyed_q, _ = keyed
    cache = ResultCacheTable(spark, str(tmp_path / "cache2"))
    results = keyed_q.withColumn("result", F.concat(F.lit("res-"), F.col("query_id")))
    cache.write_back(results, epoch=1)
    # same cluster ids but scores are far (random data) -> L2 gated off at cost 0
    other = keyed_q.withColumn("key_hash", F.col("key_hash") + 999).withColumn(
        "simhash", F.col("simhash") + 999
    )
    strict = cache.lookup(other, epoch=1, metric="l2", cost=0.0)
    assert strict.filter(F.col("cache_tier") == "L2").count() == 0
    # enormous cost relaxes the threshold enough to admit cluster hits
    relaxed = cache.lookup(other, epoch=1, metric="l2", cost=1e30)
    assert relaxed.filter(F.col("cache_tier") == "L2").count() > 0


def test_cache_l05_alias_hit(spark, tmp_path, keyed):
    """L0.5: a query whose exact key misses but whose hash maps to a cached
    canonical hash with confidence >= 0.8 hits; low confidence does not
    (reference: CanonicalKeyMap.cs:11-93)."""
    keyed_q, _ = keyed
    cache = ResultCacheTable(spark, str(tmp_path / "cache05"))
    results = keyed_q.withColumn("result", F.concat(F.lit("res-"), F.col("query_id")))
    cache.write_back(results, epoch=1)
    # different exact key + different simhash -> only the alias can serve it
    other = keyed_q.withColumn("key_hash", F.col("key_hash") + 777).withColumn(
        "simhash", F.col("simhash") + 777
    )
    canon = keyed_q.select(
        (F.col("key_hash") + 777).alias("key_hash"),
        F.col("key_hash").alias("canonical_hash"),
    )
    hi = cache.lookup(
        other, epoch=1, metric="l2", aliases=canon.withColumn("confidence", F.lit(0.9))
    )
    assert hi.filter(F.col("cache_tier") == "L0.5").count() == 6
    lo = cache.lookup(
        other, epoch=1, metric="l2", aliases=canon.withColumn("confidence", F.lit(0.5))
    )
    assert lo.filter(F.col("cache_tier") == "L0.5").count() == 0


def test_cache_ttl_expiry(spark, tmp_path, keyed):
    from datetime import datetime, timedelta, timezone

    keyed_q, _ = keyed
    cache = ResultCacheTable(spark, str(tmp_path / "cache3"))
    results = keyed_q.withColumn("result", F.lit("r"))
    old = datetime.now(timezone.utc) - timedelta(seconds=3600)
    cache.write_back(results, epoch=1, ttl_s=60.0, now=old)
    assert cache.lookup(keyed_q, epoch=1, metric="l2").filter(
        F.col("cache_tier").isNotNull()
    ).count() == 0


def test_write_hot_ttl_shrink(spark, tmp_path, keyed):
    keyed_q, _ = keyed
    cache = ResultCacheTable(spark, str(tmp_path / "cache4"))
    results = keyed_q.withColumn("result", F.lit("r"))
    hot = [int(r["cluster_id"]) for r in keyed_q.select("cluster_id").distinct().collect()]
    cache.write_back(results, epoch=1, ttl_s=60.0, write_hot_clusters=hot)
    ttls = {r["ttl_s"] for r in cache.read().collect()}
    assert ttls == {6.0}  # 60 * 0.1, above the 1s floor


def test_prefetch_materialization_serves_followup_from_cache(spark, tmp_path):
    """C7 (reference PredictivePrefetcher.cs:60-91): after training rules and
    materializing the predicted cluster's results, a follow-up query landing
    in that cluster is served from the L2 tier — zero compute."""
    from pyrope_spark.operators.analytics import markov_rules, prefetch_predicted
    from pyrope_spark.operators.cache import ResultCacheTable, with_query_keys
    from pyrope_spark.operators.search_pipeline import search_with_cache

    rng = np.random.default_rng(7)
    dim = 8
    centroids = rng.random((4, dim))
    # vectors clustered tightly around the 4 centroids
    rows = []
    for i in range(200):
        c = i % 4
        v = centroids[c] + rng.normal(0, 0.01, dim)
        rows.append((f"v{i}", [float(x) for x in v]))
    vectors = spark.createDataFrame(rows, "id string, vector array<float>")

    # session stream repeatedly transitioning cluster 1 -> 2 (count >= 3)
    ev = spark.createDataFrame(
        [("s1", t, c) for t, c in enumerate([1, 2, 1, 2, 1, 2, 1, 2])],
        "sid string, t int, cl int",
    )
    rules = markov_rules(ev, session_cols=["sid"], cluster_col="cl", order_cols=["t"])
    assert [(r["current"], r["next"]) for r in rules.collect()] == [(1, 2), (2, 1)]

    cache = ResultCacheTable(spark, str(tmp_path / "cache"))
    prefetch_predicted(
        vectors, rules, centroids, cache, k=10, metric="l2", epoch=5
    )

    # follow-up query near centroid 2 (the predicted next cluster): the
    # perturbation (seeded) keeps it within the L2 closeness gate
    # (dist ~0.036 <= 0.05) while flipping the simhash so L0/L1 cannot hit —
    # the serve MUST come from the prefetched L2 row
    fv = centroids[2] + np.random.default_rng(104).normal(0, 0.015, dim)
    follow = spark.createDataFrame(
        [("f0", [float(x) for x in fv], 10, [])],
        "query_id string, vector array<float>, top_k int, filter_tags array<string>",
    )
    _, stats = search_with_cache(
        vectors, follow, cache, k=10, metric="l2", epoch=5,
        centroids=centroids, n=200, dim=dim,
    )
    assert stats.misses == 0
    assert stats.hits_by_tier.get("L2", 0) == 1
