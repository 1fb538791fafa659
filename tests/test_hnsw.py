from __future__ import annotations

import pytest

from pyrope_spark.operators.hnsw import HAVE_HNSWLIB, hnsw_partition_search
from pyrope_spark.operators.ivf import ivf_recall
from pyrope_spark.operators.knn import knn_bruteforce
from tests.conftest import make_queries_df, make_vectors_df


def test_raises_without_lib_and_fallback(spark):
    vectors = make_vectors_df(spark, n=50, dim=8, del_frac=0.0)
    queries = make_queries_df(spark, n=2, dim=8)
    if not HAVE_HNSWLIB:
        with pytest.raises(Exception, match="hnswlib"):
            hnsw_partition_search(vectors, queries, k=5).collect()


def test_partition_merge_plumbing_exact_fallback(spark):
    """The per-partition local/global top-K merge must be exact with the
    brute-force local scorer, regardless of partitioning."""
    vectors = make_vectors_df(spark, n=300, dim=8, del_frac=0.0).repartition(7)
    queries = make_queries_df(spark, n=6, dim=8)
    got = hnsw_partition_search(vectors, queries, k=10, fallback_bruteforce=True)
    exact = knn_bruteforce(vectors, queries, k=10, metric="l2")
    assert ivf_recall(got, exact, 10) == 1.0


@pytest.mark.skipif(not HAVE_HNSWLIB, reason="hnswlib not installed")
def test_hnsw_recall(spark):
    vectors = make_vectors_df(spark, n=500, dim=16, del_frac=0.0).repartition(4)
    queries = make_queries_df(spark, n=8, dim=16)
    got = hnsw_partition_search(vectors, queries, k=10)
    exact = knn_bruteforce(vectors, queries, k=10, metric="l2")
    assert ivf_recall(got, exact, 10) >= 0.7
