from __future__ import annotations

import pytest

from pyrope_spark.operators.ivf import ivf_recall
from pyrope_spark.operators.knn import knn_bruteforce
from pyrope_spark.operators.similarity import ann_topk, build_similarity_index
from tests.conftest import make_queries_df, make_vectors_df


@pytest.fixture(scope="module")
def data(spark):
    vectors = make_vectors_df(spark, n=300, dim=16, del_frac=0.0).cache()
    queries = make_queries_df(spark, n=6, dim=16, k=10).cache()
    exact = knn_bruteforce(vectors, queries, k=10, metric="l2").cache()
    exact.count()
    return vectors, queries, exact


@pytest.mark.parametrize("method,min_recall", [
    ("brute", 1.0), ("segments", 1.0), ("sq8", 0.9), ("ivf", 0.9),
])
def test_facade_methods(data, method, min_recall):
    vectors, queries, exact = data
    idx = build_similarity_index(vectors, method=method, metric="l2", nlist=8)
    hits = ann_topk(idx, queries, k=10, nprobe=8)
    r = ivf_recall(hits, exact, 10)
    assert r >= min_recall, f"{method}: recall {r}"


def test_unknown_method(data):
    vectors, *_ = data
    with pytest.raises(ValueError, match="unknown method"):
        build_similarity_index(vectors, method="hnswish")


def test_facade_hnsw_and_distributed_and_byte(spark):
    """Round-2 facade switches: hnsw method, distributed ivf, byte sq8."""
    from pyrope_spark.operators.ivf import ivf_recall
    from pyrope_spark.operators.knn import knn_bruteforce
    from pyrope_spark.operators.similarity import ann_topk, build_similarity_index
    from tests.conftest import make_queries_df, make_vectors_df

    vectors = make_vectors_df(spark, n=500, dim=16, del_frac=0.0)
    queries = make_queries_df(spark, n=6, dim=16, k=10)
    exact = knn_bruteforce(vectors, queries, k=10, metric="l2")

    hn = build_similarity_index(vectors, method="hnsw", metric="l2")
    assert ivf_recall(ann_topk(hn, queries, k=10), exact, 10) >= 0.9

    ivf = build_similarity_index(vectors, method="ivf", metric="l2", nlist=8,
                                 rows_per_segment=64)
    a = ann_topk(ivf, queries, k=10, nprobe=8)
    b = ann_topk(ivf, queries, k=10, nprobe=8, distributed=True)
    key = lambda df: sorted((r["query_id"], r["rank"], r["id"]) for r in df.collect())
    assert key(a) == key(b)

    sq = build_similarity_index(vectors, method="sq8", metric="l2",
                                rows_per_segment=64)
    byte = ann_topk(sq, queries, k=10, scoring="byte")
    assert ivf_recall(byte, exact, 10) >= 0.6
