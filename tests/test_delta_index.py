from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyrope_spark.operators.delta_index import build_delta_index, delta_search
from pyrope_spark.operators.ivf import ivf_recall
from pyrope_spark.operators.knn import knn_bruteforce
from pyrope_spark.store import VectorStore
from tests.conftest import make_queries_df

DIM = 8
T, I = "t", "i"


def _records(spark, n, start=0, scale=1.0):
    import numpy as np

    r = np.random.default_rng(42 + start)
    return spark.createDataFrame(
        [
            (T, I, f"v{start + j}", [float(x * scale) for x in r.random(DIM)], None, [])
            for j in range(n)
        ],
        "tenant_id string, index_name string, id string, vector array<float>, "
        "meta string, tags array<string>",
    )


@pytest.fixture()
def built_store(spark, tmp_path):
    st = VectorStore(spark, str(tmp_path / "store"))
    st.add(_records(spark, 300))
    model = build_delta_index(st, T, I, nlist=8)
    return st, model


def test_build_writes_segments_and_centroids(built_store, spark):
    st, model = built_store
    from pyrope_spark.operators.delta_index import load_delta_index

    seg, loaded = load_delta_index(st, T, I)
    assert seg.agg(F.sum("n")).collect()[0][0] == 300
    assert (loaded.centroids == model.centroids).all()
    assert st.registry.get(T, I).algo == "ivf_flat"


def test_delta_search_full_probe_exact(built_store, spark):
    st, model = built_store
    queries = make_queries_df(spark, n=6, dim=DIM, k=10)
    hits = delta_search(st, T, I, queries, k=10, nprobe=8)
    exact = knn_bruteforce(st.live(T, I), queries, k=10, metric="l2")
    assert ivf_recall(hits, exact, 10) == 1.0


def test_head_writes_shadow_tail(built_store, spark):
    """F5: upsert of a tail id via head shadows the tail value; new head ids
    appear; deletes after build hide built rows (DeltaVectorIndex.cs:95-109)."""
    st, _ = built_store
    queries = spark.createDataFrame(
        [("q", [9.0] * DIM, 5, [])],
        "query_id string, vector array<float>, top_k int, filter_tags array<string>",
    )
    # upsert v0 to a far-away vector; add a brand-new best match in head
    st.upsert(
        spark.createDataFrame(
            [
                (T, I, "v0", [9.0] * DIM, None, []),
                (T, I, "new1", [9.1] * DIM, None, []),
            ],
            "tenant_id string, index_name string, id string, vector array<float>, "
            "meta string, tags array<string>",
        )
    )
    hits = delta_search(st, T, I, queries, k=2, nprobe=8).collect()
    top2 = [r["id"] for r in sorted(hits, key=lambda r: r["rank"])]
    assert set(top2) == {"v0", "new1"}
    # tombstone v0 -> disappears even though it exists in the tail build
    st.delete([(T, I, "v0")])
    hits = delta_search(st, T, I, queries, k=2, nprobe=8).collect()
    ids = [r["id"] for r in hits]
    assert "v0" not in ids and "new1" in ids


def test_partial_probe_recall(built_store, spark):
    st, _ = built_store
    queries = make_queries_df(spark, n=6, dim=DIM, k=10)
    hits = delta_search(st, T, I, queries, k=10, nprobe=3)
    exact = knn_bruteforce(st.live(T, I), queries, k=10, metric="l2")
    assert ivf_recall(hits, exact, 10) >= 0.7


def test_large_head_exact_topk_bounded_fetch(built_store, spark):
    """Head >= 10x k: the kernel-mask path must stay exact (head-wins,
    tombstones hidden) with a tail fetch of exactly k per query."""
    st, _ = built_store
    # 120 head rows (12x k): 100 upserts of tail ids + 20 new ids
    st.upsert(_records(spark, 100, start=0, scale=0.5))       # shadow v0..v99
    st.upsert(_records(spark, 20, start=1000, scale=1.0))     # new ids
    st.delete([(T, I, f"v{j}") for j in range(100, 110)])     # tombstone tail ids
    queries = make_queries_df(spark, n=6, dim=DIM, k=10)
    hits = delta_search(st, T, I, queries, k=10, nprobe=8)
    exact = knn_bruteforce(st.live(T, I), queries, k=10, metric="l2")
    assert ivf_recall(hits, exact, 10) == 1.0
    deleted = {f"v{j}" for j in range(100, 110)}
    assert not deleted & {r["id"] for r in hits.collect()}


def test_oversized_head_fallback_exact(built_store, spark):
    """Head above max_head_keys without auto-build: anti-join fallback still
    returns exact results."""
    st, _ = built_store
    st.upsert(_records(spark, 50, start=2000))
    queries = make_queries_df(spark, n=4, dim=DIM, k=5)
    hits = delta_search(st, T, I, queries, k=5, nprobe=8, max_head_keys=10)
    exact = knn_bruteforce(st.live(T, I), queries, k=5, metric="l2")
    assert ivf_recall(hits, exact, 5) == 1.0


def test_oversized_head_auto_build(built_store, spark):
    """auto_build_nlist triggers compaction: head drains into the tail and
    the search still matches brute force."""
    st, _ = built_store
    st.upsert(_records(spark, 50, start=3000))
    queries = make_queries_df(spark, n=4, dim=DIM, k=5)
    hits = delta_search(
        st, T, I, queries, k=5, nprobe=8, max_head_keys=10, auto_build_nlist=8
    )
    exact = knn_bruteforce(st.live(T, I), queries, k=5, metric="l2")
    assert ivf_recall(hits, exact, 5) == 1.0
    # compaction actually ran: head is empty now
    import os
    assert not os.path.exists(st.head_path) or len(
        st._read(st.head_path).take(1)
    ) == 0
