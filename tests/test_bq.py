from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyrope_spark.operators.bq import (
    _pack_bits,
    bq_encode,
    bq_rerank_topk,
    bq_topk,
    bq_topk_distributed,
    bq_words,
    encode_queries_np,
    pack_segments_bq,
    segment_knn_bq,
)
from pyrope_spark.operators.knn import knn_bruteforce


def make_centered_vectors(spark, n=200, dim=16, seed=7):
    r = np.random.default_rng(seed)
    mat = (r.random((n, dim), dtype=np.float32) - 0.5).astype(np.float32)
    rows = [(f"v{i:04d}", [float(x) for x in mat[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "id string, vector array<float>"),
        mat,
    )


def make_centered_queries(spark, n=5, dim=16, seed=99):
    r = np.random.default_rng(seed)
    mat = (r.random((n, dim), dtype=np.float32) - 0.5).astype(np.float32)
    rows = [(f"q{i}", [float(x) for x in mat[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "query_id string, vector array<float>"), mat


def words_to_bits(words: list[int], dim: int) -> list[int]:
    bits = []
    for j, w in enumerate(words):
        for i in range(32):
            if 32 * j + i < dim:
                bits.append((w >> i) & 1)
    return bits


def test_bq_words_match_numpy_packbits(spark):
    """The expression word layout and the packed uint8 layout carry the
    same sign bits (incl. a zero component -> bit 0)."""
    vecs, mat = make_centered_vectors(spark, n=40, dim=19)
    mat[3, 5] = 0.0  # strict > 0: exact zero must NOT set the bit
    rows = [(f"v{i:04d}", [float(x) for x in mat[i]]) for i in range(40)]
    vecs = spark.createDataFrame(rows, "id string, vector array<float>")
    got = {
        r["id"]: words_to_bits(r["bq_words"], 19)
        for r in bq_encode(vecs).collect()
    }
    packed = _pack_bits(mat)
    want_bits = np.unpackbits(packed, axis=1, bitorder="little")[:, :19]
    for i in range(40):
        assert got[f"v{i:04d}"] == list(want_bits[i]), i
    assert got["v0003"][5] == 0


def test_bq_coarse_paths_agree(spark):
    """expr / packed / distributed coarse stages retain the identical
    candidate set (total order at the cut), including planted duplicates."""
    vecs, mat = make_centered_vectors(spark, n=150, dim=16)
    # plant exact duplicates (hamming ties at the boundary)
    dup = vecs.limit(10).withColumn("id", F.concat(F.lit("z"), F.col("id")))
    vecs = vecs.union(dup)
    queries, _ = make_centered_queries(spark, n=4, dim=16)

    codes = bq_encode(vecs)
    qcodes = queries.select(
        "query_id", bq_words("vector").alias("bq_words")
    )
    expr = bq_topk(codes, qcodes, 12)
    key = lambda df: sorted(
        (r["query_id"], r["rank"], r["id"], r["hamming"]) for r in df.collect()
    )
    seg = pack_segments_bq(vecs, rows_per_segment=48)
    qrows = [
        (r["query_id"], np.asarray(r["vector"]))
        for r in queries.collect()
    ]
    packed = segment_knn_bq(seg, qrows, 12)
    dist = bq_topk_distributed(seg, queries, 12)
    assert key(expr) == key(packed) == key(dist)


def test_bq_rerank_full_is_exact(spark):
    """rerank = n candidates -> result identical to exact brute force."""
    vecs, _ = make_centered_vectors(spark, n=80, dim=16)
    queries, _ = make_centered_queries(spark, n=3, dim=16)
    exact = knn_bruteforce(vecs, queries, k=5, metric="cosine")
    bq = bq_rerank_topk(vecs, queries, k=5, rerank=80, metric="cosine",
                        impl="expr")
    key = lambda df: sorted(
        (r["query_id"], r["rank"], r["id"]) for r in df.collect()
    )
    assert key(exact) == key(bq)


def test_bq_recall_gate(spark):
    """Hamming coarse + exact confirm at rerank=3k: recall@10 over the
    centered corpus. Sign-bit codes at dim 16 are the coarsest sketch in
    the ladder; the gate documents the floor (packed path)."""
    from pyrope_spark.operators.ivf import ivf_recall

    vecs, _ = make_centered_vectors(spark, n=400, dim=32, seed=11)
    queries, _ = make_centered_queries(spark, n=8, dim=32, seed=5)
    exact = knn_bruteforce(vecs, queries, k=10, metric="cosine")
    bq = bq_rerank_topk(vecs, queries, k=10, rerank=60, metric="cosine",
                        impl="packed")
    assert ivf_recall(bq, exact, 10) >= 0.6


def test_bq_rerank_less_than_k_raises(spark):
    vecs, _ = make_centered_vectors(spark, n=20, dim=8)
    queries, _ = make_centered_queries(spark, n=2, dim=8)
    with pytest.raises(ValueError, match="rerank"):
        bq_rerank_topk(vecs, queries, k=10, rerank=5)


def test_bq_zero_vector_codes_to_zero(spark):
    df = spark.createDataFrame(
        [("z", [0.0] * 40)], "id string, vector array<float>"
    )
    row = bq_encode(df).collect()[0]
    assert row["bq_words"] == [0, 0]
    assert encode_queries_np(np.zeros((1, 40), dtype=np.float32)).sum() == 0


def test_bq_distributed_plan_no_corpus_shuffle(spark):
    """The distributed coarse scan broadcast-joins packed query blocks
    against code segments: the corpus-sized side never hash-shuffles before
    scoring; the only hash exchange is the final per-query top-k merge."""
    vecs, _ = make_centered_vectors(spark, n=200, dim=16)
    queries, _ = make_centered_queries(spark, n=5, dim=16)
    seg = pack_segments_bq(vecs, rows_per_segment=64)
    out = bq_topk_distributed(seg, queries, 10)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" in final or "BroadcastExchange" in final
    assert final.count("Exchange hashpartitioning") <= 1


def test_bq_empty_corpus_and_empty_queries(spark):
    vecs, _ = make_centered_vectors(spark, n=10, dim=8)
    empty_v = vecs.filter("1=0")
    queries, _ = make_centered_queries(spark, n=2, dim=8)
    assert bq_topk(
        bq_encode(empty_v),
        queries.select("query_id", bq_words("vector").alias("bq_words")),
        5,
    ).count() == 0
    empty_q = queries.filter("1=0")
    assert bq_topk(
        bq_encode(vecs),
        empty_q.select("query_id", bq_words("vector").alias("bq_words")),
        5,
    ).count() == 0
