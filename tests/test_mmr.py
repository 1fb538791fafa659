"""MMR re-rank (operators/mmr.py) — relevance/diversity trade-off,
tie-breaks, and pool-size edge cases."""

from __future__ import annotations

from pyrope_spark.operators.mmr import mmr_rerank


def _pool(spark, rows):
    return spark.createDataFrame(
        rows, "query_id string, id string, embedding array<float>, score double"
    )


def test_mmr_lambda1_is_pure_relevance(spark):
    pool = _pool(
        spark,
        [
            ("q", "a", [1.0, 0.0], 0.9),
            ("q", "b", [1.0, 0.0], 0.8),  # duplicate of a
            ("q", "c", [0.0, 1.0], 0.7),
        ],
    )
    out = [r["id"] for r in
           mmr_rerank(pool, k=3, lam=1.0).orderBy("rank").collect()]
    assert out == ["a", "b", "c"]


def test_mmr_diversifies_duplicates_down(spark):
    # b duplicates a's direction; with lam=0.5 the orthogonal c (rel 0.7)
    # must outrank the duplicate b (rel 0.8): b's MMR = .5*.8-.5*1 = -0.1,
    # c's = .5*.7-.5*0 = 0.35
    pool = _pool(
        spark,
        [
            ("q", "a", [1.0, 0.0], 0.9),
            ("q", "b", [1.0, 0.0], 0.8),
            ("q", "c", [0.0, 1.0], 0.7),
        ],
    )
    rows = mmr_rerank(pool, k=3, lam=0.5).orderBy("rank").collect()
    assert [r["id"] for r in rows] == ["a", "c", "b"]
    assert abs(rows[1]["mmr_score"] - 0.35) < 1e-9
    assert abs(rows[2]["mmr_score"] - (-0.1)) < 1e-9


def test_mmr_k_capped_by_pool(spark):
    pool = _pool(spark, [("q", "a", [1.0, 0.0], 0.5), ("q", "b", [0.0, 1.0], 0.4)])
    assert mmr_rerank(pool, k=10, lam=0.5).count() == 2


def test_mmr_tie_breaks_by_id(spark):
    pool = _pool(
        spark,
        [("q", "b", [1.0, 0.0], 0.5), ("q", "a", [0.0, 1.0], 0.5)],
    )
    rows = mmr_rerank(pool, k=1, lam=1.0).collect()
    assert rows[0]["id"] == "a"


def test_mmr_multi_query_independent(spark):
    pool = _pool(
        spark,
        [
            ("q1", "a", [1.0, 0.0], 0.9), ("q1", "b", [0.0, 1.0], 0.1),
            ("q2", "b", [0.0, 1.0], 0.9), ("q2", "a", [1.0, 0.0], 0.1),
        ],
    )
    out = {(r["query_id"], r["rank"]): r["id"] for r in
           mmr_rerank(pool, k=2, lam=0.5).collect()}
    assert out[("q1", 1)] == "a" and out[("q2", 1)] == "b"
