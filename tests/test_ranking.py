"""Ranking metrics (operators/ranking.py): closed-form truth table."""

from __future__ import annotations

import math

import pytest

from pyrope_spark.operators.ranking import ranking_metrics


def _res(spark, rows):
    return spark.createDataFrame(rows, "query_id string, doc_id string, rank long")


def _qrels(spark, rows):
    return spark.createDataFrame(rows, "query_id string, doc_id string, rel int")


def test_perfect_ranking(spark):
    res = _res(spark, [("q", "a", 1), ("q", "b", 2)])
    qr = _qrels(spark, [("q", "a", 3), ("q", "b", 1)])
    m = ranking_metrics(res, qr, 10).collect()[0]
    assert m["recall_k"] == 1.0
    assert m["mrr_k"] == 1.0
    assert m["ndcg_k"] == 1.0  # retrieved in ideal order


def test_partial_and_misordered(spark):
    """Hand-computed: rel-3 doc at rank 2, rel-1 doc missing."""
    res = _res(spark, [("q", "x", 1), ("q", "a", 2)])
    qr = _qrels(spark, [("q", "a", 3), ("q", "b", 1)])
    m = ranking_metrics(res, qr, 10).collect()[0]
    assert m["n_rel"] == 2 and m["n_rel_ret"] == 1
    assert m["recall_k"] == 0.5
    assert m["mrr_k"] == 0.5
    dcg = 7.0 / math.log2(3)          # gain 2^3-1 at rank 2
    idcg = 7.0 / math.log2(2) + 1.0 / math.log2(3)
    assert m["ndcg_k"] == pytest.approx(dcg / idcg, abs=1e-6)


def test_no_relevant_retrieved(spark):
    res = _res(spark, [("q", "x", 1)])
    qr = _qrels(spark, [("q", "a", 2)])
    m = ranking_metrics(res, qr, 10).collect()[0]
    assert m["recall_k"] == 0.0 and m["mrr_k"] == 0.0 and m["ndcg_k"] == 0.0


def test_rank_beyond_k_ignored(spark):
    res = _res(spark, [("q", "a", 11)])
    qr = _qrels(spark, [("q", "a", 1)])
    m = ranking_metrics(res, qr, 10).collect()[0]
    assert m["n_rel_ret"] == 0
