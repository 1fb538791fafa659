"""Closed-form tests for exact phrase search and the Heaps-law
vocabulary-growth curve."""

from __future__ import annotations

import pytest

from pyrope_spark.operators.fulltext import heaps_vocab_growth, phrase_search


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_phrase_search_exact_adjacency_only(spark):
    docs = _docs(
        spark,
        [
            (1, "big data table value scan"),      # match at pos 2
            (2, "table fast value"),                # non-adjacent -> no match
            (3, "value table"),                     # wrong order -> no match
            (4, "x table value y table value z"),  # two matches, first at 1
        ],
    )
    out = {r.doc_id: r for r in phrase_search(docs, phrase="table value").collect()}
    assert set(out) == {1, 4}
    assert out[1].n_matches == 1 and out[1].first_pos == 2
    assert out[4].n_matches == 2 and out[4].first_pos == 1
    # rank: n_matches desc then first_pos asc
    assert out[4].rk == 1 and out[1].rk == 2


def test_phrase_search_repeated_token_phrase(spark):
    docs = _docs(
        spark,
        [
            (1, "the cat the mat"),   # "the cat the" at 0
            (2, "the cat cat the"),   # no
            (3, "a the cat the"),     # at 1
        ],
    )
    out = {r.doc_id: r for r in phrase_search(docs, phrase="the cat the").collect()}
    assert set(out) == {1, 3}
    assert out[1].first_pos == 0
    assert out[3].first_pos == 1


def test_phrase_search_overlapping_occurrences(spark):
    # "a a a a" contains "a a" at anchors 0,1,2
    docs = _docs(spark, [(1, "a a a a")])
    out = phrase_search(docs, phrase="a a").collect()
    assert len(out) == 1 and out[0].n_matches == 3


def test_phrase_search_case_and_k_cut(spark):
    docs = _docs(
        spark,
        [(i, "Alpha Beta tail") for i in range(1, 6)],
    )
    out = phrase_search(docs, phrase="alpha beta", k=3).collect()
    assert [r.doc_id for r in sorted(out, key=lambda r: r.rk)] == [1, 2, 3]


def test_phrase_search_empty_phrase_raises(spark):
    docs = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        phrase_search(docs, phrase="   ")


def test_heaps_vocab_growth_closed_form(spark):
    # bucket 0: docs 0-1, bucket 1: docs 2-3
    docs = _docs(
        spark,
        [
            (0, "a b a"),    # 3 tokens, types {a, b} new
            (1, "b c"),      # 2 tokens, type {c} new
            (2, "a d d"),    # 3 tokens, type {d} new
            (3, "b"),        # 1 token, nothing new
        ],
    )
    out = {r.bucket: r for r in heaps_vocab_growth(docs, bucket_width=2).collect()}
    assert set(out) == {0, 1}
    assert out[0].bucket_tokens == 5 and out[0].new_types == 3
    assert out[0].cum_tokens == 5 and out[0].cum_types == 3
    assert out[1].bucket_tokens == 4 and out[1].new_types == 1
    assert out[1].cum_tokens == 9 and out[1].cum_types == 4


def test_heaps_vocab_growth_saturated_vocabulary(spark):
    # same vocabulary in every bucket: new_types only in bucket 0
    docs = _docs(spark, [(i, "x y") for i in range(6)])
    out = sorted(
        heaps_vocab_growth(docs, bucket_width=2).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.new_types for r in out] == [2, 0, 0]
    assert [r.cum_types for r in out] == [2, 2, 2]
    assert [r.cum_tokens for r in out] == [4, 8, 12]


def test_heaps_vocab_growth_null_and_empty_docs(spark):
    docs = _docs(spark, [(0, None), (1, ""), (2, "only words here")])
    out = sorted(
        heaps_vocab_growth(docs, bucket_width=1).collect(),
        key=lambda r: r.bucket,
    )
    # buckets 0 and 1 produce no token rows at all -> absent from the curve
    assert [r.bucket for r in out] == [2]
    assert out[0].cum_types == 3
