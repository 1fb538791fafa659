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


# --------------------------------------------------------------------------
# interval_union_coverage + zipf_rank_frequency (session-5 wave 4)
# --------------------------------------------------------------------------


def test_interval_union_merges_overlaps(spark):
    from pyrope_spark.operators.temporal import interval_union_coverage

    rows = [
        ("u1", 0, 10),    # |-- merged with next (overlap)
        ("u1", 5, 20),    # -> segment [0, 20]
        ("u1", 20, 30),   # touching (start == prev end) -> SAME segment
        ("u1", 40, 50),   # gap -> new segment
        ("u2", 0, 100),   # contained intervals collapse
        ("u2", 10, 20),
        ("u2", 30, 40),
    ]
    df = spark.createDataFrame(rows, "user_id STRING, start_s LONG, end_s LONG")
    out = {r.user_id: r for r in interval_union_coverage(df).collect()}
    u1 = out["u1"]
    assert (u1.n_intervals, u1.n_segments) == (4, 2)
    assert u1.covered_s == 30 + 10
    assert u1.span_s == 50
    u2 = out["u2"]
    assert (u2.n_segments, u2.covered_s, u2.span_s) == (1, 100, 100)


def test_interval_union_degenerate_and_invalid(spark):
    from pyrope_spark.operators.temporal import interval_union_coverage

    rows = [
        ("u", 5, 5),     # zero-length: counts as an interval, adds 0
        ("u", 9, 3),     # end < start: dropped
        ("u", 10, 12),
    ]
    df = spark.createDataFrame(rows, "user_id STRING, start_s LONG, end_s LONG")
    out = interval_union_coverage(df).collect()[0]
    assert out.n_intervals == 2          # invalid row dropped
    assert out.n_segments == 2
    assert out.covered_s == 2


def test_zipf_rank_frequency_closed_form(spark):
    from pyrope_spark.operators.fulltext import zipf_rank_frequency

    docs = _docs(
        spark,
        [(1, "a a a a b b b c c d")],
    )
    out = sorted(
        zipf_rank_frequency(docs, k=10).collect(), key=lambda r: r.rank
    )
    assert [(r.rank, r.term, r.freq, r.rf_product) for r in out] == [
        (1, "a", 4, 4),
        (2, "b", 3, 6),
        (3, "c", 2, 6),
        (4, "d", 1, 4),
    ]


def test_zipf_tie_broken_by_term(spark):
    from pyrope_spark.operators.fulltext import zipf_rank_frequency

    docs = _docs(spark, [(1, "zz aa zz aa")])
    out = sorted(zipf_rank_frequency(docs, k=2).collect(), key=lambda r: r.rank)
    assert [r.term for r in out] == ["aa", "zz"]
