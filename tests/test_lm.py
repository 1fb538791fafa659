"""Stupid-Backoff bigram LM scoring (operators/lm.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pyrope_spark.operators.lm import (
    score_stupid_backoff,
    train_bigram_lm,
)


def _train(spark):
    rows = [
        (1, "a b a b a"),  # bigrams: (a,b)x2, (b,a)x2
        (2, "a c"),  # (a,c)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_count_tables(spark):
    lm = train_bigram_lm(_train(spark))
    uni = {r.w: r.c1 for r in lm.unigrams.collect()}
    assert uni == {"a": 4, "b": 2, "c": 1}
    big = {(r.w1, r.w2): r.c12 for r in lm.bigrams.collect()}
    assert big == {("a", "b"): 2, ("b", "a"): 2, ("a", "c"): 1}
    assert lm.totals.collect()[0].total_tokens == 7


def test_three_branches_closed_form(spark):
    """One doc exercising bigram hit, unigram backoff, and the OOV floor."""
    lm = train_bigram_lm(_train(spark))
    # positions: (a,b) seen bigram; (b,c) unseen bigram, c seen unigram;
    # (c,zzz) unseen bigram, zzz OOV
    docs = spark.createDataFrame([(10, "a b c zzz")], "doc_id long, text string")
    row = score_stupid_backoff(docs, lm).collect()[0]
    t, alpha = 7.0, 0.4
    expected = [
        math.log(2 / 4),  # c(a,b)/c(a)
        math.log(alpha * 1 / t),  # backoff to c(c)/T
        math.log(alpha / t),  # OOV floor
    ]
    assert row.n_positions == 3
    assert abs(row.avg_logp - round(sum(expected) / 3, 6)) < 2e-6
    assert abs(row.backoff_ratio - round(2 / 3, 6)) < 2e-6


def test_short_and_empty_docs_kept(spark):
    lm = train_bigram_lm(_train(spark))
    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, None), (4, "a b")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in score_stupid_backoff(docs, lm).collect()}
    assert len(out) == 4
    for d in (1, 2, 3):
        assert out[d].n_positions == 0
        assert out[d].avg_logp is None and out[d].backoff_ratio is None
    assert out[4].n_positions == 1
    assert abs(out[4].avg_logp - round(math.log(2 / 4), 6)) < 2e-6


def test_reference_like_scores_higher(spark):
    """A doc made of common training bigrams must outscore a doc of rare /
    unseen transitions — the filtering property the operator exists for."""
    train = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(10)] + [(99, "rare token pair")],
        "doc_id long, text string",
    )
    lm = train_bigram_lm(train)
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "mat the on sat cat the")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.avg_logp for r in score_stupid_backoff(docs, lm).collect()}
    assert out[1] > out[2]


def test_perplexity_buckets_exact_ordering(spark):
    from pyrope_spark.operators.lm import perplexity_buckets

    scored = spark.createDataFrame(
        [(1, 5, -1.0, 0.0), (2, 5, -2.0, 0.0), (3, 5, -3.0, 0.0),
         (4, 5, -4.0, 0.0), (5, 5, -5.0, 0.0), (6, 5, -6.0, 0.0),
         (7, 0, None, None)],
        "doc_id long, n_positions long, avg_logp double, backoff_ratio double",
    )
    out = {r["doc_id"]: r["bucket"] for r in
           perplexity_buckets(scored, n_buckets=3, mode="exact").collect()}
    # highest avg_logp -> bucket 1 (CCNet head), NULL score -> NULL bucket
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: None}


def test_perplexity_buckets_cutoff_mode_agrees_on_clean_split(spark):
    from pyrope_spark.operators.lm import perplexity_buckets

    rows = [(i, 5, float(-i), 0.0) for i in range(1, 31)] + [(99, 0, None, None)]
    scored = spark.createDataFrame(
        rows, "doc_id long, n_positions long, avg_logp double, backoff_ratio double"
    )
    exact = {r["doc_id"]: r["bucket"] for r in
             perplexity_buckets(scored, n_buckets=3, mode="exact").collect()}
    cutoff = {r["doc_id"]: r["bucket"] for r in
              perplexity_buckets(scored, n_buckets=3, mode="cutoff").collect()}
    # the distributed cutoff path may flip docs exactly at a boundary;
    # on 30 evenly-spread scores at most the 2 boundary docs differ
    diffs = [k for k in exact if exact[k] != cutoff[k]]
    assert len(diffs) <= 2
    assert cutoff[99] is None
    # extremes always agree
    assert cutoff[1] == 1 and cutoff[30] == 3


def test_pmi_collocations_ranking_and_counts(spark):
    """Planted rigid collocation ('hong kong' always together) outranks a
    frequent-but-promiscuous pair; counts are exact contingency
    marginals."""
    from pyrope_spark.operators.lm import pmi_collocations

    docs = []
    for i in range(6):
        docs.append((i, "hong kong visit"))          # rigid pair
    for i in range(6, 12):
        docs.append((i, "the cat the dog the bird")) # 'the X' promiscuous
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pmi_collocations(df, min_count=5, top_n=10).collect()
    rows = {(r["w1"], r["w2"]): r for r in out}
    hk = rows[("hong", "kong")]
    assert hk["c12"] == 6
    # 'hong' appears as w1 only in 'hong kong'; 'kong' as w2 only there
    assert hk["c1"] == 6 and hk["c2"] == 6
    assert hk["score_ppb"] == 6 * 1_000_000_000 // 36
    # rigid pair ranks above every 'the X' pair (its marginals dilute it)
    the_pairs = [r for r in out if r["w1"] == "the"]
    assert the_pairs and all(
        hk["score_ppb"] > r["score_ppb"] for r in the_pairs
    )


def test_pmi_min_count_prunes_hapax(spark):
    from pyrope_spark.operators.lm import pmi_collocations

    df = spark.createDataFrame(
        [(1, "rare pair"), (2, "common word common word common word "
                              "common word common word")],
        "doc_id long, text string",
    )
    out = pmi_collocations(df, min_count=5, top_n=10).collect()
    assert ("rare", "pair") not in {(r["w1"], r["w2"]) for r in out}
