"""Closed-form tests for term keyness, Simpson lexical diversity, robust
scaling, and hard-negative mining (round-6 session-5 wave 2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyrope_spark.operators.curation import robust_scale
from pyrope_spark.operators.fulltext import (
    lexical_diversity_simpson,
    term_keyness,
)
from pyrope_spark.operators.similarity import hard_negative_mining


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")


def test_term_keyness_hand_traced_2x2(spark):
    docs = _docs(
        spark,
        [(1, "spam spam spam spam spam", "en"), (2, "ham ham ham ham ham", "fr")],
    )
    out = term_keyness(
        docs,
        group_expr=F.when(F.col("lang") == "en", F.lit("A")).otherwise("B"),
        k=10,
        min_term_count=5,
    ).collect()
    # cells: (spam,A,5), (ham,B,5); n=10, ra=5, cb=5 for every cell
    # expected = 5*5*1e6//10 = 2_500_000
    # chi2 = (10*5 - 5*5)^2 * 1e6 // (10*5*5) = 625e6 // 250 = 2_500_000
    assert len(out) == 2
    by_term = {r.term: r for r in out}
    for r in by_term.values():
        assert r.obs == 5
        assert r.expected_micro == 2_500_000
        assert r.chi2_contrib_micro == 2_500_000
    # tie broken by term asc: ham before spam
    assert by_term["ham"].rk == 1 and by_term["spam"].rk == 2


def test_term_keyness_min_count_filter_shapes_marginals(spark):
    # 'rare' (count 2) is cut BEFORE marginals: n excludes its occurrences
    docs = _docs(
        spark,
        [(1, "x x x x x rare", "en"), (2, "x x x x x rare", "fr")],
    )
    out = term_keyness(
        docs,
        group_expr=F.when(F.col("lang") == "en", F.lit("A")).otherwise("B"),
        k=10,
        min_term_count=5,
    ).collect()
    assert {r.term for r in out} == {"x"}
    assert all(r.row_total == 10 for r in out)  # n counts only kept terms


def test_lexical_diversity_closed_form(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a b", "s1"),
            (2, "c d e f", "s2"),   # all distinct -> 0
            (3, "z", "s3"),         # single token -> guarded 0
        ],
        "doc_id LONG, text STRING, source STRING",
    )
    out = {
        r.source: r for r in lexical_diversity_simpson(docs).collect()
    }
    assert out["s1"].n_tokens == 3 and out["s1"].n_types == 2
    assert out["s1"].simpson_ppm == 2 * 1_000_000 // 6
    assert out["s2"].simpson_ppm == 0
    assert out["s3"].simpson_ppm == 0


def test_robust_scale_hand_traced(spark):
    df = spark.createDataFrame(
        [(i, "g", float(v)) for i, v in enumerate([10, 20, 30, 40])],
        "event_id LONG, event_type STRING, value DOUBLE",
    )
    out = {
        r.event_id: r
        for r in robust_scale(
            df, group_col="event_type", value_col="value", id_col="event_id"
        ).collect()
    }
    # n=4: q1 rank ceil(1)=1 -> 10, med rank 2 -> 20, q3 rank 3 -> 30
    r0 = out[0]
    assert (r0.q1_micro, r0.median_micro, r0.q3_micro) == (
        10_000_000, 20_000_000, 30_000_000,
    )
    assert out[3].scaled_ppm == 1_000_000       # (40-20)/(30-10)
    assert out[0].scaled_ppm == -500_000        # (10-20)/(30-10)
    assert out[1].scaled_ppm == 0


def test_robust_scale_zero_iqr_and_group_isolation(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 5.0), (3, "a", 5.0), (4, "b", 1.0), (5, "b", 9.0)],
        "event_id LONG, event_type STRING, value DOUBLE",
    )
    out = {
        r.event_id: r
        for r in robust_scale(
            df, group_col="event_type", value_col="value", id_col="event_id"
        ).collect()
    }
    assert all(out[i].scaled_ppm == 0 for i in (1, 2, 3))  # IQR 0 guard
    # group b: n=2 -> q1 rank 1 (=1.0), med rank 1 (=1.0), q3 rank 2 (=9.0)
    assert out[5].scaled_ppm == (9_000_000 - 1_000_000) * 1_000_000 // 8_000_000


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id LONG, embedding ARRAY<FLOAT>, label INT",
    )


def test_hard_negatives_mask_beats_post_filter(spark):
    # class-0 cluster of 4 tight points at origin, class-1 pair far away.
    # Every class-0 anchor's 2 nearest OVERALL are class-0 — a post-filter
    # on a label-blind top-2 would return nothing; the label-aware mask
    # must return the 2 class-1 points.
    rows = [
        (0, [0.0, 0.0], 0), (1, [0.001, 0.0], 0),
        (2, [0.0, 0.001], 0), (3, [0.001, 0.001], 0),
        (10, [5.0, 5.0], 1), (11, [5.001, 5.0], 1),
    ]
    df = _emb(spark, rows)
    out = hard_negative_mining(df, k=2, mode="arrow", rows_per_block=4).collect()
    for anchor in (0, 1, 2, 3):
        negs = {r.neg_id for r in out if r.vec_id == anchor}
        assert negs == {10, 11}
    for anchor in (10, 11):
        negs = {r.neg_id for r in out if r.vec_id == anchor}
        assert len(negs) == 2 and negs <= {0, 1, 2, 3}


def test_hard_negatives_arrow_matches_expr(spark, rng):
    vecs = rng.random((50, 5)).tolist()
    rows = [(i, v, i % 3) for i, v in enumerate(vecs)]
    df = _emb(spark, rows)
    a = sorted(map(tuple, hard_negative_mining(df, k=3, mode="expr").collect()))
    b = sorted(
        map(
            tuple,
            hard_negative_mining(
                df, k=3, mode="arrow", rows_per_block=16
            ).collect(),
        )
    )
    assert a == b and len(a) == 50 * 3


def test_hard_negatives_exact_bound_raises(spark):
    df = _emb(spark, [(i, [float(i)], i % 2) for i in range(20)])
    with pytest.raises(ValueError):
        hard_negative_mining(df, mode="arrow", max_exact_rows=10)


def test_hard_negatives_ann_on_separated_classes(spark):
    # two well-separated class blobs: ann hard negatives = the other blob
    rows = []
    for i in range(12):
        rows.append((i, [0.01 * i, 0.0], 0))
        rows.append((100 + i, [10.0 + 0.01 * i, 0.0], 1))
    df = _emb(spark, rows)
    out = hard_negative_mining(df, k=2, mode="ann", nlist=4, nprobe=4).collect()
    for r in out:
        assert (r.label == 0) == (r.neg_label == 1)
        assert (r.vec_id < 100) == (r.neg_id >= 100)
