"""Closed-form tests for personalized PageRank, Tukey outlier fences, and
the difference-hash (round-6 session-5 wave 3)."""

from __future__ import annotations

import numpy as np
import pytest

from pyrope_spark.operators.curation import tukey_outliers
from pyrope_spark.operators.graph import (
    pagerank_fixed_iters,
    personalized_pagerank_fixed_iters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src LONG, dst LONG")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node LONG")


def test_ppr_mass_concentrates_near_seeds(spark):
    # two disconnected 3-cycles; seeding in cycle A must leave cycle B
    # with zero rank (rows dropped), unlike global pagerank
    a = [(1, 2), (2, 3), (3, 1)]
    b = [(11, 12), (12, 13), (13, 11)]
    e = _edges(spark, a + b)
    out = {r.node: r.rank_micro for r in
           personalized_pagerank_fixed_iters(e, _seeds(spark, [1]), iters=3).collect()}
    assert set(out) <= {1, 2, 3}
    assert out[1] > 0
    glob = {r.node for r in pagerank_fixed_iters(e, iters=3).collect()}
    assert {11, 12, 13} <= glob  # global PR does rank cycle B


def test_ppr_hand_traced_single_seed_chain(spark):
    # chain 1 -> 2 -> 3, seed {1}, damping 85, scale 1e6, 1 iteration:
    # r0 = {1: 1_000_000}; contribution to 2 = 85*1e6 // 100 = 850_000;
    # base on seed 1 = 15*1e6 // 100 = 150_000
    e = _edges(spark, [(1, 2), (2, 3)])
    out = {r.node: r.rank_micro for r in
           personalized_pagerank_fixed_iters(e, _seeds(spark, [1]), iters=1, scale=1_000_000).collect()}
    assert out == {1: 150_000, 2: 850_000}
    # iteration 2: node 2's mass flows to 3: 85*850000//100 = 722_500
    out2 = {r.node: r.rank_micro for r in
            personalized_pagerank_fixed_iters(e, _seeds(spark, [1]), iters=2, scale=1_000_000).collect()}
    assert out2 == {1: 150_000, 2: 127_500, 3: 722_500}


def test_ppr_empty_seed_raises(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        personalized_pagerank_fixed_iters(e, _seeds(spark, []))


def test_tukey_fences_closed_form(spark):
    # group g: values 1..11 plus outlier 100. n=12: q1 rank ceil(3)=3 -> 3,
    # q3 rank 9 -> 9, IQR=6; high fence 9 + 9 = 18 -> only 100 flagged;
    # low fence 3 - 9 = -6 -> nothing
    vals = list(range(1, 12)) + [100]
    df = spark.createDataFrame(
        [(i, "g", float(v)) for i, v in enumerate(vals)],
        "event_id LONG, event_type STRING, value DOUBLE",
    )
    out = {r.vm // 1_000_000: r for r in tukey_outliers(
        df, group_col="event_type", value_col="value", id_col="event_id"
    ).collect()}
    assert out[100].high_outlier == 1 and out[100].low_outlier == 0
    assert all(out[v].high_outlier == 0 for v in range(1, 12))
    assert all(out[v].low_outlier == 0 for v in range(1, 12))


def test_tukey_low_fence_and_half_step(spark):
    # values 10..20 (n=11) plus -50: q1 rank 3, q3 rank 9.
    vals = list(range(10, 21)) + [-50]
    df = spark.createDataFrame(
        [(i, "g", float(v)) for i, v in enumerate(vals)],
        "event_id LONG, event_type STRING, value DOUBLE",
    )
    rows = tukey_outliers(
        df, group_col="event_type", value_col="value", id_col="event_id"
    ).collect()
    flagged = {r.vm // 1_000_000 for r in rows if r.low_outlier == 1}
    assert flagged == {-50}


def test_dhash_gradient_bits_closed_form(spark):
    from pyrope_spark.multimodal.columns import image_dhash, synth_ppm_from_text

    # strictly increasing char codes left-to-right in each row -> every
    # g[r][c] < g[r][c+1] -> all 64 bits zero
    inc = "".join(chr(33 + p) for p in range(72))
    # strictly decreasing -> all bits one
    dec = "".join(chr(120 - p) for p in range(72))
    docs = spark.createDataFrame(
        [(1, inc), (2, dec)], "media_id LONG, text STRING"
    )
    ppm = synth_ppm_from_text(docs, h=8, w=9)
    out = {int(r.media_id): r for r in image_dhash(ppm).collect()}
    assert (out[1].dhash_lo, out[1].dhash_hi) == (0, 0)
    assert (out[2].dhash_lo, out[2].dhash_hi) == (2**32 - 1, 2**32 - 1)


def test_dhash_brightness_invariance_vs_ahash(spark):
    from pyrope_spark.multimodal.columns import (
        image_ahash,
        image_dhash,
        ppm_decoder,
        synth_ppm_from_text,
    )

    # dHash depends only on left-right ORDER, so any brightness offset
    # that preserves pairwise order preserves the hash
    base = "".join(chr(40 + ((p * 7) % 50)) for p in range(72))
    shifted = "".join(chr(ord(c) + 60) for c in base)
    docs = spark.createDataFrame(
        [(1, base), (2, shifted)], "media_id LONG, text STRING"
    )
    ppm = synth_ppm_from_text(docs, h=8, w=9)
    out = {int(r.media_id): (r.dhash_lo, r.dhash_hi)
           for r in image_dhash(ppm).collect()}
    assert out[1] == out[2]


def test_dhash_rejects_bad_dims(spark):
    from pyrope_spark.multimodal.columns import image_dhash, synth_ppm_from_text

    docs = spark.createDataFrame([(1, "abcdef")], "media_id LONG, text STRING")
    ppm = synth_ppm_from_text(docs, h=8, w=8)  # w not multiple of 9
    with pytest.raises(Exception):
        image_dhash(ppm).collect()
