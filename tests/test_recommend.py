"""item_item_cosine_topk: closed-form checks on tiny basket tables."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket_id long, item_id long")


def test_item_item_cosine_closed_form(spark):
    from pyrope_spark.operators.recommend import item_item_cosine_topk

    # baskets: {1,2}, {1,2}, {1,3} -> deg 1=3, 2=2, 3=1
    # c(1,2)=2, c(1,3)=1; cos2(1,2)=4/6, cos2(1,3)=1/3
    rows = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3)]
    out = {
        (r["item"], r["neighbor"]): r
        for r in item_item_cosine_topk(_baskets(spark, rows), k=5).collect()
    }
    assert out[(1, 2)]["cos2_micro"] == (4 * 1_000_000) // 6
    assert out[(1, 3)]["cos2_micro"] == 1_000_000 // 3
    assert out[(2, 1)]["cos2_micro"] == out[(1, 2)]["cos2_micro"]  # symmetric
    assert out[(1, 2)]["rank"] == 1 and out[(1, 3)]["rank"] == 2
    assert out[(1, 2)]["cooccur"] == 2
    # items 2 and 3 never co-occur -> no pair row either direction
    assert (2, 3) not in out and (3, 2) not in out


def test_item_item_cosine_dedups_repeat_lines_and_caps_k(spark):
    from pyrope_spark.operators.recommend import item_item_cosine_topk

    # duplicate (basket, item) lines must not inflate counts
    rows = [(10, 1), (10, 1), (10, 2), (10, 2)]
    out = item_item_cosine_topk(_baskets(spark, rows), k=5).collect()
    assert {(r["item"], r["neighbor"], r["cooccur"]) for r in out} == {
        (1, 2, 1),
        (2, 1, 1),
    }
    # cos2 = 1/1 -> exactly 1e6
    assert all(r["cos2_micro"] == 1_000_000 for r in out)

    # k caps neighbors: star item 1 co-occurs with 2..8, k=3 keeps 3 rows
    star = [(b, 1) for b in range(7)] + [(b, b + 2) for b in range(7)]
    topk = item_item_cosine_topk(_baskets(spark, star), k=3)
    assert topk.filter(F.col("item") == 1).count() == 3


def test_item_item_cosine_basket_cap_drops_mega_basket(spark):
    from pyrope_spark.operators.recommend import item_item_cosine_topk

    mega = [(99, i) for i in range(10)]  # one 10-item basket
    small = [(1, 1), (1, 2)]
    out = item_item_cosine_topk(
        _baskets(spark, mega + small), k=5, max_basket_size=5
    ).collect()
    # only the small basket survives -> exactly the (1,2) pair
    assert {(r["item"], r["neighbor"]) for r in out} == {(1, 2), (2, 1)}


def test_item_item_cosine_rank_is_cosine_order(spark):
    from pyrope_spark.operators.recommend import item_item_cosine_topk

    # item 1: neighbor 2 in 2/3 baskets (deg2=2), neighbor 3 in 1/3 (deg3=3)
    rows = [
        (10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3),
        (13, 3), (14, 3),
    ]
    got = {
        r["neighbor"]: r["rank"]
        for r in item_item_cosine_topk(_baskets(spark, rows), k=5)
        .filter(F.col("item") == 1)
        .collect()
    }
    c12 = 2 / math.sqrt(3 * 2)
    c13 = 1 / math.sqrt(3 * 3)
    assert c12 > c13
    assert got == {2: 1, 3: 2}


def test_als_recovers_planted_low_rank_matrix(spark):
    import numpy as np

    from pyrope_spark.operators.recommend import als_recommend_topk, train_als

    rng = np.random.default_rng(7)
    n_u, n_i, r = 30, 20, 3
    U = rng.normal(size=(n_u, r))
    V = rng.normal(size=(n_i, r))
    M = U @ V.T
    rows = [
        (u, i, float(M[u, i]))
        for u in range(n_u)
        for i in range(n_i)
        if (u * 31 + i * 17) % 10 < 8  # hold out ~20%
    ]
    held = [
        (u, i, float(M[u, i]))
        for u in range(n_u)
        for i in range(n_i)
        if (u * 31 + i * 17) % 10 >= 8
    ]
    train = spark.createDataFrame(rows, "user_id int, item_id int, rating float")
    test = spark.createDataFrame(held, "user_id int, item_id int, rating float")
    model = train_als(train, rank=3, reg=0.01, iters=12, seed=42)
    pred = model.transform(test)
    rmse = (
        pred.selectExpr("avg(pow(rating - prediction, 2)) AS mse")
        .collect()[0]["mse"]
        ** 0.5
    )
    # noiseless rank-3 matrix, rank-3 fit: held-out RMSE far under the
    # rating scale (|M| ~ sqrt(3) ~ 1.7)
    assert rmse < 0.35, rmse

    recs = als_recommend_topk(model, k=4)
    got = recs.filter(F.col("user_id") == 0).orderBy("rank").collect()
    assert len(got) == 4
    # scores are emitted in rank order (descending)
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_als_cold_start_rows_dropped(spark):
    from pyrope_spark.operators.recommend import train_als

    train = spark.createDataFrame(
        [(0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0), (1, 1, 1.0)],
        "user_id int, item_id int, rating float",
    )
    model = train_als(train, rank=2, iters=5, seed=1)
    test = spark.createDataFrame(
        [(0, 0, 1.0), (99, 0, 1.0)],  # user 99 unseen
        "user_id int, item_id int, rating float",
    )
    out = model.transform(test).collect()
    assert {r["user_id"] for r in out} == {0}


def test_item_item_cosine_inrow_matches_join_path(spark, monkeypatch):
    """r11: the in-row pair expansion must produce exactly the join path's
    neighbors (singleton baskets feed degrees but no pairs; duplicate
    (basket, item) rows collapse)."""
    import random

    from pyrope_spark.operators import recommend
    from pyrope_spark.operators.recommend import item_item_cosine_topk

    rng = random.Random(9)
    rows = [
        (b, rng.randrange(15))
        for b in range(80)
        for _ in range(rng.randrange(1, 6))
    ]
    rows += [(200, 3)]  # singleton basket
    baskets = spark.createDataFrame(rows, "basket_id long, item_id long")
    inrow = sorted(map(tuple, item_item_cosine_topk(baskets, k=4).collect()))
    monkeypatch.setattr(recommend, "ITEM_PAIRS_INROW_MAX_ITEMS", 0)
    joined = sorted(map(tuple, item_item_cosine_topk(baskets, k=4).collect()))
    assert inrow == joined and len(inrow) > 0
