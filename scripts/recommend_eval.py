#!/usr/bin/env python
"""Recommender quality eval: leave-last-out hit-rate@k on a synthetic
preference corpus with planted structure (users belong to one of G taste
groups; each group draws from its own zipf-ish item pool with a small
cross-pool leak). For each user the LAST basket item is held out; a hit =
the held-out item appears in the top-k neighbors of the user's previous
item (item-item path) / the user's top-k ALS recommendations.

Both recommenders see identical training rows. A popularity baseline
(global top-k items) calibrates how much structure the models actually
learn. Results recorded in RECALL.md. One JSON line at the end.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pyrope_spark.session import get_spark  # noqa: E402

N_USERS = 2_000
N_ITEMS = 500
GROUPS = 5
PER_USER = 12
K = 10


def synth(rng):
    """(user, item) interactions: per user one taste group; items drawn
    zipf-ish from the group's 100-item pool, 10% leak from anywhere."""
    rows = []
    for u in range(N_USERS):
        g = u % GROUPS
        pool_lo = g * (N_ITEMS // GROUPS)
        for _ in range(PER_USER):
            if rng.random() < 0.1:
                item = int(rng.integers(0, N_ITEMS))
            else:
                item = pool_lo + int(
                    (rng.random() ** 2) * (N_ITEMS // GROUPS)
                )
            rows.append((u, item))
    return rows


def main():
    spark = get_spark()
    from pyrope_spark.operators.recommend import (
        als_recommend_topk,
        item_item_cosine_topk,
        train_als,
    )

    rng = np.random.default_rng(97)
    rows = synth(rng)
    # leave-last-out: the final interaction per user is the test target
    train, test = [], {}
    seen = {}
    for u, it in rows:
        seen.setdefault(u, []).append(it)
    for u, items in seen.items():
        *head, last = items
        if not head or last in head:
            continue  # need a fresh held-out item
        train.extend((u, i) for i in head)
        test[u] = (head[-1], last)  # (context item, target)

    tr = spark.createDataFrame(train, "user_id long, item_id long").cache()
    tr.count()
    out = {"n_users_eval": len(test), "k": K}

    # popularity baseline
    top_pop = [
        r["item_id"]
        for r in tr.groupBy("item_id")
        .count()
        .orderBy(F.desc("count"), "item_id")
        .limit(K)
        .collect()
    ]
    out["hit_rate_popularity"] = round(
        sum(1 for _, (_c, t) in test.items() if t in set(top_pop)) / len(test), 4
    )

    # item-item cosine: neighbors of the user's last TRAIN item
    nbrs = item_item_cosine_topk(
        tr.select(F.col("user_id").alias("basket_id"), "item_id"), k=K
    )
    nb = {}
    for r in nbrs.collect():
        nb.setdefault(r["item"], []).append(r["neighbor"])
    hits = sum(
        1 for _u, (ctx, tgt) in test.items() if tgt in set(nb.get(ctx, []))
    )
    out["hit_rate_item_item"] = round(hits / len(test), 4)

    # ALS on implicit 1.0 ratings
    model = train_als(
        tr.withColumn("rating", F.lit(1.0).cast("float")),
        rank=16,
        reg=0.05,
        iters=10,
        implicit=True,
        seed=42,
    )
    recs = als_recommend_topk(model, k=K)
    rec_map = {}
    for r in recs.collect():
        rec_map.setdefault(r["user_id"], []).append(r["item_id"])
    hits = sum(
        1 for u, (_c, tgt) in test.items() if tgt in set(rec_map.get(u, []))
    )
    out["hit_rate_als"] = round(hits / len(test), 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
