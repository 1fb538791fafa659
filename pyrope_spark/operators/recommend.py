"""Co-occurrence recommenders over basket tables.

Not in the reference's surface (its "recommendation" analog is the Markov
prefetch rule miner, ``src/Pyrope.AISidecar/prefetch_engine.py`` — ported in
operators/analytics.py); this adds the classic item-item collaborative
filter a query/usage-log pipeline builds next: cosine similarity between
items from the user/basket incidence matrix, top-k neighbors per item.

Scale shape: one distinct pass + one self-join on the basket key. Pair
fanout is sum over baskets of C(|basket|, 2), so the optional
``max_basket_size`` cap bounds the explosion a priori (the degenerate
"everything bought in one mega-order" basket contributes quadratically and
carries no signal — the same a-priori-bound discipline as
``ngram_jaccard_pairs.max_shingle_df``). Scores are exact integers:
cos^2(i,j) = c(i,j)^2 / (deg_i * deg_j) in micro-units via DIV — monotone
in cosine (counts are non-negative), so ranking by it IS ranking by cosine,
and no sqrt ever runs on either engine. At int64 limits (c > 3e6 with the
1e6 scale) promote the numerator to DECIMAL(38,0); the gate's counts sit
far below that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# in-row pair expansion bound: C(256,2) = 32,640 structs per basket row
# (~1 MB) caps the per-row array the explode path materializes; bigger
# baskets take the streaming self-join path (same bounded-fan-out
# judgment as frequent_triples / ngram_jaccard_pairs)
ITEM_PAIRS_INROW_MAX_ITEMS = 256


def item_item_cosine_topk(
    baskets: DataFrame,
    *,
    basket_col: str = "basket_id",
    item_col: str = "item_id",
    k: int = 5,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Top-k most-similar items per item by co-occurrence cosine.

    cos(i,j) = c(i,j) / sqrt(deg_i * deg_j) where c = #baskets containing
    both, deg = #baskets containing the item. Emits every item's k nearest
    neighbors ordered by (cos2_micro desc, cooccur desc, neighbor asc) —
    a total order, since the neighbor id is unique within an item.

    Output: (item BIGINT, neighbor BIGINT, rank BIGINT, cooccur BIGINT,
    cos2_micro BIGINT = floor(1e6 * c^2 / (deg_i * deg_j))).
    """
    # NULL basket/item rows carry no co-occurrence signal and would be
    # dropped silently by the null-unsafe self-join below — drop them
    # explicitly so the contract is visible (advisor r5 lesson: never let
    # an inner join be the implicit NULL policy)
    # r11 opt (guide §2.4): ONE groupBy(basket) collect_set replaces
    # distinct + the 3 consumers re-running it (deg + both self-join
    # sides); pairs expand IN-ROW from the sorted distinct item list when
    # the measured max basket size is bounded (the frequent_triples /
    # triangle_copurchase pattern), falling back to the streaming
    # self-join for adversarial basket sizes. Values unchanged.
    lists = (
        baskets.select(
            F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it")
        )
        .na.drop(subset=["_bk", "_it"])
        .groupBy("_bk")
        .agg(F.sort_array(F.collect_set("_it")).alias("_is"))
    )
    if max_basket_size is not None:
        # == the old distinct-count-per-basket cap: _is is the distinct set
        lists = lists.filter(F.size("_is") <= max_basket_size)
    lists = lists.localCheckpoint(eager=True)
    max_n = lists.agg(F.max(F.size("_is")).alias("m")).first()["m"] or 0
    deg = (
        lists.select(F.explode("_is").alias("_it"))
        .groupBy("_it")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    if max_n <= ITEM_PAIRS_INROW_MAX_ITEMS:
        # size >= 2: singleton baskets feed deg but have no pairs (and
        # sequence(0, -1) would generate a DESCENDING range, not empty)
        pairs = (
            lists.filter(F.size("_is") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(sequence(0, size(_is) - 2),"
                        " i -> transform(sequence(i + 1, size(_is) - 1),"
                        " j -> struct(_is[i] AS _ia, _is[j] AS _ib))))"
                    )
                ).alias("p")
            )
            .select("p._ia", "p._ib")
            .groupBy("_ia", "_ib")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
    else:
        b = lists.select("_bk", F.explode("_is").alias("_it"))
        la = b.select(F.col("_bk"), F.col("_it").alias("_ia"))
        lb = b.select(F.col("_bk"), F.col("_it").alias("_ib"))
        pairs = (
            la.join(lb, "_bk")
            .filter(F.col("_ia") < F.col("_ib"))
            .groupBy("_ia", "_ib")
            .agg(F.count("*").alias("_c"))
        )
    scored = (
        pairs.join(deg.select(F.col("_it").alias("_ia"), F.col("_deg").alias("_da")), "_ia")
        .join(deg.select(F.col("_it").alias("_ib"), F.col("_deg").alias("_db")), "_ib")
        .withColumn("_s", F.expr("_c * _c * 1000000 DIV (_da * _db)"))
    )
    # one pass emits both orientations — the unionByName form re-ran the
    # pairs aggregate + deg joins once per branch (guide §1.2)
    sym = scored.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("_ia").alias("item"),
                    F.col("_ib").alias("neighbor"),
                    F.col("_c").alias("_c"),
                    F.col("_s").alias("_s"),
                ),
                F.struct(
                    F.col("_ib").alias("item"),
                    F.col("_ia").alias("neighbor"),
                    F.col("_c").alias("_c"),
                    F.col("_s").alias("_s"),
                ),
            )
        ).alias("_p")
    ).select("_p.item", "_p.neighbor", "_p._c", "_p._s")
    w = Window.partitionBy("item").orderBy(
        F.col("_s").desc(), F.col("_c").desc(), F.col("neighbor")
    )
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("item").cast("long").alias("item"),
            F.col("neighbor").cast("long").alias("neighbor"),
            F.col("rank").cast("long").alias("rank"),
            F.col("_c").cast("long").alias("cooccur"),
            F.col("_s").cast("long").alias("cos2_micro"),
        )
    )


def item_item_cosine_topk_oracle_sql(
    *,
    baskets_sql: str,
    k: int = 5,
) -> str:
    """DuckDB twin of [[item_item_cosine_topk]]. ``baskets_sql`` must yield
    (basket_id, item_id) rows (duplicates allowed; DISTINCT applied here)."""
    return f"""
WITH b AS (SELECT DISTINCT basket_id AS bk, item_id AS it FROM ({baskets_sql})),
deg AS (SELECT it, COUNT(*) AS d FROM b GROUP BY it),
pairs AS (
  SELECT a.it AS ia, c.it AS ib, COUNT(*) AS cc
  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it
  GROUP BY a.it, c.it
),
scored AS (
  SELECT ia, ib, cc, cc * cc * 1000000 // (da.d * db.d) AS s
  FROM pairs JOIN deg da ON pairs.ia = da.it JOIN deg db ON pairs.ib = db.it
),
sym AS (
  SELECT ia AS item, ib AS neighbor, cc, s FROM scored
  UNION ALL
  SELECT ib AS item, ia AS neighbor, cc, s FROM scored
),
ranked AS (
  SELECT item, neighbor, cc, s,
         row_number() OVER (PARTITION BY item
                            ORDER BY s DESC, cc DESC, neighbor) AS rk
  FROM sym
)
SELECT CAST(item AS BIGINT) AS item, CAST(neighbor AS BIGINT) AS neighbor,
       CAST(rk AS BIGINT) AS rank, CAST(cc AS BIGINT) AS cooccur,
       CAST(s AS BIGINT) AS cos2_micro
FROM ranked WHERE rk <= {k}
"""


def train_als(
    ratings: DataFrame,
    *,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rating_col: str = "rating",
    rank: int = 8,
    reg: float = 0.05,
    iters: int = 10,
    implicit: bool = False,
    seed: int = 42,
):
    """Seeded MLlib ALS fit — the latent-factor complement to the
    co-occurrence [[item_item_cosine_topk]] (which cannot rank items a user
    never co-bought). Distributed normal-equation solves per user/item
    block; no driver-side matrix ever materializes. Iterative least squares
    has no relational oracle form — gated by a pytest reconstruction-error
    bound on a planted low-rank matrix (the HNSW/bandit precedent).

    ``coldStartStrategy='drop'``: score rows for users/items unseen at fit
    time are dropped, not NaN-filled — NaN would poison downstream
    aggregates silently.
    """
    from pyspark.ml.recommendation import ALS

    als = ALS(
        userCol=user_col,
        itemCol=item_col,
        ratingCol=rating_col,
        rank=rank,
        regParam=reg,
        maxIter=iters,
        implicitPrefs=implicit,
        seed=seed,
        coldStartStrategy="drop",
        nonnegative=False,
    )
    return als.fit(ratings)


def als_recommend_topk(model, *, k: int = 5) -> DataFrame:
    """Top-k item recommendations per user from a [[train_als]] model,
    flattened to (user_id, item_id, rank, score) rows. MLlib's
    recommendForAllUsers is a blocked GEMM over the factor tables —
    executor-side, linear in users x rank."""
    recs = model.recommendForAllUsers(k)
    user_col = model.getUserCol()
    return recs.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.posexplode("recommendations").alias("_pos", "_rec"),
    ).select(
        "user_id",
        F.col("_rec.%s" % model.getItemCol()).cast("long").alias("item_id"),
        (F.col("_pos") + 1).cast("long").alias("rank"),
        F.col("_rec.rating").alias("score"),
    )
