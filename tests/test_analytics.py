from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from pyrope_spark.operators.analytics import (
    latency_histogram,
    markov_rules,
    nearest_rank_percentiles,
    usage_metering,
    write_heat,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "sess string, ts int, cluster int")


def test_markov_planted_transition(spark):
    """F7: planted A->B with count >= 3 forms a rule; < 3 does not;
    self-transitions ignored (prediction_engine.py:22-31,57-66)."""
    rows = []
    t = 0
    for _ in range(3):  # A->B x3
        rows += [("s1", (t := t + 1), 1), ("s1", (t := t + 1), 2)]
    rows += [("s1", (t := t + 1), 1), ("s1", (t := t + 1), 1)]  # self-transition noise
    rows += [("s2", 1, 5), ("s2", 2, 6), ("s2", 3, 5), ("s2", 4, 6)]  # only 2x each
    df = _events(spark, rows)
    rules = markov_rules(
        df, session_cols=["sess"], cluster_col="cluster", order_cols=["ts"]
    ).collect()
    got = {(r["sess"], r["current"]): (r["next"], r["cnt"]) for r in rules}
    assert got.get(("s1", 1)) == (2, 3)
    assert ("s2", 5) not in got and ("s2", 6) not in got


def test_markov_tiebreak_smallest_next(spark):
    rows = []
    t = 0
    for nxt in (7, 3):  # 1->7 x3 and 1->3 x3: tie, expect 3
        for _ in range(3):
            rows += [("s", (t := t + 1), 1), ("s", (t := t + 1), nxt)]
    df = _events(spark, rows)
    rules = markov_rules(
        df, session_cols=["sess"], cluster_col="cluster", order_cols=["ts"]
    ).collect()
    got = {r["current"]: r["next"] for r in rules}
    assert got[1] == 3


def test_nearest_rank_percentiles(spark):
    """LatencySummary.cs nearest-rank: rank = ceil(p*n), 1-indexed."""
    vals = [float(v) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    row = nearest_rank_percentiles(df, "v").collect()[0]
    assert row["p50"] == 50.0  # ceil(0.5*100)=50
    assert row["p95"] == 95.0
    assert row["p99"] == 99.0
    small = spark.createDataFrame([(10.0,), (20.0,), (30.0,)], "v double")
    r2 = nearest_rank_percentiles(small, "v").collect()[0]
    assert r2["p50"] == 20.0  # ceil(1.5)=2nd
    assert r2["p99"] == 30.0


def test_usage_metering(spark):
    df = spark.createDataFrame(
        [("t1", True, 1.0), ("t1", False, 2.0), ("t2", True, 0.5)],
        "tenant string, hit boolean, cost double",
    )
    got = {
        r["tenant"]: r
        for r in usage_metering(
            df, tenant_col="tenant", hit_col=F.col("hit"), cost_units_col=F.col("cost"),
            cost_unit_seconds=2.0,
        ).collect()
    }
    assert got["t1"]["requests"] == 2
    assert got["t1"]["cache_hits"] == 1
    assert got["t1"]["compute_cost_units"] == 3.0
    assert got["t1"]["compute_seconds"] == 6.0


def test_write_heat_threshold(spark):
    base = datetime(2024, 1, 1)
    rows = [(base + timedelta(seconds=i), 1) for i in range(12)]  # 12 writes in 60s
    rows += [(base + timedelta(seconds=i * 30), 2) for i in range(4)]  # spread out
    df = spark.createDataFrame(rows, "ts timestamp, cluster int")
    hot = write_heat(df, cluster_col="cluster", ts_col="ts", window_s=60, threshold=10).collect()
    assert [(r["cluster"], r["writes"]) for r in hot] == [(1, 12)]


def test_latency_histogram_cumulative(spark):
    df = spark.createDataFrame([(0.5,), (3.0,), (40.0,), (600.0,)], "v double")
    row = latency_histogram(df, "v").collect()[0]
    assert row["le_1_0"] == 1
    assert row["le_5_0"] == 2
    assert row["le_50_0"] == 3
    assert row["le_500_0"] == 3
    assert row["le_inf"] == 4


def test_multi_granularity_rollup_levels_and_plan(spark):
    """All three ladder levels agree with their separate-aggregate values,
    and the plan is ONE Expand + aggregates — not a union of scans."""
    from datetime import datetime

    from pyrope_spark.operators.analytics import multi_granularity_rollup

    rows = [
        ("click", datetime(2024, 1, 1, 5), 1.0),
        ("click", datetime(2024, 1, 1, 9), 2.0),
        ("click", datetime(2024, 1, 2, 5), 4.0),
        ("view", datetime(2024, 1, 1, 6), 8.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {(r["event_type"], r["day"]): r for r in multi_granularity_rollup(df).collect()}
    assert out[("click", "2024-01-01")]["n_events"] == 2
    assert out[("click", "2024-01-01")]["sum_value"] == 3.0
    assert out[("click", "(all)")]["n_events"] == 3
    assert out[("click", "(all)")]["sum_value"] == 7.0
    assert out[("(all)", "(all)")]["n_events"] == 4
    assert out[("(all)", "(all)")]["sum_value"] == 15.0
    assert out[("(all)", "(all)")]["lvl"] == 3
    assert out[("click", "2024-01-02")]["lvl"] == 0
    plan = multi_granularity_rollup(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1 and "Union" not in plan


def test_two_pass_quantiles_match_sort_based(spark):
    """The histogram-refinement path == the full-sort nearest-rank path on
    awkward inputs (duplicates, skew, tiny buckets)."""
    import numpy as np

    from pyrope_spark.operators.analytics import (
        exact_quantiles_two_pass,
        nearest_rank_percentiles,
    )

    r = np.random.default_rng(9)
    vals = np.concatenate([
        r.integers(0, 50, 3000).astype(float),      # duplicates
        r.normal(1000, 1, 200),                     # far-away cluster
        np.full(500, 7.0),                          # heavy single value
    ])
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    ps = [0.1, 0.5, 0.9, 0.95, 0.99]
    two = {r2["p"]: r2["value"] for r2 in exact_quantiles_two_pass(
        df, "v", ps, n_buckets=64
    ).collect()}
    ref = nearest_rank_percentiles(df, "v", None, ps).collect()[0]
    for p in ps:
        assert two[p] == ref[f"p{int(p * 100)}"], p


def test_two_pass_quantiles_constant_and_empty(spark):
    import pytest

    from pyrope_spark.operators.analytics import exact_quantiles_two_pass

    const = spark.createDataFrame([(5.0,)] * 20, "v double")
    got = {r["p"]: r["value"] for r in exact_quantiles_two_pass(
        const, "v", [0.5, 0.99]
    ).collect()}
    assert got == {0.5: 5.0, 0.99: 5.0}
    with pytest.raises(ValueError, match="empty"):
        exact_quantiles_two_pass(const.filter("1=0"), "v")


def test_categorical_stats_mode_ties_and_gini(spark):
    from pyrope_spark.operators.analytics import categorical_stats

    df = spark.createDataFrame(
        [("u1", "a"), ("u1", "a"), ("u1", "b"), ("u1", "b"), ("u1", "c"),
         ("u2", "z")],
        "g string, cat string",
    )
    out = {r["g"]: r for r in categorical_stats(df, ["g"], "cat").collect()}
    # tie a/b at 2 -> lexicographic winner 'a'
    assert out["u1"]["mode_value"] == "a" and out["u1"]["mode_count"] == 2
    assert out["u1"]["mode_share"] == 0.4
    assert out["u1"]["n_categories"] == 3
    # gini = 1 - (4+4+1)/25 = 0.64
    assert out["u1"]["gini_impurity"] == 0.64
    assert out["u2"]["gini_impurity"] == 0.0 and out["u2"]["mode_share"] == 1.0


# ------------------------------------------------- association rules

def test_association_rules_exact_counts(spark):
    from pyrope_spark.operators.analytics import item_association_rules

    rows = [
        # basket 1: {10, 20, 30}; basket 2: {10, 20}; basket 3: {10, 40}
        (1, 10), (1, 20), (1, 30), (1, 10),   # duplicate event collapses
        (2, 10), (2, 20),
        (3, 10), (3, 40),
    ]
    ev = spark.createDataFrame(rows, "user_id long, item long")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in item_association_rules(ev, min_support=1).collect()
    }
    r = out[(10, 20)]
    assert (r["n_ab"], r["n_a"], r["n_b"], r["n_baskets"]) == (2, 3, 2, 3)
    assert r["conf_a_to_b"] == round(2 / 3, 6)
    assert r["conf_b_to_a"] == 1.0
    assert r["lift"] == 1.0  # 2*3 / (3*2)
    assert (10, 30) in out and (20, 30) in out and (10, 40) in out
    # a<b canonicalization: no reversed duplicates
    assert all(a < b for (a, b) in out)


def test_association_rules_basket_cap_prunes_whale(spark):
    from pyrope_spark.operators.analytics import item_association_rules

    rows = [(1, i) for i in range(100)] + [(2, 1), (2, 2), (2, 3)]
    ev = spark.createDataFrame(rows, "user_id long, item long")
    out = item_association_rules(ev, min_support=1, max_basket_items=5)
    pairs = out.count()
    # whale basket contributes C(5,2)=10 pairs, small one C(3,2)=3;
    # overlap {1,2} vs whale's kept top-5 {0..4} -> (1,2),(1,3),(2,3) shared
    assert pairs <= 13
    # deterministic cap: most-frequent then smallest item -> whale keeps 0..4
    kept_a = {r["item_a"] for r in out.collect()}
    assert max(kept_a) <= 4


def test_rfm_segments_tiles_and_code(spark):
    """RFM quintiles: known 10-customer frame -> deterministic tile
    boundaries (ntile over metric+custkey total order), rfm_code packs
    r*100+f*10+m, monetary in exact integer cents."""
    from pyrope_spark.operators.analytics import rfm_segments

    rows = []
    base = datetime(2024, 1, 1)
    for c in range(1, 11):
        # customer c: c orders, each 10.50, last order day c
        for k in range(c):
            rows.append((100 + c, base + timedelta(days=c), 10.50))
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    out = {r["custkey"]: r for r in rfm_segments(orders, n_tiles=5).collect()}
    assert len(out) == 10
    # customer 110: most recent (recency 0), most orders, most spend
    top = out[110]
    assert top["recency_days"] == 0
    assert top["frequency"] == 10
    assert top["monetary_cents"] == 10 * 1050
    assert (top["r_score"], top["f_score"], top["m_score"]) == (1, 1, 1)
    assert top["rfm_code"] == 111
    # customer 101: oldest, fewest, least spend -> bottom tile on all axes
    bot = out[101]
    assert bot["recency_days"] == 9
    assert (bot["r_score"], bot["f_score"], bot["m_score"]) == (5, 5, 5)
    # ntile(5) over 10 rows -> exactly 2 per tile on every axis
    from collections import Counter

    for axis in ("r_score", "f_score", "m_score"):
        assert Counter(r[axis] for r in out.values()) == {
            1: 2, 2: 2, 3: 2, 4: 2, 5: 2
        }


def test_skyline_2d_frontier(spark):
    """Hand frontier: dominated rows drop, duplicates keep first by
    tiebreak, incomparable rows all survive."""
    from pyrope_spark.operators.analytics import skyline_2d

    rows = [
        (1, 10, 5),   # frontier (cheapest)
        (2, 10, 5),   # duplicate of 1 -> dominated (weak), id 1 wins
        (3, 20, 9),   # frontier (bigger)
        (4, 20, 7),   # dominated by 3 (same price, smaller)
        (5, 30, 9),   # dominated by 3 (pricier, same size)
        (6, 40, 12),  # frontier
        (7, 5, 1),    # frontier (cheapest of all)
    ]
    df = spark.createDataFrame(rows, "id long, price long, size long")
    out = {r["id"] for r in skyline_2d(df, "price", "size", "id").collect()}
    assert out == {7, 1, 3, 6}


def test_groupwise_trend_exact_slope(spark):
    """y = 3x + 7 exactly -> slope_micro == 3e6, noisy flat key ~ 0,
    single-x key -> NULL slope (den 0)."""
    from pyrope_spark.operators.analytics import groupwise_trend

    rows = [("up", x, 3 * x + 7) for x in range(10)]
    rows += [("flat", x, 5) for x in range(10)]
    rows += [("point", 4, 9), ("point", 4, 11)]
    df = spark.createDataFrame(rows, "k string, x long, y long")
    out = {r["k"]: r for r in groupwise_trend(df, "k", "x", "y").collect()}
    assert out["up"]["slope_micro"] == 3_000_000
    assert out["up"]["num"] == 3 * out["up"]["den"]
    assert out["flat"]["slope_micro"] == 0 and out["flat"]["num"] == 0
    assert out["point"]["slope_micro"] is None and out["point"]["den"] == 0


def test_groupwise_trend_negative_slope_portable_div(spark):
    """Negative slope: sign handled outside the div (truncate-vs-floor
    portability) — -2x series gives exactly -2e6."""
    from pyrope_spark.operators.analytics import groupwise_trend

    rows = [("down", x, 100 - 2 * x) for x in range(7)]
    df = spark.createDataFrame(rows, "k string, x long, y long")
    r = groupwise_trend(df, "k", "x", "y").collect()[0]
    assert r["slope_micro"] == -2_000_000


# --------------------------------------------------------------------------
# Apriori k=3 frequent triples
# --------------------------------------------------------------------------


def test_frequent_triples_closed_form(spark):
    from pyrope_spark.operators.analytics import frequent_triples

    # baskets: {1,2,3} x3, {1,2,4} x2, {5,6,7} x1
    rows = []
    bid = 0
    for _ in range(3):
        rows += [(bid, i) for i in (1, 2, 3)]
        bid += 1
    for _ in range(2):
        rows += [(bid, i) for i in (1, 2, 4)]
        bid += 1
    rows += [(bid, i) for i in (5, 6, 7)]
    df = spark.createDataFrame(rows, "bid long, item long")
    out = frequent_triples(
        df, basket_col="bid", item_col="item", min_support=2
    ).collect()
    got = {(r["item_a"], r["item_b"], r["item_c"]): r["support"] for r in out}
    # (1,2,3) support 3; (1,2,4) support 2; (5,6,7) support 1 -> dropped
    assert got == {(1, 2, 3): 3, (1, 2, 4): 2}


def test_frequent_triples_prune_is_lossless(spark):
    from pyrope_spark.operators.analytics import frequent_triples

    # random-ish small corpus: pruned path must equal the brute-force count
    import itertools
    import random

    rnd = random.Random(5)
    baskets = {b: sorted(rnd.sample(range(12), rnd.randint(2, 6)))
               for b in range(40)}
    rows = [(b, i) for b, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, "bid long, item long")
    out = frequent_triples(
        df, basket_col="bid", item_col="item", min_support=3
    ).collect()
    got = {(r["item_a"], r["item_b"], r["item_c"]): r["support"] for r in out}

    brute = {}
    for items in baskets.values():
        for t in itertools.combinations(items, 3):
            brute[t] = brute.get(t, 0) + 1
    brute = {t: c for t, c in brute.items() if c >= 3}
    assert got == brute


def test_frequent_triples_duplicate_rows_and_cap(spark):
    from pyrope_spark.operators.analytics import frequent_triples

    # duplicate (basket, item) rows collapse; cap keeps top-N per basket
    rows = [(1, 1), (1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 3)]
    df = spark.createDataFrame(rows, "bid long, item long")
    out = frequent_triples(
        df, basket_col="bid", item_col="item", min_support=2,
        max_basket_items=3,
    ).collect()
    assert {(r["item_a"], r["item_b"], r["item_c"]): r["support"]
            for r in out} == {(1, 2, 3): 2}


def test_ab_conversion_test_hand_traced(spark):
    from pyspark.sql import functions as F

    from pyrope_spark.operators.analytics import ab_conversion_test

    # variant 0: 4 users, 2 convert; variant 1: 4 users, 1 converts
    rows = []
    for u in range(8):
        rows.append((u, "view"))
    for u in (0, 2, 5):   # u0,u2 -> variant 0; u5 -> variant 1
        rows.append((u, "purchase"))
    df = spark.createDataFrame(rows, "user_id LONG, event_type STRING")
    r = ab_conversion_test(
        df,
        variant_expr=(F.col("user_id") % 2).cast("long"),
        convert_expr=(F.col("event_type") == "purchase"),
    ).collect()[0]
    assert (r.na, r.ca, r.nb, r.cb) == (4, 2, 4, 1)
    assert r.rate_a_ppm == 500_000 and r.rate_b_ppm == 250_000
    # z2 = (2*4-1*4)^2 * 8 * 1000 / (4*4*3*5) = 16*8000/240 = 533
    assert r.z2_milli == 533
    # sanity vs the float formula
    pa, pb, p = 0.5, 0.25, 3 / 8
    z2 = (pa - pb) ** 2 / (p * (1 - p) * (1 / 4 + 1 / 4))
    assert abs(r.z2_milli / 1000 - z2) < 1e-3


def test_ab_conversion_degenerate_guards(spark):
    from pyspark.sql import functions as F

    from pyrope_spark.operators.analytics import ab_conversion_test

    # everyone converts -> pooled variance 0 -> guarded z2 = 0
    rows = [(u, "purchase") for u in range(4)]
    df = spark.createDataFrame(rows, "user_id LONG, event_type STRING")
    r = ab_conversion_test(
        df,
        variant_expr=(F.col("user_id") % 2).cast("long"),
        convert_expr=(F.col("event_type") == "purchase"),
    ).collect()[0]
    assert r.z2_milli == 0 and r.rate_a_ppm == 1_000_000


def test_transition_matrix_closed_form(spark):
    from datetime import datetime, timedelta

    from pyrope_spark.operators.analytics import transition_matrix

    base = datetime(2024, 1, 1)
    # u1: a -> b -> b ; u2: a -> b  (self-loop b->b counted)
    rows = [
        (1, 1, "a", base), (2, 1, "b", base + timedelta(seconds=1)),
        (3, 1, "b", base + timedelta(seconds=2)),
        (4, 2, "a", base), (5, 2, "b", base + timedelta(seconds=1)),
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP"
    )
    out = {(r.prev_state, r.next_state): r for r in transition_matrix(df).collect()}
    assert out[("a", "b")].cnt == 2
    assert out[("b", "b")].cnt == 1
    assert out[("a", "b")].prob_ppm == 1_000_000   # a always -> b
    assert out[("b", "b")].prob_ppm == 1_000_000
    # no cross-user transition (u1's last b never chains to u2's a)
    assert ("b", "a") not in out


def test_dau_mau_stickiness_closed_form(spark):
    from datetime import datetime, timedelta

    from pyrope_spark.operators.analytics import dau_mau_stickiness

    base = datetime(2024, 1, 1)
    rows = []
    # day 0: users 1,2; day 1: user 1 (twice -> still DAU 1); day 40: user 3
    rows += [(1, base), (2, base)]
    rows += [(1, base + timedelta(days=1)), (1, base + timedelta(days=1, hours=2))]
    rows += [(3, base + timedelta(days=40))]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
    out = {r.day - min(x.day for x in dau_mau_stickiness(df).collect()): r
           for r in dau_mau_stickiness(df).collect()}
    d0, d1, d40 = out[0], out[1], out[40]
    assert (d0.dau, d0.mau) == (2, 2)
    assert (d1.dau, d1.mau) == (1, 2)          # trailing window keeps u2
    assert d1.stickiness_ppm == 500_000
    assert (d40.dau, d40.mau) == (1, 1)        # day 0/1 fell out of 28d
    assert d40.stickiness_ppm == 1_000_000


def test_lorenz_deciles_closed_form(spark):
    from pyrope_spark.operators.analytics import lorenz_curve_deciles

    # 10 members, values 1..10: deciles are single members; total 55
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], "id LONG, v DOUBLE"
    )
    out = sorted(
        lorenz_curve_deciles(df, id_col="id", value_col="v").collect(),
        key=lambda r: r.bucket,
    )
    assert [r.bucket for r in out] == list(range(10))
    assert all(r.n_members == 1 for r in out)
    assert out[0].share_ppm == 1_000_000 // 55
    assert out[-1].share_ppm == 10_000_000 // 55
    assert out[-1].cum_share_ppm == 1_000_000
    # cumulative shares are convex (Lorenz property on sorted values)
    shares = [r.share_ppm for r in out]
    assert shares == sorted(shares)


def test_lorenz_equal_values_even_shares(spark):
    from pyrope_spark.operators.analytics import lorenz_curve_deciles

    df = spark.createDataFrame(
        [(i, 5.0) for i in range(20)], "id LONG, v DOUBLE"
    )
    out = lorenz_curve_deciles(df, id_col="id", value_col="v").collect()
    assert all(r.n_members == 2 for r in out)
    assert all(r.share_ppm == 100_000 for r in out)


def test_lorenz_values_are_micro_exact_beyond_double(spark):
    """values_are_micro=True (r7 ADVICE flag) takes already-integer units
    as-is — exact past the 2^53/1e6 double bound that the default
    floor-micro path documents."""
    from pyrope_spark.operators.analytics import lorenz_curve_deciles

    big = 9_100_000_000_000  # > 2^53/1e6 * 1e6 after the x1e6 step
    df = spark.createDataFrame(
        [(i, big + i) for i in range(1, 11)], "id LONG, v LONG"
    )
    out = sorted(
        lorenz_curve_deciles(
            df, id_col="id", value_col="v", values_are_micro=True
        ).collect(),
        key=lambda r: r.bucket,
    )
    total = sum(big + i for i in range(1, 11))
    assert [r.bucket_value_micro for r in out] == [
        big + i for i in range(1, 11)
    ]
    assert out[-1].share_ppm == (big + 10) * 1_000_000 // total
    assert out[-1].cum_share_ppm == 1_000_000


def test_lorenz_values_are_micro_fractional_cross_engine(spark):
    """r8 ADVICE: a DOUBLE column with fractional values under
    values_are_micro=True must agree across engines — Spark's bare
    cast('long') truncates toward zero while DuckDB's CAST AS BIGINT
    rounds half away, so both sides now share an exact floor.  Asserted
    by running the DuckDB twin on identical rows."""
    import duckdb
    import pandas as pd

    from pyrope_spark.operators.analytics import (
        lorenz_curve_deciles,
        lorenz_curve_oracle_sql,
    )

    # fractional + negative values: the truncate/round divergence zone
    vals = [2.7, -2.7, 0.5, -0.5, 1.5, 3.9, -1.1, 9.99, 0.0, 7.5]
    df = spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(vals)], "id LONG, v DOUBLE"
    )
    got = sorted(
        (r.bucket, r.n_members, r.bucket_value_micro, r.share_ppm,
         r.cum_value_micro, r.cum_share_ppm)
        for r in lorenz_curve_deciles(
            df, id_col="id", value_col="v", values_are_micro=True
        ).collect()
    )
    con = duckdb.connect()
    con.register(
        "t", pd.DataFrame({"id": range(1, 11), "v": vals})
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                lorenz_curve_oracle_sql(
                    id_sql="id", value_sql="v", table="t",
                    values_are_micro=True,
                )
            ).fetchall(),
        )
    )
    assert got == want
