"""Count-min sketch (operators/sketch.py) — over-estimate guarantee,
collision behavior, unseen terms, and sketch-table shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyrope_spark.functions.text import tokens
from pyrope_spark.operators.sketch import cms_build, cms_estimate


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _exact(docs):
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("exact"))
    )


def test_cms_overestimates_never_under(spark):
    docs = _docs(
        spark,
        ["apple banana apple cherry", "banana apple durian", "cherry cherry apple"],
    )
    sketch = cms_build(docs, depth=4, width=64)
    exact = _exact(docs)
    est = cms_estimate(sketch, exact.select("term"), depth=4, width=64)
    rows = est.join(exact, "term").collect()
    assert len(rows) == 4
    for r in rows:
        assert r["est_count"] >= r["exact"]


def test_cms_exact_at_wide_width(spark):
    # width >> distinct terms: collisions vanishingly unlikely for this
    # fixed vocabulary -> estimates equal exact counts
    docs = _docs(spark, ["alpha beta alpha", "beta gamma alpha"])
    sketch = cms_build(docs, depth=4, width=4096)
    exact = _exact(docs)
    rows = cms_estimate(sketch, exact.select("term"), depth=4, width=4096) \
        .join(exact, "term").collect()
    assert all(r["est_count"] == r["exact"] for r in rows)
    assert {r["term"]: r["exact"] for r in rows} == {
        "alpha": 3, "beta": 2, "gamma": 1,
    }


def test_cms_width_one_sums_everything(spark):
    # degenerate width=1: every term collides into one counter per row,
    # so every estimate equals the total token count
    docs = _docs(spark, ["a b c", "d e"])
    sketch = cms_build(docs, depth=2, width=1)
    exact = _exact(docs)
    rows = cms_estimate(sketch, exact.select("term"), depth=2, width=1).collect()
    assert all(r["est_count"] == 5 for r in rows)


def test_cms_unseen_term_zero(spark):
    docs = _docs(spark, ["only these words"])
    sketch = cms_build(docs, depth=4, width=1024)
    terms = spark.createDataFrame([("absent",)], "term string")
    row = cms_estimate(sketch, terms, depth=4, width=1024).collect()[0]
    # width 1024 vs 3 distinct terms: no collision in any of 4 rows
    assert row["est_count"] == 0


def test_cms_sketch_table_bounded(spark):
    docs = _docs(spark, ["w%d w%d" % (i, i % 7) for i in range(50)])
    sketch = cms_build(docs, depth=3, width=32)
    assert sketch.count() <= 3 * 32
    # total mass per row d equals the token stream length
    per_d = {r["d"]: r["s"] for r in
             sketch.groupBy("d").agg(F.sum("cnt").alias("s")).collect()}
    assert set(per_d) == {0, 1, 2} and all(v == 100 for v in per_d.values())


def test_bloom_no_false_negatives(spark):
    from pyrope_spark.operators.sketch import bloom_build, bloom_might_contain

    terms = spark.createDataFrame(
        [("t%d" % i,) for i in range(200)], "term string"
    )
    bloom = bloom_build(terms, n_bits=1 << 14, n_hashes=4)
    out = bloom_might_contain(bloom, terms, n_bits=1 << 14, n_hashes=4)
    assert all(r["might_contain"] for r in out.collect())


def test_bloom_rejects_most_unseen(spark):
    from pyrope_spark.operators.sketch import bloom_build, bloom_might_contain

    build = spark.createDataFrame([("in%d" % i,) for i in range(100)], "term string")
    probes = spark.createDataFrame([("out%d" % i,) for i in range(500)], "term string")
    bloom = bloom_build(build, n_bits=1 << 16, n_hashes=4)
    out = bloom_might_contain(bloom, probes, n_bits=1 << 16, n_hashes=4)
    hits = sum(1 for r in out.collect() if r["might_contain"])
    # 100 keys in 65536 bits, 4 hashes: fp rate << 1%; allow slack
    assert hits <= 5


def test_bloom_bits_bounded(spark):
    from pyrope_spark.operators.sketch import bloom_build

    terms = spark.createDataFrame([("x%d" % i,) for i in range(1000)], "term string")
    bloom = bloom_build(terms, n_bits=64, n_hashes=3)
    assert bloom.count() <= 64


# ---------------------------------------------------------------- HLL

def _keys_df(spark, n, prefix="k", group=None):
    rows = [(group or "g", f"{prefix}{i}") for i in range(n)]
    return spark.createDataFrame(rows, "grp string, key string")


def test_hll_merge_equals_full_build(spark):
    """build(even) merged with build(odd) == build(all) EXACTLY (register
    tables are integer state; merge is lossless)."""
    from pyrope_spark.operators.sketch import hll_build, hll_merge

    df = _keys_df(spark, 400)
    even = df.filter(F.expr("substring(key, 2) % 2 = 0"))
    odd = df.filter(F.expr("substring(key, 2) % 2 = 1"))
    merged = hll_merge(
        hll_build(even, "key", group_cols=("grp",), p=8),
        hll_build(odd, "key", group_cols=("grp",), p=8),
        group_cols=("grp",),
    )
    full = hll_build(df, "key", group_cols=("grp",), p=8)
    key = lambda d: sorted((r["grp"], r["bucket"], r["rho"]) for r in d.collect())
    assert key(merged) == key(full)


def test_hll_estimate_accuracy_p8(spark):
    """p=8 (m=256, sigma ~6.5%): estimate within 20% of 2000 distinct keys,
    duplicates absorbed."""
    from pyrope_spark.operators.sketch import hll_build, hll_estimate

    df = _keys_df(spark, 2000)
    df = df.union(df.limit(500))  # duplicates must not inflate
    est = hll_estimate(
        hll_build(df, "key", group_cols=("grp",), p=8), group_cols=("grp",), p=8
    ).collect()[0]
    assert abs(est["est_distinct"] - 2000) / 2000 < 0.20
    assert est["m"] == 256


def test_hll_linear_counting_small_range(spark):
    """30 distinct keys at p=8: the small-range correction branch (raw <=
    2.5m, empty registers) engages and lands near exact."""
    from pyrope_spark.operators.sketch import hll_build, hll_estimate

    df = _keys_df(spark, 30)
    est = hll_estimate(
        hll_build(df, "key", group_cols=("grp",), p=8), group_cols=("grp",), p=8
    ).collect()[0]
    assert est["zero_registers"] > 0
    assert abs(est["est_distinct"] - 30) / 30 < 0.30


def test_hll_grouped_and_register_ranges(spark):
    from pyrope_spark.operators.sketch import HLL_UBITS, hll_build, hll_estimate

    a = _keys_df(spark, 100, group="a")
    b = _keys_df(spark, 1000, prefix="x", group="b")
    sk = hll_build(a.union(b), "key", group_cols=("grp",), p=6)
    regs = sk.collect()
    bw = HLL_UBITS - 6
    assert all(0 <= r["bucket"] < 64 for r in regs)
    assert all(1 <= r["rho"] <= bw + 1 for r in regs)
    est = {r["grp"]: r["est_distinct"] for r in hll_estimate(
        sk, group_cols=("grp",), p=6
    ).collect()}
    # group separation: b's estimate must be well above a's
    assert est["b"] > 3 * est["a"]


# ---------------------------------------------------------------- bottom-k

def test_bottomk_merge_equals_full(spark):
    """bottomk(A U B) == merge(bottomk(A), bottomk(B)) EXACTLY."""
    from pyrope_spark.operators.sketch import bottomk_merge, bottomk_sample

    df = spark.createDataFrame(
        [(i, float(i % 37)) for i in range(500)], "id long, value double"
    )
    a = df.filter(F.col("id") % 2 == 0)
    b = df.filter(F.col("id") % 2 == 1)
    merged = bottomk_merge(
        bottomk_sample(a, 50, id_col="id", keep_cols=("value",)),
        bottomk_sample(b, 50, id_col="id", keep_cols=("value",)),
        50,
    )
    full = bottomk_sample(df, 50, id_col="id", keep_cols=("value",))
    key = lambda d: sorted((r["_bk_id"], r["value"]) for r in d.collect())
    assert key(merged) == key(full)
    assert merged.count() == 50


def test_bottomk_layout_independent_and_grouped(spark):
    from pyrope_spark.operators.sketch import bottomk_sample

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), float(i)) for i in range(300)],
        "id long, grp string, value double",
    )
    s1 = bottomk_sample(df, 20, id_col="id", keep_cols=("value",), group_cols=("grp",))
    s2 = bottomk_sample(
        df.repartition(11), 20, id_col="id", keep_cols=("value",), group_cols=("grp",)
    )
    key = lambda d: sorted((r["grp"], r["_bk_id"]) for r in d.collect())
    assert key(s1) == key(s2)
    counts = {r["grp"]: r["n"] for r in s1.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()}
    assert counts == {"g0": 20, "g1": 20, "g2": 20}


def test_bottomk_quantile_accuracy(spark):
    """Sample quantiles land near exact on a 10k-row uniform column
    (k=400 -> rank error ~ 1/sqrt(k) ~ 5%)."""
    from pyrope_spark.operators.analytics import nearest_rank_percentiles
    from pyrope_spark.operators.sketch import bottomk_sample

    df = spark.createDataFrame(
        [(i, float((i * 7919) % 10000)) for i in range(10000)],
        "id long, value double",
    )
    s = bottomk_sample(df, 400, id_col="id", keep_cols=("value",))
    got = nearest_rank_percentiles(s, "value", None, [0.5, 0.9]).collect()[0]
    assert abs(got["p50"] - 5000) < 800
    assert abs(got["p90"] - 9000) < 800


def test_bottomk_k_larger_than_population(spark):
    from pyrope_spark.operators.sketch import bottomk_sample

    df = spark.createDataFrame([(i,) for i in range(5)], "id long")
    assert bottomk_sample(df, 100, id_col="id").count() == 5


def test_cms_join_cardinality_overestimates_and_tracks_exact(spark):
    from pyrope_spark.operators.sketch import cms_build, cms_join_cardinality

    a_docs = _docs(spark, ["apple banana cherry"] * 5 + ["durian fig"])
    b_docs = _docs(spark, ["apple apple banana", "grape melon"])
    a, b = cms_build(a_docs, width=4096), cms_build(b_docs, width=4096)
    est = cms_join_cardinality(a, b).collect()[0]["est_join_rows"]
    # exact inner product: apple 5*2=10? a has 5 'apple', b has 2 -> 10;
    # banana 5*1=5 -> total 15
    assert est >= 15           # CMS never underestimates the inner product
    assert est <= 15 + 40      # and stays near it at this width


def test_hll_empty_and_single_key(spark):
    from pyrope_spark.operators.sketch import hll_build, hll_estimate

    one = spark.createDataFrame([("g", "k")], "grp string, key string")
    est = hll_estimate(
        hll_build(one, "key", group_cols=("grp",), p=8), group_cols=("grp",), p=8
    ).collect()[0]
    # linear counting: m*ln(m/(m-1)) ~ 1
    assert 0.5 < est["est_distinct"] < 2.5
    empty = one.filter("1=0")
    assert hll_build(empty, "key", group_cols=("grp",), p=8).count() == 0


def test_bottomk_keeps_extra_columns(spark):
    from pyrope_spark.operators.sketch import bottomk_sample

    df = spark.createDataFrame(
        [(i, float(i), f"m{i}") for i in range(50)],
        "id long, value double, meta string",
    )
    s = bottomk_sample(df, 10, id_col="id", keep_cols=("value", "meta"))
    row = s.collect()[0]
    assert row["meta"].startswith("m") and isinstance(row["value"], float)


def test_hll_rolling_merge_equals_window_rebuild(spark):
    """Trailing-window register merge == registers built directly on the
    window's rows (the semilattice property, rolling form)."""
    from datetime import date

    from pyspark.sql import functions as F

    from pyrope_spark.operators.sketch import hll_build, hll_rolling_merge

    rows = []
    for d in range(10):
        for u in range(20 * (d + 1)):
            rows.append((date(2024, 1, 1 + d), f"u{u % 97}-{d % 3}"))
    df = spark.createDataFrame(rows, "day date, user string")
    daily = hll_build(df, "user", group_cols=("day",))
    merged = hll_rolling_merge(daily, "day", window_days=3)
    # rebuild: per spine day, registers over the union of its 3-day rows
    spine = [r["day"] for r in df.select("day").distinct().collect()]
    for d in sorted(spine)[3:6]:
        win = df.filter(
            (F.col("day") > F.lit(d) - F.expr("INTERVAL 3 DAY"))
            & (F.col("day") <= F.lit(d))
        )
        direct = {
            (r["bucket"], r["rho"])
            for r in hll_build(win, "user").collect()
        }
        got = {
            (r["bucket"], r["rho"])
            for r in merged.filter(F.col("day") == F.lit(d)).collect()
        }
        assert got == direct


def test_moments_merge_equals_full_build(spark):
    """Partials from an arbitrary split merge into EXACTLY the full-scan
    sketch (commutative monoid), incl. the decimal sum of squares."""
    from pyspark.sql import functions as F

    from pyrope_spark.operators.sketch import (
        moments_build,
        moments_merge,
        moments_stats,
    )

    rows = [("k", i, float(i) * 1.25) for i in range(101)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    full = moments_build(df, "g", "v").collect()[0]
    a = moments_build(df.filter(F.col("id") % 3 == 0), "g", "v")
    b = moments_build(df.filter(F.col("id") % 3 != 0), "g", "v")
    merged = moments_merge(a, b).collect()[0]
    assert (merged["n"], merged["s1"], merged["s2"]) == (
        full["n"], full["s1"], full["s2"],
    )
    st = moments_stats(moments_merge(a, b)).collect()[0]
    # closed form: values i*1.25 micro = 1250000*i, i=0..100
    s1 = 1_250_000 * sum(range(101))
    s2 = sum((1_250_000 * i) ** 2 for i in range(101))
    assert st["s1"] == s1 and int(st["s2"]) == s2
    assert int(st["var_numerator"]) == 101 * s2 - s1 * s1
    assert st["mean_micro"] == s1 // 101


# --------------------------------------------------------------------------
# KMV set-operation overlap estimates
# --------------------------------------------------------------------------


def _kmv_events(spark, n_a, n_b, n_both):
    """Synthetic membership log: ids 0..n_a-1 in A, n_a-n_both..n_a-n_both+n_b-1
    in B (so exactly n_both ids sit in both)."""
    rows = [(i, "click") for i in range(n_a)]
    rows += [(i, "purchase") for i in range(n_a - n_both, n_a - n_both + n_b)]
    return spark.createDataFrame(
        [(uid, t) for uid, t in rows], "user_id long, event_type string"
    )


def test_kmv_unsaturated_sketch_is_exact(spark):
    from pyrope_spark.operators.sketch import kmv_overlap

    ev = _kmv_events(spark, n_a=20, n_b=15, n_both=5)
    r = kmv_overlap(ev, type_a="click", type_b="purchase", k=64).collect()[0]
    # |union| = 30 < k: the sketch IS the set — everything exact.
    assert r["k_used"] == 30 and r["n_union_sketch"] == 30
    assert r["union_est"] == r["exact_union"] == 30
    assert r["n_both"] == r["exact_both"] == 5
    assert r["jaccard_ppm"] == r["exact_jaccard_ppm"] == 5 * 1_000_000 // 30
    assert r["intersection_est"] == 5


def test_kmv_saturated_estimates_within_error(spark):
    from pyrope_spark.operators.sketch import kmv_overlap

    # union = 2000 ids, 1000 shared; k = 128 -> relative error ~1/sqrt(k)
    ev = _kmv_events(spark, n_a=1500, n_b=1500, n_both=1000)
    r = kmv_overlap(ev, type_a="click", type_b="purchase", k=128).collect()[0]
    assert r["k_used"] == 128
    assert r["exact_union"] == 2000 and r["exact_both"] == 1000
    assert abs(r["union_est"] - 2000) < 600          # ~3.4 sigma
    assert abs(r["jaccard_ppm"] - 500_000) < 150_000
    assert abs(r["intersection_est"] - 1000) < 500


def test_kmv_disjoint_and_identical_segments(spark):
    from pyrope_spark.operators.sketch import kmv_overlap

    disjoint = _kmv_events(spark, n_a=40, n_b=40, n_both=0)
    r = kmv_overlap(disjoint, type_a="click", type_b="purchase", k=32).collect()[0]
    assert r["n_both"] == 0 and r["jaccard_ppm"] == 0
    assert r["intersection_est"] == 0

    same = _kmv_events(spark, n_a=50, n_b=50, n_both=50)
    r2 = kmv_overlap(same, type_a="click", type_b="purchase", k=32).collect()[0]
    assert r2["jaccard_ppm"] == 1_000_000
    assert r2["exact_jaccard_ppm"] == 1_000_000


def test_kmv_layout_independence(spark):
    from pyrope_spark.operators.sketch import kmv_overlap

    ev = _kmv_events(spark, n_a=300, n_b=300, n_both=100)
    a = kmv_overlap(ev, type_a="click", type_b="purchase", k=64).collect()[0]
    b = kmv_overlap(
        ev.repartition(7), type_a="click", type_b="purchase", k=64
    ).collect()[0]
    assert a.asDict() == b.asDict()
