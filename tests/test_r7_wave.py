"""Closed-form tests for the round-7 wave operators: hand-traced values,
tie-breaks, and guards (the registered-query gates cover corpus-scale
hash parity; these pin the arithmetic)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_t_closeness_hand_traced(spark):
    """Rows: class A = two sensitive-0 rows, class B = (1,1,2,2).
    Global (0:2, 1:2, 2:2), G=6, m=3. EMD(A)=0.5, EMD(B)=0.25 exactly."""
    from pyrope_spark.operators.privacy import t_closeness_report

    rows = [("A", 0), ("A", 0), ("B", 1), ("B", 1), ("B", 2), ("B", 2)]
    df = spark.createDataFrame(rows, "cls string, sv long")
    out = {
        r["cls"]: r
        for r in t_closeness_report(
            df, ["cls"], "sv", t_micro=300_000
        ).collect()
    }
    assert out["A"]["class_size"] == 2
    assert out["A"]["emd_micro"] == 500_000 and out["A"]["t_violation"]
    assert out["B"]["emd_micro"] == 250_000 and not out["B"]["t_violation"]


def test_t_closeness_single_value_domain_is_zero(spark):
    from pyrope_spark.operators.privacy import t_closeness_report

    df = spark.createDataFrame(
        [("A", 7), ("B", 7), ("B", 7)], "cls string, sv long"
    )
    out = t_closeness_report(df, ["cls"], "sv").collect()
    assert all(r["emd_micro"] == 0 and not r["t_violation"] for r in out)


def test_rate_burst_hand_traced(spark):
    """Windows 0..3 for one key: counts 1,1,1,9 with baseline_windows=2,
    factor 3x. Only window 3 bursts (9 vs trailing mean 1); windows 0-1
    have partial baselines and are never flagged."""
    from pyrope_spark.operators.temporal import rate_burst_windows

    rows = []
    eid = 0
    for w, c in ((0, 1), (1, 1), (2, 1), (3, 9)):
        for _ in range(c):
            rows.append(("k", 3600 * w + 5))
            eid += 1
    df = spark.createDataFrame(rows, "key string, es long").select(
        F.col("key").alias("event_type"), F.timestamp_seconds("es").alias("ts")
    )
    out = {
        r["win_start"] // 3600: r
        for r in rate_burst_windows(
            df, window_s=3600, baseline_windows=2, factor_micro=3_000_000
        ).collect()
    }
    assert len(out) == 4
    assert [out[w]["n_events"] for w in range(4)] == [1, 1, 1, 9]
    assert not out[0]["burst"] and out[0]["n_base"] == 0
    assert not out[1]["burst"] and out[1]["n_base"] == 1
    assert not out[2]["burst"] and out[2]["base_sum"] == 2
    assert out[3]["burst"] and out[3]["base_sum"] == 2


def test_rate_burst_dense_spine_fills_quiet_windows(spark):
    """A key quiet in window 1 still gets a spine row (count 0) — the
    baseline denominator never shrinks on gaps."""
    from pyrope_spark.operators.temporal import rate_burst_windows

    df = spark.createDataFrame(
        [("k", 5), ("k", 2 * 3600 + 5)], "event_type string, es long"
    ).select("event_type", F.timestamp_seconds("es").alias("ts"))
    out = rate_burst_windows(df, window_s=3600, baseline_windows=2).collect()
    assert sorted(r["win_start"] for r in out) == [0, 3600, 7200]
    quiet = [r for r in out if r["win_start"] == 3600][0]
    assert quiet["n_events"] == 0


def test_source_shingle_overlap_hand_traced(spark):
    """A='a b c' (bigrams {ab, bc}), B='b c d' ({bc, cd}): one common of
    three distinct -> jaccard 333333 ppm, containment 500000 each way."""
    from pyrope_spark.operators.dedup import source_shingle_overlap

    df = spark.createDataFrame(
        [("A", "a b c"), ("B", "b c d")], "source string, text string"
    )
    out = source_shingle_overlap(df, ngram_n=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("A", "B")
    assert r["n_a"] == 2 and r["n_b"] == 2 and r["n_common"] == 1
    assert r["jaccard_ppm"] == 333_333
    assert r["contain_a_ppm"] == 500_000 and r["contain_b_ppm"] == 500_000


def test_minhash_calibration_identical_docs_top_bucket(spark):
    """Two identical docs collide in every band, agree on all 16 signature
    components, and have exact Jaccard 1.0 — the calibration table's top
    row must say exactly that."""
    from pyrope_spark.operators.dedup import minhash_jaccard_calibration

    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "completely unrelated words entirely")],
        "doc_id long, text string",
    )
    out = minhash_jaccard_calibration(df, ngram_n=2).collect()
    top = [r for r in out if r["n_matching"] == 16]
    assert len(top) == 1
    r = top[0]
    assert r["n_pairs"] == 1
    assert r["est_jaccard_ppm"] == 1_000_000
    assert r["mean_exact_ppm"] == 1_000_000
    assert r["min_exact_ppm"] == r["max_exact_ppm"] == 1_000_000
    # and every bucket's mean sits between its min and max by construction
    assert all(
        rr["min_exact_ppm"] <= rr["mean_exact_ppm"] <= rr["max_exact_ppm"]
        for rr in out
    )


def test_ols_slope_perfect_line_and_zero_variance(spark):
    """y = 2x + 3 recovers slope 2e6 / intercept 3e6 exactly; a group with
    constant x emits NULLs (zero variance guard)."""
    from pyrope_spark.operators.analytics import ols_slope_by_group

    rows = [("lin", x, 2 * x + 3) for x in range(5)]
    rows += [("flat", 7, y) for y in (1, 5, 9)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {
        r["g"]: r
        for r in ols_slope_by_group(
            df, group_cols=("g",), x_col="x", y_col="y"
        ).collect()
    }
    assert out["lin"]["slope_micro"] == 2_000_000
    assert out["lin"]["intercept_micro"] == 3_000_000
    assert out["flat"]["slope_micro"] is None
    assert out["flat"]["intercept_micro"] is None


def test_embedding_norm_outliers_flags_exploded_vector(spark):
    """Four unit-ish vectors and one 10x vector: median norm2 = 1e6
    (milli-units), MAD = 0, only the exploded row flags."""
    from pyrope_spark.operators.similarity import embedding_norm_outliers

    rows = [(i, [1.0]) for i in range(4)] + [(4, [10.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in embedding_norm_outliers(df).collect()}
    assert out[0]["median_norm2"] == 1_000_000
    assert out[0]["mad"] == 0
    assert not any(out[i]["outlier"] for i in range(4))
    assert out[4]["outlier"] and out[4]["norm2"] == 100_000_000


def test_source_overlap_plan_is_keyed_join(spark):
    """The pair stage must join on the fingerprint key — never a
    cartesian/broadcast-nested-loop over the shingle tables."""
    from pyrope_spark.operators.dedup import source_shingle_overlap

    df = spark.createDataFrame(
        [(f"s{i % 3}", f"w{i} w{i + 1} w{i + 2} common text here")
         for i in range(60)],
        "source string, text string",
    )
    out = source_shingle_overlap(df, ngram_n=2)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lazy_mode_exposes_persist_handle_for_release(spark):
    """r8 ADVICE: with eager_checkpoint=False the corpus-sized shingle
    persist used to be unreachable (only clearCache() could free it).
    The result now carries it as _pyrope_cached_deps so the caller can
    unpersist exactly those blocks."""
    from pyrope_spark.operators.dedup import (
        ngram_novelty_per_doc,
        source_shingle_overlap,
    )

    df = spark.createDataFrame(
        [("s0", "a b c d e"), ("s1", "a b c x y"), (("s2"), "p q r s t")],
        "source string, text string",
    )
    out = source_shingle_overlap(df, ngram_n=2, eager_checkpoint=False)
    out.collect()
    (fps,) = out._pyrope_cached_deps
    assert fps.storageLevel.useMemory  # persisted and reachable
    fps.unpersist(blocking=True)
    assert not fps.storageLevel.useMemory  # released without clearCache

    docs = df.select(
        F.monotonically_increasing_id().alias("doc_id"), "text"
    )
    out2 = ngram_novelty_per_doc(docs, ngram_n=2, eager_checkpoint=False)
    out2.collect()
    (fps2,) = out2._pyrope_cached_deps
    fps2.unpersist(blocking=True)
    assert not fps2.storageLevel.useMemory
    # eager default exposes no handle (nothing left to release)
    eager = source_shingle_overlap(df, ngram_n=2)
    assert not hasattr(eager, "_pyrope_cached_deps")


def test_coverage_count_hand_traced(spark):
    """Values 50,30,10,10 (total 100): half is covered by 50 alone? cum
    before 50 is 0 < 50 -> counted; cum before 30 is 50, 50*1000 <
    100*500 is false -> exactly 1 member for p=500. For p=800: 50,30
    (cum_before 80*? -> 80 crossing at 30: before=50 < 80) -> 2."""
    from pyrope_spark.operators.analytics import coverage_count_by_group

    rows = [("g", "a", 50), ("g", "b", 30), ("g", "c", 10), ("g", "d", 10)]
    df = spark.createDataFrame(rows, "grp string, member string, v long")
    one = coverage_count_by_group(
        df, group_cols=("grp",), member_col="member", value_col="v",
        p_permille=500,
    ).collect()[0]
    assert one["n_members"] == 4 and one["total_value"] == 100
    assert one["n_for_p"] == 1
    two = coverage_count_by_group(
        df, group_cols=("grp",), member_col="member", value_col="v",
        p_permille=800,
    ).collect()[0]
    assert two["n_for_p"] == 2


def test_ma_crossover_detects_regime_turn(spark):
    """Flat series then a step-up: with short=2/long=4 the short mean rises
    through the long mean exactly once, direction 'up', and only days with
    BOTH frames full can signal."""
    from pyspark.sql import functions as F

    from pyrope_spark.operators.temporal import ma_crossover_signals

    vals = [10, 10, 10, 10, 10, 100, 100, 100]
    rows = [("k", d * 86400 + 10, v) for d, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, es long, v long").select(
        "key", F.timestamp_seconds("es").alias("ts"), F.col("v")
    )
    out = ma_crossover_signals(
        df, key_col="key", ts_col="ts", value_col="v",
        short_days=2, long_days=4,
    ).collect()
    ups = [r for r in out if r["direction"] == "up"]
    assert len(ups) == 1
    assert ups[0]["day"] == 5  # first step-up day: short mean 55 > long 32.5
    assert all(r["day"] >= 4 for r in out)  # day 3 is the first full frame


def test_behavioral_concentration_closed_forms(spark):
    """Single-type user -> 1e6; 2+2 split over two types -> (2+2)*1e6/12 =
    333333; single-event users are dropped by min_events."""
    from pyrope_spark.operators.analytics import behavioral_concentration

    rows = (
        [(1, "a")] * 3
        + [(2, "a"), (2, "a"), (2, "b"), (2, "b")]
        + [(3, "z")]
    )
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {r["user_id"]: r for r in behavioral_concentration(df).collect()}
    assert out[1]["simpson_micro"] == 1_000_000
    assert out[2]["simpson_micro"] == 333_333
    assert out[2]["n_types"] == 2
    assert 3 not in out


def test_interval_integrity_audit_closed_forms(spark):
    """u1: back-to-back rows (clean, filtered out); u2: overlap; u3: gap;
    u4: two open rows."""
    from pyspark.sql import functions as F

    from pyrope_spark.operators.scd import interval_integrity_audit

    rows = [
        (1, 0, 100), (1, 100, 200),          # clean chain
        (2, 0, 100), (2, 50, 200),           # overlap
        (3, 0, 100), (3, 200, 300),          # gap
        (4, 0, None), (4, 100, None),        # two open rows
    ]
    df = spark.createDataFrame(rows, "user_id long, s long, e long").select(
        "user_id",
        F.timestamp_seconds("s").alias("valid_from"),
        F.timestamp_seconds("e").alias("valid_to"),
    )
    out = {r["user_id"]: r for r in interval_integrity_audit(df).collect()}
    assert 1 not in out  # clean keys are not reported
    assert out[2]["n_overlaps"] == 1 and out[2]["n_gaps"] == 0
    assert out[3]["n_gaps"] == 1 and out[3]["n_overlaps"] == 0
    assert out[4]["n_open_rows"] == 2


def test_fd_discovery_matrix_closed_forms(spark):
    """a -> b holds (each a maps to one b); b -> a violated by b=10
    mapping to two a's; NULL is a countable dependent value."""
    from pyrope_spark.operators.profile import fd_discovery_matrix

    rows = [(1, 10), (1, 10), (2, 10), (3, None), (3, None)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = {
        (r["det_col"], r["dep_col"]): r
        for r in fd_discovery_matrix(df, ["a", "b"]).collect()
    }
    ab = out[("a", "b")]
    assert ab["holds"] and ab["n_determinants"] == 3
    ba = out[("b", "a")]
    assert not ba["holds"]
    assert ba["n_violating_dets"] == 1 and ba["violating_rows"] == 3
    assert ba["max_fanout"] == 2


def test_monthly_yoy_is_registered_and_exact(spark):
    """Hand-traced YoY: 2024-03 = 150 cents vs 2023-03 = 100 -> +50%."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    assert "monthly_yoy_revenue" in entry.queries()
    # direct expression check of the growth arithmetic on a 2-month frame
    df = spark.createDataFrame(
        [(100, 150)], "prev_year_cents long, rev_cents long"
    ).select(
        F.expr(
            "CAST((rev_cents - prev_year_cents) * 1000000 "
            "DIV prev_year_cents AS BIGINT)"
        ).alias("g")
    )
    assert df.collect()[0]["g"] == 500_000


def test_heatmap_and_newret_registered_arithmetic(spark):
    """dow formula: 1970-01-01 (epoch day 0) was a Thursday -> (0+4)%7=4;
    new-vs-returning: a user's first day splits exactly."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    assert "weekday_hour_heatmap" in entry.queries()
    assert "new_vs_returning_daily" in entry.queries()
    dow = spark.createDataFrame([(0,), (3,)], "d long").select(
        ((F.col("d") + 4) % 7).alias("dow")
    ).collect()
    assert [r["dow"] for r in dow] == [4, 0]  # Thu, Sun


def test_session_bounce_rate_closed_form(spark):
    """u1: events at t=0 ('view') and t=10000 ('click') -> two sessions,
    both bounces, entry types view/click; u2: two events 5 s apart
    starting with 'view' -> one session, no bounce."""
    from pyspark.sql import functions as F

    import __spark_entry__  # noqa: F401 — registered-query smoke
    from pyrope_spark.operators.temporal import sessionize

    rows = [
        (1, 1, 0, "view"), (1, 2, 10_000, "click"),
        (2, 3, 0, "view"), (2, 4, 5, "click"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, es long, event_type string"
    ).select("user_id", "event_id",
             F.timestamp_seconds("es").alias("ts"), "event_type")
    s = sessionize(ev, gap_s=1800, order_cols=["ts", "event_id"])
    per = s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.struct("ts", "event_id", "event_type"))["event_type"]
        .alias("entry"),
    ).collect()
    got = sorted((r["user_id"], r["n"], r["entry"]) for r in per)
    assert got == [(1, 1, "click"), (1, 1, "view"), (2, 2, "view")]


def test_recency_band_binlen_is_exact_integer_log2(spark):
    """band = length(bin(x)) - 1 == floor(log2(x)) for x >= 1, including
    exact powers of two where float log2 is 1-ulp fragile."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry

    assert "customer_recency_bands" in entry.queries()
    assert "supplier_assortment_breadth" in entry.queries()
    xs = [1, 2, 3, 4, 7, 8, 1023, 1024, 1025]
    df = spark.createDataFrame([(x,) for x in xs], "x long").select(
        "x", (F.expr("length(bin(x)) - 1")).cast("long").alias("band")
    )
    import math

    got = {r["x"]: r["band"] for r in df.collect()}
    assert got == {x: int(math.log2(x)) for x in xs}
