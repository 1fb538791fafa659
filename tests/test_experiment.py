"""Closed-form tests for the experimentation/model-eval operators
(pyrope_spark/operators/experiment.py): hand-computed statistics on
tiny inputs, partition-layout invariance, and determinism."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from pyrope_spark.operators.experiment import (
    calibration_bins,
    calibration_ece,
    cohens_kappa,
    cuped_adjusted_lift,
    mann_whitney_u,
    poisson_bootstrap_mean,
    price_volume_mix,
)

T0 = datetime(2024, 1, 1)


def _events(spark, rows):
    """rows: (event_id, ts_offset_min, user_id, event_type, value)"""
    return spark.createDataFrame(
        [
            (eid, T0 + timedelta(minutes=mins), uid, et, float(v))
            for eid, mins, uid, et, v in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


# ------------------------------------------------------------- Mann-Whitney

def test_mann_whitney_closed_form_no_ties(spark):
    # values 1..6 in cents; group 1 holds {4,5,6}: R1 = 15, U1 = 9,
    # z^2 = (9-4.5)^2 / (9*7/12) = 3.857...
    df = spark.createDataFrame(
        [(v, 1 if v >= 4 else 0) for v in range(1, 7)], "v long, g long"
    )
    row = mann_whitney_u(
        df, group_expr=F.col("g"), value_cents_expr=F.col("v")
    ).collect()[0]
    assert (row.n0, row.n1) == (3, 3)
    assert row.u1_x2 == 18  # 2*U1
    assert row.tie_term == 0
    assert row.z2_milli == 3857  # 3000*81 // (9*7)
    # untied data: tie-corrected form equals the untied one up to the
    # documented two-floor-div chain (here exactly: W = (n+1)n(n-1))
    assert abs(row.z2_tc_milli - row.z2_milli) <= 1


def test_mann_whitney_symmetric_ties(spark):
    # both groups see the same multiset {1,1,2}: D = 0, z2 = 0;
    # tie term: value 1 has t=4 (60), value 2 has t=2 (6)
    rows = [(1, 0), (1, 0), (2, 0), (1, 1), (1, 1), (2, 1)]
    df = spark.createDataFrame(rows, "v long, g long")
    row = mann_whitney_u(
        df, group_expr=F.col("g"), value_cents_expr=F.col("v")
    ).collect()[0]
    assert row.tie_term == (4**3 - 4) + (2**3 - 2)
    assert row.z2_milli == 0 and row.z2_tc_milli == 0


def test_mann_whitney_partition_invariance(spark):
    import random

    r = random.Random(7)
    rows = [(r.randint(0, 50), i % 2) for i in range(500)]
    df = spark.createDataFrame(rows, "v long, g long")
    a = mann_whitney_u(
        df.coalesce(1), group_expr=F.col("g"), value_cents_expr=F.col("v")
    ).collect()[0]
    b = mann_whitney_u(
        df.repartition(8), group_expr=F.col("g"), value_cents_expr=F.col("v")
    ).collect()[0]
    assert a.asDict() == b.asDict()


# -------------------------------------------------------------------- CUPED

def test_cuped_perfect_covariate_removes_lift(spark):
    # y = 2x per user; variant 0 users have LOWER pre-period x, so the
    # raw diff is all pre-existing: theta = 2 exactly, adjusted diff 0.
    rows = []
    for uid, x, y in [(1, 10, 20), (2, 20, 40), (3, 30, 60), (4, 40, 80)]:
        rows.append((uid * 10, 0, uid, "view", x / 100))  # pre (day 1)
        rows.append((uid * 10 + 1, 40000, uid, "view", y / 100))  # post
    ev = _events(spark, rows)
    out = cuped_adjusted_lift(
        ev,
        variant_expr=(F.col("user_id") % 2).cast("long"),
        pre_expr=F.col("ts") < F.lit("2024-01-16").cast("timestamp"),
        value_cents_expr=F.floor(F.col("value") * 100).cast("long"),
    ).collect()[0]
    # variant0 = users 2,4 (x 20,40); variant1 = users 1,3 (x 10,30)
    assert (out.na, out.nb) == (2, 2)
    assert out.theta_ppm == 2_000_000
    assert out.raw_diff_micro == 20_000_000  # meanY0 60 - meanY1 40
    assert out.adj_diff_micro == 0
    assert out.adj_a_micro == out.adj_b_micro == 50_000_000


def test_cuped_zero_variance_covariate_guard(spark):
    # constant x -> denominator 0 -> theta 0, adjusted == raw
    rows = []
    for uid in range(1, 5):
        rows.append((uid * 10, 0, uid, "view", 0.10))
        rows.append((uid * 10 + 1, 40000, uid, "view", uid / 100))
    ev = _events(spark, rows)
    out = cuped_adjusted_lift(
        ev,
        variant_expr=(F.col("user_id") % 2).cast("long"),
        pre_expr=F.col("ts") < F.lit("2024-01-16").cast("timestamp"),
        value_cents_expr=F.floor(F.col("value") * 100).cast("long"),
    ).collect()[0]
    assert out.theta_ppm == 0
    assert out.adj_diff_micro == out.raw_diff_micro


# -------------------------------------------------------------- calibration

def test_calibration_bins_closed_form(spark):
    # one user, events P N N P: trailing scores for events 2..4 are
    # 1/1=1e6 (label 0), 1/2=5e5 (label 0), 1/3=333333 (label 1)
    rows = [
        (1, 0, 7, "purchase", 1.0),
        (2, 1, 7, "view", 1.0),
        (3, 2, 7, "view", 1.0),
        (4, 3, 7, "purchase", 1.0),
    ]
    ev = _events(spark, rows)
    bins = {
        r.bin: r
        for r in calibration_bins(
            ev, label_expr=F.col("event_type") == "purchase"
        ).collect()
    }
    assert set(bins) == {3, 5, 9}
    assert bins[9].n == 1 and bins[9].avg_score_ppm == 1_000_000
    assert bins[9].emp_ppm == 0 and bins[9].gap_ppm == 1_000_000
    assert bins[5].avg_score_ppm == 500_000 and bins[5].emp_ppm == 0
    assert bins[3].avg_score_ppm == 333_333
    assert bins[3].emp_ppm == 1_000_000
    assert bins[3].gap_ppm == 333_333 - 1_000_000


def test_calibration_ece_closed_form(spark):
    rows = [
        (1, 0, 7, "purchase", 1.0),
        (2, 1, 7, "view", 1.0),
        (3, 2, 7, "view", 1.0),
        (4, 3, 7, "purchase", 1.0),
    ]
    ev = _events(spark, rows)
    out = calibration_ece(
        ev, label_expr=F.col("event_type") == "purchase"
    ).collect()[0]
    # n=3 scored events; ece = (1e6 + 5e5 + 666667)//3
    assert out.n == 3
    assert out.ece_ppm == (1_000_000 + 500_000 + 666_667) // 3
    # brier = (1e6^2 + 5e5^2 + (333333-1e6)^2) // 3 // 1e6
    sq = 10**12 + 25 * 10**10 + (333_333 - 10**6) ** 2
    assert out.brier_micro == sq // 3 // 10**6


def test_calibration_first_event_excluded(spark):
    # a user's first event has no history -> contributes no scored row
    ev = _events(spark, [(1, 0, 1, "purchase", 1.0)])
    assert (
        calibration_bins(
            ev, label_expr=F.col("event_type") == "purchase"
        ).count()
        == 0
    )


# ------------------------------------------------------- price-volume-mix

def test_pvm_bridge_reconciles_exactly(spark):
    li = spark.createDataFrame(
        [
            # part 1: both periods. q1=2 r1=1000 ; q2=3 r2=1800
            (1, 2.0, 10.00, 0.0, datetime(1997, 1, 1)),
            (1, 3.0, 18.00, 0.0, datetime(1999, 1, 1)),
            # part 2: new in period 2
            (2, 1.0, 5.00, 0.0, datetime(1999, 6, 1)),
            # part 3: exited after period 1
            (3, 1.0, 4.00, 0.0, datetime(1996, 1, 1)),
        ],
        "l_partkey long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    )
    part = spark.createDataFrame(
        [(1, "B1"), (2, "B1"), (3, "B2")], "p_partkey long, p_brand string"
    )
    out = {r.brand: r for r in price_volume_mix(li, part).collect()}
    b1 = out["B1"]
    # part 1: base = 3*1000//2 = 1500 -> vol +500, price +300; part 2 new +500
    assert b1.price_eff_cents == 300
    assert b1.volume_eff_cents == 500
    assert b1.new_eff_cents == 500
    assert b1.exit_eff_cents == 0
    assert b1.delta_cents == 1300
    assert (
        b1.price_eff_cents
        + b1.volume_eff_cents
        + b1.new_eff_cents
        + b1.exit_eff_cents
        == b1.delta_cents
    )
    b2 = out["B2"]
    assert b2.exit_eff_cents == -400 and b2.delta_cents == -400


def test_pvm_floor_div_boundary_still_reconciles(spark):
    # q2*r1 not divisible by q1: the floor residual must land INSIDE the
    # price/volume split, never leak out of the bridge
    li = spark.createDataFrame(
        [
            (1, 3.0, 10.01, 0.0, datetime(1997, 1, 1)),
            (1, 7.0, 33.33, 0.0, datetime(1999, 1, 1)),
        ],
        "l_partkey long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    )
    part = spark.createDataFrame([(1, "B1")], "p_partkey long, p_brand string")
    r = price_volume_mix(li, part).collect()[0]
    assert (
        r.price_eff_cents + r.volume_eff_cents + r.new_eff_cents
        + r.exit_eff_cents
        == r.delta_cents
        == r.rev2_cents - r.rev1_cents
    )


# -------------------------------------------------------------------- kappa

def test_cohens_kappa_closed_form(spark):
    # confusion a=40 b=10 c=10 d=40: po=.8 pe=.5 kappa=.6
    rows = (
        [(1, 1)] * 40 + [(1, 0)] * 10 + [(0, 1)] * 10 + [(0, 0)] * 40
    )
    df = spark.createDataFrame(rows, "ra int, rb int")
    out = cohens_kappa(
        df, rater_a_expr=F.col("ra") == 1, rater_b_expr=F.col("rb") == 1
    ).collect()[0]
    assert (out.a, out.b, out.c, out.d, out.n) == (40, 10, 10, 40, 100)
    assert out.po_ppm == 800_000
    assert out.pe_ppm == 500_000
    assert out.kappa_ppm == 600_000


def test_cohens_kappa_chance_only_is_zero(spark):
    # independent raters at 50%: kappa ~ 0 exactly when counts balance
    rows = [(1, 1)] * 25 + [(1, 0)] * 25 + [(0, 1)] * 25 + [(0, 0)] * 25
    df = spark.createDataFrame(rows, "ra int, rb int")
    out = cohens_kappa(
        df, rater_a_expr=F.col("ra") == 1, rater_b_expr=F.col("rb") == 1
    ).collect()[0]
    assert out.kappa_ppm == 0


# ---------------------------------------------------------------- bootstrap

def test_poisson_bootstrap_deterministic_and_layout_invariant(spark):
    df = spark.createDataFrame(
        [(i, 100 + (i * 37) % 500) for i in range(400)], "id long, v long"
    )
    kw = dict(id_col="id", value_cents_expr=F.col("v"), n_replicates=32)
    a = poisson_bootstrap_mean(df.coalesce(1), **kw).collect()[0]
    b = poisson_bootstrap_mean(df.repartition(8), **kw).collect()[0]
    assert a.asDict() == b.asDict()
    assert a.n == 400 and a.n_replicates == 32
    # interval brackets the point mean for a well-behaved input
    assert a.lo_cents <= a.mean_cents <= a.hi_cents
    # replicate means live near the point mean (Poisson(1) weights):
    # the ~94% interval of 32 means of 400 values is a few percent wide
    assert a.hi_cents - a.lo_cents < a.mean_cents // 2


def test_poisson_bootstrap_weights_are_poisson_one(spark):
    # mean weight over all (row, replicate) cells must be ~1 (the
    # resample preserves expected mass); exercised via the internal CASE
    from pyrope_spark.operators.experiment import _poisson_weight_case

    df = spark.range(2000).select(
        F.col("id").cast("string").alias("_id")
    ).withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(7))))
    h = "md5(CAST('boot' || CAST(r AS STRING) || '|' || _id AS BINARY))"
    w = df.select(F.expr(_poisson_weight_case(h)).alias("w")).agg(
        F.avg("w").alias("m"), F.max("w").alias("mx")
    ).collect()[0]
    assert abs(w.m - 1.0) < 0.05
    assert w.mx <= 6


# ------------------------------------------------------------------ BH-FDR

def test_bh_thresholds_known_quantiles():
    from pyrope_spark.operators.experiment import bh_thresholds_milli

    thr = bh_thresholds_milli(5, alpha=0.05)
    # rank 5 compares at plain alpha: chi2_1(.05) = 3.841; rank 1 at
    # alpha/5 = .01: 6.635
    assert thr[4] == 3841
    assert thr[0] == 6635
    assert thr == sorted(thr, reverse=True)


def test_bh_fdr_rejects_strong_metric_only(spark):
    from pyrope_spark.operators.experiment import bh_fdr_event_lift

    rows = []
    eid = 0
    for uid in range(400):
        variant = uid % 2
        # metric 'a': variant 1 converts 90%, variant 0 converts 10%
        if (uid // 2) % 10 < (9 if variant else 1):
            rows.append((eid, 0, uid, "a", 1.0)); eid += 1
        # metric 'b': both convert 50% — null
        if (uid // 2) % 2 == 0:
            rows.append((eid, 1, uid, "b", 1.0)); eid += 1
        # every user exists (an always-on heartbeat metric, also null)
        rows.append((eid, 2, uid, "hb", 1.0)); eid += 1
    ev = _events(spark, rows)
    out = {
        r.event_type: r
        for r in bh_fdr_event_lift(
            ev,
            metric_types=["a", "b", "hb"],
            variant_expr=(F.col("user_id") % 2).cast("long"),
        ).collect()
    }
    assert out["a"].rejected == 1
    assert out["b"].rejected == 0
    assert out["hb"].rejected == 0
    assert out["a"].rnk == 1
    # step-up property: rejected ranks form a prefix
    ranks_rejected = sorted(r.rnk for r in out.values() if r.rejected)
    assert ranks_rejected == list(range(1, len(ranks_rejected) + 1))


# ------------------------------------------------------------- churn labels

def test_churn_labels_closed_form(spark):
    cutoff = "TIMESTAMP '2024-01-10'"
    rows = [
        # user 1: pre activity + activity inside horizon -> churned 0
        (1, 0, 1, "view", 2.00),
        (2, 3 * 1440, 1, "purchase", 5.00),
        (3, 11 * 1440, 1, "view", 1.00),       # day 11 < day 17 horizon end
        # user 2: pre activity only -> churned 1
        (4, 2 * 1440, 2, "view", 3.00),
        # user 3: only post-cutoff -> excluded from the training set
        (5, 12 * 1440, 3, "view", 1.00),
        # user 4: pre + event AFTER horizon -> churned 1
        (6, 1 * 1440, 4, "click", 0.50),
        (7, 20 * 1440, 4, "view", 1.00),
    ]
    from pyrope_spark.operators.experiment import churn_label_windows

    ev = _events(spark, rows)
    out = {
        r.user_id: r
        for r in churn_label_windows(
            ev, cutoff_sql=cutoff, horizon_days=7
        ).collect()
    }
    assert set(out) == {1, 2, 4}
    assert out[1].churned == 0
    assert out[2].churned == 1
    assert out[4].churned == 1
    u1 = out[1]
    assert u1.n_events == 2          # pre-cutoff only
    assert u1.active_days == 2
    assert u1.n_event_types == 2
    assert u1.spend_cents == 700
    # last pre-event lands on Jan 4 (offset 3 days), cutoff Jan 10
    assert u1.days_since_last == 6


def test_churn_features_see_no_future(spark):
    # adding post-cutoff events must not change any feature column
    from pyrope_spark.operators.experiment import churn_label_windows

    cutoff = "TIMESTAMP '2024-01-10'"
    base = [(1, 0, 1, "view", 2.00), (2, 3 * 1440, 1, "purchase", 5.00)]
    extra = base + [(9, 12 * 1440, 1, "purchase", 99.0)]
    a = churn_label_windows(
        _events(spark, base), cutoff_sql=cutoff, horizon_days=7
    ).collect()[0]
    b = churn_label_windows(
        _events(spark, extra), cutoff_sql=cutoff, horizon_days=7
    ).collect()[0]
    feats = ("n_events", "active_days", "n_event_types", "spend_cents",
             "days_since_last")
    assert all(getattr(a, f) == getattr(b, f) for f in feats)
    assert (a.churned, b.churned) == (1, 0)


# -------------------------------------------------------- forecast backtest

def test_forecast_backtest_linear_ramp(spark):
    # one event per day with value = day index cents: SMA-7 forecast of a
    # line lags by exactly 4 cents; naive lags by 1
    from pyrope_spark.operators.experiment import forecast_backtest_sma

    rows = [(d, d * 1440, 1, "view", d / 100) for d in range(20)]
    ev = _events(spark, rows)
    out = forecast_backtest_sma(ev).collect()[0]
    assert out.n_origins == 13
    assert out.mae_sma_milli == 4000
    assert out.mae_naive_milli == 1000
    assert out.mae_ratio_ppm == 4_000_000


def test_forecast_backtest_dense_spine_counts_zero_days(spark):
    # a quiet day is a real 0 in both the window and the actuals
    from pyrope_spark.operators.experiment import forecast_backtest_sma

    rows = [
        (d, d * 1440, 1, "view", 7.00) for d in range(16) if d != 10
    ]
    ev = _events(spark, rows)
    out = forecast_backtest_sma(ev).collect()[0]
    # constant 700 except day 10 = 0: forecasts after the gap dip; if the
    # spine were sparse the gap would vanish and every error would be 0
    assert out.mae_sma_milli > 0


# ------------------------------------------------------------- dispersion

def test_dispersion_index_closed_forms(spark):
    from pyrope_spark.operators.experiment import dispersion_index_daily

    rows = (
        # key 'flat': 2 events each on days 0,1,2 -> vmr 0
        [(i, (i % 3) * 1440, 1, "flat", 1.0) for i in range(6)]
        # key 'bursty': 4 on day 0, 0 on day 1 (spine zero), 2 on day 2
        + [(10 + i, 0, 2, "bursty", 1.0) for i in range(4)]
        + [(20 + i, 2 * 1440, 2, "bursty", 1.0) for i in range(2)]
    )
    ev = _events(spark, rows)
    out = {
        r.event_type: r for r in dispersion_index_daily(ev).collect()
    }
    assert out["flat"].vmr_milli == 0
    # S=6, Q=20, n=3: (3*20-36)*1000 // (2*6) = 2000
    assert out["bursty"].vmr_milli == 2000
    assert out["bursty"].n_days == 3
    assert out["bursty"].active_days == 2


# -------------------------------------------------------- covariate balance

def test_covariate_balance_smd_matches_numpy(spark):
    import numpy as np

    from pyrope_spark.operators.experiment import covariate_balance_audit

    rows = []
    eid = 0
    for uid in range(40):
        k = 1 + (uid * 7) % 5 + (2 if uid % 2 else 0)  # variant-1 busier
        for j in range(k):
            rows.append((eid, j * 60, uid, "view", 1.00 + j))
            eid += 1
    ev = _events(spark, rows)
    out = {
        r.covariate: r for r in covariate_balance_audit(
            ev, variant_expr=(F.col("user_id") % 2).cast("long")
        ).collect()
    }
    # recompute n_events SMD with numpy
    counts = {}
    for _, _, uid, _, _ in rows:
        counts[uid] = counts.get(uid, 0) + 1
    a = np.array([c for u, c in counts.items() if u % 2 == 0], dtype=float)
    b = np.array([c for u, c in counts.items() if u % 2 == 1], dtype=float)
    smd = (a.mean() - b.mean()) / np.sqrt(
        (a.var(ddof=1) + b.var(ddof=1)) / 2
    )
    assert abs(out["n_events"].smd - round(smd, 6)) < 2e-6
    assert out["n_events"].na == 20 and out["n_events"].nb == 20
    # variant 1 is busier by construction: negative SMD
    assert out["n_events"].smd < 0


# ------------------------------------------------------------------- power

def test_power_sample_size_closed_form(spark):
    from pyrope_spark.operators.experiment import (
        ab_power_sample_size,
        power_constant_micro,
    )

    # two users, one converts: p = 0.5 (max variance)
    ev = _events(spark, [(1, 0, 1, "purchase", 1.0), (2, 1, 2, "view", 1.0)])
    out = {
        r.rel_mde_ppm: r
        for r in ab_power_sample_size(
            ev, convert_expr=F.col("event_type") == "purchase"
        ).collect()
    }
    c = power_constant_micro()
    for mde in (50_000, 100_000, 200_000):
        delta = 500_000 * mde // 1_000_000
        den = delta * delta * 1_000_000
        expect = (c * 500_000 * 500_000 + den - 1) // den
        assert out[mde].n_required_per_variant == expect
        assert out[mde].p_ppm == 500_000
    # 10% relative MDE at p=.5 needs ~1,570 users per variant
    assert out[100_000].n_required_per_variant == 1570


# -------------------------------------------------------- post-stratified

def test_post_stratified_lift_fixes_simpson(spark):
    # heavy stratum: both variants convert 80%; light stratum: both 10%;
    # variant 1 is overloaded with heavy users -> naive diff is hugely
    # negative, post-stratified diff is exactly 0
    rows = []
    eid = 0

    def add_user(uid, pre_n, convert):
        nonlocal eid
        for j in range(pre_n):
            rows.append((eid, j, uid, "view", 1.0)); eid += 1
        if convert:
            rows.append((eid, 16 * 1440, uid, "purchase", 1.0)); eid += 1

    uid = 0
    # variant is uid % 2. heavy users: pre_n=4 (band 3)
    for i in range(10):   # 10 heavy variant-0 users, 8 convert
        add_user(uid, 4, i < 8); uid += 2
    for i in range(90):   # 90 heavy variant-1 users, 72 convert
        add_user(uid * 0 + (2 * i + 1), 4, i < 72)
    for i in range(90):   # 90 light variant-0 users, 9 convert
        add_user(200 + 2 * i, 1, i < 9)
    for i in range(10):   # 10 light variant-1 users, 1 converts
        add_user(201 + 2 * i, 1, i < 1)
    from pyrope_spark.operators.experiment import post_stratified_lift

    ev = _events(spark, rows)
    out = {
        r.band: r
        for r in post_stratified_lift(
            ev,
            variant_expr=(F.col("user_id") % 2).cast("long"),
            pre_expr=F.col("ts") < F.lit("2024-01-16").cast("timestamp"),
            convert_expr=F.col("event_type") == "purchase",
        ).collect()
    }
    heavy, light, summary = out[3], out[1], out[-1]
    assert (heavy.na, heavy.ca, heavy.nb, heavy.cb) == (10, 8, 90, 72)
    assert heavy.diff_ppm == 0 and light.diff_ppm == 0
    # summary row: naive pooled exposures, post-stratified diff = 0
    assert (summary.na, summary.nb) == (100, 100)
    assert summary.diff_ppm == 0
    # the naive pooled diff WOULD have been -560000 ppm
    naive = summary.ca * 10**6 // summary.na - summary.cb * 10**6 // summary.nb
    assert naive == -560_000


# ----------------------------------------------------------------- p-chart

def test_p_chart_flags_only_outlier_group(spark):
    from pyrope_spark.operators.experiment import proportion_control_chart

    rows = []
    for g in range(10):
        bad = 40 if g == 9 else 10
        for i in range(100):
            rows.append((g, i < bad))
    df = spark.createDataFrame(rows, "g long, flagged boolean")
    out = {
        r.grp: r
        for r in proportion_control_chart(
            df, group_expr=F.col("g"), flag_expr=F.col("flagged")
        ).collect()
    }
    assert out[9].out_of_band == 1 and out[9].side == 1
    assert all(out[g].out_of_band == 0 for g in range(9))
    assert out[9].pbar_ppm == 130_000
    assert out[9].p_ppm == 400_000


# ------------------------------------------------------------- top-k churn

def test_topk_churn_closed_form(spark):
    # day 1 top-2 = {10, 11}; day 2 top-2 = {11, 12}
    rows = [
        (1, 0, 1, "purchase", 9.00),
        (2, 1, 1, "purchase", 8.00),
        (3, 2, 1, "purchase", 0.10),
        (4, 1440, 1, "purchase", 1.00),
        (5, 1441, 1, "purchase", 8.00),
        (6, 1442, 1, "purchase", 9.00),
    ]
    items = {1: 10, 2: 11, 3: 12, 4: 10, 5: 11, 6: 12}
    from pyrope_spark.operators.experiment import topk_churn_daily

    ev = _events(spark, rows).withColumn(
        "item_id",
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in items.items() for x in kv]
            ),
            F.col("event_id").cast("int"),
        ).cast("long"),
    )
    out = topk_churn_daily(
        ev, item_expr=F.col("item_id"), k=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_stayed == 1 and r.n_entrants == 1 and r.n_dropouts == 1
    assert r.overlap_ppm == 500_000


def test_topk_churn_skips_empty_calendar_days(spark):
    # identical top-k on two ACTIVE days 5 calendar days apart: zero churn
    rows = [
        (1, 0, 1, "purchase", 5.00),
        (2, 5 * 1440, 1, "purchase", 5.00),
    ]
    from pyrope_spark.operators.experiment import topk_churn_daily

    ev = _events(spark, rows).withColumn("item_id", F.lit(7).cast("long"))
    out = topk_churn_daily(ev, item_expr=F.col("item_id"), k=1).collect()
    assert len(out) == 1
    assert out[0].n_stayed == 1 and out[0].n_entrants == 0


def test_topk_churn_sparse_days_exact(spark):
    """Days with fewer than k items report true churn (r7 ADVICE):
    dropouts come from the previous day's set and the overlap divides
    by the current day's actual list size, not k."""
    # day 1 has ONE item {10}; day 2 has TWO items {10, 11}; k = 5
    rows = [
        (1, 0, 1, "purchase", 9.00),
        (2, 1440, 1, "purchase", 8.00),
        (3, 1441, 1, "purchase", 7.00),
    ]
    items = {1: 10, 2: 10, 3: 11}
    from pyrope_spark.operators.experiment import topk_churn_daily

    ev = _events(spark, rows).withColumn(
        "item_id",
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in items.items() for x in kv]
            ),
            F.col("event_id").cast("int"),
        ).cast("long"),
    )
    out = topk_churn_daily(ev, item_expr=F.col("item_id"), k=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_stayed == 1          # item 10 persists
    assert r.n_entrants == 1        # item 11 is new
    assert r.n_dropouts == 0        # nothing left the list
    assert r.overlap_ppm == 500_000  # 1 of the CURRENT 2, not 1 of k=5


# ------------------------------------------------------------ feature lift

def test_feature_lift_deciles_closed_form(spark):
    from pyrope_spark.operators.experiment import feature_lift_deciles

    rows = [(u, u, 1 if u < 10 else 0) for u in range(20)]
    df = spark.createDataFrame(rows, "uid long, feat long, label long")
    out = {
        r.decile: r
        for r in feature_lift_deciles(
            df, feature_col="feat", label_col="label", id_col="uid"
        ).collect()
    }
    assert all(out[d].n == 2 for d in range(1, 11))
    for d in range(1, 6):
        assert out[d].rate_ppm == 1_000_000
        assert out[d].lift_ppm == 2_000_000
    for d in range(6, 11):
        assert out[d].rate_ppm == 0 and out[d].lift_ppm == 0


# ---------------------------------------------------------- smoothed rates

def test_smoothed_rates_demote_tiny_perfect_group(spark):
    from pyrope_spark.operators.experiment import smoothed_group_rates

    rows = (
        [("A", True)] * 2                      # 2-for-2: raw 100%
        + [("B", True)] * 980 + [("B", False)] * 20   # 98% on 1000
        + [("C", True)] * 10 + [("C", False)] * 990   # 1% on 1000
    )
    df = spark.createDataFrame(rows, "g string, f boolean")
    out = {
        r.grp: r
        for r in smoothed_group_rates(
            df, group_expr=F.col("g"), flag_expr=F.col("f"),
            prior_strength=500,
        ).collect()
    }
    assert out["A"].raw_ppm == 1_000_000
    assert out["A"].raw_ppm > out["B"].raw_ppm      # raw: A outranks B
    assert out["B"].shrunk_ppm > out["A"].shrunk_ppm  # shrunk: flipped
    # exact values: pbar = 992e6 // 2002
    pbar = 992 * 10**6 // 2002
    assert out["A"].pbar_ppm == pbar
    assert out["A"].shrunk_ppm == (2 * 10**6 + 500 * pbar) // 502
    assert out["B"].shrunk_ppm == (980 * 10**6 + 500 * pbar) // 1500
    # tiny group barely speaks for itself
    assert out["A"].weight_ppm == 2 * 10**6 // 502


# --------------------------------------------------------------------- AUC

def test_auc_roc_closed_forms(spark):
    from pyrope_spark.operators.experiment import auc_roc

    # perfect separation
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], "s long, y long"
    )
    r = auc_roc(df, score_expr=F.col("s"), label_expr=F.col("y")).collect()[0]
    assert (r.n_pos, r.n_neg) == (2, 2)
    assert r.auc_ppm == 1_000_000 and r.gini_ppm == 1_000_000

    # one tie at half credit: pairs (2>1, 2=2 tie, 3>1, 3>2) -> 3.5/4
    df2 = spark.createDataFrame(
        [(1, 0), (2, 1), (2, 0), (3, 1)], "s long, y long"
    )
    r2 = auc_roc(
        df2, score_expr=F.col("s"), label_expr=F.col("y")
    ).collect()[0]
    assert r2.auc_ppm == 875_000

    # label flip mirrors around 1/2
    r3 = auc_roc(
        df2, score_expr=F.col("s"), label_expr=1 - F.col("y")
    ).collect()[0]
    assert r2.auc_ppm + r3.auc_ppm == 1_000_000


# ------------------------------------------------------------ Kaplan-Meier

def test_kaplan_meier_sequential_fold(spark):
    from pyrope_spark.operators.experiment import kaplan_meier_survival

    risk = spark.createDataFrame(
        [(5, 2, 10), (9, 3, 6), (12, 1, 2)], "t long, d long, n_risk long"
    )
    out = {r.t: r.survival_ppm for r in kaplan_meier_survival(risk).collect()}
    assert out[5] == 800_000                  # 1e6 * 8 // 10
    assert out[9] == 400_000                  # 800000 * 3 // 6
    assert out[12] == 200_000                 # 400000 * 1 // 2


def test_kaplan_meier_order_is_by_time_not_input(spark):
    from pyrope_spark.operators.experiment import kaplan_meier_survival

    shuffled = spark.createDataFrame(
        [(12, 1, 2), (5, 2, 10), (9, 3, 6)], "t long, d long, n_risk long"
    ).repartition(3)
    out = {r.t: r.survival_ppm for r in kaplan_meier_survival(shuffled).collect()}
    assert out == {5: 800_000, 9: 400_000, 12: 200_000}


# ------------------------------------------------------ diff-in-differences

def test_diff_in_diff_closed_form(spark):
    """Control: 10.00 pre -> 12.00 post (common trend +2.00); treated:
    20.00 pre -> 25.00 post (delta +5.00). DiD = +3.00 = 3,000,000
    micro-cents... in CENTS: 10.00 dollars = 1000 cents, so DiD =
    300 cents = 300,000,000 micro. Naive post-vs-post (25 - 12 = 13.00)
    would have been wildly confounded by the group level difference."""
    from pyrope_spark.operators.experiment import diff_in_diff

    # user 0, 2 -> grp 0 (control); user 1, 3 -> grp 1 (treated)
    rows = [
        (1, 0, 0, "view", 10.00), (2, 0, 2, "view", 10.00),
        (3, 1440, 0, "view", 12.00), (4, 1440, 2, "view", 12.00),
        (5, 0, 1, "view", 20.00), (6, 0, 3, "view", 20.00),
        (7, 1440, 1, "view", 25.00), (8, 1440, 3, "view", 25.00),
    ]
    ev = _events(spark, rows)
    cutoff = F.lit((T0 + timedelta(hours=12)).isoformat()).cast("timestamp")
    out = {
        (r.grp, r.period): r
        for r in diff_in_diff(
            ev,
            variant_expr=(F.col("user_id") % 2).cast("long"),
            post_expr=F.col("ts") >= cutoff,
        ).collect()
    }
    assert out[(0, "pre")].mean_micro == 1000 * 1_000_000
    assert out[(0, "post")].mean_micro == 1200 * 1_000_000
    assert out[(1, "pre")].mean_micro == 2000 * 1_000_000
    assert out[(1, "post")].mean_micro == 2500 * 1_000_000
    assert out[(-1, "did")].mean_micro == 300 * 1_000_000
    assert out[(0, "pre")].n_users == 2


def test_diff_in_diff_parallel_trend_zero(spark):
    """Identical deltas in both groups -> DiD exactly 0 even with a big
    level gap."""
    from pyrope_spark.operators.experiment import diff_in_diff

    rows = [
        (1, 0, 0, "view", 1.00), (2, 1440, 0, "view", 4.00),
        (3, 0, 1, "view", 90.00), (4, 1440, 1, "view", 93.00),
    ]
    ev = _events(spark, rows)
    cutoff = F.lit((T0 + timedelta(hours=12)).isoformat()).cast("timestamp")
    out = {
        (r.grp, r.period): r
        for r in diff_in_diff(
            ev,
            variant_expr=(F.col("user_id") % 2).cast("long"),
            post_expr=F.col("ts") >= cutoff,
        ).collect()
    }
    assert out[(-1, "did")].mean_micro == 0


# --------------------------------------------- O'Brien-Fleming sequential

def test_obrien_fleming_boundary_shape(spark):
    """A decisive effect visible from day 1: z2 at look 1 is identical
    to look 2 (no new users day 2), but the OBF boundary is 2x stricter
    at k=1 of K=2 than at k=2 — the reject flag needs z2*k >= chi2*K.
    With z2 far above both cutoffs, both looks reject; the arithmetic
    is checked against the closed form."""
    from pyrope_spark.operators.experiment import (
        _chi2_1_inv,
        obrien_fleming_monitor,
    )

    # day 1: 20 control users (user_id even, 0 conversions),
    #        20 treated (odd, all converting 'purchase')
    rows = []
    eid = 1
    for u in range(40):
        et = "purchase" if u % 2 == 1 else "view"
        rows.append((eid, 0, u, et, 1.0)); eid += 1
    # day 2: one non-converting re-visit by an EXISTING user per variant
    rows.append((eid, 1440, 0, "view", 1.0)); eid += 1
    rows.append((eid, 1440, 1, "view", 1.0)); eid += 1
    ev = _events(spark, rows)
    out = sorted(
        obrien_fleming_monitor(
            ev,
            variant_expr=(F.col("user_id") % 2).cast("long"),
            convert_expr=F.col("event_type") == "purchase",
        ).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in out] == [1, 2]
    # closed form: na=nb=20, ca=0, cb=20 -> z2 = (0-400)^2*40*1000 /
    # (20*20*20*20) = 160000*40000/160000 = 40000 milli (z^2 = 40)
    assert out[0].z2_milli == 40_000
    assert out[1].z2_milli == 40_000          # nothing new converts
    chi2 = int(round(_chi2_1_inv(0.05) * 1000))   # ~3841
    assert 3_800 < chi2 < 3_900
    # both looks clear even the k=1 boundary (40000*1 >= 3841*2)
    assert out[0].obf_reject == 1 and out[1].obf_reject == 1


def test_obrien_fleming_no_effect_no_reject(spark):
    """Balanced conversions -> z2 = 0 -> never rejects, any look."""
    from pyrope_spark.operators.experiment import obrien_fleming_monitor

    rows = []
    eid = 1
    for d in range(3):
        for u in range(10):
            et = "purchase" if u < 4 else "view"   # same rate both arms
            rows.append((eid, d * 1440, u + d * 100, et, 1.0)); eid += 1
    ev = _events(spark, rows)
    out = obrien_fleming_monitor(
        ev,
        variant_expr=(F.col("user_id") % 2).cast("long"),
        convert_expr=F.col("event_type") == "purchase",
    ).collect()
    assert len(out) == 3
    assert all(r.obf_reject == 0 for r in out)
