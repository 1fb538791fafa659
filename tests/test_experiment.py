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
