"""Table profiling (operators/profile.py)."""

from __future__ import annotations

from pyrope_spark.operators.profile import profile_table


def _df(spark):
    rows = [
        (1, "a", None),
        (2, "b", 5.0),
        (3, "b", 5.0),
        (None, None, 7.5),
    ]
    return spark.createDataFrame(rows, "id long, s string, v double")


def test_profile_stats(spark):
    out = {r.column: r for r in profile_table(_df(spark)).collect()}
    assert set(out) == {"id", "s", "v"}
    assert all(r.n_rows == 4 for r in out.values())
    assert (out["id"].n_nulls, out["id"].n_distinct) == (1, 3)
    assert (out["s"].n_nulls, out["s"].n_distinct) == (1, 2)
    assert (out["v"].n_nulls, out["v"].n_distinct) == (1, 2)
    assert (out["id"].min_value, out["id"].max_value) == ("1", "3")
    assert (out["s"].min_value, out["s"].max_value) == ("a", "b")


def test_profile_column_subset_and_approx(spark):
    df = _df(spark)
    exact = profile_table(df, ["s"]).collect()
    assert len(exact) == 1 and exact[0].column == "s"
    # approx path: HLL estimate within rsd on tiny cardinality = exact
    approx = profile_table(df, ["s"], exact_distinct=False).collect()
    assert approx[0].n_distinct == 2


def test_profile_single_scan(spark):
    """The stack() unpivot keeps everything over ONE aggregate of ONE scan —
    a per-column union would re-scan the source ncols times."""
    df = _df(spark)
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan ExistingRDD") + plan.count("LocalTableScan")
    assert n_scans == 1, plan


# ---------------------------------------------------------------- drift

def _asg(spark, pairs):
    return spark.createDataFrame(pairs, "cluster_id int")


def test_cluster_drift_no_drift_zero_contribution(spark):
    from pyrope_spark.operators.profile import cluster_drift

    a = _asg(spark, [(0,)] * 50 + [(1,)] * 50)
    b = _asg(spark, [(0,)] * 20 + [(1,)] * 20)  # same proportions, half size
    rows = {r["cluster_id"]: r for r in cluster_drift(a, b).collect()}
    assert rows[0]["chi2_contribution"] == 0.0
    assert rows[1]["chi2_contribution"] == 0.0
    assert rows[0]["expected_b"] == 20.0


def test_cluster_drift_detects_shift_and_flags(spark):
    from pyrope_spark.operators.profile import cluster_drift

    a = _asg(spark, [(0,)] * 60 + [(1,)] * 40)
    b = _asg(spark, [(0,)] * 10 + [(1,)] * 80 + [(2,)] * 10)
    rows = {r["cluster_id"]: r for r in cluster_drift(a, b).collect()}
    # cluster 0 lost mass, cluster 1 gained: both contribute
    assert rows[0]["chi2_contribution"] > 0
    assert rows[1]["chi2_contribution"] > 0
    # expected under A's mix: 0 -> 0.6*100=60, 1 -> 40
    assert rows[0]["expected_b"] == 60.0
    assert rows[1]["expected_b"] == 40.0
    # cluster 2 is new in B: flagged, no expected mass to score against
    assert rows[2]["new_cluster"] is True
    assert rows[2]["chi2_contribution"] is None


def test_cluster_drift_vanished_cluster(spark):
    from pyrope_spark.operators.profile import cluster_drift

    a = _asg(spark, [(0,)] * 10 + [(7,)] * 10)
    b = _asg(spark, [(0,)] * 10)
    rows = {r["cluster_id"]: r for r in cluster_drift(a, b).collect()}
    assert rows[7]["vanished_cluster"] is True
    assert rows[7]["count_b"] == 0
    # vanished cell still contributes (obs 0 vs expected 5)
    assert rows[7]["chi2_contribution"] == 5.0


def test_key_skew_report_planted_skew(spark):
    from pyrope_spark.operators.profile import key_skew_report

    rows = [("hot",)] * 900 + [(f"k{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, "k string")
    rep = key_skew_report(df, "k", top_n=3).collect()
    top = rep[0] if rep[0]["rank"] == 1 else None
    by_rank = {r["rank"]: r for r in rep}
    assert by_rank[1]["key"] == "hot"
    assert by_rank[1]["cnt"] == 900
    assert by_rank[1]["share"] == 0.9
    # 101 keys, 1000 rows: mean ~9.9 -> ratio ~90.9
    assert abs(by_rank[1]["skew_ratio"] - 900 * 101 / 1000) < 1e-6
    assert by_rank[1]["n_keys"] == 101
    assert len(rep) == 3


def test_value_histogram_counts_and_edges(spark):
    import pytest

    from pyrope_spark.operators.profile import value_histogram

    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    rows = {r["bin_no"]: r for r in value_histogram(df, "v", n_bins=10).collect()}
    assert len(rows) == 10
    assert rows[0]["bin_lo"] == 0.0 and rows[9]["bin_hi"] == 99.0
    assert sum(r["cnt"] for r in rows.values()) == 100
    assert rows[9]["cnt"] == 10  # max value clamps into the last bin
    const = spark.createDataFrame([(3.0,)] * 5, "v double")
    c = value_histogram(const, "v").collect()
    assert len(c) == 1 and c[0]["cnt"] == 5
    with pytest.raises(ValueError, match="empty"):
        value_histogram(const.filter("1=0"), "v")


def test_check_expectations_kinds(spark):
    import pytest

    from pyrope_spark.operators.profile import check_expectations

    df = spark.createDataFrame(
        [(1, 5.0, "ok"), (2, -1.0, "ok"), (2, 200.0, None), (3, 5.0, "BAD1")],
        "id long, v double, s string",
    )
    rules = [
        {"name": "s_not_null", "kind": "not_null", "col": "s"},
        {"name": "v_min", "kind": "min", "col": "v", "value": 0.0},
        {"name": "v_max", "kind": "max", "col": "v", "value": 100.0},
        {"name": "s_lower", "kind": "regex", "col": "s", "pattern": "^[a-z]+$"},
        {"name": "id_unique", "kind": "unique", "col": "id"},
    ]
    out = {r["rule"]: r for r in check_expectations(df, rules).collect()}
    assert out["s_not_null"]["violations"] == 1
    assert out["v_min"]["violations"] == 1
    assert out["v_max"]["violations"] == 1
    assert out["s_lower"]["violations"] == 2   # null + 'BAD1'
    assert out["id_unique"]["violations"] == 1  # id 2 twice
    assert not out["id_unique"]["passed"]
    assert all(r["total"] == 4 for r in out.values())
    with pytest.raises(ValueError, match="unknown rule kind"):
        check_expectations(df, [{"name": "x", "kind": "nope", "col": "id"}])


def test_referential_audit_orphans_and_nulls(spark):
    from pyrope_spark.operators.profile import referential_audit

    fact = spark.createDataFrame(
        [(1,), (1,), (2,), (7,), (9,), (None,)], "fk long"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = referential_audit([("f->d", fact, "fk", dim, "pk")]).collect()[0]
    assert row["relation"] == "f->d"
    assert row["n_fact"] == 6
    assert row["n_orphans"] == 2          # 7 and 9
    assert row["n_null_fk"] == 1
    assert row["n_distinct_orphan_keys"] == 2
    assert (row["min_orphan_key"], row["max_orphan_key"]) == (7, 9)


def test_referential_audit_clean_relation(spark):
    from pyrope_spark.operators.profile import referential_audit

    fact = spark.createDataFrame([(1,), (2,)], "fk long")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = referential_audit([("clean", fact, "fk", dim, "pk")]).collect()[0]
    assert row["n_orphans"] == 0 and row["min_orphan_key"] is None


def test_cluster_quality_exact_integers(spark):
    """Hand-checkable 1-D-ish clusters: floor-mean centroid on negative
    coords (the div-vs-// trap), exact inertia/radius."""
    from pyrope_spark.operators.profile import cluster_quality_report

    rows = [
        (1, 0, [-0.000001, 0.0]),   # micro: (-1, 0)
        (2, 0, [-0.000002, 0.0]),   # micro: (-2, 0)
        (3, 1, [0.000004, 0.000002]),
        (4, 1, [0.000002, 0.000002]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    out = {r["label"]: r for r in cluster_quality_report(df).collect()}
    # label 0: sum=(-3), n=2 -> floor(-1.5) = -2 (floor, NOT truncate -1)
    # d2: (-1-(-2))^2=1, (-2-(-2))^2=0 -> inertia 1, radius 1
    assert out[0]["inertia"] == 1 and out[0]["max_radius_sq"] == 1
    # label 1: centroid (3, 2); d2 = 1 and 1
    assert out[1]["inertia"] == 2 and out[1]["max_radius_sq"] == 1
    assert out[0]["n_vectors"] == out[1]["n_vectors"] == 2


def test_categorical_association_independence_and_planted(spark):
    """Perfectly independent 2x2 -> all chi2 contributions 0; a fully
    dependent table -> large contributions; integers exact."""
    from pyrope_spark.operators.profile import categorical_association

    indep = []
    for a in ("x", "y"):
        for b in ("p", "q"):
            indep += [(a, b)] * 10
    df = spark.createDataFrame(indep, "a string, b string")
    out = categorical_association(df, "a", "b").collect()
    assert all(r["chi2_contrib_micro"] == 0 for r in out)
    assert all(r["expected_micro"] == 10_000_000 for r in out)

    dep = [("x", "p")] * 10 + [("y", "q")] * 10
    out2 = {
        (r["a"], r["b"]): r
        for r in categorical_association(
            spark.createDataFrame(dep, "a string, b string"), "a", "b"
        ).collect()
    }
    # 2x2 fully dependent, N=20, ra=cb=10: chi2 per cell = (o-e)^2/e = 5
    assert out2[("x", "p")]["chi2_contrib_micro"] == 5_000_000
    assert out2[("x", "p")]["expected_micro"] == 5_000_000


def test_hhi_closed_forms(spark):
    from pyrope_spark.operators.profile import market_concentration_hhi

    rows = (
        # group m: monopoly (one member)
        [("m", "s1", 10.0)] * 3
        # group e: four members, equal counts
        + [("e", f"s{i}", 1.0) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "grp STRING, member STRING, v DOUBLE")
    out = {r.grp: r for r in market_concentration_hhi(
        df, group_col="grp", member_col="member", value_col="v"
    ).collect()}
    assert out["m"].hhi_ppm == 1_000_000          # monopoly
    assert out["e"].hhi_ppm == 250_000            # 4 * (1/4)^2
    # count mode (value_col=None): same shares, same index
    out2 = {r.grp: r for r in market_concentration_hhi(
        df, group_col="grp", member_col="member"
    ).collect()}
    assert out2["e"].hhi_ppm == 250_000


def test_fd_violation_audit_closed_form(spark):
    from pyrope_spark.operators.profile import fd_violation_audit

    rows = [
        (1, "a"), (1, "a"),          # det 1: clean (1 dep value, 2 rows)
        (2, "a"), (2, "b"), (2, "b"),  # det 2: violates (2 values, 3 rows)
        (3, None), (3, "c"),          # det 3: NULL counts as a value -> violates
    ]
    df = spark.createDataFrame(rows, "det LONG, dep STRING")
    r = fd_violation_audit(df, det_col="det", dep_col="dep").collect()[0]
    assert r.n_determinants == 3
    assert r.n_violating_determinants == 2
    assert r.max_dep_values == 2
    assert r.violating_rows == 5
    assert r.total_rows == 7
