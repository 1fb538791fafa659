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
