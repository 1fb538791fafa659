"""k-anonymity / l-diversity audit (operators/privacy.py)."""


def test_k_anonymity_and_l_diversity_flags(spark):
    from pyrope_spark.operators.privacy import (
        anonymity_summary,
        k_anonymity_report,
    )

    rows = (
        [("a", "x", i) for i in range(5)]       # size 5, diverse -> clean
        + [("a", "y", 1), ("a", "y", 1)]        # size 2 -> k-violation,
                                                 # 1 distinct -> l-violation
        + [("b", "x", 1), ("b", "x", 1), ("b", "x", 1),
           ("b", "x", 1), ("b", "x", 2)]        # size 5, 2 distinct
    )
    df = spark.createDataFrame(rows, "qa string, qb string, s int")
    rep = {(r["qa"], r["qb"]): r for r in k_anonymity_report(
        df, ["qa", "qb"], k=5, sensitive_col="s", l=3
    ).collect()}
    assert not rep[("a", "x")]["k_violation"]
    assert not rep[("a", "x")]["l_violation"]
    assert rep[("a", "y")]["k_violation"] and rep[("a", "y")]["l_violation"]
    assert not rep[("b", "x")]["k_violation"]
    assert rep[("b", "x")]["l_violation"]  # 2 distinct < 3

    s = anonymity_summary(df, ["qa", "qb"], k=5, sensitive_col="s", l=3).collect()[0]
    assert s["n_classes"] == 3
    assert s["min_class_size"] == 2
    assert s["violating_classes"] == 1
    assert s["violating_rows"] == 2
    assert not s["k_anonymous"]
    assert s["min_diversity"] == 1 and not s["l_diverse"]


def test_suppression_yields_k_anonymous_release(spark):
    from pyrope_spark.operators.privacy import (
        anonymity_summary,
        suppress_small_classes,
    )

    rows = [("a", i) for i in range(7)] + [("b", 0), ("b", 1)] + [("c", 0)]
    df = spark.createDataFrame(rows, "q string, v int")
    out = suppress_small_classes(df, ["q"], k=3)
    assert out.count() == 7
    assert {r["q"] for r in out.collect()} == {"a"}
    s = anonymity_summary(out, ["q"], k=3).collect()[0]
    assert s["k_anonymous"]


def test_suppression_counts_null_class(spark):
    """NULL quasi-identifier values are a countable equivalence class —
    consistent with k_anonymity_report's groupBy: a NULL class of size
    >= k SURVIVES suppression (null-safe semi-join), one of size < k is
    suppressed."""
    from pyrope_spark.operators.privacy import suppress_small_classes

    rows = (
        [(None, "x", i) for i in range(4)]   # NULL qa class, size 4 -> keep
        + [("a", None, i) for i in range(2)]  # NULL qb class, size 2 -> drop
        + [("a", "y", i) for i in range(3)]   # plain class, size 3 -> keep
    )
    df = spark.createDataFrame(rows, "qa string, qb string, v int")
    out = suppress_small_classes(df, ["qa", "qb"], k=3)
    got = {(r["qa"], r["qb"]) for r in out.collect()}
    assert out.count() == 7
    assert got == {(None, "x"), ("a", "y")}
