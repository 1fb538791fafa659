"""Salted join (operators/joins.py) — result equivalence with the plain
join under skew, multiplicity preservation, and left-join semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyrope_spark.operators.joins import salted_join


def test_salted_inner_equivalence_under_skew(spark):
    # 90% of big rows share key 0 (hot key), plus dup keys on both sides
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(0, "hot"), (0, "hot2"), (950, "cold"), (9999, "nomatch")],
        "k long, tag string",
    )
    plain = big.join(small, ["k"]).select("k", "payload", "tag")
    salted = salted_join(big, small, ["k"], n_salts=8).select("k", "payload", "tag")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # hot key matched twice per big row
    assert salted.where("k = 0").count() == 1800


def test_salted_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    small = spark.createDataFrame([(1, "x")], "k long, t string")
    rows = {r["k"]: r for r in salted_join(big, small, ["k"], n_salts=4, how="left").collect()}
    assert rows[1]["t"] == "x" and rows[2]["t"] is None


def test_salted_join_rejects_outer(spark):
    big = spark.createDataFrame([(1, "a")], "k long, v string")
    import pytest

    with pytest.raises(ValueError):
        salted_join(big, big, ["k"], how="full")


def test_fuzzy_levenshtein_join_matches_and_blocks(spark):
    from pyrope_spark.operators.joins import fuzzy_levenshtein_join

    left = spark.createDataFrame(
        [("acme corp",), ("acme c0rp",), ("globex",), ("x",)], "name string"
    )
    right = spark.createDataFrame(
        [("acme corp",), ("globexx",), ("completely different inc",)],
        "name string",
    )
    out = fuzzy_levenshtein_join(left, right, 2).collect()
    pairs = {(r["left_name"], r["right_name"]): r["distance"] for r in out}
    assert pairs[("acme corp", "acme corp")] == 0
    assert pairs[("acme c0rp", "acme corp")] == 1
    assert pairs[("globex", "globexx")] == 1
    assert all(d <= 2 for d in pairs.values())
    assert ("x", "completely different inc") not in pairs


def test_fuzzy_join_equals_brute_force(spark):
    """Blocked candidates == the exhaustive cross-join result (length
    banding loses nothing: |len diff| <= distance)."""
    from pyspark.sql import functions as F

    from pyrope_spark.operators.joins import fuzzy_levenshtein_join

    words = ["alpha", "alphaa", "alpa", "beta", "betta", "gamma", "gam",
             "delta", "dleta", "epsilon"]
    left = spark.createDataFrame([(w,) for w in words], "name string")
    right = spark.createDataFrame([(w + "x",) for w in words] +
                                  [(w,) for w in words[:5]], "name string")
    got = {
        (r["left_name"], r["right_name"])
        for r in fuzzy_levenshtein_join(left, right, 2).collect()
    }
    brute = {
        (r["a"], r["b"])
        for r in left.withColumnRenamed("name", "a")
        .crossJoin(right.withColumnRenamed("name", "b"))
        .filter(F.levenshtein("a", "b") <= 2)
        .collect()
    }
    assert got == brute
