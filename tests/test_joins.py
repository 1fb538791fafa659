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
