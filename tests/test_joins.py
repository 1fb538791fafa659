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


def test_fuzzy_join_qgram_equals_brute_force(spark):
    """The q-gram prefix-filter path (ED-Join blocking) loses nothing vs
    brute force — including short strings below the prefix-guarantee
    cutoff (routed through the length-band path) and a skewed length
    distribution where many strings share one length."""
    from pyspark.sql import functions as F

    from pyrope_spark.operators.joins import fuzzy_levenshtein_join

    words = (
        ["alpha", "alphaa", "alpa", "beta", "betta", "gamma", "gam"]
        + ["x", "xy", "ab", "ba", ""]  # below the q-gram cutoff
        + [f"prefix_core_{i:02d}" for i in range(20)]  # one dominant length
        + ["ababab", "bababa", "aaaaaa"]  # repeated-gram (bag-semantics) cases
    )
    left = spark.createDataFrame([(w,) for w in words], "name string")
    right = spark.createDataFrame(
        [(w + "x",) for w in words] + [(w,) for w in words[:10]],
        "name string",
    )
    got = {
        (r["left_name"], r["right_name"], r["distance"])
        for r in fuzzy_levenshtein_join(
            left, right, 2, qgram_block=True
        ).collect()
    }
    brute = {
        (r["a"], r["b"], r["d"])
        for r in left.withColumnRenamed("name", "a")
        .crossJoin(right.withColumnRenamed("name", "b"))
        .withColumn("d", F.levenshtein("a", "b"))
        .filter(F.col("d") <= 2)
        .collect()
    }
    assert got == brute


def test_fuzzy_join_preserves_duplicate_multiplicity(spark):
    """Genuinely duplicate input rows each produce their own output pair
    (ADVICE r4: value-level DISTINCT collapsed them); dedup happens only
    across the 3-probe band replication, keyed on per-row ids."""
    from pyrope_spark.operators.joins import fuzzy_levenshtein_join

    left = spark.createDataFrame(
        [("acme", 1), ("acme", 2)], "name string, src int"
    )
    right = spark.createDataFrame([("acme",)], "name string")
    out = fuzzy_levenshtein_join(left, right, 1, left_keep=("src",)).collect()
    assert len(out) == 2
    assert sorted(r["l_src"] for r in out) == [1, 2]
    # and without keep cols the duplicate rows still both survive
    out2 = fuzzy_levenshtein_join(
        left.select("name"), right, 1
    ).collect()
    assert len(out2) == 2


def test_fuzzy_join_keep_cols_prefixed_no_collision(spark):
    """left_keep and right_keep sharing a column name stay distinct in the
    output (l_/r_ prefixes)."""
    from pyrope_spark.operators.joins import fuzzy_levenshtein_join

    left = spark.createDataFrame([("acme", 10)], "name string, id int")
    right = spark.createDataFrame([("acme", 20)], "name string, id int")
    out = fuzzy_levenshtein_join(
        left, right, 0, left_keep=("id",), right_keep=("id",)
    ).collect()
    assert len(out) == 1
    assert out[0]["l_id"] == 10 and out[0]["r_id"] == 20
