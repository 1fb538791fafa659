"""Small-file compaction (operators/maintenance.py)."""

import os

import pyspark.sql.functions as F
import pytest


def _write_fragmented(spark, path, n_files=40, rows_per=50):
    df = spark.range(n_files * rows_per).select(
        F.col("id"), (F.col("id") % 7).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return df


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    from pyrope_spark.operators.maintenance import compact_small_files

    path = str(tmp_path / "frag")
    df = _write_fragmented(spark, path)
    want = sorted(r["id"] for r in df.collect())
    rep = compact_small_files(spark, path, target_mb=128)
    assert rep["files_before"] >= 40
    assert rep["files_after"] == 1  # tiny table -> one target file
    assert rep["rows"] == len(want)
    got = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert got == want
    # no stray tmp/bak left behind
    assert not os.path.exists(path + ".tmp-compact")
    assert not os.path.exists(path + ".bak-compact")


def test_compaction_sorted_layout(spark, tmp_path):
    """sort_cols: each output file is internally sorted so min/max pruning
    survives the rewrite."""
    from pyrope_spark.operators.maintenance import compact_small_files

    path = str(tmp_path / "frag2")
    _write_fragmented(spark, path, n_files=16)
    compact_small_files(spark, path, target_mb=128, sort_cols=["k", "id"])
    import glob

    import pyarrow.parquet as pq

    for f in glob.glob(path + "/*.parquet"):
        t = pq.read_table(f, columns=["k", "id"]).to_pydict()
        pairs = list(zip(t["k"], t["id"]))
        assert pairs == sorted(pairs)


# ------------------------------------- incremental aggregate maintenance

def test_incremental_equals_recompute_multi_batch(spark):
    """Folding the changelog in N batches == one-shot build, exactly."""
    from pyrope_spark.operators.maintenance import (
        build_agg_view,
        maintain_agg_view,
    )
    import random

    rng = random.Random(42)
    rows = [
        (rng.randrange(5), f"t{rng.randrange(3)}",
         round(rng.uniform(0, 100), 2), rng.choice([1, 1, 1, -1]))
        for _ in range(400)
    ]
    df = spark.createDataFrame(
        rows, "k long, g string, value double, op int"
    )
    keys = ["k", "g"]
    full = build_agg_view(df, keys=keys, op_col="op")
    # three incremental folds over row-id ranges
    with_id = df.withColumn("_rid", F.monotonically_increasing_id())
    ids = sorted(r["_rid"] for r in with_id.select("_rid").collect())
    b1 = with_id.filter(F.col("_rid") <= ids[len(ids) // 3])
    b2 = with_id.filter(
        (F.col("_rid") > ids[len(ids) // 3])
        & (F.col("_rid") <= ids[2 * len(ids) // 3])
    )
    b3 = with_id.filter(F.col("_rid") > ids[2 * len(ids) // 3])
    acc = build_agg_view(b1, keys=keys, op_col="op")
    acc = maintain_agg_view(acc, b2, keys=keys, op_col="op")
    acc = maintain_agg_view(acc, b3, keys=keys, op_col="op")
    want = {(r["k"], r["g"]): (r["n"], r["sum_value"])
            for r in full.filter(F.col("n") > 0).collect()}
    got = {(r["k"], r["g"]): (r["n"], r["sum_value"]) for r in acc.collect()}
    assert got == want  # bit-identical decimals, not approx


def test_full_retraction_drops_key(spark):
    from pyrope_spark.operators.maintenance import (
        build_agg_view,
        maintain_agg_view,
    )

    base_rows = spark.createDataFrame(
        [(1, "a", 10.0, 1), (2, "a", 5.0, 1)],
        "k long, g string, value double, op int",
    )
    retract = spark.createDataFrame(
        [(1, "a", 10.0, -1)], "k long, g string, value double, op int"
    )
    base = build_agg_view(base_rows, keys=["k", "g"], op_col="op")
    out = maintain_agg_view(base, retract, keys=["k", "g"], op_col="op")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["k"] == 2


def test_zonemap_stats_and_prunable_flag(spark):
    from pyspark.sql import functions as F

    from pyrope_spark.operators.maintenance import prunable_flag, zonemap_stats

    df = spark.createDataFrame(
        [("a", 1), ("a", 5), ("b", 10), ("b", 20), ("c", 100)],
        "bucket string, v long",
    )
    zm = zonemap_stats(df, "bucket", ["v"])
    out = {
        r["bucket"]: r
        for r in zm.withColumn(
            "prun", prunable_flag("min_v", "max_v", 8, 30)
        ).collect()
    }
    assert out["a"]["n_rows"] == 2 and out["a"]["min_v"] == 1 and out["a"]["max_v"] == 5
    assert out["a"]["prun"] is True      # [1,5] disjoint from [8,30]
    assert out["b"]["prun"] is False     # [10,20] overlaps
    assert out["c"]["prun"] is True      # [100,100] above
    # boundary touch is NOT prunable (conservative)
    touch = zm.withColumn("prun", prunable_flag("min_v", "max_v", 5, 7)).collect()
    assert {r["bucket"]: r["prun"] for r in touch}["a"] is False
