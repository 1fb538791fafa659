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
