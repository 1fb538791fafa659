from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyrope_spark.sources import (
    parse_vector_payload,
    read_fvecs,
    read_glove_txt,
    synthetic_vectors,
)
from pyrope_spark.sources.readers import decode_f32le


def test_parse_payload_json_and_csv(spark):
    df = spark.createDataFrame(
        [("[1.0, 2.5, -3]",), ("1.0,2.5,-3",), ("1.0 2.5 -3",)], "p string"
    )
    rows = df.select(parse_vector_payload(F.col("p")).alias("v")).collect()
    for r in rows:
        assert [round(x, 3) for x in r["v"]] == [1.0, 2.5, -3.0]


def test_decode_f32le(spark):
    vec = np.array([1.5, -2.25, 0.0], dtype="<f4")
    df = spark.createDataFrame([(bytearray(vec.tobytes()),)], "b binary")
    got = df.select(decode_f32le(F.col("b"), dim=3).alias("v")).collect()[0]["v"]
    assert got == [1.5, -2.25, 0.0]
    # wrong dim rejected (VEC_ERR_DIM analog)
    bad = df.select(decode_f32le(F.col("b"), dim=4).alias("v")).collect()[0]["v"]
    assert bad is None


def test_read_fvecs(spark, tmp_path):
    path = tmp_path / "test.fvecs"
    vecs = [np.array([1.0, 2.0], dtype="<f4"), np.array([3.0, 4.0], dtype="<f4")]
    with open(path, "wb") as f:
        for v in vecs:
            f.write(struct.pack("<i", len(v)))
            f.write(v.tobytes())
    df = read_fvecs(spark, str(path))
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert len(rows) == 2
    assert rows[0]["vector"] == [1.0, 2.0]
    assert rows[1]["vector"] == [3.0, 4.0]


def test_read_glove(spark, tmp_path):
    path = tmp_path / "glove.txt"
    path.write_text("hello 0.1 0.2 0.3\nworld 1.0 2.0 3.0\nbad 0.5 oops 0.7\nshort 1.0\n")
    df = read_glove_txt(spark, str(path), dim=3)
    rows = {r["token"]: r["vector"] for r in df.collect()}
    assert set(rows) == {"hello", "world"}
    assert [round(x, 3) for x in rows["hello"]] == [0.1, 0.2, 0.3]
    noskip = read_glove_txt(spark, str(path), dim=3, skip_invalid=False)
    assert noskip.count() == 4


def test_synthetic_deterministic(spark):
    a = synthetic_vectors(spark, 100, 8, seed=42).collect()
    b = synthetic_vectors(spark, 100, 8, seed=42).collect()
    assert len(a) == 100
    da = {r["id"]: r["vector"] for r in a}
    db = {r["id"]: r["vector"] for r in b}
    assert da == db
    assert all(0.0 <= x < 1.0 for v in da.values() for x in v)


def test_orc_round_trip(spark, tmp_path):
    """ORC source/sink parity: schema (incl. array + timestamp) and rows
    survive a write/read round trip — the third columnar format next to
    parquet (native Spark, no extra package)."""
    from datetime import datetime

    df = spark.createDataFrame(
        [
            (1, "a", [0.5, 1.5], datetime(2024, 1, 1, 12)),
            (2, "b", [], datetime(2024, 6, 30)),
        ],
        "id long, name string, vec array<double>, ts timestamp",
    )
    path = str(tmp_path / "t.orc")
    df.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
