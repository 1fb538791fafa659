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


def test_read_ivecs_roundtrip(spark, tmp_path):
    import struct

    import numpy as np

    from pyrope_spark.sources.readers import read_ivecs

    p = tmp_path / "gt.ivecs"
    truth = [[3, 1, 4], [1, 5, 9]]
    with open(p, "wb") as f:
        for row in truth:
            f.write(struct.pack("<i", len(row)))
            f.write(np.asarray(row, dtype="<i4").tobytes())
    out = sorted(read_ivecs(spark, str(p)).collect(), key=lambda r: r.id)
    assert [list(r.neighbors) for r in out] == truth


def test_write_fvecs_read_fvecs_roundtrip(spark, tmp_path):
    from pyrope_spark.sources.readers import read_fvecs, write_fvecs

    df = spark.createDataFrame(
        [(i, [float(i), float(i) + 0.5]) for i in range(5)],
        "id LONG, vector ARRAY<FLOAT>",
    )
    p = tmp_path / "out.fvecs"
    n = write_fvecs(df, str(p))
    assert n == 5
    back = read_fvecs(spark, str(p)).collect()
    got = sorted(tuple(r.vector) for r in back)
    want = sorted((float(i), float(i) + 0.5) for i in range(5))
    assert got == want


def test_read_npy_matrix_blocks_and_dtypes(spark, tmp_path):
    import numpy as np

    from pyrope_spark.sources.readers import read_npy_matrix

    mat = np.arange(20, dtype=np.float32).reshape(5, 4)
    p = tmp_path / "emb.npy"
    np.save(p, mat)
    out = sorted(
        read_npy_matrix(spark, str(p), rows_per_block=2).collect(),
        key=lambda r: r.vec_id,
    )
    assert [r.vec_id for r in out] == [0, 1, 2, 3, 4]
    assert np.allclose(np.stack([r.vector for r in out]), mat)
    # float64 narrows to float32 rows
    mat64 = np.linspace(0, 1, 12, dtype=np.float64).reshape(3, 4)
    p64 = tmp_path / "emb64.npy"
    np.save(p64, mat64)
    out64 = sorted(
        read_npy_matrix(spark, str(p64), rows_per_block=2).collect(),
        key=lambda r: r.vec_id,
    )
    assert np.allclose(
        np.stack([r.vector for r in out64]), mat64.astype(np.float32)
    )


def test_read_npy_matrix_rejects_bad_inputs(spark, tmp_path):
    import numpy as np
    import pytest

    from pyrope_spark.sources.readers import read_npy_matrix

    p1 = tmp_path / "one_d.npy"
    np.save(p1, np.arange(5, dtype=np.float32))
    with pytest.raises(ValueError):
        read_npy_matrix(spark, str(p1))
    p2 = tmp_path / "fortran.npy"
    np.save(p2, np.asfortranarray(np.ones((2, 2), dtype=np.float32)))
    with pytest.raises(ValueError):
        read_npy_matrix(spark, str(p2))
    p3 = tmp_path / "notnpy.npy"
    p3.write_bytes(b"garbage")
    with pytest.raises(ValueError):
        read_npy_matrix(spark, str(p3))
