"""Dataset sources / ingest parsers.

Reference inventory (SURVEY.md §2.1):
- S4 vector payload parser — JSON array / CSV / raw little-endian float32
  (``src/Pyrope.GarnetServer/Utils/VectorParsing.cs:11-98``)
- S5 fvecs reader — records of int32 dim + dim float32 LE
  (``src/Pyrope.Benchmarks/Datasets/FvecsReader.cs:13-58``)
- S6 GloVe txt reader — ``token v1..vN`` lines, skip-invalid option
  (``src/Pyrope.Benchmarks/Datasets/GloveTxtReader.cs:13-50``)
- S7 synthetic generator — seeded uniform[0,1) (``Program.cs:251-263``);
  the distributed version lives in ``bench.synth_vectors``; re-exported here.

Spark-first: S4 is a column expression (JSON/CSV branches) plus a small
binary-decode UDF; S5 reads through ``binaryFile`` + a chunk decoder (each
.fvecs file is one record stream — for many-GB corpora pre-split files or
convert to Parquet once, which is what a 100 TB pipeline would do anyway);
S6 is ``spark.read.text`` + native split/cast, fully distributed.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_vector_payload(payload: Column, fmt: str = "auto") -> Column:
    """JSON-array / CSV / space-separated string payload -> ARRAY<FLOAT>.

    Mirrors VectorParsing.cs semantics: JSON arrays take precedence, then
    comma/space separated numbers. (The raw binary float32 branch is
    :func:`decode_f32le` over a BINARY column — a different input type in
    Spark's schema discipline, unlike the reference's byte-span sniffing.)
    """
    if fmt == "json":
        return F.from_json(payload, "array<float>")
    if fmt == "csv":
        return F.transform(
            F.split(F.regexp_replace(F.trim(payload), r"[,\s]+", ","), ","),
            lambda x: x.try_cast("float"),
        )
    # auto: JSON if it looks like an array, else CSV
    return F.when(
        F.trim(payload).startswith("["), F.from_json(payload, "array<float>")
    ).otherwise(
        F.transform(
            F.split(F.regexp_replace(F.trim(payload), r"[,\s]+", ","), ","),
            lambda x: x.try_cast("float"),
        )
    )


def decode_f32le(binary: Column, dim: int | None = None):
    """Raw little-endian float32 BINARY -> ARRAY<FLOAT> (pandas UDF; the
    byte blob is opaque to Catalyst)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def _decode(b: pd.Series) -> pd.Series:
        def one(buf):
            if buf is None:
                return None
            arr = np.frombuffer(buf, dtype="<f4")
            if dim is not None and len(arr) != dim:
                return None  # VEC_ERR_DIM analog: reject, don't truncate
            return arr
        return b.map(one)

    return _decode(binary)


def read_fvecs(spark: SparkSession, path: str, limit: int | None = None) -> DataFrame:
    """FAISS .fvecs: repeated [int32 dim][dim x float32], little-endian
    (FvecsReader.cs:13-58). Reads files via binaryFile and decodes each blob
    in an Arrow batch; row ids are ``{file}#{i}``."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                buf = row["content"]
                off = 0
                ids, vecs = [], []
                i = 0
                while off + 4 <= len(buf):
                    (d,) = struct.unpack_from("<i", buf, off)
                    off += 4
                    if d <= 0 or off + 4 * d > len(buf):
                        break
                    vecs.append(np.frombuffer(buf, dtype="<f4", count=d, offset=off).copy())
                    ids.append(f"{row['path']}#{i}")
                    off += 4 * d
                    i += 1
                    if limit is not None and i >= limit:
                        break
                if ids:
                    yield pd.DataFrame({"id": ids, "vector": vecs})

    return files.mapInPandas(decode, "id string, vector array<float>")


def read_glove_txt(
    spark: SparkSession, path: str, dim: int, *, skip_invalid: bool = True,
    limit: int | None = None,
) -> DataFrame:
    """GloVe text embeddings: ``token v1 ... vN`` per line
    (GloveTxtReader.cs:13-50). Fully native: text source + split + cast, so
    parsing scales with the cluster."""
    lines = spark.read.text(path)
    if limit is not None:
        lines = lines.limit(limit)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    df = lines.select(
        F.element_at(parts, 1).alias("token"),
        F.slice(parts, 2, dim).alias("_raw"),
    ).withColumn("vector", F.transform(F.col("_raw"), lambda x: x.try_cast("float")))
    valid = (F.size("_raw") == dim) & ~F.exists("vector", lambda x: x.isNull())
    if skip_invalid:
        df = df.filter(valid)
    return df.select("token", "vector")


def synthetic_vectors(
    spark: SparkSession, n: int, dim: int, seed: int = 42, partitions: int = 32
) -> DataFrame:
    """Seeded uniform[0,1) float32 vectors, ids ``v0..v{n-1}``
    (reference Program.cs:251-263, seed 42 base / 1337 queries).
    Distributed: an independent RNG stream per partition."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for pid in pdf["pid"]:
                rng = np.random.default_rng(seed + int(pid))
                lo = int(pid) * n // partitions
                hi = (int(pid) + 1) * n // partitions
                mat = rng.random((hi - lo, dim), dtype=np.float32)
                yield pd.DataFrame(
                    {"id": [f"v{i}" for i in range(lo, hi)], "vector": list(mat)}
                )

    base = spark.createDataFrame([(i,) for i in range(partitions)], "pid int").repartition(
        partitions
    )
    return base.mapInPandas(gen, "id string, vector array<float>")


def read_ivecs(
    spark: SparkSession, path: str, limit: int | None = None
) -> DataFrame:
    """FAISS .ivecs: repeated [int32 dim][dim × int32], little-endian —
    the ground-truth neighbor-list companion of .fvecs (SIFT1M ships its
    true top-100 per query as .ivecs; recall eval joins it against
    ann_topk output).  Same binaryFile + Arrow-batch decode shape as
    :func:`read_fvecs`; row ids are ``{file}#{i}``."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                buf = row["content"]
                off = 0
                ids, vecs = [], []
                i = 0
                while off + 4 <= len(buf):
                    (d,) = struct.unpack_from("<i", buf, off)
                    off += 4
                    if d <= 0 or off + 4 * d > len(buf):
                        break
                    vecs.append(
                        np.frombuffer(
                            buf, dtype="<i4", count=d, offset=off
                        ).astype(np.int64)
                    )
                    ids.append(f"{row['path']}#{i}")
                    off += 4 * d
                    i += 1
                    if limit is not None and i >= limit:
                        break
                if ids:
                    yield pd.DataFrame({"id": ids, "neighbors": vecs})

    return files.mapInPandas(decode, "id string, neighbors array<long>")


def write_fvecs(df: DataFrame, local_path: str, *, vector_col: str = "vector") -> int:
    """Write a vector column to one local .fvecs file (interop export for
    FAISS-toolchain consumers).  Driver-side by design: .fvecs is a single
    unsplittable stream, so this is the SMALL-export path (eval sets,
    centroid dumps) — corpus-scale exports stay parquet.  Returns rows
    written."""
    rows = df.select(vector_col).collect()
    n = 0
    with open(local_path, "wb") as f:
        for r in rows:
            vec = r[0]
            if vec is None:
                continue
            arr = np.asarray(vec, dtype="<f4")
            f.write(struct.pack("<i", len(arr)))
            f.write(arr.tobytes())
            n += 1
    return n


def read_npy_matrix(
    spark: SparkSession,
    local_path: str,
    *,
    rows_per_block: int = 65536,
    id_offset: int = 0,
) -> DataFrame:
    """Distributed read of a 2-D float .npy matrix (numpy format v1/v2,
    C-order) into (vec_id, vector) rows — the interchange format
    embedding dumps actually arrive in.

    The HEADER is parsed once driver-side (pure struct/ast, no numpy
    mmap); each task then reads ONLY its row-block's byte range with a
    seek — so a 100 GB .npy on shared storage fans out across executors
    without any single process materializing the matrix.
    """
    import ast

    with open(local_path, "rb") as f:
        magic = f.read(6)
        if magic != b"\x93NUMPY":
            raise ValueError(f"not a .npy file: {local_path!r}")
        major, _minor = f.read(1)[0], f.read(1)[0]
        if major == 1:
            (hlen,) = struct.unpack("<H", f.read(2))
        else:
            (hlen,) = struct.unpack("<I", f.read(4))
        header = ast.literal_eval(f.read(hlen).decode("latin1"))
        data_start = f.tell()
    descr = header["descr"]
    if header.get("fortran_order"):
        raise ValueError("fortran_order .npy not supported (C-order only)")
    shape = header["shape"]
    if len(shape) != 2:
        raise ValueError(f".npy must be 2-D, got shape {shape}")
    n, d = int(shape[0]), int(shape[1])
    if descr not in ("<f4", "<f8"):
        raise ValueError(f"dtype {descr!r} not supported (<f4/<f8 only)")
    itemsize = 4 if descr == "<f4" else 8
    n_blocks = (n + rows_per_block - 1) // rows_per_block

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blk in pdf["blk"].tolist():
                lo = int(blk) * rows_per_block
                hi = min(lo + rows_per_block, n)
                with open(local_path, "rb") as f:
                    f.seek(data_start + lo * d * itemsize)
                    raw = f.read((hi - lo) * d * itemsize)
                mat = np.frombuffer(raw, dtype=descr).reshape(hi - lo, d)
                yield pd.DataFrame(
                    {
                        "vec_id": range(id_offset + lo, id_offset + hi),
                        "vector": list(mat.astype(np.float32)),
                    }
                )

    blocks = spark.createDataFrame(
        [(i,) for i in range(n_blocks)], "blk long"
    ).repartition(min(n_blocks, 64))
    return blocks.mapInPandas(gen, "vec_id long, vector array<float>")
