"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

A 100 TB training-data pipeline treats media as ``BINARY`` payload columns
with a typed metadata struct; decode / resize / feature-extraction run as
Arrow-batched ``mapInPandas`` stages so the heavy bytes never round-trip
through the JVM row format more than once.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels are STUBS: ``decode_image_stub`` raises ``NotImplementedError``
unless ``deterministic_fake=True``, in which case it produces a seeded fake
decode derived from the payload hash — the Spark-side plumbing (schemas, batch
shapes, partitioning, UDF signatures) is real and tested either way. Swap the
stub body for a real codec on a cluster with the libraries installed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def with_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata derivable without a codec: byte size + content hash
    (native expressions — no Python)."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col)).cast("long")).withColumn(
        "payload_sha1", F.sha1(F.col(payload_col))
    )


def media_stats(df: DataFrame, kind_col: str = "kind") -> DataFrame:
    """Per-kind corpus stats — the partition-planning input (e.g. images
    repartitioned by size decile before decode so tasks are even)."""
    return df.groupBy(kind_col).agg(
        F.count("*").alias("n"),
        F.sum(F.length("payload")).cast("long").alias("total_bytes"),
        F.avg(F.length("payload")).alias("avg_bytes"),
    )


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha1(payload or b"").digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def decode_image_stub(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    out_h: int = 32,
    out_w: int = 32,
    deterministic_fake: bool = False,
) -> DataFrame:
    """BINARY -> decoded pixel tensor column ``pixels`` (flattened
    ARRAY<INT>, row-major h*w*3) + (h, w). STUB: real codecs are not in this
    container — raises unless ``deterministic_fake`` is set, which derives
    seeded fake pixels from the payload hash (stable across runs/executors,
    so downstream tests are meaningful)."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("pixels", T.ArrayType(T.IntegerType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "image decode requires PIL/opencv (not in this container); "
                    "pass deterministic_fake=True for the plumbing path"
                )
            out = {id_col: [], "h": [], "w": [], "pixels": []}
            for _, row in pdf.iterrows():
                px = _fake_pixels(row[payload_col], out_h, out_w)
                out[id_col].append(row[id_col])
                out["h"].append(out_h)
                out["w"].append(out_w)
                out["pixels"].append(px.ravel().astype(np.int32))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def resize_image_stub(decoded: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Nearest-neighbor resize over decoded pixel tensors — pure numpy, real
    (no codec needed): demonstrates the batch shape for pixel ops."""
    schema = decoded.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                px = np.asarray(row["pixels"], dtype=np.int32).reshape(row["h"], row["w"], 3)
                yi = (np.arange(out_h) * row["h"] // out_h).astype(int)
                xi = (np.arange(out_w) * row["w"] // out_w).astype(int)
                rs = px[yi][:, xi]
                rows.append((row[pdf.columns[0]], out_h, out_w, rs.ravel()))
            yield pd.DataFrame(rows, columns=list(pdf.columns))

    return decoded.mapInPandas(run, schema)


def extract_features(decoded: DataFrame, *, id_col: str = "media_id") -> DataFrame:
    """Pixel tensor -> small feature vector (channel means/stds + gradient
    energy). Real numpy math over the (possibly fake-decoded) tensors —
    the embedding-extraction batch shape without a model dependency."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for _, row in pdf.iterrows():
                px = np.asarray(row["pixels"], dtype=np.float64).reshape(
                    row["h"], row["w"], 3
                )
                mean = px.mean(axis=(0, 1))
                std = px.std(axis=(0, 1))
                grad = np.abs(np.diff(px, axis=0)).mean() + np.abs(np.diff(px, axis=1)).mean()
                ids.append(row[id_col])
                feats.append(np.concatenate([mean, std, [grad]]).astype(np.float32))
            yield pd.DataFrame({id_col: ids, "features": feats})

    return decoded.mapInPandas(run, schema)


def frame_sample_stub(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    every_n: int = 10,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Video payload -> sampled frame rows (one row per sampled frame).
    STUB decode; the explode/fan-out plumbing (one input row -> many frame
    rows, stable frame ids) is the real part."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("pixels", T.ArrayType(T.IntegerType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "video decode requires ffmpeg (not in this container); "
                    "pass deterministic_fake=True for the plumbing path"
                )
            out = {id_col: [], "frame_no": [], "pixels": []}
            for _, row in pdf.iterrows():
                n_frames = 30  # fake fixed-length clip
                for fno in range(0, n_frames, every_n):
                    px = _fake_pixels((row[payload_col] or b"") + fno.to_bytes(4, "little"), 8, 8)
                    out[id_col].append(row[id_col])
                    out["frame_no"].append(fno)
                    out["pixels"].append(px.ravel().astype(np.int32))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema)
