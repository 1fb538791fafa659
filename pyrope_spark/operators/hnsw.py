"""Per-partition HNSW (documented deviation, SURVEY §7 hard part b).

The reference ships an in-process HNSW graph
(``src/Pyrope.GarnetServer/Vector/HnswVectorIndex.cs:30-357``, m=16,
efConstruction=200, efSearch=10). Graph traversal has no Spark primitive and
a distributed graph walk would serialize the hot loop through the driver, so
this engine's *primary* ANN path is IVF partition pruning at an equal recall
target (see COVERAGE.md Q2).

For parity with deployments that want HNSW recall characteristics, this
module provides the idiomatic Spark composition: build one ``hnswlib`` index
PER PARTITION inside ``mapInPandas`` (each executor owns its shard's graph),
emit per-partition top-K, then take the global top-K — the same
local/global split as the GEMM scan, with HNSW as the local scorer.

``hnswlib`` is not installed in this container; everything is gated behind
an import-try and tests skip when missing. The partitioning/merge logic is
the real contribution and is exercised by the brute-force fallback.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyrope_spark.operators.knn import RESULT_SCHEMA
from pyrope_spark.operators.topk import topk_per_group

try:  # pragma: no cover - availability depends on the environment
    import hnswlib  # type: ignore

    HAVE_HNSWLIB = True
except ImportError:
    hnswlib = None
    HAVE_HNSWLIB = False

DEFAULT_M = 16  # reference HnswVectorIndex.cs:30
DEFAULT_EF_CONSTRUCTION = 200
DEFAULT_EF_SEARCH = 10


def hnsw_partition_search(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str = "l2",
    *,
    id_col: str = "id",
    vector_col: str = "vector",
    query_id_col: str = "query_id",
    query_vector_col: str = "vector",
    m: int = DEFAULT_M,
    ef_construction: int = DEFAULT_EF_CONSTRUCTION,
    ef_search: int = DEFAULT_EF_SEARCH,
    fallback_bruteforce: bool = False,
) -> DataFrame:
    """Per-partition ANN: each task builds a local HNSW graph over its shard
    and answers every query against it; the global window keeps the best K.

    With ``fallback_bruteforce=True`` the per-partition scorer is exact numpy
    (used to exercise the partition/merge plumbing where hnswlib is absent —
    results are then exact, not approximate).
    """
    if not HAVE_HNSWLIB and not fallback_bruteforce:
        raise NotImplementedError(
            "hnswlib is not installed; pass fallback_bruteforce=True for the "
            "exact per-partition path, or use the IVF operators (the "
            "engine's primary ANN path)"
        )
    spark = vectors.sparkSession
    qrows = queries.select(query_id_col, query_vector_col).collect()
    qids = [r[0] for r in qrows]
    qmat = np.asarray([r[1] for r in qrows], dtype=np.float32)
    bq = spark.sparkContext.broadcast((qids, qmat))
    space = {"l2": "l2", "ip": "ip", "cosine": "cosine"}[metric]
    kk = max(k, 1)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_b, qmat_b = bq.value
        ids_all: list = []
        vecs: list = []
        for pdf in batches:
            ids_all.extend(pdf[id_col].astype(str).tolist())
            vecs.extend(pdf[vector_col].tolist())
        if not ids_all:
            return
        mat = np.asarray(vecs, dtype=np.float32)
        n = len(ids_all)
        top = min(kk, n)
        if HAVE_HNSWLIB and not fallback_bruteforce:
            index = hnswlib.Index(space=space, dim=mat.shape[1])
            index.init_index(max_elements=n, ef_construction=ef_construction, M=m)
            index.add_items(mat, np.arange(n))
            index.set_ef(max(ef_search, top))
            labels, dists = index.knn_query(qmat_b, k=top)
            # hnswlib returns distances (l2: squared; ip/cosine: 1 - sim)
            scores = -dists if space == "l2" else 1.0 - dists
            for j, qid in enumerate(qids_b):
                yield pd.DataFrame(
                    {
                        "query_id": [qid] * labels.shape[1],
                        "id": [ids_all[i] for i in labels[j]],
                        "score": scores[j].astype(np.float64),
                    }
                )
        else:
            q64 = qmat_b.astype(np.float64)
            v64 = mat.astype(np.float64)
            if metric == "ip":
                scores = v64 @ q64.T
            elif metric == "l2":
                v2 = np.einsum("ij,ij->i", v64, v64)[:, None]
                q2 = np.einsum("ij,ij->i", q64, q64)[None, :]
                scores = -(v2 - 2.0 * (v64 @ q64.T) + q2)
            else:
                vn = np.linalg.norm(v64, axis=1)
                qn = np.linalg.norm(q64, axis=1)
                scores = (v64 / np.where(vn < 1e-6, 1, vn)[:, None]) @ (
                    q64 / np.where(qn < 1e-6, 1, qn)[:, None]
                ).T
                scores[vn < 1e-6, :] = 0.0
            idx = np.argpartition(-scores, top - 1, axis=0)[:top, :]
            flat = idx.T.ravel()
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(np.asarray(qids_b, dtype=object), top),
                    "id": np.asarray(ids_all, dtype=object)[flat],
                    "score": scores[flat, np.repeat(np.arange(len(qids_b)), top)],
                }
            )

    scored = vectors.select(
        F.col(id_col).cast("string").alias(id_col), F.col(vector_col)
    ).mapInPandas(scan, RESULT_SCHEMA)
    return topk_per_group(
        scored, ["query_id"], k, score_col="score", tiebreak_col="id", two_phase=False
    )
