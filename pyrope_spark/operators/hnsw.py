"""Per-partition HNSW (SURVEY §7 hard part b) with a pure-numpy graph.

The reference ships an in-process HNSW graph
(``src/Pyrope.GarnetServer/Vector/HnswVectorIndex.cs:30-357``, m=16,
efConstruction=200, efSearch=10). Graph traversal has no Spark primitive and
a distributed graph walk would serialize the hot loop through the driver, so
this engine's *primary* ANN path is IVF partition pruning at an equal recall
target (see COVERAGE.md Q2).

For parity with deployments that want HNSW recall characteristics, this
module provides the idiomatic Spark composition: build one graph PER
PARTITION inside ``mapInPandas`` (each executor owns its shard's graph),
emit per-partition top-K, then take the global top-K — the same local/global
split as the GEMM scan, with HNSW as the local scorer.

:class:`NumpyHnsw` is a dependency-free implementation of the reference's
graph semantics (``HnswVectorIndex.cs:95-357``):

- level sampling ``floor(-ln(U) / ln(M))`` (``GenerateRandomLevel``, :352-358)
  — seeded here for reproducibility (the reference draws from an unseeded
  RNG; a documented deviation that only affects graph shape, not contract);
- greedy single-link descent on layers above the insertion level
  (``:108-134``);
- ef-bounded best-first expansion per layer (``SearchLayer``, :281-327);
- simple nearest-M neighbor selection (``SelectNeighbors``, :329-331 — the
  reference uses the plain variant, not the diversity heuristic);
- bidirectional links pruned to M per layer, 2M at layer 0
  (``:146-160, PruneNeighbors :333-350``);
- distances: L2 = squared euclidean, IP = negated dot, cosine = 1 - cos on
  normalized vectors; scores returned higher-is-better with the same
  conversion as ``Search`` (:249-262).

``hnswlib`` is used instead when installed (`impl='hnswlib'`); the numpy
graph is the default so the operator runs — and is recall-tested — in any
environment.
"""

from __future__ import annotations

import heapq
import math
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


class NumpyHnsw:
    """Single-shard HNSW graph over a fixed matrix, pure numpy + heapq.

    Built once from a matrix (the per-partition bulk path); incremental
    ``_insert`` mirrors the reference Add. Deterministic given ``seed``.
    """

    def __init__(
        self,
        mat: np.ndarray,
        metric: str = "l2",
        m: int = DEFAULT_M,
        ef_construction: int = DEFAULT_EF_CONSTRUCTION,
        seed: int = 42,
    ):
        if m < 2:
            raise ValueError("M must be >= 2")
        self.metric = metric
        self.m = m
        self.efc = ef_construction
        self._lambda = 1.0 / math.log(m)
        mat = np.asarray(mat, dtype=np.float64)
        if metric == "cosine":
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = mat / np.where(norms < 1e-6, 1.0, norms)
        self.mat = mat
        rng = np.random.default_rng(seed)
        n = mat.shape[0]
        self._levels = np.floor(
            -np.log(np.maximum(rng.random(n), 1e-9)) * self._lambda
        ).astype(np.int64)
        # adjacency: per node, one int list per level 0..node_level
        self._adj: list[list[list[int]]] = [
            [[] for _ in range(lv + 1)] for lv in self._levels
        ]
        self.entry = -1
        self.max_layer = -1
        for i in range(n):
            self._insert(i)

    # ---------------------------------------------------------- distances

    def _dists(self, q: np.ndarray, idx) -> np.ndarray:
        rows = self.mat[idx]
        if self.metric == "l2":
            d = rows - q[None, :]
            return np.einsum("ij,ij->i", d, d)
        if self.metric == "ip":
            return -(rows @ q)
        return 1.0 - (rows @ q)  # cosine over normalized rows

    # -------------------------------------------------------------- build

    def _insert(self, i: int) -> None:
        level = int(self._levels[i])
        if self.entry < 0:
            self.entry = i
            self.max_layer = level
            return
        q = self.mat[i]
        curr = self.entry
        dist = float(self._dists(q, [curr])[0])
        # greedy descent on layers above the node's level
        for l in range(self.max_layer, level, -1):
            changed = True
            while changed:
                changed = False
                nbs = self._adj[curr][l] if l < len(self._adj[curr]) else []
                if nbs:
                    ds = self._dists(q, nbs)
                    j = int(np.argmin(ds))
                    if ds[j] < dist:
                        dist = float(ds[j])
                        curr = nbs[j]
                        changed = True
        # search & link from min(level, max_layer) down to 0
        for l in range(min(level, self.max_layer), -1, -1):
            cands = self._search_layer(curr, q, self.efc, l)
            neigh = [nid for _, nid in cands[: self.m]]
            cap = self.m * 2 if l == 0 else self.m
            for nid in neigh:
                self._adj[i][l].append(nid)
                self._adj[nid][l].append(i)
                if len(self._adj[nid][l]) > cap:
                    # prune to the cap nearest of the neighbor's own links
                    nbs = self._adj[nid][l]
                    ds = self._dists(self.mat[nid], nbs)
                    order = np.argsort(ds, kind="stable")[:cap]
                    self._adj[nid][l] = [nbs[o] for o in order]
            if cands:
                curr = cands[0][1]
        if level > self.max_layer:
            self.max_layer = level
            self.entry = i

    # ------------------------------------------------------------- search

    def _search_layer(self, entry: int, q: np.ndarray, ef: int, level: int):
        """Best-first ef-bounded expansion; returns [(dist, id)] ascending."""
        d0 = float(self._dists(q, [entry])[0])
        visited = {entry}
        cand = [(d0, entry)]  # min-heap of frontier
        best = [(-d0, entry)]  # max-heap (negated) of current ef-best
        while cand:
            d, c = heapq.heappop(cand)
            if d > -best[0][0] and len(best) >= ef:
                break
            nbs = [
                nb
                for nb in (self._adj[c][level] if level < len(self._adj[c]) else [])
                if nb not in visited
            ]
            if not nbs:
                continue
            visited.update(nbs)
            ds = self._dists(q, nbs)
            for dn, nb in zip(ds, nbs):
                dn = float(dn)
                if len(best) < ef or dn < -best[0][0]:
                    heapq.heappush(cand, (dn, nb))
                    heapq.heappush(best, (-dn, nb))
                    if len(best) > ef:
                        heapq.heappop(best)
        return sorted((-nd, i) for nd, i in best)

    def search(self, q: np.ndarray, k: int, ef_search: int = DEFAULT_EF_SEARCH):
        """Top-k (id, score) for one query, score higher-is-better
        (reference Search, HnswVectorIndex.cs:206-270)."""
        if self.entry < 0:
            return []
        q = np.asarray(q, dtype=np.float64)
        if self.metric == "cosine":
            n = np.linalg.norm(q)
            if n > 1e-6:
                q = q / n
        curr = self.entry
        dist = float(self._dists(q, [curr])[0])
        for l in range(self.max_layer, 0, -1):
            changed = True
            while changed:
                changed = False
                nbs = self._adj[curr][l] if l < len(self._adj[curr]) else []
                if nbs:
                    ds = self._dists(q, nbs)
                    j = int(np.argmin(ds))
                    if ds[j] < dist:
                        dist = float(ds[j])
                        curr = nbs[j]
                        changed = True
        cands = self._search_layer(curr, q, max(ef_search, k), 0)
        out = []
        for d, i in cands[:k]:
            score = 1.0 - d if self.metric == "cosine" else -d
            out.append((i, score))
        return out


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
    impl: str = "numpy",
    fallback_bruteforce: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Per-partition ANN: each task builds a local HNSW graph over its shard
    and answers every query against it; the global window keeps the best K.

    ``impl='numpy'`` (default) uses :class:`NumpyHnsw` — runs everywhere.
    ``impl='hnswlib'`` uses the C library when installed (faster builds at
    large shard sizes). ``fallback_bruteforce=True`` swaps the local scorer
    for exact numpy (plumbing tests)."""
    if impl == "hnswlib" and not HAVE_HNSWLIB:
        raise NotImplementedError("hnswlib is not installed; use impl='numpy'")
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
        if fallback_bruteforce:
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
                scores[:, qn < 1e-6] = 0.0
            idx = np.argpartition(-scores, top - 1, axis=0)[:top, :]
            flat = idx.T.ravel()
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(np.asarray(qids_b, dtype=object), top),
                    "id": np.asarray(ids_all, dtype=object)[flat],
                    "score": scores[flat, np.repeat(np.arange(len(qids_b)), top)],
                }
            )
        elif impl == "hnswlib" and HAVE_HNSWLIB:
            index = hnswlib.Index(space=space, dim=mat.shape[1])
            index.init_index(max_elements=n, ef_construction=ef_construction, M=m)
            index.add_items(mat, np.arange(n))
            index.set_ef(max(ef_search, top))
            labels, dists = index.knn_query(qmat_b, k=top)
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
            graph = NumpyHnsw(
                mat, metric=metric, m=m, ef_construction=ef_construction, seed=seed
            )
            out_q, out_i, out_s = [], [], []
            for j, qid in enumerate(qids_b):
                for i, score in graph.search(qmat_b[j], top, ef_search=ef_search):
                    out_q.append(qid)
                    out_i.append(ids_all[i])
                    out_s.append(score)
            if out_q:
                yield pd.DataFrame({"query_id": out_q, "id": out_i, "score": out_s})

    scored = vectors.select(
        F.col(id_col).cast("string").alias(id_col), F.col(vector_col)
    ).mapInPandas(scan, RESULT_SCHEMA)
    return topk_per_group(
        scored, ["query_id"], k, score_col="score", tiebreak_col="id", two_phase=False
    )
