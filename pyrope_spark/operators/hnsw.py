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

    #: incremental-insert shards above this size switch to the vectorized
    #: bulk build in ``build_mode='auto'`` (the per-row insert loop is
    #: O(n) Python beam searches — fine to ~8k, pathological at 100k+)
    BULK_THRESHOLD = 8192

    def __init__(
        self,
        mat: np.ndarray,
        metric: str = "l2",
        m: int = DEFAULT_M,
        ef_construction: int = DEFAULT_EF_CONSTRUCTION,
        seed: int = 42,
        build_mode: str = "auto",
    ):
        if m < 2:
            raise ValueError("M must be >= 2")
        if build_mode not in ("auto", "insert", "bulk"):
            raise ValueError(f"unknown build_mode {build_mode!r}")
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
        if build_mode == "bulk" or (build_mode == "auto" and n > self.BULK_THRESHOLD):
            self._bulk_build(seed)
        else:
            for i in range(n):
                self._insert(i)

    # --------------------------------------------------------- bulk build

    def _bulk_build(self, seed: int) -> None:
        """Vectorized construction for large shards (VERDICT r2 item 4:
        "batch the level-0 link phase"). Per level, every node in the level
        set links to its M nearest level-set members, computed with blocked
        GEMM (exact all-pairs for small sets, pivot-partitioned above), then
        edges are symmetrized and pruned to the same per-node caps as the
        incremental path (2M at layer 0, M above). Upper layers are tiny
        (P(level>=l) = M^-l) and get EXACT kNN — they provide the long-range
        routing the sequential build gets from high-level links. The graph
        SHAPE deviates from the reference's insertion-order-dependent build
        (as the seeded RNG already does, see module docstring); the search
        contract and recall gates are unchanged, and ~170 inserts/s becomes
        a few GEMM-bound seconds per 100k shard (bench:
        hnsw_bulk_build_*)."""
        n = self.mat.shape[0]
        if n == 0:
            return
        self.max_layer = int(self._levels.max())
        self.entry = int(np.argmax(self._levels))
        # float32 mirror + cached squared norms for SELECTION kernels only
        # (emitted search scores always recompute in float64 via _dists)
        self._mat32 = self.mat.astype(np.float32)
        self._sqn32 = np.einsum("ij,ij->i", self._mat32, self._mat32)
        rng = np.random.default_rng(seed + 1)
        for level in range(self.max_layer + 1):
            nodes = np.nonzero(self._levels >= level)[0]
            if len(nodes) < 2:
                continue
            links = self._bulk_knn(nodes, rng)
            self._set_links(level, nodes, links, rng)

    def _pair_dists_idx(self, ai: np.ndarray, bi: np.ndarray) -> np.ndarray:
        """(len(ai) x len(bi)) metric distances between node-index sets via
        float32 GEMM with cached norms (selection only — emitted search
        scores always come from :meth:`_dists` in float64)."""
        A = self._mat32[ai]
        B = self._mat32[bi]
        # NOTE r4: np.dot(A, ascontiguousarray(B.T)) was tried here (the
        # contiguous-RHS BLAS win from pq._lloyd_fit) and measured 2.2x
        # SLOWER end-to-end — B is the large side in the NN-descent calls,
        # so the per-call transpose copy dominates the GEMM. Keep `@`.
        G = A @ B.T
        if self.metric == "l2":
            return self._sqn32[ai][:, None] - 2.0 * G + self._sqn32[bi][None, :]
        if self.metric == "ip":
            return -G
        return 1.0 - G  # cosine over normalized rows

    def _bulk_knn(self, nodes: np.ndarray, rng) -> np.ndarray:
        """For each level-set member, its k=min(m, n-1) nearest other
        members (global ids). Exact for sets up to 8192; above that, nodes
        are blocked by their top-2 nearest of ~n/256 sampled pivots, linked
        within the combined cell, then refined with two NN-descent rounds
        (neighbors-of-neighbors rescoring, fully vectorized) — pivot
        blocking alone loses too much neighbor recall in high dimensions;
        NN-descent recovers it at a few GEMM passes."""
        nn = len(nodes)
        k = min(self.m, nn - 1)
        if nn <= 8192:
            D = self._pair_dists_idx(nodes, nodes)
            np.fill_diagonal(D, np.inf)
            idx = np.argpartition(D, k - 1, axis=1)[:, :k]
            return nodes[idx]
        npiv = max(16, nn // 256)
        piv_nodes = nodes[rng.choice(nn, npiv, replace=False)]
        # top-2 pivot assignment, blocked over rows (l2-geometry blocking for
        # any metric; link selection below uses the real metric distance)
        a1 = np.empty(nn, dtype=np.int64)
        a2 = np.empty(nn, dtype=np.int64)
        for lo in range(0, nn, 8192):
            hi = min(lo + 8192, nn)
            Db = self._pair_dists_idx(nodes[lo:hi], piv_nodes)
            t2 = np.argpartition(Db, 1, axis=1)[:, :2]
            first = Db[np.arange(hi - lo), t2[:, 0]] <= Db[np.arange(hi - lo), t2[:, 1]]
            a1[lo:hi] = np.where(first, t2[:, 0], t2[:, 1])
            a2[lo:hi] = np.where(first, t2[:, 1], t2[:, 0])
        links = np.full((nn, k), -1, dtype=np.int64)
        for p in range(npiv):
            members = np.nonzero((a1 == p) | (a2 == p))[0]
            owners = np.nonzero(a1 == p)[0]
            if len(members) < 2 or len(owners) == 0:
                continue
            D = self._pair_dists_idx(nodes[owners], nodes[members])
            # mask each owner's own column
            pos = np.searchsorted(members, owners)
            D[np.arange(len(owners)), pos] = np.inf
            kk = min(k, len(members) - 1)
            idx = np.argpartition(D, kk - 1, axis=1)[:, :kk]
            links[owners, :kk] = nodes[members[idx]]
        for _ in range(2):
            links = self._nn_descent_round(nodes, links)
        return links

    def _nn_descent_round(self, nodes: np.ndarray, links: np.ndarray) -> np.ndarray:
        """One NN-descent refinement pass: each node rescoring its current
        neighbors plus its neighbors' neighbors (k + k^2 candidates),
        keeping the k best — vectorized in row blocks with a gather + one
        batched einsum per block."""
        nn, k = links.shape
        expand = min(k, 8)  # neighbors-of-neighbors fan-in cap
        loc = np.full(self.mat.shape[0], -1, dtype=np.int64)
        loc[nodes] = np.arange(nn)
        L = np.where(links >= 0, loc[np.maximum(links, 0)], -1)  # local ids
        out = np.full_like(links, -1)
        ncand = k + k * expand
        block = max(1, 128_000_000 // (max(ncand, 1) * self.mat.shape[1] * 4))
        for lo in range(0, nn, block):
            hi = min(lo + block, nn)
            b = hi - lo
            own = L[lo:hi]                                        # (b, k)
            # neighbors-of-neighbors; -1 rows gather junk, masked below
            non = L[np.maximum(own, 0)][:, :, :expand].reshape(b, k * expand)
            # mask junk gathered via -1 slots: non[i, j*expand + e] belongs
            # to own[i, j], so the (b, k) mask repeats along the LAST axis
            non[np.repeat(own < 0, expand, axis=1)] = -1
            cand = np.concatenate([own, non], axis=1)             # (b, C)
            invalid = (cand < 0) | (cand == np.arange(lo, hi)[:, None])
            # mask duplicates: sort ids per row, equal-to-previous -> invalid
            order = np.argsort(cand, axis=1, kind="stable")
            sorted_c = np.take_along_axis(cand, order, axis=1)
            dup_sorted = np.zeros_like(invalid)
            dup_sorted[:, 1:] = sorted_c[:, 1:] == sorted_c[:, :-1]
            dup = np.zeros_like(invalid)
            np.put_along_axis(dup, order, dup_sorted, axis=1)
            invalid |= dup
            safe = np.maximum(cand, 0)
            gsafe = nodes[safe]
            V = self._mat32[gsafe]                                # (b, C, dim)
            Q = self._mat32[nodes[lo:hi]]                         # (b, dim)
            G = np.matmul(V, Q[:, :, None]).squeeze(-1)           # (b, C)
            if self.metric == "l2":
                D = self._sqn32[gsafe] - 2.0 * G + self._sqn32[nodes[lo:hi]][:, None]
            elif self.metric == "ip":
                D = -G
            else:
                D = 1.0 - G
            D = D.astype(np.float64)
            D[invalid] = np.inf
            kk = min(k, D.shape[1])
            idx = np.argpartition(D, kk - 1, axis=1)[:, :kk]
            picked = np.take_along_axis(cand, idx, axis=1)
            pd_ = np.take_along_axis(D, idx, axis=1)
            picked[~np.isfinite(pd_)] = -1
            out[lo:hi, :kk] = np.where(picked >= 0, nodes[np.maximum(picked, 0)], -1)
        return out

    def _set_links(
        self, level: int, nodes: np.ndarray, links: np.ndarray, rng=None
    ) -> None:
        """Symmetrize directed kNN links and prune each node to the level's
        cap by distance — the bulk analog of the incremental prune
        (reference PruneNeighbors, HnswVectorIndex.cs:333-350) — then append
        2 seeded random long-range bridges per node. A symmetrized kNN graph
        over clustered data fragments into per-cluster islands the beam
        cannot cross (measured: recall plateaus at the fraction of queries
        whose descent lands in the right island, regardless of ef); the
        sequential build avoids this because early inserts link across
        still-sparse space. Random bridges restore that navigable-small-world
        property at ~zero build cost."""
        cap = self.m * 2 if level == 0 else self.m
        kcols = links.shape[1]
        src = np.repeat(nodes, kcols)
        dst = links.ravel()
        keep = dst >= 0
        src, dst = src[keep], dst[keep]
        # undirected: both directions, then dedupe
        allsrc = np.concatenate([src, dst])
        alldst = np.concatenate([dst, src])
        n = self.mat.shape[0]
        eid = allsrc * n + alldst
        uniq, upos = np.unique(eid, return_index=True)
        allsrc, alldst = allsrc[upos], alldst[upos]
        # edge distances for PRUNE ORDERING only -> float32 selection
        # kernels (class convention; emitted search scores stay float64).
        # Measured at level-0 scale (3.2M edges, dim 128): the float64
        # gather + rowwise diff was 6.8 s; this norms-form float32 pass is
        # 1.7 s — half the gather bytes, no diff allocation.
        d = np.empty(len(allsrc), dtype=np.float64)
        for lo in range(0, len(allsrc), 400_000):
            hi = min(lo + 400_000, len(allsrc))
            si, di = allsrc[lo:hi], alldst[lo:hi]
            dot = np.einsum("ij,ij->i", self._mat32[si], self._mat32[di])
            if self.metric == "l2":
                d[lo:hi] = self._sqn32[si] - 2.0 * dot + self._sqn32[di]
            elif self.metric == "ip":
                d[lo:hi] = -dot
            else:
                d[lo:hi] = 1.0 - dot
        # per-source cap: stable sort by (src, dist), keep first `cap`
        perm = np.lexsort((d, allsrc))
        s_sorted = allsrc[perm]
        first = np.concatenate([[0], np.nonzero(np.diff(s_sorted))[0] + 1])
        counts = np.diff(np.concatenate([first, [len(s_sorted)]]))
        rank = np.arange(len(s_sorted)) - np.repeat(first, counts)
        # kept preserves perm's (src asc, dist asc) order, so the second
        # lexsort the first version ran here was an exact no-op (lexsort is
        # stable; re-sorting an already-(src,d)-sorted array is identity) —
        # dropped (r10 opt; profile: one full 2x|edges| lexsort removed)
        kept = perm[rank < cap]
        ks, kd = allsrc[kept], alldst[kept]
        bounds = np.concatenate(
            [[0], np.nonzero(np.diff(ks))[0] + 1, [len(ks)]]
        )
        for bi in range(len(bounds) - 1):
            lo, hi = bounds[bi], bounds[bi + 1]
            # ndarray.tolist() gives the same plain-int list as the old
            # [int(x) for x in ...] at C speed (profile: 4.4 s -> ~0.4 s)
            self._adj[ks[lo]][level] = kd[lo:hi].tolist()
        if rng is not None and len(nodes) > cap:
            bridges = rng.integers(0, len(nodes), (len(nodes), 2))
            # same append order and dedup semantics as the list-scan loop,
            # with O(1) set membership instead of O(len(adj)) list scans
            adjsets = {
                int(node): set(self._adj[node][level]) for node in nodes
            }
            for li, node in enumerate(nodes):
                node = int(node)
                adj = self._adj[node][level]
                aset = adjsets[node]
                for bj in nodes[bridges[li]]:
                    bj = int(bj)
                    if bj != node and bj not in aset:
                        adj.append(bj)
                        aset.add(bj)
                        self._adj[bj][level].append(node)
                        adjsets[bj].add(node)

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

    # ------------------------------------------------------- serialization

    def to_state(self, raw32: np.ndarray) -> bytes:
        """Serialize the built graph for executor-side rehydration.

        ``raw32`` is the PRE-``__init__`` float32 matrix the graph was built
        from: ``from_state`` re-applies the exact ``__init__`` matrix
        pipeline (float64 cast + cosine normalization), so the rehydrated
        graph scores bit-identically to the freshly built one for every
        metric — storing the raw halves the blob vs float64 ``self.mat``."""
        import pickle

        return pickle.dumps(
            {
                "mat32": np.ascontiguousarray(raw32, dtype=np.float32).tobytes(),
                "shape": tuple(np.asarray(raw32).shape),
                "metric": self.metric,
                "m": self.m,
                "efc": self.efc,
                "levels": self._levels.tobytes(),
                "adj": self._adj,
                "entry": self.entry,
                "max_layer": self.max_layer,
            },
            protocol=5,
        )

    @classmethod
    def from_state(cls, blob: bytes) -> "NumpyHnsw":
        """Rehydrate a graph serialized by :meth:`to_state` without
        rebuilding (no ``__init__``: adjacency and levels are restored, the
        matrix transform is re-applied deterministically)."""
        import pickle

        st = pickle.loads(blob)
        g = object.__new__(cls)
        g.metric = st["metric"]
        g.m = st["m"]
        g.efc = st["efc"]
        g._lambda = 1.0 / math.log(st["m"])
        mat = np.frombuffer(st["mat32"], dtype=np.float32).reshape(
            st["shape"]
        ).astype(np.float64)
        if g.metric == "cosine":
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = mat / np.where(norms < 1e-6, 1.0, norms)
        g.mat = mat
        g._levels = np.frombuffer(st["levels"], dtype=np.int64)
        g._adj = st["adj"]
        g.entry = st["entry"]
        g.max_layer = st["max_layer"]
        return g


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
    max_shard_rows: int = 100_000,
    num_rows: int | None = None,
) -> DataFrame:
    """Per-partition ANN: each task builds a local HNSW graph over its shard
    and answers every query against it; the global window keeps the best K.

    ``impl='numpy'`` (default) uses :class:`NumpyHnsw` — runs everywhere.
    ``impl='hnswlib'`` uses the C library when installed (faster builds at
    large shard sizes). ``fallback_bruteforce=True`` swaps the local scorer
    for exact numpy (plumbing tests).

    ``max_shard_rows`` bounds the per-partition graph size (VERDICT r2 item
    4): tables larger than one shard are round-robin repartitioned so every
    task builds at most that many rows — shards above
    :attr:`NumpyHnsw.BULK_THRESHOLD` use the vectorized bulk build (budget:
    a 100k x dim-128 shard builds in GEMM-bound seconds; bench entry
    ``hnsw_bulk_build_search_100000v_1shard``).

    ``num_rows``: pass the (possibly approximate) corpus row count when the
    caller already knows it — it only sizes the repartition, and skipping
    the ``count()`` action removes a full table scan from every repeated
    search call over an uncached corpus."""
    if impl == "hnswlib" and not HAVE_HNSWLIB:
        raise NotImplementedError("hnswlib is not installed; use impl='numpy'")
    if max_shard_rows < 1:
        raise ValueError("max_shard_rows must be >= 1")
    n_total = vectors.count() if num_rows is None else num_rows
    if n_total > max_shard_rows:
        target = -(-n_total // max_shard_rows)  # ceil
        vectors = vectors.repartition(target)
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


GRAPH_SHARD_SCHEMA = (
    "n long, dim long, ids array<string>, graph binary"
)


def pack_hnsw_shards(
    vectors: DataFrame,
    metric: str = "l2",
    *,
    id_col: str = "id",
    vector_col: str = "vector",
    m: int = DEFAULT_M,
    ef_construction: int = DEFAULT_EF_CONSTRUCTION,
    seed: int = 42,
    max_shard_rows: int = 100_000,
    num_rows: int | None = None,
) -> DataFrame:
    """Build one :class:`NumpyHnsw` graph per shard and persist it as a row
    (ids + pickled graph state) — the index-as-a-table form.

    This splits :func:`hnsw_partition_search`'s fused build+search into a
    build step whose output is a cacheable DataFrame, so (a) repeated query
    batches amortize the expensive graph construction instead of rebuilding
    per call, and (b) LARGE query batches can meet the graphs in a block
    join (:func:`hnsw_search_packed_distributed`) with no driver collect —
    the same large-batch shape as ``segment_knn_distributed``.

    Sharding matches :func:`hnsw_partition_search` (round-robin repartition
    to ``<= max_shard_rows`` rows per task), so at equal ``seed``/params the
    shard graphs are the same graphs the fused path builds."""
    if max_shard_rows < 1:
        raise ValueError("max_shard_rows must be >= 1")
    n_total = vectors.count() if num_rows is None else num_rows
    if n_total > max_shard_rows:
        target = -(-n_total // max_shard_rows)  # ceil
        vectors = vectors.repartition(target)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_all: list = []
        vecs: list = []
        for pdf in batches:
            ids_all.extend(pdf[id_col].astype(str).tolist())
            vecs.extend(pdf[vector_col].tolist())
        if not ids_all:
            return
        mat = np.asarray(vecs, dtype=np.float32)
        graph = NumpyHnsw(
            mat, metric=metric, m=m, ef_construction=ef_construction, seed=seed
        )
        yield pd.DataFrame(
            {
                "n": [mat.shape[0]],
                "dim": [mat.shape[1]],
                "ids": [ids_all],
                "graph": [graph.to_state(mat)],
            }
        )

    return vectors.select(
        F.col(id_col).cast("string").alias(id_col), F.col(vector_col)
    ).mapInPandas(build, GRAPH_SHARD_SCHEMA)


def hnsw_search_packed_distributed(
    graphs: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str,
    *,
    ef_search: int = DEFAULT_EF_SEARCH,
    query_id_col: str = "query_id",
    query_vector_col: str = "vector",
    rows_per_chunk: int = 4096,
) -> DataFrame:
    """Fully distributed HNSW top-K for LARGE query batches: the query table
    is packed into chunks (``pack_query_segments``) and block-joined against
    the graph-shard table — queries never touch the driver (VERDICT r3
    "What's wrong" #3; contrast :func:`hnsw_partition_search`, which
    collects + broadcasts the query list — the low-latency small-batch
    path).

    Scale shape: the join materializes |shards| x |chunks| pairs; Spark
    broadcasts the small chunk side, so graph shards are scanned in place
    and each pair emits only top-K rows per query. Each task rehydrates a
    shard graph once (memoized per task across its pairs) and answers the
    chunk's queries against it; the global window keeps the best K."""
    kk = max(k, 1)
    from pyrope_spark.operators.segments import pack_query_segments

    qseg = pack_query_segments(
        queries, query_id_col=query_id_col, query_vector_col=query_vector_col,
        rows_per_chunk=rows_per_chunk,
    )
    joined = graphs.crossJoin(qseg)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, NumpyHnsw] = {}
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                key = hash(row.graph)
                graph = cache.get(key)
                if graph is None:
                    cache.clear()  # one live graph per task is plenty
                    graph = cache[key] = NumpyHnsw.from_state(row.graph)
                ids = np.asarray(row.ids, dtype=object)
                qids = np.asarray(row.qids, dtype=object)
                # same float32 round-trip as the collect path's qmat, so the
                # auto switch cannot change results across the threshold
                qmat = np.frombuffer(row.qvecs, dtype=np.float64).reshape(
                    row.qn, row.qdim
                ).astype(np.float32)
                top = min(kk, int(row.n))
                out_q, out_i, out_s = [], [], []
                for j in range(len(qids)):
                    for i, score in graph.search(qmat[j], top, ef_search=ef_search):
                        out_q.append(qids[j])
                        out_i.append(ids[i])
                        out_s.append(score)
                if out_q:
                    yield pd.DataFrame(
                        {"query_id": out_q, "id": out_i, "score": out_s}
                    )

    scored = joined.mapInPandas(scan, RESULT_SCHEMA)
    return topk_per_group(
        scored, ["query_id"], k, score_col="score", tiebreak_col="id", two_phase=False
    )
