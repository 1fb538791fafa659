"""Product quantization: train / encode / decode / ADC search, and IVF-PQ.

Reference:
- PQ train = per-subspace k-means (dim divisible by M, K<=256, L2,
  maxIter 10, seed 42+m), encode = nearest subspace centroid byte, decode =
  concat centroids (``src/Pyrope.GarnetServer/Vector/ProductQuantizer.cs:16-96``).
- ADC search = per-(query, probed cluster) distance table [M][K], score =
  -sum(table[m][code[m]]) (``ProductQuantizer.cs:98-120``,
  ``Vector/IvfPqVectorIndex.cs:118-212``).
- IVF-PQ build = coarse k-means (seed 123) -> residuals -> PQ on residuals ->
  encode (``IvfPqVectorIndex.cs:55-116``).

Spark-first:
- Training fits M MLlib KMeans models over ``slice``-ed subvectors — each fit
  is a distributed job; M is small (4..16), so the loop is driver-side control
  flow only.
- Encoding and ADC scoring are Arrow-batched numpy (``mapInPandas``): codes
  via one argmin over a broadcast (M, K, dsub) codebook; ADC via fancy-indexed
  table lookups. Both emit per-batch partial top-K, so the shuffle carries
  K * partitions rows per query — the same scale shape as the GEMM scan.
- Codes are ``ARRAY<INT>`` (0..255) in Parquet; 128-dim float32 (512 B)
  compresses to M=8 bytes + cluster id, a 64x scan reduction at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyrope_spark.operators.knn import RESULT_SCHEMA
from pyrope_spark.operators.topk import topk_per_group

PQ_SEED = 42  # reference: ProductQuantizer.cs per-subspace seed 42+m
IVFPQ_COARSE_SEED = 123  # reference: IvfPqVectorIndex.cs:55-116
DEFAULT_MAX_ITER = 10


@dataclass
class PqModel:
    codebooks: np.ndarray  # M x K x dsub, float64
    m: int
    k: int
    dsub: int

    @property
    def dim(self) -> int:
        return self.m * self.dsub


def _lloyd_fit(x: np.ndarray, k: int, seed: int, iters: int) -> np.ndarray:
    """Seeded random-init Lloyd iterations, vectorized. Random init is the
    REFERENCE's own choice (KMeansUtils.cs:18-20: "K-Means++ is preferred,
    but random is OK for MVP"). Assignment is a row-chunked float32 GEMM
    (bounded memory under any n), updates are per-dim bincounts (np.add.at
    is unbuffered and ~10x slower). Deterministic for a given
    (x, k, seed, iters); empty clusters keep their previous center."""
    x32 = np.ascontiguousarray(x, dtype=np.float32)
    n, d = x32.shape
    rng = np.random.default_rng(seed)
    centers = x32[rng.choice(n, size=min(k, n), replace=False)].copy()
    assign = np.empty(n, dtype=np.int64)
    CH = 16384
    for _ in range(iters):
        # argmin_c |x-c|^2 == argmin_c (|c|^2 - 2 x.c): the |x|^2 term is
        # row-constant. np.dot with a CONTIGUOUS transposed operand — the
        # `x @ centers.T` form hits a 20x slower non-contiguous BLAS path
        # on this OpenBLAS build (measured, PLANS.md r4).
        cT = np.ascontiguousarray(centers.T)
        c2 = np.einsum("ij,ij->i", centers, centers)
        for i0 in range(0, n, CH):
            i1 = min(i0 + CH, n)
            dch = np.dot(x32[i0:i1], cT)
            dch *= -2.0
            dch += c2[None, :]
            assign[i0:i1] = dch.argmin(axis=1)
        counts = np.bincount(assign, minlength=k)
        sums = np.empty((k, d), dtype=np.float64)
        for t in range(d):
            sums[:, t] = np.bincount(assign, weights=x32[:, t], minlength=k)
        live = counts > 0
        upd = centers.astype(np.float64)
        upd[live] = sums[live] / counts[live, None]
        centers = upd.astype(np.float32)
    return centers.astype(np.float64)


def train_pq(
    vectors: DataFrame,
    m: int,
    k: int = 256,
    *,
    vector_col: str = "vector",
    seed: int = PQ_SEED,
    max_iter: int = DEFAULT_MAX_ITER,
    fit_fraction: float | None = None,
    impl: str = "numpy",
) -> PqModel:
    """Per-subspace KMeans (reference ProductQuantizer.cs:16-58: dim % M == 0,
    K <= 256, seed 42+m).

    Codebook training follows the faiss convention: when ``fit_fraction``
    is not given and the table exceeds ``max(10k, 256*k)`` rows, each
    subspace fits on that seeded sample (codebook quality saturates well
    below it). Encoding always covers every row.

    ``impl='numpy'`` (default) collects the BOUNDED sample once and fits all
    M codebooks driver-side with seeded k-means++/Lloyd — the faiss recipe:
    the training set is capped by construction (<= max(10k, 256k) rows x
    dim floats, tens of MB), so M distributed MLlib jobs over it are pure
    scheduling overhead. Measured at 100k x d128 M=8: the 8 sequential
    MLlib fits were ~25-30 s of the 35-45 s IVF-PQ build; the numpy fit is
    GEMM-bound seconds (PLANS.md r4). ``impl='mllib'`` keeps the
    distributed fits (the path to use if the cap is ever lifted)."""
    if k > 256:
        raise ValueError("PQ K must be <= 256 (codes are bytes)")
    dim = len(vectors.select(vector_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by M={m}")
    dsub = dim // m
    n = vectors.count()
    kk = min(k, n)
    fit_src = vectors
    if fit_fraction is not None and 0.0 < fit_fraction < 1.0:
        fit_src = vectors.sample(fraction=fit_fraction, seed=seed)
    elif fit_fraction is None:
        cap = max(10_000, 256 * kk)
        if n > cap:
            fit_src = vectors.sample(fraction=cap / n, seed=seed)
    books = []
    if impl == "numpy":
        pdf = fit_src.select(F.col(vector_col).alias("_v")).toPandas()
        mat = np.asarray(pdf["_v"].tolist(), dtype=np.float32)
        return train_pq_np(mat, m, kk, seed=seed, max_iter=max_iter)
    cached = fit_src.select(vector_col).cache()
    try:
        for sub in range(m):
            sl = cached.select(
                array_to_vector(
                    F.slice(F.col(vector_col), sub * dsub + 1, dsub)
                ).alias("_features")
            )
            km = KMeans(
                k=kk,
                maxIter=max_iter,
                seed=seed + sub,
                featuresCol="_features",
                distanceMeasure="euclidean",
            )
            model = km.fit(sl)
            centers = np.asarray(model.clusterCenters(), dtype=np.float64)
            if len(centers) < kk:  # degenerate duplicate centers
                centers = np.vstack([centers] + [centers[-1:]] * (kk - len(centers)))
            books.append(centers)
    finally:
        cached.unpersist()
    return PqModel(codebooks=np.stack(books), m=m, k=kk, dsub=dsub)


def train_pq_np(
    mat: np.ndarray,
    m: int,
    k: int = 256,
    *,
    seed: int = PQ_SEED,
    max_iter: int = DEFAULT_MAX_ITER,
) -> PqModel:
    """Fit all M subspace codebooks from an in-memory (bounded) training
    matrix. Subspaces fit concurrently: BLAS releases the GIL and each
    worker process pins BLAS to 1 thread, so M fits use M cores."""
    from concurrent.futures import ThreadPoolExecutor

    n, dim = mat.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by M={m}")
    dsub = dim // m
    kk = min(k, n)
    with ThreadPoolExecutor(max_workers=min(m, 8)) as ex:
        books = list(
            ex.map(
                lambda sub: _lloyd_fit(
                    mat[:, sub * dsub : (sub + 1) * dsub], kk,
                    seed=seed + sub, iters=max_iter,
                ),
                range(m),
            )
        )
    return PqModel(codebooks=np.stack(books), m=m, k=kk, dsub=dsub)


def _codes_schema(id_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("pq_codes", T.ArrayType(T.IntegerType())),
        ]
    )


def pq_encode(
    vectors: DataFrame,
    model: PqModel,
    *,
    id_col: str = "id",
    vector_col: str = "vector",
    extra_cols: list[str] | None = None,
    centroids: np.ndarray | None = None,
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Vector -> M byte codes (reference ProductQuantizer.cs:60-80), one
    argmin per subspace over the broadcast codebook, Arrow-batched.

    ``centroids``: when given, the kernel encodes RESIDUALS — it subtracts
    ``centroids[row[cluster_col]]`` inside the Arrow batch (float64
    subtract, float32 round-trip — the same arithmetic as the column-level
    ``zip_with`` + ``cast('array<float>')`` it replaces, which was an
    interpreted per-element HOF over the whole corpus)."""
    spark = vectors.sparkSession
    bcb = spark.sparkContext.broadcast(model.codebooks)
    bcent = (
        spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))
        if centroids is not None
        else None
    )
    m, dsub = model.m, model.dsub
    extra = extra_cols or []
    if centroids is not None and cluster_col not in extra:
        extra = [cluster_col, *extra]

    out_schema = T.StructType(
        [f for f in vectors.schema.fields if f.name in [id_col, *extra]]
        + [T.StructField("pq_codes", T.ArrayType(T.IntegerType()))]
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cb = bcb.value  # M x K x dsub
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vmat = np.vstack(pdf[vector_col].to_numpy()).astype(np.float64)
            if bcent is not None:
                cid = pdf[cluster_col].to_numpy().astype(np.int64)
                vmat = (
                    (vmat - bcent.value[cid])
                    .astype(np.float32)
                    .astype(np.float64)
                )
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for sub in range(m):
                x = vmat[:, sub * dsub : (sub + 1) * dsub]  # B x dsub
                # ||x - c||^2 = |x|^2 - 2 x.c + |c|^2 ; argmin over K
                d = (
                    -2.0 * (x @ cb[sub].T)
                    + np.einsum("ij,ij->i", cb[sub], cb[sub])[None, :]
                )
                codes[:, sub] = np.argmin(d, axis=1)
            out = pdf[[id_col, *extra]].copy()
            out["pq_codes"] = list(codes)
            yield out

    return vectors.select(id_col, *extra, vector_col).mapInPandas(enc, out_schema)


def pq_decode_np(model: PqModel, codes: np.ndarray) -> np.ndarray:
    """codes (N x M) -> reconstructed vectors (N x dim)
    (reference ProductQuantizer.cs:82-96)."""
    parts = [model.codebooks[sub][codes[:, sub]] for sub in range(model.m)]
    return np.concatenate(parts, axis=1)


def pq_adc_search(
    encoded: DataFrame,
    model: PqModel,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "id",
    query_id_col: str = "query_id",
    query_vector_col: str = "vector",
) -> DataFrame:
    """Asymmetric-distance top-K over PQ codes (reference
    ProductQuantizer.cs:98-120: table[m][k] = ||q_sub - c||²; score =
    -Σ table[m][code[m]]). Tables are built once per query driver-side
    (Q x M x K doubles — tiny), broadcast, and applied with numpy
    fancy-indexing per Arrow batch with per-batch partial top-K."""
    spark = encoded.sparkSession
    qrows = queries.select(query_id_col, query_vector_col).collect()
    qids = [r[0] for r in qrows]
    qmat = np.asarray([r[1] for r in qrows], dtype=np.float64)
    m, dsub, kk = model.m, model.dsub, model.k
    tables = np.empty((len(qids), m, kk), dtype=np.float64)
    for sub in range(m):
        qs = qmat[:, sub * dsub : (sub + 1) * dsub]  # Q x dsub
        c = model.codebooks[sub]  # K x dsub
        d = (
            np.einsum("ij,ij->i", qs, qs)[:, None]
            - 2.0 * (qs @ c.T)
            + np.einsum("ij,ij->i", c, c)[None, :]
        )
        tables[:, sub, :] = d
    bt = spark.sparkContext.broadcast((qids, tables))
    topn = max(k, 1)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_b, tables_b = bt.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.vstack(pdf["pq_codes"].to_numpy()).astype(np.int64)  # B x M
            ids = pdf[id_col].astype(str).to_numpy()
            # dist[b, q] = sum_m tables[q, m, codes[b, m]]
            B = codes.shape[0]
            dist = np.zeros((B, len(qids_b)), dtype=np.float64)
            for sub in range(codes.shape[1]):
                dist += tables_b[:, sub, :][:, codes[:, sub]].T  # B x Q
            scores = -dist
            top = min(topn, B)
            idx = np.argpartition(-scores, top - 1, axis=0)[:top, :]
            out_q, out_i, out_s = [], [], []
            for j in range(len(qids_b)):
                rows = idx[:, j]
                out_q.extend([qids_b[j]] * len(rows))
                out_i.extend(ids[rows])
                out_s.extend(scores[rows, j])
            yield pd.DataFrame({"query_id": out_q, "id": out_i, "score": out_s})

    cand = encoded.select(F.col(id_col).cast("string").alias(id_col), "pq_codes")
    scored = cand.mapInPandas(scan, RESULT_SCHEMA)
    return topk_per_group(scored, ["query_id"], k, score_col="score", tiebreak_col="id", two_phase=False)


# ----------------------------------------------------------------- IVF-PQ


@dataclass
class IvfPqModel:
    ivf: "object"  # IvfModel
    pq: PqModel


def build_ivf_pq(
    vectors: DataFrame,
    nlist: int,
    m: int,
    k: int = 256,
    *,
    id_col: str = "id",
    vector_col: str = "vector",
    coarse_seed: int = IVFPQ_COARSE_SEED,
) -> tuple[DataFrame, IvfPqModel]:
    """Coarse KMeans -> residuals -> PQ on residuals -> encode
    (reference IvfPqVectorIndex.cs:55-116). Returns
    (id, cluster_id, pq_codes) and the combined model."""
    from pyrope_spark.operators.ivf import build_ivf

    assigned, ivf_model = build_ivf(
        vectors, nlist, metric="l2", vector_col=vector_col, seed=coarse_seed
    )
    cents = np.asarray(ivf_model.centroids, dtype=np.float64)
    # train on a bounded seeded sample with residuals computed driver-side,
    # encode with residuals computed inside the Arrow kernel — the previous
    # shape ran an interpreted per-element zip_with HOF over the corpus
    # twice (train sample + full encode); measured as a large share of the
    # build at 100k x d128 (PLANS.md r4)
    n = assigned.count()
    kk = min(k, n)
    cap = max(10_000, 256 * kk)
    fit_src = assigned
    if n > cap:
        fit_src = assigned.sample(fraction=cap / n, seed=PQ_SEED)
    pdf = fit_src.select(
        F.col("cluster_id").alias("_c"), F.col(vector_col).alias("_v")
    ).toPandas()
    sample = np.asarray(pdf["_v"].tolist(), dtype=np.float64)
    resid_sample = (
        (sample - cents[pdf["_c"].to_numpy().astype(np.int64)])
        .astype(np.float32)
    )
    pq_model = train_pq_np(resid_sample, m=m, k=k, seed=PQ_SEED)
    encoded = pq_encode(
        assigned, pq_model, id_col=id_col, vector_col=vector_col,
        centroids=cents, cluster_col="cluster_id",
    )
    return encoded, IvfPqModel(ivf=ivf_model, pq=pq_model)


def ivf_pq_search(
    encoded: DataFrame,
    model: IvfPqModel,
    queries: DataFrame,
    k: int,
    nprobe: int = 3,
    *,
    id_col: str = "id",
    query_id_col: str = "query_id",
    query_vector_col: str = "vector",
) -> DataFrame:
    """Probe coarse clusters, ADC-score residual queries per probed cluster
    (reference IvfPqVectorIndex.cs:118-212). The residual query differs per
    (query, cluster), so tables are built per probe pair — still tiny
    (Q * nprobe * M * K doubles) and broadcast."""
    from pyrope_spark.operators.ivf import select_probes

    spark = encoded.sparkSession
    qrows = [
        (r[query_id_col], list(r[query_vector_col]))
        for r in queries.select(query_id_col, query_vector_col).collect()
    ]
    probe_pairs = select_probes(model.ivf, qrows, nprobe)
    qvec = {qid: np.asarray(v, dtype=np.float64) for qid, v in qrows}
    m, dsub, kk = model.pq.m, model.pq.dsub, model.pq.k
    # per (query, cluster) residual ADC table
    keys = []
    tabs = []
    for qid, c in probe_pairs:
        rq = qvec[qid] - model.ivf.centroids[c]
        t = np.empty((m, kk), dtype=np.float64)
        for sub in range(m):
            qs = rq[sub * dsub : (sub + 1) * dsub]
            cb = model.pq.codebooks[sub]
            t[sub] = qs @ qs - 2.0 * (cb @ qs) + np.einsum("ij,ij->i", cb, cb)
        keys.append((qid, c))
        tabs.append(t)
    bt = spark.sparkContext.broadcast((keys, np.stack(tabs) if tabs else np.zeros((0, m, kk))))

    probed = sorted({c for _, c in probe_pairs})
    cand = encoded.filter(F.col("cluster_id").isin(probed))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys_b, tabs_b = bt.value
        by_cluster: dict[int, list[int]] = {}
        for i, (_, c) in enumerate(keys_b):
            by_cluster.setdefault(c, []).append(i)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_q, out_i, out_s = [], [], []
            for c, grp in pdf.groupby("cluster_id"):
                idxs = by_cluster.get(int(c))
                if not idxs:
                    continue
                codes = np.vstack(grp["pq_codes"].to_numpy()).astype(np.int64)
                ids = grp[id_col].astype(str).to_numpy()
                for ti in idxs:
                    qid = keys_b[ti][0]
                    t = tabs_b[ti]  # M x K
                    dist = t[np.arange(codes.shape[1])[None, :], codes].sum(axis=1)
                    scores = -dist
                    top = min(max(k, 1), len(scores))
                    sel = np.argpartition(-scores, top - 1)[:top]
                    out_q.extend([qid] * len(sel))
                    out_i.extend(ids[sel])
                    out_s.extend(scores[sel])
            if out_q:
                yield pd.DataFrame({"query_id": out_q, "id": out_i, "score": out_s})

    scored = cand.select(
        F.col(id_col).cast("string").alias(id_col), "cluster_id", "pq_codes"
    ).mapInPandas(scan, RESULT_SCHEMA)
    return topk_per_group(scored, ["query_id"], k, score_col="score", tiebreak_col="id", two_phase=False)


# --------------------------------------------------------------------------
# OPQ-lite: PCA rotation with eigenvalue-balanced subspace allocation
# (Ge et al. 2013 "Optimized Product Quantization", the non-parametric
# init faiss ships as OPQMatrix's PCA start). No reference analog — the
# reference's PQ trains on raw axes (ProductQuantizer.cs); a rotation
# applied before encoding is a pure pre-processing step that leaves the
# ADC search machinery untouched.
# --------------------------------------------------------------------------

def train_opq_rotation(
    vectors: DataFrame,
    m: int,
    *,
    vector_col: str = "vector",
    seed: int = PQ_SEED,
    fit_cap: int = 65536,
) -> np.ndarray:
    """(dim x dim) orthonormal rotation: PCA basis with principal
    directions allocated to the M subspaces so the PRODUCT of per-subspace
    variances balances (greedy: visit eigendirections by decreasing
    eigenvalue, place each into the non-full subspace with the smallest
    log-variance sum). Correlated/anisotropic inputs are the case where
    plain PQ's axis-aligned subspaces waste codebook capacity; rotating
    first decorrelates and spreads the energy.

    Driver-side eigendecomposition on a bounded seeded sample (the same
    faiss-convention cap as codebook training): covariance is dim x dim,
    tiny at any corpus size. Apply with :func:`rotate_vectors` to BOTH the
    corpus (before ``build_ivf_pq``) and every query batch.
    """
    n = vectors.count()
    src = vectors
    if n > fit_cap:
        src = vectors.sample(fraction=fit_cap / n, seed=seed)
    x = np.vstack([
        np.asarray(r[vector_col], dtype=np.float64) for r in src.collect()
    ])
    dim = x.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by M={m}")
    dsub = dim // m
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / max(len(x) - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    # greedy balanced allocation by log-eigenvalue sum
    buckets: list[list[int]] = [[] for _ in range(m)]
    sums = np.zeros(m)
    for i in range(dim):
        open_b = [b for b in range(m) if len(buckets[b]) < dsub]
        b = min(open_b, key=lambda j: sums[j])
        buckets[b].append(i)
        sums[b] += np.log(max(evals[i], 1e-12))
    perm = [i for b in buckets for i in b]
    # rows of R are the (permuted) principal directions: y = R @ x
    return evecs[:, perm].T.copy()


def rotate_vectors(
    df: DataFrame,
    rotation: np.ndarray,
    *,
    vector_col: str = "vector",
) -> DataFrame:
    """Apply ``y = R x`` to a vector column — one mapInPandas GEMM pass
    against the broadcast rotation matrix; all other columns pass through.
    Orthonormal R preserves L2 distances and inner products up to float
    round-off, so ADC search over rotated codes needs no other change."""
    from collections.abc import Iterator

    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(rotation, dtype=np.float64))
    cols = df.columns

    def rot(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        r = bc.value
        for b in batches:
            if not len(b):
                continue
            x = np.vstack(b[vector_col].to_numpy()).astype(np.float64)
            y = x @ r.T
            out = b.copy()
            out[vector_col] = list(y.astype(np.float32))
            yield out

    return df.mapInPandas(rot, schema=df.schema).select(*cols)


def build_ivf_pq_opq(
    vectors: DataFrame,
    nlist: int,
    m: int,
    *,
    id_col: str = "id",
    vector_col: str = "vector",
    **kwargs,
):
    """``build_ivf_pq`` over the OPQ-rotated corpus. Returns
    (encoded, model, rotation); search queries must pass through
    :func:`rotate_vectors` with the same rotation
    (:func:`ivf_pq_search_opq` does exactly that)."""
    rot = train_opq_rotation(vectors, m, vector_col=vector_col)
    rotated = rotate_vectors(vectors, rot, vector_col=vector_col)
    encoded, model = build_ivf_pq(
        rotated, nlist=nlist, m=m, id_col=id_col, vector_col=vector_col,
        **kwargs,
    )
    return encoded, model, rot


def ivf_pq_search_opq(
    encoded: DataFrame,
    model: IvfPqModel,
    rotation: np.ndarray,
    queries: DataFrame,
    k: int,
    *,
    nprobe: int = 3,
    id_col: str = "id",
    query_id_col: str = "query_id",
    query_vector_col: str = "vector",
) -> DataFrame:
    q = rotate_vectors(queries, rotation, vector_col=query_vector_col)
    return ivf_pq_search(
        encoded, model, q, k, nprobe=nprobe, id_col=id_col,
        query_id_col=query_id_col, query_vector_col=query_vector_col,
    )
