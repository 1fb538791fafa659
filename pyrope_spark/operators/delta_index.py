"""Delta (head ∪ tail) index: mutable head + IVF-built tail, merged search.

Reference: ``src/Pyrope.GarnetServer/Vector/DeltaVectorIndex.cs`` —
- writes land in the mutable brute-force HEAD (:29-56);
- search = head.Search ∪ tail.Search, merged by id with head winning, sorted
  desc, take K (:76-122);
- Build() moves head into tail and rebuilds the tail index (:124-158);
- centroids sync to the semantic registry after build
  (``Controllers/IndexController.cs:98-107``).

Spark-first composition (no new physical machinery):
- tail = packed segments partitioned by cluster_id + a centroid table
  (``operators/segments.py`` + MLlib KMeans from ``operators/ivf.py``);
- head = the store's append-only head parquet, searched with the GEMM
  brute-force scan (it is small between compactions by construction);
- the head-wins merge is an anti-join of tail hits against head KEYS —
  any head record (live or tombstone) shadows its tail id, exactly the
  reference dedup rule;
- Build() = ``VectorStore.compact()`` + KMeans + segment pack + centroid
  write, all one batch job; the registry epoch bump invalidates caches (C8).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyrope_spark.operators.ivf import DEFAULT_NPROBE, IvfModel, build_ivf
from pyrope_spark.operators.knn import knn_bruteforce
from pyrope_spark.operators.segments import ivf_search_packed, pack_segments, write_segments
from pyrope_spark.operators.topk import topk_per_group
from pyrope_spark.store.vector_store import KEY_COLS, VectorStore


def _index_dir(store: VectorStore, tenant_id: str, index_name: str) -> str:
    return os.path.join(store.base, "indexes", f"{tenant_id}__{index_name}")


def build_delta_index(
    store: VectorStore,
    tenant_id: str,
    index_name: str,
    *,
    nlist: int = 100,
    metric: str | None = None,
    rows_per_segment: int = 65536,
) -> IvfModel:
    """The reference Build(): compact head into tail, fit the coarse
    quantizer, pack cluster segments, persist centroids, bump epoch."""
    meta = store.registry.get(tenant_id, index_name)
    if metric is None:
        metric = meta.metric if meta else "l2"
    store.compact()
    # r11 opt (guide §2.4): compact() just wrote the latest-wins resolved
    # snapshot as the tail and emptied the head, so the live view here is
    # a plain pruned tail read + tombstone filter; store.live() would
    # re-run the whole snapshot window (a full-table shuffle) only to
    # assign every already-unique key row_number 1
    live = (
        store._read(store.tail_path)
        .filter(
            (F.col("tenant_id") == tenant_id)
            & (F.col("index_name") == index_name)
        )
        .filter(~F.col("deleted"))
    )
    assigned, model = build_ivf(live, nlist=nlist, metric=metric)
    seg = pack_segments(
        assigned, id_col="id", vector_col="vector", cluster_col="cluster_id",
        rows_per_segment=rows_per_segment,
    )
    d = _index_dir(store, tenant_id, index_name)
    write_segments(seg, os.path.join(d, "segments"))
    _write_centroids(os.path.join(d, "centroids"), model.centroids)
    if meta is not None:
        meta.algo = "ivf_flat"
        meta.params = {"nlist": model.nlist, "rows_per_segment": rows_per_segment}
        store.registry.bump_epoch(tenant_id, index_name)
    return model


def _write_centroids(path: str, centroids) -> None:
    """The centroid table is nlist-sized (hundreds of rows) — write it
    driver-side with pyarrow instead of paying a Spark job for a 100-row
    parquet (r11, guide §1.2: the lifecycle pays this once per build and
    once per load; same file format, same schema, same reader)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    tbl = pa.table(
        {
            "cluster_id": pa.array(range(len(centroids)), pa.int32()),
            "centroid": pa.array(
                [[float(x) for x in c] for c in centroids],
                pa.list_(pa.float64()),
            ),
        }
    )
    pq.write_table(tbl, os.path.join(path, "part-00000.parquet"))


def _read_centroids(store: VectorStore, path: str):
    """Driver-side pyarrow read of the nlist-sized centroid table; falls
    back to a Spark read for non-local storage."""
    try:
        import pyarrow.parquet as pq

        tbl = pq.read_table(path).to_pydict()
        order = sorted(
            range(len(tbl["cluster_id"])), key=lambda i: tbl["cluster_id"][i]
        )
        return [tbl["centroid"][i] for i in order]
    except (OSError, ImportError):
        rows = (
            store.spark.read.parquet(path).orderBy("cluster_id").collect()
        )
        return [r["centroid"] for r in rows]


def load_delta_index(store: VectorStore, tenant_id: str, index_name: str) -> tuple[DataFrame, IvfModel]:
    """Reload (segments, model) — the Snapshot/Load analog (S8): everything
    is already durable parquet, so 'load' is just reads."""
    d = _index_dir(store, tenant_id, index_name)
    seg = store.spark.read.parquet(os.path.join(d, "segments"))
    cent = _read_centroids(store, os.path.join(d, "centroids"))
    meta = store.registry.get(tenant_id, index_name)
    metric = meta.metric if meta else "l2"
    model = IvfModel(
        centroids=np.asarray(cent, dtype=np.float64),
        metric=metric,
        nlist=len(cent),
    )
    return seg, model


DEFAULT_MAX_HEAD_KEYS = 100_000  # ~ a few MB broadcast; beyond this the head
# is overdue for compaction anyway


def delta_search(
    store: VectorStore,
    tenant_id: str,
    index_name: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = DEFAULT_NPROBE,
    *,
    max_head_keys: int = DEFAULT_MAX_HEAD_KEYS,
    auto_build_nlist: int | None = None,
) -> DataFrame:
    """Head ∪ tail search with head-wins dedup (DeltaVectorIndex.cs:76-122).

    Head (post-build writes) is scanned brute-force; tail via packed IVF.
    Any head key shadows its tail id — including tombstones, so deletes
    issued after a build correctly hide built rows.

    The head-shadow set is collected once (ONE pre-search action) and masked
    inside the tail scan kernel, so the tail fetch is exactly ``k`` per query
    regardless of head size — no ``k + |head|`` over-fetch. A head larger
    than ``max_head_keys`` means compaction is overdue: with
    ``auto_build_nlist`` set the index is rebuilt first (the reference's
    Build-on-threshold policy); otherwise the search falls back to the
    anti-join + bounded over-fetch shape and still returns exact results.
    """
    seg, model = load_delta_index(store, tenant_id, index_name)

    head_all = (
        store._read(store.head_path)
        .filter((F.col("tenant_id") == tenant_id) & (F.col("index_name") == index_name))
    )
    # resolve latest within head (an id can be upserted then deleted)
    from pyspark.sql import Window

    w = Window.partitionBy(*KEY_COLS).orderBy(F.desc("_seq"))
    head_resolved = (
        head_all.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    )
    head_rows = head_resolved.select("id", "deleted").limit(max_head_keys + 1).collect()

    if len(head_rows) > max_head_keys:
        if auto_build_nlist is not None:
            build_delta_index(store, tenant_id, index_name, nlist=auto_build_nlist)
            seg, model = load_delta_index(store, tenant_id, index_name)
            return delta_search(
                store, tenant_id, index_name, queries, k, nprobe,
                max_head_keys=max_head_keys,
            )
        # oversized head without auto-build: exact fallback (anti-join with
        # |head| over-fetch — the pre-round-2 shape)
        head_keys = head_resolved.select("id")
        n_head = head_keys.count()
        tail_hits = (
            ivf_search_packed(seg, model, queries, k=k + n_head, nprobe=nprobe)
            .drop("rank")
            .join(head_keys, "id", "left_anti")
        )
        head_live = head_resolved.filter(~F.col("deleted"))
        head_hits = knn_bruteforce(
            head_live, queries, k=k, metric=model.metric, impl="gemm"
        ).drop("rank")
        merged = tail_hits.unionByName(head_hits)
        return topk_per_group(
            merged, ["query_id"], k, score_col="score", tiebreak_col="id", two_phase=False
        )

    shadow = frozenset(r["id"] for r in head_rows)
    has_live = any(not r["deleted"] for r in head_rows)
    tail_hits = ivf_search_packed(
        seg, model, queries, k=k, nprobe=nprobe, exclude_ids=shadow or None
    ).drop("rank")

    if has_live:
        head_live = head_resolved.filter(~F.col("deleted"))
        head_hits = knn_bruteforce(
            head_live, queries, k=k, metric=model.metric, impl="gemm"
        ).drop("rank")
        merged = tail_hits.unionByName(head_hits)
    else:
        merged = tail_hits
    return topk_per_group(
        merged, ["query_id"], k, score_col="score", tiebreak_col="id", two_phase=False
    )
