from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyrope_spark.operators.ivf import build_ivf, ivf_recall, ivf_search
from pyrope_spark.operators.knn import knn_bruteforce
from pyrope_spark.operators.segments import (
    ivf_search_packed,
    knn_bruteforce_packed,
    pack_segments,
    write_segments,
)
from tests.conftest import make_queries_df, make_vectors_df

DIM = 16


@pytest.fixture(scope="module")
def data(spark):
    vectors = make_vectors_df(spark, n=500, dim=DIM, del_frac=0.0).cache()
    queries = make_queries_df(spark, n=10, dim=DIM, k=10).cache()
    return vectors, queries


def test_pack_preserves_rows(data):
    vectors, _ = data
    seg = pack_segments(vectors, rows_per_segment=128)
    stats = seg.agg(F.sum("n").alias("n"), F.count("*").alias("segs")).collect()[0]
    assert stats["n"] == 500
    assert stats["segs"] >= 4  # 500/128 -> at least 4 segments somewhere
    row = seg.first()
    assert len(row["vecs"]) == row["n"] * row["dim"] * 4


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_packed_bruteforce_matches_unpacked(data, metric):
    vectors, queries = data
    seg = pack_segments(vectors, rows_per_segment=128).cache()
    packed = knn_bruteforce_packed(seg, queries, k=10, metric=metric)
    exact = knn_bruteforce(vectors, queries, k=10, metric=metric)
    got = {(r["query_id"], r["rank"]): r["id"] for r in packed.collect()}
    exp = {(r["query_id"], r["rank"]): r["id"] for r in exact.collect()}
    assert got == exp


def test_sq8_segments_recall(data, spark):
    """SQ8-quantized scan must recover nearly all exact top-10 (quantization
    error only — reference trades this for the 1.54x scan speedup)."""
    import numpy as np

    from pyrope_spark.operators.segments import pack_segments_sq8, segment_knn_sq8

    vectors, queries = data
    seg = pack_segments_sq8(vectors, rows_per_segment=128).cache()
    row = seg.first()
    assert len(row["codes"]) == row["n"] * row["dim"]          # 1 byte/elem
    assert len(row["mins"]) == row["n"] * 4
    qrows = [
        (r["query_id"], np.asarray(r["vector"]))
        for r in queries.select("query_id", "vector").collect()
    ]
    approx = segment_knn_sq8(seg, qrows, 10, "l2")
    from pyrope_spark.operators.ivf import ivf_recall

    exact = knn_bruteforce(vectors, queries, k=10, metric="l2")
    assert ivf_recall(approx, exact, 10) >= 0.9


def test_packed_pq_matches_unpacked(data, spark):
    """IVF-PQ ADC over packed uint8 code segments must equal the row-wise
    ADC search exactly (same tables, same codes)."""
    from pyrope_spark.operators.pq import build_ivf_pq, ivf_pq_search
    from pyrope_spark.operators.segments import ivf_pq_search_packed, pack_pq_segments

    vectors, queries = data
    encoded, model = build_ivf_pq(vectors, nlist=8, m=4, k=64)
    encoded = encoded.cache()
    seg = pack_pq_segments(encoded, rows_per_segment=128).cache()
    row = seg.first()
    assert len(row["codes"]) == row["n"] * row["m"]
    packed = ivf_pq_search_packed(seg, model, queries, k=10, nprobe=8)
    unpacked = ivf_pq_search(encoded, model, queries, k=10, nprobe=8)
    got = {(r["query_id"], r["rank"]): r["id"] for r in packed.collect()}
    exp = {(r["query_id"], r["rank"]): r["id"] for r in unpacked.collect()}
    assert got == exp


def test_packed_ivf_matches_unpacked(data, spark, tmp_path):
    vectors, queries = data
    assigned, model = build_ivf(vectors, nlist=8, metric="l2")
    seg = pack_segments(assigned, cluster_col="cluster_id", rows_per_segment=256)
    path = str(tmp_path / "segments")
    write_segments(seg, path)
    seg_r = spark.read.parquet(path)
    packed = ivf_search_packed(seg_r, model, queries, k=10, nprobe=3)
    unpacked = ivf_search(assigned, model, queries, k=10, nprobe=3, impl="gemm")
    got = {(r["query_id"], r["rank"]): r["id"] for r in packed.collect()}
    exp = {(r["query_id"], r["rank"]): r["id"] for r in unpacked.collect()}
    assert got == exp
    # and the packed path stays exact at full probe
    full = ivf_search_packed(seg_r, model, queries, k=10, nprobe=8)
    exact = knn_bruteforce(vectors, queries, k=10, metric="l2")
    assert ivf_recall(full, exact, 10) == 1.0


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_single_job_ivf_matches_shuffle_path(data, spark, metric):
    """The low-latency path (partial top-K in the scan, driver merge) must
    return exactly the shuffle path's results — and in exactly ONE Spark job
    (no query-collect job, no shuffle stage beyond the narrow scan)."""
    import numpy as np

    from pyrope_spark.operators.segments import ivf_search_packed_single_job

    vectors, queries = data
    assigned, model = build_ivf(vectors, nlist=8, metric=metric)
    seg = pack_segments(assigned, cluster_col="cluster_id", rows_per_segment=256).cache()
    seg.count()
    qnp = [
        (r["query_id"], np.asarray(r["vector"]))
        for r in queries.select("query_id", "vector").collect()
    ]
    sc = spark.sparkContext
    group = f"single_job_ivf_{metric}"
    sc.setJobGroup(group, "single-job ivf search")
    got_pdf = ivf_search_packed_single_job(seg, model, qnp, k=10, nprobe=3)
    sc.setJobGroup("", "")
    job_ids = sc.statusTracker().getJobIdsForGroup(group)
    assert len(job_ids) == 1, f"expected 1 Spark job, saw {len(job_ids)}"

    exp = ivf_search_packed(seg, model, queries, k=10, nprobe=3)
    got = {(r.query_id, r.rank): r.id for r in got_pdf.itertuples(index=False)}
    expd = {(r["query_id"], r["rank"]): r["id"] for r in exp.collect()}
    assert got == expd


def test_sq8_byte_domain_recall(data, spark):
    """Byte-domain scoring (reference K5/K6 kernels: query quantized by its
    own range, integer L2 on raw codes, no rescale) — coarser than dequant
    but must still recover most of the exact top-10."""
    import numpy as np

    from pyrope_spark.operators.ivf import ivf_recall
    from pyrope_spark.operators.segments import pack_segments_sq8, segment_knn_sq8

    vectors, queries = data
    seg = pack_segments_sq8(vectors, rows_per_segment=128).cache()
    qrows = [
        (r["query_id"], np.asarray(r["vector"]))
        for r in queries.select("query_id", "vector").collect()
    ]
    byte = segment_knn_sq8(seg, qrows, 10, "l2", scoring="byte")
    exact = knn_bruteforce(vectors, queries, k=10, metric="l2")
    r = ivf_recall(byte, exact, 10)
    assert r >= 0.6, r
    # dequant scoring should be at least as good
    deq = segment_knn_sq8(seg, qrows, 10, "l2")
    assert ivf_recall(deq, exact, 10) >= r - 1e-9


def test_tie_heavy_corpus_paths_agree(spark):
    """Duplicate vectors produce exact score ties at every top-K boundary;
    the deterministic (score desc, id asc) cut must make the single-job,
    shuffle, and distributed block-join paths retain identical ids."""
    import numpy as np

    from pyrope_spark.operators.segments import (
        ivf_search_packed_single_job,
        knn_bruteforce_packed,
        segment_knn_distributed,
    )

    # 120 rows but only 6 distinct vectors -> 20-way ties everywhere
    base = np.random.default_rng(5).random((6, 8)).astype(np.float32)
    rows = [
        (f"v{i:03d}", [float(x) for x in base[i % 6]]) for i in range(120)
    ]
    vectors = spark.createDataFrame(rows, "id string, vector array<float>")
    queries = make_queries_df(spark, n=5, dim=8, seed=77).select("query_id", "vector")
    seg = pack_segments(vectors, rows_per_segment=16).cache()
    seg.count()

    shuffle = {
        (r["query_id"], r["rank"]): r["id"]
        for r in knn_bruteforce_packed(seg, queries, k=10, metric="l2").collect()
    }
    dist = {
        (r["query_id"], r["rank"]): r["id"]
        for r in segment_knn_distributed(
            seg, queries, 10, "l2", rows_per_chunk=2
        ).collect()
    }
    assert shuffle == dist

    assigned, model = build_ivf(vectors, nlist=4, metric="l2")
    iseg = pack_segments(assigned, cluster_col="cluster_id", rows_per_segment=16).cache()
    iseg.count()
    qnp = [
        (r["query_id"], np.asarray(r["vector"]))
        for r in queries.select("query_id", "vector").collect()
    ]
    single = {
        (r.query_id, r.rank): r.id
        for r in ivf_search_packed_single_job(
            iseg, model, qnp, k=10, nprobe=4
        ).itertuples(index=False)
    }
    ivf_shuffle = {
        (r["query_id"], r["rank"]): r["id"]
        for r in ivf_search_packed(iseg, model, queries, k=10, nprobe=4).collect()
    }
    assert single == ivf_shuffle


# ---------------------------------------------------------------- OPQ

def test_opq_rotation_orthonormal_and_distance_preserving(spark):
    import numpy as np

    from pyrope_spark.operators.pq import rotate_vectors, train_opq_rotation

    r = np.random.default_rng(5)
    x = (r.standard_normal((200, 16)) * (1.5 ** -np.arange(16))[None, :]).astype(
        np.float32
    )
    vecs = spark.createDataFrame(
        [(f"v{i}", [float(v) for v in x[i]]) for i in range(200)],
        "id string, vector array<float>",
    )
    R = train_opq_rotation(vecs, 4)
    assert np.allclose(R @ R.T, np.eye(16), atol=1e-8)
    rot = {
        row["id"]: np.asarray(row["vector"])
        for row in rotate_vectors(vecs, R).collect()
    }
    # L2 norms preserved up to float32 round-off
    for i in (0, 7, 100):
        assert abs(
            np.linalg.norm(rot[f"v{i}"]) - np.linalg.norm(x[i])
        ) < 1e-3


def test_opq_beats_plain_pq_on_anisotropic_data(spark):
    """The Ge et al. 2013 claim, reproduced: on correlated/anisotropic
    vectors the rotated PQ recalls strictly more (measured 0.70 -> 0.94
    on this seeded corpus)."""
    import numpy as np

    from pyrope_spark.operators.ivf import ivf_recall
    from pyrope_spark.operators.knn import knn_bruteforce
    from pyrope_spark.operators.pq import (
        pq_adc_search,
        pq_encode,
        rotate_vectors,
        train_opq_rotation,
        train_pq,
    )

    r = np.random.default_rng(5)
    dim, n, m = 32, 2000, 8
    A = (
        r.standard_normal((dim, dim)) * (1.5 ** -np.arange(dim))[None, :]
    ) @ r.standard_normal((dim, dim)) * 0.3
    x = (r.standard_normal((n, dim)) @ A).astype(np.float32)
    vecs = spark.createDataFrame(
        [(f"v{i:05d}", [float(v) for v in x[i]]) for i in range(n)],
        "id string, vector array<float>",
    ).cache()
    queries = spark.createDataFrame(
        [(f"v{i:05d}", [float(v) for v in x[i]]) for i in range(16)],
        "query_id string, vector array<float>",
    )
    exact = knn_bruteforce(vecs, queries, k=10, metric="l2").cache()
    exact.count()

    def recall_for(vdf, qdf):
        model = train_pq(vdf, m, 64)
        hits = pq_adc_search(pq_encode(vdf, model), model, qdf, 10)
        return ivf_recall(hits, exact, 10)

    r_plain = recall_for(vecs, queries)
    R = train_opq_rotation(vecs, m)
    r_opq = recall_for(rotate_vectors(vecs, R), rotate_vectors(queries, R))
    assert r_opq >= 0.85, r_opq
    assert r_opq >= r_plain + 0.1, (r_plain, r_opq)


def test_index_health_report(spark):
    import numpy as np

    from pyrope_spark.operators.segments import index_health, pack_segments

    r = np.random.default_rng(2)
    rows = []
    # cluster 0 heavy (300), cluster 1 light (30)
    for i in range(330):
        rows.append((f"v{i:04d}", [float(x) for x in r.random(8)], 0 if i < 300 else 1))
    df = spark.createDataFrame(rows, "id string, vector array<float>, cluster_id int")
    seg = pack_segments(df, cluster_col="cluster_id", rows_per_segment=64)
    rep = {x["cluster_id"]: x for x in index_health(seg).collect()}
    assert rep[0]["n_vectors"] == 300 and rep[1]["n_vectors"] == 30
    assert rep[0]["n_segments"] >= 5 and rep[1]["n_segments"] >= 1
    assert abs(rep[0]["share"] - 300 / 330) < 1e-6
    assert rep[0]["skew_ratio"] > 1.5 > rep[1]["skew_ratio"]
    assert rep[0]["packed_bytes"] == 300 * 8 * 4  # n * dim * f32
