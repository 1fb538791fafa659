from __future__ import annotations

import numpy as np
import pytest

from pyrope_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pyrope_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def make_vectors_df(spark, n=100, dim=8, seed=42, tag_frac=0.2, del_frac=0.02):
    """Deterministic synthetic vector records mirroring FIXTURES.md F1
    (reference generator: src/Pyrope.Benchmarks/Program.cs:251-263)."""
    r = np.random.default_rng(seed)
    mats = r.random((n, dim), dtype=np.float32)
    tag_pool = ["tagA", "tagB", "news", "archive"]
    rows = []
    for i in range(n):
        tags = []
        if r.random() < tag_frac:
            tags = list(r.choice(tag_pool, size=int(r.integers(1, 3)), replace=False))
        rows.append(
            (
                "t1",
                "idx1",
                f"v{i}",
                [float(x) for x in mats[i]],
                '{"type":"test","i":%d}' % i if r.random() < 0.05 else None,
                tags,
                bool(r.random() < del_frac),
            )
        )
    return spark.createDataFrame(
        rows,
        "tenant_id string, index_name string, id string, vector array<float>, "
        "meta string, tags array<string>, deleted boolean",
    )


def make_queries_df(spark, n=10, dim=8, seed=1337, k=5):
    r = np.random.default_rng(seed)
    mats = r.random((n, dim), dtype=np.float32)
    rows = [
        (f"q{i}", [float(x) for x in mats[i]], k, [])
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "query_id string, vector array<float>, top_k int, filter_tags array<string>"
    )


def numpy_knn_oracle(vec_rows, query_rows, k, metric, filter_tags=None):
    """Pure-python brute-force oracle (FIXTURES.md F3 semantics)."""
    out = {}
    for qid, q in query_rows:
        q = np.asarray(q, dtype=np.float64)
        scored = []
        for vid, v, tags, deleted in vec_rows:
            if deleted:
                continue
            if filter_tags and not set(filter_tags).issubset(set(tags or [])):
                continue
            v = np.asarray(v, dtype=np.float64)
            if metric == "l2":
                s = -float(np.sum((q - v) ** 2))
            elif metric == "ip":
                s = float(q @ v)
            else:
                nq, nv = np.linalg.norm(q), np.linalg.norm(v)
                s = 0.0 if nq < 1e-6 or nv < 1e-6 else float(q @ v / (nq * nv))
            scored.append((vid, s))
        scored.sort(key=lambda t: (-t[1], t[0]))
        out[qid] = scored[:k]
    return out
