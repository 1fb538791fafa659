"""MaxSim late interaction (operators/colbert.py): hand-computed truth,
expr/grouped parity, token-match semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyrope_spark.operators.colbert import maxsim_topk


def _dt(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, vector array<float>")


def _qt(spark, rows):
    return spark.createDataFrame(
        rows, "query_id string, token_no int, vector array<float>"
    )


def test_maxsim_hand_computed(spark):
    """Two docs, one query with two tokens; MaxSim picks the doc with the
    best PER-TOKEN matches even when no single vector dominates."""
    dt = _dt(spark, [
        ("dA", [1.0, 0.0]), ("dA", [0.0, 1.0]),   # covers both directions
        ("dB", [0.7, 0.7]), ("dB", [0.7, 0.7]),   # middling on both
    ])
    qt = _qt(spark, [("q", 0, [1.0, 0.0]), ("q", 1, [0.0, 1.0])])
    out = maxsim_topk(dt, qt, 2, impl="expr").collect()
    by = {r["doc_id"]: (r["rank"], r["score"]) for r in out}
    # dA: max(1,0)+max(0,1) = 2.0 ; dB: 0.7+0.7 = 1.4
    assert by["dA"] == (1, 2.0)
    assert by["dB"] == (2, pytest.approx(1.4, abs=1e-6))


def test_maxsim_expr_grouped_parity(spark):
    r = np.random.default_rng(4)
    dt = _dt(spark, [
        (f"d{i % 30:02d}", [float(x) for x in (r.random(8) - 0.5)])
        for i in range(240)
    ])
    qt = _qt(spark, [
        (f"q{j}", t, [float(x) for x in (r.random(8) - 0.5)])
        for j in range(3) for t in range(4)
    ])
    key = lambda d: sorted(
        (x["query_id"], x["rank"], x["doc_id"], x["score"]) for x in d.collect()
    )
    a = maxsim_topk(dt, qt, 5, impl="expr")
    b = maxsim_topk(dt, qt, 5, impl="grouped")
    c = maxsim_topk(dt, qt, 5, impl="packed")
    assert key(a) == key(b) == key(c)


def test_maxsim_single_vector_degenerates_to_ip_knn(spark):
    """One token per doc and per query == plain inner-product KNN."""
    from pyrope_spark.operators.knn import knn_bruteforce

    r = np.random.default_rng(9)
    mat = (r.random((50, 8)) - 0.5).astype(np.float32)
    dt = _dt(spark, [(f"v{i:02d}", [float(x) for x in mat[i]]) for i in range(50)])
    qt = _qt(spark, [("q0", 0, [float(x) for x in mat[0]])])
    vecs = dt.select(F.col("doc_id").alias("id"), "vector")
    qs = qt.select("query_id", "vector")
    exact = knn_bruteforce(vecs, qs, k=5, metric="ip")
    ms = maxsim_topk(dt, qt, 5, impl="grouped")
    key_e = sorted((x["query_id"], x["rank"], x["id"]) for x in exact.collect())
    key_m = sorted((x["query_id"], x["rank"], x["doc_id"]) for x in ms.collect())
    assert key_e == key_m


def test_maxsim_unknown_impl(spark):
    dt = _dt(spark, [("d", [1.0])])
    qt = _qt(spark, [("q", 0, [1.0])])
    with pytest.raises(ValueError, match="unknown impl"):
        maxsim_topk(dt, qt, 1, impl="nope")


def test_pool_embeddings_mean_and_max(spark):
    import numpy as np

    from pyrope_spark.operators.colbert import pool_embeddings

    dt = _dt(spark, [
        ("d1", [1.0, -2.0]), ("d1", [3.0, 4.0]), ("d2", [0.5, 0.5]),
    ])
    mean = {
        (r["doc_id"], r["dim_no"]): r["value"]
        for r in pool_embeddings(dt, mode="mean").collect()
    }
    assert mean[("d1", 0)] == 2.0 and mean[("d1", 1)] == 1.0
    assert mean[("d2", 0)] == 0.5
    mx = {
        (r["doc_id"], r["dim_no"]): r["value"]
        for r in pool_embeddings(dt, mode="max").collect()
    }
    assert mx[("d1", 0)] == 3.0 and mx[("d1", 1)] == 4.0


def test_pool_layout_independence(spark):
    """The integer-grid fold makes the pooled mean identical under any
    partitioning (the property float sums do not have)."""
    import numpy as np

    from pyrope_spark.operators.colbert import pool_embeddings

    r = np.random.default_rng(6)
    rows = [
        (f"d{i % 7}", [float(x) for x in (r.random(12) - 0.5)])
        for i in range(700)
    ]
    df = spark.createDataFrame(rows, "doc_id string, vector array<float>")
    key = lambda d: sorted(
        (x["doc_id"], x["dim_no"], x["value"]) for x in d.collect()
    )
    assert key(pool_embeddings(df)) == key(pool_embeddings(df.repartition(13)))


def test_pool_bad_mode(spark):
    import pytest

    from pyrope_spark.operators.colbert import pool_embeddings

    with pytest.raises(ValueError, match="mode"):
        pool_embeddings(_dt(spark, [("d", [1.0])]), mode="median")


def test_maxsim_packed_plan_shape(spark):
    """The packed path's only wide ops: ONE doc-hash exchange (collect_list)
    plus the final per-query window — no join of the corpus anywhere."""
    import numpy as np

    r = np.random.default_rng(3)
    dt = _dt(spark, [
        (f"d{i % 40:02d}", [float(x) for x in (r.random(8) - 0.5)])
        for i in range(160)
    ])
    qt = _qt(spark, [("q0", 0, [0.1] * 8), ("q0", 1, [0.2] * 8)])
    out = maxsim_topk(dt, qt, 5, impl="packed")
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") <= 2
    assert "Join" not in final
