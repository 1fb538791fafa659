"""BM25 full-text search (operators/fulltext.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pyrope_spark.operators.fulltext import (
    bm25_topk,
    build_postings,
    corpus_stats,
)


def _docs(spark):
    rows = [
        (1, "spark shuffle join join join"),
        (2, "spark window agg"),
        (3, "the quick brown fox"),
        (4, "join order optimizer join"),
        (5, "spark spark spark spark spark"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_tf_and_dl(spark):
    p = build_postings(_docs(spark)).collect()
    by = {(r.term, r.doc_id): (r.tf, r.dl) for r in p}
    assert by[("join", 1)] == (3, 5)
    assert by[("spark", 5)] == (5, 5)
    assert by[("fox", 3)] == (1, 4)
    # one row per (term, doc)
    assert len(by) == len(p)


def test_bm25_rare_term_outranks_common(spark):
    """'fox' appears in one doc, 'spark' in three — a query for both must rank
    the fox doc first (idf dominates), and docs without any query term are
    absent."""
    docs = _docs(spark)
    q = spark.createDataFrame([(1, "fox spark")], "query_id long, query_text string")
    out = bm25_topk(docs, q, k=10).orderBy("rank").collect()
    assert out[0].doc_id == 3
    assert {r.doc_id for r in out} == {1, 2, 3, 5}  # doc 4 has neither term


def test_bm25_score_matches_closed_form(spark):
    """Hand-computed Lucene BM25 for a single (term, doc) pair."""
    docs = _docs(spark)
    q = spark.createDataFrame([(1, "fox")], "query_id long, query_text string")
    row = bm25_topk(docs, q, k=1).collect()[0]
    n_docs, avgdl = 5, (5 + 3 + 4 + 4 + 5) / 5.0
    idf = math.log(1 + (n_docs - 1 + 0.5) / (1 + 0.5))
    tf, dl, k1, b = 1.0, 4.0, 1.2, 0.75
    expected = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert abs(row.score - expected) < 1e-6
    assert row.doc_id == 3 and row.rank == 1


def test_bm25_prebuilt_postings_parity(spark):
    """The steady-state path (materialized postings) returns identical rows."""
    docs = _docs(spark)
    q = spark.createDataFrame(
        [(1, "spark join"), (2, "fox")], "query_id long, query_text string"
    )
    direct = bm25_topk(docs, q, k=10)
    pre = bm25_topk(build_postings(docs), q, k=10, prebuilt=True)
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, pre.collect()))


def test_bm25_query_tf_ignored_and_corpus_stats(spark):
    """Repeating a query term must not change scores (distinct-term BM25),
    and corpus_stats stays a 1-row collect-free aggregate."""
    docs = _docs(spark)
    q1 = spark.createDataFrame([(1, "spark")], "query_id long, query_text string")
    q2 = spark.createDataFrame(
        [(1, "spark spark spark")], "query_id long, query_text string"
    )
    r1 = sorted(map(tuple, bm25_topk(docs, q1, k=10).collect()))
    r2 = sorted(map(tuple, bm25_topk(docs, q2, k=10).collect()))
    assert r1 == r2
    s = corpus_stats(build_postings(docs)).collect()
    assert len(s) == 1 and s[0].n_docs == 5
    assert abs(s[0].avgdl - 21 / 5.0) < 1e-9


def test_bm25_plan_broadcasts_query_side(spark):
    """The corpus-sized join must be a broadcast hash join (query terms are
    the small side) — no shuffle of the postings for the join itself."""
    docs = _docs(spark)
    q = spark.createDataFrame([(1, "spark join")], "query_id long, query_text string")
    plan = bm25_topk(docs, q, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_rrf_fusion_semantics(spark):
    """A doc ranked well by BOTH arms must outrank docs ranked top by only
    one arm; contributions are 1/(k0+rank); missing-arm docs get no
    imputation."""
    from pyrope_spark.operators.fulltext import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)], "query_id long, doc_id long, rank long"
    )
    vec = spark.createDataFrame(
        [(1, 20, 1), (1, 40, 2), (1, 10, 3)], "query_id long, doc_id long, rank long"
    )
    out = {r.doc_id: r for r in rrf_fuse([lex, vec], k=10, k0=60).collect()}
    # doc 20: 1/62 + 1/61 (both arms); doc 10: 1/61 + 1/63
    assert abs(out[20].rrf_score - round(1 / 62 + 1 / 61, 6)) < 2e-6
    assert abs(out[10].rrf_score - round(1 / 61 + 1 / 63, 6)) < 2e-6
    assert out[20].rank == 1 and out[10].rank == 2
    # single-arm docs: exactly one contribution
    assert abs(out[30].rrf_score - round(1 / 63, 6)) < 2e-6
    assert abs(out[40].rrf_score - round(1 / 62, 6)) < 2e-6


def test_rrf_tie_breaks_by_doc_id(spark):
    from pyrope_spark.operators.fulltext import rrf_fuse

    a = spark.createDataFrame(
        [(1, 7, 1), (1, 3, 2)], "query_id long, doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(1, 3, 1), (1, 7, 2)], "query_id long, doc_id long, rank long"
    )
    out = rrf_fuse([a, b], k=10).orderBy("rank").collect()
    # identical fused scores -> ascending doc_id decides
    assert [r.doc_id for r in out] == [3, 7]


def test_bm25_index_store_roundtrip_and_pruning(spark, tmp_path):
    """write/load the bucketed index; search results identical to the inline
    path; the scan carries a PartitionFilters entry on term_bucket."""
    from pyrope_spark.operators.fulltext import (
        build_bm25_index,
        bm25_topk,
        write_bm25_index,
    )

    docs = _docs(spark)
    q = spark.createDataFrame(
        [(1, "spark join"), (2, "fox")], "query_id long, query_text string"
    )
    inline = sorted(map(tuple, bm25_topk(docs, q, k=10).collect()))

    idx = write_bm25_index(build_bm25_index(docs), str(tmp_path / "bm25"), n_buckets=8)
    assert idx.n_buckets == 8
    stored = sorted(map(tuple, bm25_topk(idx, q, k=10).collect()))
    assert inline == stored

    pruned = bm25_topk(idx, q, k=10)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "term_bucket" in plan and "PartitionFilters: [" in plan


def test_incremental_index_update_equals_full_rebuild(spark, tmp_path):
    """write(half) + update(other half) must produce search results
    identical to an index built on the full corpus — postings, termdf, and
    weighted-avgdl stats all merge correctly."""
    from pyrope_spark.operators.fulltext import (
        bm25_topk,
        build_bm25_index,
        update_bm25_index,
        write_bm25_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i} w{i % 7} gamma" + (" delta" * (i % 3)))
         for i in range(40)],
        "doc_id long, text string",
    )
    first, second = docs.where("doc_id < 25"), docs.where("doc_id >= 25")
    path = str(tmp_path / "bm25_inc")
    write_bm25_index(build_bm25_index(first), path, n_buckets=16)
    updated = update_bm25_index(spark, path, second)

    full = build_bm25_index(docs)
    queries = spark.createDataFrame(
        [("q1", "alpha delta"), ("q2", "w3 gamma"), ("q3", "beta w26")],
        "query_id string, query_text string",
    )
    def run(idx):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], r["score"])
            for r in bm25_topk(idx, queries, k=5).collect()
        )
    assert run(updated) == run(full)
    # stats merged exactly
    s_u = updated.stats.first()
    s_f = full.stats.first()
    assert s_u["n_docs"] == s_f["n_docs"] == 40
    assert abs(s_u["avgdl"] - s_f["avgdl"]) < 1e-12
    # termdf merged exactly
    tu = {r["term"]: r["df"] for r in updated.termdf.collect()}
    tf_ = {r["term"]: r["df"] for r in full.termdf.collect()}
    assert tu == tf_


def test_prf_expansion_and_search(spark):
    """PRF pulls co-occurring vocabulary into the query: a query matching
    doc A must also surface doc B that shares A's OTHER terms but none of
    the original query's."""
    from pyspark.sql import functions as F

    from pyrope_spark.operators.fulltext import bm25_prf_topk, bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "quantum computing qubits entanglement"),
            (2, "qubits entanglement decoherence superposition"),
            (3, "qubits entanglement decoherence superposition"),
            (4, "cooking pasta tomato sauce"),
            (5, "gardening roses soil compost"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(1, "quantum computing")], "query_id long, query_text string"
    )
    base = bm25_topk(docs, qs, k=5)
    base_docs = {r["doc_id"] for r in base.collect()}
    assert base_docs == {1}  # only doc 1 has the original terms
    prf = bm25_prf_topk(docs, qs, k=5, fb_docs=2, fb_terms=3)
    prf_docs = {r["doc_id"] for r in prf.collect()}
    # expansion via doc 1's other terms (qubits/entanglement) reaches 2,3
    assert {1, 2, 3}.issubset(prf_docs)
    assert 4 not in prf_docs and 5 not in prf_docs
    # original-terms docs still rank first
    top = {r["doc_id"] for r in prf.filter(F.col("rank") == 1).collect()}
    assert top == {1}


def test_prf_no_feedback_terms_falls_back(spark):
    """A query whose hits add no new terms returns plain BM25 results."""
    from pyrope_spark.operators.fulltext import bm25_prf_topk, bm25_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    qs = spark.createDataFrame(
        [(1, "alpha beta")], "query_id long, query_text string"
    )
    a = bm25_topk(docs, qs, k=3).collect()
    b = bm25_prf_topk(docs, qs, k=3, fb_docs=1, fb_terms=5).collect()
    assert sorted((r["doc_id"], r["rank"]) for r in a) == sorted(
        (r["doc_id"], r["rank"]) for r in b
    )


# --------------------------------------------------------------------------
# Positional proximity search
# --------------------------------------------------------------------------


def test_proximity_min_span_and_counts(spark):
    from pyrope_spark.operators.fulltext import proximity_search

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha delta beta"),  # spans: |0-1|=1 ...
            (2, "alpha x x x x x beta"),               # span 6: out at k=5
            (3, "beta alpha"),                          # span 1
            (4, "alpha only here"),                     # no beta: no row
        ],
        "doc_id long, text string",
    )
    out = proximity_search(
        docs, term_a="alpha", term_b="beta", max_span=5, k=10
    ).collect()
    by = {r["doc_id"]: r for r in out}
    assert set(by) == {1, 3}
    # doc 1: alpha@0,3 beta@1,5 -> spans 1,5,2,2 -> min 1, all 4 within 5
    assert by[1]["min_span"] == 1
    assert by[1]["n_a"] == 2 and by[1]["n_b"] == 2
    assert by[1]["n_pairs_within"] == 4
    # doc 3: min 1, 1 pair
    assert by[3]["min_span"] == 1 and by[3]["n_pairs_within"] == 1
    # rank: equal min_span 1 -> more pairs first -> doc 1 rk1
    assert by[1]["rk"] == 1 and by[3]["rk"] == 2


def test_proximity_exact_span_boundary(spark):
    from pyrope_spark.operators.fulltext import proximity_search

    docs = spark.createDataFrame(
        [(1, "a x x b")], "doc_id long, text string"
    )
    hit = proximity_search(docs, term_a="a", term_b="b", max_span=3, k=5)
    miss = proximity_search(docs, term_a="a", term_b="b", max_span=2, k=5)
    assert hit.count() == 1 and hit.collect()[0]["min_span"] == 3
    assert miss.count() == 0


def test_proximity_k_bounds_output(spark):
    from pyrope_spark.operators.fulltext import proximity_search

    docs = spark.createDataFrame(
        [(i, "p q") for i in range(30)], "doc_id long, text string"
    )
    out = proximity_search(docs, term_a="p", term_b="q", max_span=1, k=7)
    rows = out.collect()
    assert len(rows) == 7
    # ties everywhere -> doc_id asc fills ranks deterministically
    assert [r["doc_id"] for r in sorted(rows, key=lambda r: r["rk"])] == list(
        range(7)
    )
