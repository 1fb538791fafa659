"""RAKE keyword extraction (operators/keywords.py) — hand-traced closed
forms for the deg/freq micro scoring, phrase segmentation, duplicate
collapse, and deterministic ranking."""

from __future__ import annotations

from pyrope_spark.operators.keywords import rake_keywords


def _rows(df):
    return {
        (r["doc_id"], r["phrase"]): r
        for r in df.collect()
    }


def test_rake_closed_form(spark):
    # "deep learning of deep models": 'of' delimits two 2-word phrases.
    # freq(deep)=2 deg(deep)=2+2=4 -> wscore 2e6; learning/models 2e6 each.
    # Both phrases score 4e6; tie broken phrase-asc.
    docs = spark.createDataFrame(
        [(1, "deep learning of deep models")], "doc_id long, text string"
    )
    out = rake_keywords(docs, k=5).collect()
    by_phrase = {r["phrase"]: r for r in out}
    assert set(by_phrase) == {"deep learning", "deep models"}
    assert by_phrase["deep learning"]["score_micro"] == 4_000_000
    assert by_phrase["deep models"]["score_micro"] == 4_000_000
    assert by_phrase["deep learning"]["rk"] == 1  # phrase asc tiebreak
    assert by_phrase["deep models"]["rk"] == 2
    assert all(r["n_words"] == 2 for r in out)


def test_rake_duplicate_phrase_collapses_with_count(spark):
    # 'and' delimits; the identical phrase occurs twice -> one row,
    # n_occurrences=2. freq(fast)=2 deg(fast)=4 -> 2e6; score 4e6.
    docs = spark.createDataFrame(
        [(7, "fast cars and fast cars")], "doc_id long, text string"
    )
    out = rake_keywords(docs, k=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["phrase"] == "fast cars"
    assert r["n_occurrences"] == 2
    assert r["score_micro"] == 4_000_000
    assert r["rk"] == 1


def test_rake_single_word_and_top_k(spark):
    # Single-word phrases score deg/freq = 1e6 each; k bounds output.
    docs = spark.createDataFrame(
        [(3, "alpha of beta of gamma of delta")], "doc_id long, text string"
    )
    out = rake_keywords(docs, k=2).collect()
    assert len(out) == 2
    assert [r["phrase"] for r in sorted(out, key=lambda r: r["rk"])] == [
        "alpha",
        "beta",
    ]  # all score 1e6, phrase-asc
    assert all(r["score_micro"] == 1_000_000 for r in out)


def test_rake_stopword_only_doc_empty(spark):
    docs = spark.createDataFrame(
        [(9, "the of and to"), (10, None)], "doc_id long, text string"
    )
    assert rake_keywords(docs, k=5).count() == 0


def test_rake_multiplicity_weighting(spark):
    # "big data systems and big ideas": freq(big)=2, deg(big)=3+2=5
    # -> wscore(big) = 2_500_000; data=systems=3e6; ideas=2e6.
    # "big data systems" = 2.5e6+3e6+3e6 = 8.5e6 ; "big ideas" = 4.5e6.
    docs = spark.createDataFrame(
        [(4, "big data systems and big ideas")], "doc_id long, text string"
    )
    by_phrase = {r["phrase"]: r for r in rake_keywords(docs, k=5).collect()}
    assert by_phrase["big data systems"]["score_micro"] == 8_500_000
    assert by_phrase["big ideas"]["score_micro"] == 4_500_000
    assert by_phrase["big data systems"]["rk"] == 1
