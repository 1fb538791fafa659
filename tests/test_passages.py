"""Duplicate-passage detection (operators/passages.py) — planted-passage
semantics, span merging, cross-doc attribution, and fingerprint-mode parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyrope_spark.operators.passages import (
    duplicate_passages,
    duplicate_window_positions,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


UNIQ_A = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
UNIQ_B = "kilo lima mike november oscar papa quebec romeo sierra tango"
SHARED = "one two three four five six seven eight nine ten eleven twelve"


def test_planted_cross_doc_passage(spark):
    # 12 shared tokens at different offsets; window=8 -> windows 1..5 of the
    # shared region duplicate. Doc 10: tokens 11..22 shared; doc 20: 1..12.
    docs = _docs(
        spark,
        [
            (10, UNIQ_A + " " + SHARED),
            (20, SHARED + " " + UNIQ_B),
        ],
    )
    spans = {
        r["doc_id"]: r
        for r in duplicate_passages(docs, window=8).collect()
    }
    assert set(spans) == {10, 20}
    s10, s20 = spans[10], spans[20]
    # doc 20's shared passage starts at token 1, spans its full 12 tokens
    assert (s20["span_start"], s20["span_end"]) == (1, 12)
    assert s20["span_tokens"] == 12 and s20["n_windows"] == 5
    # doc 10's copy sits after the 10 unique tokens
    assert (s10["span_start"], s10["span_end"]) == (11, 22)
    assert s10["cross_doc"] and s20["cross_doc"]


def test_within_doc_repeat_not_cross_doc(spark):
    text = SHARED + " " + UNIQ_A + " " + SHARED
    other = UNIQ_B + " unique filler tokens continue here onward still more"
    docs = _docs(spark, [(1, text), (2, other)])
    rows = duplicate_passages(docs, window=8).collect()
    assert {r["doc_id"] for r in rows} == {1}
    assert all(not r["cross_doc"] for r in rows)
    # both copies of the repeated region are flagged
    starts = sorted(r["span_start"] for r in rows)
    assert starts == [1, 23]


def test_no_duplicates_empty(spark):
    docs = _docs(spark, [(1, UNIQ_A), (2, UNIQ_B)])
    assert duplicate_passages(docs, window=8).count() == 0


def test_adjacent_windows_merge_to_one_span(spark):
    # 16 shared tokens -> 9 overlapping windows at window=8, one merged span.
    long_shared = SHARED + " thirteen fourteen fifteen sixteen"
    docs = _docs(
        spark,
        [(1, long_shared + " " + UNIQ_A), (2, UNIQ_B + " " + long_shared)],
    )
    rows = duplicate_passages(docs, window=8).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) == 1 for v in per_doc.values())
    assert per_doc[1][0]["span_tokens"] == 16
    assert per_doc[1][0]["n_windows"] == 9


def test_xxhash64_mode_matches_portable(spark):
    docs = _docs(
        spark,
        [
            (10, UNIQ_A + " " + SHARED),
            (20, SHARED + " " + UNIQ_B),
            (30, UNIQ_B + " " + UNIQ_A),
        ],
    )
    def key(rows):
        return sorted(
            (r["doc_id"], r["span_start"], r["span_end"], r["cross_doc"])
            for r in rows
        )
    portable = key(duplicate_passages(docs, window=8, fingerprint="portable").collect())
    fast = key(duplicate_passages(docs, window=8, fingerprint="xxhash64").collect())
    assert portable == fast and portable


def test_stride_subsamples_positions(spark):
    docs = _docs(spark, [(1, SHARED + " " + UNIQ_A), (2, SHARED + " " + UNIQ_B)])
    full = duplicate_window_positions(docs, window=8, stride=1)
    strided = duplicate_window_positions(docs, window=8, stride=2)
    full_pos = {(r["doc_id"], r["pos"]) for r in full.collect()}
    strided_pos = {(r["doc_id"], r["pos"]) for r in strided.collect()}
    assert strided_pos <= full_pos
    # stride 2 keeps pos0 % 2 == 0 i.e. odd 1-based positions
    assert all(p % 2 == 1 for _, p in strided_pos)


def test_passages_plan_shape(spark):
    """Exactly two exchanges (fp-partition dup mark, doc-partition islands):
    the final groupBy(doc_id, grp) must reuse the doc_id window partitioning
    and the dup mark must be window functions, not a groupBy+join-back."""
    docs = _docs(spark, [(1, UNIQ_A + " " + SHARED), (2, SHARED + " " + UNIQ_B)])
    out = duplicate_passages(docs, window=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 2, f"expected 2 exchanges, plan has {n_exchanges}"
    assert "Join" not in plan


def test_strip_duplicate_spans(spark):
    from pyrope_spark.operators.passages import strip_duplicate_spans

    docs = _docs(
        spark,
        [
            (10, UNIQ_A + " " + SHARED),
            (20, SHARED + " " + UNIQ_B),
            (30, UNIQ_B + " extra tokens here padding words continue onward"),
        ],
    )
    rows = {r["doc_id"]: r for r in
            strip_duplicate_spans(docs, window=8).collect()}
    # doc 10: the 12 shared tokens removed, the 10 unique remain
    assert rows[10]["clean_text"] == UNIQ_A
    assert rows[10]["n_tokens"] == 10 and rows[10]["n_tokens_removed"] == 12
    # doc 20 shares SHARED with doc 10 AND UNIQ_B with doc 30 -> fully gone
    assert rows[20]["clean_text"] == "" and rows[20]["n_tokens"] == 0
    assert rows[20]["n_tokens_removed"] == 22
    # doc 30's UNIQ_B prefix is flagged; its unique tail remains
    assert rows[30]["n_tokens_removed"] == 10
    assert rows[30]["clean_text"].startswith("extra")


def test_strip_with_explicit_span_policy(spark):
    from pyrope_spark.operators.passages import (
        duplicate_passages,
        strip_duplicate_spans,
    )

    docs = _docs(spark, [(1, UNIQ_A + " " + SHARED), (2, SHARED + " " + UNIQ_B)])
    spans = duplicate_passages(docs, window=8)
    # keep-one-copy policy: drop the minimum (doc_id, span_start) holder
    # from the span table before stripping
    from pyspark.sql import Window as W

    keep = spans.withColumn(
        "_rk",
        F.row_number().over(W.orderBy("doc_id", "span_start")),
    ).where(F.col("_rk") > 1).drop("_rk")
    rows = {r["doc_id"]: r for r in
            strip_duplicate_spans(docs, spans=keep, window=8).collect()}
    # doc 1 keeps its copy (its span was the dropped one), doc 2 stripped
    assert rows[1]["n_tokens_removed"] == 0
    assert rows[2]["n_tokens_removed"] == 12


# ----------------------------------------------------------- winnowing

def _brute_winnow(text: str, k: int, w: int):
    """Reference winnow: per-window rightmost argmin over k-gram Horner
    hashes (Schleimer et al. Fig. 5 robust winnowing)."""
    from pyrope_spark.functions.text import FP_ROLL_P, FP_ROLL_R, FP_ROLL_SEED

    if len(text) < k:
        return set()
    hs = []
    for q in range(len(text) - k + 1):
        acc = FP_ROLL_SEED
        for c in text[q:q + k]:
            acc = (acc * FP_ROLL_R + ord(c)) % FP_ROLL_P
        hs.append(acc)
    sel = set()
    for i in range(max(1, len(hs) - w + 1)):
        window = hs[i:i + w]
        mn = min(window)
        pos = max(j for j in range(i, min(i + w, len(hs))) if hs[j] == mn)
        sel.add((pos + 1, mn))  # 1-based
    return sel


def test_winnow_matches_bruteforce(spark):
    from pyrope_spark.operators.passages import winnow_fingerprints

    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "aaaaaaaaaaaaaaaaaaaaaa"),          # constant text, all ties
        (3, "abcabcabcabcabcabcabcabc"),        # periodic
        (4, "short"),                           # < k -> empty
        (5, "exactlen8"),                       # one k-gram
        (6, "a slightly longer sentence with mixed 1234 tokens!"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_id"], r["gram_pos"], r["fp"])
        for r in winnow_fingerprints(docs, k=8, w=8).collect()
    }
    want = {
        (i, p, fp) for i, t in texts for (p, fp) in _brute_winnow(t, 8, 8)
    }
    assert got == want


def test_winnow_density_gap_bound(spark):
    """At least one selected fingerprint in every w consecutive k-gram
    positions (the winnowing guarantee)."""
    from pyrope_spark.operators.passages import winnow_fingerprints

    import random

    rng = random.Random(7)
    text = "".join(rng.choice("abcdefgh ") for _ in range(400))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    pos = sorted(
        r["gram_pos"] for r in winnow_fingerprints(docs, k=5, w=6).collect()
    )
    gaps = [b - a for a, b in zip(pos, pos[1:])]
    assert pos[0] <= 6 and all(g <= 6 for g in gaps)


def test_winnow_shared_substring_guarantee(spark):
    """Two docs sharing a substring of length >= w + k - 1 share at least
    one selected fingerprint VALUE."""
    from pyrope_spark.operators.passages import winnow_fingerprints

    shared = "XcommonQsubstringZpayload"  # 25 >= 8 + 8 - 1
    docs = spark.createDataFrame(
        [(1, "prefix one " + shared + " tail alpha"),
         (2, "totally different head " + shared + " other ending")],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(docs).collect()
    fps1 = {r["fp"] for r in rows if r["doc_id"] == 1}
    fps2 = {r["fp"] for r in rows if r["doc_id"] == 2}
    assert fps1 & fps2


def test_winnow_arrow_matches_expr(spark):
    """mode='arrow' (vectorized numpy) == mode='expr' (oracle twin),
    including mixed lengths, short docs, and tie-heavy texts."""
    import random

    from pyrope_spark.operators.passages import winnow_fingerprints

    rng = random.Random(99)
    texts = [(i, "".join(rng.choice("abcde ") for _ in range(rng.randrange(3, 120))))
             for i in range(60)]
    texts += [(100, "aaaaaaaaaaaaaaaaaaaa"), (101, "x" * 7), (102, "y" * 8)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    expr = {(r["doc_id"], r["gram_pos"], r["fp"])
            for r in winnow_fingerprints(docs, mode="expr").collect()}
    arrow = {(r["doc_id"], r["gram_pos"], r["fp"])
             for r in winnow_fingerprints(docs, mode="arrow").collect()}
    assert arrow == expr


def test_window_fp_arrow_matches_expression_path(spark):
    """r10: the Arrow window-fingerprint kernel ('portable') must produce
    the exact (doc_id, pos, fp) rows of the expression pipeline
    ('portable_expr'), including short-doc and stride filtering."""
    import random

    from pyrope_spark.operators.passages import duplicate_window_positions

    rng = random.Random(5)
    rows = [
        (i, " ".join(
            "".join(rng.choice("abc") for _ in range(rng.randrange(1, 5)))
            for _ in range(rng.randrange(0, 40))
        ))
        for i in range(60)
    ]
    rows += [(100, ""), (101, None), (102, "only three tokens here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for window, stride in ((4, 1), (8, 1), (4, 3)):
        expr = sorted(
            (r["doc_id"], r["pos"], r["fp"], r["n_occurrences"], r["cross_doc"])
            for r in duplicate_window_positions(
                docs, window=window, stride=stride,
                fingerprint="portable",
            ).collect()
        )
        arrow = sorted(
            (r["doc_id"], r["pos"], r["fp"], r["n_occurrences"], r["cross_doc"])
            for r in duplicate_window_positions(
                docs, window=window, stride=stride, fingerprint="portable_arrow",
            ).collect()
        )
        assert arrow == expr, f"window={window} stride={stride}"
