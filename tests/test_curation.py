from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyrope_spark.operators.curation import (
    chunk_documents,
    corpus_mix_weights,
    dedup_against_index,
    pii_scrub,
    repetition_stats,
    stratified_hash_sample,
    text_fingerprint,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spam spam spam spam spam spam spam spam", "en"),  # one repeated 2-gram
        (2, "alpha beta gamma delta epsilon zeta eta theta", "en"),  # all distinct
        (3, "", "de"),  # empty
        (4, "solo", "de"),  # fewer tokens than ngram_n
        (5, "a b a b a b a b c d", "fr"),  # mixed repetition
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string").cache()


def test_repetition_stats_flags(spark, docs):
    out = {r["doc_id"]: r for r in repetition_stats(docs, ngram_n=2).collect()}
    assert set(out) == {1, 2, 3, 4, 5}

    r1 = out[1]  # 7 identical "spam spam" 2-grams
    assert r1["n_tokens"] == 8 and r1["n_ngrams"] == 7
    assert r1["top_ngram_frac"] == 1.0 and r1["dup_ngram_frac"] == pytest.approx(6 / 7)
    assert r1["is_repetitive"]

    r2 = out[2]  # all 2-grams distinct
    assert r2["n_ngrams"] == 7 and r2["dup_ngram_frac"] == 0.0
    assert r2["top_ngram_frac"] == pytest.approx(1 / 7)
    assert not r2["is_repetitive"]

    for d in (3, 4):  # no 2-grams at all -> zeros, not dropped rows
        assert out[d]["n_ngrams"] == 0 and not out[d]["is_repetitive"]

    r5 = out[5]  # "a b" x4 of 9 grams
    assert r5["n_ngrams"] == 9
    assert r5["top_ngram_frac"] == pytest.approx(4 / 9, abs=1e-6)


def test_chunk_documents_shapes(spark, docs):
    out = chunk_documents(docs, chunk_tokens=3).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 3 not in by_doc  # empty doc yields no chunks
    assert [r["chunk_n_tokens"] for r in sorted(by_doc[2], key=lambda r: r["chunk_idx"])] == [3, 3, 2]
    joined = " ".join(
        r["chunk_text"] for r in sorted(by_doc[2], key=lambda r: r["chunk_idx"])
    )
    assert joined == "alpha beta gamma delta epsilon zeta eta theta"
    assert by_doc[4][0]["chunk_text"] == "solo" and by_doc[4][0]["chunk_n_tokens"] == 1


def test_pii_scrub_redacts(spark):
    rows = [
        (1, "mail me at a.b-c_d@ex-ample.org thanks"),
        (2, "call +44 20 7946 0958 or 555-867-5309 now"),
        (3, "clean text with no contact info at all"),
        (4, "x@y.io and 12345678 both"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert out[1]["n_emails"] == 1 and "<EMAIL>" in out[1]["scrubbed"]
    assert "a.b-c_d" not in out[1]["scrubbed"]
    assert out[2]["n_phones"] >= 1 and "<PHONE>" in out[2]["scrubbed"]
    assert "7946" not in out[2]["scrubbed"] and "5309" not in out[2]["scrubbed"]
    assert out[3]["n_emails"] == 0 and out[3]["n_phones"] == 0
    assert out[3]["scrubbed"] == "clean text with no contact info at all"
    assert out[4]["n_emails"] == 1 and out[4]["n_phones"] == 1


def test_stratified_hash_sample_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(2000)], "doc_id long, lang string"
    )
    a = stratified_hash_sample(df, {"en": 0.25, "de": 1.0}, seed="s1")
    b = stratified_hash_sample(df.repartition(7), {"en": 0.25, "de": 1.0}, seed="s1")
    ra = sorted(r["doc_id"] for r in a.collect())
    rb = sorted(r["doc_id"] for r in b.collect())
    assert ra == rb  # layout-independent
    n_de = sum(1 for r in a.collect() if r["stratum"] == "de")
    n_en = len(ra) - n_de
    assert n_de == 1000  # rate 1.0 keeps everything
    assert 150 <= n_en <= 350  # ~250 expected at rate 0.25

    c = stratified_hash_sample(df, {"en": 0.25, "de": 1.0}, seed="s2")
    assert sorted(r["doc_id"] for r in c.collect()) != ra  # seed changes the draw


def test_dedup_against_index(spark):
    corpus = spark.createDataFrame(
        [(1, "known text one"), (2, "known text two")], "doc_id long, text string"
    )
    index = corpus.select(text_fingerprint(F.col("text")).alias("fp"))
    batch = spark.createDataFrame(
        [
            (10, "KNOWN TEXT ONE  "),  # normalized dup of indexed doc
            (11, "fresh document"),
            (12, "fresh document"),  # in-batch dup, higher id
            (13, "another fresh one"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in dedup_against_index(batch, index).collect())
    assert kept == [11, 13]


def test_corpus_mix_weights(spark, docs):
    out = {r["stratum"]: r for r in corpus_mix_weights(docs, {"en": 0.5, "de": 0.3, "fr": 0.2}).collect()}
    assert set(out) == {"en", "de", "fr"}
    total = sum(r["n_tokens"] for r in out.values())
    for lang, r in out.items():
        assert r["actual_frac"] == pytest.approx(r["n_tokens"] / total, abs=1e-6)
    # weight pushes under-represented strata up
    assert out["de"]["weight"] > 1.0  # tiny token share vs target 0.3


def test_decontaminate(spark):
    from pyrope_spark.operators.curation import decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "prefix alpha beta gamma delta suffix"),  # shares a 4-gram
            (2, "alpha beta gamma zeta delta"),            # only 3-gram overlap
            (3, "totally different words here now"),
            (4, "xy"),                                     # too short for 4-grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(train, bench, ngram_n=4).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["contaminated"] and out[1]["n_contaminated"] == 1
    assert not out[2]["contaminated"]
    assert not out[3]["contaminated"]
    assert out[4]["n_ngrams"] == 0 and not out[4]["contaminated"]


def test_chunk_strided_arrow_matches_expr(spark):
    """r11: the strided-chunk Arrow kernel must be value-identical to the
    expression path (short docs, empty/NULL text, non-ASCII whitespace,
    final short windows)."""
    import random

    from pyrope_spark.operators.curation import chunk_documents_strided

    rng = random.Random(53)
    rows = [
        (i, " ".join(f"w{rng.randrange(40)}" for _ in range(rng.randrange(0, 40))))
        for i in range(60)
    ]
    rows += [
        (100, ""),
        (101, None),
        (102, "one"),
        (103, "\u00a0lead unicode\u2028space mix here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for c, st in ((16, 8), (4, 2), (5, 5)):
        got_a = sorted(map(tuple, chunk_documents_strided(
            docs, chunk_tokens=c, stride=st).collect()))
        got_e = sorted(map(tuple, chunk_documents_strided(
            docs, chunk_tokens=c, stride=st, impl="expr").collect()))
        assert got_a == got_e, f"chunk={c} stride={st}"
        # same column names/dtypes (nullability flags may differ; the
        # driver's dtype-sensitive compare is over collected values)
        sa = chunk_documents_strided(docs, chunk_tokens=c, stride=st).schema
        se = chunk_documents_strided(
            docs, chunk_tokens=c, stride=st, impl="expr"
        ).schema
        assert [(f.name, f.dataType) for f in sa.fields] == [
            (f.name, f.dataType) for f in se.fields
        ]


def test_decontaminate_arrow_matches_expr(spark):
    """r11: the gram_rows Arrow kernel path must be value-identical to the
    expression HOF path, including zero-gram docs, repeated grams (per-doc
    distinct), and non-ASCII whitespace (\u00a0 / \u2028 are NOT token
    separators on either path -- the r10 ADVICE tokenizer fix)."""
    import random

    from pyrope_spark.operators.curation import decontaminate

    rng = random.Random(31)
    words = ["alpha", "beta", "gamma", "delta", "w1", "w2", "w3"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randrange(0, 14))))
        for i in range(60)
    ]
    rows += [
        (100, ""),
        (101, None),
        (102, "xy"),
        (103, "\u00a0alpha beta gamma delta"),
        (104, "alpha\u2028beta gamma delta epsilon"),
        (105, "ALPHA beta\tGAMMA delta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    train = docs.filter(F.col("doc_id") % 3 != 0)
    bench = docs.filter(F.col("doc_id") % 3 == 0)
    for n in (2, 4):
        got_a = sorted(
            map(tuple, decontaminate(train, bench, ngram_n=n).collect())
        )
        got_e = sorted(
            map(
                tuple,
                decontaminate(train, bench, ngram_n=n, impl="expr").collect(),
            )
        )
        assert got_a == got_e, f"ngram_n={n}"



def test_shuffle_shards_deterministic(spark):
    from pyrope_spark.operators.curation import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    a = shuffle_shards(df, n_shards=4, seed="s1")
    b = shuffle_shards(df.repartition(13), n_shards=4, seed="s1")
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb  # layout-independent manifest
    n = len(ra)
    shards = {}
    for _, shard, pos in ra:
        shards.setdefault(shard, []).append(pos)
    assert set(shards) == {0, 1, 2, 3}
    for positions in shards.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # roughly balanced (hash-uniform): no shard takes more than half
    assert max(len(p) for p in shards.values()) < n / 2
    c = shuffle_shards(df, n_shards=4, seed="s2")
    assert sorted(map(tuple, c.collect())) != ra  # seed reshuffles


def test_null_text_is_inert(spark):
    """NULL text must behave as empty text everywhere (Spark's legacy
    size(NULL) = -1 would otherwise leak phantom chunks / -1 counts)."""
    from pyrope_spark.operators.curation import chunk_documents, decontaminate

    df = spark.createDataFrame(
        [(1, None), (2, "real words here")], "doc_id long, text string"
    )
    chunks = chunk_documents(df, chunk_tokens=4).collect()
    assert {r["doc_id"] for r in chunks} == {2}
    stats = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert stats[1]["n_tokens"] == 0 and stats[1]["n_ngrams"] == 0
    pii = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert pii[1]["n_emails"] == 0 and pii[1]["scrubbed"] == ""
    bench_df = spark.createDataFrame([(9, "eval set words")], "doc_id long, text string")
    dec = {r["doc_id"]: r for r in decontaminate(df, bench_df, ngram_n=2).collect()}
    assert dec[1]["n_ngrams"] == 0 and not dec[1]["contaminated"]


def test_pack_sequences_greedy_semantics(spark):
    """Docs pack greedily in shuffle order; overflow starts a new sequence;
    an oversized doc sits alone; offsets are running fills."""
    from pyrope_spark.operators.curation import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in
         [(1, 3), (2, 4), (3, 5), (4, 20), (5, 2), (6, 1)]],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, ctx_tokens=8, n_shards=1, seed="t")
    rows = {r["doc_id"]: r for r in out.collect()}
    # reconstruct the shuffle order and simulate greedy packing in python
    order = sorted(rows.values(), key=lambda r: (r["seq_id"], r["tok_offset"]))
    fill = seq = 0
    first = True
    for r in order:
        t = r["n_tokens"]
        if not first and fill + t > 8:
            seq += 1
            fill = 0
        assert (r["seq_id"], r["tok_offset"]) == (seq, fill), r
        fill += t
        first = False
    # the 20-token doc exceeds ctx and must be alone in its sequence
    big = rows[4]
    mates = [r for r in rows.values()
             if r["seq_id"] == big["seq_id"] and r["doc_id"] != 4]
    assert big["tok_offset"] == 0 and not mates
    # every in-ctx sequence respects the budget
    by_seq = {}
    for r in rows.values():
        by_seq.setdefault(r["seq_id"], 0)
        by_seq[r["seq_id"]] += r["n_tokens"]
    for s, tot in by_seq.items():
        assert tot <= 8 or s == big["seq_id"]


def test_pack_sequences_deterministic_across_layouts(spark):
    from pyrope_spark.operators.curation import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (i % 7 + 1))) for i in range(60)],
        "doc_id long, text string",
    )
    key = lambda df: sorted(map(tuple, df.collect()))
    a = pack_sequences(docs, ctx_tokens=16, n_shards=4)
    b = pack_sequences(docs.repartition(13), ctx_tokens=16, n_shards=4)
    assert key(a) == key(b)


def test_cluster_balanced_sample_flattens_and_is_deterministic(spark):
    """Head cluster shrinks toward target in expectation, tail cluster kept
    whole (rate 1 exact, not probabilistic); byte-identical across layouts."""
    import numpy as np

    from pyrope_spark.operators.curation import cluster_balanced_sample
    from pyrope_spark.operators.ivf import IvfModel

    rng = np.random.default_rng(5)
    rows = []
    for i in range(400):  # head cluster near origin
        rows.append((i, [float(x) for x in rng.normal(0, 0.05, 4)]))
    for i in range(400, 420):  # tail cluster near (10,10,10,10)
        rows.append((i, [float(x) for x in 10 + rng.normal(0, 0.05, 4)]))
    df = spark.createDataFrame(rows, "id long, vector array<double>")
    model = IvfModel(
        centroids=np.array([[0.0] * 4, [10.0] * 4]), metric="l2", nlist=2
    )
    out = cluster_balanced_sample(df, model, 50, id_col="id").cache()
    got = {r["id"]: r for r in out.collect()}
    assert len(got) == 420
    head_kept = sum(1 for r in got.values() if r["cluster_id"] == 0 and r["kept"])
    tail = [r for r in got.values() if r["cluster_id"] == 1]
    assert all(r["kept"] for r in tail) and len(tail) == 20  # rate 1 -> all
    assert got[0]["cluster_size"] == 400
    # Bernoulli(50/400) over 400 rows: 3-sigma band around 50
    assert 20 <= head_kept <= 80
    b = cluster_balanced_sample(df.repartition(7), model, 50, id_col="id")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, b.collect()))


def test_build_vocab_rank_and_ties(spark):
    from pyrope_spark.operators.curation import build_vocab

    docs = spark.createDataFrame(
        [(1, "b b b a a c c z")], "doc_id long, text string"
    )
    v = {r.term: (r.token_id, r["count"]) for r in build_vocab(docs).collect()}
    assert v["b"] == (1, 3)
    # a/c tie at count 2 -> term asc: a before c
    assert v["a"] == (2, 2) and v["c"] == (3, 2)
    assert v["z"] == (4, 1)
    # min_count prunes; max_size cuts after ranking
    v2 = {r.term for r in build_vocab(docs, min_count=2).collect()}
    assert v2 == {"a", "b", "c"}
    v3 = {r.term for r in build_vocab(docs, max_size=2).collect()}
    assert v3 == {"b", "a"}


def test_tokens_to_ids_positions_and_oov(spark):
    from pyrope_spark.operators.curation import build_vocab, tokens_to_ids

    train = spark.createDataFrame([(1, "x y x")], "doc_id long, text string")
    vocab = build_vocab(train)  # x=1, y=2
    docs = spark.createDataFrame([(7, "y x zzz y")], "doc_id long, text string")
    rows = sorted(tokens_to_ids(docs, vocab).collect(), key=lambda r: r.pos)
    assert [(r.pos, r.token_id) for r in rows] == [(0, 2), (1, 1), (2, 0), (3, 2)]


def test_temperature_mix_weights_properties(spark):
    from pyrope_spark.operators.curation import temperature_mix_weights

    docs = spark.createDataFrame(
        [(i, "w " * (90 if i < 9 else 10), "en" if i < 9 else "rare")
         for i in range(10)],
        "doc_id long, text string, lang string",
    )
    # T=1: natural distribution, every weight 1
    nat = {r["stratum"]: r for r in
           temperature_mix_weights(docs, temperature=1.0).collect()}
    assert abs(nat["en"]["weight"] - 1.0) < 1e-6
    assert abs(nat["rare"]["weight"] - 1.0) < 1e-6
    # T=0.5: tail stratum upweighted, head downweighted; targets sum to 1
    t5 = {r["stratum"]: r for r in
          temperature_mix_weights(docs, temperature=0.5).collect()}
    assert t5["rare"]["weight"] > 1.0 > t5["en"]["weight"]
    assert abs(sum(r["target_frac"] for r in t5.values()) - 1.0) < 1e-5
    # temperature must be positive
    import pytest

    with pytest.raises(ValueError):
        temperature_mix_weights(docs, temperature=0.0)


# ---------------------------------------------------------------- domain cap

def test_domain_cap_bounds_and_determinism(spark):
    from pyrope_spark.operators.curation import domain_cap

    rows = [(i, f"d{i % 3}") for i in range(90)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_cap(docs, 5).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append((r["rank"], r["doc_id"]))
    assert set(by_dom) == {"d0", "d1", "d2"}
    assert all(len(v) == 5 for v in by_dom.values())
    assert all(sorted(r for r, _ in v) == [1, 2, 3, 4, 5] for v in by_dom.values())
    # repeated run picks the identical subset (hash rank, no RNG state)
    again = domain_cap(docs, 5).collect()
    assert sorted((r["doc_id"], r["rank"]) for r in out) == sorted(
        (r["doc_id"], r["rank"]) for r in again
    )
    # repartitioned layout picks the identical subset too
    relay = domain_cap(docs.repartition(7), 5).collect()
    assert sorted((r["doc_id"], r["rank"]) for r in out) == sorted(
        (r["doc_id"], r["rank"]) for r in relay
    )


def test_domain_cap_small_domain_kept_whole(spark):
    from pyrope_spark.operators.curation import domain_cap

    docs = spark.createDataFrame(
        [(1, "big")] + [(i, "big") for i in range(2, 30)] + [(99, "tiny")],
        "doc_id long, source string",
    )
    out = domain_cap(docs, 10)
    counts = {r["domain"]: r["n"] for r in out.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()}
    assert counts == {"big": 10, "tiny": 1}


def test_domain_cap_quality_order(spark):
    from pyrope_spark.operators.curation import domain_cap

    docs = spark.createDataFrame(
        [(i, "d", float(i)) for i in range(20)],
        "doc_id long, source string, quality double",
    )
    out = domain_cap(docs, 3, quality_col="quality").collect()
    # highest-quality docs win, rank follows quality desc
    assert sorted(r["doc_id"] for r in out) == [17, 18, 19]
    assert {r["doc_id"]: r["rank"] for r in out} == {19: 1, 18: 2, 17: 3}


def test_domain_cap_invalid(spark):
    import pytest

    from pyrope_spark.operators.curation import domain_cap

    docs = spark.createDataFrame([(1, "d")], "doc_id long, source string")
    with pytest.raises(ValueError, match="cap"):
        domain_cap(docs, 0)


def test_corpus_diff_statuses(spark):
    from pyrope_spark.operators.curation import corpus_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "beta"), (3, "GAMMA changed"), (4, "delta")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_corpus_diff_normalization_invariant(spark):
    """Case/whitespace changes are NOT 'changed' (fingerprint normalizes)."""
    from pyrope_spark.operators.curation import corpus_diff

    old = spark.createDataFrame([(1, "Hello World ")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "  hello world")], "doc_id long, text string")
    assert corpus_diff(old, new).collect()[0]["status"] == "unchanged"


def test_compression_ratio_separates_template_from_random(spark):
    from pyrope_spark.operators.curation import compression_ratio

    import random

    random.seed(7)
    template = "click here to buy now " * 50                     # compresses hard
    natural = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "in spain falls mainly on the plain and every sentence adds "
        "a little new content to the mix "
    ) * 8
    gibberish = "".join(
        random.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(1000)
    )
    df = spark.createDataFrame(
        [(1, template), (2, natural), (3, gibberish), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert rows[1]["compression_ratio"] < 0.1          # template
    assert rows[3]["compression_ratio"] > 0.6          # gibberish
    assert rows[1]["compression_ratio"] < rows[2]["compression_ratio"] < rows[3]["compression_ratio"]
    assert rows[4]["compression_ratio"] is None and rows[5]["compression_ratio"] is None
    # deterministic across runs/layouts
    again = {r["doc_id"]: r["n_compressed"]
             for r in compression_ratio(df.repartition(3)).collect()}
    assert again == {k: v["n_compressed"] for k, v in rows.items()}


def test_write_token_shards_roundtrip_and_determinism(spark, tmp_path):
    from pyrope_spark.operators.curation import (
        build_vocab,
        read_token_shards,
        write_token_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma w{i % 7} delta") for i in range(40)],
        "doc_id long, text string",
    )
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    m1 = write_token_shards(docs, p1, ctx_tokens=16, n_shards=3)
    m2 = write_token_shards(docs.repartition(9), p2, ctx_tokens=16, n_shards=3)
    assert m1 == m2  # byte-identical across layouts (crc32 included)
    shards = read_token_shards(p1)
    assert set(shards) == {0, 1, 2}
    total_seqs = sum(m["n_seqs"] for m in m1)
    assert all(mat.shape[1] == 16 for mat in shards.values())
    assert sum(mat.shape[0] for mat in shards.values()) == total_seqs
    # every doc contributes 5 tokens; non-pad count must equal 40 * 5
    nonpad = sum(int((mat != 0).sum()) for mat in shards.values())
    vocab_terms = {r["term"] for r in build_vocab(docs).collect()}
    assert "alpha" in vocab_terms
    assert nonpad == 40 * 5


def test_read_token_shards_detects_corruption(spark, tmp_path):
    import os

    import pytest

    from pyrope_spark.operators.curation import read_token_shards, write_token_shards

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f")], "doc_id long, text string"
    )
    p = str(tmp_path / "s3")
    write_token_shards(docs, p, ctx_tokens=8, n_shards=1)
    fn = next(f for f in os.listdir(p) if f.endswith(".bin"))
    with open(os.path.join(p, fn), "r+b") as f:
        f.seek(0)
        f.write(b"\xff")
    with pytest.raises(IOError, match="manifest verification"):
        read_token_shards(p)


def test_write_token_shards_truncates_oversize_docs(spark, tmp_path):
    from pyrope_spark.operators.curation import read_token_shards, write_token_shards

    long_text = " ".join(f"t{i}" for i in range(30))   # 30 tokens > ctx 8
    docs = spark.createDataFrame(
        [(1, long_text), (2, "a b c")], "doc_id long, text string"
    )
    p = str(tmp_path / "ovs")
    m = write_token_shards(docs, p, ctx_tokens=8, n_shards=1)
    shards = read_token_shards(p)
    mat = shards[0]
    assert mat.shape[1] == 8
    # the oversize doc's sequence is full (8 kept ids), no crash, no overflow
    assert (mat != 0).sum(axis=1).max() == 8


def test_pipeline_demo_end_to_end(spark):
    """The composition script survives as stages evolve (it caught a real
    oversize-doc writer crash when first run)."""
    import sys
    import tempfile

    sys.path.insert(0, "/root/repo/scripts")
    from pipeline_demo import run

    stats = run(spark, "/root/testdata/sf0.001", tempfile.mkdtemp(prefix="dm_"))
    assert stats["raw"] > 0
    assert stats["after_near_dedup"] <= stats["after_exact_dedup"] <= stats["raw"]
    assert stats["after_domain_cap"] <= stats["after_quality_gate"]
    assert stats["shards"] >= 1 and stats["sequences"] >= 1


def test_gumbel_topk_weighted_and_deterministic(spark):
    from pyrope_spark.operators.curation import weighted_gumbel_topk

    import math

    # two weight classes: heavy (log 3 ~ w=e^3) vs light (log 0)
    rows = [(i, 3.0 if i < 50 else 0.0) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, lw double")
    out = weighted_gumbel_topk(df, 60, weight_log_col="lw")
    ids = [r["doc_id"] for r in out.collect()]
    assert len(ids) == 60
    heavy = sum(1 for i in ids if i < 50)
    # heavy docs are e^3 ~ 20x likelier: without-replacement expectation is
    # ~38-42 of the 50 in a top-60 draw (vs 6 unweighted); deterministic
    # seed measures 38
    assert heavy >= 35
    again = [r["doc_id"] for r in weighted_gumbel_topk(
        df.repartition(7), 60, weight_log_col="lw"
    ).collect()]
    assert ids == again  # layout-independent


def test_gumbel_topk_null_weights_excluded(spark):
    from pyrope_spark.operators.curation import weighted_gumbel_topk

    df = spark.createDataFrame(
        [(1, 0.0), (2, None), (3, 0.0)], "doc_id long, lw double"
    )
    ids = {r["doc_id"] for r in weighted_gumbel_topk(
        df, 3, weight_log_col="lw"
    ).collect()}
    assert ids == {1, 3}


def test_train_val_test_split_deterministic_and_proportional(spark):
    """Split labels are layout-independent (same under repartition),
    proportions track weights, and membership is a pure function of id."""
    from pyrope_spark.operators.curation import train_val_test_split

    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: r["split"]
           for r in train_val_test_split(df, id_col="doc_id").collect()}
    out2 = {r["doc_id"]: r["split"]
            for r in train_val_test_split(
                df.repartition(13), id_col="doc_id").collect()}
    assert out == out2
    from collections import Counter

    c = Counter(out.values())
    assert 0.75 < c["train"] / 5000 < 0.85
    assert 0.07 < c["val"] / 5000 < 0.13
    assert 0.07 < c["test"] / 5000 < 0.13
    # different seed -> different membership (not a constant function)
    out3 = {r["doc_id"]: r["split"]
            for r in train_val_test_split(
                df, id_col="doc_id", seed="other").collect()}
    assert out3 != out


def test_curriculum_order_stages_monotone_in_score(spark):
    """Stages partition ascending difficulty; curriculum_rank serves stage
    1 fully before stage 2; within-stage order is a deterministic shuffle
    (not score order)."""
    from pyrope_spark.operators.curation import curriculum_order

    import pyspark.sql.functions as F

    df = spark.range(400).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7 % 400).alias("score")
    )
    rows = curriculum_order(df, score_col="score", n_stages=4).collect()
    by_id = {r["doc_id"]: r for r in rows}
    scores = {r["doc_id"]: (r["doc_id"] * 7) % 400 for r in rows}
    # every stage-1 score <= every stage-2 score, etc.
    import itertools

    for a, b in itertools.combinations(range(1, 5), 2):
        max_a = max(scores[i] for i, r in by_id.items() if r["stage"] == a)
        min_b = min(scores[i] for i, r in by_id.items() if r["stage"] == b)
        assert max_a <= min_b
    # ranks 1..100 are exactly stage 1, etc.
    ranked = sorted(rows, key=lambda r: r["curriculum_rank"])
    assert [r["stage"] for r in ranked] == sorted(r["stage"] for r in rows)
    # within stage 1, serving order is not simply score order
    s1 = [r for r in ranked if r["stage"] == 1]
    s1_scores = [scores[r["doc_id"]] for r in s1]
    assert s1_scores != sorted(s1_scores)


def test_cdc_chunks_reassemble_and_resync_after_edit(spark):
    """CDC property tests: chunks reassemble to the exact input, and a
    prefix insertion leaves the downstream chunks byte-identical (the
    boundary-resynchronization property fixed-size chunking lacks)."""
    from pyrope_spark.operators.curation import cdc_chunk_documents

    base = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
            "eiusmod tempor incididunt ut labore et dolore magna aliqua ut "
            "enim ad minim veniam quis nostrud exercitation ullamco laboris")
    docs = spark.createDataFrame(
        [(1, base), (2, "EDITED " + base), (3, "tiny"), (4, "")],
        "doc_id long, text string",
    )
    rows = cdc_chunk_documents(docs).collect()
    chunks = {}
    for r in rows:
        chunks.setdefault(r["doc_id"], []).append(
            (r["chunk_no"], r["chunk_start"], r["chunk_text"])
        )
    # exact reassembly, contiguous starts
    for did, text in [(1, base), (2, "EDITED " + base), (3, "tiny")]:
        cs = sorted(chunks[did])
        assert "".join(t for _, _, t in cs) == text
        pos = 1
        for _, st, t in cs:
            assert st == pos
            pos += len(t)
    assert 4 not in chunks  # empty doc -> no chunks
    # resync: chunk lists share a suffix after the edit
    t1 = [t for _, _, t in sorted(chunks[1])]
    t2 = [t for _, _, t in sorted(chunks[2])]
    shared = 0
    while (shared < min(len(t1), len(t2))
           and t1[-1 - shared] == t2[-1 - shared]):
        shared += 1
    assert shared >= 1
    # fixed-size chunking would shift everything: verify CDC kept most
    # of the unedited tail
    assert sum(len(t) for t in t1[-shared:]) >= len(base) // 3


def test_cdc_arrow_expr_parity(spark):
    """The r10 vectorized CDC kernel must select the exact cut positions
    and chunk bytes of the expression/oracle path — same discipline as
    the winnowing mode parity test (exact int64 Horner over codepoints)."""
    import random

    from pyrope_spark.operators.curation import cdc_chunk_documents

    rng = random.Random(1234)
    texts = [
        (i, "".join(rng.choice("abcdef gh") for _ in range(rng.randrange(0, 300))))
        for i in range(80)
    ]
    texts += [(200, "x" * 7), (201, "y" * 8), (202, ""), (203, "short one")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    expr = {
        (r["doc_id"], r["chunk_no"], r["chunk_start"], r["chunk_text"])
        for r in cdc_chunk_documents(docs, mode="expr").collect()
    }
    arrow = {
        (r["doc_id"], r["chunk_no"], r["chunk_start"], r["chunk_text"])
        for r in cdc_chunk_documents(docs, mode="arrow").collect()
    }
    assert arrow == expr


# ------------------------------------------------ blocklist phrase filter

def test_blocklist_finds_all_occurrences(spark):
    from pyrope_spark.operators.curation import blocklist_phrase_matches

    docs = spark.createDataFrame(
        [
            (1, "the bad phrase here and the bad phrase again"),
            (2, "clean text with nothing listed"),
            (3, "BAD PHRASE uppercase start bad phrase end"),
            (4, "bad alone is fine, phrase alone is fine"),
        ],
        "doc_id long, text string",
    )
    phrases = spark.createDataFrame(
        [(100, "bad phrase"), (200, "nothing listed")],
        "phrase_id long, phrase string",
    )
    got = {
        (r["doc_id"], r["phrase_id"], r["token_pos"])
        for r in blocklist_phrase_matches(docs, phrases).collect()
    }
    assert got == {
        (1, 100, 2), (1, 100, 7),     # both occurrences
        (3, 100, 1), (3, 100, 5),     # case-folded
        (2, 200, 4),
    }


def test_blocklist_no_partial_or_spanning_matches(spark):
    from pyrope_spark.operators.curation import blocklist_phrase_matches

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    phrases = spark.createDataFrame(
        [(1, "beta gamma delta"),   # longer than remaining doc -> no match
         (2, "gamma"),              # single-token phrase matches
         (3, "")],                  # empty phrase dropped, never matches
        "phrase_id long, phrase string",
    )
    got = {(r["phrase_id"], r["token_pos"])
           for r in blocklist_phrase_matches(docs, phrases).collect()}
    assert got == {(2, 3)}


def test_winsorize_exact_bounds_and_flags(spark):
    """100-value key: p1/p99 nearest-rank(ceil) bounds == ranks 1 and 99;
    only the extremes clip; inner values untouched."""
    from pyrope_spark.operators.curation import winsorize

    rows = [("a", i, float(i + 1)) for i in range(100)]  # values 1..100
    df = spark.createDataFrame(rows, "k string, id long, value double")
    out = {r["id"]: r for r in winsorize(df, "k", "value", "id").collect()}
    # nearest-rank ceil: lo = value at rank ceil(100*0.01)=1 -> 1.0;
    # hi = rank 99 -> 99.0; so only value 100 clips down to 99
    assert out[99]["clipped_micro"] == 99_000_000 and out[99]["was_clipped"]
    assert not out[0]["was_clipped"] and out[0]["clipped_micro"] == 1_000_000
    assert not out[50]["was_clipped"]
    assert sum(1 for r in out.values() if r["was_clipped"]) == 1


def test_greedy_token_cover_picks_and_stops(spark):
    """Greedy picks the max-gain doc each round with smallest-id ties,
    counts only NEW units, and stops when coverage is complete."""
    from pyrope_spark.operators.curation import greedy_token_cover

    docs = [
        (1, "a b c d"),        # 4 tokens
        (2, "a b"),            # subset of 1
        (3, "e f g"),          # 3 new
        (4, "c d e"),          # overlaps both
        (5, "h"),              # 1 new
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = greedy_token_cover(df, rounds=10, unit="token").collect()
    picks = [(r["round"], r["doc_id"], r["new_tokens_covered"]) for r in out]
    # round 1: doc 1 (4) ; round 2: doc 3 (3) ; round 3: doc 5 (1);
    # then everything is covered -> stop (no round 4)
    assert picks == [(1, 1, 4), (2, 3, 3), (3, 5, 1)]


def test_target_encode_loo_closed_form_and_prior(spark):
    from pyrope_spark.operators.curation import target_encode_loo

    # cat A: labels 1,0,1 (sum 3... sum=2,n=3); cat B: label 1 (singleton)
    rows = [(1, "A", 1), (2, "A", 0), (3, "A", 1), (4, "B", 1)]
    df = spark.createDataFrame(rows, "event_id long, cat string, lbl int")
    out = {
        r["event_id"]: r["enc_micro"]
        for r in target_encode_loo(
            df, cat_col="cat", label_col="lbl", id_cols=("event_id",)
        ).collect()
    }
    gs, gn = 3, 4  # global sum/count
    # row 1 (A, lbl=1): ((2-1)*4 + 3) * 1e6 // (3*4)
    assert out[1] == ((2 - 1) * gn + gs) * 1_000_000 // (3 * gn)
    assert out[2] == ((2 - 0) * gn + gs) * 1_000_000 // (3 * gn)
    # singleton B encodes to exactly the global prior
    assert out[4] == gs * 1_000_000 // gn


def test_target_encode_loo_drops_null_category(spark):
    from pyrope_spark.operators.curation import target_encode_loo

    df = spark.createDataFrame(
        [(1, "A", 1), (2, None, 0)], "event_id long, cat string, lbl int"
    )
    out = target_encode_loo(
        df, cat_col="cat", label_col="lbl", id_cols=("event_id",)
    ).collect()
    assert [r["event_id"] for r in out] == [1]


# --------------------------------------------------------------------------
# Feature hashing (operators/features.py)
# --------------------------------------------------------------------------


def test_hashed_features_unsigned_conserves_counts(spark):
    from pyrope_spark.operators.features import hashed_features

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha gamma"), (2, "delta delta")],
        "doc_id long, text string",
    )
    out = hashed_features(docs, dim=4096, signed=False).collect()
    per_doc = {}
    for r in out:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["feat_val"]
        assert 0 <= r["bucket"] < 4096
        assert r["feat_val"] > 0
    assert per_doc == {1: 4, 2: 2}


def test_hashed_features_same_token_same_bucket(spark):
    from pyrope_spark.operators.features import hashed_features

    docs = spark.createDataFrame(
        [(1, "shared"), (2, "shared"), (3, "other")],
        "doc_id long, text string",
    )
    out = hashed_features(docs, dim=1024).collect()
    buckets = {r["doc_id"]: (r["bucket"], r["feat_val"]) for r in out}
    assert buckets[1] == buckets[2]
    # signed value of a single-occurrence token is +-1
    assert abs(buckets[1][1]) == 1 and abs(buckets[3][1]) == 1


def test_hashed_features_signed_magnitude_and_layout(spark):
    from pyrope_spark.operators.features import hashed_features

    docs = spark.createDataFrame(
        [(1, " ".join(["tok"] * 7))], "doc_id long, text string"
    )
    r = hashed_features(docs, dim=64).collect()
    assert len(r) == 1 and abs(r[0]["feat_val"]) == 7

    big = spark.createDataFrame(
        [(i, f"w{i % 13} w{(i * 3) % 13} common") for i in range(50)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, hashed_features(big, dim=128).collect()))
    b = sorted(map(tuple, hashed_features(big.repartition(7), dim=128).collect()))
    assert a == b


def test_hashed_features_dim_guard(spark):
    import pytest as _pytest

    from pyrope_spark.operators.features import hashed_features

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        hashed_features(docs, dim=1)


# --------------------------------------------------------------------------
# Distributed global rank + quantile normalization
# --------------------------------------------------------------------------


def test_global_rank_equals_window_formulation(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pyrope_spark.operators.curation import global_rank

    df = spark.createDataFrame(
        [(i * 37 % 101, i) for i in range(500)], "v long, id long"
    ).repartition(13)
    got = global_rank(df, order_cols=("v", "id"))
    want = df.withColumn(
        "grank",
        F.row_number().over(Window.orderBy("v", "id")).cast("long"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_quantile_normalize_identical_groups_are_identity(spark):
    from pyrope_spark.operators.curation import quantile_normalize

    # two groups with IDENTICAL value multisets: mapping is the identity
    rows = [(i, "a", v) for i, v in enumerate([10, 20, 30, 40])]
    rows += [(i + 10, "b", v) for i, v in enumerate([10, 20, 30, 40])]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = quantile_normalize(df).collect()
    assert all(r["norm_value"] == r["n_chars"] for r in out)


def test_quantile_normalize_aligns_shifted_group(spark):
    from pyrope_spark.operators.curation import quantile_normalize

    # group b = group a + 1000: after normalization both groups carry the
    # SAME value multiset (drawn from the pooled order statistics)
    rows = [(i, "a", v) for i, v in enumerate([1, 2, 3, 4, 5])]
    rows += [(i + 10, "b", v + 1000) for i, v in enumerate([1, 2, 3, 4, 5])]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = quantile_normalize(df).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["norm_value"])
    assert sorted(by_src["a"]) == sorted(by_src["b"])
    # rank order within each group is preserved
    a_rows = sorted(
        (r for r in out if r["source"] == "a"), key=lambda r: r["n_chars"]
    )
    assert [r["norm_value"] for r in a_rows] == sorted(
        r["norm_value"] for r in a_rows
    )


# --------------------------------------------------------------------------
# vocab_coverage_curve + nucleus_select_by_quality (round-6 session-5)
# --------------------------------------------------------------------------


def test_vocab_coverage_closed_form(spark):
    from pyrope_spark.operators.curation import vocab_coverage_curve

    docs = spark.createDataFrame(
        [(1, "a a a a b b c d")], "doc_id LONG, text STRING"
    )
    out = {r.k: r for r in vocab_coverage_curve(docs, ks=(1, 2, 4)).collect()}
    # freqs: a=4, b=2, c=1, d=1; total 8 tokens, 4 types
    assert out[1].covered_tokens == 4
    assert out[2].covered_tokens == 6
    assert out[4].covered_tokens == 8
    assert all(r.total_tokens == 8 and r.total_types == 4 for r in out.values())
    assert out[1].coverage_ppm == 500_000
    assert out[4].coverage_ppm == 1_000_000


def test_vocab_coverage_rank_ties_by_term(spark):
    from pyrope_spark.operators.curation import vocab_coverage_curve

    # freq tie between 'aa' and 'zz' -> rank 1 goes to 'aa' (term asc)
    docs = spark.createDataFrame([(1, "zz aa")], "doc_id LONG, text STRING")
    out = {r.k: r for r in vocab_coverage_curve(docs, ks=(1,)).collect()}
    assert out[1].covered_tokens == 1


def test_nucleus_selection_closed_form(spark):
    from pyrope_spark.operators.curation import nucleus_select_by_quality

    # group g: qualities 50, 30, 20 (total 100). p=0.8:
    # keep 50 (cum_prev 0), keep 30 (cum_prev 50), DROP 20 (cum_prev 80,
    # 80*1e6 not < 800000*100)
    df = spark.createDataFrame(
        [(1, "g", 50), (2, "g", 30), (3, "g", 20)],
        "doc_id LONG, source STRING, quality LONG",
    )
    out = nucleus_select_by_quality(
        df, group_col="source", quality_col="quality", id_col="doc_id",
        p_ppm=800_000,
    ).collect()
    assert {r.doc_id for r in out} == {1, 2}
    ranks = {r.doc_id: r.rank_in_group for r in out}
    assert ranks == {1: 1, 2: 2}


def test_nucleus_crossing_row_included_and_group_isolation(spark):
    from pyrope_spark.operators.curation import nucleus_select_by_quality

    # group a: uniform 10x10 -> p=0.85 keeps 9 rows (cum_prev of row 9
    # is 80 < 85; row 10's cum_prev 90 >= 85)
    rows = [(i, "a", 10) for i in range(10)]
    # group b: one dominant row -> keeps just it
    rows += [(100, "b", 99), (101, "b", 1)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, quality LONG")
    out = nucleus_select_by_quality(
        df, group_col="source", quality_col="quality", id_col="doc_id",
        p_ppm=850_000,
    ).collect()
    a = [r for r in out if r.source == "a"]
    b = [r for r in out if r.source == "b"]
    assert len(a) == 9
    assert [r.doc_id for r in b] == [100]


def test_strided_chunks_overlap_and_tail(spark):
    from pyrope_spark.operators.curation import chunk_documents_strided

    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")], "doc_id LONG, text STRING"
    )
    out = sorted(
        chunk_documents_strided(docs, chunk_tokens=6, stride=4).collect(),
        key=lambda r: r.chunk_idx,
    )
    # starts 0, 4, 8 (start < 10): windows [0:6), [4:10), [8:10)
    assert [(r.start_token, r.chunk_n_tokens) for r in out] == [
        (0, 6), (4, 6), (8, 2),
    ]
    assert out[0].chunk_text.endswith("t5")
    assert out[1].chunk_text == "t4 t5 t6 t7 t8 t9"
    assert out[2].chunk_text == "t8 t9"
    # every token appears in at least one chunk; overlap region in two
    joined = " ".join(r.chunk_text for r in out).split()
    assert set(joined) == {f"t{i}" for i in range(10)}
    assert joined.count("t4") == 2


def test_strided_chunks_guards_and_empty(spark):
    import pytest

    from pyrope_spark.operators.curation import chunk_documents_strided

    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "one")], "doc_id LONG, text STRING"
    )
    out = chunk_documents_strided(docs, chunk_tokens=4, stride=2).collect()
    assert [(r.doc_id, r.chunk_text) for r in out] == [(3, "one")]
    with pytest.raises(ValueError):
        chunk_documents_strided(docs, chunk_tokens=4, stride=0)


def test_global_rank_stable_on_aggregate_input(spark):
    """Regression (round-6 session-5): with an upstream AGGREGATE input,
    repartitionByRange's boundary sampling could differ between the
    offsets job and the final join, yielding duplicate/gapped ranks.
    The eager localCheckpoint pins one partitioning for both."""
    from pyspark.sql import functions as F

    from pyrope_spark.operators.curation import global_rank

    base = (
        spark.range(20_000)
        .select((F.col("id") % 7919).alias("k"), F.col("id").alias("v"))
        .groupBy("k")
        .agg(F.sum("v").cast("long").alias("vm"))
        .select(F.col("k").alias("id"), "vm")
    )
    r = global_rank(base, order_cols=("vm", "id"))
    stats = r.agg(
        F.count("*").alias("n"),
        F.countDistinct("grank").alias("d"),
        F.min("grank").alias("lo"),
        F.max("grank").alias("hi"),
    ).collect()[0]
    assert stats.n == stats.d == stats.hi == 7919 and stats.lo == 1


def test_global_rank_known_rows_shortcut_parity(spark):
    """r10: the small-input shortcut (known_rows below the bound) must
    return the identical ranks and dtype as the distributed path."""
    from pyrope_spark.operators.curation import global_rank

    df = spark.createDataFrame(
        [(i * 53 % 97, i) for i in range(400)], "v long, id long"
    ).repartition(7)
    full = sorted(map(tuple, global_rank(df, order_cols=("v", "id")).collect()))
    fast = global_rank(df, order_cols=("v", "id"), known_rows=400)
    assert dict(fast.dtypes)["grank"] == "bigint"
    assert sorted(map(tuple, fast.collect())) == full
