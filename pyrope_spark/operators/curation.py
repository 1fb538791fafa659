"""Training-data curation operators: repetition filters, chunking,
PII scrubbing, deterministic sampling, incremental dedup, mixture weights.

These extend the reference's data-quality surface (the reference stops at
payload parsing + dedup; see SURVEY.md §2.7) with the operations a
large-scale pretraining pipeline runs between raw text and tokenized
shards. Everything is declarative DataFrame code — explode/groupBy shapes
that partial-aggregate map-side and shuffle on (doc_id[, ngram]) keys, so
they scale by adding executors; no Python UDFs anywhere on these paths.

Design notes per operator (100 TB framing):

- ``repetition_stats`` (Gopher-style repetition rules, cf. Rae et al. 2021
  "Scaling Language Models" §A1.1): explode word n-grams, two hash
  aggregations keyed by (doc_id, ngram) then doc_id. Spark partial
  aggregation collapses per-partition duplicates before the shuffle, so
  wire volume ≈ distinct (doc, ngram) pairs, not token count.
- ``chunk_documents``: pure expression pipeline (split → slice → explode);
  zero shuffles, runs entirely inside the scan stage.
- ``pii_scrub``: regexp_replace chains, whole-stage codegen, zero shuffles.
- ``stratified_hash_sample``: deterministic md5-threshold sampling — a
  reproducible Bernoulli per (seed, doc_id) with per-stratum rates; no
  shuffle, no RNG state, re-runs give byte-identical samples (the property
  training-data pipelines need for auditability).
- ``dedup_against_index``: anti-join of the incoming batch's fingerprints
  against the already-ingested corpus index — the incremental form of
  exact dedup (only the delta is re-fingerprinted; the index side is a
  parquet scan of precomputed fingerprints at steady state).
- ``corpus_mix_weights``: per-stratum token totals → resampling weights to
  hit a target mixture; one aggregation plus a broadcast of the (tiny)
  per-stratum table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyrope_spark.functions.text import tokens, tokens_sql, word_ngrams_from_tokens

# --------------------------------------------------------------- repetition

def repetition_stats(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 2,
    top_frac_limit: float = 0.20,
    dup_frac_limit: float = 0.50,
) -> DataFrame:
    """Per-document n-gram repetition statistics + a keep/drop flag.

    Columns: ``n_tokens``, ``n_ngrams``, ``top_ngram_frac`` (share of the
    most frequent n-gram among all n-gram occurrences), ``dup_ngram_frac``
    (share of occurrences beyond each n-gram's first), ``is_repetitive``
    (either fraction over its limit). The thresholds default to the
    Gopher-style rules (top-2-gram 0.20, dup fraction as the analog of
    dup-line limits).
    """
    toks = docs.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("_t"),
    ).select(
        id_col,
        F.size("_t").alias("n_tokens"),
        word_ngrams_from_tokens(F.col("_t"), ngram_n).alias("_ngrams"),
    )
    exploded = toks.select(id_col, "n_tokens", F.explode_outer("_ngrams").alias("_g"))
    per_gram = exploded.groupBy(id_col, "n_tokens", "_g").agg(F.count("*").alias("_c"))
    agg = per_gram.groupBy(id_col, "n_tokens").agg(
        F.coalesce(F.sum(F.when(F.col("_g").isNotNull(), F.col("_c"))), F.lit(0)).alias(
            "n_ngrams"
        ),
        F.coalesce(F.max(F.when(F.col("_g").isNotNull(), F.col("_c"))), F.lit(0)).alias(
            "_top"
        ),
        F.coalesce(
            F.sum(F.when(F.col("_g").isNotNull(), F.col("_c") - 1)), F.lit(0)
        ).alias("_dup"),
    )
    return agg.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.round(
            F.when(F.col("n_ngrams") > 0, F.col("_top") / F.col("n_ngrams")).otherwise(
                0.0
            ),
            6,
        ).alias("top_ngram_frac"),
        F.round(
            F.when(F.col("n_ngrams") > 0, F.col("_dup") / F.col("n_ngrams")).otherwise(
                0.0
            ),
            6,
        ).alias("dup_ngram_frac"),
        (
            (
                F.when(
                    F.col("n_ngrams") > 0, F.col("_top") / F.col("n_ngrams")
                ).otherwise(0.0)
                > top_frac_limit
            )
            | (
                F.when(
                    F.col("n_ngrams") > 0, F.col("_dup") / F.col("n_ngrams")
                ).otherwise(0.0)
                > dup_frac_limit
            )
        ).alias("is_repetitive"),
    )


def repetition_stats_oracle_sql(
    *,
    ngram_n: int = 2,
    top_frac_limit: float = 0.20,
    dup_frac_limit: float = 0.50,
    table: str = "documents",
) -> str:
    """DuckDB rendering of :func:`repetition_stats` (same thresholds)."""
    return f"""
WITH tk AS (
  SELECT doc_id, {tokens_sql('text')} AS t FROM {table}
), ng AS (
  SELECT doc_id, len(t) AS n_tokens,
         CASE WHEN len(t) < {ngram_n} THEN []
              ELSE list_transform(range(0, len(t) - {ngram_n} + 1),
                                  i -> array_to_string(t[i + 1 : i + {ngram_n}], ' '))
         END AS grams
  FROM tk
), ex AS (
  SELECT doc_id, n_tokens, unnest(grams) AS g FROM ng
), per AS (
  SELECT doc_id, n_tokens, g, COUNT(*) AS c FROM ex GROUP BY 1, 2, 3
), agg AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(c), 0) AS n_ngrams,
         COALESCE(MAX(c), 0) AS top_c,
         COALESCE(SUM(c - 1), 0) AS dup_c
  FROM per GROUP BY 1, 2
), uni AS (
  -- docs whose gram list is empty drop out of the unnest; restore with zeros
  SELECT n.doc_id, n.n_tokens,
         COALESCE(a.n_ngrams, 0) AS n_ngrams,
         COALESCE(a.top_c, 0) AS top_c,
         COALESCE(a.dup_c, 0) AS dup_c
  FROM ng n LEFT JOIN agg a USING (doc_id)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_ngrams AS BIGINT) AS n_ngrams,
       round(CASE WHEN n_ngrams > 0 THEN CAST(top_c AS DOUBLE) / n_ngrams ELSE 0.0 END, 6)
         AS top_ngram_frac,
       round(CASE WHEN n_ngrams > 0 THEN CAST(dup_c AS DOUBLE) / n_ngrams ELSE 0.0 END, 6)
         AS dup_ngram_frac,
       (CASE WHEN n_ngrams > 0 THEN CAST(top_c AS DOUBLE) / n_ngrams ELSE 0.0 END)
           > {top_frac_limit}
       OR (CASE WHEN n_ngrams > 0 THEN CAST(dup_c AS DOUBLE) / n_ngrams ELSE 0.0 END)
           > {dup_frac_limit} AS is_repetitive
FROM uni
"""


# ----------------------------------------------------------------- chunking

def chunk_documents(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 16,
) -> DataFrame:
    """Split each document into fixed-size token chunks (training-sequence
    prep). Pure expression pipeline — split, slice, explode — so it runs
    inside the scan stage with zero shuffles at any corpus size. Documents
    with no tokens yield no chunks."""
    c = chunk_tokens
    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    chunks = toks.select(
        id_col,
        F.expr(
            f"CASE WHEN size(_t) = 0 THEN array() "
            f"ELSE transform(sequence(0, cast(ceil(size(_t) / {c}.0) AS INT) - 1), "
            f"i -> named_struct("
            f"'chunk_idx', cast(i AS BIGINT), "
            f"'chunk_n_tokens', cast(size(slice(_t, i * {c} + 1, {c})) AS BIGINT), "
            f"'chunk_text', array_join(slice(_t, i * {c} + 1, {c}), ' '))) END"
        ).alias("_chunks"),
    ).select(id_col, F.explode("_chunks").alias("_ch"))
    return chunks.select(
        id_col,
        F.col("_ch.chunk_idx").alias("chunk_idx"),
        F.col("_ch.chunk_n_tokens").alias("chunk_n_tokens"),
        F.col("_ch.chunk_text").alias("chunk_text"),
    )


def chunk_documents_oracle_sql(*, chunk_tokens: int = 16, table: str = "documents") -> str:
    c = chunk_tokens
    return f"""
WITH tk AS (
  SELECT doc_id, {tokens_sql('text')} AS t FROM {table}
), ch AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(len(t) / {c}.0) AS BIGINT))) AS chunk_idx,
         t
  FROM tk WHERE len(t) > 0
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(t[chunk_idx * {c} + 1 : chunk_idx * {c} + {c}]) AS BIGINT)
         AS chunk_n_tokens,
       array_to_string(t[chunk_idx * {c} + 1 : chunk_idx * {c} + {c}], ' ')
         AS chunk_text
FROM ch
"""


# ---------------------------------------------------------------- PII scrub

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9\- ]{6,}[0-9]"


def pii_scrub(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact email addresses and phone-like digit runs, reporting match
    counts. Both patterns are RE2-safe (no backtracking constructs), so the
    same regexes run under Spark's Java engine and DuckDB's RE2 — and at
    scale the whole operator is a codegen'd projection over the scan."""
    t = F.coalesce(F.col(text_col), F.lit(""))  # NULL text scrubs to ""
    # patterns go in as Column literals (not through the SQL parser, whose
    # string-literal unescaping would mangle \+ and \-)
    email = F.lit(EMAIL_RE)
    phone = F.lit(PHONE_RE)
    no_email = F.regexp_replace(t, email, F.lit("<EMAIL>"))
    return docs.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(t, email, F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, phone, F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(no_email, phone, F.lit("<PHONE>")).alias("scrubbed"),
    )


def pii_scrub_oracle_sql(*, text_expr: str = "text", table: str = "documents") -> str:
    text_expr = f"coalesce({text_expr}, '')"
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_extract_all({text_expr}, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(
           regexp_replace({text_expr}, '{EMAIL_RE}', '<EMAIL>', 'g'), '{PHONE_RE}'))
         AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace({text_expr}, '{EMAIL_RE}', '<EMAIL>', 'g'),
                      '{PHONE_RE}', '<PHONE>', 'g') AS scrubbed
FROM {table}
"""


# ------------------------------------------------------- deterministic sample

def _hex_threshold(rate: float) -> str:
    """md5-hex keep threshold for a Bernoulli(rate): the md5 of the sampling
    key is uniform over [0, 16^32); keep iff hex < threshold."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return "g"  # lexicographically above every hex digest -> keep all
    return format(int(rate * (1 << 128)), "032x")


def stratified_hash_sample(
    docs: DataFrame,
    rates: dict[str, float],
    *,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    seed: str = "s42",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff
    ``md5(seed|id) < threshold(stratum_rate)``. Reproducible across runs and
    cluster layouts (no RNG state, no partition dependence) — the property a
    training pipeline needs to re-derive the exact same corpus snapshot.
    Returns the kept rows (id, stratum)."""
    thr = F.lit(_hex_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == stratum, F.lit(_hex_threshold(rate))).otherwise(
            thr
        )
    h = F.md5(
        F.concat(F.lit(seed + "|"), F.col(id_col).cast("string")).cast("binary")
    )
    return docs.filter(h < thr).select(
        F.col(id_col), F.col(stratum_col).alias("stratum")
    )


def stratified_hash_sample_oracle_sql(
    rates: dict[str, float],
    *,
    stratum_col: str = "lang",
    seed: str = "s42",
    default_rate: float = 1.0,
    table: str = "documents",
) -> str:
    cases = " ".join(
        f"WHEN {stratum_col} = '{s}' THEN '{_hex_threshold(r)}'"
        for s, r in sorted(rates.items())
    )
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, {stratum_col} AS stratum
FROM {table}
WHERE md5('{seed}|' || CAST(doc_id AS VARCHAR))
      < CASE {cases} ELSE '{_hex_threshold(default_rate)}' END
"""


# ------------------------------------------------------ incremental dedup

def text_fingerprint(text_col: Column) -> Column:
    """Normalized-text content fingerprint (md5 of lower(trim(text)))."""
    return F.md5(F.lower(F.trim(text_col)).cast("binary"))


def dedup_against_index(
    batch: DataFrame,
    index_fps: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact dedup: drop batch docs whose content fingerprint
    already exists in the corpus index, then keep one doc (min id) per
    surviving fingerprint within the batch.

    ``index_fps`` carries a single ``fp`` column (precomputed at ingest
    time; at steady state this is a parquet scan, not a recompute). The
    batch side is typically ≪ the index side, so Spark plans the anti-join
    with the index shuffled once by fp — or, bucketed by fp, shuffle-free.
    """
    b = batch.withColumn("_fp", text_fingerprint(F.col(text_col)))
    fresh = b.join(
        index_fps.select(F.col("fp").alias("_fp")).distinct(), on="_fp", how="left_anti"
    )
    first = fresh.groupBy("_fp").agg(F.min(id_col).alias("_keep"))
    return (
        fresh.join(first, on="_fp")
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_fp", "_keep")
    )


# ----------------------------------------------------------- decontamination

def gram_rows(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 4,
    out_col: str = "_g",
    emit_empty: bool = True,
) -> DataFrame:
    """Exploded per-doc DISTINCT word ``ngram_n``-gram STRINGS — value-
    identical to ``select(id, explode_outer(array_distinct(
    word_ngrams_from_tokens(tokens(text), n))))``: same tokenizer
    (``tokens_py`` mirrors ``tokens()`` exactly, including the r11
    non-ASCII-whitespace fix), same ``' '``-joined gram text, per-doc
    first-seen dedup == ``array_distinct``.

    r11 opt (guide §4.2): the expression path builds every gram through
    the interpreted non-codegen HOF chain (``transform`` + ``concat_ws``
    over ``element_at`` + ``array_distinct`` per doc); this Arrow pass
    runs the same construction as plain Python string slicing per batch
    — the same trade the fp-family kernels made in r10, except the GRAM
    STRINGS themselves cross back (the consumers here count and join on
    exact gram text, which keeps the DuckDB string-gram oracle twin
    byte-identical — fingerprint transport would need a collision
    argument the oracle cannot replay).

    ``emit_empty=True`` mirrors ``explode_outer`` (a doc with no grams
    emits one NULL-gram row); ``False`` mirrors plain ``explode``.
    """
    from pyspark.sql import types as T

    from pyrope_spark.functions.text import tokens_py

    id_field = df.schema[id_col]
    schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField(out_col, T.StringType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            ids: list = []
            grams: list = []
            for i, text in zip(
                pdf[id_col].tolist(), pdf[text_col].tolist()
            ):
                toks = tokens_py(text)
                if len(toks) >= ngram_n:
                    seen = set()
                    row_grams = []
                    for j in range(len(toks) - ngram_n + 1):
                        g = " ".join(toks[j: j + ngram_n])
                        if g not in seen:
                            seen.add(g)
                            row_grams.append(g)
                    ids.extend([i] * len(row_grams))
                    grams.extend(row_grams)
                elif emit_empty:
                    ids.append(i)
                    grams.append(None)
            if ids:
                yield pd.DataFrame({id_col: ids, out_col: grams})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(run, schema)


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 4,
    min_overlap: int = 1,
    impl: str = "arrow",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word ``ngram_n``-gram with an evaluation/benchmark corpus (the GPT-3 /
    PaLM-style n-gram overlap rule).

    Returns every train doc with ``n_ngrams`` (distinct n-grams),
    ``n_contaminated`` (how many of them occur anywhere in the benchmark
    set) and ``contaminated`` (>= ``min_overlap`` hits).

    Scale shape: the benchmark side is tiny relative to the corpus (eval
    sets are thousands of docs), so its distinct gram set is broadcast and
    the contamination join runs map-side inside the train scan — no shuffle
    for the join itself. The per-doc count aggregation shuffles only
    (doc_id, count) pairs after partial aggregation.

    ``impl='arrow'`` (default, r11) builds the gram rows with the
    vectorized :func:`gram_rows` kernel; ``'expr'`` keeps the expression
    HOF chain (the oracle-twin formulation — the kernel is pinned
    value-identical to it by pytest, same convention as cdc_chunking).
    Gram transport stays STRING in both: the membership join and the
    per-doc distinct-gram counts are what the query returns, so an int64
    fingerprint switch would need a collision-freeness argument the
    string-gram DuckDB oracle cannot replay (unlike the fp-family
    operators whose oracles were restructured into the fp domain).
    """

    def grams(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col), tokens(F.col(text_col)).alias("_t")
        ).select(
            id_col,
            F.array_distinct(
                word_ngrams_from_tokens(F.col("_t"), ngram_n)
            ).alias("_g"),
        )

    if impl == "arrow":
        bench_grams = gram_rows(
            bench, id_col=id_col, text_col=text_col, ngram_n=ngram_n,
            emit_empty=False,
        ).select("_g").distinct()
        train_rows = gram_rows(
            train, id_col=id_col, text_col=text_col, ngram_n=ngram_n,
            emit_empty=True,
        )
    else:
        bench_grams = grams(bench).select(F.explode("_g").alias("_g")).distinct()
        # explode_outer + count(_g): a doc too short to have any n-gram
        # must still emit an (id, 0, 0, false) row, not vanish
        train_rows = grams(train).select(
            id_col, F.explode_outer("_g").alias("_g")
        )
    # ONE tokenize/ngram pass: explode every train gram once, mark hits
    # with a broadcast LEFT join, and fold count + hit-sum in one (id)
    # aggregate. The previous two-branch form (hits join + a separate
    # size() branch re-joined on id) re-ran the tokenize+ngram HOFs over
    # the whole train corpus a second time (measured: 12.9 s -> this
    # form at ~6 s on the sf0.1 registered query).
    marked = train_rows.join(
        F.broadcast(bench_grams.withColumn("_hit", F.lit(1))),
        on="_g",
        how="left",
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("_g").cast("long").alias("n_ngrams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias(
                "n_contaminated"
            ),
        )
        .select(
            F.col(id_col),
            "n_ngrams",
            "n_contaminated",
            (F.col("n_contaminated") >= min_overlap).alias("contaminated"),
        )
    )


def decontaminate_oracle_sql(
    *,
    train_pred: str,
    bench_pred: str,
    ngram_n: int = 4,
    min_overlap: int = 1,
    table: str = "documents",
) -> str:
    """DuckDB rendering of :func:`decontaminate` where train/bench are
    predicates over the same table."""
    from pyrope_spark.functions.text import word_ngrams_from_tokens_sql

    ng = word_ngrams_from_tokens_sql("t", ngram_n)
    return f"""
WITH tk AS (SELECT doc_id, {tokens_sql('text')} AS t FROM {table}),
ng AS (SELECT doc_id, list_distinct({ng}) AS g FROM tk),
bg AS (SELECT DISTINCT unnest(g) AS gram FROM ng WHERE {bench_pred}),
tr AS (SELECT doc_id, g FROM ng WHERE {train_pred}),
ex AS (SELECT doc_id, unnest(g) AS gram FROM tr),
h AS (SELECT doc_id, COUNT(*) AS n_hits FROM ex JOIN bg USING (gram) GROUP BY 1)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       CAST(len(t.g) AS BIGINT) AS n_ngrams,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_contaminated,
       COALESCE(h.n_hits, 0) >= {min_overlap} AS contaminated
FROM tr t LEFT JOIN h USING (doc_id)
"""


# ------------------------------------------------------ shuffle + sharding

def shuffle_shards(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "sh42",
) -> DataFrame:
    """Deterministic global shuffle into training shards: each doc gets a
    pseudo-random 60-bit key ``md5(seed|id)``; shard = key mod n_shards,
    ``pos`` = the doc's position within its shard in key order. Re-runs (and
    any cluster layout) give the byte-identical shard manifest — the
    reproducibility property training pipelines need.

    Scale shape: one hash-partitioned sort per shard — exactly the shuffle a
    global reshuffle requires, executed as Spark's disk-backed sort. The
    writing form is ``df.repartition(n_shards, shard).sortWithinPartitions
    (key)`` + parquet write; this operator returns the (id, shard, pos)
    manifest that audits it.
    """
    h = F.md5(
        F.concat(F.lit(seed + "|"), F.col(id_col).cast("string")).cast("binary")
    )
    d = docs.select(F.col(id_col)).withColumn("_h", h).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring("_h", 1, 15), 16, 10).cast("long"), F.lit(n_shards)
        ).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return d.select(
        F.col(id_col),
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


def shuffle_shards_oracle_sql(
    *, n_shards: int = 8, seed: str = "sh42", table: str = "documents"
) -> str:
    return f"""
WITH h AS (
  SELECT doc_id, md5('{seed}|' || CAST(doc_id AS VARCHAR)) AS hh FROM {table}
), s AS (
  SELECT doc_id, hh,
         CAST(CAST(('0x' || substring(hh, 1, 15)) AS BIGINT) % {n_shards} AS INT)
           AS shard
  FROM h
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY hh, doc_id) AS BIGINT)
         AS pos
FROM s
"""


# ---------------------------------------------------------- mixture weights

def corpus_mix_weights(
    docs: DataFrame,
    target: dict[str, float],
    *,
    text_col: str = "text",
    stratum_col: str = "lang",
) -> DataFrame:
    """Per-stratum token totals and the resampling weight needed to hit a
    target mixture (weight = target_share / actual_token_share). One hash
    aggregation over the corpus; the per-stratum result is tiny and joins
    back as a broadcast wherever the weights are applied."""
    agg = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(tokens(F.col(text_col)))).cast("long").alias("n_tokens"),
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    withf = agg.withColumn("_frac", F.col("n_tokens") / total)
    tgt2 = F.lit(None).cast("double")
    for stratum, share in sorted(target.items()):
        tgt2 = F.when(F.col("stratum") == stratum, F.lit(share)).otherwise(tgt2)
    return withf.select(
        "stratum",
        "n_docs",
        "n_tokens",
        F.round(F.col("_frac"), 6).alias("actual_frac"),
        F.round(tgt2 / F.col("_frac"), 6).alias("weight"),
    )


def corpus_mix_weights_oracle_sql(
    target: dict[str, float], *, stratum_col: str = "lang", table: str = "documents"
) -> str:
    cases = " ".join(
        f"WHEN stratum = '{s}' THEN {share}" for s, share in sorted(target.items())
    )
    return f"""
WITH tk AS (
  SELECT {stratum_col} AS stratum, len({tokens_sql('text')}) AS nt FROM {table}
), agg AS (
  SELECT stratum, COUNT(*) AS n_docs, SUM(nt) AS n_tokens FROM tk GROUP BY 1
)
SELECT stratum,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER (), 6) AS actual_frac,
       round((CASE {cases} ELSE NULL END)
             / (CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER ()), 6) AS weight
FROM agg
"""


# --------------------------------------------------------- sequence packing

def pack_sequences(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ctx_tokens: int = 64,
    n_shards: int = 8,
    seed: str = "sh42",
) -> DataFrame:
    """Greedy sequential packing of documents into fixed-size training
    sequences -> (id_col, shard, seq_id, tok_offset, n_tokens).

    The last pipeline stage before tokenized shard writing: walk each
    shard's documents in the deterministic :func:`shuffle_shards` order and
    append to the current ``ctx_tokens`` sequence, starting a new sequence
    when the document would overflow it. Documents are atomic (no splitting
    — pair with :func:`chunk_documents` upstream to bound lengths first);
    an oversized document occupies a sequence alone. ``tok_offset`` is the
    doc's first-token position inside its sequence.

    Scale shape: the shard assignment + ordering is the shuffle_shards
    hash-partitioned sort; packing itself is inherently sequential *within*
    a shard (each bin decision depends on the running fill), so it runs as
    one `applyInPandas` pass per shard — shards are independent, so
    parallelism = n_shards, which a 100 TB pipeline sizes in the thousands
    anyway for writer parallelism. Determinism: byte-identical output for
    any cluster layout, like shuffle_shards.
    """
    import pandas as pd

    toks = docs.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens")
    )
    manifest = shuffle_shards(docs, id_col=id_col, n_shards=n_shards, seed=seed)
    src = manifest.join(toks, id_col)

    schema = (
        f"{id_col} long, shard int, seq_id long, tok_offset long, n_tokens long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos")
        seqs, offs = [], []
        fill = 0
        seq = 0
        first = True
        for t in pdf["n_tokens"].to_numpy():
            if not first and fill + t > ctx_tokens:
                seq += 1
                fill = 0
            offs.append(fill)
            seqs.append(seq)
            fill += t
            first = False
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "shard": pdf["shard"].to_numpy(),
                "seq_id": seqs,
                "tok_offset": offs,
                "n_tokens": pdf["n_tokens"].to_numpy(),
            }
        )

    return src.groupBy("shard").applyInPandas(pack, schema)


def pack_sequences_oracle_sql(
    *,
    ctx_tokens: int = 64,
    n_shards: int = 8,
    seed: str = "sh42",
    table: str = "documents",
) -> str:
    """Recursive-CTE rendering of the per-shard greedy scan: step through
    each shard's docs in shuffle-order, carrying (fill, seq_id)."""
    shards = shuffle_shards_oracle_sql(n_shards=n_shards, seed=seed, table=table)
    return f"""
WITH RECURSIVE sh AS ({shards}),
tk AS (SELECT doc_id, CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tokens
       FROM {table}),
base AS (
  SELECT sh.doc_id, sh.shard, sh.pos, tk.n_tokens
  FROM sh JOIN tk ON tk.doc_id = sh.doc_id
),
step AS (
  SELECT doc_id, shard, pos, n_tokens,
         n_tokens AS fill, CAST(0 AS BIGINT) AS seq_id
  FROM base WHERE pos = 1
  UNION ALL
  SELECT b.doc_id, b.shard, b.pos, b.n_tokens,
         CASE WHEN s.fill + b.n_tokens > {ctx_tokens}
              THEN b.n_tokens ELSE s.fill + b.n_tokens END,
         CASE WHEN s.fill + b.n_tokens > {ctx_tokens}
              THEN s.seq_id + 1 ELSE s.seq_id END
  FROM step s JOIN base b ON b.shard = s.shard AND b.pos = s.pos + 1
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, shard,
       CAST(seq_id AS BIGINT) AS seq_id,
       CAST(fill - n_tokens AS BIGINT) AS tok_offset,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM step
"""


# ------------------------------------------------- cluster-balanced sample

def cluster_balanced_sample(
    vectors: DataFrame,
    model,
    target_per_cluster: int,
    *,
    id_col: str = "id",
    vector_col: str = "vector",
    seed: str = "cb42",
) -> DataFrame:
    """Diversity-preserving downsampling over an embedding space ->
    (id_col, cluster_id, cluster_size, kept): assign each vector to its
    nearest centroid, then keep each row with probability
    ``min(1, target_per_cluster / cluster_size)`` via a deterministic
    md5-hash Bernoulli — head clusters shrink toward the target, tail
    clusters survive whole, so the sample's cluster histogram flattens
    (the cluster-balanced selection used to de-bias web-scale corpora
    toward rare content).

    Determinism: the keep decision is ``hash60(seed|id) < rate * 2^60`` —
    no RNG state, layout-independent, and exactly replicable in SQL (both
    engines compute the same 60-bit integer from the md5 hex and the same
    IEEE-double threshold). Scale shape: one broadcast-assignment pass
    (``assign_by_centroids``; swap in MLlib transform for learned models),
    one tiny cluster-count aggregate broadcast back, zero extra shuffles
    on the corpus.
    """
    from pyrope_spark.operators.ivf import assign_by_centroids

    assigned = assign_by_centroids(
        vectors, model, id_col=id_col, vector_col=vector_col
    )
    cnt = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    h60 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(seed + "|"), F.col(id_col).cast("string")
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    rate = F.least(
        F.lit(1.0),
        F.lit(float(target_per_cluster)) / F.col("cluster_size").cast("double"),
    )
    return (
        assigned.join(F.broadcast(cnt), "cluster_id")
        .select(
            F.col(id_col),
            "cluster_id",
            "cluster_size",
            (h60.cast("double") < rate * F.lit(float(1 << 60))).alias("kept"),
        )
    )


def build_vocab(
    docs: DataFrame,
    *,
    text_col: str = "text",
    max_size: int = 50_000,
    min_count: int = 1,
) -> DataFrame:
    """Frequency vocabulary ``(term, token_id, count)`` — ids 1..max_size by
    (count desc, term asc) rank; id 0 is reserved for OOV (emitted by
    :func:`tokens_to_ids`, never present here). Deterministic across engines
    and layouts: the tie order is total.

    One explode + groupBy(term) shuffle (map-side partials carry the vocab,
    not the corpus) + one top-``max_size`` cut. At 100 TB the cut is a
    single-partition window over ~vocab-sized counts — if the raw term
    universe itself is huge, pre-filter with ``min_count`` (the usual
    practice) so the ranked set stays bounded."""
    from pyrope_spark.functions.text import tokens

    counts = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )
    w = Window.orderBy(F.desc("count"), F.asc("term"))
    return (
        counts.withColumn("token_id", F.row_number().over(w).cast("long"))
        .filter(F.col("token_id") <= max_size)
        .select("term", "token_id", "count")
    )


def tokens_to_ids(
    docs: DataFrame,
    vocab: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = 0,
) -> DataFrame:
    """Map documents to token-id streams: ``(doc_id, pos, token_id)`` with
    0-based positions and OOV terms mapped to ``oov_id`` — the id-encoding
    stage between curation and :func:`pack_sequences`. One posexplode + one
    vocab join (AQE broadcasts a bounded vocab)."""
    from pyrope_spark.functions.text import tokens

    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
    )
    return exploded.join(vocab.select("term", "token_id"), "term", "left").select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.coalesce(F.col("token_id"), F.lit(oov_id).cast("long")).alias("token_id"),
    )


def tokens_to_ids_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_size: int = 50_000,
    min_count: int = 1,
    oov_id: int = 0,
) -> str:
    """DuckDB rendering of build_vocab + tokens_to_ids."""
    from pyrope_spark.functions.text import tokens_sql

    t = tokens_sql(text_col)
    return f"""
WITH tk AS (
  SELECT {id_col} AS doc_id, {t} AS t FROM {table}
),
counts AS (
  SELECT u.term, count(*) AS cnt
  FROM tk, unnest(t) AS u(term)
  GROUP BY u.term HAVING count(*) >= {min_count}
),
vocab AS (
  SELECT term, row_number() OVER (ORDER BY cnt DESC, term ASC) AS token_id
  FROM counts QUALIFY token_id <= {max_size}
),
exploded AS (
  SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos, t[u.i] AS term
  FROM tk, unnest(range(1, len(t) + 1)) AS u(i)
)
SELECT e.doc_id, e.pos,
       CAST(COALESCE(v.token_id, {oov_id}) AS BIGINT) AS token_id
FROM exploded e LEFT JOIN vocab v USING (term)
"""


def temperature_mix_weights(
    docs: DataFrame,
    *,
    temperature: float = 0.5,
    text_col: str = "text",
    stratum_col: str = "lang",
) -> DataFrame:
    """Temperature-based mixture reweighting (the multilingual-sampling
    rule of XLM-R / mT5: sample stratum i with probability proportional to
    p_i^alpha, alpha = temperature): derives the target shares from the
    corpus's own token distribution instead of a hand-written dict
    (:func:`corpus_mix_weights` takes the explicit-target path).

    temperature 1.0 = natural distribution (all weights 1), -> 0 pushes
    toward uniform over strata, upweighting the tail. Output mirrors
    corpus_mix_weights: (stratum, n_docs, n_tokens, actual_frac,
    target_frac, weight = target/actual). One hash aggregation; the result
    is strata-sized — broadcast it wherever the weights are applied (e.g.
    as per-stratum rates for stratified_hash_sample).
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    agg = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(tokens(F.col(text_col)))).cast("long").alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    frac = F.col("n_tokens") / F.sum("n_tokens").over(w_all)
    powed = F.pow(frac, F.lit(temperature))
    target = powed / F.sum(powed).over(w_all)
    return agg.select(
        "stratum",
        "n_docs",
        "n_tokens",
        F.round(frac, 6).alias("actual_frac"),
        F.round(target, 6).alias("target_frac"),
        F.round(target / frac, 6).alias("weight"),
    )


def temperature_mix_weights_oracle_sql(
    *,
    temperature: float = 0.5,
    stratum_col: str = "lang",
    table: str = "documents",
) -> str:
    return f"""
WITH tk AS (
  SELECT {stratum_col} AS stratum, len({tokens_sql('text')}) AS nt FROM {table}
), agg AS (
  SELECT stratum, COUNT(*) AS n_docs, SUM(nt) AS n_tokens FROM tk GROUP BY 1
), f AS (
  SELECT stratum, n_docs, n_tokens,
         CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS frac
  FROM agg
), p AS (
  SELECT *, pow(frac, {temperature}) AS powed FROM f
)
SELECT stratum,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(frac, 6) AS actual_frac,
       round(powed / SUM(powed) OVER (), 6) AS target_frac,
       round((powed / SUM(powed) OVER ()) / frac, 6) AS weight
FROM p
"""


# ------------------------------------------------------ per-domain caps

def domain_cap(
    docs: DataFrame,
    cap: int,
    *,
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "dc42",
    quality_col: str | None = None,
) -> DataFrame:
    """Per-domain document cap — the C4 / RefinedWeb over-representation
    guard: a handful of template-heavy domains otherwise dominate a crawl
    corpus. Keeps at most ``cap`` docs per domain; selection is a
    deterministic md5 rank over (seed | id) (layout- and run-independent,
    the same snapshot-reproducibility contract as stratified_hash_sample),
    or highest-``quality_col``-first when given.

    Scale shape: the naive per-domain window shuffles EVERY row of a hot
    domain into one partition — exactly the skew this operator exists to
    fight. So it is two-phase (the topk_per_group pattern): a local cut to
    ``cap`` rows per (input-partition, domain) bounds the global window's
    input at cap * partitions per domain regardless of domain skew.

    Returns the kept rows (id, domain, rank 1..cap).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    h = F.md5(
        F.concat(F.lit(seed + "|"), F.col(id_col).cast("string")).cast("binary")
    )
    src = docs.select(
        F.col(id_col), F.col(domain_col).alias("domain"),
        *( [F.col(quality_col)] if quality_col else [] ),
    ).withColumn("_h", h)
    if quality_col is None:
        order = [F.asc("_h"), F.asc(id_col)]
    else:
        order = [F.desc(quality_col), F.asc("_h"), F.asc(id_col)]
    local_w = Window.partitionBy(F.spark_partition_id(), "domain").orderBy(*order)
    pruned = (
        src.withColumn("_lr", F.row_number().over(local_w))
        .filter(F.col("_lr") <= cap)
        .drop("_lr")
    )
    w = Window.partitionBy("domain").orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cap)
        .select(id_col, "domain", F.col("rank").cast("long").alias("rank"))
    )


def domain_cap_oracle_sql(
    cap: int,
    *,
    domain_col: str = "source",
    seed: str = "dc42",
    table: str = "documents",
) -> str:
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, {domain_col} AS domain,
       CAST(rn AS BIGINT) AS rank
FROM (
  SELECT doc_id, {domain_col},
         row_number() OVER (
           PARTITION BY {domain_col}
           ORDER BY md5('{seed}|' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
         ) AS rn
  FROM {table}
)
WHERE rn <= {cap}
"""


# ------------------------------------------------------ snapshot diff

def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dataset-versioning diff between two corpus snapshots: per doc id,
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` by content
    fingerprint (md5 of normalized text — the dedup family's
    ``text_fingerprint``). The audit table a reproducible training run
    stores next to each corpus version; aggregate it for the release-note
    counts, join it to filter a pipeline down to changed docs only
    (incremental re-processing).

    One full-outer hash join on the id — both sides collapse to
    (id, fingerprint) in their scans, so the shuffle carries two slim
    columns, not the text.
    """
    o = old.select(
        F.col(id_col).alias("_id"), text_fingerprint(F.col(text_col)).alias("_ofp")
    )
    n = new.select(
        F.col(id_col).alias("_id"), text_fingerprint(F.col(text_col)).alias("_nfp")
    )
    j = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("_ofp").isNull(), F.lit("added"))
        .when(F.col("_nfp").isNull(), F.lit("removed"))
        .when(F.col("_ofp") == F.col("_nfp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        F.col("_id").alias(id_col),
        status.alias("status"),
        F.col("_ofp").alias("old_fp"),
        F.col("_nfp").alias("new_fp"),
    )


def corpus_diff_oracle_sql(
    *,
    table: str = "documents",
    old_pred: str = "doc_id % 10 != 0",
    new_pred: str = "doc_id % 7 != 0",
    change_pred: str = "doc_id % 5 = 0",
    change_suffix: str = " v2",
) -> str:
    """DuckDB rendering over two deterministic synthetic snapshots of the
    documents table (old = old_pred rows; new = new_pred rows, with
    change_pred rows' text suffixed)."""
    return f"""
WITH o AS (
  SELECT doc_id, md5(lower(trim(text))) AS ofp FROM {table} WHERE {old_pred}
), n AS (
  SELECT doc_id,
         md5(lower(trim(
           CASE WHEN {change_pred} THEN text || '{change_suffix}'
                ELSE text END))) AS nfp
  FROM {table} WHERE {new_pred}
)
SELECT CAST(COALESCE(o.doc_id, n.doc_id) AS BIGINT) AS doc_id,
       CASE WHEN o.ofp IS NULL THEN 'added'
            WHEN n.nfp IS NULL THEN 'removed'
            WHEN o.ofp = n.nfp THEN 'unchanged'
            ELSE 'changed' END AS status,
       o.ofp AS old_fp, n.nfp AS new_fp
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
"""


# ------------------------------------------------------ compression signal

def compression_ratio(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """(id, n_bytes, n_compressed, compression_ratio) — zlib ratio per doc,
    the classic template/junk detector the heuristic filters reference
    (Gopher/RefinedWeb discussions): boilerplate and SEO spam compress far
    below natural text; random gibberish barely compresses at all. Score
    it next to `quality_features` and threshold both tails.

    Arrow-batched pandas UDF (zlib is deterministic at a fixed level, so
    the column is layout/run-stable); no SQL oracle — DuckDB has no zlib —
    the pytest gate pins known-ratio fixtures instead."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _clen(s: pd.Series) -> pd.Series:
        import zlib

        return s.fillna("").map(
            lambda t: len(zlib.compress(t.encode("utf-8"), level))
        )

    raw_len = F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long")
    out = docs.select(
        F.col(id_col),
        raw_len.alias("n_bytes"),
        _clen(F.col(text_col)).alias("n_compressed"),
    )
    return out.withColumn(
        "compression_ratio",
        F.when(F.col("n_bytes") > 0,
               F.round(F.col("n_compressed") / F.col("n_bytes"), 6))
        .otherwise(F.lit(None).cast("double")),
    )


# ------------------------------------------------------ binary shard export

def write_token_shards(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ctx_tokens: int = 64,
    n_shards: int = 8,
    pad_id: int = 0,
    seed: str = "sh42",
    vocab: DataFrame | None = None,
) -> list[dict]:
    """The pipeline's last mile: tokenized, packed, FIXED-WIDTH binary
    training shards — ``shard-<n>.bin`` of little-endian uint32 token ids
    (every sequence exactly ``ctx_tokens`` ids, short sequences padded with
    ``pad_id``), plus ``manifest.json`` rows (shard, n_seqs, n_bytes,
    crc32) a training loader verifies before reading.

    Composes the deterministic stages: :func:`build_vocab` (or a supplied
    vocab) -> :func:`tokens_to_ids` -> :func:`pack_sequences` placement ->
    per-shard assembly. Each shard's bytes are written by exactly ONE
    task (``applyInPandas`` over the shard key), in (seq_id, tok_offset,
    pos) order — byte-identical output for any input layout or rerun, so
    a re-derived corpus snapshot reproduces the same shard files bit for
    bit (checksums included). Parallelism = n_shards; a 100 TB export
    sizes n_shards in the thousands for writer parallelism anyway.

    Returns the manifest (also persisted), ascending by shard.

    ``path`` must be visible to executors AND the driver (shared FS /
    object-store mount / local mode); ``pad_id`` defaults to the OOV id 0
    (the GPT-style convention — loaders mask padding by position, the
    packer never splits docs so trailing ids of a sequence are the only
    pads).
    """
    import json
    import os
    import zlib

    import numpy as np

    ids = tokens_to_ids(
        docs, vocab if vocab is not None else build_vocab(docs, text_col=text_col),
        text_col=text_col, id_col=id_col,
    )
    placement = pack_sequences(
        docs, id_col=id_col, text_col=text_col, ctx_tokens=ctx_tokens,
        n_shards=n_shards, seed=seed,
    )
    joined = placement.join(ids, id_col).select(
        "shard", "seq_id", "tok_offset", F.col("pos"), F.col("token_id")
    )
    os.makedirs(path, exist_ok=True)

    def write_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        pdf = pdf.sort_values(["seq_id", "tok_offset", "pos"])
        n_seqs = int(pdf["seq_id"].max()) + 1
        mat = np.full((n_seqs, ctx_tokens), pad_id, dtype=np.uint32)
        rows = pdf["seq_id"].to_numpy()
        cols = pdf["tok_offset"].to_numpy() + pdf["pos"].to_numpy()
        # oversize docs occupy a sequence ALONE (pack_sequences contract)
        # but can exceed ctx; the fixed-width format TRUNCATES their tail
        # (chunk_documents upstream to keep the text instead)
        keep = cols < ctx_tokens
        mat[rows[keep], cols[keep]] = (
            pdf["token_id"].to_numpy()[keep].astype(np.uint32)
        )
        blob = mat.tobytes()
        with open(os.path.join(path, f"shard-{shard}.bin"), "wb") as f:
            f.write(blob)
        return pd.DataFrame({
            "shard": [shard],
            "n_seqs": [n_seqs],
            "n_bytes": [len(blob)],
            "crc32": [zlib.crc32(blob)],
        })

    manifest_df = joined.groupBy("shard").applyInPandas(
        write_shard, schema="shard int, n_seqs long, n_bytes long, crc32 long"
    )
    manifest = sorted(
        (r.asDict() for r in manifest_df.collect()), key=lambda m: m["shard"]
    )
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def read_token_shards(path: str) -> dict[int, "pd.DataFrame"]:
    """Loader-side helper: {shard: (n_seqs x ctx) uint32 matrix}, verifying
    each file against the manifest's byte count and crc32 first."""
    import json
    import os
    import zlib

    import numpy as np

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    out = {}
    for m in manifest:
        with open(os.path.join(path, f"shard-{m['shard']}.bin"), "rb") as f:
            blob = f.read()
        if len(blob) != m["n_bytes"] or zlib.crc32(blob) != m["crc32"]:
            raise IOError(f"shard {m['shard']} fails manifest verification")
        out[m["shard"]] = np.frombuffer(blob, dtype=np.uint32).reshape(
            m["n_seqs"], -1
        )
    return out


# ------------------------------------------------------ weighted resampling

def weighted_gumbel_topk(
    df: DataFrame,
    n: int,
    *,
    weight_log_col: str,
    id_col: str = "doc_id",
    seed: str = "gk42",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement via the Gumbel
    top-k trick (Vieira 2014): key_i = log w_i + Gumbel(u_i); the top-``n``
    keys are an exact sample proportional to the weights. This is DSIR's
    missing second half — feed ``dsir_log_ratio``'s log weights straight in
    (they are already log-space) and the kept set IS the importance-
    resampled corpus.

    Gumbel noise comes from the engine-portable md5 60-bit uniform
    (``(h60 + 0.5) / 2^60`` — never exactly 0 or 1), so the sample is
    layout/run-identical and replicates in SQL: ln is the only
    transcendental, evaluated on identical doubles in both engines; an
    order flip would need two keys within ~1 ulp (continuous keys —
    measure-zero in practice).

    Rows with NULL log weight are excluded (no mass). One scan + a top-n
    (TakeOrderedAndProject via the window cut on bounded candidates is
    avoided — plain ORDER BY LIMIT lowers to per-partition heads).
    Output: (id, log_weight, gumbel_key, rank 1..n).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    h60 = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(seed + "|"), F.col(id_col).cast("string")).cast(
                    "binary"
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    u = (h60.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    gumbel = -F.log(-F.log(u))
    src = df.filter(F.col(weight_log_col).isNotNull()).select(
        F.col(id_col),
        F.col(weight_log_col).alias("log_weight"),
        (F.col(weight_log_col) + gumbel).alias("gumbel_key"),
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("gumbel_key"), F.asc(id_col))
    top = (
        src.orderBy(F.desc("gumbel_key"), F.col(id_col).asc())
        .limit(n)
        .withColumn("rank", F.row_number().over(w))
    )
    return top.select(
        id_col, F.round("log_weight", 6).alias("log_weight"),
        F.round("gumbel_key", 6).alias("gumbel_key"),
        F.col("rank").cast("long").alias("rank"),
    )


# ------------------------------------------------ deterministic splits

def hash_split_bucket(id_expr: Column, seed: str, granularity: int = 10_000) -> Column:
    """Layout-independent split bucket in [0, granularity): double rolling
    fingerprint of (seed | id) — the HLL-proven de-lattice construction
    (one affine pass leaves sequential ids on a stride lattice; re-
    fingerprinting the DECIMAL STRING of the first hash is nonlinear, see
    sketch.py) — mod granularity. Pure integer math, identical in SQL."""
    from pyrope_spark.functions.text import char_fp_rolling

    h1 = char_fp_rolling(F.concat(F.lit(seed + "|"), id_expr.cast("string")))
    return F.pmod(char_fp_rolling(h1.cast("string")), F.lit(granularity))


def hash_split_bucket_sql(id_expr: str, seed: str, granularity: int = 10_000) -> str:
    from pyrope_spark.functions.text import char_fp_rolling_sql

    h1 = char_fp_rolling_sql(f"'{seed}|' || CAST({id_expr} AS VARCHAR)")
    h2 = char_fp_rolling_sql(f"CAST(({h1}) AS VARCHAR)")
    return f"(({h2}) % {granularity} + {granularity}) % {granularity}"


def train_val_test_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    weights: tuple[float, ...] = (0.8, 0.1, 0.1),
    labels: tuple[str, ...] = ("train", "val", "test"),
    seed: str = "split1",
    granularity: int = 10_000,
) -> DataFrame:
    """Deterministic dataset split by content-independent id hash: every
    row gains a ``split`` label, stable under any repartition / re-run /
    engine (the property that keeps eval sets eval sets forever — a
    sampled split would reshuffle membership whenever the layout moved).

    Integer thresholds: row is split i iff bucket in
    [floor(cum_{i-1} * granularity), floor(cum_i * granularity)). At
    100 TB this is one projected expression — no shuffle, no state; the
    split can be recomputed from the id alone anywhere in the pipeline.
    """
    if len(weights) != len(labels):
        raise ValueError("weights and labels must align")
    total = sum(weights)
    cuts = []
    acc = 0.0
    for w in weights:
        acc += w / total
        cuts.append(int(acc * granularity))
    cuts[-1] = granularity  # guard float residue
    bucket = hash_split_bucket(F.col(id_col), seed, granularity)
    expr = None
    for lab, hi in zip(labels, cuts):
        cond = bucket < hi
        expr = F.when(cond, F.lit(lab)) if expr is None else expr.when(cond, F.lit(lab))
    return df.withColumn("split", expr)


def curriculum_order(
    df: DataFrame,
    *,
    score_col: str,
    id_col: str = "doc_id",
    n_stages: int = 4,
    seed: str = "curr1",
) -> DataFrame:
    """Curriculum data ordering (easy -> hard): stage = ntile(n_stages)
    over ascending difficulty score (ties broken by id — fully
    deterministic), order WITHIN a stage by the content-independent id
    hash (so each stage is internally shuffled but reproducibly), and
    ``curriculum_rank`` is the global serving order.

    ntile semantics (earlier tiles take the remainder) are identical in
    Spark and ANSI SQL given the same total order. Scale shape: two
    window passes over one sort order + one over (stage, hash) — at
    100 TB use range partitioning on (score) for the first and (stage,
    hash) for the second; no global single-partition sort is required to
    MATERIALIZE the order, only to number it (write
    ``repartitionByRange(stage, hash_key).sortWithinPartitions`` for the
    shard layout and let the rank be per-shard offsets).
    """
    stage = F.ntile(n_stages).over(
        Window.orderBy(F.col(score_col).asc(), F.col(id_col).asc())
    )
    hkey = hash_split_bucket(F.col(id_col), seed, 1 << 30)
    staged = df.select(
        id_col, score_col,
    ).withColumn("stage", stage).withColumn("_h", hkey)
    rank = F.row_number().over(
        Window.orderBy(F.col("stage").asc(), F.col("_h").asc(),
                       F.col(id_col).asc())
    )
    return staged.select(
        id_col,
        F.col("stage").cast("long").alias("stage"),
        rank.cast("long").alias("curriculum_rank"),
    )


# ------------------------------------------- content-defined chunking

CDC_WINDOW = 8
CDC_MODULUS = 48


def cdc_chunk_documents(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = CDC_WINDOW,
    modulus: int = CDC_MODULUS,
    mode: str = "arrow",
) -> DataFrame:
    """Content-defined chunking: cut where the rolling fingerprint of the
    trailing ``window`` chars hits ``fp % modulus == 0`` — so chunk
    boundaries are a function of LOCAL CONTENT, not offsets. Insert or
    delete text anywhere and boundaries downstream of the edit
    re-synchronize within ~window chars: every untouched chunk keeps its
    exact bytes (and therefore its exact-dedup hash), which is why CDC is
    the re-chunking primitive for dedup over evolving corpora —
    fixed-size chunking shifts EVERY later chunk on a one-char edit.

    Chunk sizes are ~geometric with mean ``modulus``; no min/max bounds
    are enforced (the classic unbounded CDC — document-level outliers are
    bounded by the document itself). Docs shorter than ``window`` are one
    chunk.

    Two parity-equal paths (pytest-gated identical, the winnowing
    discipline):

    - ``mode='expr'`` — pure expression pipeline (per-position window
      fingerprints, O(window) per char inside the scan stage, zero
      shuffles), the engine-portable oracle twin
      (:func:`cdc_chunk_oracle_sql`).
    - ``mode='arrow'`` (default since r10, guide §4.2) — vectorized numpy
      kernel: docs grouped by length per Arrow batch, window hashes via
      ``window`` Horner folds over a 2-D codepoint matrix, chunk slicing
      in Python (char-based, same semantics as Spark ``substring``).
      Exact int64 arithmetic — identical cuts and chunk bytes.

    Output: (id, chunk_no, chunk_start, chunk_text).
    """
    if mode == "arrow":
        return _cdc_chunk_arrow(
            docs, text_col=text_col, id_col=id_col, window=window,
            modulus=modulus,
        )
    from pyrope_spark.functions.text import char_fp_rolling

    w, m = window, modulus
    # the fp expression inline: char_fp_rolling over the window ENDING at p
    from pyrope_spark.functions.text import FP_ROLL_P, FP_ROLL_R, FP_ROLL_SEED

    fp_sql = (
        f"aggregate(transform(split(substring(_s, p - {w - 1}, {w}), ''), "
        f"c -> cast(ascii(c) as bigint)), cast({FP_ROLL_SEED} as bigint), "
        f"(acc, c) -> (acc * {FP_ROLL_R} + c) % {FP_ROLL_P})"
    )
    # sequence(a, b) REVERSES when a > b in Spark — short docs must give
    # an empty position list, not [w..len] backwards
    cuts = F.expr(
        f"filter(transform("
        f"IF(length(_s) < {w}, array(), sequence({w}, length(_s))), "
        f"p -> IF(({fp_sql}) % {m} = 0, p, NULL)), x -> x IS NOT NULL)"
    )
    src = docs.select(
        F.col(id_col), F.col(text_col).alias("_s")
    ).filter(F.length("_s") > 0)
    bounded = src.withColumn("_cuts", cuts).withColumn(
        "_bounds",
        F.expr("array_distinct(concat(array(0), _cuts, array(length(_s))))"),
    )
    out = bounded.select(
        id_col,
        F.posexplode(
            F.expr(
                "transform(sequence(1, size(_bounds) - 1), "
                "i -> struct(_bounds[i - 1] AS st, "
                "substring(_s, _bounds[i - 1] + 1, _bounds[i] - _bounds[i - 1]) AS tx))"
            )
        ).alias("_i", "_c"),
    )
    return out.select(
        id_col,
        (F.col("_i") + 1).cast("long").alias("chunk_no"),
        (F.col("_c.st") + 1).cast("long").alias("chunk_start"),
        F.col("_c.tx").alias("chunk_text"),
    )


def _cdc_chunk_arrow(
    docs: DataFrame,
    *,
    text_col: str,
    id_col: str,
    window: int,
    modulus: int,
) -> DataFrame:
    """Vectorized CDC kernel (see :func:`cdc_chunk_documents`
    mode='arrow').  Exact int64 Horner arithmetic over codepoints —
    acc < 1e15, acc*131 + cp stays far inside int64 — so cuts match the
    SQL engines bit-for-bit; chunk strings come from Python char slicing,
    which has the same character (not byte) semantics as Spark
    ``substring``."""
    from collections import defaultdict
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from pyrope_spark.functions.text import FP_ROLL_P, FP_ROLL_R, FP_ROLL_SEED

    w, m = window, modulus
    id_field = docs.schema[id_col]
    schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("chunk_no", T.LongType()),
            T.StructField("chunk_start", T.LongType()),
            T.StructField("chunk_text", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            groups: dict[int, list[tuple[int, str]]] = defaultdict(list)
            texts = pdf["_t"].tolist()
            for r, t in enumerate(texts):
                if t:  # length > 0 filter, as in the expr path
                    groups[len(t)].append((r, t))
            out_rows: list[int] = []
            out_no: list[int] = []
            out_start: list[int] = []
            out_text: list[str] = []
            for n, members in groups.items():
                if n >= w:
                    codes = np.empty((len(members), n), dtype=np.int64)
                    for j, (_, t) in enumerate(members):
                        c = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
                        codes[j] = c
                    nh = n - w + 1
                    h = np.full(
                        (len(members), nh), FP_ROLL_SEED, dtype=np.int64
                    )
                    for j in range(w):
                        h = (h * FP_ROLL_R + codes[:, j : j + nh]) % FP_ROLL_P
                    cut_rows, cut_idx = np.nonzero(h % m == 0)
                else:
                    cut_rows = np.empty(0, dtype=np.int64)
                    cut_idx = np.empty(0, dtype=np.int64)
                cut_lo = np.searchsorted(cut_rows, np.arange(len(members)))
                cut_hi = np.searchsorted(
                    cut_rows, np.arange(len(members)), side="right"
                )
                for j, (r, t) in enumerate(members):
                    # window i (0-based) ends at char position i + w
                    cuts = (cut_idx[cut_lo[j]:cut_hi[j]] + w).tolist()
                    bounds = [0] + cuts
                    if not cuts or cuts[-1] != n:
                        bounds.append(n)
                    for i in range(1, len(bounds)):
                        out_rows.append(r)
                        out_no.append(i)
                        out_start.append(bounds[i - 1] + 1)
                        out_text.append(t[bounds[i - 1]:bounds[i]])
            if not out_rows:
                continue
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    id_col: ids[np.asarray(out_rows)],
                    "chunk_no": np.asarray(out_no, dtype=np.int64),
                    "chunk_start": np.asarray(out_start, dtype=np.int64),
                    "chunk_text": out_text,
                }
            )

    src = docs.select(F.col(id_col), F.col(text_col).alias("_t"))
    return src.mapInPandas(run, schema)


def cdc_chunk_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = CDC_WINDOW,
    modulus: int = CDC_MODULUS,
) -> str:
    from pyrope_spark.functions.text import FP_ROLL_P, FP_ROLL_R, FP_ROLL_SEED

    w, m = window, modulus
    fp = (
        f"list_reduce(list_prepend(CAST({FP_ROLL_SEED} AS BIGINT), "
        f"list_transform(string_split(substring(s, p - {w - 1}, {w}), ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, c) -> (acc * {FP_ROLL_R} + c) % {FP_ROLL_P})"
    )
    return f"""
WITH src AS (
  SELECT {id_col}, {text_col} AS s FROM {table} WHERE length({text_col}) > 0
), cut AS (
  SELECT {id_col}, s,
         -- list_distinct does NOT preserve order in DuckDB; re-sort
         list_sort(list_distinct(list_concat(list_concat([0],
           list_filter(list_transform(range(ceil({w})::BIGINT, length(s) + 1),
             p -> CASE WHEN ({fp}) % {m} = 0 THEN p END),
             x -> x IS NOT NULL)),
           [length(s)]))) AS bounds
  FROM src
)
SELECT {id_col},
       CAST(i AS BIGINT) AS chunk_no,
       CAST(bounds[i] + 1 AS BIGINT) AS chunk_start,
       substring(s, bounds[i] + 1, bounds[i + 1] - bounds[i]) AS chunk_text
FROM cut, unnest(range(1, len(bounds))) AS u(i)
"""


# ------------------------------------------------ blocklist phrase filter

def blocklist_phrase_matches(
    docs: DataFrame,
    phrases: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    phrase_col: str = "phrase",
    phrase_id_col: str = "phrase_id",
) -> DataFrame:
    """Multi-token blocklist phrase matching — the safety/contamination
    filter pass: find every occurrence of every blocklist phrase in every
    document, at token granularity.

    Spark-first Aho-Corasick analog: a document token produces a
    candidate only when it equals the FIRST token of some phrase (the
    root-transition test, a broadcast hash lookup), and each candidate is
    verified with one array-slice equality against the full phrase — so
    cost is corpus_tokens * P(first-token hit) + hits * phrase_len, never
    corpus_tokens * n_phrases.  The phrase table is assumed
    blocklist-sized (thousands) and is broadcast; tokenization is the
    repo-wide ``tokens()`` (lowercase, whitespace), identical in the
    DuckDB twin, so matches are exact cross-engine.

    Output: (id, phrase_id, token_pos 1-based) — one row per occurrence.
    Callers anti-join on id for filter semantics or aggregate for audit.
    """
    from pyrope_spark.functions.text import tokens

    dt = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    pos = dt.select(
        id_col, "_toks",
        F.posexplode("_toks").alias("_p0", "_tok"),
    )
    ph = (
        phrases.select(
            F.col(phrase_id_col), tokens(F.col(phrase_col)).alias("_ptoks")
        )
        .filter(F.size("_ptoks") > 0)
        .withColumn("_first", F.element_at("_ptoks", 1))
        .withColumn("_plen", F.size("_ptoks"))
    )
    hits = pos.join(F.broadcast(ph), F.col("_tok") == F.col("_first")).filter(
        F.expr("slice(_toks, _p0 + 1, _plen) = _ptoks")
    )
    return hits.select(
        id_col,
        phrase_id_col,
        (F.col("_p0") + 1).cast("long").alias("token_pos"),
    )


def winsorize(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    lo_pct: int = 1,
    hi_pct: int = 99,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-key percentile clipping (winsorization) with EXACT bounds.

    The preprocessing step before any mean/variance-sensitive training
    signal: cap each key's values at its nearest-rank(ceil) lo/hi
    percentiles.  Bounds are picked by pure integer rank inequality (the
    smallest rank r with r*100 >= n*p over the (value, id) total order —
    no interpolation, no float), and values travel as micro-unit BIGINTs,
    so the clipped table replicates bit-for-bit cross-engine.

    Scale shape (100 TB): one window-rank pass partitioned by key (single
    hash shuffle), a per-key bounds aggregate (|keys| rows, broadcast
    back), one projection.  Output keeps every row with the clipped
    value, the raw value, and the clip flag for audit.
    """
    mv = df.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("id"),
        F.round(F.col(value_col) * scale).cast("long").alias("v"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("k").orderBy("v", "id")
    ranked = mv.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(W.partitionBy("k"))
    )
    bounds = ranked.groupBy(F.col("k").alias("bk")).agg(
        F.max(
            F.when((F.col("rn") - 1) * 100 < F.col("n") * lo_pct, F.col("v"))
        ).alias("lo_v"),
        F.max(
            F.when((F.col("rn") - 1) * 100 < F.col("n") * hi_pct, F.col("v"))
        ).alias("hi_v"),
    )
    return (
        mv.join(bounds, F.col("k") == F.col("bk"))
        .select(
            F.col("k").alias(key_col),
            F.col("id").cast("long").alias(id_col),
            F.col("v").alias("raw_micro"),
            F.greatest(
                F.col("lo_v"), F.least(F.col("hi_v"), F.col("v"))
            ).alias("clipped_micro"),
            (
                (F.col("v") < F.col("lo_v")) | (F.col("v") > F.col("hi_v"))
            ).alias("was_clipped"),
        )
    )


def greedy_token_cover(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rounds: int = 5,
    unit: str = "bigram",
) -> DataFrame:
    """Greedy maximum-coverage corpus selection: ``rounds`` documents,
    each the one adding the most NOT-YET-COVERED distinct tokens.

    The facility-location/submodular-selection classic (the greedy is
    within (1-1/e) of optimal) that data-selection pipelines use to seed
    a diverse subset; deterministic end-to-end — gain ties break to the
    smallest doc id, and every round is a fixed plan, so the selection
    hash-compares across engines (an RNG-seeded or float-scored selector
    would not).

    Scale shape (100 TB): the doc->distinct-token table is built ONCE
    (one explode + distinct); each round is one anti-join against the
    covered-token set (|covered| grows by <= |doc| per round, broadcast)
    + one count aggregate + a global top-1 (TakeOrderedAndProject).
    Rounds are strictly sequential by nature of the greedy — the
    parallelism is WITHIN each round's scan, which is the right trade
    at corpus scale (5 passes, each fully distributed).
    """
    from pyrope_spark.functions.text import tokens

    if unit == "bigram":
        # adjacent-pair universe — richer than the raw vocabulary when
        # the token set is small (the generator corpus has 31 terms but
        # ~900 bigrams, so the greedy stays non-trivial)
        tk = tokens(F.col(text_col))
        pairs = F.arrays_zip(
            F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))).alias("a"),
            F.slice(tk, 2, F.greatest(F.size(tk) - 1, F.lit(0))).alias("b"),
        )
        unit_col = F.explode(pairs).alias("_p")
        dt = (
            docs.select(F.col(id_col).alias("did"), unit_col)
            .select(
                "did",
                F.concat_ws(" ", F.col("_p.a"), F.col("_p.b")).alias("tok"),
            )
            .distinct()
            .cache()
        )
    else:
        dt = (
            docs.select(
                F.col(id_col).alias("did"),
                F.explode(tokens(F.col(text_col))).alias("tok"),
            )
            .distinct()
            .cache()
        )
    covered = None
    picks = []
    for r in range(rounds):
        remaining = dt
        if covered is not None:
            # r10 opt (guide §3.1): the covered set is at most `rounds`
            # documents' distinct tokens — tiny.  Without the hint the
            # anti-join planned as a shuffle of the corpus-sized dt table
            # EVERY round (size estimates for the union-of-filters lineage
            # are hopeless); broadcasting the covered side removes all
            # `rounds` shuffles of dt.
            remaining = dt.join(F.broadcast(covered), "tok", "left_anti")
        gains = remaining.groupBy("did").agg(
            F.count(F.lit(1)).alias("gain")
        )
        top = (
            gains.orderBy(F.col("gain").desc(), F.col("did").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["gain"] == 0:
            break
        did, gain = top[0]["did"], top[0]["gain"]
        picks.append((r + 1, did, gain))
        new_tokens = dt.filter(F.col("did") == did).select("tok")
        covered = (
            new_tokens
            if covered is None
            else covered.unionByName(new_tokens).distinct()
        )
    out = docs.sparkSession.createDataFrame(
        picks, "round long, doc_id long, new_tokens_covered long"
    )
    dt.unpersist()
    return out


def target_encode_loo(
    df: DataFrame,
    *,
    cat_col: str,
    label_col: str,
    id_cols: tuple[str, ...] = ("event_id",),
    out_col: str = "enc_micro",
) -> DataFrame:
    """Leakage-safe leave-one-out target encoding with prior smoothing
    (weight 1) — the standard categorical feature for GBDT-style training
    where one-hot would explode and plain mean encoding leaks the row's
    own label:

        enc(row) = ((sum_cat - own_label) + global_rate) / ((n_cat-1) + 1)

    All-integer: with global sums (G_sum, G_n), the m=1 smoothing folds to
    ``((sum_cat - own) * G_n + G_sum) * 1e6 DIV (n_cat * G_n)`` — labels
    are 0/1 so every term is exact; a singleton category (n=1) encodes to
    exactly the global prior.

    Scale shape: one (cat) aggregate joined back on cat + a broadcast of
    the two global scalars — no window, no per-row shuffle beyond the cat
    join. NULL categories are dropped explicitly (no silent inner-join
    loss; encode a sentinel upstream if NULL is a real class).

    Output: id cols + (cat_col, label_col, out_col BIGINT micro-units).
    """
    ids = list(id_cols)
    src = df.select(
        *ids, F.col(cat_col), F.col(label_col).cast("long").alias(label_col)
    ).filter(F.col(cat_col).isNotNull())
    agg = src.groupBy(cat_col).agg(
        F.sum(label_col).alias("_s"), F.count("*").alias("_n")
    )
    glob = src.agg(
        F.sum(label_col).alias("_gs"), F.count("*").alias("_gn")
    )
    return (
        src.join(agg, cat_col)
        .join(F.broadcast(glob))
        .select(
            *ids,
            cat_col,
            label_col,
            F.expr(
                f"((_s - {label_col}) * _gn + _gs) * 1000000 DIV (_n * _gn)"
            ).alias(out_col),
        )
    )


def _pinned_splitters(
    df: DataFrame, order_cols: tuple[str, ...], parts: int
) -> list[tuple] | None:
    """One column-pruned pass over ``df`` that returns ``parts - 1``
    range splitters for the (total-order) key tuple, picked driver-side
    from a per-input-partition bounded sample weighted by partition size
    (the classic RangePartitioner recipe, done ONCE so every downstream
    job sees the SAME boundaries). Returns ``None`` when the keys are not
    driver-splittable (NULLs or non-literal-able types) — callers fall
    back to the checkpoint path.
    """
    dtypes = [df.schema[c].dataType.simpleString() for c in order_cols]
    samp_schema = ", ".join(
        f"_k{i} {t}" for i, t in enumerate(dtypes)
    ) + ", _cnt long, _pidx int"
    keyed = df.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(order_cols)],
        F.spark_partition_id().alias("_pidx"),
    )

    def part_sample(batches):
        kept = None
        total = 0
        for pdf in batches:
            if not len(pdf):
                continue
            total += len(pdf)
            step = max(1, len(pdf) // 64)
            take = pdf.iloc[::step]
            kept = take if kept is None else pd.concat([kept, take])
            if len(kept) > 512:
                kept = kept.iloc[:: max(1, len(kept) // 256)]
        if total:
            kept = kept.copy()
            kept["_cnt"] = total
            yield kept

    rows = keyed.mapInPandas(part_sample, samp_schema).collect()
    ncols = len(order_cols)
    by_part: dict[int, list] = {}
    for r in rows:
        by_part.setdefault(r["_pidx"], []).append(r)
    weighted = []  # (key_tuple, weight = rows represented by this sample)
    for prows in by_part.values():
        w = prows[0]["_cnt"] / len(prows)
        for r in prows:
            key = tuple(r[i] for i in range(ncols))
            if any(v is None for v in key):
                return None
            weighted.append((key, w))
    if not weighted:
        return []
    try:
        weighted.sort(key=lambda kw: kw[0])
    except TypeError:
        return None
    total_w = sum(w for _, w in weighted)
    splitters: list[tuple] = []
    acc = 0.0
    target_i = 1
    for key, w in weighted:
        acc += w
        while target_i < parts and acc >= target_i * total_w / parts:
            if not splitters or key > splitters[-1]:
                splitters.append(key)
            target_i += 1
    return splitters


#: ``global_rank(known_rows=...)`` takes the plain single-partition
#: window shortcut when the caller proves the input is at most this many
#: rows: below it, the distributed machinery (sampling pass + offsets
#: pass + pid shuffle, ~3 jobs) costs strictly more than one small sort.
#: Value-identical either way (the pinned path replicates row_number).
GLOBAL_RANK_SMALL_ROWS = 200_000


def global_rank(
    df: DataFrame,
    *,
    order_cols: tuple[str, ...],
    rank_col: str = "grank",
    num_partitions: int | None = None,
    materialize: bool = True,
    known_rows: int | None = None,
) -> DataFrame:
    """Distributed 1-based global rank over a TOTAL order (``order_cols``
    must be tie-free — include a unique id last) — the scalable
    alternative to ``row_number() OVER (ORDER BY ...)``, whose empty
    window frame funnels the whole table through one partition.

    Range-partition ranking with DRIVER-PINNED boundaries: one bounded
    sampling pass picks explicit range splitters, ``_pid`` becomes a
    deterministic EXPRESSION over the row's own key (a chain of struct
    comparisons against literal splitters), and rows hash-shuffle on
    ``_pid``. Because partition membership is now a pure function of the
    data — not of ``repartitionByRange``'s per-job boundary sampling —
    the offsets job and the final join agree even when the input is an
    upstream aggregate with nondeterministic row order (the r6
    duplicate/gapped-ranks bug), WITHOUT materializing the relation:
    no ``localCheckpoint``, no full extra write at fact-table scale.
    A local sort + per-``_pid`` running index + a broadcast offset table
    (≤ |partitions| rows on the driver) yield the exact global rank with
    no global sort stage. Rank values replicate the single-window
    formulation exactly (asserted in tests), so SQL oracles keep using
    row_number. ``materialize`` is kept for API compatibility (the
    checkpoint fallback still honors it); the pinned path ignores it.

    Scale shape (100 TB): sampling pass is column-pruned to the key
    columns; the data moves exactly once (hash exchange on ``_pid``);
    driver state is O(sample + partitions), never O(rows).
    """
    cols = [F.col(c) for c in order_cols]
    if known_rows is not None and known_rows <= GLOBAL_RANK_SMALL_ROWS:
        # r10 opt (guide §1.2): callers that already know the row count
        # (they ran a count for other reasons) skip the 3-job distributed
        # rank below this bound — one small single-partition sort instead
        from pyspark.sql import Window as _W

        w = _W.orderBy(*cols)
        return df.withColumn(
            rank_col, F.row_number().over(w).cast("long")
        )
    spark = df.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism
    splitters = _pinned_splitters(df, order_cols, parts)
    if splitters is None:
        return _global_rank_checkpointed(
            df, order_cols=order_cols, rank_col=rank_col,
            num_partitions=parts, materialize=materialize,
        )
    field_names = [f"_k{i}" for i in range(len(order_cols))]
    key = F.struct(*[F.col(c).alias(n) for c, n in zip(order_cols, field_names)])
    dtypes = [df.schema[c].dataType for c in order_cols]
    try:
        pid = F.lit(0)
        for s in splitters:
            lit_s = F.struct(
                *[F.lit(v).cast(t).alias(n)
                  for v, t, n in zip(s, dtypes, field_names)]
            )
            pid = pid + (key >= lit_s).cast("int")
    except Exception:  # non-literal-able key type — keep correctness
        return _global_rank_checkpointed(
            df, order_cols=order_cols, rank_col=rank_col,
            num_partitions=parts, materialize=materialize,
        )
    n_parts = len(splitters) + 1
    ranged = (
        df.withColumn("_pid", pid.cast("int"))
        .repartition(n_parts, F.col("_pid"))
        .sortWithinPartitions("_pid", *cols)
    )
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in ranged.schema.fields
    ) + ", _lidx bigint"

    def attach(batches):
        seen: dict[int, int] = {}
        for pdf in batches:
            pdf = pdf.copy()
            base = pdf["_pid"].map(seen).fillna(0).astype("int64")
            pdf["_lidx"] = pdf.groupby("_pid").cumcount().astype("int64") + base
            for p, c in pdf["_pid"].value_counts().items():
                seen[int(p)] = seen.get(int(p), 0) + int(c)
            yield pdf

    local = ranged.mapInPandas(attach, schema)
    counts = (
        local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["_n"]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_lidx") + 1).cast("long"))
        .drop("_pid", "_lidx", "_off")
    )


def _global_rank_checkpointed(
    df: DataFrame,
    *,
    order_cols: tuple[str, ...],
    rank_col: str = "grank",
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Fallback for keys the pinned-splitter path cannot handle (NULLs in
    the order columns, non-literal-able types): ``repartitionByRange`` +
    eager ``localCheckpoint`` to pin ONE partitioning for both the
    offsets job and the final join (repartitionByRange samples its
    boundaries PER JOB, and an upstream aggregate's nondeterministic row
    order can make two jobs sample different partitionings — the r6
    duplicate/gapped-ranks bug).
    """
    cols = [F.col(c) for c in order_cols]
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    # independent schema copy — StructType.add mutates in place, and
    # mutating ``ranged.schema`` desyncs the cached schema from the plan
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in ranged.schema.fields
    ) + ", _lidx bigint"

    def attach(batches):
        i = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_lidx"] = range(i, i + len(pdf))
            i += len(pdf)
            yield pdf

    local = ranged.mapInPandas(attach, schema)
    if materialize:
        local = local.localCheckpoint(eager=True)
    counts = (
        local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["_n"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_lidx") + 1).cast("long"))
        .drop("_pid", "_lidx", "_off")
    )


def quantile_normalize(
    df: DataFrame,
    *,
    group_col: str = "source",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    out_col: str = "norm_value",
) -> DataFrame:
    """Cross-group quantile normalization (the batch-effect correction of
    expression arrays, applied to corpus features): each row's value is
    replaced by the POOLED distribution's order statistic at the same
    quantile, so every group ends up with an identical value
    distribution — length/quality scores become comparable across
    sources with different scales.

    All index arithmetic is exact: within-group rank r of n maps to
    pooled index ``ceil(r·N / n) = (r·N + n - 1) div n`` over the
    pooled total order ((value, id) — tie-free), so no float quantile
    ever decides a mapping. The pooled order statistics come from
    [[global_rank]] (range-partitioned, no single-partition sort); the
    within-group rank is a keyed window.

    Output: input columns + ``pool_idx`` + ``out_col`` (the pooled value
    at that index).
    """
    n_w = Window.partitionBy(group_col)
    r_w = Window.partitionBy(group_col).orderBy(value_col, id_col)
    ranked = df.withColumn("_n", F.count(F.lit(1)).over(n_w)).withColumn(
        "_r", F.row_number().over(r_w)
    )
    # r11: the pooled-total count was already paid below for the index
    # arithmetic — computing it FIRST lets global_rank take its r10
    # known_rows shortcut (one single-partition row_number instead of the
    # 3-job distributed rank) below the 200k-row bound (§1.2)
    big_n = df.count()
    pooled = global_rank(
        df.select(F.col(value_col).alias("_pv"), F.col(id_col).alias("_pid2")),
        order_cols=("_pv", "_pid2"),
        rank_col="pool_idx",
        known_rows=big_n,
    ).select("pool_idx", "_pv")
    mapped = ranked.withColumn(
        "pool_idx",
        F.expr(f"(_r * {big_n}L + _n - 1) div _n").cast("long"),
    )
    return (
        mapped.join(F.broadcast(pooled) if big_n <= 1_000_000 else pooled,
                    "pool_idx")
        .withColumn(out_col, F.col("_pv"))
        .drop("_n", "_r", "_pv")
    )


def robust_scale(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    id_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Median/IQR robust scaling per group — the outlier-tolerant
    standardization (sklearn's RobustScaler) for features whose per-source
    distributions differ in location and spread, where mean/std would let
    a single heavy-tailed source dominate.

    All-integer: values enter as ``floor(v·1e6)`` micro units (one IEEE
    multiply+floor), the three quartiles are EXACT nearest-rank order
    statistics (rank = ceil(p·n), 1-indexed — the
    [[exact_quantiles_two_pass]] rank function) picked by row_number over
    the total order (vm, id), and the output is
    ``scaled_ppm = (vm − median)·1e6 div (q3 − q1)`` (truncating div,
    verified identical on negatives in both engines; 0 when the IQR is 0).

    Scale shape (100 TB): one group-keyed window for ranks + one group
    aggregate for sizes/quartiles + one broadcast join back — every stage
    shuffles on the group key only.  The per-group window sort is the
    bounded part (groups are feature partitions, not the corpus).
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        F.floor(F.col(value_col).cast("double") * scale)
        .cast("long")
        .alias("vm"),
    )
    w = Window.partitionBy("grp").orderBy(F.col("vm").asc(), F.col("id").asc())
    ranked = base.withColumn("rn", F.row_number().over(w))
    sizes = base.groupBy("grp").agg(F.count("*").alias("n"))
    # rank targets via integer ceil-div (ceil(a/b) = (a+b-1) div b on
    # positive operands) — float division could misplace a rank by 1 ulp
    withr = ranked.join(F.broadcast(sizes), "grp").select(
        "grp",
        "vm",
        "rn",
        F.expr("(n + 3) div 4").alias("_q1r"),
        F.expr("(n + 1) div 2").alias("_medr"),
        F.expr("(3 * n + 3) div 4").alias("_q3r"),
    )
    qs = withr.groupBy("grp").agg(
        F.max(F.when(F.col("rn") == F.col("_q1r"), F.col("vm"))).alias("q1"),
        F.max(F.when(F.col("rn") == F.col("_medr"), F.col("vm"))).alias("med"),
        F.max(F.when(F.col("rn") == F.col("_q3r"), F.col("vm"))).alias("q3"),
    )
    return (
        base.join(F.broadcast(qs), "grp")
        .select(
            F.col("id").alias(id_col),
            F.col("grp").alias(group_col),
            "vm",
            F.col("q1").cast("long").alias("q1_micro"),
            F.col("med").cast("long").alias("median_micro"),
            F.col("q3").cast("long").alias("q3_micro"),
            F.when(
                F.col("q3") > F.col("q1"),
                F.expr("(vm - med) * 1000000 div (q3 - q1)"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("scaled_ppm"),
        )
    )


def robust_scale_oracle_sql(
    *,
    group_col: str,
    value_col: str,
    id_col: str,
    table: str,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of [[robust_scale]]."""
    return f"""
WITH base AS (
  SELECT {group_col} AS grp, {id_col} AS id,
         CAST(floor(CAST({value_col} AS DOUBLE) * {scale}) AS BIGINT) AS vm
  FROM {table}
),
ranked AS (
  SELECT grp, vm,
         row_number() OVER (PARTITION BY grp ORDER BY vm ASC, id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY grp) AS n
  FROM base
),
qs AS (
  SELECT grp,
         MAX(CASE WHEN rn = (n + 3) // 4 THEN vm END) AS q1,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN vm END) AS med,
         MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN vm END) AS q3
  FROM ranked GROUP BY 1
)
SELECT b.id AS {id_col}, b.grp AS {group_col}, b.vm,
       CAST(q1 AS BIGINT) AS q1_micro,
       CAST(med AS BIGINT) AS median_micro,
       CAST(q3 AS BIGINT) AS q3_micro,
       CAST(CASE WHEN q3 > q1 THEN (b.vm - med) * 1000000 // (q3 - q1)
                 ELSE 0 END AS BIGINT) AS scaled_ppm
FROM base b JOIN qs ON b.grp = qs.grp
"""


def tukey_outliers(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    id_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Tukey-fence outlier flags per group: a value is an outlier when it
    falls below ``q1 − 1.5·IQR`` or above ``q3 + 1.5·IQR`` — the boxplot
    rule, robust to the outliers it hunts (mean/std fences move toward
    the anomaly; quartile fences don't).

    Quartiles are the SAME exact nearest-rank statistics as
    [[robust_scale]].  The 1.5 factor stays integer by cross-multiplying
    ×2: low iff ``2·vm < 2·q1 − 3·(q3−q1)``, high iff
    ``2·vm > 2·q3 + 3·(q3−q1)`` — no engine ever materializes a fence
    float.  Flags are emitted as BIGINT 0/1 (hash-portable).

    Scale shape: identical to robust_scale — one group-keyed rank window,
    one group aggregate, one broadcast join back.
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        F.floor(F.col(value_col).cast("double") * scale)
        .cast("long")
        .alias("vm"),
    )
    w = Window.partitionBy("grp").orderBy(F.col("vm").asc(), F.col("id").asc())
    ranked = base.withColumn("rn", F.row_number().over(w))
    sizes = base.groupBy("grp").agg(F.count("*").alias("n"))
    withr = ranked.join(F.broadcast(sizes), "grp").select(
        "grp",
        "vm",
        "rn",
        F.expr("(n + 3) div 4").alias("_q1r"),
        F.expr("(3 * n + 3) div 4").alias("_q3r"),
    )
    qs = withr.groupBy("grp").agg(
        F.max(F.when(F.col("rn") == F.col("_q1r"), F.col("vm"))).alias("q1"),
        F.max(F.when(F.col("rn") == F.col("_q3r"), F.col("vm"))).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        base.join(F.broadcast(qs), "grp")
        .select(
            F.col("id").alias(id_col),
            F.col("grp").alias(group_col),
            "vm",
            F.col("q1").cast("long").alias("q1_micro"),
            F.col("q3").cast("long").alias("q3_micro"),
            (2 * F.col("vm") < 2 * F.col("q1") - 3 * iqr)
            .cast("long")
            .alias("low_outlier"),
            (2 * F.col("vm") > 2 * F.col("q3") + 3 * iqr)
            .cast("long")
            .alias("high_outlier"),
        )
    )


def tukey_outliers_oracle_sql(
    *,
    group_col: str,
    value_col: str,
    id_col: str,
    table: str,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of [[tukey_outliers]]."""
    return f"""
WITH base AS (
  SELECT {group_col} AS grp, {id_col} AS id,
         CAST(floor(CAST({value_col} AS DOUBLE) * {scale}) AS BIGINT) AS vm
  FROM {table}
),
ranked AS (
  SELECT grp, vm,
         row_number() OVER (PARTITION BY grp ORDER BY vm ASC, id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY grp) AS n
  FROM base
),
qs AS (
  SELECT grp,
         MAX(CASE WHEN rn = (n + 3) // 4 THEN vm END) AS q1,
         MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN vm END) AS q3
  FROM ranked GROUP BY 1
)
SELECT b.id AS {id_col}, b.grp AS {group_col}, b.vm,
       CAST(q1 AS BIGINT) AS q1_micro,
       CAST(q3 AS BIGINT) AS q3_micro,
       CAST(CASE WHEN 2 * b.vm < 2 * q1 - 3 * (q3 - q1) THEN 1 ELSE 0 END
            AS BIGINT) AS low_outlier,
       CAST(CASE WHEN 2 * b.vm > 2 * q3 + 3 * (q3 - q1) THEN 1 ELSE 0 END
            AS BIGINT) AS high_outlier
FROM base b JOIN qs ON b.grp = qs.grp
"""


def vocab_coverage_curve(
    docs: DataFrame,
    *,
    ks: tuple[int, ...] = (100, 1_000, 10_000),
    text_col: str = "text",
    scale: int = 1_000_000,
) -> DataFrame:
    """Tokenizer-design diagnostic: what fraction of token OCCURRENCES a
    top-``K`` vocabulary covers, for each requested ``K`` — the curve that
    decides vocab size (the marginal coverage of the next 10k types is
    read straight off it) and flags OOV-heavy corpora (a curve that
    plateaus low means ids/noise dominate).

    All integer: per-term counts, terms ranked by (freq desc, term asc)
    through [[global_rank]] — the range-partition ranking, so the
    vocab-sized table is NEVER funneled through one partition (at 100 TB
    the type count is itself corpus-scale) — then one conditional
    aggregate per K and ``coverage_ppm = covered·1e6 div total``.
    """
    from pyrope_spark.functions.text import tokens

    counts = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("freq"))
        .withColumn("_negfreq", -F.col("freq"))
    )
    # r11 (§1.2): the rank's distributed path reads its input twice
    # (splitter sampling + the ranged pass) and the final aggregate once
    # more — un-materialized, each consumer re-ran the corpus tokenize +
    # explode + aggregate. Checkpoint the type-cardinality table once;
    # the (now cheap) count feeds global_rank's known_rows shortcut
    # below 200k types.
    counts = counts.localCheckpoint(eager=True)
    n_types = counts.count()
    ranked = global_rank(
        counts, order_cols=("_negfreq", "term"), known_rows=n_types
    )
    aggs = [
        F.sum("freq").cast("long").alias("total_tokens"),
        F.count("*").cast("long").alias("total_types"),
    ]
    for k in ks:
        aggs.append(
            F.sum(F.when(F.col("grank") <= k, F.col("freq")).otherwise(0))
            .cast("long")
            .alias(f"covered_top{k}")
        )
    one = ranked.agg(*aggs)
    # unpivot the single row with ONE explode (a UNION of per-K selects
    # would make Catalyst recompute the corpus aggregate per branch)
    pairs = F.array(
        *[
            F.struct(
                F.lit(k).cast("long").alias("k"),
                F.col(f"covered_top{k}").alias("covered_tokens"),
            )
            for k in ks
        ]
    )
    return (
        one.select(
            F.explode(pairs).alias("p"), "total_tokens", "total_types"
        )
        .select(
            F.col("p.k").alias("k"),
            F.col("p.covered_tokens").alias("covered_tokens"),
            "total_tokens",
            "total_types",
            F.expr(f"p.covered_tokens * {scale} div total_tokens")
            .cast("long")
            .alias("coverage_ppm"),
        )
    )


def vocab_coverage_oracle_sql(
    *,
    ks: tuple[int, ...] = (100, 1_000, 10_000),
    table: str = "documents",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of [[vocab_coverage_curve]]."""
    from pyrope_spark.functions.text import tokens_sql

    k_rows = ", ".join(f"({k})" for k in ks)
    return f"""
WITH counts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest({tokens_sql(text_col)}) AS term FROM {table}
  ) GROUP BY 1
),
ranked AS (
  SELECT freq, row_number() OVER (ORDER BY freq DESC, term ASC) AS grank
  FROM counts
),
kk(k) AS (VALUES {k_rows})
SELECT CAST(kk.k AS BIGINT) AS k,
       CAST(SUM(CASE WHEN grank <= kk.k THEN freq ELSE 0 END) AS BIGINT)
         AS covered_tokens,
       CAST(SUM(freq) AS BIGINT) AS total_tokens,
       CAST(COUNT(*) AS BIGINT) AS total_types,
       CAST(SUM(CASE WHEN grank <= kk.k THEN freq ELSE 0 END) * {scale}
            // SUM(freq) AS BIGINT) AS coverage_ppm
FROM ranked CROSS JOIN kk
GROUP BY kk.k
"""


def nucleus_select_by_quality(
    df: DataFrame,
    *,
    group_col: str,
    quality_col: str,
    id_col: str,
    p_ppm: int = 900_000,
) -> DataFrame:
    """Top-p (nucleus) selection by quality MASS per group: within each
    group, rank rows by (quality desc, id asc) and keep the smallest
    prefix whose quality sum reaches ``p_ppm`` (parts-per-million) of the
    group total — "keep the docs carrying 90% of the quality mass",
    which adapts the cut to each group's quality distribution where a
    fixed top-N or threshold does not (a uniformly-mediocre group keeps
    more rows, a spiky group keeps few).

    The crossing row is INCLUDED (standard nucleus semantics).  All
    integer by cross-multiplication: keep iff
    ``(cum − q)·1e6 < p_ppm·total`` — no division, no float threshold.
    Negative or zero quality rows sort last and are kept only if the
    prefix has not crossed.

    Scale shape: one group-keyed rank/cumsum window + one group
    aggregate broadcast back.
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        F.col(quality_col).cast("long").alias("q"),
    )
    w = Window.partitionBy("grp").orderBy(F.col("q").desc(), F.col("id").asc())
    cum = base.withColumn(
        "rank_in_group", F.row_number().over(w).cast("long")
    ).withColumn(
        "cum_q",
        F.sum("q").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    totals = base.groupBy("grp").agg(F.sum("q").alias("total_q"))
    return (
        cum.join(F.broadcast(totals), "grp")
        .filter(
            (F.col("cum_q") - F.col("q")) * 1_000_000
            < F.lit(p_ppm) * F.col("total_q")
        )
        .select(
            F.col("id").alias(id_col),
            F.col("grp").alias(group_col),
            F.col("q").alias(quality_col),
            "rank_in_group",
            "cum_q",
            F.col("total_q").cast("long").alias("total_q"),
        )
    )


def nucleus_select_oracle_sql(
    *,
    group_col: str,
    quality_sql: str,
    id_col: str,
    table: str,
    p_ppm: int = 900_000,
) -> str:
    """DuckDB twin of [[nucleus_select_by_quality]] (``quality_sql`` is an
    integer expression over the row)."""
    return f"""
WITH base AS (
  SELECT {group_col} AS grp, {id_col} AS id,
         CAST({quality_sql} AS BIGINT) AS q
  FROM {table}
),
cum AS (
  SELECT grp, id, q,
         CAST(row_number() OVER w AS BIGINT) AS rank_in_group,
         CAST(SUM(q) OVER (PARTITION BY grp ORDER BY q DESC, id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_q
  FROM base
  WINDOW w AS (PARTITION BY grp ORDER BY q DESC, id ASC)
),
totals AS (SELECT grp, SUM(q) AS total_q FROM base GROUP BY 1)
SELECT c.id AS {id_col}, c.grp AS {group_col}, c.q AS quality,
       c.rank_in_group, c.cum_q, CAST(t.total_q AS BIGINT) AS total_q
FROM cum c JOIN totals t ON c.grp = t.grp
WHERE (c.cum_q - c.q) * 1000000 < {p_ppm} * t.total_q
"""


def chunk_documents_strided(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 16,
    stride: int = 8,
    impl: str = "arrow",
) -> DataFrame:
    """Sliding-window chunking with overlap: windows of ``chunk_tokens``
    starting every ``stride`` tokens — the context-preserving variant of
    [[chunk_documents]] that RAG indexing and long-context training prep
    actually use (a fact split across a hard chunk boundary is lost to
    retrieval; an overlapping window keeps it whole in SOME chunk).

    Window starts run while ``start < n_tokens`` with the FIRST window
    always emitted (empty docs yield nothing); the final windows may be
    short (no padding — token counts stay honest).  Zero shuffles at any
    corpus size on either path: ``impl='arrow'`` (default, r11) runs a
    vectorized per-batch kernel, ``'expr'`` keeps the pure-expression
    split/sequence/slice/explode shape (the oracle-twin formulation; the
    kernel is pytest-pinned value-identical to it).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    c, s = chunk_tokens, stride
    if impl == "arrow":
        # r11 opt (guide §4.2): the expression path pays the interpreted
        # HOF chain (transform + slice + array_join per window) per doc;
        # this kernel is plain Python list slicing over tokens_py (the
        # exact tokens() mirror), pinned value-identical by pytest
        from pyspark.sql import types as T

        from pyrope_spark.functions.text import tokens_py

        id_field = docs.schema[id_col]
        schema = T.StructType(
            [
                T.StructField(id_col, id_field.dataType),
                T.StructField("chunk_idx", T.LongType()),
                T.StructField("start_token", T.LongType()),
                T.StructField("chunk_n_tokens", T.LongType()),
                T.StructField("chunk_text", T.StringType()),
            ]
        )

        def run(batches):
            for pdf in batches:
                ids: list = []
                idxs: list = []
                starts: list = []
                lens: list = []
                texts: list = []
                for did, text in zip(
                    pdf[id_col].tolist(), pdf[text_col].tolist()
                ):
                    toks_l = tokens_py(text)
                    for i, st in enumerate(range(0, len(toks_l), s)):
                        piece = toks_l[st: st + c]
                        ids.append(did)
                        idxs.append(i)
                        starts.append(st)
                        lens.append(len(piece))
                        texts.append(" ".join(piece))
                if ids:
                    yield pd.DataFrame(
                        {
                            id_col: ids,
                            "chunk_idx": idxs,
                            "start_token": starts,
                            "chunk_n_tokens": lens,
                            "chunk_text": texts,
                        }
                    )

        return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
            run, schema
        )
    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    chunks = toks.select(
        id_col,
        F.expr(
            f"CASE WHEN size(_t) = 0 THEN array() "
            f"ELSE transform("
            f"sequence(0, cast(ceil(size(_t) / {s}.0) AS INT) - 1), "
            f"i -> named_struct("
            f"'chunk_idx', cast(i AS BIGINT), "
            f"'start_token', cast(i * {s} AS BIGINT), "
            f"'chunk_n_tokens', cast(size(slice(_t, i * {s} + 1, {c})) AS BIGINT), "
            f"'chunk_text', array_join(slice(_t, i * {s} + 1, {c}), ' '))) END"
        ).alias("_chunks"),
    ).select(id_col, F.explode("_chunks").alias("_ch"))
    return chunks.select(
        id_col,
        F.col("_ch.chunk_idx").alias("chunk_idx"),
        F.col("_ch.start_token").alias("start_token"),
        F.col("_ch.chunk_n_tokens").alias("chunk_n_tokens"),
        F.col("_ch.chunk_text").alias("chunk_text"),
    )


def chunk_strided_oracle_sql(
    *,
    chunk_tokens: int = 16,
    stride: int = 8,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of [[chunk_documents_strided]]."""
    from pyrope_spark.functions.text import tokens_sql

    c, s = chunk_tokens, stride
    return f"""
WITH tk AS (
  SELECT {id_col}, {tokens_sql(text_col)} AS t FROM {table}
),
idx AS (
  SELECT {id_col}, t, CAST(gs AS BIGINT) AS i
  FROM tk, unnest(generate_series(0,
    CAST(ceil(len(t) / {s}.0) AS BIGINT) - 1)) AS g(gs)
  WHERE len(t) > 0
)
SELECT {id_col},
       i AS chunk_idx,
       CAST(i * {s} AS BIGINT) AS start_token,
       CAST(len(t[CAST(i * {s} + 1 AS INT):CAST(i * {s} + {c} AS INT)])
            AS BIGINT) AS chunk_n_tokens,
       array_to_string(
         t[CAST(i * {s} + 1 AS INT):CAST(i * {s} + {c} AS INT)], ' ')
         AS chunk_text
FROM idx
"""
