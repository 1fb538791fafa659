"""Duplicate-passage detection — exact substring-level dedup at corpus scale.

The substring-dedup recipe of Lee et al. 2021 ("Deduplicating Training Data
Makes Language Models Better") finds verbatim passages repeated anywhere in
the corpus and marks their spans for removal. The published implementation
builds a monolithic suffix array; that is a single-machine shape. The
standard distributed equivalent (used here) is sliding-window fingerprinting:

1. slide a ``window``-token window over every document (stride 1) and
   fingerprint each window;
2. a window whose fingerprint occurs more than once corpus-wide is part of a
   duplicated passage (any repeat of >= ``window`` tokens produces at least
   one repeated window, so recall is exact for passages of that length —
   modulo fingerprint collisions);
3. merge overlapping/adjacent duplicated windows per document into maximal
   spans (gaps-and-islands).

Scale shape (100 TB): the window explode is linear in corpus tokens
(one row per token position — same order as the corpus itself); duplicate
marking is ONE hash shuffle on the fingerprint (window functions, no
groupBy+join-back second shuffle); span merging is ONE shuffle on doc_id.
No all-pairs anywhere. Stride > 1 trades recall for an s-fold explode
reduction when passages are long.

Fingerprints: ``portable`` (default) uses the engine-portable Horner
rolling hash (mod a ~1e15 prime) so the DuckDB oracle replicates the
pipeline bit-for-bit; ``xxhash64`` is the production path (64-bit) — the
two modes' span sets are pytest-gated equal, and a brute-force reference
check guards against structured-collision regressions.

Reference behavior anchor: the corpus-dedup north star in BASELINE.json;
no reference-engine analog (the reference dedups whole keys only,
VectorStore.cs upsert semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyrope_spark.functions.text import (
    char_fp_rolling,
    char_fp_rolling_sql,
    tokens,
    tokens_sql,
    word_ngrams_from_tokens,
    word_ngrams_from_tokens_sql,
)


def _window_fp(shingle: Column, fingerprint: str) -> Column:
    # portable = the Horner rolling hash, NOT char_fp: char_fp's
    # arithmetic-progression weights collide systematically on structured
    # vocabularies (found by the brute-force reference check — 8 phantom
    # spans on a 30-doc 12-token corpus), which for THIS operator is a
    # correctness failure (false duplicate passages), not hash noise.
    if fingerprint in ("portable", "portable_expr"):
        # "portable_expr" = explicit alias kept for the kernel parity test
        return char_fp_rolling(shingle)
    if fingerprint == "xxhash64":
        return F.xxhash64(shingle)
    raise ValueError(f"unknown fingerprint mode {fingerprint!r}")


def _window_fp_rows_arrow(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    window: int,
) -> DataFrame:
    """(doc_id, pos, fp) for every stride-1 token window — value-identical
    to the expression pipeline (tokens -> word n-grams -> posexplode ->
    char_fp_rolling): same tokenization (``tokens_py``), same " "-joined
    window strings, same exact int64 Horner fold (``horner_fps_py``).
    Docs with fewer than ``window`` tokens emit nothing."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from pyrope_spark.functions.text import horner_fps_py, tokens_py

    id_field = docs.schema[id_col]
    schema = T.StructType(
        [
            T.StructField("doc_id", id_field.dataType),
            T.StructField("pos", T.LongType()),
            T.StructField("fp", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            counts = np.zeros(len(pdf), dtype=np.int64)
            units: list[str] = []
            for r, text in enumerate(pdf[text_col].tolist()):
                t = tokens_py(text)
                nw = len(t) - window + 1
                if nw <= 0:
                    continue
                counts[r] = nw
                units.extend(
                    " ".join(t[i : i + window]) for i in range(nw)
                )
            if not units:
                continue
            fps = horner_fps_py(units)
            pos = np.concatenate(
                [np.arange(1, c + 1) for c in counts if c > 0]
            )
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(ids, counts),
                    "pos": pos,
                    "fp": fps,
                }
            )

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run, schema
    )


def duplicate_window_positions(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    stride: int = 1,
    fingerprint: str = "portable",
) -> DataFrame:
    """Every window position that is part of a corpus-wide duplicated passage.

    Returns (doc_id, pos, fp, n_occurrences, cross_doc): ``pos`` is the
    1-based token index of the window start, ``n_occurrences`` the global
    fingerprint count (> 1 by construction), ``cross_doc`` whether the
    repeat spans more than one document (min(doc) != max(doc) over the
    fingerprint — no collect_set, stays a streaming window aggregate).
    """
    if window < 2:
        raise ValueError("window must be >= 2 tokens")
    if stride < 1:
        raise ValueError("stride must be >= 1")
    if fingerprint == "portable_arrow":
        # r10: vectorized Arrow twin of the portable expression path,
        # parity pytest-gated.  Measured at sf0.1: better min (1.5 s vs
        # 2.7 s) but much higher variance — the docs scan yields only a
        # few input partitions, so the Python stage runs near-serial and
        # inherits worker-scheduling noise, while the expression path
        # rides whole-stage codegen across all cores.  The stable
        # expression path stays the default; callers with many input
        # partitions can opt in.
        wins = _window_fp_rows_arrow(
            docs, id_col=id_col, text_col=text_col, window=window
        )
        if stride > 1:
            wins = wins.where((F.col("pos") - 1) % stride == 0)
    else:
        toks = docs.select(
            F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("t")
        ).where(F.size("t") >= window)
        wins = toks.select(
            "doc_id",
            F.posexplode(word_ngrams_from_tokens(F.col("t"), window)).alias(
                "pos0", "shingle"
            ),
        )
        if stride > 1:
            wins = wins.where(F.col("pos0") % stride == 0)
        wins = wins.select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            _window_fp(F.col("shingle"), fingerprint).alias("fp"),
        )
    w = Window.partitionBy("fp")
    marked = wins.select(
        "doc_id",
        "pos",
        "fp",
        F.count(F.lit(1)).over(w).alias("n_occurrences"),
        (F.min("doc_id").over(w) != F.max("doc_id").over(w)).alias("cross_doc"),
    )
    return marked.where(F.col("n_occurrences") > 1)


def duplicate_passages(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    fingerprint: str = "portable",
) -> DataFrame:
    """Maximal duplicated-passage spans per document.

    Output: (doc_id, span_start, span_end, span_tokens, n_windows,
    cross_doc) — token indices 1-based inclusive; a span at [s, e] means
    tokens s..e verbatim-repeat somewhere in the corpus (each constituent
    window does; the maximal repeated passage is within ±(window-1) tokens
    of the span bounds — the standard sliding-window resolution bound).
    ``cross_doc`` is true if ANY window in the span repeats outside this
    document. Spans are merged when windows overlap or touch
    (next.pos <= prev_end + 1), i.e. duplicated token coverage is
    contiguous. Stride is fixed at 1 here: span merging assumes full
    coverage; use :func:`duplicate_window_positions` directly for strided
    scans.
    """
    dup = duplicate_window_positions(
        docs,
        id_col=id_col,
        text_col=text_col,
        window=window,
        stride=1,
        fingerprint=fingerprint,
    ).select(
        "doc_id", "pos", (F.col("pos") + window - 1).alias("end"), "cross_doc"
    )
    order = Window.partitionBy("doc_id").orderBy("pos")
    prev = order.rowsBetween(Window.unboundedPreceding, -1)
    flagged = dup.select(
        "doc_id",
        "pos",
        "end",
        "cross_doc",
        F.when(
            F.col("pos") > F.coalesce(F.max("end").over(prev), F.lit(-1)) + 1, 1
        )
        .otherwise(0)
        .alias("new_span"),
    )
    grouped = flagged.select(
        "doc_id",
        "pos",
        "end",
        "cross_doc",
        F.sum("new_span").over(order.rowsBetween(Window.unboundedPreceding, 0)).alias("grp"),
    )
    return grouped.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("span_start"),
        F.max("end").alias("span_end"),
        (F.max("end") - F.min("pos") + 1).cast("long").alias("span_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.max(F.col("cross_doc").cast("int")).cast("boolean").alias("cross_doc"),
    ).drop("grp")


def duplicate_passages_oracle_sql(
    *, table: str = "documents", id_col: str = "doc_id",
    text_col: str = "text", window: int = 8,
) -> str:
    """DuckDB rendering of the full portable-fingerprint pipeline
    (tokenize -> windows -> char_fp -> global count/min/max windows ->
    gaps-and-islands), kept in lockstep with the Spark plan above."""
    wins_expr = word_ngrams_from_tokens_sql("t", window)
    # NB: the shingle must be materialized as a plain column BEFORE the
    # fingerprint SQL is applied — its lambdas bind their own variables,
    # which would shadow an unnest ordinal of the same name inside `w[i]`.
    fp_expr = char_fp_rolling_sql("shingle")
    return f"""
WITH tk AS (
  SELECT {id_col} AS doc_id, {tokens_sql(text_col)} AS t FROM {table}
), tw AS (
  SELECT doc_id, {wins_expr} AS w FROM tk WHERE len(t) >= {window}
), sh AS (
  SELECT doc_id, i AS pos, w[i] AS shingle
  FROM tw, unnest(range(1, len(w) + 1)) AS u(i)
), pos AS (
  SELECT doc_id, pos, {fp_expr} AS fp FROM sh
), marked AS (
  SELECT doc_id, pos,
         count(*) OVER (PARTITION BY fp) AS n_occurrences,
         (min(doc_id) OVER (PARTITION BY fp)
          != max(doc_id) OVER (PARTITION BY fp)) AS cross_doc
  FROM pos
), dup AS (
  SELECT doc_id, pos, pos + {window} - 1 AS e, cross_doc
  FROM marked WHERE n_occurrences > 1
), flagged AS (
  SELECT doc_id, pos, e, cross_doc,
         CASE WHEN pos > COALESCE(max(e) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS new_span
  FROM dup
), grouped AS (
  SELECT doc_id, pos, e, cross_doc,
         sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM flagged
)
SELECT doc_id, min(pos) AS span_start, max(e) AS span_end,
       CAST(max(e) - min(pos) + 1 AS BIGINT) AS span_tokens,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(max(CAST(cross_doc AS INT)) AS BOOLEAN) AS cross_doc
FROM grouped
GROUP BY doc_id, grp
"""


def strip_duplicate_spans(
    docs: DataFrame,
    spans: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    fingerprint: str = "portable",
    cross_doc_only: bool = False,
) -> DataFrame:
    """Remove flagged duplicated passages from each document's text — the
    removal half of the Lee et al. substring-dedup recipe.

    ``spans`` defaults to :func:`duplicate_passages` over the same corpus;
    pass a pre-computed/filtered span table to control policy (e.g. only
    spans above a length, only cross-doc). ``cross_doc_only=True`` keeps
    within-document repetition (some pipelines treat that as a quality
    signal handled elsewhere). Policy note: this removes EVERY flagged
    occurrence — the published "keep one copy" refinement is a caller-side
    span filter (drop the span of the minimum (doc_id, span_start) holder
    from the table before stripping).

    Output: (doc_id, clean_text, n_tokens, n_tokens_removed). Docs with no
    flagged span pass through with their tokenized text re-joined (single
    spacing — byte-identical only for single-space corpora; tokenization is
    the engine's normal form).

    Scale shape: tokens posexplode once; the span table joins on doc_id
    (spans per doc are few — the join fans out by spans-per-doc, not
    corpus x corpus) and the containment test is a filter; reassembly is
    one groupBy(doc) with an order-struct sort_array — no windows, two
    shuffles total beyond the span build.
    """
    if spans is None:
        # r10 opt (guide §1.2): the span table is consumed by the join
        # below but its lineage (window fingerprint + two shuffles) was
        # re-inlined per consumer branch of the strip plan; it is
        # per-doc-few-rows — materialize it once.  Values unchanged.
        spans = duplicate_passages(
            docs, id_col=id_col, text_col=text_col, window=window,
            fingerprint=fingerprint,
        ).localCheckpoint(eager=True)
    if cross_doc_only:
        spans = spans.where(F.col("cross_doc"))
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("t")
    ).select(
        "doc_id", F.posexplode("t").alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
    sp = spans.select("doc_id", "span_start", "span_end")
    flagged = toks.join(sp, "doc_id", "left").withColumn(
        "_in_span",
        F.col("span_start").isNotNull()
        & (F.col("pos") >= F.col("span_start"))
        & (F.col("pos") <= F.col("span_end")),
    )
    # a token may match several spans of its doc -> reduce to any-match
    per_tok = flagged.groupBy("doc_id", "pos", "token").agg(
        F.max(F.col("_in_span").cast("int")).alias("_dup")
    )
    return per_tok.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_dup") == 0, F.struct("pos", "token"))
                    )
                ),
                lambda s: s["token"],
            ),
        ).alias("clean_text"),
        F.sum(F.lit(1) - F.col("_dup")).cast("long").alias("n_tokens"),
        F.sum("_dup").cast("long").alias("n_tokens_removed"),
    )


def strip_duplicate_spans_oracle_sql(
    *, table: str = "documents", id_col: str = "doc_id",
    text_col: str = "text", window: int = 8,
) -> str:
    """DuckDB rendering: spans CTE (the duplicate_passages oracle) + token
    containment + string_agg reassembly."""
    spans_sql = duplicate_passages_oracle_sql(
        table=table, id_col=id_col, text_col=text_col, window=window
    )
    return f"""
WITH spans AS ({spans_sql}),
tk2 AS (
  SELECT {id_col} AS doc_id, {tokens_sql(text_col)} AS t FROM {table}
), tok AS (
  SELECT doc_id, i AS pos, t[i] AS token
  FROM tk2, unnest(range(1, len(t) + 1)) AS u(i)
), marked AS (
  SELECT tok.doc_id, tok.pos, tok.token,
         max(CASE WHEN s.span_start IS NOT NULL
                   AND tok.pos BETWEEN s.span_start AND s.span_end
                  THEN 1 ELSE 0 END) AS dup
  FROM tok LEFT JOIN spans s ON tok.doc_id = s.doc_id
  GROUP BY tok.doc_id, tok.pos, tok.token
)
SELECT doc_id,
       COALESCE(string_agg(CASE WHEN dup = 0 THEN token END, ' ' ORDER BY pos), '')
         AS clean_text,
       CAST(sum(1 - dup) AS BIGINT) AS n_tokens,
       CAST(sum(dup) AS BIGINT) AS n_tokens_removed
FROM marked
GROUP BY doc_id
"""


# ----------------------------------------------------------- winnowing

WINNOW_K = 8  # k-gram length in chars
WINNOW_W = 8  # window of consecutive k-gram hashes


def winnow_fingerprints(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    mode: str = "expr",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm): hash every k-gram, slide a window of ``w``
    consecutive hashes, and in each window select the MINIMUM hash
    (rightmost on ties — robust winnowing).  Guarantees: at least one
    selected fingerprint in every w consecutive positions (gap <= w), and
    any shared substring of length >= w + k - 1 yields at least one
    shared selected fingerprint — the local-selection property that makes
    fingerprint-set overlap a sound plagiarism/near-dup signal at a
    density of ~2/(w+1) instead of every position.

    Distinct from the stride-1 full fingerprinting in
    :func:`duplicate_window_positions` (exact recall, n rows/doc) and
    from CDC chunking (boundary selection): winnowing SUBSAMPLES the
    fingerprint stream content-deterministically, so two engines (or two
    corpus versions) select identical (position, fp) pairs.

    Two parity-equal paths (pytest-gated identical):

    - ``mode='expr'`` — pure expression pipeline, the engine-portable
      oracle twin.  Per-window mins are HOISTED into one precomputed
      array so cost is O(n*w) integer ops per doc (the first version
      recomputed array_min(slice) inside the tie filter — O(n*w^2) and
      ~8x slower at probe scale).
    - ``mode='arrow'`` — the 100 TB path: Arrow-batched numpy kernel,
      docs grouped by length inside each batch and processed as ONE 2-D
      array per group (Horner hashes via k vectorized folds,
      sliding_window_view mins, reversed-argmin for rightmost ties) —
      no per-row Python beyond group assembly, ~30x the expression
      path's throughput at 1M docs.

    Both use the Horner rolling hash mod a ~1e15 prime
    (:data:`pyrope_spark.functions.text.FP_ROLL_P`) in exact int64, so
    every engine/path selects identical (position, fp) pairs.  Docs
    shorter than k produce no output; docs with fewer than w k-grams
    produce the single global minimum.

    Output: (id, gram_pos — 1-based char position of the k-gram, fp).
    """
    if mode == "arrow":
        return _winnow_arrow(
            docs, text_col=text_col, id_col=id_col, k=k, w=w
        )
    from pyrope_spark.functions.text import FP_ROLL_P, FP_ROLL_R, FP_ROLL_SEED

    fp_q = (
        f"aggregate(transform(split(substring(_s, q, {k}), ''), "
        f"c -> cast(ascii(c) as bigint)), cast({FP_ROLL_SEED} as bigint), "
        f"(acc, c) -> (acc * {FP_ROLL_R} + c) % {FP_ROLL_P})"
    )
    src = docs.select(
        F.col(id_col), F.col(text_col).alias("_s")
    ).filter(F.length("_s") >= k)
    hashed = src.withColumn(
        "_hs",
        F.expr(f"transform(sequence(1, length(_s) - {k} + 1), q -> {fp_q})"),
    ).withColumn(
        # hoisted per-window minimum (windows i = 1..max(1, n_h - w + 1))
        "_mins",
        F.expr(
            f"transform(sequence(1, greatest(1, size(_hs) - {w} + 1)), "
            f"i -> array_min(slice(_hs, i, {w})))"
        ),
    )
    # rightmost argmin per window against the hoisted min
    sel = F.expr(
        f"array_distinct(transform(sequence(1, size(_mins)), "
        f"i -> struct("
        f"array_max(filter(sequence(i, least(i + {w} - 1, size(_hs))), "
        f"j -> element_at(_hs, j) = element_at(_mins, i))) AS pos, "
        f"element_at(_mins, i) AS fp)))"
    )
    out = hashed.select(id_col, F.explode(sel).alias("_sel"))
    return out.select(
        id_col,
        F.col("_sel.pos").cast("long").alias("gram_pos"),
        F.col("_sel.fp").alias("fp"),
    )


def _winnow_arrow(
    docs: DataFrame,
    *,
    text_col: str,
    id_col: str,
    k: int,
    w: int,
) -> DataFrame:
    """Vectorized winnowing kernel (see :func:`winnow_fingerprints`
    mode='arrow').  Exact int64 Horner arithmetic — acc < 1e15, acc*131 +
    255 < 2^63, so numpy int64 matches the SQL engines bit-for-bit."""
    from collections import defaultdict
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from pyrope_spark.functions.text import FP_ROLL_P, FP_ROLL_R, FP_ROLL_SEED

    schema = T.StructType(
        [
            T.StructField("_wid", T.LongType()),
            T.StructField("gram_pos", T.LongType()),
            T.StructField("fp", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            groups: dict[int, list[tuple[int, np.ndarray]]] = defaultdict(list)
            for wid, t in zip(pdf["_wid"].tolist(), pdf["_t"].tolist()):
                n = len(t)
                if n >= k:
                    codes = np.frombuffer(
                        t.encode("utf-8"), dtype=np.uint8
                    )
                    if len(codes) != n:  # non-ASCII: fall back to ord()
                        codes = np.array([ord(c) for c in t], dtype=np.int64)
                    groups[n].append((wid, codes.astype(np.int64)))
            ids_out: list[np.ndarray] = []
            pos_out: list[np.ndarray] = []
            fp_out: list[np.ndarray] = []
            for n, members in groups.items():
                wids = np.array([m[0] for m in members], dtype=np.int64)
                codes = np.stack([m[1] for m in members])  # (m, n)
                nh = n - k + 1
                h = np.full((len(members), nh), FP_ROLL_SEED, dtype=np.int64)
                for j in range(k):  # k vectorized Horner folds
                    h = (h * FP_ROLL_R + codes[:, j:j + nh]) % FP_ROLL_P
                if nh <= w:
                    mn = h.min(axis=1, keepdims=True)
                    rev = h[:, ::-1]
                    idx = nh - 1 - rev.argmin(axis=1)
                    sel_pos = idx[:, None]
                else:
                    wv = np.lib.stride_tricks.sliding_window_view(h, w, axis=1)
                    rev = wv[:, :, ::-1]
                    idx = w - 1 - rev.argmin(axis=2)  # rightmost min
                    sel_pos = idx + np.arange(wv.shape[1])[None, :]
                for r in range(sel_pos.shape[0]):
                    upos = np.unique(sel_pos[r])
                    ids_out.append(np.full(len(upos), wids[r]))
                    pos_out.append(upos + 1)  # 1-based
                    fp_out.append(h[r, upos])
            if not ids_out:
                continue
            yield pd.DataFrame(
                {
                    "_wid": np.concatenate(ids_out),
                    "gram_pos": np.concatenate(pos_out),
                    "fp": np.concatenate(fp_out),
                }
            )

    with_ids = docs.select(
        F.col(id_col), F.col(text_col).alias("_t")
    ).withColumn("_wid", F.col(id_col).cast("long"))
    out = with_ids.select("_wid", "_t").mapInPandas(run, schema)
    return out.select(
        F.col("_wid").alias(id_col), "gram_pos", "fp"
    )


def winnow_fingerprints_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> str:
    """DuckDB twin of :func:`winnow_fingerprints` (list_* lambdas)."""
    from pyrope_spark.functions.text import FP_ROLL_P, FP_ROLL_R, FP_ROLL_SEED

    fp_q = (
        f"list_reduce(list_prepend(CAST({FP_ROLL_SEED} AS BIGINT), "
        f"list_transform(string_split(substring(s, q, {k}), ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, c) -> (acc * {FP_ROLL_R} + c) % {FP_ROLL_P})"
    )
    return f"""
WITH src AS (
  SELECT {id_col}, {text_col} AS s FROM {table} WHERE length({text_col}) >= {k}
), hashed AS (
  SELECT {id_col},
         list_transform(range(1, length(s) - {k} + 2), q -> {fp_q}) AS hs
  FROM src
), sel AS (
  SELECT {id_col},
         list_transform(
           range(1, greatest(1, len(hs) - {w} + 1) + 1),
           i -> struct_pack(
             pos := list_max(list_filter(
               range(i, least(i + {w} - 1, len(hs)) + 1),
               j -> hs[j] = list_min(list_slice(hs, i, least(i + {w} - 1, len(hs)))))),
             fp := list_min(list_slice(hs, i, least(i + {w} - 1, len(hs))))
           )) AS sels
  FROM hashed
)
SELECT DISTINCT {id_col}, CAST(u.sel.pos AS BIGINT) AS gram_pos, u.sel.fp AS fp
FROM sel, unnest(sels) AS u(sel)
"""
