"""Text-analysis column expressions for large-scale training-data pipelines.

Beyond the reference's surface (per BASELINE.json north star): language-ID,
quality scoring, token counting, shingling, and document fingerprinting over
a ``documents`` table. Everything here is a native column expression (no
Python UDFs), so it runs inside whole-stage codegen at 100 TB, and every
function has a DuckDB-SQL rendering kept in lockstep for the correctness
gate.

Cross-engine determinism rules used throughout:
- tokenization = lowercase, split on runs of whitespace, drop empties;
- hashing = explicit integer arithmetic (position-weighted character sums,
  modular affine transforms), never engine-native hash functions;
- ratios rounded by the caller before comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared deterministic-hash constants (Knuth multiplicative + a small prime
# field for affine re-hashing; all intermediates fit in int64).
FP_WEIGHT_MULT = 2654435761
FP_PRIME = 1000003

STOPWORDS = (
    "the a an and of to in is are was on for with as by at or it this that "
    "be from".split()
)

# tiny function-word profiles for the n-gram/stopword language heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "is", "in", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "los", "las", "un", "una", "es"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "von", "zu", "ist", "den", "mit", "ein"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "人", "这"],
}


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens with empties dropped. NULL text tokenizes
    to an EMPTY array (not NULL): Spark's legacy ``size(NULL) = -1`` would
    otherwise leak -1 token counts and phantom ``sequence(0, -1)`` chunks
    into every operator built on this helper, diverging from the DuckDB
    oracles."""
    return F.filter(
        F.split(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+"),
        lambda t: F.length(t) > 0,
    )


def tokens_sql(text_expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower(trim(coalesce({text_expr}, ''))), "
        f"'\\s+'), t -> length(t) > 0)"
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_fp(token: Column) -> Column:
    """Position-weighted character fingerprint:
    Σ codepoint(c_i) * (((i+1) * 2654435761) mod 1000003) — order-sensitive,
    pure integer math, identical in any engine."""
    return F.aggregate(
        F.transform(
            F.split(token, ""),
            lambda c, i: F.ascii(c).cast("long")
            * F.pmod((i + 1).cast("long") * F.lit(FP_WEIGHT_MULT), F.lit(FP_PRIME)),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def char_fp_sql(token_expr: str) -> str:
    """Uncorrelated rendering: the char list is inlined (DuckDB cannot bind
    outer columns inside a derived-table subquery)."""
    cs = f"string_split({token_expr}, '')"
    return (
        f"COALESCE(list_sum(list_transform(range(1, len({cs}) + 1), "
        f"i -> ascii(({cs})[i]) * ((i * {FP_WEIGHT_MULT}) % {FP_PRIME}))), 0)"
    )


def doc_fingerprint(text: Column) -> Column:
    """Whole-document fingerprint over characters (rolling-hash equivalent,
    order-sensitive)."""
    return char_fp(text)


def word_ngrams_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles over an ALREADY-MATERIALIZED token array.

    Prefer this over :func:`word_ngrams` whenever the plan can hold a token
    column: composing on raw text inlines the regex-tokenize subtree at every
    ``element_at`` site, and the (interpreted, non-codegen) HOF then re-splits
    the text ~n times per shingle — measured 13x slower on the sf0.1 corpus."""
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )
    )


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings ('w1 w2 w3'). See the performance
    caveat on :func:`word_ngrams_from_tokens` — in multi-step plans,
    materialize ``tokens(text)`` in a projection first."""
    return word_ngrams_from_tokens(tokens(text), n)


def word_ngrams_from_tokens_sql(tokens_col: str, n: int = 3) -> str:
    """Render over an existing tokens column (use ``tokens_sql`` in a CTE
    first — DuckDB cannot bind correlated columns in derived tables)."""
    t = tokens_col
    parts = " || ' ' || ".join(f"{t}[i + {j}]" for j in range(n))
    return (
        f"(CASE WHEN len({t}) < {n} THEN [] "
        f"ELSE list_transform(range(1, len({t}) - {n} + 2), i -> ({parts})) END)"
    )


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks)
    )


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring features: length, token stats, stopword ratio, mean
    token length, alpha ratio — composable into downstream filter scores."""
    toks = tokens(text)
    n_tok = F.size(toks)
    total_tok_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    alpha_chars = F.length(F.regexp_replace(F.lower(text), r"[^a-z]", ""))
    return {
        "n_chars": F.length(text).cast("long"),
        "n_tokens": n_tok.cast("long"),
        "mean_token_len": F.when(n_tok == 0, F.lit(0.0)).otherwise(
            total_tok_len.cast("double") / n_tok
        ),
        "stopword_ratio": stopword_ratio(text),
        "alpha_ratio": F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
            alpha_chars.cast("double") / F.length(text)
        ),
    }


def quality_score(text: Column) -> Column:
    """Single scalar in [0,1]: penalize too-short docs, no-stopword docs,
    extreme token lengths. A standard pretraining-filter shape (Gopher-style
    heuristics) with deterministic arithmetic."""
    f = quality_features(text)
    len_ok = F.least(F.lit(1.0), f["n_tokens"].cast("double") / F.lit(20.0))
    sw_ok = F.least(F.lit(1.0), f["stopword_ratio"] * F.lit(5.0))
    tok_ok = F.when(
        (f["mean_token_len"] >= 2.0) & (f["mean_token_len"] <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return F.round((len_ok + sw_ok + tok_ok) / F.lit(3.0), 6)


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(words)))
        for lang, words in LANG_PROFILES.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax language over function-word hit counts; zero scores -> 'und'.
    Deterministic tie order: the LAST profile in LANG_PROFILES order wins ties
    (reversed iteration + strict '>' keeps the first-processed value). The
    DuckDB oracle (`lang_id_from_scores_sql`) mirrors this construction."""
    scores = lang_scores(text)
    best = F.lit("und")
    best_score = F.lit(0)
    # reversed + strict '>': first-processed (= last-declared) profile wins ties
    for lang in reversed(list(scores)):
        s = scores[lang]
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def lang_scores_from_tokens_sql(tokens_col: str) -> dict[str, str]:
    out = {}
    for lang, words in LANG_PROFILES.items():
        lst = ", ".join(f"'{w}'" for w in words)
        out[lang] = f"len(list_filter({tokens_col}, x -> list_contains([{lst}], x)))"
    return out


def lang_id_from_scores_sql(score_cols: dict[str, str]) -> str:
    """Argmax CASE chain over per-language score columns (compute the scores
    in a CTE first to keep the SQL small). Construction mirrors the Spark
    ``lang_id`` fold exactly, so tie behavior matches."""
    case = "'und'"
    best = "0"
    for lang in reversed(list(LANG_PROFILES)):
        expr = score_cols[lang]
        case = f"CASE WHEN {expr} > {best} THEN '{lang}' ELSE {case} END"
        best = f"CASE WHEN {expr} > {best} THEN {expr} ELSE {best} END"
    return case


# Rolling polynomial fingerprint (Rabin-Karp form). Stronger than char_fp
# for dedup-critical paths: char_fp's position weights form an arithmetic
# progression ((i+1)*A mod P), so adjacent weights differ by a CONSTANT and
# structured vocabularies (tokens differing only in digits, e.g. "w3 w5" vs
# "w4 w4") produce systematic collisions — demonstrated by the passages
# brute-force reference check. Horner weights r^i mod p have no such
# linear structure; collisions are ~|corpus|^2 / 1e15 random.
FP_ROLL_R = 131
FP_ROLL_P = 999999999999989  # prime ~1e15; acc*r + c stays far inside int64
FP_ROLL_SEED = 7


import re as _re

# Java-regex \s (no unicode classes) — keeps Python-side tokenization
# identical to the Spark/DuckDB expression path on ASCII corpora (the
# dedup Arrow kernels' convention since the minhash arrow path)
_WS_RE_PY = _re.compile(r"[ \t\n\x0b\f\r]+")


def tokens_py(text: str | None) -> list[str]:
    """Exact Python mirror of :func:`tokens` (lowercased whitespace split,
    empties dropped) for Arrow kernels.

    No ``.strip()`` (r10 ADVICE): Python ``str.strip()`` removes Unicode
    whitespace (\\u00a0, \\u2028, ...) that the expression path's
    ``trim()`` (spaces only) / Java ``\\s+`` split do not, so it diverged
    on non-ASCII corpora. Leading/trailing Java-``\\s`` runs already
    yield empty fragments that the filter drops, and ``trim``'s
    space-stripping is subsumed by the split — the regex alone is the
    exact mirror."""
    if not text:
        return []
    return [t for t in _WS_RE_PY.split(text.lower()) if t]


def horner_fps_py(units: list[str]):
    """Vectorized exact-int64 Horner fingerprints for a list of strings —
    the Python mirror of :func:`char_fp_rolling`, one numpy fold per char
    position (bounded by the longest unit) instead of a per-unit python
    char loop.  Returns an int64 ndarray aligned with ``units``."""
    import numpy as np

    n = len(units)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    cps = [
        np.frombuffer(u.encode("utf-32-le"), dtype=np.uint32) for u in units
    ]
    maxlen = max((len(c) for c in cps), default=0)
    mat = np.full((n, maxlen), -1, dtype=np.int64)
    for i, c in enumerate(cps):
        mat[i, : len(c)] = c
    acc = np.full(n, FP_ROLL_SEED, dtype=np.int64)
    for j in range(maxlen):
        col = mat[:, j]
        live = col >= 0
        acc[live] = (acc[live] * FP_ROLL_R + col[live]) % FP_ROLL_P
    return acc


def char_fp_rolling(token: Column) -> Column:
    """Horner-chain rolling hash over characters: acc = (acc*r + code) mod p,
    seeded — order-sensitive, pure integer math, identical in any engine."""
    return F.aggregate(
        F.transform(F.split(token, ""), lambda c: F.ascii(c).cast("long")),
        F.lit(FP_ROLL_SEED).cast("long"),
        lambda acc, c: (acc * FP_ROLL_R + c) % FP_ROLL_P,
    )


def char_fp_rolling_sql(token_expr: str) -> str:
    """DuckDB rendering via list_reduce (v1.0+), seed prepended."""
    chars = f"list_transform(string_split({token_expr}, ''), c -> CAST(ascii(c) AS BIGINT))"
    return (
        f"list_reduce(list_prepend(CAST({FP_ROLL_SEED} AS BIGINT), {chars}), "
        f"(acc, c) -> (acc * {FP_ROLL_R} + c) % {FP_ROLL_P})"
    )


def clean_text(text: Column) -> Column:
    """Curation-stage text normalization: strip C0/C1 control characters
    (keeping \\t \\n), collapse runs of whitespace to single spaces, trim.
    Pure regexp_replace chain (codegen; the character classes used behave
    identically under Java regex and RE2, so the DuckDB oracle replicates).
    Case is NOT folded here — tokenizers downstream already lower();
    fingerprints fold case themselves."""
    out = F.regexp_replace(text, "[\\x00-\\x08\\x0b-\\x1f\\x7f-\\x9f]", "")
    out = F.regexp_replace(out, "\\s+", " ")
    return F.trim(out)


def clean_text_sql(text_expr: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace({text_expr}, "
        f"'[\\x00-\\x08\\x0b-\\x1f\\x7f-\\x9f]', '', 'g'), '\\s+', ' ', 'g'))"
    )
