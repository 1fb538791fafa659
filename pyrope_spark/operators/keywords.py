"""RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword Extraction
from Individual Documents") — the unsupervised per-document keyphrase pass
a training-data pipeline runs to tag corpora before topic routing / mix
weighting.

Semantics (kept deliberately close to the paper, with the repo's
cross-engine determinism rules):

- candidate phrases = maximal runs of consecutive non-stopword tokens
  (stopwords are delimiters; tokenization = ``functions.text.tokens``,
  the repo-wide lowercase/whitespace rule);
- per-document word stats over candidate-phrase members:
  ``freq(w)`` = occurrences, ``deg(w)`` = sum of the lengths of the phrase
  occurrences containing ``w`` (the paper's deg counts co-occurrence
  including self);
- word score = ``deg/freq``, emitted as integer micro-units via one
  truncating division ``(deg * 1_000_000) div freq`` (both operands
  positive, so truncation == floor and the DuckDB twin's ``//`` matches
  bit-for-bit — no engine float division anywhere);
- phrase score = sum of member-word micro scores (with multiplicity:
  each token position contributes its word's score, per the paper);
- identical phrases within a document collapse to one row
  (``n_occurrences`` kept — all occurrences score identically because
  word stats are doc-level);
- top-``k`` per document by (score desc, phrase asc) — a total order,
  so ranks replicate across engines.

Scale shape: everything is keyed on ``doc_id`` — one exchange for the
phrase-boundary window, then doc-keyed aggregations. No corpus-global
state, no collect, no UDFs; the whole pass is whole-stage-codegen column
expressions and survives a 100 TB corpus as a linear per-doc map with
doc-keyed shuffles.

No reference analog (the reference engine has no keyword extractor); this
extends the text-analysis suite (lang-ID, quality, readability) per the
training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyrope_spark.functions.text import STOPWORDS, tokens, tokens_sql

SCORE_SCALE = 1_000_000


def rake_keywords(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Top-``k`` RAKE keyphrases per document:
    (id_col, phrase, n_words, n_occurrences, score_micro, rk)."""
    sw = stopwords if stopwords is not None else STOPWORDS

    tok = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    ).withColumn("is_stop", F.col("tok").isin(sw).cast("int"))

    # phrase_id = stopwords seen so far: tokens of one candidate phrase
    # share an id, and every stopword bumps it (delimiter semantics).
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    member = (
        tok.withColumn("phrase_id", F.sum("is_stop").over(w_doc))
        .where(F.col("is_stop") == 0)
        .drop("is_stop")
    )
    member = member.withColumn(
        "plen", F.count(F.lit(1)).over(Window.partitionBy(id_col, "phrase_id"))
    )

    word_scores = member.groupBy(id_col, "tok").agg(
        F.expr(f"(sum(plen) * {SCORE_SCALE}L) div count(*)").alias("wscore")
    )

    phrases = (
        member.join(word_scores, [id_col, "tok"])
        .groupBy(id_col, "phrase_id")
        .agg(
            # collect_list has no ORDER BY — the struct-sort trick pins it
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("wscore").cast("long").alias("score_micro"),
        )
    )

    collapsed = phrases.groupBy(id_col, "phrase").agg(
        F.max("n_words").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.max("score_micro").alias("score_micro"),
    )
    w_rank = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("phrase").asc()
    )
    return (
        collapsed.withColumn("rk", F.row_number().over(w_rank).cast("long"))
        .where(F.col("rk") <= k)
    )


def rake_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    stopwords: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`rake_keywords` — identical op sequence, all
    integer arithmetic, same (score desc, phrase asc) total order."""
    sw = stopwords if stopwords is not None else STOPWORDS
    sw_list = ", ".join(f"'{w}'" for w in sw)
    return f"""
WITH tk AS (SELECT {id_col}, {tokens_sql(text_col)} AS t FROM {table}),
tok AS (
  SELECT {id_col}, CAST(gs AS BIGINT) AS pos, t[CAST(gs AS INT)] AS tok,
         CASE WHEN t[CAST(gs AS INT)] IN ({sw_list}) THEN 1 ELSE 0 END AS is_stop
  FROM tk, unnest(generate_series(1, len(t))) AS g(gs)
),
ph AS (
  SELECT {id_col}, pos, tok, is_stop,
         SUM(is_stop) OVER (PARTITION BY {id_col} ORDER BY pos) AS phrase_id
  FROM tok
),
member AS (
  SELECT {id_col}, pos, tok, phrase_id,
         COUNT(*) OVER (PARTITION BY {id_col}, phrase_id) AS plen
  FROM ph WHERE is_stop = 0
),
ws AS (
  SELECT {id_col}, tok,
         (SUM(plen) * {SCORE_SCALE}) // COUNT(*) AS wscore
  FROM member GROUP BY 1, 2
),
phrases AS (
  SELECT m.{id_col}, m.phrase_id,
         string_agg(m.tok, ' ' ORDER BY m.pos) AS phrase,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(w.wscore) AS BIGINT) AS score_micro
  FROM member m JOIN ws w ON m.{id_col} = w.{id_col} AND m.tok = w.tok
  GROUP BY 1, 2
),
collapsed AS (
  SELECT {id_col}, phrase, MAX(n_words) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         MAX(score_micro) AS score_micro
  FROM phrases GROUP BY 1, 2
)
SELECT {id_col}, phrase, n_words, n_occurrences, score_micro,
       CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY {id_col}
                               ORDER BY score_micro DESC, phrase ASC) AS rk
  FROM collapsed
) WHERE rk <= {k}
"""
