"""Learned document-quality classifier — the model-based filtering stage of
a pretraining data pipeline (CCNet's fastText LM filter, Wenzek et al. 2020;
DCLM's fastText quality classifier, Li et al. 2024; GPT-3's LR-over-features
filter). Complements the heuristic gate (``curation.pretrain_quality_filter``)
with a trainable one: positives = a trusted reference corpus, negatives =
raw crawl, model = hashed bag-of-ngrams -> linear classifier (the fastText
supervised recipe, Joulin et al. 2016).

Spark-first shape:

- featurization: native ``tokens``/bigram expressions feed MLlib
  ``HashingTF`` (JVM-side murmur hashing into a fixed 2^18-dim sparse
  space — no vocabulary build, no driver state, layout-independent);
- fit: MLlib ``LogisticRegression`` over the sparse vectors (distributed
  L-BFGS; the linear hypothesis class fastText uses);
- scoring: ``model.transform`` — a broadcast of the coefficient vector,
  embarrassingly parallel, no Python in the loop;
- split: xxhash64 bucket of the doc id — deterministic and partition-layout
  independent (``randomSplit`` changes membership when the layout changes).

At 100 TB: train on a sampled labeled set (the classifier needs ~1e6 rows,
not the corpus), then score the full corpus with one map-side pass; the
score lands next to the heuristic features and the DSIR weight as just
another column to threshold in the final filter.

No reference analog (the reference's ML surface is the cache-policy sidecar,
train_model.py); this is BASELINE.json north-star territory: the
quality-scoring stage a corpus curation pipeline runs at scale.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyrope_spark.functions.text import tokens, word_ngrams_from_tokens

DEFAULT_N_FEATURES = 1 << 18


def _with_grams(
    df: DataFrame, text_col: str, *keep, bigrams: bool = True,
    subwords: bool = True,
) -> DataFrame:
    """Project (keep..., _grams): tokens + word bigrams + char-trigram
    subwords in one array — the fastText feature set (words + word n-grams
    + subword n-grams). Subwords are what generalize to junk never seen in
    training: a word-only model memorizes one-off junk tokens per doc and
    learns nothing transferable, while junk's character shape (digit/letter
    trigram mix) recurs across documents. Tokens are materialized first so
    the HOFs do not re-inline the tokenize subtree per shingle (the
    word_ngrams_from_tokens contract)."""
    step = df.select(*keep, tokens(F.col(text_col)).alias("_toks"))
    parts = [F.col("_toks")]
    if bigrams:
        parts.append(word_ngrams_from_tokens(F.col("_toks"), 2))
    if subwords:
        parts.append(
            F.expr(
                "flatten(transform(_toks, t -> transform("
                "sequence(1, greatest(length(t) - 2, 1)), "
                "i -> concat('#', substring(t, i, 3)))))"
            )
        )
    grams = parts[0] if len(parts) == 1 else F.concat(*parts)
    return step.select(*keep, grams.alias("_grams"))


@dataclass
class QualityModelResult:
    model: object  # PipelineModel-like: HashingTF stage + LR stage
    accuracy: float
    train_rows: int
    test_rows: int


def train_quality_classifier(
    labeled: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
    n_features: int = DEFAULT_N_FEATURES,
    bigrams: bool = True,
    subwords: bool = True,
    n_buckets: int = 5,
    test_bucket: int = 0,
    max_iter: int = 50,
    reg_param: float = 1e-4,
    seed: int = 42,
) -> QualityModelResult:
    """Fit the fastText-style classifier on (text, label in {0,1}) rows and
    report held-out accuracy. The held-out fifth is selected by a
    deterministic xxhash64 bucket of the id (resumable-job contract)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, Normalizer

    if labeled.select(label_col).distinct().count() < 2:
        raise ValueError("training data contains a single class; not training")
    feats = _with_grams(
        labeled.withColumn(label_col, F.col(label_col).cast("double")),
        text_col,
        F.col(id_col),
        F.col(label_col),
        bigrams=bigrams,
        subwords=subwords,
    )
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_buckets))
    train = feats.filter(bucket != test_bucket)
    test = feats.filter(bucket == test_bucket)
    # L1 normalization = fastText's n-gram-vector AVERAGING: without it the
    # decision rides on absolute counts and held-out accuracy drops from
    # 1.00 to 0.83 on the test harness (doc length becomes the feature)
    pipe = Pipeline(stages=[
        HashingTF(inputCol="_grams", outputCol="_tf", numFeatures=n_features),
        Normalizer(inputCol="_tf", outputCol="features", p=1.0),
        LogisticRegression(featuresCol="features", labelCol=label_col,
                           maxIter=max_iter, regParam=reg_param),
    ])
    model = pipe.fit(train)
    scored = model.transform(test)
    agg = scored.select(
        (F.col("prediction") == F.col(label_col)).cast("long").alias("ok")
    ).agg(F.sum("ok").alias("correct"), F.count(F.lit(1)).alias("n")).collect()[0]
    n_test = int(agg["n"])
    acc = (agg["correct"] / n_test) if n_test else 0.0
    return QualityModelResult(
        model=model,
        accuracy=float(acc),
        train_rows=train.count(),
        test_rows=n_test,
    )


def score_quality_model(
    result: QualityModelResult | object,
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bigrams: bool = True,
    subwords: bool = True,
) -> DataFrame:
    """(id, quality_prob) for every doc — P(label=1) under the trained
    model. One map-side pass: hashing + a broadcast coefficient dot."""
    from pyspark.ml.functions import vector_to_array

    model = getattr(result, "model", result)
    feats = _with_grams(
        docs, text_col, F.col(id_col), bigrams=bigrams, subwords=subwords
    )
    scored = model.transform(feats)
    return scored.select(
        F.col(id_col),
        vector_to_array(F.col("probability")).getItem(1).alias("quality_prob"),
    )


def reference_vs_crawl_labels(
    reference: DataFrame,
    crawl: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The standard weak-labeling: trusted reference corpus -> 1, raw crawl
    sample -> 0 (CCNet trains against Wikipedia exactly this way). Ids are
    prefixed to stay unique across the two sides."""
    pos = reference.select(
        F.concat(F.lit("ref:"), F.col(id_col).cast("string")).alias(id_col),
        F.col(text_col),
        F.lit(1).alias("label"),
    )
    neg = crawl.select(
        F.concat(F.lit("crawl:"), F.col(id_col).cast("string")).alias(id_col),
        F.col(text_col),
        F.lit(0).alias("label"),
    )
    return pos.unionByName(neg)


def isotonic_calibrate(
    pairs: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-key isotonic regression (pool-adjacent-violators) — the
    monotone calibration map for a scoring model's reliability curve.

    PAVA is inherently sequential (each merge can cascade left), so this
    is an Arrow ``applyInPandas`` per key over (x, y) pairs sorted by
    (x, then y for determinism): pools carry EXACT (sum_micro, count)
    integers and merge while the left pool's mean exceeds the right's —
    comparison by cross-multiplication (s_l·n_r > s_r·n_l), never a
    float mean, so the fitted step function is bit-stable.  Output: one
    row per pool with [x_lo, x_hi], the pooled mean in micro (one final
    div), and the pool size.

    No SQL oracle: the cascading merge has no bounded-depth relational
    form (same disposition as the streaming operators — pytest invariants
    gate it: monotone means, weight conservation, hand-checked pools).
    Scale shape: one shuffle on the key; each key's fit is linear in its
    pair count after the sort.
    """
    import pandas as pd

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([x_col, y_col], kind="mergesort")
        xs = pdf[x_col].to_numpy()
        ys = np.rint(pdf[y_col].to_numpy() * scale).astype(np.int64)
        pools: list[list] = []  # [s, n, x_lo, x_hi]
        for x, ymic in zip(xs, ys):
            pools.append([int(ymic), 1, x, x])
            while len(pools) > 1:
                s_r, n_r, lo_r, hi_r = pools[-1]
                s_l, n_l, lo_l, hi_l = pools[-2]
                if s_l * n_r > s_r * n_l:  # left mean > right mean: pool
                    pools.pop()
                    pools[-1] = [s_l + s_r, n_l + n_r, lo_l, hi_r]
                else:
                    break
        k = pdf[key_col].iloc[0]
        return pd.DataFrame(
            {
                key_col: [k] * len(pools),
                "x_lo": [p[2] for p in pools],
                "x_hi": [p[3] for p in pools],
                "n": [p[1] for p in pools],
                "mean_micro": [p[0] // p[1] for p in pools],
            }
        )

    schema = (
        f"{key_col} string, x_lo double, x_hi double, n long, "
        "mean_micro long"
    )
    return pairs.select(key_col, x_col, y_col).groupBy(key_col).applyInPandas(
        fit, schema
    )
