"""Privacy audits: k-anonymity / l-diversity over quasi-identifier groups.

The release-gate counterpart of the compliance-delete path
(``storage.forget_keys``): before a table (or a training corpus slice
carrying user attributes) is shared, audit whether quasi-identifier
combinations isolate individuals.

- **k-anonymity** (Sweeney 2002): every quasi-identifier equivalence
  class must contain >= k rows. ``k_anonymity_report`` returns the class
  table with sizes and a violation flag — one hash aggregate.
- **l-diversity** (Machanavelli et al. 2007, distinct-l): each class must
  also contain >= l DISTINCT values of the sensitive attribute, or the
  class reveals it despite k rows. One count-distinct on the same grouped
  scan.
- ``anonymity_summary`` rolls the audit into one gate row (min class
  size, violating classes/rows, min diversity) — the promote-or-block
  input, same contract as ``profile.check_expectations``.

100 TB shape: one groupBy on the quasi-identifier tuple with map-side
partials; the class table is bounded by the QI-combination cardinality,
not the row count. Suppression (drop violating classes) is a broadcast
semi-join of the class table back — classes are small by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    *,
    k: int = 5,
    sensitive_col: str | None = None,
    l: int = 2,
) -> DataFrame:
    """Per-equivalence-class audit: (quasi..., class_size, k_violation
    [, distinct_sensitive, l_violation])."""
    aggs = [F.count(F.lit(1)).cast("long").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(sensitive_col).cast("long")
            .alias("distinct_sensitive")
        )
    out = df.groupBy(*quasi_cols).agg(*aggs).withColumn(
        "k_violation", F.col("class_size") < k
    )
    if sensitive_col is not None:
        out = out.withColumn(
            "l_violation", F.col("distinct_sensitive") < l
        )
    return out


def anonymity_summary(
    df: DataFrame,
    quasi_cols: list[str],
    *,
    k: int = 5,
    sensitive_col: str | None = None,
    l: int = 2,
) -> DataFrame:
    """One gate row: n_classes, min_class_size, violating_classes,
    violating_rows, k_anonymous (the release decision) and, with a
    sensitive column, min_diversity + l_diverse."""
    rep = k_anonymity_report(
        df, quasi_cols, k=k, sensitive_col=sensitive_col, l=l
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("class_size").cast("long").alias("min_class_size"),
        F.sum(F.col("k_violation").cast("int")).cast("long")
        .alias("violating_classes"),
        F.sum(F.when(F.col("k_violation"), F.col("class_size")).otherwise(0))
        .cast("long").alias("violating_rows"),
        (F.sum(F.col("k_violation").cast("int")) == 0).alias("k_anonymous"),
    ]
    if sensitive_col is not None:
        aggs += [
            F.min("distinct_sensitive").cast("long").alias("min_diversity"),
            (F.sum(F.col("l_violation").cast("int")) == 0).alias("l_diverse"),
        ]
    return rep.agg(*aggs)


def suppress_small_classes(
    df: DataFrame,
    quasi_cols: list[str],
    *,
    k: int = 5,
) -> DataFrame:
    """Suppression: drop every row whose quasi-identifier class is smaller
    than k — the minimal-distortion route to a k-anonymous release.
    Broadcast semi-join of the (bounded) passing-class table.

    NULL quasi-identifier values form a countable equivalence class,
    exactly as ``k_anonymity_report``'s groupBy treats them — the
    semi-join uses null-SAFE equality per column, so a NULL-class of
    size >= k survives (plain ``=`` would silently drop every NULL-QI
    row regardless of its class size)."""
    passing = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= k)
        .drop("_n")
    )
    renamed = passing.select(
        *[F.col(c).alias(f"_p_{c}") for c in quasi_cols]
    )
    cond = None
    for c in quasi_cols:
        eq = df[c].eqNullSafe(F.col(f"_p_{c}"))
        cond = eq if cond is None else cond & eq
    return df.join(F.broadcast(renamed), cond, "left_semi")
