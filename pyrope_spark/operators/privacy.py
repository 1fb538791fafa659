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


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    *,
    t_micro: int = 200_000,
    scale: int = 1_000_000,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) for an ORDERED
    sensitive attribute: per quasi-identifier class, the Earth Mover's
    Distance between the class's sensitive-value distribution and the
    GLOBAL one, flagged when it exceeds ``t_micro`` (micro-units of the
    [0, 1] EMD). [[k-anonymity]]/l-diversity bound who is in a class and
    how many sensitive values it shows; t-closeness bounds how much the
    class's distribution itself leaks (a class whose l distinct salaries
    are all in the top decile passes l-diversity and fails this).

    Exact integer arithmetic end to end: with class counts ``c_v`` (total
    C), global counts ``g_v`` (total G) over the m ordered sensitive
    values, the ordered-domain EMD is
    ``sum_v |cumsum(c_v*G - g_v*C)| / (C*G*(m-1))`` — one cross-multiplied
    division, carried through DECIMAL(38,0) (the cumulative term reaches
    C*G*m ~ 1e19 at 600k rows). Ties in the cumsum never occur: the
    domain spine is dense, one row per (class, sensitive value).

    Scale shape (100 TB): one (quasi, sensitive) hash aggregate over the
    fact table; everything after runs on classes x m rows (audit-sized,
    bounded by QI-combination cardinality times the sensitive domain —
    never row count). The dense spine is a broadcast cross join of the
    class table with the m-row global distribution.

    Output: (quasi..., class_size, emd_micro, t_violation), one row per
    class.
    """
    from pyspark.sql.window import Window

    cs = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    classes = cs.groupBy(*quasi_cols).agg(
        F.sum("_c").cast("long").alias("_ctot")
    )
    glob = df.groupBy(sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("_g")
    )
    tot = glob.agg(
        F.sum("_g").cast("long").alias("_gtot"),
        F.count(F.lit(1)).cast("long").alias("_m"),
    )
    dense = (
        classes.crossJoin(F.broadcast(glob))
        .join(cs, [*quasi_cols, sensitive_col], "left")
        .na.fill({"_c": 0})
        .crossJoin(F.broadcast(tot))
    )
    w = (
        Window.partitionBy(*quasi_cols)
        .orderBy(sensitive_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dense.withColumn(
        "_cum",
        F.sum(
            (
                F.col("_c").cast("decimal(38,0)") * F.col("_gtot")
                - F.col("_g").cast("decimal(38,0)") * F.col("_ctot")
            )
        ).over(w),
    )
    return (
        cum.groupBy(*quasi_cols, "_ctot", "_gtot", "_m")
        .agg(F.sum(F.abs(F.col("_cum"))).alias("_sabs"))
        .select(
            *quasi_cols,
            F.col("_ctot").alias("class_size"),
            F.when(F.col("_m") > 1,
                   F.expr(f"CAST(_sabs * {scale} DIV (CAST(_ctot AS "
                          f"DECIMAL(38,0)) * _gtot * (_m - 1)) AS BIGINT)"))
            .otherwise(F.lit(0)).alias("emd_micro"),
        )
        .withColumn("t_violation", F.col("emd_micro") > t_micro)
    )


def t_closeness_oracle_sql(
    *,
    table: str,
    quasi_sqls: dict[str, str],
    sensitive_sql: str,
    t_micro: int = 200_000,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of [[t_closeness_report]]: same dense spine, same
    cross-multiplied cumulative EMD (DuckDB HUGEINT-promotes where Spark
    carries DECIMAL(38,0))."""
    q_aliases = ", ".join(f"{sql} AS {name}" for name, sql in quasi_sqls.items())
    q_names = ", ".join(quasi_sqls)
    return f"""
WITH src AS (SELECT {q_aliases}, {sensitive_sql} AS sv FROM {table}),
cs AS (SELECT {q_names}, sv, CAST(count(*) AS BIGINT) AS c
       FROM src GROUP BY ALL),
classes AS (SELECT {q_names}, CAST(SUM(c) AS BIGINT) AS ctot
            FROM cs GROUP BY ALL),
gdist AS (SELECT sv, CAST(count(*) AS BIGINT) AS g FROM src GROUP BY 1),
tot AS (SELECT CAST(SUM(g) AS BIGINT) AS gtot,
               CAST(count(*) AS BIGINT) AS m FROM gdist),
dense AS (
  SELECT classes.*, gdist.sv, gdist.g, COALESCE(cs.c, 0) AS c, tot.gtot, tot.m
  FROM classes CROSS JOIN gdist CROSS JOIN tot
  LEFT JOIN cs USING ({q_names}, sv)
),
cum AS (
  SELECT *, SUM(c * gtot - g * ctot) OVER (
    PARTITION BY {q_names} ORDER BY sv
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumd
  FROM dense
)
SELECT {q_names}, ctot AS class_size,
       CASE WHEN m > 1
            THEN CAST(SUM(abs(cumd)) * {scale} // (ctot * gtot * (m - 1))
                      AS BIGINT)
            ELSE 0 END AS emd_micro,
       (CASE WHEN m > 1
            THEN CAST(SUM(abs(cumd)) * {scale} // (ctot * gtot * (m - 1))
                      AS BIGINT)
            ELSE 0 END) > {t_micro} AS t_violation
FROM cum GROUP BY {q_names}, ctot, gtot, m
"""
