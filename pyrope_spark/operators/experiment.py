"""Experimentation and model-evaluation operators: CUPED variance
reduction, the Mann-Whitney rank-sum test, calibration reliability /
ECE, a deterministic Poisson-bootstrap confidence interval, inter-rater
agreement (Cohen's kappa), and the price-volume-mix revenue bridge.

These are the readout layer of a training-data/experimentation
pipeline: once [[ab_conversion_test]] says "B converts more", CUPED
answers "with how much less variance could we have known", the
Mann-Whitney test answers it without a normality assumption on the
metric, calibration/ECE grade the quality-classifier scores the
curation suite filters on, the bootstrap puts an interval on any mean
without distributional assumptions, kappa audits labeler agreement
before labels are trusted, and the revenue bridge decomposes WHY a
metric moved (price vs volume vs assortment).

Exactness discipline (the repo-wide contract): every statistic is
carried in integer micro/milli/ppm units with cross-multiplied
rational forms; products that can exceed int64 ride DECIMAL(38,0)
(DuckDB's hugeint promotes implicitly).  Where a statistic is not a
single-division rational (the tie-corrected Mann-Whitney variance),
the floor-division CHAIN is fixed and identical on both engines, so
hash parity is by construction.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

DEC = "CAST({} AS DECIMAL(38,0))"


def _dec(expr: str) -> str:
    return DEC.format(expr)


# --------------------------------------------------------------------------
# CUPED variance-reduced lift
# --------------------------------------------------------------------------

def cuped_adjusted_lift(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    variant_expr: Column,
    pre_expr: Column,
    value_cents_expr: Column,
    scale: int = 1_000_000,
) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Existing Data, Deng et
    al. 2013) variance-reduced A/B readout over a per-user metric.

    Per user: ``x`` = pre-period metric (sum of ``value_cents_expr``
    where ``pre_expr``), ``y`` = post-period metric (the rest), and the
    variant (``MIN(variant_expr)`` — assignment must be a pure function
    of the user, e.g. ``user_id % 2``).  Users missing either period
    contribute 0 for it (the all-randomized-units estimator).

    The pooled regression coefficient is the exact rational
    ``theta_ppm = (n·Sxy − Sx·Sy)·1e6 div (n·Sxx − Sx²)`` carried in
    DECIMAL(38,0); the CUPED-adjusted per-variant mean is
    ``mean_y − theta·(mean_x − grand_mean_x)`` in integer micro-cents
    (each mean a single floor-div, the theta product one more).  The
    adjusted difference estimates the same lift as the raw difference
    but with variance shrunk by the squared x–y correlation.

    Output one row: exposures and raw/adjusted mean differences.

    Scale shape: one user-keyed aggregate over the fact table, then one
    1-row global aggregate — no joins, no windows.
    """
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(variant_expr).alias("variant"),
        F.coalesce(
            F.sum(F.when(pre_expr, value_cents_expr)), F.lit(0)
        ).cast("long").alias("x"),
        F.coalesce(
            F.sum(F.when(~pre_expr, value_cents_expr)), F.lit(0)
        ).cast("long").alias("y"),
    )
    g = per_user.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr(f"{_dec('x')} * y")).alias("sxy"),
        F.sum(F.expr(f"{_dec('x')} * x")).alias("sxx"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long").alias("na"),
        F.sum(F.when(F.col("variant") == 0, F.col("x")).otherwise(0))
        .cast("long").alias("sxa"),
        F.sum(F.when(F.col("variant") == 0, F.col("y")).otherwise(0))
        .cast("long").alias("sya"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long").alias("nb"),
        F.sum(F.when(F.col("variant") == 1, F.col("x")).otherwise(0))
        .cast("long").alias("sxb"),
        F.sum(F.when(F.col("variant") == 1, F.col("y")).otherwise(0))
        .cast("long").alias("syb"),
    )
    theta = (
        f"CASE WHEN {_dec('n')} * sxx - {_dec('sx')} * sx = 0 THEN 0 "
        f"ELSE ({_dec('n')} * sxy - {_dec('sx')} * sy) * {scale} "
        f"DIV ({_dec('n')} * sxx - {_dec('sx')} * sx) END"
    )
    g = g.withColumn("theta_ppm", F.expr(theta).cast("long"))
    gx = f"{_dec('sx')} * {scale} DIV n"

    def adj(sy_v: str, sx_v: str, n_v: str) -> str:
        mean_y = f"{_dec(sy_v)} * {scale} DIV {n_v}"
        mean_x = f"{_dec(sx_v)} * {scale} DIV {n_v}"
        return (
            f"({mean_y}) - {_dec('theta_ppm')} * (({mean_x}) - ({gx})) "
            f"DIV {scale}"
        )

    return g.select(
        "na",
        "nb",
        "theta_ppm",
        F.expr(
            f"({_dec('sya')} * {scale} DIV na) - "
            f"({_dec('syb')} * {scale} DIV nb)"
        ).cast("long").alias("raw_diff_micro"),
        F.expr(adj("sya", "sxa", "na")).cast("long").alias("adj_a_micro"),
        F.expr(adj("syb", "sxb", "nb")).cast("long").alias("adj_b_micro"),
        (
            F.expr(adj("sya", "sxa", "na")) - F.expr(adj("syb", "sxb", "nb"))
        ).cast("long").alias("adj_diff_micro"),
    )


def cuped_oracle_sql(
    *,
    table: str = "events",
    user_col: str = "user_id",
    variant_sql: str = "user_id % 2",
    pre_sql: str,
    value_cents_sql: str,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of [[cuped_adjusted_lift]] (identical aggregate and
    floor-division structure; BIGINT products promote to hugeint)."""
    gx = f"sx * {scale} // n"

    def adj(sy_v: str, sx_v: str, n_v: str) -> str:
        return (
            f"({sy_v} * {scale} // {n_v}) - "
            f"theta_ppm * (({sx_v} * {scale} // {n_v}) - ({gx})) // {scale}"
        )

    return f"""
WITH per_user AS (
  SELECT {user_col} AS u, MIN({variant_sql}) AS variant,
         COALESCE(SUM(CASE WHEN {pre_sql} THEN {value_cents_sql} END), 0)
           AS x,
         COALESCE(SUM(CASE WHEN NOT ({pre_sql}) THEN {value_cents_sql} END),
                  0) AS y
  FROM {table} GROUP BY 1
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx,
         CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN variant = 0 THEN x ELSE 0 END) AS BIGINT) AS sxa,
         CAST(SUM(CASE WHEN variant = 0 THEN y ELSE 0 END) AS BIGINT) AS sya,
         CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         CAST(SUM(CASE WHEN variant = 1 THEN x ELSE 0 END) AS BIGINT) AS sxb,
         CAST(SUM(CASE WHEN variant = 1 THEN y ELSE 0 END) AS BIGINT) AS syb
  FROM per_user
),
t AS (
  SELECT *, CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
                      ELSE (n * sxy - sx * sy) * {scale}
                           // (n * sxx - sx * sx) END AS BIGINT)
            AS theta_ppm
  FROM g
)
SELECT na, nb, theta_ppm,
       CAST((sya * {scale} // na) - (syb * {scale} // nb) AS BIGINT)
         AS raw_diff_micro,
       CAST({adj('sya', 'sxa', 'na')} AS BIGINT) AS adj_a_micro,
       CAST({adj('syb', 'sxb', 'nb')} AS BIGINT) AS adj_b_micro,
       CAST(({adj('sya', 'sxa', 'na')}) - ({adj('syb', 'sxb', 'nb')})
            AS BIGINT) AS adj_diff_micro
FROM t
"""


# --------------------------------------------------------------------------
# Mann-Whitney U (rank-sum) test
# --------------------------------------------------------------------------

def mann_whitney_u(
    df: DataFrame,
    *,
    group_expr: Column,
    value_cents_expr: Column,
) -> DataFrame:
    """Exact two-sample Mann-Whitney U with average ranks for ties —
    the nonparametric "is B's metric stochastically larger" test that
    needs no normality assumption on a skewed revenue metric.

    All-integer construction: the value domain is first collapsed to a
    per-distinct-value histogram ``(value, n0, n1)``; average ranks ride
    the DOUBLED-rank trick (``2·avgrank = 2·count_below + t + 1`` is
    always integral), so the doubled rank sum ``r1_x2 = Σ n1·dr`` and
    ``u1_x2 = r1_x2 − n1·(n1+1) = 2·U₁`` are exact BIGINTs.  With
    ``d = u1_x2 − n0·n1 = 2(U₁ − n0n1/2)``:

    - ``z2_milli   = 3000·d² div (n0·n1·(n+1))`` — the untied normal
      approximation, ONE exact division (z² > 3.84 ≈ p < .05).
    - ``z2_tc_milli = (3000·d² div (n0·n1)) · n·(n−1) div W`` with
      ``W = (n+1)·n·(n−1) − T`` and tie term ``T = Σ(t³−t)`` — the
      tie-corrected variance.  The single-division form
      ``3000·d²·n(n−1) div (n0·n1·W)`` overflows DECIMAL(38,0) past
      ~2M rows, so the chain is split into two floor-divisions; the
      chain is identical on both engines and its relative error is
      below 1/(3000·d²/(n0·n1)) — sub-milli for any significant d.

    Output one row: group sizes, doubled U, tie term, both z² forms.
    (``tie_term`` is emitted as BIGINT: Σ(t³−t) stays under 2^63 unless
    a single value carries ≥2M tied rows — on value domains that
    granular, bucket the metric first.)

    Scale shape: one value-keyed fact aggregate; everything after runs
    on the value histogram (bounded by the metric's distinct values —
    ≤49k for a 2-decimal metric under 500), so the single rank window
    is domain-sized, never fact-sized.
    """
    hist = df.groupBy(value_cents_expr.alias("v")).agg(
        F.sum(F.when(group_expr == 0, 1).otherwise(0))
        .cast("long").alias("n0v"),
        F.sum(F.when(group_expr == 1, 1).otherwise(0))
        .cast("long").alias("n1v"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    hist = hist.withColumn("tv", F.col("n0v") + F.col("n1v")).withColumn(
        "below", F.coalesce(F.sum("tv").over(w), F.lit(0))
    )
    # doubled average rank of every member at this value
    hist = hist.withColumn(
        "dr", 2 * F.col("below") + F.col("tv") + F.lit(1)
    )
    g = hist.groupBy().agg(
        F.sum("n0v").cast("long").alias("n0"),
        F.sum("n1v").cast("long").alias("n1"),
        F.sum(F.expr(f"{_dec('n1v')} * dr")).alias("r1x2"),
        F.sum(
            F.expr(f"{_dec('tv')} * tv * tv - tv")
        ).alias("tie_term"),
    )
    g = g.withColumn(
        "u1_x2", F.expr(f"CAST(r1x2 - {_dec('n1')} * (n1 + 1) AS BIGINT)")
    ).withColumn(
        "d", F.expr(f"CAST(u1_x2 - {_dec('n0')} * n1 AS BIGINT)")
    ).withColumn("n", F.col("n0") + F.col("n1"))
    z2 = (
        f"CASE WHEN n0 = 0 OR n1 = 0 THEN 0 ELSE "
        f"3000 * {_dec('d')} * d DIV ({_dec('n0')} * n1 * (n + 1)) END"
    )
    wtc = f"({_dec('n')} + 1) * n * (n - 1) - tie_term"
    z2tc = (
        f"CASE WHEN n0 = 0 OR n1 = 0 OR ({wtc}) = 0 THEN 0 ELSE "
        f"(3000 * {_dec('d')} * d DIV ({_dec('n0')} * n1)) "
        f"* ({_dec('n')} * (n - 1)) DIV ({wtc}) END"
    )
    return g.select(
        "n0",
        "n1",
        "u1_x2",
        F.col("tie_term").cast("long").alias("tie_term"),
        F.expr(z2).cast("long").alias("z2_milli"),
        F.expr(z2tc).cast("long").alias("z2_tc_milli"),
    )


def mann_whitney_oracle_sql(
    *,
    table: str = "events",
    group_sql: str = "user_id % 2",
    value_cents_sql: str,
) -> str:
    """DuckDB twin of [[mann_whitney_u]] (same histogram, doubled-rank
    window, and floor-division chain)."""
    return f"""
WITH hist AS (
  SELECT {value_cents_sql} AS v,
         CAST(SUM(CASE WHEN ({group_sql}) = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n0v,
         CAST(SUM(CASE WHEN ({group_sql}) = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n1v
  FROM {table} GROUP BY 1
),
ranked AS (
  SELECT *, n0v + n1v AS tv,
         COALESCE(SUM(n0v + n1v) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM hist
),
g AS (
  SELECT CAST(SUM(n0v) AS BIGINT) AS n0, CAST(SUM(n1v) AS BIGINT) AS n1,
         SUM(n1v * (2 * below + tv + 1)) AS r1x2,
         SUM(tv * tv * tv - tv) AS tie_term
  FROM ranked
),
s AS (
  SELECT *, CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
         CAST(r1x2 - n1 * (n1 + 1) - n0 * n1 AS BIGINT) AS d,
         n0 + n1 AS n
  FROM g
)
SELECT n0, n1, u1_x2, CAST(tie_term AS BIGINT) AS tie_term,
       CAST(CASE WHEN n0 = 0 OR n1 = 0 THEN 0
                 ELSE 3000 * d * d // (n0 * n1 * (n + 1)) END AS BIGINT)
         AS z2_milli,
       CAST(CASE WHEN n0 = 0 OR n1 = 0
                  OR (n + 1) * n * (n - 1) - tie_term = 0 THEN 0
                 ELSE (3000 * d * d // (n0 * n1)) * (n * (n - 1))
                      // ((n + 1) * n * (n - 1) - tie_term) END AS BIGINT)
         AS z2_tc_milli
FROM s
"""


# --------------------------------------------------------------------------
# Calibration reliability bins / ECE
# --------------------------------------------------------------------------

def _calibration_scored(
    events: DataFrame,
    *,
    user_col: str,
    label_expr: Column,
    order_cols: tuple[str, ...],
    scale: int,
) -> DataFrame:
    """Per event: trailing per-user conversion rate as the score
    (``prior_conv·scale div prior_n``), this event's label; the user's
    first event (no history) is excluded."""
    w = (
        W.partitionBy(user_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(W.unboundedPreceding, -1)
    )
    lab = label_expr.cast("int")
    scored = (
        events.withColumn("_lab", lab)
        .withColumn("_pn", F.coalesce(F.count("_lab").over(w), F.lit(0)))
        .withColumn("_pc", F.coalesce(F.sum("_lab").over(w), F.lit(0)))
        .filter(F.col("_pn") > 0)
        .select(
            F.expr(f"CAST(_pc * {scale} DIV _pn AS BIGINT)").alias(
                "score_ppm"
            ),
            F.col("_lab").cast("long").alias("label"),
        )
    )
    return scored


def calibration_bins(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    label_expr: Column,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    n_bins: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Reliability diagram for the trailing-rate predictor: does "this
    user converted at rate p so far" actually predict the next event at
    rate p?  The same readout grades ANY score column; the trailing
    rate makes it self-contained on the events table.

    Scores in ppm are cut into ``n_bins`` equal-width bins (top edge
    clamped into the last bin); per bin: count, mean predicted ppm,
    empirical ppm, and the signed gap.  A calibrated predictor has
    gap ≈ 0 everywhere; [[calibration_ece]] is the n-weighted fold.

    Scale shape: one user-keyed window pass over the fact table, then
    one n_bins-row aggregate.
    """
    width = scale // n_bins
    scored = _calibration_scored(
        events,
        user_col=user_col,
        label_expr=label_expr,
        order_cols=order_cols,
        scale=scale,
    )
    binned = scored.withColumn(
        "bin",
        F.least(F.expr(f"score_ppm DIV {width}"), F.lit(n_bins - 1)).cast(
            "long"
        ),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("score_ppm").cast("long").alias("_ssum"),
            F.sum("label").cast("long").alias("_conv"),
        )
        .select(
            "bin",
            "n",
            F.expr(f"CAST({_dec('_ssum')} DIV n AS BIGINT)").alias(
                "avg_score_ppm"
            ),
            F.expr(f"CAST({_dec('_conv')} * {scale} DIV n AS BIGINT)").alias(
                "emp_ppm"
            ),
            F.expr(
                f"CAST({_dec('_ssum')} DIV n - "
                f"{_dec('_conv')} * {scale} DIV n AS BIGINT)"
            ).alias("gap_ppm"),
        )
        .orderBy("bin")
    )


def calibration_ece(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    label_expr: Column,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    n_bins: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Expected Calibration Error + Brier score of the trailing-rate
    predictor, one row: ``ece_ppm = Σ n_b·|gap_b| div N`` over the
    [[calibration_bins]] and the exact integer Brier
    ``brier_micro = Σ(score_ppm − label·scale)² div N div scale``
    (the squared-error sum rides DECIMAL(38,0): 1e12 per row never
    overflows before the division at any row count under 1e26).
    """
    width = scale // n_bins
    scored = _calibration_scored(
        events,
        user_col=user_col,
        label_expr=label_expr,
        order_cols=order_cols,
        scale=scale,
    )
    binned = scored.withColumn(
        "bin",
        F.least(F.expr(f"score_ppm DIV {width}"), F.lit(n_bins - 1)).cast(
            "long"
        ),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("score_ppm").cast("long").alias("ssum"),
        F.sum("label").cast("long").alias("conv"),
        F.sum(
            F.expr(
                f"({_dec('score_ppm')} - label * {scale}) "
                f"* (score_ppm - label * {scale})"
            )
        ).alias("sqerr"),
    )
    gap = f"abs({_dec('ssum')} DIV nb - {_dec('conv')} * {scale} DIV nb)"
    return per_bin.groupBy().agg(
        F.sum("nb").cast("long").alias("n"),
        F.sum(F.expr(f"nb * ({gap})")).alias("_wgap"),
        F.sum("sqerr").alias("_sq"),
    ).select(
        "n",
        F.expr(f"CAST({_dec('_wgap')} DIV n AS BIGINT)").alias("ece_ppm"),
        F.expr(
            f"CAST({_dec('_sq')} DIV n DIV {scale} AS BIGINT)"
        ).alias("brier_micro"),
    )


def _calibration_scored_sql(
    *,
    table: str,
    user_col: str,
    label_sql: str,
    order_sql: str,
    scale: int,
) -> str:
    return f"""
scored AS (
  SELECT CAST(SUM(CASE WHEN {label_sql} THEN 1 ELSE 0 END)
              OVER (PARTITION BY {user_col} ORDER BY {order_sql}
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              * {scale}
              // COUNT(*) OVER (PARTITION BY {user_col} ORDER BY {order_sql}
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT) AS score_ppm,
         CAST(CASE WHEN {label_sql} THEN 1 ELSE 0 END AS BIGINT) AS label
  FROM {table}
  QUALIFY COUNT(*) OVER (PARTITION BY {user_col} ORDER BY {order_sql}
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) > 0
)"""


def calibration_bins_oracle_sql(
    *,
    table: str = "events",
    user_col: str = "user_id",
    label_sql: str = "event_type = 'purchase'",
    order_sql: str = "ts, event_id",
    n_bins: int = 10,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of [[calibration_bins]]."""
    width = scale // n_bins
    scored = _calibration_scored_sql(
        table=table,
        user_col=user_col,
        label_sql=label_sql,
        order_sql=order_sql,
        scale=scale,
    )
    return f"""
WITH {scored},
binned AS (
  SELECT LEAST(score_ppm // {width}, {n_bins - 1}) AS bin, score_ppm, label
  FROM scored
)
SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(score_ppm) // COUNT(*) AS BIGINT) AS avg_score_ppm,
       CAST(SUM(label) * {scale} // COUNT(*) AS BIGINT) AS emp_ppm,
       CAST(SUM(score_ppm) // COUNT(*)
            - SUM(label) * {scale} // COUNT(*) AS BIGINT) AS gap_ppm
FROM binned GROUP BY 1 ORDER BY 1
"""


def calibration_ece_oracle_sql(
    *,
    table: str = "events",
    user_col: str = "user_id",
    label_sql: str = "event_type = 'purchase'",
    order_sql: str = "ts, event_id",
    n_bins: int = 10,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of [[calibration_ece]]."""
    width = scale // n_bins
    scored = _calibration_scored_sql(
        table=table,
        user_col=user_col,
        label_sql=label_sql,
        order_sql=order_sql,
        scale=scale,
    )
    return f"""
WITH {scored},
binned AS (
  SELECT LEAST(score_ppm // {width}, {n_bins - 1}) AS bin, score_ppm, label
  FROM scored
),
per_bin AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb,
         CAST(SUM(score_ppm) AS BIGINT) AS ssum,
         CAST(SUM(label) AS BIGINT) AS conv,
         SUM((score_ppm - label * {scale}) * (score_ppm - label * {scale}))
           AS sqerr
  FROM binned GROUP BY 1
)
SELECT CAST(SUM(nb) AS BIGINT) AS n,
       CAST(SUM(nb * abs(ssum // nb - conv * {scale} // nb))
            // SUM(nb) AS BIGINT) AS ece_ppm,
       CAST(SUM(sqerr) // SUM(nb) // {scale} AS BIGINT) AS brier_micro
FROM per_bin
"""


# --------------------------------------------------------------------------
# Price-volume-mix revenue bridge
# --------------------------------------------------------------------------

def price_volume_mix(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    split_sql: str = "l_shipdate >= TIMESTAMP '1998-07-01'",
) -> DataFrame:
    """Revenue bridge: decompose each brand's revenue change between
    two periods into price, volume, new-item, and exited-item effects
    that sum EXACTLY to the delta (the FP&A "why did revenue move"
    readout).

    Per part with sales in both periods, with per-period quantities
    ``q1,q2`` and discounted revenue cents ``r1,r2``, the bridge pivots
    on ``base = q2·r1 div q1`` (period-2 volume at period-1 realized
    price, ONE floor-division): ``volume_eff = base − r1`` and
    ``price_eff = r2 − base``, so ``price+volume = r2−r1`` by
    construction — no residual leaks.  Parts sold only in period 2
    contribute ``new_eff = r2``; only in period 1, ``exit_eff = −r1``.

    Output per brand: both period revenues, the four effects, and the
    delta (``= price+volume+new+exit`` exactly).

    Scale shape: one part-keyed fact aggregate, a broadcast-sized part
    join for the brand, then a brand-count-row aggregate.
    """
    cents = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
    ).cast("long")
    per_part = lineitem.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(F.when(~F.expr(split_sql), F.col("l_quantity").cast("long"))
              .otherwise(0)).cast("long").alias("q1"),
        F.sum(F.when(~F.expr(split_sql), cents).otherwise(0))
        .cast("long").alias("r1"),
        F.sum(F.when(F.expr(split_sql), F.col("l_quantity").cast("long"))
              .otherwise(0)).cast("long").alias("q2"),
        F.sum(F.when(F.expr(split_sql), cents).otherwise(0))
        .cast("long").alias("r2"),
    )
    base = f"CASE WHEN q1 > 0 THEN {_dec('q2')} * r1 DIV q1 ELSE 0 END"
    eff = per_part.select(
        "partkey",
        "r1",
        "r2",
        F.expr(
            f"CASE WHEN q1 > 0 AND q2 > 0 THEN r2 - ({base}) ELSE 0 END"
        ).cast("long").alias("price_eff"),
        F.expr(
            f"CASE WHEN q1 > 0 AND q2 > 0 THEN ({base}) - r1 ELSE 0 END"
        ).cast("long").alias("volume_eff"),
        F.expr("CASE WHEN q1 = 0 THEN r2 ELSE 0 END")
        .cast("long").alias("new_eff"),
        F.expr("CASE WHEN q2 = 0 THEN -r1 ELSE 0 END")
        .cast("long").alias("exit_eff"),
    )
    joined = eff.join(
        F.broadcast(
            part.select(F.col("p_partkey").alias("partkey"), "p_brand")
        ),
        on="partkey",
    )
    return (
        joined.groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum("r1").cast("long").alias("rev1_cents"),
            F.sum("r2").cast("long").alias("rev2_cents"),
            F.sum("price_eff").cast("long").alias("price_eff_cents"),
            F.sum("volume_eff").cast("long").alias("volume_eff_cents"),
            F.sum("new_eff").cast("long").alias("new_eff_cents"),
            F.sum("exit_eff").cast("long").alias("exit_eff_cents"),
        )
        .withColumn(
            "delta_cents",
            (F.col("rev2_cents") - F.col("rev1_cents")).cast("long"),
        )
        .orderBy("brand")
    )


def price_volume_mix_oracle_sql(
    *,
    lineitem: str = "lineitem",
    part: str = "part",
    split_sql: str = "l_shipdate >= TIMESTAMP '1998-07-01'",
) -> str:
    """DuckDB twin of [[price_volume_mix]]."""
    return f"""
WITH per_part AS (
  SELECT l_partkey AS partkey,
         CAST(SUM(CASE WHEN NOT ({split_sql})
                       THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
           AS q1,
         CAST(SUM(CASE WHEN NOT ({split_sql})
                       THEN CAST(floor(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS r1,
         CAST(SUM(CASE WHEN {split_sql}
                       THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
           AS q2,
         CAST(SUM(CASE WHEN {split_sql}
                       THEN CAST(floor(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS r2
  FROM {lineitem} GROUP BY 1
),
eff AS (
  SELECT partkey, r1, r2,
         CAST(CASE WHEN q1 > 0 AND q2 > 0
                   THEN r2 - (q2 * r1 // q1) ELSE 0 END AS BIGINT)
           AS price_eff,
         CAST(CASE WHEN q1 > 0 AND q2 > 0
                   THEN (q2 * r1 // q1) - r1 ELSE 0 END AS BIGINT)
           AS volume_eff,
         CAST(CASE WHEN q1 = 0 THEN r2 ELSE 0 END AS BIGINT) AS new_eff,
         CAST(CASE WHEN q2 = 0 THEN -r1 ELSE 0 END AS BIGINT) AS exit_eff
  FROM per_part
)
SELECT p.p_brand AS brand,
       CAST(SUM(r1) AS BIGINT) AS rev1_cents,
       CAST(SUM(r2) AS BIGINT) AS rev2_cents,
       CAST(SUM(price_eff) AS BIGINT) AS price_eff_cents,
       CAST(SUM(volume_eff) AS BIGINT) AS volume_eff_cents,
       CAST(SUM(new_eff) AS BIGINT) AS new_eff_cents,
       CAST(SUM(exit_eff) AS BIGINT) AS exit_eff_cents,
       CAST(SUM(r2) - SUM(r1) AS BIGINT) AS delta_cents
FROM eff JOIN {part} p ON p.p_partkey = eff.partkey
GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# Cohen's kappa inter-rater agreement
# --------------------------------------------------------------------------

def cohens_kappa(
    df: DataFrame,
    *,
    rater_a_expr: Column,
    rater_b_expr: Column,
    scale: int = 1_000_000,
) -> DataFrame:
    """Cohen's kappa between two binary raters — chance-corrected
    agreement, the label-QA gate run before trusting labels (two
    heuristic rules, a rule vs a model, or two annotator passes).

    From the 2×2 confusion ``(a=both yes, b=A-only, c=B-only, d=both
    no, n=a+b+c+d)`` the exact rational form with expected agreement
    ``E = (a+b)(a+c) + (c+d)(b+d)`` is
    ``kappa_ppm = (n·(a+d) − E)·1e6 div (n² − E)`` — one division,
    DECIMAL(38,0) products.  Also emits observed/expected agreement in
    ppm.

    Scale shape: one 1-row aggregate over the fact table.
    """
    a_ = rater_a_expr.cast("int")
    b_ = rater_b_expr.cast("int")
    g = df.groupBy().agg(
        F.sum(((a_ == 1) & (b_ == 1)).cast("int")).cast("long").alias("a"),
        F.sum(((a_ == 1) & (b_ == 0)).cast("int")).cast("long").alias("b"),
        F.sum(((a_ == 0) & (b_ == 1)).cast("int")).cast("long").alias("c"),
        F.sum(((a_ == 0) & (b_ == 0)).cast("int")).cast("long").alias("d"),
    )
    g = g.withColumn("n", F.expr("a + b + c + d").cast("long"))
    e = (
        f"({_dec('a')} + b) * (a + c) + ({_dec('c')} + d) * (b + d)"
    )
    kappa = (
        f"CASE WHEN {_dec('n')} * n - ({e}) = 0 THEN {scale} "
        f"ELSE ({_dec('n')} * (a + d) - ({e})) * {scale} "
        f"DIV ({_dec('n')} * n - ({e})) END"
    )
    return g.select(
        "a",
        "b",
        "c",
        "d",
        "n",
        F.expr(f"CAST(({_dec('a')} + d) * {scale} DIV n AS BIGINT)").alias(
            "po_ppm"
        ),
        F.expr(
            f"CAST(({e}) * {scale} DIV ({_dec('n')} * n) AS BIGINT)"
        ).alias("pe_ppm"),
        F.expr(kappa).cast("long").alias("kappa_ppm"),
    )


def cohens_kappa_oracle_sql(
    *,
    table: str = "documents",
    rater_a_sql: str,
    rater_b_sql: str,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of [[cohens_kappa]]."""
    e = "(a + b) * (a + c) + (c + d) * (b + d)"
    return f"""
WITH g AS (
  SELECT
    CAST(SUM(CASE WHEN ({rater_a_sql}) AND ({rater_b_sql}) THEN 1 ELSE 0 END)
         AS BIGINT) AS a,
    CAST(SUM(CASE WHEN ({rater_a_sql}) AND NOT ({rater_b_sql})
             THEN 1 ELSE 0 END) AS BIGINT) AS b,
    CAST(SUM(CASE WHEN NOT ({rater_a_sql}) AND ({rater_b_sql})
             THEN 1 ELSE 0 END) AS BIGINT) AS c,
    CAST(SUM(CASE WHEN NOT ({rater_a_sql}) AND NOT ({rater_b_sql})
             THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM {table}
),
s AS (SELECT *, CAST(a + b + c + d AS BIGINT) AS n FROM g)
SELECT a, b, c, d, n,
       CAST((a + d) * {scale} // n AS BIGINT) AS po_ppm,
       CAST(({e}) * {scale} // (n * n) AS BIGINT) AS pe_ppm,
       CAST(CASE WHEN n * n - ({e}) = 0 THEN {scale}
                 ELSE (n * (a + d) - ({e})) * {scale}
                      // (n * n - ({e})) END AS BIGINT) AS kappa_ppm
FROM s
"""


# --------------------------------------------------------------------------
# Deterministic Poisson bootstrap
# --------------------------------------------------------------------------

# Poisson(1) cumulative probabilities for k = 0..5; the residual tail
# (~5.9e-4) is assigned weight 6.  Thresholds are md5-hex constants
# computed ONCE here and embedded verbatim in both engines' plans, so
# the draw is exact-identical by construction (same trick as
# stratified_hash_sample's _hex_threshold).
_POISSON_CUM = [
    math.exp(-1) * s
    for s in (1.0, 2.0, 2.5, 2.0 + 2.0 / 3, 65.0 / 24, 163.0 / 60)
]
_POISSON_THRESHOLDS = [
    format(int(c * (1 << 128)), "032x") for c in _POISSON_CUM
]


def _poisson_weight_case(hash_sql: str) -> str:
    """SQL CASE mapping a uniform md5 hex digest to a Poisson(1) draw
    (weights 0..6; identical text on both engines)."""
    whens = " ".join(
        f"WHEN {hash_sql} < '{t}' THEN {k}"
        for k, t in enumerate(_POISSON_THRESHOLDS)
    )
    return f"CASE {whens} ELSE 6 END"


def poisson_bootstrap_mean(
    df: DataFrame,
    *,
    id_col: str,
    value_cents_expr: Column,
    n_replicates: int = 64,
    seed: str = "boot",
) -> DataFrame:
    """Distribution-free confidence interval for a mean at corpus
    scale: the Poisson bootstrap (each row enters replicate r with
    weight ~ Poisson(1)), the streaming-friendly bootstrap for data
    too large to resample by index.

    Determinism: the weight for (row, r) is a pure function of
    ``md5('{seed}{r}|{id}')`` against fixed cumulative thresholds — no
    RNG state, no partition dependence, reproducible across engines and
    cluster layouts (same contract as [[stratified_hash_sample]]).
    Replicate means are exact integer ``Σw·cents div Σw``; the interval
    is the 2nd/63rd order statistic of the 64 replicate means (a ~94%
    interval; widen n_replicates for finer tails).

    Output one row: n, the point mean, interval endpoints, and the
    replicate count.

    Scale shape: one fact pass exploded ×n_replicates into an
    n_replicates-group aggregate (map-side partial combine keeps the
    shuffle at n_replicates×partitions rows); the order-statistic
    window runs on n_replicates rows.
    """
    reps = df.select(
        F.col(id_col).cast("string").alias("_id"),
        value_cents_expr.cast("long").alias("_v"),
    ).withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(n_replicates - 1)))
    )
    h = (
        f"md5(CAST('{seed}' || CAST(r AS STRING) || '|' || _id AS BINARY))"
    )
    reps = reps.withColumn("w", F.expr(_poisson_weight_case(h)))
    per_rep = reps.groupBy("r").agg(
        F.sum(F.expr(f"{_dec('w')} * _v")).alias("_wv"),
        F.sum("w").cast("long").alias("_ws"),
    ).select(
        "r",
        F.expr("CAST(_wv DIV NULLIF(_ws, 0) AS BIGINT)").alias("mean_r"),
    )
    wo = W.orderBy(F.col("mean_r").asc(), F.col("r").asc())
    ranked = per_rep.withColumn("rn", F.row_number().over(wo))
    ci = ranked.groupBy().agg(
        F.max(F.when(F.col("rn") == 2, F.col("mean_r")))
        .cast("long").alias("lo_cents"),
        F.max(F.when(F.col("rn") == n_replicates - 1, F.col("mean_r")))
        .cast("long").alias("hi_cents"),
    )
    point = (
        df.select(value_cents_expr.cast("long").alias("_v"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_v").cast("long").alias("_sv"),
        )
        .select(
            "n",
            F.expr(f"CAST({_dec('_sv')} DIV n AS BIGINT)").alias(
                "mean_cents"
            ),
        )
    )
    return point.crossJoin(ci).select(
        "n",
        "mean_cents",
        "lo_cents",
        "hi_cents",
        F.lit(n_replicates).cast("long").alias("n_replicates"),
    )


def poisson_bootstrap_oracle_sql(
    *,
    table: str,
    id_sql: str,
    value_cents_sql: str,
    n_replicates: int = 64,
    seed: str = "boot",
) -> str:
    """DuckDB twin of [[poisson_bootstrap_mean]] (same thresholds,
    same md5 key text, same order statistics)."""
    h = f"md5('{seed}' || CAST(r AS VARCHAR) || '|' || CAST({id_sql} AS VARCHAR))"
    wcase = _poisson_weight_case(h)
    return f"""
WITH reps AS (
  SELECT t.*, g.r, {wcase} AS w
  FROM {table} t CROSS JOIN range({n_replicates}) g(r)
),
per_rep AS (
  SELECT r, CAST(SUM(w * ({value_cents_sql}))
                 // NULLIF(SUM(w), 0) AS BIGINT) AS mean_r
  FROM reps GROUP BY 1
),
ranked AS (
  SELECT mean_r, row_number() OVER (ORDER BY mean_r ASC, r ASC) AS rn
  FROM per_rep
),
ci AS (
  SELECT CAST(MAX(CASE WHEN rn = 2 THEN mean_r END) AS BIGINT) AS lo_cents,
         CAST(MAX(CASE WHEN rn = {n_replicates - 1} THEN mean_r END)
              AS BIGINT) AS hi_cents
  FROM ranked
),
point AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM({value_cents_sql}) // COUNT(*) AS BIGINT) AS mean_cents
  FROM {table}
)
SELECT n, mean_cents, lo_cents, hi_cents,
       CAST({n_replicates} AS BIGINT) AS n_replicates
FROM point CROSS JOIN ci
"""


# --------------------------------------------------------------------------
# Benjamini-Hochberg FDR across per-metric A/B tests
# --------------------------------------------------------------------------

def _chi2_1_inv(q: float) -> float:
    """Inverse upper-tail chi-square quantile for 1 df: the x with
    P(X > x) = q, via bisection on the exact CDF identity
    ``P(X > x) = erfc(sqrt(x/2))``.  Pure stdlib, deterministic — run
    driver-side ONCE so both engines compare against the same embedded
    integer constant (no libm in either plan)."""
    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0,1), got {q}")
    lo, hi = 0.0, 400.0
    for _ in range(200):
        mid = (lo + hi) / 2
        if math.erfc(math.sqrt(mid / 2)) > q:
            lo = mid
        else:
            hi = mid
    return hi


def bh_thresholds_milli(m: int, alpha: float = 0.05) -> list[int]:
    """Benjamini-Hochberg z² cutoffs in milli for ranks 1..m: the test
    ranked i (by z² descending = p ascending) clears BH iff its
    ``z2_milli >= thr[i-1]``, because for 1-df chi-square
    ``p <= alpha·i/m  <=>  z² >= chi2_inv(alpha·i/m)``.  Rank-1 gets the
    strictest cutoff, rank-m the plain-alpha cutoff."""
    return [
        int(round(_chi2_1_inv(alpha * i / m) * 1000)) for i in range(1, m + 1)
    ]


def bh_fdr_event_lift(
    events: DataFrame,
    *,
    metric_types: list[str],
    user_col: str = "user_id",
    variant_expr: Column,
    alpha: float = 0.05,
) -> DataFrame:
    """One A/B readout per metric with Benjamini-Hochberg control of
    the false-discovery rate across the family — the guardrail-metric
    sweep where testing m metrics at raw alpha would inflate false
    alarms m-fold.

    Each metric is "user did ≥1 event of this type"; its statistic is
    the exact rational two-proportion z² of [[ab_conversion_test]].
    BH runs entirely on integers: tests are ranked by z² descending
    (p ascending; metric name breaks ties), each rank compares against
    its chi-square cutoff from [[bh_thresholds_milli]] — computed
    driver-side with stdlib erfc bisection and embedded as literal
    constants in BOTH plans — and the step-up rule rejects every rank
    ≤ the largest rank whose z² clears its cutoff.

    Output per metric: z² milli, BH rank, its cutoff, and the
    0/1 rejected flag.

    Scale shape: one user-keyed aggregate over the fact table, one
    1-row aggregate, then everything runs on m rows.
    """
    m = len(metric_types)
    if m == 0:
        raise ValueError("metric_types must be non-empty")
    thr = bh_thresholds_milli(m, alpha)
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(variant_expr).alias("variant"),
        *[
            F.max((F.col("event_type") == t).cast("int")).alias(f"c{i}")
            for i, t in enumerate(metric_types)
        ],
    )
    aggs = [
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long").alias("na"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long").alias("nb"),
    ]
    for i in range(m):
        aggs.append(
            F.sum(F.when(F.col("variant") == 0, F.col(f"c{i}")).otherwise(0))
            .cast("long").alias(f"ca{i}")
        )
        aggs.append(
            F.sum(F.when(F.col("variant") == 1, F.col(f"c{i}")).otherwise(0))
            .cast("long").alias(f"cb{i}")
        )
    g = per_user.groupBy().agg(*aggs)
    stack = ", ".join(
        f"'{t}', ca{i}, cb{i}" for i, t in enumerate(metric_types)
    )
    melted = g.select(
        "na",
        "nb",
        F.expr(
            f"stack({m}, {stack}) AS (event_type, ca, cb)"
        ),
    )
    z2 = (
        f"CASE WHEN na = 0 OR nb = 0 OR ca + cb = 0 "
        f"OR ca + cb = na + nb THEN 0 ELSE "
        f"({_dec('ca')} * nb - {_dec('cb')} * na)"
        f" * ({_dec('ca')} * nb - {_dec('cb')} * na)"
        f" * (na + nb) * 1000"
        f" DIV ({_dec('na')} * nb * (ca + cb)"
        f"      * ((na + nb) - (ca + cb))) END"
    )
    tests = melted.select(
        "event_type",
        "na",
        "ca",
        "nb",
        "cb",
        F.expr(z2).cast("long").alias("z2_milli"),
    )
    wo = W.orderBy(F.col("z2_milli").desc(), F.col("event_type").asc())
    thr_case = "CASE " + " ".join(
        f"WHEN rnk = {i + 1} THEN {t}" for i, t in enumerate(thr)
    ) + " END"
    ranked = tests.withColumn(
        "rnk", F.row_number().over(wo).cast("long")
    ).withColumn("thr_milli", F.expr(thr_case).cast("long"))
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    ranked = ranked.withColumn(
        "_cut",
        F.max(
            F.when(F.col("z2_milli") >= F.col("thr_milli"), F.col("rnk"))
        ).over(wall),
    )
    return ranked.select(
        "event_type",
        "na",
        "ca",
        "nb",
        "cb",
        "z2_milli",
        "rnk",
        "thr_milli",
        F.when(
            F.col("rnk") <= F.coalesce(F.col("_cut"), F.lit(0)), 1
        ).otherwise(0).cast("long").alias("rejected"),
    )


def bh_fdr_oracle_sql(
    *,
    table: str = "events",
    metric_types: list[str],
    user_col: str = "user_id",
    variant_sql: str = "user_id % 2",
    alpha: float = 0.05,
) -> str:
    """DuckDB twin of [[bh_fdr_event_lift]] (same embedded cutoffs)."""
    m = len(metric_types)
    thr = bh_thresholds_milli(m, alpha)
    in_list = ", ".join(f"'{t}'" for t in metric_types)
    thr_case = "CASE " + " ".join(
        f"WHEN rnk = {i + 1} THEN {t}" for i, t in enumerate(thr)
    ) + " END"
    return f"""
WITH per_user AS (
  SELECT {user_col} AS u, MIN({variant_sql}) AS variant
  FROM {table} GROUP BY 1
),
pops AS (
  SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM per_user
),
conv AS (
  SELECT e.event_type, pu.u, pu.variant
  FROM {table} e JOIN per_user pu ON e.{user_col} = pu.u
  WHERE e.event_type IN ({in_list})
  GROUP BY 1, 2, 3
),
counts AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM conv GROUP BY 1
),
tests AS (
  SELECT t.event_type, p.na, COALESCE(c.ca, 0) AS ca, p.nb,
         COALESCE(c.cb, 0) AS cb
  FROM (SELECT unnest([{in_list}]) AS event_type) t
  LEFT JOIN counts c USING (event_type) CROSS JOIN pops p
),
scored AS (
  SELECT event_type, na, ca, nb, cb,
         CAST(CASE WHEN na = 0 OR nb = 0 OR ca + cb = 0
                    OR ca + cb = na + nb THEN 0
                   ELSE (ca * nb - cb * na) * (ca * nb - cb * na)
                        * (na + nb) * 1000
                        // (na * nb * (ca + cb) * ((na + nb) - (ca + cb)))
              END AS BIGINT) AS z2_milli
  FROM tests
),
ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY z2_milli DESC, event_type ASC)
                 AS BIGINT) AS rnk
  FROM scored
),
thr AS (SELECT *, CAST({thr_case} AS BIGINT) AS thr_milli FROM ranked),
cut AS (
  SELECT *, MAX(CASE WHEN z2_milli >= thr_milli THEN rnk END) OVER () AS c
  FROM thr
)
SELECT event_type, na, ca, nb, cb, z2_milli, rnk, thr_milli,
       CAST(CASE WHEN rnk <= COALESCE(c, 0) THEN 1 ELSE 0 END AS BIGINT)
         AS rejected
FROM cut
"""


# --------------------------------------------------------------------------
# Churn-label training-set construction
# --------------------------------------------------------------------------

def churn_label_windows(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    cutoff_sql: str,
    horizon_days: int = 7,
    value_cents_expr: Column | None = None,
) -> DataFrame:
    """Leak-free churn training set: per user active in the OBSERVATION
    window (everything before the cutoff), behavioral features computed
    ONLY from pre-cutoff events and the label ONLY from the
    ``(cutoff, cutoff + horizon]`` outcome window — the time-split
    discipline that stops target leakage by construction (no feature
    can see the future because no post-cutoff row reaches the feature
    aggregate).

    Features: event count, active days, distinct event types, spend
    cents, days-since-last-activity at the cutoff.  Label:
    ``churned = 1`` iff the user has NO event inside the horizon.

    Scale shape: one user-keyed conditional aggregate over the fact
    table — features and label in the same pass, no joins, no windows.
    """
    if value_cents_expr is None:
        value_cents_expr = F.floor(F.col("value") * 100).cast("long")
    cutoff = F.expr(cutoff_sql)
    end = F.expr(
        f"({cutoff_sql}) + INTERVAL {int(horizon_days)} DAYS"
    )
    pre = F.col("ts") < cutoff
    in_h = (F.col("ts") >= cutoff) & (F.col("ts") < end)
    day = F.expr("datediff(ts, DATE '1970-01-01')")
    cutoff_day = F.expr(
        f"datediff(CAST(({cutoff_sql}) AS DATE), DATE '1970-01-01')"
    )
    out = (
        events.groupBy(F.col(user_col).alias("user_id"))
        .agg(
            F.sum(pre.cast("int")).cast("long").alias("n_events"),
            F.countDistinct(F.when(pre, day)).cast("long").alias(
                "active_days"
            ),
            F.countDistinct(F.when(pre, F.col("event_type"))).cast(
                "long"
            ).alias("n_event_types"),
            F.coalesce(F.sum(F.when(pre, value_cents_expr)), F.lit(0))
            .cast("long").alias("spend_cents"),
            F.max(F.when(pre, day)).alias("_last_day"),
            F.max(in_h.cast("int")).cast("long").alias("_active_in_h"),
        )
        .filter(F.col("n_events") > 0)
        .select(
            "user_id",
            "n_events",
            "active_days",
            "n_event_types",
            "spend_cents",
            (cutoff_day - F.col("_last_day")).cast("long").alias(
                "days_since_last"
            ),
            (1 - F.col("_active_in_h")).cast("long").alias("churned"),
        )
    )
    return out


def churn_label_oracle_sql(
    *,
    table: str = "events",
    user_col: str = "user_id",
    cutoff_sql: str,
    horizon_days: int = 7,
    value_cents_sql: str = "CAST(floor(value * 100) AS BIGINT)",
) -> str:
    """DuckDB twin of [[churn_label_windows]]."""
    return f"""
WITH agg AS (
  SELECT {user_col} AS user_id,
         CAST(SUM(CASE WHEN ts < ({cutoff_sql}) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_events,
         CAST(COUNT(DISTINCT CASE WHEN ts < ({cutoff_sql})
              THEN datediff('day', DATE '1970-01-01', ts) END) AS BIGINT)
           AS active_days,
         CAST(COUNT(DISTINCT CASE WHEN ts < ({cutoff_sql})
              THEN event_type END) AS BIGINT) AS n_event_types,
         CAST(COALESCE(SUM(CASE WHEN ts < ({cutoff_sql})
              THEN {value_cents_sql} END), 0) AS BIGINT) AS spend_cents,
         MAX(CASE WHEN ts < ({cutoff_sql})
             THEN datediff('day', DATE '1970-01-01', ts) END) AS last_day,
         CAST(MAX(CASE WHEN ts >= ({cutoff_sql})
                        AND ts < ({cutoff_sql})
                            + INTERVAL {int(horizon_days)} DAYS
                       THEN 1 ELSE 0 END) AS BIGINT) AS active_in_h
  FROM {table} GROUP BY 1
)
SELECT user_id, n_events, active_days, n_event_types, spend_cents,
       CAST(datediff('day', DATE '1970-01-01',
                     CAST(({cutoff_sql}) AS DATE)) - last_day AS BIGINT)
         AS days_since_last,
       CAST(1 - active_in_h AS BIGINT) AS churned
FROM agg WHERE n_events > 0
"""


# --------------------------------------------------------------------------
# Rolling-origin forecast backtest
# --------------------------------------------------------------------------

def forecast_backtest_sma(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    window_days: int = 7,
    value_cents_expr: Column | None = None,
) -> DataFrame:
    """Rolling-origin backtest of the trailing-mean forecaster against
    the naive (yesterday's value) baseline — the honest way to claim a
    forecasting feature works: every origin day d with a FULL trailing
    window forecasts day d, errors aggregate per key, and the
    mase-style ratio says whether the smoother beats persistence.

    Daily totals live on a DENSE per-key day spine (quiet days are real
    zeros, not missing rows — a sparse spine silently shrinks windows
    and flatters the forecaster).  All integer: forecast_milli =
    trailing_sum·1000 div window; errors in milli-cents;
    ``mae_ratio_ppm = mae_sma·1e6 div mae_naive`` (< 1e6 means the
    smoother wins).

    Scale shape: one (key, day) fact aggregate, a key×calendar spine
    join, one key-partitioned trailing window, one key aggregate —
    spine volume is keys × days, never event volume.
    """
    if value_cents_expr is None:
        value_cents_expr = F.floor(F.col("value") * 100).cast("long")
    day = F.expr("datediff(ts, DATE '1970-01-01')")
    daily = events.groupBy(
        F.col(key_col).alias("k"), day.alias("d")
    ).agg(F.sum(value_cents_expr).cast("long").alias("v"))
    bounds = daily.groupBy().agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    spine = (
        daily.select("k").distinct()
        .crossJoin(F.broadcast(bounds))
        .select("k", F.explode(F.sequence("d0", "d1")).alias("d"))
    )
    dense = spine.join(daily, ["k", "d"], "left").select(
        "k", "d", F.coalesce(F.col("v"), F.lit(0)).alias("v")
    )
    wt = (
        W.partitionBy("k")
        .orderBy("d")
        .rowsBetween(-window_days, -1)
    )
    wn = W.partitionBy("k").orderBy("d")
    scored = (
        dense.withColumn("trail_sum", F.sum("v").over(wt))
        .withColumn("trail_n", F.count("v").over(wt))
        .withColumn("prev_v", F.lag("v").over(wn))
        .filter(F.col("trail_n") == window_days)
        .select(
            "k",
            "v",
            F.expr(f"trail_sum * 1000 DIV {window_days}").alias("fc_milli"),
            "prev_v",
        )
    )
    return (
        scored.groupBy(F.col("k").alias(key_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_origins"),
            F.sum(F.abs(F.col("v") * 1000 - F.col("fc_milli")))
            .cast("long").alias("_ae_sma"),
            F.sum(F.abs((F.col("v") - F.col("prev_v")) * 1000))
            .cast("long").alias("_ae_naive"),
        )
        .select(
            key_col,
            "n_origins",
            F.expr(f"CAST({_dec('_ae_sma')} DIV n_origins AS BIGINT)").alias(
                "mae_sma_milli"
            ),
            F.expr(
                f"CAST({_dec('_ae_naive')} DIV n_origins AS BIGINT)"
            ).alias("mae_naive_milli"),
            F.expr(
                f"CAST(CASE WHEN _ae_naive = 0 THEN NULL "
                f"ELSE {_dec('_ae_sma')} * 1000000 DIV _ae_naive END "
                f"AS BIGINT)"
            ).alias("mae_ratio_ppm"),
        )
    )


def forecast_backtest_oracle_sql(
    *,
    table: str = "events",
    key_col: str = "event_type",
    window_days: int = 7,
    value_cents_sql: str = "CAST(floor(value * 100) AS BIGINT)",
) -> str:
    """DuckDB twin of [[forecast_backtest_sma]]."""
    return f"""
WITH daily AS (
  SELECT {key_col} AS k, datediff('day', DATE '1970-01-01', ts) AS d,
         CAST(SUM({value_cents_sql}) AS BIGINT) AS v
  FROM {table} GROUP BY 1, 2
),
bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
spine AS (
  SELECT k, gs.d
  FROM (SELECT DISTINCT k FROM daily)
  CROSS JOIN bounds
  CROSS JOIN LATERAL (SELECT unnest(range(d0, d1 + 1)) AS d) gs
),
dense AS (
  SELECT s.k, s.d, COALESCE(daily.v, 0) AS v
  FROM spine s LEFT JOIN daily ON daily.k = s.k AND daily.d = s.d
),
scored AS (
  SELECT k, v,
         SUM(v) OVER (PARTITION BY k ORDER BY d
             ROWS BETWEEN {window_days} PRECEDING AND 1 PRECEDING)
           * 1000 // {window_days} AS fc_milli,
         COUNT(v) OVER (PARTITION BY k ORDER BY d
             ROWS BETWEEN {window_days} PRECEDING AND 1 PRECEDING)
           AS trail_n,
         lag(v) OVER (PARTITION BY k ORDER BY d) AS prev_v
  FROM dense
  QUALIFY trail_n = {window_days}
)
SELECT k AS {key_col}, CAST(COUNT(*) AS BIGINT) AS n_origins,
       CAST(SUM(abs(v * 1000 - fc_milli)) // COUNT(*) AS BIGINT)
         AS mae_sma_milli,
       CAST(SUM(abs((v - prev_v) * 1000)) // COUNT(*) AS BIGINT)
         AS mae_naive_milli,
       CAST(CASE WHEN SUM(abs((v - prev_v) * 1000)) = 0 THEN NULL
                 ELSE SUM(abs(v * 1000 - fc_milli)) * 1000000
                      // SUM(abs((v - prev_v) * 1000)) END AS BIGINT)
         AS mae_ratio_ppm
FROM scored GROUP BY 1
"""


# --------------------------------------------------------------------------
# Dispersion (variance-to-mean) index over daily counts
# --------------------------------------------------------------------------

def dispersion_index_daily(
    events: DataFrame,
    *,
    key_col: str = "event_type",
) -> DataFrame:
    """Per-key variance-to-mean ratio of DAILY event counts on the full
    calendar spine — the overdispersion probe: a Poisson-like arrival
    stream sits at vmr ≈ 1 (1000 milli); bursty/clumped traffic reads
    ≫ 1, a metronome ≪ 1.  Quiet calendar days are real zero counts
    (dropping them biases the ratio down exactly when burstiness is
    worst).

    Exact rational: with n spine days, S = Σc, Q = Σc², sample variance
    over mean is ``vmr_milli = (n·Q − S²)·1000 div ((n−1)·S)`` — one
    division through DECIMAL(38,0).

    Scale shape: one (key, day) fact aggregate, then key-sized rows; the
    spine day count arrives from one broadcast 1-row bounds aggregate.
    """
    day = F.expr("datediff(ts, DATE '1970-01-01')")
    daily = events.groupBy(
        F.col(key_col).alias("k"), day.alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    bounds = daily.groupBy().agg(
        (F.max("d") - F.min("d") + 1).cast("long").alias("n_days")
    )
    per_key = daily.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("active_days"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.expr(f"{_dec('c')} * c")).alias("q"),
    )
    # zero days contribute 0 to S and Q — only n changes with the spine
    out = per_key.crossJoin(F.broadcast(bounds)).select(
        F.col("k").alias(key_col),
        "n_days",
        "active_days",
        "s",
        F.expr(
            f"CAST(CASE WHEN n_days < 2 OR s = 0 THEN NULL ELSE "
            f"({_dec('n_days')} * q - {_dec('s')} * s) * 1000 "
            f"DIV (({_dec('n_days')} - 1) * s) END AS BIGINT)"
        ).alias("vmr_milli"),
    )
    return out


def dispersion_index_oracle_sql(
    *,
    table: str = "events",
    key_col: str = "event_type",
) -> str:
    """DuckDB twin of [[dispersion_index_daily]]."""
    return f"""
WITH daily AS (
  SELECT {key_col} AS k, datediff('day', DATE '1970-01-01', ts) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1, 2
),
bounds AS (
  SELECT CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS n_days FROM daily
),
per_key AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS active_days,
         CAST(SUM(c) AS BIGINT) AS s, SUM(c * c) AS q
  FROM daily GROUP BY 1
)
SELECT k AS {key_col}, n_days, active_days, s,
       CAST(CASE WHEN n_days < 2 OR s = 0 THEN NULL
                 ELSE (n_days * q - s * s) * 1000
                      // ((n_days - 1) * s) END AS BIGINT) AS vmr_milli
FROM per_key CROSS JOIN bounds
"""


# --------------------------------------------------------------------------
# Covariate balance audit (standardized mean differences)
# --------------------------------------------------------------------------

def covariate_balance_audit(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    variant_expr: Column,
) -> DataFrame:
    """Pre-analysis randomization health check: per user-level covariate
    (event volume, active days, type breadth, spend), the standardized
    mean difference between variants — |SMD| > 0.1 is the conventional
    imbalance alarm that invalidates a naive readout (and the covariates
    CUPED should absorb).

    The per-variant sufficient statistics (n, Σv, Σv²) are exact
    integers; SMD is then computed in double from those exact integers
    with one fixed expression — IEEE +,*,/ and sqrt are correctly
    rounded, so identical inputs and expression shape give bit-identical
    doubles on both engines — and rounded to 6 (the [[knn_bruteforce]]
    float-output contract).  ``smd = (mean_a − mean_b) /
    sqrt((var_a + var_b) / 2)`` with sample variances.

    Scale shape: one user-keyed aggregate, a 4-row melt, then constant
    rows.
    """
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(variant_expr).alias("variant"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct(
            F.expr("datediff(ts, DATE '1970-01-01')")
        ).cast("long").alias("active_days"),
        F.countDistinct("event_type").cast("long").alias("n_event_types"),
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .cast("long").alias("spend_cents"),
    )
    melted = per_user.select(
        "variant",
        F.expr(
            "stack(4, 'n_events', n_events, 'active_days', active_days, "
            "'n_event_types', n_event_types, 'spend_cents', spend_cents) "
            "AS (covariate, v)"
        ),
    )
    g = melted.groupBy("covariate").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long").alias("na"),
        F.sum(F.when(F.col("variant") == 0, F.col("v")).otherwise(0))
        .cast("long").alias("sa"),
        F.sum(
            F.when(F.col("variant") == 0, F.expr(f"{_dec('v')} * v"))
            .otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("qa"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long").alias("nb"),
        F.sum(F.when(F.col("variant") == 1, F.col("v")).otherwise(0))
        .cast("long").alias("sb"),
        F.sum(
            F.when(F.col("variant") == 1, F.expr(f"{_dec('v')} * v"))
            .otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("qb"),
    )
    smd = (
        "CASE WHEN na < 2 OR nb < 2 THEN NULL ELSE "
        "round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) / "
        "nullif(sqrt(((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na)"
        " / (na - 1)"
        " + (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1))"
        " / 2), 0.0), 6) END"
    )
    return g.select(
        "covariate",
        "na",
        "nb",
        F.expr(f"CAST({_dec('sa')} * 1000000 DIV na AS BIGINT)").alias(
            "mean_a_micro"
        ),
        F.expr(f"CAST({_dec('sb')} * 1000000 DIV nb AS BIGINT)").alias(
            "mean_b_micro"
        ),
        F.expr(smd).cast("double").alias("smd"),
    ).orderBy("covariate")


def covariate_balance_oracle_sql(
    *,
    table: str = "events",
    user_col: str = "user_id",
    variant_sql: str = "user_id % 2",
) -> str:
    """DuckDB twin of [[covariate_balance_audit]] (same exact-integer
    suffstats, same double expression shape)."""
    return f"""
WITH per_user AS (
  SELECT {user_col} AS u, MIN({variant_sql}) AS variant,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT datediff('day', DATE '1970-01-01', ts))
              AS BIGINT) AS active_days,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
         CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
           AS spend_cents
  FROM {table} GROUP BY 1
),
melted AS (
  SELECT variant, covariate, v
  FROM per_user
  CROSS JOIN LATERAL (VALUES
    ('n_events', n_events), ('active_days', active_days),
    ('n_event_types', n_event_types), ('spend_cents', spend_cents)
  ) AS t(covariate, v)
),
g AS (
  SELECT covariate,
         CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN variant = 0 THEN v ELSE 0 END) AS BIGINT) AS sa,
         SUM(CASE WHEN variant = 0 THEN v * v ELSE 0 END) AS qa,
         CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         CAST(SUM(CASE WHEN variant = 1 THEN v ELSE 0 END) AS BIGINT) AS sb,
         SUM(CASE WHEN variant = 1 THEN v * v ELSE 0 END) AS qb
  FROM melted GROUP BY 1
)
SELECT covariate, na, nb,
       CAST(sa * 1000000 // na AS BIGINT) AS mean_a_micro,
       CAST(sb * 1000000 // nb AS BIGINT) AS mean_b_micro,
       CAST(CASE WHEN na < 2 OR nb < 2 THEN NULL ELSE
         round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) /
           nullif(sqrt(((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na)
             / (na - 1)
             + (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb)
             / (nb - 1)) / 2), 0.0), 6) END AS DOUBLE) AS smd
FROM g ORDER BY 1
"""


# --------------------------------------------------------------------------
# A/B power / sample-size readout
# --------------------------------------------------------------------------

def _norm_upper_inv(q: float) -> float:
    """Upper-tail standard-normal quantile via bisection on the exact
    identity ``P(Z > z) = erfc(z/√2)/2`` — stdlib-only, run driver-side
    so both engines see the same embedded constant."""
    if not 0.0 < q < 0.5:
        raise ValueError(f"q must be in (0, 0.5), got {q}")
    lo, hi = 0.0, 40.0
    for _ in range(200):
        mid = (lo + hi) / 2
        if math.erfc(mid / math.sqrt(2)) / 2 > q:
            lo = mid
        else:
            hi = mid
    return hi


def power_constant_micro(alpha: float = 0.05, power: float = 0.8) -> int:
    """``2·(z_{α/2} + z_{β})²`` in micro units — the standard
    two-proportion sample-size constant (15,697,759 micro at the
    conventional α=.05 / power=.8)."""
    z = _norm_upper_inv(alpha / 2) + _norm_upper_inv(1 - power)
    return int(round(2 * z * z * 1_000_000))


def ab_power_sample_size(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    convert_expr: Column,
    rel_mde_ppm: tuple[int, ...] = (50_000, 100_000, 200_000),
    alpha: float = 0.05,
    power: float = 0.8,
) -> DataFrame:
    """Pre-experiment planning readout: per relative MDE, the users
    PER VARIANT needed to detect that lift on this metric at the given
    α/power — computed from the corpus' own base rate, so the answer
    tracks the data instead of a spreadsheet.

    Exact integer form: with base rate ``p_ppm`` and absolute effect
    ``δ_ppm = p_ppm·mde div 1e6``, the classic two-proportion formula
    ``n = 2(z_{α/2}+z_β)²·p(1−p)/δ²`` becomes
    ``n = ceil(C_micro·p_ppm·(1e6−p_ppm) / (1e6·δ_ppm²))`` with
    ``C_micro`` from [[power_constant_micro]] (stdlib erfc bisection,
    embedded identically in both plans).  Products ride DECIMAL(38,0).

    Scale shape: one user-keyed aggregate + one 1-row aggregate, then
    len(rel_mde_ppm) constant rows.
    """
    c_micro = power_constant_micro(alpha, power)
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        F.max(convert_expr.cast("int")).alias("converted")
    )
    base = per_user.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    ).withColumn(
        "p_ppm",
        F.expr(f"CAST({_dec('n_converted')} * 1000000 DIV n_users AS BIGINT)"),
    )
    mdes = ", ".join(str(int(m)) for m in rel_mde_ppm)
    out = base.select(
        "n_users",
        "n_converted",
        "p_ppm",
        F.explode(F.expr(f"array({mdes})")).alias("rel_mde_ppm"),
    ).withColumn(
        "delta_ppm",
        F.expr("CAST(p_ppm * rel_mde_ppm DIV 1000000 AS BIGINT)"),
    )
    n_req = (
        f"CASE WHEN delta_ppm = 0 THEN NULL ELSE "
        f"CAST(({_dec(str(c_micro))} * p_ppm * (1000000 - p_ppm) "
        f"+ ({_dec('delta_ppm')} * delta_ppm * 1000000) - 1) "
        f"DIV ({_dec('delta_ppm')} * delta_ppm * 1000000) AS BIGINT) END"
    )
    return out.select(
        F.col("rel_mde_ppm").cast("long").alias("rel_mde_ppm"),
        "n_users",
        "p_ppm",
        "delta_ppm",
        F.expr(n_req).alias("n_required_per_variant"),
    )


def ab_power_oracle_sql(
    *,
    table: str = "events",
    user_col: str = "user_id",
    convert_sql: str = "event_type = 'purchase'",
    rel_mde_ppm: tuple[int, ...] = (50_000, 100_000, 200_000),
    alpha: float = 0.05,
    power: float = 0.8,
) -> str:
    """DuckDB twin of [[ab_power_sample_size]] (same embedded constant)."""
    c_micro = power_constant_micro(alpha, power)
    mdes = ", ".join(str(int(m)) for m in rel_mde_ppm)
    return f"""
WITH per_user AS (
  SELECT {user_col} AS u,
         MAX(CASE WHEN {convert_sql} THEN 1 ELSE 0 END) AS converted
  FROM {table} GROUP BY 1
),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(converted) AS BIGINT) AS n_converted
  FROM per_user
),
p AS (
  SELECT *, CAST(n_converted * 1000000 // n_users AS BIGINT) AS p_ppm
  FROM base
),
m AS (
  SELECT p.*, CAST(t.rel_mde_ppm AS BIGINT) AS rel_mde_ppm,
         CAST(p_ppm * t.rel_mde_ppm // 1000000 AS BIGINT) AS delta_ppm
  FROM p CROSS JOIN (SELECT unnest([{mdes}]) AS rel_mde_ppm) t
)
SELECT rel_mde_ppm, n_users, p_ppm, delta_ppm,
       CAST(CASE WHEN delta_ppm = 0 THEN NULL ELSE
         ({c_micro} * p_ppm * (1000000 - p_ppm)
          + (delta_ppm * delta_ppm * 1000000) - 1)
         // (delta_ppm * delta_ppm * 1000000) END AS BIGINT)
         AS n_required_per_variant
FROM m
"""


# --------------------------------------------------------------------------
# Post-stratified lift
# --------------------------------------------------------------------------

def post_stratified_lift(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    variant_expr: Column,
    pre_expr: Column,
    convert_expr: Column,
) -> DataFrame:
    """Stratified A/B adjustment — the categorical sibling of
    [[cuped_adjusted_lift]]: users are bucketed by PRE-period activity
    (power-of-2 event-count bands, ``length(bin(pre_n))`` = ⌊log2⌋+1 —
    the [[customer_recency_bands]] trick shifted up by one, identical in
    both engines; r7 ADVICE fixed this doc), the rate difference is
    computed within each stratum, and the post-stratified overall lift
    is the stratum-size-weighted fold ``Σ n_s·diff_s div N``.  When
    variants are imbalanced across activity bands (heavy users landing
    in one arm), the naive pooled diff is confounded; this one is not.
    The outcome is conversion in the POST period only, so the stratum
    never looks at its own outcome window.

    Output: one row per stratum (band, per-variant exposures and
    conversions, within-stratum diff) plus a ``band = -1`` summary row
    carrying the naive pooled diff and the post-stratified diff.

    Scale shape: one user-keyed conditional aggregate, then strata-sized
    rows (≤ ~40 bands by construction).
    """
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(variant_expr).alias("variant"),
        F.sum(pre_expr.cast("int")).cast("long").alias("pre_n"),
        F.max((F.when(~pre_expr, convert_expr).otherwise(F.lit(False)))
              .cast("int")).alias("converted"),
    )
    banded = per_user.withColumn(
        "band",
        F.when(F.col("pre_n") == 0, F.lit(0)).otherwise(
            F.expr("length(bin(pre_n))")
        ).cast("long"),
    )
    strata = banded.groupBy("band").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long").alias("na"),
        F.sum(F.when((F.col("variant") == 0) & (F.col("converted") == 1), 1)
              .otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long").alias("nb"),
        F.sum(F.when((F.col("variant") == 1) & (F.col("converted") == 1), 1)
              .otherwise(0)).cast("long").alias("cb"),
    )
    diff = (
        "CASE WHEN na = 0 OR nb = 0 THEN NULL ELSE "
        f"CAST({_dec('ca')} * 1000000 DIV na "
        f"- {_dec('cb')} * 1000000 DIV nb AS BIGINT) END"
    )
    strata = strata.withColumn("diff_ppm", F.expr(diff))
    summary = strata.groupBy().agg(
        F.lit(-1).cast("long").alias("band"),
        F.sum("na").cast("long").alias("na"),
        F.sum("ca").cast("long").alias("ca"),
        F.sum("nb").cast("long").alias("nb"),
        F.sum("cb").cast("long").alias("cb"),
        F.expr(
            "CAST(SUM(CASE WHEN diff_ppm IS NULL THEN 0 "
            "ELSE (na + nb) * diff_ppm END) "
            "DIV SUM(CASE WHEN diff_ppm IS NULL THEN 0 "
            "ELSE na + nb END) AS BIGINT)"
        ).alias("diff_ppm"),
    ).select(
        "band", "na", "ca", "nb", "cb",
        F.col("diff_ppm").cast("long").alias("diff_ppm"),
    )
    per_stratum = strata.select(
        F.col("band").cast("long").alias("band"),
        "na", "ca", "nb", "cb",
        F.col("diff_ppm").cast("long").alias("diff_ppm"),
    )
    return per_stratum.unionByName(summary).orderBy("band")


def post_stratified_oracle_sql(
    *,
    table: str = "events",
    user_col: str = "user_id",
    variant_sql: str = "user_id % 2",
    pre_sql: str,
    convert_sql: str,
) -> str:
    """DuckDB twin of [[post_stratified_lift]]."""
    return f"""
WITH per_user AS (
  SELECT {user_col} AS u, MIN({variant_sql}) AS variant,
         CAST(SUM(CASE WHEN {pre_sql} THEN 1 ELSE 0 END) AS BIGINT) AS pre_n,
         MAX(CASE WHEN NOT ({pre_sql}) AND ({convert_sql})
             THEN 1 ELSE 0 END) AS converted
  FROM {table} GROUP BY 1
),
banded AS (
  SELECT *, CAST(CASE WHEN pre_n = 0 THEN 0
                      ELSE length(bin(pre_n)) END AS BIGINT) AS band
  FROM per_user
),
strata AS (
  SELECT band,
         CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN variant = 0 AND converted = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         CAST(SUM(CASE WHEN variant = 1 AND converted = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS cb
  FROM banded GROUP BY 1
),
d AS (
  SELECT *, CASE WHEN na = 0 OR nb = 0 THEN NULL
                 ELSE CAST(ca * 1000000 // na - cb * 1000000 // nb
                           AS BIGINT) END AS diff_ppm
  FROM strata
)
SELECT band, na, ca, nb, cb, diff_ppm FROM d
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(SUM(na) AS BIGINT), CAST(SUM(ca) AS BIGINT),
       CAST(SUM(nb) AS BIGINT), CAST(SUM(cb) AS BIGINT),
       CAST(SUM(CASE WHEN diff_ppm IS NULL THEN 0
                     ELSE (na + nb) * diff_ppm END)
            // SUM(CASE WHEN diff_ppm IS NULL THEN 0 ELSE na + nb END)
            AS BIGINT)
FROM d
ORDER BY band
"""


# --------------------------------------------------------------------------
# Proportion control chart (p-chart)
# --------------------------------------------------------------------------

def proportion_control_chart(
    df: DataFrame,
    *,
    group_expr: Column,
    flag_expr: Column,
    sigma: int = 3,
) -> DataFrame:
    """Shewhart p-chart over per-group proportions: flag the groups
    whose defect rate sits outside the ±kσ binomial band around the
    corpus rate — the SPC view of "which ship-days had an abnormal
    return rate" that a global rate or a value-based CUSUM can't give
    (each group has its own n, so its own band width).

    Exact integer out-of-band test, cross-multiplied to avoid every
    division: with group (r_d, n_d) and corpus (R, N),
    ``(r_d·N − R·n_d)² > k²·R·(N−R)·n_d`` flags the group (derivation:
    ``(p_d−p̄)² > k²·p̄(1−p̄)/n_d`` with both sides ×``n_d·N²``).
    DECIMAL(38,0) squares; the side is the sign of ``r_d·N − R·n_d``.

    Scale shape: one group-keyed fact aggregate + one broadcast 1-row
    corpus aggregate.
    """
    per_group = df.groupBy(group_expr.alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(flag_expr.cast("int")).cast("long").alias("flagged"),
    )
    return pchart_readout(per_group, sigma=sigma)


def pchart_readout(per_group: DataFrame, *, sigma: int = 3) -> DataFrame:
    """The p-chart arithmetic over an already-aggregated
    ``(grp, n, flagged)`` counter table — shared by the batch operator
    and the streaming counter-maintenance twin
    ([[streaming_pchart_maintain]]), so the chart over streamed state is
    bit-identical to the batch chart by construction."""
    corpus = per_group.groupBy().agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("flagged").cast("long").alias("rr"),
    )
    j = per_group.crossJoin(F.broadcast(corpus))
    dev = f"{_dec('flagged')} * nn - {_dec('rr')} * n"
    oob = (
        f"CASE WHEN ({dev}) * ({dev}) > "
        f"{sigma * sigma} * {_dec('rr')} * (nn - rr) * n "
        f"THEN 1 ELSE 0 END"
    )
    return j.select(
        F.col("grp"),
        "n",
        "flagged",
        F.expr(f"CAST({_dec('flagged')} * 1000000 DIV n AS BIGINT)").alias(
            "p_ppm"
        ),
        F.expr(f"CAST({_dec('rr')} * 1000000 DIV nn AS BIGINT)").alias(
            "pbar_ppm"
        ),
        F.expr(oob).cast("long").alias("out_of_band"),
        F.expr(
            f"CAST(CASE WHEN ({dev}) > 0 THEN 1 "
            f"WHEN ({dev}) < 0 THEN -1 ELSE 0 END AS BIGINT)"
        ).alias("side"),
    ).orderBy("grp")


def proportion_control_chart_oracle_sql(
    *,
    table: str,
    group_sql: str,
    flag_sql: str,
    sigma: int = 3,
) -> str:
    """DuckDB twin of [[proportion_control_chart]]."""
    dev = "flagged * nn - rr * n"
    return f"""
WITH per_group AS (
  SELECT {group_sql} AS grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN {flag_sql} THEN 1 ELSE 0 END) AS BIGINT)
           AS flagged
  FROM {table} GROUP BY 1
),
corpus AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(flagged) AS BIGINT) AS rr
  FROM per_group
)
SELECT grp, n, flagged,
       CAST(flagged * 1000000 // n AS BIGINT) AS p_ppm,
       CAST(rr * 1000000 // nn AS BIGINT) AS pbar_ppm,
       CAST(CASE WHEN ({dev}) * ({dev})
                      > {sigma * sigma} * rr * (nn - rr) * n
                 THEN 1 ELSE 0 END AS BIGINT) AS out_of_band,
       CAST(CASE WHEN ({dev}) > 0 THEN 1 WHEN ({dev}) < 0 THEN -1
                 ELSE 0 END AS BIGINT) AS side
FROM per_group CROSS JOIN corpus
ORDER BY grp
"""


# --------------------------------------------------------------------------
# Top-k churn between consecutive periods
# --------------------------------------------------------------------------

def topk_churn_daily(
    events: DataFrame,
    *,
    item_expr: Column,
    value_cents_expr: Column | None = None,
    k: int = 20,
) -> DataFrame:
    """Leaderboard stability: per active day, how much of the top-k
    (by revenue) changed versus the PREVIOUS active day — entrants,
    dropouts, and an overlap ppm.  A stable catalog shows churn near
    zero; a promo or a data bug shows up as a spike.

    Determinism: the top-k cut is ``row_number`` over (revenue desc,
    item asc) — total order, no tie ambiguity.  Day adjacency is by
    ACTIVE day (rank over distinct days), so an empty calendar day
    doesn't manufacture a full-churn pair.

    Sparse days are handled exactly (r7 ADVICE): ``n_dropouts`` is
    derived from the PREVIOUS day's set (|prev \\ cur|, not a copy of
    the entrant count) and ``overlap_ppm`` divides by the current day's
    ACTUAL list size, so a day whose leaderboard has fewer than ``k``
    items still reports true churn.

    Scale shape: one (day, item) fact aggregate, a per-day top-k window
    on day-item volume, then joins on consecutive-day pairs over days×k
    rows only.
    """
    if value_cents_expr is None:
        value_cents_expr = F.floor(F.col("value") * 100).cast("long")
    day = F.expr("datediff(ts, DATE '1970-01-01')")
    di = events.groupBy(day.alias("d"), item_expr.alias("item")).agg(
        F.sum(value_cents_expr).cast("long").alias("rev")
    )
    wk = W.partitionBy("d").orderBy(F.col("rev").desc(), F.col("item").asc())
    topk = di.withColumn("rn", F.row_number().over(wk)).filter(
        F.col("rn") <= k
    ).select("d", "item")
    days = topk.select("d").distinct()
    wd = W.orderBy("d")
    pairs = days.withColumn("prev_d", F.lag("d").over(wd)).filter(
        F.col("prev_d").isNotNull()
    )
    sizes = topk.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    cur = topk.select(F.col("d").alias("cd"), "item")
    prev = topk.select(F.col("d").alias("pd"), F.col("item").alias("pitem"))
    stayed = (
        pairs.join(cur, F.col("cd") == F.col("d"))
        .join(
            prev,
            (F.col("pd") == F.col("prev_d"))
            & (F.col("pitem") == F.col("item")),
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("n_stayed"))
    )
    per_day = (
        pairs.join(
            sizes.select(F.col("d").alias("sd"), F.col("sz").alias("cur_sz")),
            F.col("sd") == F.col("d"),
        )
        .join(
            sizes.select(
                F.col("d").alias("psd"), F.col("sz").alias("prev_sz")
            ),
            F.col("psd") == F.col("prev_d"),
        )
        .join(stayed.withColumnRenamed("d", "std"),
              F.col("std") == F.col("d"), "left")
        .select(
            "d",
            F.coalesce(F.col("n_stayed"), F.lit(0)).cast("long")
            .alias("n_stayed"),
            "cur_sz",
            "prev_sz",
        )
    )
    return per_day.select(
        "d",
        "n_stayed",
        (F.col("cur_sz") - F.col("n_stayed")).cast("long")
        .alias("n_entrants"),
        (F.col("prev_sz") - F.col("n_stayed")).cast("long")
        .alias("n_dropouts"),
        F.expr("CAST(n_stayed * 1000000 DIV cur_sz AS BIGINT)").alias(
            "overlap_ppm"
        ),
    ).orderBy("d")


def topk_churn_oracle_sql(
    *,
    table: str = "events",
    item_sql: str,
    value_cents_sql: str = "CAST(floor(value * 100) AS BIGINT)",
    k: int = 20,
) -> str:
    """DuckDB twin of [[topk_churn_daily]]: dropouts come from the
    previous day's set (|prev \\ cur|) and the overlap ratio divides by
    the current day's ACTUAL list size, so sparse days (< k items) are
    exact on both engines (r7 ADVICE)."""
    return f"""
WITH di AS (
  SELECT datediff('day', DATE '1970-01-01', ts) AS d, {item_sql} AS item,
         CAST(SUM({value_cents_sql}) AS BIGINT) AS rev
  FROM {table} GROUP BY 1, 2
),
topk AS (
  SELECT d, item
  FROM (SELECT *, row_number() OVER (PARTITION BY d
            ORDER BY rev DESC, item ASC) AS rn FROM di)
  WHERE rn <= {k}
),
sizes AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS sz FROM topk GROUP BY 1),
days AS (
  SELECT d, lag(d) OVER (ORDER BY d) AS prev_d
  FROM (SELECT DISTINCT d FROM topk)
),
pairs AS (SELECT * FROM days WHERE prev_d IS NOT NULL),
stayed AS (
  SELECT p.d, CAST(COUNT(*) AS BIGINT) AS n_stayed
  FROM pairs p
  JOIN topk cur ON cur.d = p.d
  JOIN topk prev ON prev.d = p.prev_d AND prev.item = cur.item
  GROUP BY 1
)
SELECT p.d,
       CAST(COALESCE(s.n_stayed, 0) AS BIGINT) AS n_stayed,
       CAST(cs.sz - COALESCE(s.n_stayed, 0) AS BIGINT) AS n_entrants,
       CAST(ps.sz - COALESCE(s.n_stayed, 0) AS BIGINT) AS n_dropouts,
       CAST(COALESCE(s.n_stayed, 0) * 1000000 // cs.sz AS BIGINT)
         AS overlap_ppm
FROM pairs p
JOIN sizes cs ON cs.d = p.d
JOIN sizes ps ON ps.d = p.prev_d
LEFT JOIN stayed s ON s.d = p.d
ORDER BY 1
"""


# --------------------------------------------------------------------------
# Univariate feature lift deciles
# --------------------------------------------------------------------------

def feature_lift_deciles(
    labeled: DataFrame,
    *,
    feature_col: str,
    label_col: str,
    id_col: str,
    n_tiles: int = 10,
) -> DataFrame:
    """Univariate lift table: rank units into deciles of one feature
    (total order ``(feature, id)`` — ntile over a total order is
    identical across engines) and report each decile's label rate and
    its lift versus the global rate — the first-look screen for "does
    this feature separate the label at all", run before any model.

    Composes [[churn_label_windows]]: feed it the labeled training set
    and screen each candidate feature.

    Scale shape: one ntile window over the unit table (unit-sized, not
    event-sized) + one n_tiles-row aggregate.
    """
    w = W.orderBy(F.col(feature_col).asc(), F.col(id_col).asc())
    tiled = labeled.withColumn(
        "decile", F.ntile(n_tiles).over(w).cast("long")
    )
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(label_col)).cast("long").alias("positives"),
    )
    tot = per.groupBy().agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("positives").cast("long").alias("pp"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "positives",
            F.expr(
                f"CAST({_dec('positives')} * 1000000 DIV n AS BIGINT)"
            ).alias("rate_ppm"),
            F.expr(
                f"CAST(CASE WHEN pp = 0 THEN NULL ELSE "
                f"({_dec('positives')} * nn) * 1000000 "
                f"DIV ({_dec('pp')} * n) END AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy("decile")
    )


def feature_lift_oracle_sql(
    *,
    labeled_sql: str,
    feature_sql: str,
    label_sql: str,
    id_sql: str,
    n_tiles: int = 10,
) -> str:
    """DuckDB twin of [[feature_lift_deciles]]."""
    return f"""
WITH tiled AS (
  SELECT CAST(ntile({n_tiles}) OVER (ORDER BY {feature_sql} ASC,
              {id_sql} ASC) AS BIGINT) AS decile,
         {label_sql} AS label
  FROM ({labeled_sql})
),
per AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(label) AS BIGINT) AS positives
  FROM tiled GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(positives) AS BIGINT) AS pp
  FROM per
)
SELECT decile, n, positives,
       CAST(positives * 1000000 // n AS BIGINT) AS rate_ppm,
       CAST(CASE WHEN pp = 0 THEN NULL ELSE
            (positives * nn) * 1000000 // (pp * n) END AS BIGINT)
         AS lift_ppm
FROM per CROSS JOIN tot ORDER BY decile
"""


# --------------------------------------------------------------------------
# Empirical-Bayes smoothed group rates
# --------------------------------------------------------------------------

def smoothed_group_rates(
    df: DataFrame,
    *,
    group_expr: Column,
    flag_expr: Column,
    prior_strength: int = 500,
) -> DataFrame:
    """Additive-smoothed per-group rates: each group's raw rate is
    pulled toward the corpus rate with a pseudo-count prior of
    ``prior_strength`` observations — the estimator that stops a
    2-for-2 group from outranking a 980-for-1000 one in any
    rate-sorted report (CTR tables, return-rate league tables).

    Exact integer form: with corpus rate ``pbar_ppm = R·1e6 div N``,
    ``shrunk_ppm = (r·1e6 + M·pbar_ppm) div (n + M)`` — the raw count
    and the prior mass share one division.  ``weight_ppm = n·1e6 div
    (n+M)`` says how much the group speaks for itself.

    Scale shape: one group-keyed fact aggregate + one broadcast 1-row
    corpus aggregate.
    """
    m = int(prior_strength)
    per_group = df.groupBy(group_expr.alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(flag_expr.cast("int")).cast("long").alias("r"),
    )
    corpus = per_group.groupBy().agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("r").cast("long").alias("rr"),
    ).withColumn(
        "pbar_ppm",
        F.expr(f"CAST({_dec('rr')} * 1000000 DIV nn AS BIGINT)"),
    )
    return (
        per_group.crossJoin(F.broadcast(corpus))
        .select(
            "grp",
            "n",
            "r",
            F.expr(f"CAST({_dec('r')} * 1000000 DIV n AS BIGINT)").alias(
                "raw_ppm"
            ),
            "pbar_ppm",
            F.expr(
                f"CAST(({_dec('r')} * 1000000 + {m} * pbar_ppm) "
                f"DIV (n + {m}) AS BIGINT)"
            ).alias("shrunk_ppm"),
            F.expr(f"CAST({_dec('n')} * 1000000 DIV (n + {m}) AS BIGINT)")
            .alias("weight_ppm"),
        )
        .orderBy("grp")
    )


def smoothed_group_rates_oracle_sql(
    *,
    table: str,
    group_sql: str,
    flag_sql: str,
    prior_strength: int = 500,
) -> str:
    """DuckDB twin of [[smoothed_group_rates]]."""
    m = int(prior_strength)
    return f"""
WITH per_group AS (
  SELECT {group_sql} AS grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN {flag_sql} THEN 1 ELSE 0 END) AS BIGINT) AS r
  FROM {table} GROUP BY 1
),
corpus AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(r) AS BIGINT) AS rr,
         CAST(SUM(r) * 1000000 // SUM(n) AS BIGINT) AS pbar_ppm
  FROM per_group
)
SELECT grp, n, r,
       CAST(r * 1000000 // n AS BIGINT) AS raw_ppm,
       pbar_ppm,
       CAST((r * 1000000 + {m} * pbar_ppm) // (n + {m}) AS BIGINT)
         AS shrunk_ppm,
       CAST(n * 1000000 // (n + {m}) AS BIGINT) AS weight_ppm
FROM per_group CROSS JOIN corpus
ORDER BY grp
"""


# --------------------------------------------------------------------------
# Exact AUC-ROC via the rank form
# --------------------------------------------------------------------------

def auc_roc(
    df: DataFrame,
    *,
    score_expr: Column,
    label_expr: Column,
) -> DataFrame:
    """Exact AUC-ROC from the Mann-Whitney identity ``AUC = U⁺/(n⁺·n⁻)``
    — the probability a random positive outscores a random negative,
    ties at half credit (average ranks), computed with the
    [[mann_whitney_u]] doubled-rank histogram so the whole statistic is
    integer until ONE final division: ``auc_ppm = u1_x2·500000 div
    (n_pos·n_neg)``.  No curve construction, no threshold sweep, no
    floats — and the rank window runs on the score HISTOGRAM, never the
    fact table.

    Output one row: n_pos, n_neg, auc_ppm, gini_ppm (= 2·AUC − 1).
    """
    hist = df.groupBy(score_expr.alias("v")).agg(
        F.sum(F.when(label_expr.cast("int") == 0, 1).otherwise(0))
        .cast("long").alias("n0v"),
        F.sum(F.when(label_expr.cast("int") == 1, 1).otherwise(0))
        .cast("long").alias("n1v"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    hist = hist.withColumn("tv", F.col("n0v") + F.col("n1v")).withColumn(
        "below", F.coalesce(F.sum("tv").over(w), F.lit(0))
    ).withColumn("dr", 2 * F.col("below") + F.col("tv") + F.lit(1))
    g = hist.groupBy().agg(
        F.sum("n0v").cast("long").alias("n_neg"),
        F.sum("n1v").cast("long").alias("n_pos"),
        F.sum(F.expr(f"{_dec('n1v')} * dr")).alias("r1x2"),
    )
    g = g.withColumn(
        "u1_x2",
        F.expr(f"CAST(r1x2 - {_dec('n_pos')} * (n_pos + 1) AS BIGINT)"),
    )
    auc = (
        "CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE "
        f"CAST({_dec('u1_x2')} * 500000 DIV ({_dec('n_pos')} * n_neg) "
        "AS BIGINT) END"
    )
    return g.select(
        "n_pos",
        "n_neg",
        F.expr(auc).alias("auc_ppm"),
        F.expr(f"CAST(2 * ({auc}) - 1000000 AS BIGINT)").alias("gini_ppm"),
    )


def auc_roc_oracle_sql(
    *,
    scored_sql: str,
    score_sql: str = "score_ppm",
    label_sql: str = "label",
) -> str:
    """DuckDB twin of [[auc_roc]] over any (score, label) relation."""
    return f"""
WITH hist AS (
  SELECT {score_sql} AS v,
         CAST(SUM(CASE WHEN {label_sql} = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n0v,
         CAST(SUM(CASE WHEN {label_sql} = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n1v
  FROM ({scored_sql}) GROUP BY 1
),
ranked AS (
  SELECT *, n0v + n1v AS tv,
         COALESCE(SUM(n0v + n1v) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM hist
),
g AS (
  SELECT CAST(SUM(n0v) AS BIGINT) AS n_neg,
         CAST(SUM(n1v) AS BIGINT) AS n_pos,
         SUM(n1v * (2 * below + tv + 1)) AS r1x2
  FROM ranked
),
s AS (
  SELECT *, CAST(r1x2 - n_pos * (n_pos + 1) AS BIGINT) AS u1_x2 FROM g
)
SELECT n_pos, n_neg,
       CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
                 ELSE u1_x2 * 500000 // (n_pos * n_neg) END AS BIGINT)
         AS auc_ppm,
       CAST(2 * (CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
                      ELSE u1_x2 * 500000 // (n_pos * n_neg) END)
            - 1000000 AS BIGINT) AS gini_ppm
FROM s
"""


# --------------------------------------------------------------------------
# Kaplan-Meier survival with exact per-step integer folds
# --------------------------------------------------------------------------

def kaplan_meier_survival(
    cohort_risk: DataFrame,
) -> DataFrame:
    """Kaplan-Meier product-limit survival over a ``(t, d, n_risk)``
    event-time table — the multiplicative twin of the additive
    [[nelson_aalen_hazard]] (whose registry comment says "KM's product
    would need floats": it doesn't — the product is computed as a
    SEQUENTIAL integer fold, ``S_k = S_{k-1}·(n_k−d_k) div n_k`` in ppm
    with a floor at every step, a fixed op sequence both engines execute
    identically; the cumulative floor error is bounded by one ppm per
    event time).

    Spark side: the event-time table (domain-sized — distinct event
    days, never cohort size) is gathered into ONE sorted array and each
    prefix is folded with ``aggregate(slice(...))``; O(k²) lambda steps
    on k event days is immaterial for any calendar-bounded study.

    Output per event time: t, d, n_risk, survival_ppm.
    """
    arr = cohort_risk.select(
        F.struct(
            F.col("t").cast("long").alias("t"),
            F.col("d").cast("long").alias("d"),
            F.col("n_risk").cast("long").alias("n"),
        ).alias("s")
    ).groupBy().agg(
        F.expr("sort_array(collect_list(s))").alias("arr")
    )
    return arr.select(
        F.explode(
            F.expr(
                "transform(arr, (x, i) -> struct("
                "x.t AS t, x.d AS d, x.n AS n_risk, "
                "aggregate(slice(arr, 1, i + 1), CAST(1000000 AS BIGINT), "
                "(acc, y) -> acc * (y.n - y.d) DIV y.n) AS survival_ppm))"
            )
        ).alias("r")
    ).select("r.t", "r.d", "r.n_risk", "r.survival_ppm")


def kaplan_meier_oracle_sql(risk_sql: str) -> str:
    """DuckDB twin of [[kaplan_meier_survival]]: the same sequential
    floor fold as a recursive CTE over the rank-ordered event times."""
    return f"""
WITH RECURSIVE evd AS (
  SELECT t, d, n_risk,
         row_number() OVER (ORDER BY t) AS rn
  FROM ({risk_sql})
),
km AS (
  SELECT t, d, n_risk, rn,
         CAST(1000000 * (n_risk - d) // n_risk AS BIGINT) AS survival_ppm
  FROM evd WHERE rn = 1
  UNION ALL
  SELECT e.t, e.d, e.n_risk, e.rn,
         CAST(km.survival_ppm * (e.n_risk - e.d) // e.n_risk AS BIGINT)
  FROM km JOIN evd e ON e.rn = km.rn + 1
)
SELECT t, d, n_risk, survival_ppm FROM km
"""


# --------------------------------------------------------------------------
# Difference-in-differences (2x2)
# --------------------------------------------------------------------------

def diff_in_diff(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    variant_expr: Column,
    post_expr: Column,
    value_cents_expr: Column | None = None,
) -> DataFrame:
    """Two-group x two-period difference-in-differences: the causal-lift
    estimator when treatment lands at a known cutover and a control
    group rides along — DiD removes both the group's fixed level
    difference and the common time trend that a naive post-vs-post
    compare confounds.

    Unit = user (every user with ANY event appears in both periods,
    zero-filled), outcome = the user's summed value cents in the
    period.  All integer: per-cell ``mean_micro = sum_cents * 1e6 DIV
    n_users`` (floored ONCE per cell, identical op order both engines),
    then ``did_micro = (m_t_post - m_t_pre) - (m_c_post - m_c_pre)`` on
    the already-floored integers — plain int arithmetic, no float
    anywhere.

    Output: four (grp, period) cell rows (n_users, sum_cents,
    mean_micro) plus a ``grp = -1, period = 'did'`` summary row whose
    ``mean_micro`` carries the DiD estimate (the [[post_stratified_lift]]
    summary-row convention).

    Scale shape: one user-keyed conditional aggregate over the fact
    table, then 2 rows -> 4 cells + 1 summary.
    """
    if value_cents_expr is None:
        value_cents_expr = F.floor(F.col("value") * 100).cast("long")
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(variant_expr).cast("long").alias("grp"),
        F.sum(F.when(~post_expr, value_cents_expr).otherwise(F.lit(0)))
        .cast("long").alias("pre_cents"),
        F.sum(F.when(post_expr, value_cents_expr).otherwise(F.lit(0)))
        .cast("long").alias("post_cents"),
    )
    cells = per_user.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("pre_cents").cast("long").alias("s_pre"),
        F.sum("post_cents").cast("long").alias("s_post"),
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    m_pre = F.expr(
        f"CAST({dec.format('s_pre')} * 1000000 DIV n_users AS BIGINT)"
    )
    m_post = F.expr(
        f"CAST({dec.format('s_post')} * 1000000 DIV n_users AS BIGINT)"
    )
    long_cells = cells.select(
        "grp",
        F.lit("pre").alias("period"),
        "n_users",
        F.col("s_pre").alias("sum_cents"),
        m_pre.alias("mean_micro"),
    ).unionByName(
        cells.select(
            "grp",
            F.lit("post").alias("period"),
            "n_users",
            F.col("s_post").alias("sum_cents"),
            m_post.alias("mean_micro"),
        )
    )
    wide = cells.select(
        "grp", m_pre.alias("m_pre"), m_post.alias("m_post")
    )
    summary = wide.groupBy().agg(
        F.sum(F.when(F.col("grp") == 1, F.col("m_post") - F.col("m_pre"))
              .otherwise(F.lit(0))).cast("long").alias("t_delta"),
        F.sum(F.when(F.col("grp") == 0, F.col("m_post") - F.col("m_pre"))
              .otherwise(F.lit(0))).cast("long").alias("c_delta"),
    ).select(
        F.lit(-1).cast("long").alias("grp"),
        F.lit("did").alias("period"),
        F.lit(0).cast("long").alias("n_users"),
        F.lit(0).cast("long").alias("sum_cents"),
        (F.col("t_delta") - F.col("c_delta")).cast("long")
        .alias("mean_micro"),
    )
    return long_cells.unionByName(summary).orderBy("grp", "period")


def diff_in_diff_oracle_sql(
    *,
    table: str = "events",
    user_sql: str = "user_id",
    variant_sql: str = "user_id % 2",
    post_sql: str,
    value_cents_sql: str = "CAST(floor(value * 100) AS BIGINT)",
) -> str:
    """DuckDB twin of [[diff_in_diff]] — identical floor order."""
    return f"""
WITH per_user AS (
  SELECT {user_sql} AS u, CAST(MIN({variant_sql}) AS BIGINT) AS grp,
         CAST(SUM(CASE WHEN NOT ({post_sql}) THEN {value_cents_sql}
                       ELSE 0 END) AS BIGINT) AS pre_cents,
         CAST(SUM(CASE WHEN {post_sql} THEN {value_cents_sql}
                       ELSE 0 END) AS BIGINT) AS post_cents
  FROM {table} GROUP BY 1
),
cells AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(pre_cents) AS BIGINT) AS s_pre,
         CAST(SUM(post_cents) AS BIGINT) AS s_post
  FROM per_user GROUP BY 1
),
m AS (
  SELECT grp, n_users, s_pre, s_post,
         CAST(CAST(s_pre AS HUGEINT) * 1000000 // n_users AS BIGINT)
           AS m_pre,
         CAST(CAST(s_post AS HUGEINT) * 1000000 // n_users AS BIGINT)
           AS m_post
  FROM cells
),
longc AS (
  SELECT grp, 'pre' AS period, n_users, s_pre AS sum_cents,
         m_pre AS mean_micro FROM m
  UNION ALL
  SELECT grp, 'post', n_users, s_post, m_post FROM m
),
summary AS (
  SELECT CAST(-1 AS BIGINT) AS grp, 'did' AS period,
         CAST(0 AS BIGINT) AS n_users, CAST(0 AS BIGINT) AS sum_cents,
         CAST(SUM(CASE WHEN grp = 1 THEN m_post - m_pre ELSE 0 END)
              - SUM(CASE WHEN grp = 0 THEN m_post - m_pre ELSE 0 END)
              AS BIGINT) AS mean_micro
  FROM m
)
SELECT * FROM longc UNION ALL SELECT * FROM summary
ORDER BY grp, period
"""


# --------------------------------------------------------------------------
# O'Brien-Fleming sequential monitor
# --------------------------------------------------------------------------

def obrien_fleming_monitor(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    variant_expr: Column,
    convert_expr: Column,
    alpha: float = 0.05,
) -> DataFrame:
    """Group-sequential A/B monitoring: the cumulative two-proportion
    z² after each active day, compared against an O'Brien-Fleming-shaped
    boundary — the statistically sound answer to "can I peek at the
    experiment every day", where peeking at raw alpha inflates the
    false-positive rate several-fold.

    OBF boundary shape: reject at look k of K iff
    ``z_k >= z_alpha * sqrt(K / k)``, i.e. ``z²_k * k >= chi2_alpha * K``
    — CROSS-MULTIPLIED, so the only constant either engine needs is
    ``chi2_alpha_milli`` ([[bh_thresholds_milli]] discipline: stdlib
    erfc bisection driver-side, embedded as the same literal in both
    plans).  No per-look constants, so K can come from the data.

    Cumulative exposures/conversions per look WITHOUT a per-day
    distinct: a user enters at their FIRST event day and converts at
    their FIRST converting-event day (one user-keyed aggregate), and
    the per-look cumulative counts are running sums over the day spine
    of those first-day tables.  z² per look is the exact rational
    [[ab_conversion_test]] form through DECIMAL(38,0).

    Output per active day: look number k, cumulative (na, ca, nb, cb),
    z2_milli, obf_reject (0/1).
    """
    chi2_milli = int(round(_chi2_1_inv(alpha) * 1000))
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(variant_expr).cast("long").alias("variant"),
        F.min(F.expr("datediff(ts, DATE '1970-01-01')")).alias("d_seen"),
        F.min(
            F.when(convert_expr, F.expr("datediff(ts, DATE '1970-01-01')"))
        ).alias("d_conv"),
    )
    days = (
        events.select(
            F.expr("datediff(ts, DATE '1970-01-01')").alias("d")
        ).distinct()
    )
    seen = per_user.groupBy("variant", F.col("d_seen").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    conv = per_user.filter(F.col("d_conv").isNotNull()).groupBy(
        "variant", F.col("d_conv").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c_new"))
    w = W.orderBy("d")
    spine = (
        days.join(
            seen.filter(F.col("variant") == 0)
            .select("d", F.col("n_new").alias("a_new")), "d", "left")
        .join(
            seen.filter(F.col("variant") == 1)
            .select("d", F.col("n_new").alias("b_new")), "d", "left")
        .join(
            conv.filter(F.col("variant") == 0)
            .select("d", F.col("c_new").alias("ca_new")), "d", "left")
        .join(
            conv.filter(F.col("variant") == 1)
            .select("d", F.col("c_new").alias("cb_new")), "d", "left")
        .select(
            "d",
            *[
                F.coalesce(F.col(c), F.lit(0)).alias(c)
                for c in ("a_new", "b_new", "ca_new", "cb_new")
            ],
        )
    )
    cum = spine.select(
        "d",
        F.row_number().over(w).cast("long").alias("k"),
        F.sum("a_new").over(w).cast("long").alias("na"),
        F.sum("ca_new").over(w).cast("long").alias("ca"),
        F.sum("b_new").over(w).cast("long").alias("nb"),
        F.sum("cb_new").over(w).cast("long").alias("cb"),
    )
    n_looks = F.max("k").over(W.partitionBy())
    dec = "CAST({} AS DECIMAL(38,0))"
    z2 = F.expr(
        f"CAST(({dec.format('ca')} * nb - {dec.format('cb')} * na)"
        f" * ({dec.format('ca')} * nb - {dec.format('cb')} * na)"
        f" * (na + nb) * 1000"
        f" DIV ({dec.format('na')} * nb * (ca + cb)"
        f"      * ((na + nb) - (ca + cb))) AS BIGINT)"
    )
    guard = (
        (F.col("na") > 0)
        & (F.col("nb") > 0)
        & (F.col("ca") + F.col("cb") > 0)
        & (F.col("ca") + F.col("cb") < F.col("na") + F.col("nb"))
    )
    out = cum.withColumn("n_looks", n_looks.cast("long")).select(
        "d",
        "k",
        "na",
        "ca",
        "nb",
        "cb",
        F.when(guard, z2).otherwise(F.lit(0)).cast("long").alias("z2_milli"),
        "n_looks",
    )
    return out.select(
        "d",
        "k",
        "na",
        "ca",
        "nb",
        "cb",
        "z2_milli",
        F.when(
            F.expr(
                f"CAST(z2_milli AS DECIMAL(38,0)) * k"
                f" >= CAST({chi2_milli} AS DECIMAL(38,0)) * n_looks"
            )
            & (F.col("z2_milli") > 0),
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long").alias("obf_reject"),
    ).orderBy("d")


def obrien_fleming_oracle_sql(
    *,
    table: str = "events",
    user_sql: str = "user_id",
    variant_sql: str = "user_id % 2",
    convert_sql: str = "event_type = 'purchase'",
    alpha: float = 0.05,
) -> str:
    """DuckDB twin of [[obrien_fleming_monitor]] — same embedded
    chi2_alpha_milli constant, same cross-multiplied boundary."""
    chi2_milli = int(round(_chi2_1_inv(alpha) * 1000))
    return f"""
WITH per_user AS (
  SELECT {user_sql} AS u, CAST(MIN({variant_sql}) AS BIGINT) AS variant,
         MIN(datediff('day', DATE '1970-01-01', ts)) AS d_seen,
         MIN(CASE WHEN {convert_sql}
                  THEN datediff('day', DATE '1970-01-01', ts) END) AS d_conv
  FROM {table} GROUP BY 1
),
days AS (
  SELECT DISTINCT datediff('day', DATE '1970-01-01', ts) AS d FROM {table}
),
spine AS (
  SELECT d,
    COALESCE((SELECT CAST(COUNT(*) AS BIGINT) FROM per_user p
              WHERE p.variant = 0 AND p.d_seen = days.d), 0) AS a_new,
    COALESCE((SELECT CAST(COUNT(*) AS BIGINT) FROM per_user p
              WHERE p.variant = 1 AND p.d_seen = days.d), 0) AS b_new,
    COALESCE((SELECT CAST(COUNT(*) AS BIGINT) FROM per_user p
              WHERE p.variant = 0 AND p.d_conv = days.d), 0) AS ca_new,
    COALESCE((SELECT CAST(COUNT(*) AS BIGINT) FROM per_user p
              WHERE p.variant = 1 AND p.d_conv = days.d), 0) AS cb_new
  FROM days
),
cum AS (
  SELECT d, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS k,
         CAST(SUM(a_new) OVER w AS BIGINT) AS na,
         CAST(SUM(ca_new) OVER w AS BIGINT) AS ca,
         CAST(SUM(b_new) OVER w AS BIGINT) AS nb,
         CAST(SUM(cb_new) OVER w AS BIGINT) AS cb
  FROM spine
  WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
looks AS (SELECT CAST(MAX(k) AS BIGINT) AS n_looks FROM cum),
z AS (
  SELECT d, k, na, ca, nb, cb,
         CASE WHEN na > 0 AND nb > 0 AND ca + cb > 0
                   AND ca + cb < na + nb
              THEN CAST((CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na)
                   * (CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na)
                   * (na + nb) * 1000
                   // (CAST(na AS HUGEINT) * nb * (ca + cb)
                       * ((na + nb) - (ca + cb))) AS BIGINT)
              ELSE 0 END AS z2_milli
  FROM cum
)
SELECT d, k, na, ca, nb, cb, z2_milli,
       CAST(CASE WHEN z2_milli > 0
                      AND CAST(z2_milli AS HUGEINT) * k
                          >= CAST({chi2_milli} AS HUGEINT) * n_looks
                 THEN 1 ELSE 0 END AS BIGINT) AS obf_reject
FROM z CROSS JOIN looks
ORDER BY d
"""
