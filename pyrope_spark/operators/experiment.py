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
