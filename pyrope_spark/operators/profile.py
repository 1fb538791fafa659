"""Table profiling: per-column null/distinct/min/max stats in one pass.

Beyond the reference (its only stats surface is per-index ``{Count,
Dimension, Metric}``, Q9 — ``Vector/IVectorIndex.cs:31``); a data-curation
engine needs a profiling primitive for schema drift checks, join-key sanity
(the ADVICE round-3 RBAC fan-out class of bug), and corpus intake reports.

Spark-first shape: ONE ``agg`` computes every column's stats in a single
scan; the 1-row result is unpivoted in-plan with ``stack()`` into one row
per column — the unpivot touches ncols values, never data. Exact
``count_distinct`` over k columns makes Catalyst plan an Expand (k x rows
through the distinct shuffle); at 100 TB pass ``exact_distinct=False`` to
use ``approx_count_distinct`` (HLL++, relativeSD 0.05 default) which keeps
the whole profile a map-side-partial single-shuffle job. Min/max are emitted
as strings so one schema fits every column type; numeric formatting is the
engine's string cast (the driver oracle profiles only integer/string
columns, where casts agree across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    exact_distinct: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column stats: ``(column, n_rows, n_nulls, n_distinct, min_value,
    max_value)`` — one scan, one aggregate."""
    cols = columns or df.columns
    aggs: list = [F.count(F.lit(1)).cast("long").alias("_n_rows")]
    for c in cols:
        col = F.col(c)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("long").alias(f"_nn_{c}")
        )
        if exact_distinct:
            aggs.append(F.count_distinct(col).cast("long").alias(f"_nd_{c}"))
        else:
            aggs.append(
                F.approx_count_distinct(col, rsd=rsd).cast("long").alias(f"_nd_{c}")
            )
        aggs.append(F.min(col).cast("string").alias(f"_mi_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"_ma_{c}"))
    wide = df.agg(*aggs)

    # unpivot the 1-row aggregate with stack(): ncols output rows from ONE
    # aggregate over ONE scan. (A union of per-column projections would make
    # Catalyst prune each branch into its own aggregate and re-scan the
    # source ncols times — measured, not hypothetical.)
    stack_args = ", ".join(
        f"'{c}', `_nn_{c}`, `_nd_{c}`, `_mi_{c}`, `_ma_{c}`" for c in cols
    )
    return wide.select(
        F.col("_n_rows").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "as (column, n_nulls, n_distinct, min_value, max_value)"
        ),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def profile_oracle_sql(table: str, columns: list[str]) -> str:
    """DuckDB rendering: one UNION ALL branch per column over the same
    aggregate shape. min/max string casts agree for integer and varchar
    columns (the gate profiles only those)."""
    parts = []
    for c in columns:
        parts.append(
            f"""
SELECT '{c}' AS "column",
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_value,
       CAST(max({c}) AS VARCHAR) AS max_value
FROM {table}"""
        )
    return "\nUNION ALL\n".join(parts)


# ------------------------------------------------------ snapshot drift

def cluster_drift(
    assign_a: DataFrame,
    assign_b: DataFrame,
    *,
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Distribution drift between two corpus snapshots, measured on their
    cluster-assignment histograms (the embedding-space analog of a
    chi-square drift monitor): per cluster, observed count in snapshot B vs
    the count expected if B followed A's distribution, and the cluster's
    chi-square contribution ``(obs - exp)^2 / exp``.

    The training-pipeline use: assign BOTH snapshots to the SAME fixed
    centroids (a k-means model trained once on the reference snapshot —
    ``ivf.assign_by_centroids``), then alarm when the statistic jumps: a
    new crawl whose topic/language mix shifted shows up as mass moving
    between cells before any model metric degrades.

    Scale shape: each input collapses to its <= nlist-row histogram with
    one map-side-partial hash aggregate (the corpus is scanned once, no
    row-level join); the full-outer join + total-sum window run on
    histogram-sized data. Clusters absent from A (``new_cluster``) have no
    expected mass — their contribution is NULL and the flag is the signal;
    ``vanished_cluster`` marks A-only cells (contribution = expected_b).

    All float ops (one multiply, one divide, the squared residual) are
    written in a fixed order on integer inputs, so the output replicates
    bit-for-bit in the DuckDB oracle.
    """
    from pyspark.sql.window import Window

    ha = assign_a.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("count_a"))
    hb = assign_b.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("count_b"))
    j = ha.join(hb, cluster_col, "full_outer").fillna(0, ["count_a", "count_b"])
    w = Window.partitionBy()  # histogram-sized input (<= nlist rows)
    ta = F.sum("count_a").over(w)
    tb = F.sum("count_b").over(w)
    e = tb.cast("double") * F.col("count_a") / ta
    resid = F.col("count_b") - e
    contrib = F.when(F.col("count_a") > 0, (resid * resid) / e)
    return j.select(
        F.col(cluster_col),
        F.col("count_a").cast("long").alias("count_a"),
        F.col("count_b").cast("long").alias("count_b"),
        F.round(e, 6).alias("expected_b"),
        F.round(contrib, 6).alias("chi2_contribution"),
        (F.col("count_a") == 0).alias("new_cluster"),
        (F.col("count_b") == 0).alias("vanished_cluster"),
    )


# ------------------------------------------------------ key skew report

def key_skew_report(
    df: DataFrame,
    key_col: str,
    *,
    top_n: int = 10,
) -> DataFrame:
    """The pre-join skew diagnostic: the ``top_n`` heaviest keys with
    count, share of all rows, and skew ratio (count / mean-count-per-key).
    A ratio far above 1 on a join/aggregation key predicts a straggler
    reducer — the operator to run BEFORE deciding on `joins.salted_join`
    or AQE skew hints, and the one a 100 TB pipeline schedules nightly
    over its fact-table keys.

    One hash aggregate (map-side partials) collapses the table to its key
    histogram; totals ride a single-partition window over top_n + 1
    summary values, never the histogram itself. Float ops are two
    divisions on integers — deterministic, SQL-replicable.
    """
    from pyspark.sql.window import Window

    hist = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = hist.agg(
        F.sum("cnt").alias("_rows"), F.count(F.lit(1)).alias("_keys")
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    top = (
        hist.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .crossJoin(F.broadcast(tot))
    )
    return top.select(
        "key",
        F.col("rank").cast("long").alias("rank"),
        F.col("cnt").cast("long").alias("cnt"),
        F.round(F.col("cnt") / F.col("_rows"), 6).alias("share"),
        F.round(F.col("cnt") * F.col("_keys") / F.col("_rows"), 6).alias(
            "skew_ratio"
        ),
        F.col("_keys").cast("long").alias("n_keys"),
    )


# ------------------------------------------------------ value histogram

def value_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Generic equi-width histogram: (bin_no, bin_lo, bin_hi, cnt) over the
    observed [min, max] — the distribution-profiling companion to
    `profile_table` (which does min/max/nulls) and the fixed-bound
    `analytics.latency_histogram`. Two linear passes (bounds, then one
    map-side-partial bucket count); the top value clamps into the last bin.
    Bin edges are min + i*width — one multiply+add per edge, deterministic
    cross-engine."""
    stats = df.agg(
        F.min(value_col).alias("lo"), F.max(value_col).alias("hi"),
        F.count(value_col).alias("n"),
    ).collect()[0]
    if int(stats["n"]) == 0:
        raise ValueError("cannot histogram an empty column")
    lo, hi = float(stats["lo"]), float(stats["hi"])
    spark = df.sparkSession
    if hi == lo:
        return spark.createDataFrame(
            [(0, lo, lo, int(stats["n"]))],
            "bin_no int, bin_lo double, bin_hi double, cnt long",
        )
    width = (hi - lo) / n_bins
    b = F.least(
        F.lit(n_bins - 1),
        F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int"),
    )
    counts = df.select(b.alias("bin_no")).groupBy("bin_no").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin_no"))
    return (
        bins.join(counts, "bin_no", "left")
        .fillna(0, ["cnt"])
        .select(
            "bin_no",
            F.round(F.lit(lo) + F.col("bin_no") * F.lit(width), 6).alias("bin_lo"),
            F.round(F.lit(lo) + (F.col("bin_no") + 1) * F.lit(width), 6).alias(
                "bin_hi"
            ),
            "cnt",
        )
    )


# ------------------------------------------------------ data-quality rules

def check_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Data-quality gate: evaluate declarative expectations and report
    (rule, violations, total, passed) — the contract check a pipeline runs
    before promoting a corpus version (pair with ``storage.write_versioned``:
    only a fully-passed snapshot gets a manifest note).

    Rule kinds:
      {"name", "kind": "not_null",  "col"}
      {"name", "kind": "min",      "col", "value"}   # violations: col < value
      {"name", "kind": "max",      "col", "value"}   # violations: col > value
      {"name", "kind": "regex",    "col", "pattern"} # non-matching, nulls count
      {"name", "kind": "unique",   "col"}            # rows beyond first per value

    All non-unique rules fold into ONE aggregate over ONE scan (conditional
    counts); each ``unique`` rule adds one count-distinct on the same scan.
    Violations are exact row counts — integer, SQL-replicable.
    """
    aggs = []
    uniques = []
    for r in rules:
        kind = r["kind"]
        c = F.col(r["col"])
        if kind == "not_null":
            cond = c.isNull()
        elif kind == "min":
            cond = c < F.lit(r["value"])
        elif kind == "max":
            cond = c > F.lit(r["value"])
        elif kind == "regex":
            cond = ~c.rlike(r["pattern"]) | c.isNull()
        elif kind == "unique":
            uniques.append(r)
            continue
        else:
            raise ValueError(f"unknown rule kind {kind!r}")
        aggs.append(
            F.sum(cond.cast("long")).alias(f"_v_{r['name']}")
        )
    aggs.append(F.count(F.lit(1)).alias("_total"))
    for r in uniques:
        aggs.append(F.countDistinct(F.col(r["col"])).alias(f"_d_{r['name']}"))
        aggs.append(
            F.count(F.col(r["col"])).alias(f"_n_{r['name']}")
        )
    row = df.agg(*aggs).collect()[0]
    total = int(row["_total"])
    out = []
    for r in rules:
        if r["kind"] == "unique":
            v = int(row[f"_n_{r['name']}"]) - int(row[f"_d_{r['name']}"])
        else:
            v = int(row[f"_v_{r['name']}"] or 0)
        out.append((r["name"], v, total, v == 0))
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "rule string, violations long, total long, passed boolean"
    )


def histogram_drift(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    n_bins: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Distribution drift between the first and second half of a stream.

    The PSI/KL-style drift monitor a training-data pipeline runs before
    trusting a new data window — recast exactly: split rows at the
    midpoint of the observed time range, histogram the value column into
    ``n_bins`` equal-width bins over the GLOBAL min/max, and report the
    per-key L1 distance between the two halves' bin-share vectors in ppm
    (total-variation distance x 2e6).  PSI proper multiplies by
    ``ln(p_cur/p_base)`` — a libm call whose ulps differ across engines
    and can flip a hash; L1-in-ppm ranks drifting keys identically for
    monitoring purposes and is exact integer arithmetic end-to-end
    (shares are ``count*1e6 // total`` floor divisions).

    Scale shape (100 TB): one scalar min/max aggregate (broadcast back as
    a 1-row frame), ONE hash aggregate over the fact table on
    (key, half, bin), then arithmetic on the tiny aggregated table.  A
    full-outer join of the two halves' bin vectors covers bins empty on
    one side (share 0); bins empty on BOTH sides contribute 0 to the L1
    and need no densified spine.  All shares are integer floor divisions
    (``div``), never float — floor(a/b) on doubles can land one ulp below
    an exact boundary and flip an engine-comparison hash.
    """
    mv = df.select(
        F.col(key_col).alias("k"),
        F.round(F.col(value_col) * scale).cast("long").alias("v"),
        F.col(ts_col).cast("long").alias("ts"),
    )
    bounds = mv.agg(
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.min("ts").alias("tmin"),
        F.max("ts").alias("tmax"),
    )
    binned = (
        mv.join(F.broadcast(bounds))
        .withColumn(
            "half",
            F.when(
                F.col("ts") * 2 < F.col("tmin") + F.col("tmax"), F.lit(0)
            ).otherwise(F.lit(1)),
        )
        .withColumn(
            "bin",
            F.expr(
                f"(v - vmin) * {n_bins} div (vmax - vmin + 1)"
            ).cast("long"),
        )
    )
    # halves PIVOT into columns of the SAME aggregate — filtering the
    # share table per half and full-outer-joining it back makes Catalyst
    # recompute the whole fact aggregate per branch (two fact scans,
    # observed in the executed plan), where one (key, bin) aggregate with
    # conditional counts needs exactly one
    counts = binned.groupBy("k", "bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    totals = counts.groupBy(F.col("k").alias("tk")).agg(
        F.sum("n0").alias("t0"), F.sum("n1").alias("t1")
    )
    joined = counts.join(totals, F.col("k") == F.col("tk")).select(
        "k",
        F.when(F.col("t0") > 0, F.expr(f"n0 * {scale} div t0"))
        .otherwise(F.lit(0))
        .alias("base_ppm"),
        F.when(F.col("t1") > 0, F.expr(f"n1 * {scale} div t1"))
        .otherwise(F.lit(0))
        .alias("cur_ppm"),
    )
    return (
        joined.groupBy(F.col("k").alias(key_col))
        .agg(
            F.sum(F.abs(F.col("cur_ppm") - F.col("base_ppm")))
            .cast("long")
            .alias("l1_drift_ppm"),
            F.count("*").cast("long").alias("n_bins_observed"),
        )
    )


def referential_audit(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key integrity audit: orphan facts per declared relation.

    ``relations`` is a list of ``(name, fact, fk_col, dim, pk_col)``.  For
    each, ONE left join of the fact table against the dimension's DISTINCT
    key column classifies every fact row as matched / orphan (fk present
    but no dim row) / null-fk, aggregated to a single summary row:
    counts, distinct orphan keys, and the min/max orphan key for triage.

    The pipeline case: after dedup / filtering / right-to-be-forgotten
    rewrites shrink a dimension, downstream fact tables silently dangle —
    this is the gate that catches it before a training join drops rows.

    Scale shape (100 TB): the dimension side is reduced to its distinct
    key column BEFORE the join (column-pruned scan), which Spark
    broadcasts when small; per-relation output is exactly one row, and
    relations union into one tiny frame.  No driver data movement.
    """
    outs = []
    for name, fact, fk_col, dim, pk_col in relations:
        keys = dim.select(F.col(pk_col).alias("_pk")).distinct()
        joined = fact.select(F.col(fk_col).alias("_fk")).join(
            keys, F.col("_fk") == F.col("_pk"), "left"
        )
        outs.append(
            joined.agg(
                F.lit(name).alias("relation"),
                F.count("*").cast("long").alias("n_fact"),
                F.sum(
                    F.when(
                        F.col("_fk").isNotNull() & F.col("_pk").isNull(), 1
                    ).otherwise(0)
                ).cast("long").alias("n_orphans"),
                F.sum(
                    F.when(F.col("_fk").isNull(), 1).otherwise(0)
                ).cast("long").alias("n_null_fk"),
                F.count_distinct(
                    F.when(F.col("_pk").isNull(), F.col("_fk"))
                ).cast("long").alias("n_distinct_orphan_keys"),
                F.min(
                    F.when(F.col("_pk").isNull(), F.col("_fk"))
                ).cast("long").alias("min_orphan_key"),
                F.max(
                    F.when(F.col("_pk").isNull(), F.col("_fk"))
                ).cast("long").alias("max_orphan_key"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res


def cluster_quality_report(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
    offset: int = 1_000_000,
) -> DataFrame:
    """Per-cluster quality: size, inertia, and max radius — all exact.

    The k-means diagnostics loop (is cluster 7 twice as loose as the
    rest? did the new crawl inflate one cell?) in integer micro-units:
    coordinates round to ``v*scale`` BIGINTs, the per-cluster centroid is
    the per-dimension FLOOR mean, inertia is the exact sum of squared
    integer differences, radius the max per-vector squared distance.

    Floor-division portability trap (the cross-engine-determinism rule):
    Spark's ``div`` truncates toward zero, DuckDB's ``//`` floors toward
    -inf — they disagree on negative numerators.  Coordinates here are
    negative, so the centroid mean is computed as
    ``(sum + offset*n) div n - offset`` with ``offset`` >= the magnitude
    bound, making the numerator non-negative where truncation == floor in
    both engines.

    Scale shape (100 TB): ONE posexplode pass aggregates (label, dim)
    sums — the only fact-table shuffle; centroids re-assemble to arrays
    (n_labels x dim rows, tiny) and broadcast-join back; per-vector
    distances are a zip_with/aggregate fold, no second explode.  Inertia
    fits int64 up to ~1e18 / (scale^2 * dim) vectors per cluster — switch
    scale to 1e3 (or sums to DECIMAL) beyond.
    """
    base = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("lbl"),
        F.transform(
            F.col(vec_col),
            # widen float32 -> double BEFORE the multiply on BOTH engines:
            # DuckDB's FLOAT * INT stays float32 (458373.5 vs the double
            # 458373.487) and would round to a different micro-unit
            lambda x: F.round(x.cast("double") * scale).cast("long"),
        ).alias("vm"),
    )
    dims = base.select(
        "lbl", F.posexplode(F.col("vm")).alias("d", "x")
    )
    cent = (
        dims.groupBy("lbl", "d")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .withColumn(
            "c",
            F.expr(f"(s + CAST({offset} AS BIGINT) * n) DIV n")
            - F.lit(offset),
        )
    )
    cent_arr = (
        cent.groupBy("lbl")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("d"), F.col("c")))
            ).alias("dc")
        )
        .select(
            F.col("lbl").alias("clbl"),
            F.transform(F.col("dc"), lambda s: s["c"]).alias("cm"),
        )
    )
    dist = base.join(
        F.broadcast(cent_arr), F.col("lbl") == F.col("clbl")
    ).withColumn(
        "d2",
        F.aggregate(
            F.zip_with(
                F.col("vm"), F.col("cm"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    return dist.groupBy(F.col("lbl").alias(label_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum("d2").cast("long").alias("inertia"),
        F.max("d2").cast("long").alias("max_radius_sq"),
    )


def categorical_association(
    df: DataFrame,
    col_a: str,
    col_b: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Chi-square contingency audit between two categorical columns.

    Per (a, b) cell: observed count, expected-under-independence count
    scaled to micro (row_total·col_total·1e6 div N — exact integer), and
    the chi-square contribution ((N·obs − ra·cb)² ·1e6 div (N·ra·cb) —
    the textbook (o−e)²/e multiplied through by N so EVERYTHING stays
    integer until one final div).  Summing chi2_contrib_micro over cells
    and comparing to the chi-square critical value is the independence
    test; per-cell contributions localize WHICH combination drives the
    association (the drift/monitoring use).

    Scale shape (100 TB): one (a,b) hash aggregate over the fact table;
    marginals re-aggregate the cell table; all joins broadcast.  The
    N·ra·cb product needs headroom: with counts ≤ ~2e4 per margin and
    N ≤ ~1e5 it is ~1e14·1e6 — cast through DECIMAL(38,0) for the
    multiply, back to BIGINT after the div (documented; DuckDB's hugeint
    does the same implicitly).
    """
    cells = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("obs"))
    ra = cells.groupBy("a").agg(F.sum("obs").alias("ra"))
    cb = cells.groupBy("b").agg(F.sum("obs").alias("cb"))
    tot = cells.agg(F.sum("obs").alias("n"))
    j = (
        cells.join(F.broadcast(ra), "a")
        .join(F.broadcast(cb), "b")
        .join(F.broadcast(tot))
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    expected = F.expr(
        f"CAST({dec.format('ra')} * cb * {scale} DIV (n) AS BIGINT)"
    )
    chi2 = F.expr(
        f"CAST((({dec.format('n')} * obs - {dec.format('ra')} * cb)"
        f" * (CAST(n AS DECIMAL(38,0)) * obs - CAST(ra AS DECIMAL(38,0)) * cb))"
        f" * {scale} DIV (CAST(n AS DECIMAL(38,0)) * ra * cb) AS BIGINT)"
    )
    return j.select(
        F.col("a").alias(col_a),
        F.col("b").alias(col_b),
        "obs",
        F.col("ra").cast("long").alias("row_total"),
        F.col("cb").cast("long").alias("col_total"),
        expected.alias("expected_micro"),
        chi2.alias("chi2_contrib_micro"),
    )


def emd_value_drift(
    df: DataFrame,
    *,
    key_col: str,
    value_col: str,
    split_col: str,
    bucket_width: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Earth-mover's (Wasserstein-1) drift between the two halves of a
    split, per key — the distribution-shift measure that, unlike the
    chi-square of [[histogram_drift]], weights HOW FAR mass moved, not
    just that cell counts changed (a +1-bucket shift and a +20-bucket
    shift chi-square the same; they EMD very differently).

    On an equi-width histogram, W1 = Σ_buckets |CDF_a − CDF_b| · width.
    Everything stays integer by cross-multiplying the two sample sizes:
    ``emd_cross = Σ |cum_a·n_b − cum_b·n_a|`` over the DENSE bucket spine
    (gaps matter: a constant CDF difference keeps paying per empty
    bucket).  The normalized value is one float division away
    (emd_cross · width / (n_a · n_b)), kept OUT of the hashed output;
    ``emd_ppm = emd_cross·1e6 div (n_a·n_b·n_buckets)`` ships alongside
    as the exact bounded-[0,1e6] integer summary.

    Scale shape (100 TB): one (key, half, bucket) aggregate over the
    fact table; the spine explode and the cumulative windows run on the
    HISTOGRAM (|keys|·|buckets| rows), never fact volume.
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(key_col).alias("k"),
        F.col(split_col).cast("int").alias("h"),
        F.floor(F.col(value_col).cast("double") / bucket_width)
        .cast("long")
        .alias("b"),
    )
    hist = base.groupBy("k", "b").agg(
        F.sum(F.when(F.col("h") == 0, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("h") == 1, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    bounds = hist.groupBy("k").agg(
        F.min("b").alias("_lo"),
        F.max("b").alias("_hi"),
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
    )
    spine = bounds.select(
        "k",
        "na",
        "nb",
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("b"),
    )
    dense = spine.join(hist, ["k", "b"], "left").select(
        "k",
        "b",
        "na",
        "nb",
        F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
        F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
    )
    w = Window.partitionBy("k").orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = dense.select(
        "k",
        "na",
        "nb",
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
    )
    return (
        cum.groupBy("k", "na", "nb")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum(F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")))
            .cast("long")
            .alias("emd_cross"),
        )
        .select(
            F.col("k").alias(key_col),
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            "n_buckets",
            "emd_cross",
            F.when(
                (F.col("na") > 0) & (F.col("nb") > 0),
                F.expr(f"emd_cross * {scale} div (na * nb * n_buckets)"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("emd_ppm"),
        )
    )


def emd_value_drift_oracle_sql(
    *,
    key_col: str,
    value_col: str,
    split_sql: str,
    table: str,
    bucket_width: int = 10,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of [[emd_value_drift]] (``split_sql`` is a 0/1 integer
    expression over the row)."""
    return f"""
WITH base AS (
  SELECT {key_col} AS k, CAST({split_sql} AS INT) AS h,
         CAST(floor(CAST({value_col} AS DOUBLE) / {bucket_width}) AS BIGINT)
           AS b
  FROM {table}
),
hist AS (
  SELECT k, b,
         CAST(SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM base GROUP BY 1, 2
),
bounds AS (
  SELECT k, MIN(b) AS lo, MAX(b) AS hi, SUM(ca) AS na, SUM(cb) AS nb
  FROM hist GROUP BY 1
),
spine AS (
  SELECT k, na, nb, CAST(gs AS BIGINT) AS b
  FROM bounds, unnest(generate_series(lo, hi)) AS g(gs)
),
dense AS (
  SELECT s.k, s.b, s.na, s.nb,
         COALESCE(h.ca, 0) AS ca, COALESCE(h.cb, 0) AS cb
  FROM spine s LEFT JOIN hist h ON s.k = h.k AND s.b = h.b
),
cum AS (
  SELECT k, na, nb,
         SUM(ca) OVER (PARTITION BY k ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
         SUM(cb) OVER (PARTITION BY k ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
  FROM dense
)
SELECT k AS {key_col},
       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(ABS(cuma * nb - cumb * na)) AS BIGINT) AS emd_cross,
       CAST(CASE WHEN na > 0 AND nb > 0
                 THEN SUM(ABS(cuma * nb - cumb * na)) * {scale}
                      // (na * nb * COUNT(*))
                 ELSE 0 END AS BIGINT) AS emd_ppm
FROM cum GROUP BY k, na, nb
"""


def market_concentration_hhi(
    df: DataFrame,
    *,
    group_col: str,
    member_col: str,
    value_col: str | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Herfindahl–Hirschman concentration per group: ``Σ share²`` over
    members, the antitrust-grade concentration index (1e6 = monopoly,
    →1e6/n = perfectly even across n members) — "is this nation's
    revenue concentrated in one supplier", "is this event type dominated
    by one item".

    Exact integer: with member totals ``v_i`` and group total ``T``,
    ``hhi_ppm = Σ v_i² · 1e6 div T²`` — ONE division after
    cross-multiplying, DECIMAL(38,0) for the squared sums (int64
    overflows past ~3e9 in micro units; DuckDB hugeint-promotes).
    ``value_col=None`` counts rows; otherwise values enter as
    floor-micro units.

    Scale shape: one (group, member) aggregate, one (group) aggregate.
    """
    if value_col is None:
        vm = F.lit(1).cast("long")
    else:
        vm = F.floor(F.col(value_col).cast("double") * 1_000_000).cast("long")
    members = df.groupBy(
        F.col(group_col).alias("grp"), F.col(member_col).alias("member")
    ).agg(F.sum(vm).alias("v"))
    dec = "CAST({} AS DECIMAL(38,0))"
    return (
        members.groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.sum("v").cast("long").alias("total"),
            F.sum(F.expr(f"{dec.format('v')} * v")).alias("_sum_sq"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_members",
            "total",
            F.expr(
                f"CAST(_sum_sq * {scale} DIV ({dec.format('total')} * total)"
                " AS BIGINT)"
            ).alias("hhi_ppm"),
        )
    )


def market_concentration_oracle_sql(
    *,
    group_col: str,
    member_col: str,
    value_sql: str | None = None,
    table: str,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of [[market_concentration_hhi]]."""
    vm = (
        "CAST(1 AS BIGINT)"
        if value_sql is None
        else f"CAST(floor(CAST({value_sql} AS DOUBLE) * 1000000) AS BIGINT)"
    )
    return f"""
WITH members AS (
  SELECT {group_col} AS grp, {member_col} AS member, SUM({vm}) AS v
  FROM {table} GROUP BY 1, 2
)
SELECT grp AS {group_col},
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(SUM(v) AS BIGINT) AS total,
       CAST(SUM(v * v) * {scale} // (SUM(v) * SUM(v)) AS BIGINT) AS hhi_ppm
FROM members GROUP BY 1
"""


def fd_violation_audit(
    df: DataFrame,
    *,
    det_col: str,
    dep_col: str,
) -> DataFrame:
    """Functional-dependency audit: does ``det_col`` determine
    ``dep_col``?  Output one row — determinant count, how many
    determinants map to MORE than one dependent value (the FD
    violations), the worst determinant's distinct-dependent count, and
    the violating ROW volume — the data-contract check run before
    assuming "order_id → customer" style invariants in a pipeline
    (a violated FD silently fans out every downstream join).

    NULL dependents count as a value (a det mapping to {x, NULL} IS
    ambiguous).  Scale shape: one (det, dep) aggregate, one (det)
    aggregate, one 1-row rollup.
    """
    pairs = df.groupBy(
        F.col(det_col).alias("det"), F.col(dep_col).alias("dep")
    ).agg(F.count("*").cast("long").alias("n"))
    per_det = pairs.groupBy("det").agg(
        F.count("*").cast("long").alias("n_dep_values"),
        F.sum("n").cast("long").alias("n_rows"),
    )
    return per_det.agg(
        F.count("*").cast("long").alias("n_determinants"),
        F.sum((F.col("n_dep_values") > 1).cast("long"))
        .cast("long")
        .alias("n_violating_determinants"),
        F.max("n_dep_values").cast("long").alias("max_dep_values"),
        F.sum(F.when(F.col("n_dep_values") > 1, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("violating_rows"),
        F.sum("n_rows").cast("long").alias("total_rows"),
    )


def fd_violation_oracle_sql(
    *,
    det_sql: str,
    dep_sql: str,
    table: str,
) -> str:
    """DuckDB twin of [[fd_violation_audit]]."""
    return f"""
WITH pairs AS (
  SELECT {det_sql} AS det, {dep_sql} AS dep, CAST(count(*) AS BIGINT) AS n
  FROM {table} GROUP BY 1, 2
),
per_det AS (
  SELECT det, CAST(count(*) AS BIGINT) AS n_dep_values,
         CAST(SUM(n) AS BIGINT) AS n_rows
  FROM pairs GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_determinants,
       CAST(SUM(CASE WHEN n_dep_values > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_determinants,
       CAST(MAX(n_dep_values) AS BIGINT) AS max_dep_values,
       CAST(SUM(CASE WHEN n_dep_values > 1 THEN n_rows ELSE 0 END) AS BIGINT)
         AS violating_rows,
       CAST(SUM(n_rows) AS BIGINT) AS total_rows
FROM per_det
"""


def fd_discovery_matrix(
    df: DataFrame,
    columns: list[str],
) -> DataFrame:
    """Functional-dependency DISCOVERY over a candidate column set: for
    every ordered pair (det, dep), does det → dep hold, and how badly is
    it violated — the profiling sweep that finds the join invariants
    [[fd_violation_audit]] then audits one-by-one (that operator checks a
    GIVEN pair; this ranks all k·(k−1) of them).

    One pass, not k² scans: each row melts into k² (det_col, dep_col,
    det_val, dep_val) tuples (values type-erased to strings; NULL is a
    countable value via a sentinel), then ONE (det_col, dep_col,
    det_val) aggregate and ONE (det_col, dep_col) rollup. Map-side
    partials collapse the melt before the shuffle, so wire volume is
    bounded by distinct (pair, det_val) combinations.

    Output per ordered pair: (det_col, dep_col, n_determinants,
    n_violating_dets, violating_rows, max_fanout, holds).
    """
    from pyspark.sql import functions as F

    # cast every candidate column to its string form ONCE per row (the
    # melt below references each column k-1 times; casting inside the
    # struct array re-evaluated the cast per reference)
    casted = df.select(
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("<NULL>")).alias(c)
            for c in columns
        ]
    )
    # the melt multiplies rows k·(k−1)-fold, and the explode + partial
    # aggregate run in the SCAN's stage — a compact parquet input (3
    # tasks at sf0.1) serializes the whole sweep; one narrow-row
    # round-robin shuffle before the multiply spreads it across the
    # cluster (measured 9 s -> 3 s at 600k×12)
    try:
        sp = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        # AQE-managed platforms set the conf to "auto" (r7 ADVICE);
        # without a concrete target, skip the pre-spread and let AQE
        # size the downstream exchange itself
        sp = 0
    if 0 < sp and casted.rdd.getNumPartitions() < sp:
        casted = casted.repartition(sp)
    # r11 opt (guide §2.3): melt UNORDERED pairs only — the finest-level
    # (pair, val_a, val_b) counts for (a, b) are the exact transpose of
    # (b, a)'s, so k·(k−1)/2 structs per row carry the same information
    # the old k·(k−1) melt did. Halves the explode CPU and the bytes
    # through the corpus-scale finest exchange; both directions are
    # re-derived AFTER that aggregate, on combo-sized data.
    pairs = []
    for ai, a in enumerate(columns):
        for b in columns[ai + 1:]:
            pairs.append(
                F.struct(
                    F.lit(a).alias("ca"),
                    F.lit(b).alias("cb"),
                    F.col(a).alias("va"),
                    F.col(b).alias("vb"),
                )
            )
    melted = casted.select(
        F.explode(F.array(*pairs)).alias("p")
    ).select("p.ca", "p.cb", "p.va", "p.vb")
    # two explicit aggregate levels instead of countDistinct: the finest
    # (pair, val_a, val_b) level gets FULL map-side partials (the melt
    # collapses to distinct combos before the shuffle), and the
    # distinct-dep fanout is then a plain count at the next level —
    # no Expand plan, no distinct machinery
    pair_val = melted.groupBy("ca", "cb", "va", "vb").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    # unfold each unordered combo into its two directed readings; the
    # per-determinant level only needs (det_col, dep_col, det_val): the
    # fanout is the number of finest rows per group, dep_val itself is
    # no longer needed
    dirs = pair_val.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("ca").alias("det_col"),
                    F.col("cb").alias("dep_col"),
                    F.col("va").alias("det_val"),
                    F.col("_n").alias("_n"),
                ),
                F.struct(
                    F.col("cb").alias("det_col"),
                    F.col("ca").alias("dep_col"),
                    F.col("vb").alias("det_val"),
                    F.col("_n").alias("_n"),
                ),
            )
        ).alias("d")
    ).select("d.det_col", "d.dep_col", "d.det_val", "d._n")
    per_det = dirs.groupBy("det_col", "dep_col", "det_val").agg(
        F.sum("_n").cast("long").alias("_rows"),
        F.count(F.lit(1)).cast("long").alias("_fan"),
    )
    return (
        per_det.groupBy("det_col", "dep_col")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_determinants"),
            F.sum((F.col("_fan") > 1).cast("long"))
            .cast("long")
            .alias("n_violating_dets"),
            F.sum(F.when(F.col("_fan") > 1, F.col("_rows")).otherwise(0))
            .cast("long")
            .alias("violating_rows"),
            F.max("_fan").cast("long").alias("max_fanout"),
        )
        .withColumn("holds", F.col("n_violating_dets") == 0)
    )


def fd_discovery_oracle_sql(
    *,
    table: str,
    columns: list[str],
) -> str:
    """DuckDB twin of [[fd_discovery_matrix]]."""
    selects = []
    for a in columns:
        for b in columns:
            if a == b:
                continue
            selects.append(
                f"SELECT '{a}' AS det_col, '{b}' AS dep_col, "
                f"COALESCE(CAST({a} AS VARCHAR), '<NULL>') AS det_val, "
                f"COALESCE(CAST({b} AS VARCHAR), '<NULL>') AS dep_val "
                f"FROM {table}"
            )
    melted = " UNION ALL ".join(selects)
    return f"""
WITH melted AS ({melted}),
per_det AS (
  SELECT det_col, dep_col, det_val,
         CAST(count(*) AS BIGINT) AS rows_,
         CAST(count(DISTINCT dep_val) AS BIGINT) AS fan
  FROM melted GROUP BY 1, 2, 3
)
SELECT det_col, dep_col,
       CAST(count(*) AS BIGINT) AS n_determinants,
       CAST(SUM(CASE WHEN fan > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_dets,
       CAST(SUM(CASE WHEN fan > 1 THEN rows_ ELSE 0 END) AS BIGINT)
         AS violating_rows,
       CAST(MAX(fan) AS BIGINT) AS max_fanout,
       SUM(CASE WHEN fan > 1 THEN 1 ELSE 0 END) = 0 AS holds
FROM per_det GROUP BY 1, 2
"""
