"""Sidecar/governance analytics as DataFrame jobs.

Reference components re-expressed as batch analytics over an events table:

- Markov prefetch rule training: first-order transition counts per
  (tenant:index), rule = most-common next cluster with count >= 3
  (``src/Pyrope.AISidecar/prediction_engine.py:16-79``). The reference's
  in-memory last-cluster tracking becomes ``lag() OVER (PARTITION BY session
  ORDER BY time)`` — pure window algebra.
- Latency quantiles: nearest-rank p50/p95/p99
  (``src/Pyrope.Benchmarks/Stats/LatencySummary.cs:8-50``).
- Billing/usage metering: per-tenant request/hit/miss counts and compute
  seconds = cost_units * CostUnitSeconds (``Services/BillingMeter.cs:31-117``).
- Write-heat detection: a cluster is write-hot when it takes > threshold
  writes inside a 60 s window (``Services/SemanticClusterRegistry.cs:84-121``)
  — tumbling event-time window, streaming-ready.
- Latency histogram buckets (``Services/MetricsCollector.cs:7-100``).

All of these are shuffle-light at scale: they aggregate by low-cardinality
keys (tenant, cluster, window), and partial aggregation happens map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MIN_RULE_COUNT = 3  # reference: prediction_engine.py:62-66
DEFAULT_COST_UNIT_SECONDS = 1.0
WRITE_HOT_THRESHOLD = 10  # reference: SemanticClusterRegistry.cs write-heat
LATENCY_BUCKETS_MS = [1.0, 5.0, 10.0, 50.0, 100.0, 500.0]  # MetricsCollector 6-bucket


def markov_rules(
    events: DataFrame,
    *,
    session_cols: list[str],
    cluster_col: str,
    order_cols: list[str],
    min_count: int = MIN_RULE_COUNT,
) -> DataFrame:
    """Train prefetch rules: for each session stream, count transitions
    between *different* consecutive clusters (self-transitions are ignored,
    prediction_engine.py:22-31), keep the most frequent next per current with
    count >= min_count. Ties break on smallest next cluster (deterministic —
    the reference inherits dict insertion order, a documented deviation).

    Returns (session_cols..., current, next, cnt).
    """
    w = Window.partitionBy(*session_cols).orderBy(*[F.col(c) for c in order_cols])
    trans = (
        events.withColumn("_prev", F.lag(F.col(cluster_col)).over(w))
        .filter(F.col("_prev").isNotNull() & (F.col("_prev") != F.col(cluster_col)))
        .groupBy(*session_cols, F.col("_prev").alias("current"), F.col(cluster_col).alias("next"))
        .agg(F.count("*").alias("cnt"))
    )
    rank_w = Window.partitionBy(*session_cols, "current").orderBy(
        F.desc("cnt"), F.asc("next")
    )
    return (
        trans.withColumn("_rn", F.row_number().over(rank_w))
        .filter((F.col("_rn") == 1) & (F.col("cnt") >= min_count))
        .drop("_rn")
    )


def prefetch_predicted(
    vectors: DataFrame,
    rules: DataFrame,
    centroids,
    cache,
    *,
    k: int = 10,
    metric: str = "l2",
    epoch: int = 0,
    tenant: str = "t",
    index: str = "i",
    ttl_s: float | None = None,
    next_col: str = "next",
    now=None,
) -> DataFrame:
    """C7 prefetch MATERIALIZATION (reference ``PredictivePrefetcher.cs:60-91``,
    ``VectorCommandSet.cs:318-379``): for every distinct predicted next
    cluster in the trained rules, run the predicted cluster's representative
    search (its centroid as the query vector) and write the results back
    under the predicted keys. A follow-up query whose nearest cluster is a
    predicted one is then served from the L2 tier with zero compute.

    One batch job: rules -> distinct next -> broadcast-join centroids ->
    GEMM search -> pack -> ``cache.write_back``. Returns the materialized
    hits (query_id = 'prefetch:<cluster>')."""
    from pyrope_spark.operators.cache import DEFAULT_TTL_S, with_query_keys
    from pyrope_spark.operators.knn import knn_bruteforce

    import numpy as np

    spark = vectors.sparkSession
    C = np.asarray(centroids, dtype=np.float64)
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(C)],
        "cluster_id int, vector array<float>",
    )
    preds = rules.select(F.col(next_col).cast("int").alias("cluster_id")).distinct()
    q = (
        preds.join(F.broadcast(cent_df), "cluster_id")
        .withColumn(
            "query_id", F.concat(F.lit("prefetch:"), F.col("cluster_id").cast("string"))
        )
        .withColumn("top_k", F.lit(k))
        .select("query_id", "vector", "top_k")
    )
    hits = knn_bruteforce(vectors, q, k=k, metric=metric, impl="gemm")
    # r10 opt (guide §1.2): hits feeds both the write_back action and the
    # caller — without materialization the full brute-force scan ran
    # twice (once inside write_back's parquet append, once on the
    # returned DataFrame's first action).  The hit set is
    # (#predicted clusters x k) rows — checkpoint it.
    hits = hits.localCheckpoint(eager=True)
    packed = hits.groupBy("query_id").agg(
        F.concat_ws(
            ",",
            F.sort_array(
                F.collect_list(
                    F.concat_ws(":", F.col("rank").cast("string"), F.col("id"))
                )
            ),
        ).alias("result")
    )
    keyed = with_query_keys(q, metric, tenant=tenant, index=index, centroids=C)
    wb = keyed.join(packed, "query_id", "inner")
    cache.write_back(wb, epoch=epoch, ttl_s=ttl_s or DEFAULT_TTL_S, now=now)
    return hits


def nearest_rank_percentiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    percentiles: list[float] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Exact nearest-rank quantiles (reference LatencySummary.cs:43-50:
    rank = ceil(p * n), 1-indexed over the ascending sort). Emits one row per
    group with p50/p95/p99-style columns.

    Exact-sort-based on purpose (hash-comparable with the oracle);
    for quick monitoring at scale use ``percentile_approx`` instead.
    """
    group_cols = group_cols or []
    w = Window.partitionBy(*group_cols).orderBy(F.col(value_col))
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count("*").over(Window.partitionBy(*group_cols))
    )
    aggs = []
    for p in percentiles:
        name = f"p{int(p * 100)}"
        aggs.append(
            F.max(
                F.when(F.col("_rn") == F.ceil(F.lit(p) * F.col("_n")), F.col(value_col))
            ).alias(name)
        )
    return ranked.groupBy(*group_cols).agg(*aggs)


def usage_metering(
    events: DataFrame,
    *,
    tenant_col: str,
    hit_col: Column | None = None,
    cost_units_col: Column | None = None,
    cost_unit_seconds: float = DEFAULT_COST_UNIT_SECONDS,
) -> DataFrame:
    """Per-tenant usage rollup (reference BillingMeter.cs:31-117):
    requests/hits/misses, compute units and seconds."""
    hit = hit_col if hit_col is not None else F.lit(False)
    cost = cost_units_col if cost_units_col is not None else F.lit(0.0)
    return events.groupBy(tenant_col).agg(
        F.count("*").alias("requests"),
        F.sum(hit.cast("long")).alias("cache_hits"),
        F.sum((~hit).cast("long")).alias("cache_misses"),
        F.round(F.sum(cost), 6).alias("compute_cost_units"),
        F.round(F.sum(cost) * F.lit(cost_unit_seconds), 6).alias("compute_seconds"),
    )


def write_heat(
    events: DataFrame,
    *,
    cluster_col: str,
    ts_col: str = "ts",
    window_s: int = 60,
    threshold: int = WRITE_HOT_THRESHOLD,
) -> DataFrame:
    """Clusters with > threshold writes inside a tumbling window
    (reference SemanticClusterRegistry.cs:84-121). Streaming-ready: the same
    expression works under ``readStream`` with a watermark."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), f"{window_s} seconds").alias("w"), F.col(cluster_col)
        )
        .agg(F.count("*").alias("writes"))
        .filter(F.col("writes") > threshold)
        .select(
            F.col("w.start").alias("window_start"),
            F.col(cluster_col),
            F.col("writes"),
        )
    )


SLO_BUCKET_BOUNDS_MS = [1.0, 5.0, 10.0, 50.0, 100.0, 200.0]


def slo_p99_estimate(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """G5: p99 estimated from the 6-bucket latency histogram — the upper
    bound of the first bucket whose cumulative share reaches 0.99
    (reference: SloGuardrailsMonitor.cs:12,78-110; bucket edges are strict
    ``<`` with everything >= 100 in the last bucket,
    MetricsCollector.cs:40-52)."""
    group_cols = group_cols or []
    edges = [1.0, 5.0, 10.0, 50.0, 100.0]
    v = F.col(value_col)
    conds = [v < edges[0]]
    for i in range(1, len(edges)):
        conds.append((v >= edges[i - 1]) & (v < edges[i]))
    conds.append(v >= edges[-1])
    aggs = [F.sum(c.cast("long")).alias(f"_b{i}") for i, c in enumerate(conds)]
    h = df.groupBy(*group_cols).agg(*aggs, F.count("*").alias("_total"))
    cum = F.lit(0).cast("long")
    p99 = None
    for i, bound in enumerate(SLO_BUCKET_BOUNDS_MS):
        cum = cum + F.col(f"_b{i}")
        cond = cum.cast("double") / F.col("_total") >= 0.99
        p99 = F.when(cond, F.lit(bound)) if p99 is None else p99.when(cond, F.lit(bound))
    p99 = p99.otherwise(F.lit(SLO_BUCKET_BOUNDS_MS[-1]))
    return h.select(*group_cols, F.col("_total").alias("samples"), p99.alias("p99_est_ms"))


def latency_histogram(
    df: DataFrame,
    value_col: str,
    buckets: list[float] = LATENCY_BUCKETS_MS,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Cumulative-bucket counts like the reference Prometheus histogram
    (MetricsCollector.cs:54-100): bucket `le_X` counts values <= X, plus
    +Inf = total."""
    group_cols = group_cols or []
    aggs = [
        F.sum((F.col(value_col) <= b).cast("long")).alias(f"le_{str(b).replace('.', '_')}")
        for b in buckets
    ] + [F.count("*").alias("le_inf")]
    return df.groupBy(*group_cols).agg(*aggs)


def multi_granularity_rollup(
    events: DataFrame,
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hypertable-style multi-resolution rollup in ONE aggregation pass:
    (event_type, day) -> per-type daily, per-type total, and grand total
    levels via ROLLUP — the continuous-aggregate ladder a time-series store
    materializes, expressed as Spark's native grouping-sets operator so
    Catalyst plans a single shuffle (Expand + one hash aggregate) instead of
    three separate scans + union.

    Rolled-up dimensions surface as the literal ``(all)`` (not NULL) so the
    output is totally ordered and hash-comparable; ``lvl`` is the
    grouping_id (0 = leaf, 1 = per-type total, 3 = grand total)."""
    day = F.date_format(F.col(ts_col), "yyyy-MM-dd")
    g = events.rollup(F.col(type_col).alias("etype"), day.alias("day")).agg(
        F.grouping_id().alias("lvl"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 6).alias("sum_value"),
    )
    return g.select(
        F.coalesce("etype", F.lit("(all)")).alias("event_type"),
        F.coalesce("day", F.lit("(all)")).alias("day"),
        F.col("lvl").cast("long").alias("lvl"),
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value",
    )


def exact_quantiles_two_pass(
    df: DataFrame,
    value_col: str,
    percentiles: list[float] = (0.5, 0.95, 0.99),
    *,
    n_buckets: int = 4096,
) -> DataFrame:
    """EXACT nearest-rank quantiles (rank = ceil(p*n), 1-indexed ascending —
    identical semantics to :func:`nearest_rank_percentiles`) WITHOUT a
    global sort: the 100 TB shape.

    Pass 1: (min, max, n) + an equi-width bucket histogram — two linear
    map-side-partial aggregates. The cumulative histogram locates the
    bucket containing each requested rank (driver work on n_buckets rows).
    Pass 2: ONE filtered scan of just the candidate buckets; within each,
    a window ranks its (n/n_buckets expected) rows and picks the exact
    offset = rank - cumulative-count-below-bucket. Sort cost is per-bucket,
    bounded by the densest bucket, never n log n over the full column.
    Heavily duplicated values concentrate a bucket — the documented
    residual hotspot (raise n_buckets, or fall back to the sort path for
    pathological single-value columns).

    Output: (p, value) per requested percentile — hash-comparable with the
    sort-based oracle because both implement the same rank function.
    """
    from pyspark.sql.window import Window

    stats = df.agg(
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
        F.count(value_col).alias("n"),
    ).collect()[0]
    n = int(stats["n"])
    if n == 0:
        raise ValueError("cannot take quantiles of an empty column")
    lo, hi = float(stats["lo"]), float(stats["hi"])
    spark = df.sparkSession
    if hi == lo:
        return spark.createDataFrame(
            [(float(p), lo) for p in percentiles], "p double, value double"
        )
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int"),
    )
    hist = {
        r["b"]: r["c"]
        for r in df.select(bucket.alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    # driver-side cumulative walk over <= n_buckets entries
    import math

    targets = []  # (p, rank, bucket, offset_in_bucket)
    for p in percentiles:
        rank = max(1, math.ceil(p * n))
        cum = 0
        for b in range(n_buckets):
            c = hist.get(b, 0)
            if cum + c >= rank:
                targets.append((float(p), rank, b, rank - cum))
                break
            cum += c
    cand_buckets = sorted({t[2] for t in targets})
    w = Window.partitionBy("_b").orderBy(F.col(value_col))
    ranked = (
        df.select(F.col(value_col), bucket.alias("_b"))
        .filter(F.col("_b").isin(cand_buckets))
        .withColumn("_r", F.row_number().over(w))
    )
    rows = [(p, b, off) for p, rank, b, off in targets]
    probe = spark.createDataFrame(rows, "p double, _b int, _r long")
    out = probe.join(ranked, ["_b", "_r"]).select(
        "p", F.col(value_col).cast("double").alias("value")
    )
    return out


def categorical_stats(
    df: DataFrame,
    group_cols: list[str],
    cat_col: str,
) -> DataFrame:
    """Per-group categorical profile: the MODE (most frequent value, ties
    broken lexicographically — deterministic), its count and share, the
    distinct-category count, and the GINI IMPURITY ``1 - sum(p_i^2)``.

    Gini is computed EXACTLY: ``1 - sum(c_i^2) / n^2`` keeps every term an
    integer until one final division — unlike entropy (whose ``p log p``
    terms hit cross-engine log ulp), it is bit-replicable in SQL by
    construction. Shape: one (group, category) hash aggregate with
    map-side partials, then a group-level rollup over category-count rows
    (bounded by the category cardinality, not the table).
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(*group_cols, cat_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("_c"), F.asc(cat_col)
    )
    ranked = counts.withColumn("_r", F.row_number().over(w))
    per_group = counts.groupBy(*group_cols).agg(
        F.sum("_c").alias("_n"),
        F.sum(F.col("_c") * F.col("_c")).alias("_ss"),
        F.count(F.lit(1)).alias("n_categories"),
    )
    mode = ranked.filter(F.col("_r") == 1).select(
        *group_cols,
        F.col(cat_col).alias("mode_value"),
        F.col("_c").alias("mode_count"),
    )
    return per_group.join(mode, group_cols).select(
        *group_cols,
        "mode_value",
        F.col("mode_count").cast("long").alias("mode_count"),
        F.round(F.col("mode_count") / F.col("_n"), 6).alias("mode_share"),
        F.col("n_categories").cast("long").alias("n_categories"),
        F.round(
            F.lit(1.0) - F.col("_ss") / (F.col("_n") * F.col("_n")), 6
        ).alias("gini_impurity"),
    )


def item_association_rules(
    events: DataFrame,
    *,
    basket_col: str = "user_id",
    item_col: str = "item",
    min_support: int = 2,
    max_basket_items: int | None = 200,
) -> DataFrame:
    """Market-basket association rules (the Apriori k=2 core): for every
    pair of items co-occurring in a basket, exact support counts plus
    confidence and lift.  Input is (basket, item) rows — callers project
    whatever defines a basket (user, session, order).

    Scale shape: one distinct-shuffle to basket sets, then the pair
    generation is a SELF-JOIN ON THE BASKET KEY — cost is sum over
    baskets of |basket|^2, which is why ``max_basket_items`` caps
    pathological baskets (a crawler "user" with every item would
    otherwise contribute |items|^2 pairs; the cap keeps the
    most-FREQUENT items per basket, deterministic count-desc/item-asc
    order, matching how FP-Growth prunes).  Counts are exact integers;
    confidence/lift are one integer->double division each at the end, so
    every value is cross-engine reproducible.  Pair counts aggregate
    map-side before the pair shuffle; item supports broadcast back.

    Output: (item_a < item_b, n_ab, n_a, n_b, n_baskets,
    conf_a_to_b, conf_b_to_a, lift), filtered to n_ab >= min_support.
    """
    base = events.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).filter(F.col("_i").isNotNull())
    if max_basket_items is not None:
        freq = base.groupBy("_b", "_i").agg(F.count(F.lit(1)).alias("_n"))
        rk = F.row_number().over(
            Window.partitionBy("_b").orderBy(
                F.col("_n").desc(), F.col("_i").asc()
            )
        )
        baskets = (
            freq.withColumn("_rk", rk)
            .filter(F.col("_rk") <= max_basket_items)
            .select("_b", "_i")
        )
    else:
        baskets = base.distinct()
    n_baskets = baskets.select("_b").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    item_cnt = baskets.groupBy("_i").agg(F.count(F.lit(1)).alias("_ni"))
    left = baskets.select(F.col("_b"), F.col("_i").alias("item_a"))
    right = baskets.select(F.col("_b").alias("_b2"), F.col("_i").alias("item_b"))
    pairs = (
        left.join(right, (F.col("_b") == F.col("_b2"))
                  & (F.col("item_a") < F.col("item_b")))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    with_counts = (
        pairs.join(
            F.broadcast(item_cnt.select(F.col("_i").alias("item_a"),
                                        F.col("_ni").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(item_cnt.select(F.col("_i").alias("item_b"),
                                        F.col("_ni").alias("n_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    return with_counts.select(
        "item_a", "item_b", "n_ab", "n_a", "n_b", "n_baskets",
        F.round(F.col("n_ab") / F.col("n_a"), 6).alias("conf_a_to_b"),
        F.round(F.col("n_ab") / F.col("n_b"), 6).alias("conf_b_to_a"),
        F.round(
            (F.col("n_ab") * F.col("n_baskets"))
            / (F.col("n_a") * F.col("n_b")),
            6,
        ).alias("lift"),
    )


def rfm_segments(
    orders: DataFrame,
    n_tiles: int = 5,
) -> DataFrame:
    """RFM customer segmentation: recency / frequency / monetary quintiles.

    Per customer: recency = days between their last order and the corpus'
    max order date, frequency = order count, monetary = total spend in
    integer cents.  Each axis is scored with ``ntile(n_tiles)`` over a
    TOTAL order (metric, then custkey as the unique tiebreak) so the tile
    assignment is deterministic and identical across engines — the SQL
    standard fixes ntile's bucket sizes given the ordering, so no
    floating-point or hash ambiguity can flip a boundary row.

    Scale shape (100 TB): one hash aggregate over orders (shuffle on
    o_custkey), then three window passes over the AGGREGATED table —
    |customers| rows, orders of magnitude smaller than the fact table.
    The global max-date is a scalar broadcast, not a second scan (computed
    in the same aggregate via a window-free grouped max + cross-join of a
    1-row frame Catalyst collapses to a literal-like broadcast).
    Reference: analytics surface parity (Pyrope metering/reporting jobs,
    src/Pyrope.Service metering endpoints); RFM itself is the standard
    marketing segmentation, beyond-reference training-data/BI surface.
    """
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").cast("long").alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "monetary_cents"
        ),
    )
    max_date = per_cust.agg(F.max("last_order").alias("corpus_max"))
    per_cust = per_cust.join(F.broadcast(max_date))
    per_cust = per_cust.withColumn(
        "recency_days",
        F.datediff(F.col("corpus_max"), F.col("last_order")).cast("long"),
    ).drop("corpus_max", "last_order")

    w_r = Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey").asc())
    w_f = Window.orderBy(F.col("frequency").desc(), F.col("o_custkey").asc())
    w_m = Window.orderBy(
        F.col("monetary_cents").desc(), F.col("o_custkey").asc()
    )
    scored = (
        per_cust.withColumn("r_score", F.ntile(n_tiles).over(w_r))
        .withColumn("f_score", F.ntile(n_tiles).over(w_f))
        .withColumn("m_score", F.ntile(n_tiles).over(w_m))
    )
    return scored.select(
        F.col("o_custkey").cast("long").alias("custkey"),
        "recency_days",
        "frequency",
        "monetary_cents",
        F.col("r_score").cast("long").alias("r_score"),
        F.col("f_score").cast("long").alias("f_score"),
        F.col("m_score").cast("long").alias("m_score"),
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("long").alias("rfm_code"),
    )


def skyline_2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """2-D skyline (Pareto frontier): rows no other row dominates.

    Row r dominates s when ``r.min <= s.min`` and ``r.max >= s.max`` with
    at least one strict.  In two dimensions the skyline falls out of ONE
    sorted window pass — sort by (minimize asc, maximize desc, tiebreak)
    and keep a row iff its maximize value strictly exceeds the running
    max over all PRIOR rows: every prior row has minimize <= ours (and at
    equal minimize, maximize >= ours), so "not beaten on maximize" is
    exactly "undominated".  Duplicate (min, max) pairs: the first by
    tiebreak survives, the rest are dominated (weak dominance) — the
    conventional skyline-set semantics.

    Scale shape (100 TB): the window is GLOBAL (total order) — correct
    first, and fine for dimension-table inputs (parts, suppliers).  For a
    fact-scale skyline, pre-filter with a per-partition local skyline
    (mapPartitions keep-undominated) which shrinks candidates to
    O(frontier) per partition before the global pass — the standard
    distributed-skyline two-phase; the local pass composes from this same
    function applied per partition key.
    """
    w = Window.orderBy(
        F.col(minimize_col).asc(),
        F.col(maximize_col).desc(),
        F.col(tiebreak_col).asc(),
    ).rowsBetween(Window.unboundedPreceding, -1)
    run_max = F.max(F.col(maximize_col)).over(w)
    return (
        df.withColumn("_rm", run_max)
        .filter(F.col("_rm").isNull() | (F.col(maximize_col) > F.col("_rm")))
        .drop("_rm")
    )


def groupwise_trend(
    df: DataFrame,
    key_col: str,
    x_col,
    y_col,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-key OLS slope from exact integer sums (closed-form regression).

    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) — every sum an exact BIGINT
    over integer x/y, the division deferred to ONE final ``div`` in
    micro-units, so the trend report replicates bit-for-bit cross-engine
    (a float running regression would accumulate reduce-order noise).
    Callers pass x as SMALL integers (days since epoch-min, not epoch
    seconds) and y in cents — Sxy then stays within int64 to ~1e14 rows
    per key; the docstring bound to check before scaling up.

    Output: (key, n, slope_micro, num, den) — num/den kept so a consumer
    can re-derive exact rational comparisons (slope_a > slope_b as
    num_a*den_b > num_b*den_a) without ever dividing.

    Scale shape: ONE map-side-partial hash aggregate; nothing else.
    """
    x = x_col if not isinstance(x_col, str) else F.col(x_col)
    y = y_col if not isinstance(y_col, str) else F.col(y_col)
    base = df.select(
        F.col(key_col).alias("k"),
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
    )
    agg = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    # slope sign handling for div truncate-vs-floor: make the numerator
    # non-negative by multiplying both by sign(num)*sign(den) — slope
    # micro = sign * (|num| * scale div |den|), exact and portable
    sgn = F.signum(num.cast("double")).cast("long") * F.signum(
        den.cast("double")
    ).cast("long")
    slope = F.when(den == 0, F.lit(None).cast("long")).otherwise(
        sgn * F.expr(
            f"abs(n * sxy - sx * sy) * {scale} DIV abs(n * sxx - sx * sx)"
        )
    )
    return agg.select(
        F.col("k").alias(key_col),
        "n",
        num.alias("num"),
        den.alias("den"),
        slope.alias("slope_micro"),
    )


# in-row triple expansion bound: C(64,3) = 41,664 structs per basket row
# (~1.3 MB) is the largest per-row array the explode path may materialize;
# baskets beyond this take the streaming self-join path instead (the same
# bounded-fan-out judgment the ngram_jaccard_pairs docstring records)
FREQUENT_TRIPLES_INROW_MAX_ITEMS = 64


def frequent_triples(
    events: DataFrame,
    *,
    basket_col: str = "user_id",
    item_col: str = "item",
    min_support: int = 2,
    max_basket_items: int | None = 200,
) -> DataFrame:
    """Apriori k=3: frequent item TRIPLES with exact support counts —
    one order of pattern beyond :func:`item_association_rules`.

    r11 fast path (guide §2.4): when the measured max distinct-item
    basket size is within ``FREQUENT_TRIPLES_INROW_MAX_ITEMS``, triples
    expand IN-ROW from each basket's sorted item list (the
    triangle_copurchase collect-and-expand pattern) into one exact
    count aggregate — two exchanges total, no self-joins. Larger
    baskets fall back to the streaming Apriori join chain below.

    The Apriori monotonicity prune (fallback path) is implemented, not
    just cited: items below ``min_support`` drop first (broadcast
    semi-join), then candidate (a,b) basket-pairs are semi-joined
    against the FREQUENT pair table before the third item extends them,
    and each extension (b,c)/(a,c) must itself be a frequent pair.
    Every prune is lossless (a frequent triple's sub-pairs are
    frequent), so the counts equal the unpruned triple join the DuckDB
    oracle runs — while at corpus scale the joins only ever carry
    candidates that can still reach ``min_support``. Same per-basket
    cap discipline as the pair operator (count-desc/item-asc top-N,
    FP-Growth-style).

    Output: (item_a < item_b < item_c, support), support >= min_support.
    """
    base = events.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).filter(F.col("_i").isNotNull())
    if max_basket_items is not None:
        freq = base.groupBy("_b", "_i").agg(F.count(F.lit(1)).alias("_n"))
        rk = F.row_number().over(
            Window.partitionBy("_b").orderBy(
                F.col("_n").desc(), F.col("_i").asc()
            )
        )
        kept = (
            freq.withColumn("_rk", rk)
            .filter(F.col("_rk") <= max_basket_items)
            .select("_b", "_i")
        )
        # window partitionBy(_b) already established the _b partitioning,
        # so this groupBy adds no exchange (guide §2.4)
        lists = kept.groupBy("_b").agg(
            F.sort_array(F.collect_list("_i")).alias("_is")
        )
    else:
        # ONE exchange replaces distinct + regroup: collect_set is the
        # per-basket distinct
        lists = base.groupBy("_b").agg(
            F.sort_array(F.collect_set("_i")).alias("_is")
        )
    # Baskets with < 3 distinct items cannot contribute a triple, and the
    # prune below stays lossless under the restriction: every basket
    # containing a triple has >= 3 items and contains each sub-pair, so
    # pair support counted over >= 3-item baskets still upper-bounds
    # triple support (Apriori monotonicity within the filtered corpus).
    # r11 opt (guide §2.4/§1.2): the basket lists feed the max-size probe
    # plus the expansion (or the join fallback), so materialize once.
    lists = lists.filter(F.size("_is") >= 3).localCheckpoint(eager=True)
    max_n = lists.agg(F.max(F.size("_is")).alias("m")).first()["m"] or 0
    if max_n <= FREQUENT_TRIPLES_INROW_MAX_ITEMS:
        # in-row C(n,3) expansion (the triangle_copurchase r10 pattern):
        # all triples of the sorted distinct item list, ONE aggregate —
        # no self-joins, no prune tables (the unpruned counts already
        # equal the oracle's triple join; the prune chain existed to
        # bound the joins this path no longer performs). Guarded by the
        # measured max basket size so the per-row struct array stays
        # bounded (C(64,3) = 41,664); bigger baskets take the join path.
        tri = lists.select(
            F.explode(
                F.expr(
                    "flatten(flatten(transform(sequence(0, size(_is) - 3),"
                    " i -> transform(sequence(i + 1, size(_is) - 2),"
                    " j -> transform(sequence(j + 1, size(_is) - 1),"
                    " k -> struct(_is[i] AS item_a, _is[j] AS item_b,"
                    " _is[k] AS item_c))))))"
                )
            ).alias("t")
        ).select("t.item_a", "t.item_b", "t.item_c")
        return (
            tri.groupBy("item_a", "item_b", "item_c")
            .agg(F.count(F.lit(1)).cast("long").alias("support"))
            .filter(F.col("support") >= min_support)
        )

    baskets = lists.select("_b", F.explode("_is").alias("_i"))
    f1 = (
        baskets.groupBy("_i")
        .agg(F.count(F.lit(1)).alias("_ni"))
        .filter(F.col("_ni") >= min_support)
        .select("_i")
    )
    items_f = baskets.join(F.broadcast(f1), "_i").select("_b", "_i")

    l = items_f.select("_b", F.col("_i").alias("item_a"))
    r = items_f.select(F.col("_b").alias("_b2"), F.col("_i").alias("item_b"))
    pib = l.join(
        r, (F.col("_b") == F.col("_b2")) & (F.col("item_a") < F.col("item_b"))
    ).select("_b", "item_a", "item_b")
    fp2 = (
        pib.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("_nab"))
        .filter(F.col("_nab") >= min_support)
        .select("item_a", "item_b")
    )
    pb_freq = pib.join(F.broadcast(fp2), ["item_a", "item_b"], "left_semi")

    third = items_f.select(
        F.col("_b").alias("_b3"), F.col("_i").alias("item_c")
    )
    cand = pb_freq.join(
        third,
        (F.col("_b") == F.col("_b3")) & (F.col("item_b") < F.col("item_c")),
    ).select("_b", "item_a", "item_b", "item_c")
    cand = cand.join(
        F.broadcast(fp2.select(F.col("item_a").alias("item_b"),
                               F.col("item_b").alias("item_c"))),
        ["item_b", "item_c"],
        "left_semi",
    ).join(
        F.broadcast(fp2.select("item_a", F.col("item_b").alias("item_c"))),
        ["item_a", "item_c"],
        "left_semi",
    )
    return (
        cand.groupBy("item_a", "item_b", "item_c")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )


def cohort_ltv_curve(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 1_000_000,
) -> DataFrame:
    """Cohort lifetime-value curve: users grouped by first-seen week, each
    cohort's CUMULATIVE revenue by age-in-weeks, absolute and per user —
    the unit-economics readout ("does week-10 LTV of the March cohort
    beat February's?") that the retention curve ([[cohort_retention_weekly]])
    only counts heads for.

    All-integer: week = epoch-seconds div 604800 (the fixed-epoch week
    index — no calendar parsing), revenue enters as ``floor(v·1e6)``
    micro units, per-user LTV is one truncating div at the end.

    Scale shape (100 TB): one (user) aggregate for first-seen weeks, one
    keyed join back to events (hash on user — the fact table's natural
    key), one (cohort, age) aggregate, then the cumulative window runs
    over the cohort×age GRID (hundreds of rows), never event volume.
    """
    from pyspark.sql.window import Window

    ev = events.select(
        F.col(user_col).alias("u"),
        F.expr(f"unix_timestamp({ts_col}) div 604800").alias("wk"),
        F.floor(F.col(value_col).cast("double") * scale)
        .cast("long")
        .alias("vm"),
    )
    first = ev.groupBy("u").agg(F.min("wk").alias("cohort_week"))
    sizes = first.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_users")
    )
    aged = ev.join(first, "u").select(
        "cohort_week", (F.col("wk") - F.col("cohort_week")).alias("age_weeks"), "vm"
    )
    grid = aged.groupBy("cohort_week", "age_weeks").agg(
        F.sum("vm").cast("long").alias("week_revenue_micro")
    )
    w = Window.partitionBy("cohort_week").orderBy("age_weeks").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        grid.withColumn(
            "cum_revenue_micro",
            F.sum("week_revenue_micro").over(w).cast("long"),
        )
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            F.col("age_weeks").cast("long").alias("age_weeks"),
            "week_revenue_micro",
            "cum_revenue_micro",
            "cohort_users",
            F.expr("cum_revenue_micro div cohort_users")
            .cast("long")
            .alias("ltv_per_user_micro"),
        )
    )


def cohort_ltv_oracle_sql(
    *,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of [[cohort_ltv_curve]]."""
    return f"""
WITH ev AS (
  SELECT {user_col} AS u,
         CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP))) AS BIGINT)
           // 604800 AS wk,
         CAST(floor(CAST({value_col} AS DOUBLE) * {scale}) AS BIGINT) AS vm
  FROM {table}
),
first AS (SELECT u, MIN(wk) AS cohort_week FROM ev GROUP BY 1),
sizes AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
          FROM first GROUP BY 1),
grid AS (
  SELECT f.cohort_week, ev.wk - f.cohort_week AS age_weeks,
         CAST(SUM(ev.vm) AS BIGINT) AS week_revenue_micro
  FROM ev JOIN first f ON ev.u = f.u
  GROUP BY 1, 2
),
cum AS (
  SELECT *, CAST(SUM(week_revenue_micro) OVER (
              PARTITION BY cohort_week ORDER BY age_weeks
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_revenue_micro
  FROM grid
)
SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
       CAST(c.age_weeks AS BIGINT) AS age_weeks,
       c.week_revenue_micro, c.cum_revenue_micro, s.cohort_users,
       CAST(c.cum_revenue_micro // s.cohort_users AS BIGINT)
         AS ltv_per_user_micro
FROM cum c JOIN sizes s ON c.cohort_week = s.cohort_week
"""


def recency_weighted_popularity(
    events: DataFrame,
    *,
    item_expr: Column,
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_days: int = 7,
    max_steps: int = 40,
    scale: int = 1_000_000,
) -> DataFrame:
    """Recency-weighted popularity with EXACT halving decay: each event
    contributes ``floor(value·1e6) >> (age_days div half_life)`` — value
    halves every ``half_life_days``, implemented as an integer bit-shift
    so the score is bit-reproducible (the float ``exp(-λt)`` every other
    system uses cannot be hashed cross-engine; staircase halving keeps
    the ranking semantics and loses nothing a ranker cares about).

    ``age_days`` is measured from the corpus max-ts day (broadcast 1-row
    join — deterministic, no wall-clock); shifts cap at ``max_steps``
    (2^40 ≈ 1e12 — older events contribute 0 at micro precision anyway).

    Scale shape: one 1-row aggregate + broadcast, one (item) aggregate.
    """
    from pyspark.sql import functions as F

    ev = events.select(
        item_expr.alias("item"),
        F.expr(f"unix_timestamp({ts_col}) div 86400").alias("day"),
        F.floor(F.col(value_col).cast("double") * scale)
        .cast("long")
        .alias("vm"),
    )
    mx = ev.agg(F.max("day").alias("max_day"))
    aged = ev.crossJoin(F.broadcast(mx)).select(
        "item",
        "vm",
        F.least(
            F.lit(max_steps),
            F.expr(f"(max_day - day) div {half_life_days}"),
        ).alias("steps"),
    )
    return (
        aged.select(
            "item",
            F.expr("vm div shiftleft(1L, cast(steps as int))").alias("dv"),
        )
        .groupBy("item")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("dv").cast("long").alias("decayed_value_micro"),
        )
    )


def recency_weighted_oracle_sql(
    *,
    item_sql: str,
    table: str = "events",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_days: int = 7,
    max_steps: int = 40,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of [[recency_weighted_popularity]]."""
    return f"""
WITH ev AS (
  SELECT {item_sql} AS item,
         CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP))) AS BIGINT) // 86400
           AS day,
         CAST(floor(CAST({value_col} AS DOUBLE) * {scale}) AS BIGINT) AS vm
  FROM {table}
),
mx AS (SELECT MAX(day) AS max_day FROM ev),
aged AS (
  SELECT item, vm,
         LEAST({max_steps}, (max_day - day) // {half_life_days}) AS steps
  FROM ev CROSS JOIN mx
)
SELECT item, CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(vm // (CAST(1 AS BIGINT) << CAST(steps AS INT))) AS BIGINT)
         AS decayed_value_micro
FROM aged GROUP BY 1
"""


def ab_conversion_test(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    variant_expr: Column,
    convert_expr: Column,
    scale: int = 1_000_000,
    first_observed_by: tuple[str, ...] | None = None,
) -> DataFrame:
    """Two-variant conversion comparison with the EXACT two-proportion
    z² statistic — the experiment readout (z² > 3.84 ≈ p < 0.05 at one
    degree of freedom; z² is the chi-square form of the z-test, so no
    square root is ever taken and the whole statistic stays rational).

    Per user: variant and converted-ever.  Variant assignment: with
    ``first_observed_by`` (e.g. ``("ts", "event_id")``) the user gets the
    variant of their FIRST event in that total order; without it, the
    default is ``MIN(variant)`` over all the user's events — a user
    exposed to BOTH variants is then assigned variant 0, which skews
    exposures toward A (fine when assignment is a pure function of the
    user, e.g. ``user_id % 2``, where both semantics coincide; pass
    ``first_observed_by`` for true exposure logs).  With
    ``ca/na`` and ``cb/nb`` conversions/exposures the closed rational
    form is ``z² = (ca·nb − cb·na)² · N div (na·nb·C·(N−C))`` with
    ``C = ca+cb, N = na+nb`` — cross-multiplied to ONE division, carried
    through DECIMAL(38,0) (the squared term overflows int64 at ~55k
    users/variant; DuckDB's hugeint promotes implicitly).

    Output one row: exposures, conversions, and per-mille rates per
    variant, the rate difference, and ``z2_milli``.

    Scale shape: one user-keyed aggregate + one 2-row aggregate.
    """
    from pyspark.sql import functions as F

    if first_observed_by:
        order = [F.col(c) for c in first_observed_by]
        variant_agg = F.min(F.struct(*order, variant_expr.alias("_v")))[
            "_v"
        ].alias("variant")
    else:
        variant_agg = F.min(variant_expr).alias("variant")
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        variant_agg,
        F.max(convert_expr.cast("int")).alias("converted"),
    )
    two = per_user.groupBy().agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when((F.col("variant") == 0) & (F.col("converted") == 1), 1)
              .otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
        F.sum(F.when((F.col("variant") == 1) & (F.col("converted") == 1), 1)
              .otherwise(0)).cast("long").alias("cb"),
    )
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
    return two.select(
        "na",
        "ca",
        "nb",
        "cb",
        F.expr(f"ca * {scale} div na").cast("long").alias("rate_a_ppm"),
        F.expr(f"cb * {scale} div nb").cast("long").alias("rate_b_ppm"),
        (
            F.expr(f"ca * {scale} div na") - F.expr(f"cb * {scale} div nb")
        ).cast("long").alias("rate_diff_ppm"),
        F.when(guard, z2).otherwise(F.lit(0)).cast("long").alias("z2_milli"),
    )


def ab_conversion_oracle_sql(
    *,
    table: str = "events",
    user_col: str = "user_id",
    variant_sql: str = "user_id % 2",
    convert_sql: str = "event_type = 'purchase'",
    scale: int = 1_000_000,
    first_observed_by: tuple[str, ...] | None = None,
) -> str:
    """DuckDB twin of [[ab_conversion_test]] (same ``first_observed_by``
    semantics: first event in that total order picks the variant;
    default is MIN(variant) over all the user's events)."""
    if first_observed_by:
        order = ", ".join(first_observed_by)
        per_user = f"""
fe AS (
  SELECT {user_col} AS u, {variant_sql} AS variant,
         row_number() OVER (PARTITION BY {user_col} ORDER BY {order}) AS rn
  FROM {table}
),
cv AS (
  SELECT {user_col} AS u,
         MAX(CASE WHEN {convert_sql} THEN 1 ELSE 0 END) AS converted
  FROM {table} GROUP BY 1
),
per_user AS (
  SELECT fe.u, fe.variant, cv.converted
  FROM fe JOIN cv USING (u) WHERE fe.rn = 1
)"""
    else:
        per_user = f"""
per_user AS (
  SELECT {user_col} AS u, MIN({variant_sql}) AS variant,
         MAX(CASE WHEN {convert_sql} THEN 1 ELSE 0 END) AS converted
  FROM {table} GROUP BY 1
)"""
    return f"""
WITH {per_user},
two AS (
  SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN variant = 0 AND converted = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         CAST(SUM(CASE WHEN variant = 1 AND converted = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS cb
  FROM per_user
)
SELECT na, ca, nb, cb,
       CAST(ca * {scale} // na AS BIGINT) AS rate_a_ppm,
       CAST(cb * {scale} // nb AS BIGINT) AS rate_b_ppm,
       CAST(ca * {scale} // na - cb * {scale} // nb AS BIGINT)
         AS rate_diff_ppm,
       CAST(CASE WHEN na > 0 AND nb > 0 AND ca + cb > 0
                  AND ca + cb < na + nb
                 THEN (ca * nb - cb * na) * (ca * nb - cb * na)
                      * (na + nb) * 1000
                      // (na * nb * (ca + cb) * ((na + nb) - (ca + cb)))
                 ELSE 0 END AS BIGINT) AS z2_milli
FROM two
"""


def transition_matrix(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    state_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    scale: int = 1_000_000,
) -> DataFrame:
    """Full first-order Markov transition matrix over per-user event
    streams: every (prev → next) pair with its count and the exact
    row-normalized probability ``prob_ppm = cnt·1e6 div row_total`` —
    the complete behavioral model where [[markov_rules]] keeps only the
    single best rule per state (prefetch needs one answer; funnel/churn
    analysis needs the whole distribution, self-loops included).

    Scale shape: one user-keyed lag window + one (prev, next) aggregate
    + a broadcast row-total join — the matrix is |states|², never
    event volume.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    trans = (
        events.withColumn("_prev", F.lag(F.col(state_col)).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(
            F.col("_prev").alias("prev_state"),
            F.col(state_col).alias("next_state"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    totals = trans.groupBy("prev_state").agg(
        F.sum("cnt").alias("row_total")
    )
    return trans.join(F.broadcast(totals), "prev_state").select(
        "prev_state",
        "next_state",
        "cnt",
        F.col("row_total").cast("long").alias("row_total"),
        F.expr(f"cnt * {scale} div row_total").cast("long").alias("prob_ppm"),
    )


def transition_matrix_oracle_sql(
    *,
    table: str = "events",
    user_col: str = "user_id",
    state_col: str = "event_type",
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of [[transition_matrix]] (order ts, event_id)."""
    return f"""
WITH seq AS (
  SELECT {state_col} AS state,
         lag({state_col}) OVER (PARTITION BY {user_col}
                                ORDER BY ts, event_id) AS prev
  FROM {table}
),
trans AS (
  SELECT prev AS prev_state, state AS next_state,
         CAST(count(*) AS BIGINT) AS cnt
  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
),
totals AS (SELECT prev_state, SUM(cnt) AS row_total FROM trans GROUP BY 1)
SELECT t.prev_state, t.next_state, t.cnt,
       CAST(x.row_total AS BIGINT) AS row_total,
       CAST(t.cnt * {scale} // x.row_total AS BIGINT) AS prob_ppm
FROM trans t JOIN totals x ON t.prev_state = x.prev_state
"""


def dau_mau_stickiness(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    mau_days: int = 28,
    scale: int = 1_000_000,
) -> DataFrame:
    """Product-engagement stickiness: per active day, DAU, trailing
    ``mau_days``-window MAU, and ``stickiness_ppm = dau·1e6 div mau`` —
    the DAU/MAU ratio (a 3%-stickiness product is a utility; a 50% one
    is a habit).

    Exact distincts, computed over the COMPACTED (user, day) activity
    table — the fact table collapses to at most users×active-days rows
    first, so the trailing-window range join touches activity volume,
    never event volume (the [[rolling_7d_distinct_users]] shape; its
    HLL variant stands in when even the activity table is too hot).

    Days are fixed-epoch ``epoch-seconds div 86400`` integers.
    """
    from pyspark.sql import functions as F

    act = events.select(
        F.col(user_col).alias("u"),
        F.expr(f"unix_timestamp({ts_col}) div 86400").alias("day"),
    ).distinct()
    dau = act.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    spine = dau.select("day")
    win = spine.alias("s").join(
        act.alias("a"),
        (F.col("a.day") > F.col("s.day") - mau_days)
        & (F.col("a.day") <= F.col("s.day")),
    )
    mau = win.groupBy(F.col("s.day").alias("day")).agg(
        F.countDistinct("a.u").cast("long").alias("mau")
    )
    return dau.join(mau, "day").select(
        F.col("day").cast("long").alias("day"),
        "dau",
        "mau",
        F.expr(f"dau * {scale} div mau").cast("long").alias("stickiness_ppm"),
    )


def dau_mau_oracle_sql(
    *,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    mau_days: int = 28,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of [[dau_mau_stickiness]]."""
    return f"""
WITH act AS (
  SELECT DISTINCT {user_col} AS u,
         CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP))) AS BIGINT) // 86400
           AS day
  FROM {table}
),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM act GROUP BY 1),
mau AS (
  SELECT s.day, CAST(count(DISTINCT a.u) AS BIGINT) AS mau
  FROM dau s JOIN act a
    ON a.day > s.day - {mau_days} AND a.day <= s.day
  GROUP BY 1
)
SELECT CAST(dau.day AS BIGINT) AS day, dau.dau, mau.mau,
       CAST(dau.dau * {scale} // mau.mau AS BIGINT) AS stickiness_ppm
FROM dau JOIN mau ON dau.day = mau.day
"""


def lorenz_curve_deciles(
    df: DataFrame,
    *,
    id_col: str,
    value_col: str,
    n_buckets: int = 10,
    scale: int = 1_000_000,
    values_are_micro: bool = False,
) -> DataFrame:
    """Lorenz-curve points: members sorted by value ascending, bucketed
    into ``n_buckets`` equal-population slices, each with its exact value
    share and cumulative share — the inequality readout behind "the top
    decile of customers carries X% of revenue" (the curve whose area
    deficit IS the Gini coefficient [[source_length_gini]] summarizes).

    All integer: values enter floor-micro, members rank through the
    distributed [[global_rank]] (no single-partition sort of the member
    table), bucket = ``(rank−1)·n_buckets div n`` — exact equal-population
    cuts — and shares are one division per bucket against the broadcast
    total.  Cumulative runs over the n_buckets-row table only.

    Input-magnitude bound (ADVICE r6): values ALWAYS round-trip through
    double for the floor-micro conversion — including already-integer
    inputs like ``spend_cents`` — so per-row values above ~2^53/1e6
    (≈9.0e9) lose exactness in the ×1e6 step. Both engines perform the
    identical IEEE multiply+floor, so cross-engine hash parity holds at
    ANY magnitude; only absolute exactness of the micro units degrades
    past that bound. Callers whose column already holds integer micro
    (or cent) units can pass ``values_are_micro=True`` (r7 ADVICE flag)
    to take the value as-is — floored to LONG, exact to 2^63 on integer
    input (r8 ADVICE: the floor keeps a double-typed column with
    fractional values bit-identical across engines, where a bare cast
    truncates in Spark but rounds in DuckDB).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pyrope_spark.operators.curation import global_rank

    # values_are_micro floors BEFORE the long cast (r8 ADVICE): Spark's
    # cast('long') truncates toward zero while DuckDB's CAST AS BIGINT
    # rounds half away from zero, so a double-typed column with
    # fractional values would diverge across engines without the shared
    # floor (a no-op on integer-typed input, the documented case)
    vm = (
        F.floor(F.col(value_col)).cast("long")
        if values_are_micro
        else F.floor(F.col(value_col).cast("double") * 1_000_000).cast("long")
    )
    base = df.select(F.col(id_col).alias("id"), vm.alias("vm"))
    # r11 opt (guide §1.2): base feeds THREE consumers — the (n, total)
    # denominator aggregate and, on the distributed-rank path, the
    # splitter-sampling pass plus the ranged pass — and each one re-ran
    # the caller's upstream aggregation (orders -> per-customer spend for
    # the registered query). Materialize once: the table is member-sized
    # (callers pass per-entity aggregates), never fact-sized.
    base = base.localCheckpoint(eager=True)
    stats = base.agg(
        F.count("*").alias("n"), F.sum("vm").alias("total")
    ).first()
    n_rows = int(stats["n"] or 0)
    if n_rows == 0:
        return df.sparkSession.createDataFrame(
            [],
            "bucket long, n_members long, bucket_value_micro long, "
            "share_ppm long, cum_value_micro long, cum_share_ppm long",
        )
    # all-NULL vm leaves total NULL — keep the same NULL-propagating
    # division the column form had
    total = (
        str(int(stats["total"]))
        if stats["total"] is not None
        else "CAST(NULL AS BIGINT)"
    )
    # the bounded (1-row) collect above means the count is KNOWN here, so
    # global_rank takes its r10 known_rows shortcut below 200k members
    # (one single-partition row_number instead of the 3-job distributed
    # rank); n and total become literals, dropping the broadcast
    # crossJoin the previous form paid (values identical: same n/total)
    ranked = global_rank(base, order_cols=("vm", "id"), known_rows=n_rows)
    bucketed = ranked.select(
        F.expr(f"(grank - 1) * {n_buckets} div {n_rows}").alias("bucket"),
        "vm",
    )
    per = bucketed.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_members"),
        F.sum("vm").cast("long").alias("bucket_value_micro"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    # micro totals reach ~1e15 at small SF already — the ×1e6 share
    # multiply MUST go through DECIMAL(38,0) (DuckDB hugeint-promotes)
    return per.select(
        F.col("bucket").cast("long").alias("bucket"),
        "n_members",
        "bucket_value_micro",
        F.expr(
            f"CAST(CAST(bucket_value_micro AS DECIMAL(38,0)) * {scale} "
            f"DIV {total} AS BIGINT)"
        ).alias("share_ppm"),
        F.sum("bucket_value_micro").over(w).cast("long").alias("cum_value_micro"),
        F.expr(
            f"CAST(CAST(sum(bucket_value_micro) OVER (ORDER BY bucket "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            f"AS DECIMAL(38,0)) * {scale} DIV {total} AS BIGINT)"
        ).alias("cum_share_ppm"),
    )


def lorenz_curve_oracle_sql(
    *,
    id_sql: str,
    value_sql: str,
    table: str,
    n_buckets: int = 10,
    scale: int = 1_000_000,
    values_are_micro: bool = False,
) -> str:
    """DuckDB twin of [[lorenz_curve_deciles]] (same ``values_are_micro``
    exact-integer input path)."""
    # floor-before-cast matches the Spark side exactly (r8 ADVICE):
    # DuckDB CAST AS BIGINT rounds half away from zero on fractional
    # doubles where Spark's floor+cast floors.  A plain floor() would
    # promote BIGINT input to DOUBLE (losing exactness past 2^53), so
    # the twin floors via cast-then-adjust — exact to 2^63 on integer
    # input, true floor on fractional doubles, same bits as Spark's
    # F.floor(col).cast('long').
    vm_cast = f"CAST({value_sql} AS BIGINT)"
    vm = (
        f"({vm_cast} - CASE WHEN {vm_cast} > ({value_sql}) THEN 1 ELSE 0 END)"
        if values_are_micro
        else f"CAST(floor(CAST({value_sql} AS DOUBLE) * 1000000) AS BIGINT)"
    )
    return f"""
WITH base AS (
  SELECT {id_sql} AS id, {vm} AS vm
  FROM {table}
),
ranked AS (
  SELECT vm, row_number() OVER (ORDER BY vm ASC, id ASC) AS grank,
         COUNT(*) OVER () AS n, SUM(vm) OVER () AS total
  FROM base
),
per AS (
  SELECT (grank - 1) * {n_buckets} // n AS bucket,
         CAST(count(*) AS BIGINT) AS n_members,
         CAST(SUM(vm) AS BIGINT) AS bucket_value_micro,
         MAX(total) AS total
  FROM ranked GROUP BY 1
)
SELECT CAST(bucket AS BIGINT) AS bucket, n_members, bucket_value_micro,
       CAST(CAST(bucket_value_micro AS HUGEINT) * {scale} // total AS BIGINT)
         AS share_ppm,
       CAST(SUM(bucket_value_micro) OVER (ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_value_micro,
       CAST(CAST(SUM(bucket_value_micro) OVER (ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
         * {scale} // total AS BIGINT) AS cum_share_ppm
FROM per
"""


def ols_slope_by_group(
    df: DataFrame,
    *,
    group_cols: tuple[str, ...],
    x_col: str,
    y_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-group simple-regression slope/intercept with the EXACT
    closed-form rational — the "elasticity per segment" readout (demand
    vs discount, latency vs payload size) without a single float in the
    statistic. Inputs must already be INTEGER columns (callers convert
    units: cents, percent points, micro) — the same contract as every
    floor-micro operator here.

    ``slope_micro = (n*Sxy - Sx*Sy) * 1e6 div (n*Sxx - Sx*Sx)`` with all
    products carried through DECIMAL(38,0) (``n*Sxy`` overflows int64
    near 1e5 rows x 1e7-unit values), and
    ``intercept_micro = (Sy*1e6 - slope_micro*Sx) div n`` — defined FROM
    the floored slope so both engines evaluate the identical expression
    tree. Groups with zero x-variance emit NULL slope/intercept.

    Scale shape (100 TB): one hash aggregate computing the five
    sufficient statistics map-side; output is group-cardinality sized.

    Output: (group..., n, slope_micro, intercept_micro).
    """
    from pyspark.sql import functions as F

    dec = "CAST({} AS DECIMAL(38,0))"
    suff = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(x_col).cast("long")).cast("long").alias("sx"),
        F.sum(F.col(y_col).cast("long")).cast("long").alias("sy"),
        F.sum(
            F.col(x_col).cast("decimal(38,0)") * F.col(y_col).cast("long")
        ).alias("sxy"),
        F.sum(
            F.col(x_col).cast("decimal(38,0)") * F.col(x_col).cast("long")
        ).alias("sxx"),
    )
    slope = F.expr(
        f"CASE WHEN {dec.format('n')} * sxx - {dec.format('sx')} * sx = 0 "
        f"THEN NULL ELSE CAST(({dec.format('n')} * sxy - "
        f"{dec.format('sx')} * sy) * {scale} DIV "
        f"({dec.format('n')} * sxx - {dec.format('sx')} * sx) AS BIGINT) END"
    )
    return suff.withColumn("slope_micro", slope).select(
        *group_cols,
        "n",
        F.col("slope_micro").cast("long").alias("slope_micro"),
        F.expr(
            f"CAST((CASE WHEN slope_micro IS NULL THEN NULL ELSE "
            f"({dec.format('sy')} * {scale} - "
            f"{dec.format('slope_micro')} * sx) DIV n END) AS BIGINT)"
        ).alias("intercept_micro"),
    )


def ols_slope_oracle_sql(
    *,
    table: str,
    group_sqls: dict[str, str],
    x_sql: str,
    y_sql: str,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of [[ols_slope_by_group]] (HUGEINT auto-promotion
    stands in for Spark's DECIMAL(38,0))."""
    g_aliases = ", ".join(f"{sql} AS {name}" for name, sql in group_sqls.items())
    g_names = ", ".join(group_sqls)
    return f"""
WITH src AS (SELECT {g_aliases}, {x_sql} AS x, {y_sql} AS y FROM {table}),
suff AS (
  SELECT {g_names},
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx
  FROM src GROUP BY ALL
),
sl AS (
  SELECT *,
         CASE WHEN n * sxx - CAST(sx AS HUGEINT) * sx = 0 THEN NULL
              ELSE CAST((n * sxy - CAST(sx AS HUGEINT) * sy) * {scale}
                        // (n * sxx - CAST(sx AS HUGEINT) * sx) AS BIGINT)
         END AS slope_micro
  FROM suff
)
SELECT {g_names}, n, slope_micro,
       CAST((CAST(sy AS HUGEINT) * {scale}
             - CAST(slope_micro AS HUGEINT) * sx) // n AS BIGINT)
         AS intercept_micro
FROM sl
"""


def coverage_count_by_group(
    df: DataFrame,
    *,
    group_cols: tuple[str, ...],
    member_col: str,
    value_col: str,
    p_permille: int = 500,
) -> DataFrame:
    """Per group, how many members (taken largest-first) it takes to cover
    ``p_permille``/1000 of the group's total value — the Pareto
    concentration count behind "half our revenue is N customers" (the
    member-count dual of [[lorenz_curve_deciles]]'s share curve; kin to
    [[nucleus_select_by_quality]], which KEEPS the prefix rows — this
    reports only the count, so the output is group-sized).

    Exact integers: members order by (value desc, member id) — a total
    order — and the crossing test is cross-multiplied
    (``cum_before * 1000 < total * p``), so the member that crosses the
    threshold is counted and nothing after it is.

    Scale shape (100 TB): one (group, member) aggregate over the fact
    table, one group-keyed window over the member table, one group
    aggregate. No global sort, no driver loop.

    Output: (group..., n_members, total_value, n_for_p).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    per = df.groupBy(*group_cols, member_col).agg(
        F.sum(F.col(value_col).cast("long")).cast("long").alias("_v")
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("_v").desc(), F.col(member_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*group_cols)
    cum = per.withColumn("_cum", F.sum("_v").over(w)).withColumn(
        "_tot", F.sum("_v").over(wt)
    )
    return (
        cum.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max("_tot").cast("long").alias("total_value"),
            F.sum(
                F.when(
                    (F.col("_cum") - F.col("_v")) * 1000
                    < F.col("_tot") * p_permille,
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_for_p"),
        )
    )


def coverage_count_oracle_sql(
    *,
    table: str,
    group_sqls: dict[str, str],
    member_sql: str,
    value_sql: str,
    p_permille: int = 500,
) -> str:
    """DuckDB twin of [[coverage_count_by_group]]."""
    g_aliases = ", ".join(f"{sql} AS {name}" for name, sql in group_sqls.items())
    g_names = ", ".join(group_sqls)
    return f"""
WITH src AS (SELECT {g_aliases}, {member_sql} AS member,
                    CAST({value_sql} AS BIGINT) AS v FROM {table}),
per AS (SELECT {g_names}, member, CAST(SUM(v) AS BIGINT) AS v
        FROM src GROUP BY ALL),
cum AS (
  SELECT {g_names}, v,
         SUM(v) OVER (PARTITION BY {g_names} ORDER BY v DESC, member
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumv,
         SUM(v) OVER (PARTITION BY {g_names}) AS tot
  FROM per
)
SELECT {g_names},
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(MAX(tot) AS BIGINT) AS total_value,
       CAST(SUM(CASE WHEN (cumv - v) * 1000 < tot * {p_permille}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_for_p
FROM cum GROUP BY {g_names}
"""


def behavioral_concentration(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    scale: int = 1_000_000,
    min_events: int = 2,
) -> DataFrame:
    """Per-user Simpson concentration over event types: the probability
    that two of the user's events (drawn without replacement) share a
    type — 1e6 = a single-behavior user, ~1e6/k = uniform over k types.
    The behavioral-diversity feature for segmentation/churn models (the
    events twin of the corpus-side Simpson in
    [[lexical_diversity_by_source]], same exact rational:
    ``sum(c_i*(c_i-1)) * 1e6 div (n*(n-1))``, n >= ``min_events``).

    Scale shape (100 TB): two hash aggregates, (user, type) then user —
    word-count shaped, output is user-cardinality sized.

    Output: (user, n_events, n_types, simpson_micro).
    """
    from pyspark.sql import functions as F

    per_type = events.groupBy(
        F.col(user_col).alias("u"), F.col(type_col).alias("t")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return (
        per_type.groupBy("u")
        .agg(
            F.sum("c").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(F.expr("c * (c - 1)")).cast("long").alias("_pairs"),
        )
        .filter(F.col("n_events") >= min_events)
        .select(
            F.col("u").alias(user_col),
            "n_events",
            "n_types",
            F.expr(f"_pairs * {scale} DIV (n_events * (n_events - 1))")
            .cast("long")
            .alias("simpson_micro"),
        )
    )


def behavioral_concentration_oracle_sql(
    *,
    table: str = "events",
    user_sql: str = "user_id",
    type_sql: str = "event_type",
    scale: int = 1_000_000,
    min_events: int = 2,
) -> str:
    """DuckDB twin of [[behavioral_concentration]]."""
    return f"""
WITH per_type AS (
  SELECT {user_sql} AS u, {type_sql} AS t, CAST(count(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1, 2
),
agg AS (
  SELECT u, CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(SUM(c * (c - 1)) AS BIGINT) AS pairs
  FROM per_type GROUP BY 1
)
SELECT CAST(u AS BIGINT) AS user_id, n_events, n_types,
       CAST(pairs * {scale} // (n_events * (n_events - 1)) AS BIGINT)
         AS simpson_micro
FROM agg WHERE n_events >= {min_events}
"""
