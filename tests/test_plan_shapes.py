"""Plan-shape assertions for the round-5 session-3 operators: the shuffle
and broadcast discipline the docstrings claim, checked against the actual
executed plan (AQE final plan only — the Initial copy double-counts)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def _events(spark, n=400):
    rows = [
        (i, f"t{i % 3}", float(i % 37) + 0.25, datetime(2024, 1, 1 + i % 20))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, k string, value double, ts timestamp")


def test_histogram_drift_single_fact_aggregate(spark):
    """The fact table is aggregated ONCE on (key, half, bin); everything
    after runs on bin-vector-sized data. The plan must not shuffle the
    fact table twice."""
    from pyrope_spark.operators.profile import histogram_drift

    out = histogram_drift(_events(spark), "k", "value", "ts")
    out.collect()
    final = _final_plan(out)
    # exactly ONE (k, bin) aggregate touches fact volume (halves pivot
    # into conditional counts); the totals branch REUSES that exchange
    # (ReusedExchange) instead of recomputing it — the original
    # filter-per-half + full-outer formulation made Catalyst rebuild the
    # fact aggregate per branch (two scans, observed before the fix)
    assert "ReusedExchange" in final
    assert "FullOuter" not in final and "SortMergeJoin" not in final


def test_referential_audit_broadcasts_dim_keys(spark):
    from pyrope_spark.operators.profile import referential_audit

    fact = spark.createDataFrame([(i % 7,) for i in range(500)], "fk long")
    dim = spark.createDataFrame([(i,) for i in range(5)], "pk long")
    out = referential_audit([("f->d", fact, "fk", dim, "pk")])
    out.collect()
    final = _final_plan(out)
    assert "BroadcastHashJoin" in final or "BroadcastNestedLoopJoin" in final
    # the fact table itself is never hash-shuffled for the join
    assert "SortMergeJoin" not in final


def test_pmi_top_n_lowers_to_take_ordered(spark):
    """The global top-n must plan as TakeOrderedAndProject (per-partition
    heads), never a full global sort."""
    from pyrope_spark.operators.lm import pmi_collocations

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h " * 3) for i in range(50)],
        "doc_id long, text string",
    )
    out = pmi_collocations(docs, min_count=2, top_n=5)
    out.collect()
    final = _final_plan(out)
    assert "TakeOrderedAndProject" in final


def test_groupwise_trend_single_aggregate(spark):
    """One map-side-partial hash aggregate — exactly one fact shuffle, no
    joins, no windows."""
    from pyrope_spark.operators.analytics import groupwise_trend

    df = spark.createDataFrame(
        [("k%d" % (i % 5), i % 30, i % 11) for i in range(1000)],
        "k string, x long, y long",
    )
    out = groupwise_trend(df, "k", "x", "y")
    out.collect()
    final = _final_plan(out)
    assert final.count("Exchange hashpartitioning") == 1
    assert "Join" not in final and "Window" not in final


def test_winsorize_bounds_join_is_small_side(spark):
    """The per-key bounds table joins back broadcast (AQE turns the
    aggregated side into a broadcast), never a fact-fact sort-merge."""
    from pyrope_spark.operators.curation import winsorize

    out = winsorize(_events(spark, 2000), "k", "value", "id")
    out.collect()
    final = _final_plan(out)
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final


def test_rollup_is_one_expand_one_fact_aggregate(spark):
    """rollup() must plan as a single Expand + one partial/final aggregate
    pair over the fact scan — NOT one scan per grouping level."""
    rows = [(f"y{i % 3}", f"f{i % 2}", f"s{i % 2}", float(i)) for i in range(300)]
    src = spark.createDataFrame(rows, "a string, b string, c string, v double")
    out = src.rollup("a", "b", "c").agg(
        F.sum("v").alias("s"), F.count("*").alias("n")
    )
    out.collect()
    final = _final_plan(out)
    assert final.count("Expand") == 1
    assert "ReusedExchange" not in final  # nothing to reuse: one lineage
    # one shuffle for the aggregate (plus possibly AQE coalesce) — never 4
    assert final.count("Exchange hashpartitioning") <= 1


def test_setsim_prefix_join_no_cartesian(spark):
    """Candidate generation joins prefix tables on the shingle rank —
    the plan must contain no cartesian/nested-loop product."""
    from pyrope_spark.operators.dedup import setsim_prefix_join

    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} alpha beta gamma tok{(i + 1) % 5}") for i in range(40)],
        "doc_id long, text string",
    )
    out = setsim_prefix_join(docs, n=2, t_num=7, t_den=10)
    out.collect()
    final = _final_plan(out)
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final


def test_item_item_cosine_single_pair_aggregate(spark):
    """The basket self-join aggregates pairs ONCE; the symmetric union must
    reuse the scored pair exchange, not recompute the self-join."""
    from pyrope_spark.operators.recommend import item_item_cosine_topk

    rows = [(i % 20, (i * 7) % 13) for i in range(300)]
    baskets = spark.createDataFrame(rows, "basket_id long, item_id long")
    out = item_item_cosine_topk(baskets, k=3)
    out.collect()
    final = _final_plan(out)
    assert "CartesianProduct" not in final
    # the mirrored union branch replays the scored pairs from the pair
    # aggregate's exchange instead of re-running the basket self-join
    assert "ReusedExchange" in final


def test_time_range_window_single_exchange(spark):
    """A RANGE-framed trailing window is ONE hash exchange on the
    partition key — no joins, no extra shuffles."""
    from pyspark.sql import Window as W

    rows = [(i, i % 11, i * 37 % 1000) for i in range(400)]
    src = spark.createDataFrame(rows, "id long, k long, ep long").withColumn(
        "vm", F.col("id") * 13
    )
    w = W.partitionBy("k").orderBy("ep").rangeBetween(-100, 0)
    out = src.select("id", F.sum("vm").over(w).alias("s"))
    out.collect()
    final = _final_plan(out)
    assert final.count("Exchange hashpartitioning") == 1
    assert "Join" not in final


def test_target_encode_broadcasts_global_scalars(spark):
    """The global-prior side is a broadcast of a 1-row aggregate — the
    fact table must not be shuffled for it."""
    from pyrope_spark.operators.curation import target_encode_loo

    rows = [(i, f"c{i % 13}", i % 2) for i in range(500)]
    df = spark.createDataFrame(rows, "event_id long, cat string, lbl int")
    out = target_encode_loo(df, cat_col="cat", label_col="lbl",
                            id_cols=("event_id",))
    out.collect()
    final = _final_plan(out)
    assert "BroadcastNestedLoopJoin" in final or "BroadcastExchange" in final
    assert "CartesianProduct" not in final


def test_global_rank_has_no_single_partition_exchange(spark):
    """The whole point of global_rank: exact global row_number WITHOUT the
    single-partition window stage. The executed plan must contain a range
    repartition and NO SinglePartition exchange / empty-frame Window."""
    from pyrope_spark.operators.curation import global_rank

    df = spark.createDataFrame(
        [(i * 13 % 97, i) for i in range(2000)], "v long, id long"
    ).repartition(8)
    out = global_rank(df, order_cols=("v", "id"))
    out.collect()
    final = _final_plan(out)
    # r7: driver-pinned splitters make _pid a deterministic expression;
    # the data moves through ONE hash exchange on _pid — no global sort,
    # no single-partition window, and no localCheckpoint materialization
    # (a checkpoint would swallow the MapInPandas lineage into an opaque
    # RDD scan, so its visibility proves the relation was never written)
    assert "hashpartitioning(_pid" in final
    assert "MapInPandas" in final
    assert "SinglePartition" not in final
    assert "Window" not in final


def test_attribution_join_is_keyed_not_cartesian(spark):
    """The touch-conversion association must plan as a keyed join on the
    user column (hash or sort-merge), never a cartesian/broadcast-nested-
    loop over the event table."""
    from pyrope_spark.operators.attribution import attribution_credit

    rows = [
        (i, i % 50, (i * 7919) % 100_000 * 1_000_000_000,
         ["view", "click", "purchase"][i % 3], 1.0)
        for i in range(3000)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_ns long, event_type string, value double"
    )
    out = attribution_credit(ev, lookback_s=86400)
    out.collect()
    final = _final_plan(out)
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final


def test_hashed_features_two_keyed_aggregates_no_join(spark):
    """Feature hashing is tokenize -> (doc, token) count -> (doc, bucket)
    sum: pure aggregates, no joins, no corpus-global state."""
    from pyrope_spark.operators.features import hashed_features

    docs = spark.createDataFrame(
        [(i, f"w{i % 11} w{(i * 3) % 11} common") for i in range(500)],
        "doc_id long, text string",
    )
    out = hashed_features(docs, dim=128)
    out.collect()
    final = _final_plan(out)
    assert "Join" not in final
    assert final.count("HashAggregate") >= 2


def test_frequent_triples_prunes_via_broadcast_semi_joins(spark, monkeypatch):
    """Small baskets take the r11 in-row expansion (no joins at all);
    baskets beyond FREQUENT_TRIPLES_INROW_MAX_ITEMS fall back to the
    Apriori join chain, whose prune tables must ride broadcasts — and
    both paths must produce identical triples."""
    from pyrope_spark.operators import analytics
    from pyrope_spark.operators.analytics import frequent_triples

    rows = [(b, (b * 7 + j) % 40) for b in range(400) for j in range(4)]
    df = spark.createDataFrame(rows, "bid long, item long")
    out = frequent_triples(df, basket_col="bid", item_col="item", min_support=3)
    inrow = sorted(map(tuple, out.collect()))
    final = _final_plan(out)
    assert "Join" not in final  # in-row path: aggregates only, no joins

    # force the fallback join path on the same data: values must match
    monkeypatch.setattr(analytics, "FREQUENT_TRIPLES_INROW_MAX_ITEMS", 0)
    out2 = frequent_triples(df, basket_col="bid", item_col="item", min_support=3)
    joined = sorted(map(tuple, out2.collect()))
    assert joined == inrow
    final2 = _final_plan(out2)
    assert "BroadcastHashJoin" in final2
    assert "LeftSemi" in final2


def test_linkpred_no_cartesian_and_keyed_wedges(spark):
    """The wedge self-join must be a keyed equi-join on the center node
    (never cartesian/BNLJ), and the candidate anti-join must stay keyed."""
    from pyrope_spark.operators.graph import link_prediction_ra

    e = spark.createDataFrame(
        [(i % 40, (i * 7) % 40) for i in range(300)], "src long, dst long"
    )
    out = link_prediction_ra(e, min_common=1, top_n=50)
    out.collect()
    final = _final_plan(out)
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final


def test_phrase_search_filters_terms_before_join(spark):
    """The postings side must be filtered to the phrase terms BEFORE the
    broadcast join — the plan's join inputs carry a term filter, and the
    phrase table rides a broadcast."""
    from pyrope_spark.operators.fulltext import phrase_search

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 3) for i in range(50)],
        "doc_id long, text string",
    )
    out = phrase_search(docs, phrase="beta gamma", k=5)
    out.collect()
    final = _final_plan(out)
    assert "BroadcastHashJoin" in final
    assert "CartesianProduct" not in final


def test_robust_scale_group_keyed_only(spark):
    """Every exchange partitions on the group key (plus the quartile
    broadcast) — no single-partition exchange, no global sort."""
    from pyrope_spark.operators.curation import robust_scale

    df = spark.createDataFrame(
        [(i, f"g{i % 5}", float(i % 97)) for i in range(400)],
        "event_id long, event_type string, value double",
    )
    out = robust_scale(
        df, group_col="event_type", value_col="value", id_col="event_id"
    )
    out.collect()
    final = _final_plan(out)
    assert "Exchange SinglePartition" not in final
    assert "BroadcastHashJoin" in final  # quartile table joins back broadcast


def test_interval_union_keyed_windows_no_joins(spark):
    """The sweep is two key-partitioned windows + one aggregate: no join
    of any kind, no single-partition exchange."""
    from pyrope_spark.operators.temporal import interval_union_coverage

    df = spark.createDataFrame(
        [(f"u{i % 20}", i, i + 5) for i in range(400)],
        "user_id string, start_s long, end_s long",
    )
    out = interval_union_coverage(df)
    out.collect()
    final = _final_plan(out)
    assert "Join" not in final
    assert "Exchange SinglePartition" not in final


def test_emd_fact_aggregated_once(spark):
    """The fact table is aggregated ONCE into the (key, bucket) histogram;
    the spine explode and cumulative windows run on histogram volume."""
    from pyrope_spark.operators.profile import emd_value_drift

    df = spark.createDataFrame(
        [(f"k{i % 3}", i % 2, float(i % 97)) for i in range(600)],
        "event_type string, half int, value double",
    )
    out = emd_value_drift(
        df, key_col="event_type", value_col="value", split_col="half",
        bucket_width=10,
    )
    out.collect()
    final = _final_plan(out)
    assert "CartesianProduct" not in final
    assert "Exchange SinglePartition" not in final


def test_cohort_ltv_window_on_grid_only(spark):
    """The cumulative window partitions on cohort_week (never a global
    window); the cohort-size join back is a broadcast."""
    from datetime import datetime

    from pyrope_spark.operators.analytics import cohort_ltv_curve

    df = spark.createDataFrame(
        [
            (f"u{i % 50}", datetime(2024, 1, 1 + (i % 21)), float(i % 9))
            for i in range(500)
        ],
        "user_id string, ts timestamp, value double",
    )
    out = cohort_ltv_curve(df)
    out.collect()
    final = _final_plan(out)
    assert "Exchange SinglePartition" not in final
    assert "BroadcastHashJoin" in final


# ------------------------------------------------- r7 session-2 perf fixes

def test_gapfill_no_unbounded_following_frame(spark):
    """Forward fills must ride the O(n) reverse-cumulative frame — an
    [currentRow, unboundedFollowing] frame is O(rows²) per key partition
    (UnboundedFollowingWindowFunctionFrame recomputes per row; the r7
    regression this pins cost 12 s of a 13 s query)."""
    from datetime import datetime, timedelta

    from pyrope_spark.operators.temporal import gapfill

    rows = [
        (i, datetime(2024, 1, 1) + timedelta(hours=3 * i), i % 5, 1.0 + i)
        for i in range(200)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = gapfill(ev, key_cols=["user_id"], bucket_s=3600, agg="avg")
    out.write.format("noop").mode("overwrite").save()
    plan = _final_plan(out)
    assert "unboundedfollowing$()" not in plan
    assert plan.count("Window") >= 1


def test_decontaminate_single_tokenize_pass(spark):
    """The train corpus must be tokenized ONCE: exactly one Generate
    (explode) over the train grams and one over the (broadcast) bench
    grams — the two-branch form re-ran the ngram HOFs over the whole
    corpus (12.9 s -> 1.4 s)."""
    from pyrope_spark.operators.curation import decontaminate

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon " + f"w{i % 11}")
         for i in range(300)],
        "doc_id long, text string",
    )
    out = decontaminate(
        docs.filter(F.col("doc_id") >= 30),
        docs.filter(F.col("doc_id") < 30),
        ngram_n=3,
        impl="expr",
    )
    out.write.format("noop").mode("overwrite").save()
    plan = _final_plan(out)
    assert plan.count("Generate explode") == 2  # train once + bench once
    assert "BroadcastHashJoin" in plan
    # the r11 arrow default replaces the HOF gram build with the
    # gram_rows kernel: one MapInPandas per side, still broadcast-joined,
    # still a single pass over the train corpus
    out_a = decontaminate(
        docs.filter(F.col("doc_id") >= 30),
        docs.filter(F.col("doc_id") < 30),
        ngram_n=3,
    )
    out_a.write.format("noop").mode("overwrite").save()
    plan_a = _final_plan(out_a)
    assert plan_a.count("MapInPandas") == 2  # train once + bench once
    assert "BroadcastHashJoin" in plan_a
    assert "BatchEvalPython" not in plan_a


def test_decontaminate_keeps_zero_gram_docs(spark):
    """A doc too short for any n-gram must still appear with
    (0, 0, false) — explode (non-outer) would drop it."""
    from pyrope_spark.operators.curation import decontaminate

    train = spark.createDataFrame(
        [(1, "only two"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma delta")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in decontaminate(train, bench, ngram_n=4).collect()}
    assert out[1].n_ngrams == 0 and out[1].n_contaminated == 0
    assert not out[1].contaminated
    assert out[2].contaminated


def test_fd_discovery_melt_is_rebalanced(spark):
    """The k(k-1)-fold melt must not run inside the input's scan stage:
    a compact single-partition input serializes the sweep. The operator
    round-robins narrow rows first when the input has fewer partitions
    than spark.sql.shuffle.partitions."""
    from pyrope_spark.operators.profile import fd_discovery_matrix

    df = spark.createDataFrame(
        [(i, i % 7, i % 3) for i in range(1000)], "a long, b long, c long"
    ).coalesce(1)
    out = fd_discovery_matrix(df, ["a", "b", "c"])
    out.write.format("noop").mode("overwrite").save()
    plan = _final_plan(out)
    assert "RoundRobinPartitioning" in plan
    # no countDistinct Expand: two plain aggregate levels instead
    assert "Expand" not in plan


def test_source_shingle_overlap_reuses_persisted_fps(spark):
    """The (group, fp) distinct feeds three consumers; the plan must
    read it from the persisted InMemoryRelation, not re-derive the
    tokenize+explode pipeline per consumer (194 s -> 28 s at 1M docs)."""
    from pyrope_spark.operators.dedup import source_shingle_overlap

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", "alpha beta gamma delta " + f"w{i % 13}")
         for i in range(200)],
        "doc_id long, source string, text string",
    )
    out = source_shingle_overlap(docs)
    plan = _final_plan(out)
    # localCheckpoint output: the result is pairs-sized and already
    # materialized; the lineage must show the checkpoint, not three
    # Generate explodes
    assert "Generate explode" not in plan
    assert out.count() == 3  # C(3,2) source pairs
