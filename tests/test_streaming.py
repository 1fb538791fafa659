from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from pyrope_spark.store import VectorStore


def test_stream_upsert_to_store(spark, tmp_path):
    """Micro-batch ingest lands in the head table with upsert semantics and
    searches see it (the reference's RESP write path as a stream)."""
    from pyrope_spark.streaming import stream_upsert_to_store

    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    store = VectorStore(spark, str(tmp_path / "store"))

    schema = (
        "tenant_id string, index_name string, id string, vector array<float>, "
        "meta string, tags array<string>"
    )
    batch1 = spark.createDataFrame(
        [("t", "i", "a", [1.0, 0.0], None, []), ("t", "i", "b", [0.0, 1.0], None, [])],
        schema,
    )
    batch1.write.mode("append").parquet(str(src_dir))

    stream = spark.readStream.schema(batch1.schema).parquet(str(src_dir))
    q = stream_upsert_to_store(
        stream, store, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        assert store.count("t", "i") == 2
        # second batch upserts an existing id
        spark.createDataFrame([("t", "i", "a", [5.0, 5.0], None, [])], schema).write.mode(
            "append"
        ).parquet(str(src_dir))
        q.processAllAvailable()
        snap = {r["id"]: r["vector"] for r in store.live("t", "i").collect()}
        assert snap["a"][0] == 5.0
        assert store.count("t", "i") == 2
    finally:
        q.stop()


def test_streaming_qps_quota(spark, tmp_path):
    """G1 as a stateful streaming op: 1-second window counters per tenant
    with over-limit flags (TenantQuotaEnforcer.cs:137-158)."""
    from datetime import datetime, timedelta

    from pyrope_spark.streaming.quota import streaming_qps_quota

    src_dir = tmp_path / "reqs"
    src_dir.mkdir()
    base = datetime(2024, 1, 1, 0, 0, 0)
    rows = [("t1", base + timedelta(milliseconds=100 * i)) for i in range(12)]  # 10 in s0, 2 in s1
    rows += [("t2", base, )]
    df = spark.createDataFrame(rows, "tenant_id string, ts timestamp")
    df.write.mode("append").parquet(str(src_dir))

    stream = spark.readStream.schema(df.schema).parquet(str(src_dir))
    out = streaming_qps_quota(stream, max_qps=5)
    q = (
        out.writeStream.outputMode("append").format("memory").queryName("quota_out").start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["tenant_id"], r["window_s"]): (r["requests"], r["over_limit"])
            for r in spark.sql("SELECT * FROM quota_out").collect()
        }
        s0 = int(base.timestamp())
        assert got[("t1", s0)] == (10, True)      # 10 > 5 in second 0
        assert got[("t1", s0 + 1)] == (2, False)
        assert got[("t2", s0)] == (1, False)
    finally:
        q.stop()


def test_streaming_write_heat(spark, tmp_path):
    from datetime import datetime, timedelta

    from pyrope_spark.streaming import streaming_write_heat

    src_dir = tmp_path / "writes"
    src_dir.mkdir()
    base = datetime(2024, 1, 1)
    rows = [(base + timedelta(seconds=i), 7) for i in range(12)]
    df = spark.createDataFrame(rows, "ts timestamp, cluster_id int")
    df.write.mode("append").parquet(str(src_dir))

    stream = spark.readStream.schema(df.schema).parquet(str(src_dir))
    hot = streaming_write_heat(stream, threshold=10)
    q = (
        hot.writeStream.outputMode("complete")
        .format("memory")
        .queryName("heat_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM heat_out").collect()
        assert [(r["cluster_id"], r["writes"]) for r in got] == [(7, 12)]
    finally:
        q.stop()


def test_streaming_latency_slo(spark, tmp_path):
    """Windowed histogram-p99 SLO check as a standing streaming agg: a
    window whose p99 bucket bound exceeds the SLO is flagged."""
    from datetime import datetime, timedelta

    from pyrope_spark.streaming import streaming_latency_slo

    src_dir = tmp_path / "lat"
    src_dir.mkdir()
    base = datetime(2024, 1, 1)
    rows = [(base + timedelta(seconds=i % 50), "search", 2.0) for i in range(98)]
    # 2% slow: cumulative share stays below 0.99 until the >=100ms bucket
    rows += [(base + timedelta(seconds=3), "search", 500.0)] * 2
    rows += [(base + timedelta(seconds=70, milliseconds=i), "search", 2.0) for i in range(50)]
    df = spark.createDataFrame(rows, "ts timestamp, route string, latency_ms double")
    df.write.mode("append").parquet(str(src_dir))

    stream = spark.readStream.schema(df.schema).parquet(str(src_dir))
    slo = streaming_latency_slo(
        stream, group_cols=["route"], window_s=60, slo_p99_ms=100.0
    )
    q = (
        slo.writeStream.outputMode("complete")
        .format("memory")
        .queryName("slo_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["window_start"].minute: (r["samples"], r["p99_est_ms"], r["over_slo"])
            for r in spark.sql("SELECT * FROM slo_out").collect()
        }
        # window 0: 100 samples, one 500ms outlier puts the 99th pct in the
        # >=100ms bucket -> over SLO; window 1: all fast -> under
        assert got[0][0] == 100 and got[0][2] is True
        assert got[1][0] == 50 and got[1][2] is False
    finally:
        q.stop()


def test_streaming_concurrency_leases(spark, tmp_path):
    """G2: begin events beyond the concurrency limit are denied BUSY until
    an end event releases a lease (reference TenantQuotaEnforcer.cs:50-90)."""
    from datetime import datetime, timedelta

    from pyrope_spark.streaming.quota import streaming_concurrency_leases

    src_dir = tmp_path / "leases"
    src_dir.mkdir()
    base = datetime(2024, 1, 1)
    rows = [
        ("t1", "r1", base + timedelta(seconds=1), "begin"),
        ("t1", "r2", base + timedelta(seconds=2), "begin"),
        ("t1", "r3", base + timedelta(seconds=3), "begin"),   # over limit 2 -> BUSY
        ("t1", "r1", base + timedelta(seconds=4), "end"),
        ("t1", "r4", base + timedelta(seconds=5), "begin"),   # freed slot -> granted
        ("t2", "r5", base + timedelta(seconds=1), "begin"),   # other tenant isolated
    ]
    df = spark.createDataFrame(
        rows, "tenant_id string, request_id string, ts timestamp, event string"
    )
    df.write.mode("append").parquet(str(src_dir))
    stream = spark.readStream.schema(df.schema).parquet(str(src_dir))
    out = streaming_concurrency_leases(stream, max_concurrent=2)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("lease_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["tenant_id"], r["request_id"], r["event"]): (r["granted"], r["error_code"])
            for r in spark.sql("SELECT * FROM lease_out").collect()
        }
        assert got[("t1", "r1", "begin")] == (True, None)
        assert got[("t1", "r2", "begin")] == (True, None)
        assert got[("t1", "r3", "begin")] == (False, "BUSY")
        assert got[("t1", "r4", "begin")] == (True, None)
        assert got[("t2", "r5", "begin")] == (True, None)
    finally:
        q.stop()


def test_streaming_leases_denied_end_does_not_release(spark, tmp_path):
    """An 'end' for a request whose 'begin' was denied must NOT free a slot
    (reference: only a lease created by a successful TryEnterConcurrent can
    release, TenantQuotaEnforcer.cs:162-185). Also: duplicate begins,
    unknown-request ends, and unrecognized events leave state untouched."""
    from datetime import datetime, timedelta

    from pyrope_spark.streaming.quota import streaming_concurrency_leases

    src_dir = tmp_path / "leases2"
    src_dir.mkdir()
    base = datetime(2024, 1, 1)
    rows = [
        ("t1", "r1", base + timedelta(seconds=1), "begin"),
        ("t1", "r2", base + timedelta(seconds=2), "begin"),
        ("t1", "r3", base + timedelta(seconds=3), "begin"),   # denied BUSY
        ("t1", "r3", base + timedelta(seconds=4), "end"),     # no lease -> no-op
        ("t1", "r9", base + timedelta(seconds=5), "end"),     # never began -> no-op
        ("t1", "r1", base + timedelta(seconds=6), "begin"),   # dup live lease
        ("t1", "r2", base + timedelta(seconds=7), "ping"),    # unknown event
        ("t1", "r4", base + timedelta(seconds=8), "begin"),   # still full -> BUSY
        ("t1", "r1", base + timedelta(seconds=9), "end"),     # real release
        ("t1", "r5", base + timedelta(seconds=10), "begin"),  # freed -> granted
    ]
    df = spark.createDataFrame(
        rows, "tenant_id string, request_id string, ts timestamp, event string"
    )
    df.write.mode("append").parquet(str(src_dir))
    stream = spark.readStream.schema(df.schema).parquet(str(src_dir))
    out = streaming_concurrency_leases(stream, max_concurrent=2)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("lease_out2")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["request_id"], r["event"]): (r["granted"], r["active"], r["error_code"])
            for r in spark.sql("SELECT * FROM lease_out2").collect()
        }
        assert got[("r3", "begin")] == (False, 2, "BUSY")
        assert got[("r3", "end")] == (False, 2, "NO_LEASE")
        assert got[("r9", "end")] == (False, 2, "NO_LEASE")
        assert got[("r1", "begin")] == (False, 2, "DUPLICATE")
        assert got[("r2", "ping")] == (False, 2, "UNKNOWN_EVENT")
        # the key assertion: r1+r2 still hold both leases, so r4 is denied
        assert got[("r4", "begin")] == (False, 2, "BUSY")
        assert got[("r1", "end")] == (True, 1, None)
        assert got[("r5", "begin")] == (True, 2, None)
    finally:
        q.stop()


def test_streaming_dedup_to_corpus(spark, tmp_path):
    """Ingest-time dedup: in-batch, cross-batch, and vs already-accepted
    corpus docs — only first-seen fingerprints land in the corpus."""
    from datetime import datetime, timedelta

    from pyrope_spark.streaming import streaming_dedup_to_corpus

    src_dir = tmp_path / "docs_in"
    src_dir.mkdir()
    corpus = str(tmp_path / "corpus")
    base = datetime(2024, 1, 1)
    schema = "doc_id long, text string, ts timestamp"

    b1 = spark.createDataFrame(
        [
            (1, "alpha beta", base),
            (2, "alpha beta", base + timedelta(seconds=1)),  # in-batch dup
            (3, "gamma", base + timedelta(seconds=2)),
        ],
        schema,
    )
    b1.write.mode("append").parquet(str(src_dir))
    stream = spark.readStream.schema(b1.schema).parquet(str(src_dir))
    q = streaming_dedup_to_corpus(
        stream, corpus, str(tmp_path / "ckpt_dedup")
    )
    try:
        q.processAllAvailable()
        got1 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
        assert len(got1) == 2 and 3 in got1 and (1 in got1 or 2 in got1)
        # batch 2: dup of accepted doc (vs corpus), plus a new one
        spark.createDataFrame(
            [
                (4, "  ALPHA BETA ", base + timedelta(seconds=3)),  # normalized dup
                (5, "delta", base + timedelta(seconds=4)),
            ],
            schema,
        ).write.mode("append").parquet(str(src_dir))
        q.processAllAvailable()
        rows = spark.read.parquet(corpus).collect()
        ids = {r["doc_id"] for r in rows}
        assert 5 in ids and 4 not in ids
        assert len(rows) == 3
        fps = [r["fp"] for r in rows]
        assert len(set(fps)) == 3
    finally:
        q.stop()


def test_streaming_sessionize_gap_merge_and_late_drop(spark, tmp_path):
    """session_window merges events within the gap into one session, splits
    across the gap, and finalizes sessions once the watermark passes; a row
    older than the watermark is dropped by the engine."""
    from datetime import datetime, timedelta

    from pyrope_spark.streaming.ingest import streaming_sessionize

    src = tmp_path / "sess_src"
    src.mkdir()
    schema = "user_id string, ts timestamp, value double"
    base = datetime(2026, 1, 1, 12, 0, 0)

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    # session A: two events 10 min apart (same session at 30-min gap);
    # u2: one event
    write([
        ("u1", base, 1.0),
        ("u1", base + timedelta(minutes=10), 2.0),
        ("u2", base, 5.0),
    ])
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = streaming_sessionize(
        stream, gap_s=1800, watermark="30 minutes",
        agg_cols={"sum_value": F.sum("value")},
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # nothing finalized yet (watermark at max_ts - 30min < session ends)
        # now: an event 2 hours later closes u1/u2 sessions via watermark,
        # plus a LATE event from before the watermark that must be dropped
        write([
            ("u1", base + timedelta(hours=2), 3.0),
        ])
        q.processAllAvailable()
        write([
            ("u3", base - timedelta(hours=1), 9.0),  # far behind watermark
            ("u1", base + timedelta(hours=2, minutes=5), 4.0),
        ])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sess_out").collect()
        done = {(r["user_id"], r["session_start"].isoformat()): r for r in rows}
        # u1's first session: 2 events, 40-min span (end = last + gap)
        u1 = done[("u1", base.isoformat())]
        assert u1["n_events"] == 2 and u1["sum_value"] == 3.0
        assert u1["session_end"] == base + timedelta(minutes=40)
        u2 = done[("u2", base.isoformat())]
        assert u2["n_events"] == 1 and u2["sum_value"] == 5.0
        # the late u3 row was dropped: no u3 session ever appears
        assert not any(r["user_id"] == "u3" for r in rows)
    finally:
        q.stop()


def test_streaming_hll_update_matches_full_build(spark, tmp_path):
    """Two micro-batches folded into the register state == one batch build
    over all keys (the lossless-merge property, streamed)."""
    from pyrope_spark.operators.sketch import hll_build, hll_estimate
    from pyrope_spark.streaming.sketches import streaming_hll_update

    src = tmp_path / "hll_src"
    state = str(tmp_path / "hll_state")
    schema = "grp string, key string"
    b1 = spark.createDataFrame([("g", f"k{i}") for i in range(200)], schema)
    b1.write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(b1.schema).parquet(str(src))
    q = streaming_hll_update(
        stream, state, key_col="key", group_cols=("grp",), p=8,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        b2 = spark.createDataFrame(
            [("g", f"k{i}") for i in range(150, 400)], schema
        )
        b2.write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r["grp"], r["bucket"], r["rho"])
        for r in spark.read.parquet(state).collect()
    )
    full = hll_build(b1.unionByName(b2), "key", group_cols=("grp",), p=8)
    want = sorted((r["grp"], r["bucket"], r["rho"]) for r in full.collect())
    assert got == want
    est = hll_estimate(
        spark.read.parquet(state), group_cols=("grp",), p=8
    ).collect()[0]
    assert abs(est["est_distinct"] - 400) / 400 < 0.25


def test_streaming_attribution_join_window(spark, tmp_path):
    """Clicks match impressions of the same user within the window; a
    click outside the window does not match."""
    from pyspark.sql import functions as F

    from pyrope_spark.streaming.sketches import streaming_attribution_join

    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    ischema = "user_id long, ts timestamp, ad string"
    cschema = "user_id long, ts timestamp, item string"
    t0 = "2026-01-01 10:00:00"
    imps = spark.createDataFrame(
        [
            (1, t0, "adA"),
            (2, "2026-01-01 10:01:00", "adB"),
            (3, "2026-01-01 10:00:00", "adC"),
        ],
        "user_id long, ts string, ad string",
    ).select(F.col("user_id"), F.col("ts").cast("timestamp"), "ad")
    clks = spark.createDataFrame(
        [
            (1, "2026-01-01 10:05:00", "x"),   # in window (300s after)
            (2, "2026-01-01 10:20:00", "y"),   # out of window (>600s)
            (4, "2026-01-01 10:02:00", "z"),   # no impression
        ],
        "user_id long, ts string, item string",
    ).select(F.col("user_id"), F.col("ts").cast("timestamp"), "item")
    imps.write.parquet(str(imp_dir))
    clks.write.parquet(str(clk_dir))

    imp_s = spark.readStream.schema(imps.schema).parquet(str(imp_dir))
    clk_s = spark.readStream.schema(clks.schema).parquet(str(clk_dir))
    joined = streaming_attribution_join(
        imp_s, clk_s, window_s=600, imp_cols=("ad",), click_cols=("item",)
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_out")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from attr_out").collect()
    finally:
        q.stop()
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 1 and r["imp_ad"] == "adA" and r["click_item"] == "x"


def test_streaming_bottomk_update_matches_full(spark, tmp_path):
    from pyrope_spark.operators.sketch import bottomk_sample
    from pyrope_spark.streaming.sketches import streaming_bottomk_update

    src = tmp_path / "bk_src"
    state = str(tmp_path / "bk_state")
    schema = "id long, value double"
    b1 = spark.createDataFrame([(i, float(i)) for i in range(300)], schema)
    b1.write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(b1.schema).parquet(str(src))
    q = streaming_bottomk_update(
        stream, state, 40, id_col="id", keep_cols=("value",),
        checkpoint_dir=str(tmp_path / "bk_ckpt"),
    )
    try:
        q.processAllAvailable()
        b2 = spark.createDataFrame(
            [(i, float(i)) for i in range(300, 700)], schema
        )
        b2.write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["_bk_id"], r["value"]) for r in spark.read.parquet(state).collect()
    )
    want = sorted(
        (r["_bk_id"], r["value"])
        for r in bottomk_sample(
            b1.unionByName(b2), 40, id_col="id", keep_cols=("value",)
        ).collect()
    )
    assert got == want and len(got) == 40


def test_streaming_cms_update_matches_full(spark, tmp_path):
    from pyrope_spark.operators.sketch import cms_build
    from pyrope_spark.streaming.sketches import streaming_cms_update

    src = tmp_path / "cms_src"
    state = str(tmp_path / "cms_state")
    schema = "doc_id long, text string"
    b1 = spark.createDataFrame(
        [(i, "apple banana") for i in range(50)], schema
    )
    b1.write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(b1.schema).parquet(str(src))
    q = streaming_cms_update(
        stream, state, checkpoint_dir=str(tmp_path / "cms_ckpt")
    )
    try:
        q.processAllAvailable()
        b2 = spark.createDataFrame(
            [(100 + i, "banana cherry") for i in range(30)], schema
        )
        b2.write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["d"], r["bucket"], r["cnt"])
        for r in spark.read.parquet(state).collect()
    )
    want = sorted(
        (r["d"], r["bucket"], r["cnt"])
        for r in cms_build(b1.unionByName(b2)).collect()
    )
    assert got == want


def test_streaming_neardup_to_corpus(spark, tmp_path):
    """Near-dups drop at ingest: vs earlier batches (index join) and
    in-flight (smaller id wins); distinct docs pass."""
    from pyspark.sql import functions as F

    from pyrope_spark.streaming.curation import streaming_neardup_to_corpus

    src = tmp_path / "nd_src"
    corpus = str(tmp_path / "nd_corpus")
    index = str(tmp_path / "nd_index")
    schema = "doc_id long, text string, ts timestamp"
    base = "alpha beta gamma delta epsilon zeta eta theta"
    t0 = "2026-01-01 00:00:00"

    def df(rows):
        return spark.createDataFrame(
            [(i, t, t0) for i, t in rows], "doc_id long, text string, ts string"
        ).select("doc_id", "text", F.col("ts").cast("timestamp"))

    # coalesce(1): each logical batch must land as ONE file — a
    # multi-file write can straddle two micro-batches under load, and
    # then the in-flight smaller-id-wins assertion races arrival order
    # (12 accepted first -> 11 drops as its dup; one representative
    # still survives, but not the one this test pins)
    b1 = df([(1, base), (2, "one two three four five six seven eight")])
    b1.coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(df([(0, "x")]).schema).parquet(str(src))
    q = streaming_neardup_to_corpus(
        stream, corpus, index, str(tmp_path / "nd_ckpt"),
    )
    try:
        q.processAllAvailable()
        b2 = df([
            (10, base + " iota"),                      # near-dup of accepted 1
            (11, "cat dog bird fish mouse horse cow hen"),   # new
            (12, "cat dog bird fish mouse horse cow pig"),   # in-flight near-dup of 11
        ])
        b2.coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()
    ids = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert ids == [1, 2, 11]


def test_streaming_ewma_state_across_batches(spark, tmp_path):
    """The smoothed value carries across micro-batches (one double of state
    per key) and matches the hand recurrence; deviation flag fires against
    the PRIOR baseline."""
    from pyspark.sql import functions as F

    from pyrope_spark.streaming.sketches import streaming_ewma

    src = tmp_path / "ewma_src"
    schema = "user_id long, ts timestamp, value double"

    def df(rows):
        return spark.createDataFrame(
            [(u, t, v) for u, t, v in rows], "user_id long, ts string, value double"
        ).select("user_id", F.col("ts").cast("timestamp"), "value")

    b1 = df([(1, "2026-01-01 00:00:00", 10.0), (1, "2026-01-01 00:01:00", 20.0)])
    b1.write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(b1.schema).parquet(str(src))
    q = (
        streaming_ewma(stream, 0.5, deviation_threshold=50.0)
        .writeStream.outputMode("append").format("memory")
        .queryName("ewma_out")
        .option("checkpointLocation", str(tmp_path / "ewma_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        df([(1, "2026-01-01 00:02:00", 100.0)]).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        rows = {
            r["ts_us"]: r for r in spark.sql("select * from ewma_out").collect()
        }
    finally:
        q.stop()
    vals = [rows[k] for k in sorted(rows)]
    assert [v["ewma"] for v in vals] == [10.0, 15.0, 57.5]  # state crossed batches
    assert [v["deviates"] for v in vals] == [False, False, True]  # |100-15|>50


def test_streaming_agg_view_matches_batch_rebuild(spark, tmp_path):
    """Micro-batched changelog folds (with retractions) == one-shot batch
    build over all rows, bit-identical decimals — the batch/streaming
    audit-each-other property."""
    from pyrope_spark.operators.maintenance import build_agg_view
    from pyrope_spark.streaming.sketches import streaming_agg_view_maintain

    src = tmp_path / "cl_src"
    state = str(tmp_path / "cl_state")
    schema = "k long, g string, value double, op int"
    b1 = spark.createDataFrame(
        [(i % 7, "a" if i % 2 else "b", float(i) / 4, 1) for i in range(80)],
        schema,
    )
    b1.write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(b1.schema).parquet(str(src))
    q = streaming_agg_view_maintain(
        stream, state, keys=["k", "g"], op_col="op",
        checkpoint_dir=str(tmp_path / "cl_ckpt"),
    )
    try:
        q.processAllAvailable()
        # batch 2 retracts half of batch 1 and adds new keys
        b2 = spark.createDataFrame(
            [(i % 7, "a" if i % 2 else "b", float(i) / 4, -1)
             for i in range(0, 80, 2)]
            + [(100, "z", 5.5, 1), (100, "z", 4.5, 1)],
            schema,
        )
        b2.write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["k"], r["g"]): (r["n"], r["sum_value"])
        for r in spark.read.parquet(state).collect()
    }
    full = build_agg_view(
        b1.unionByName(b2), keys=["k", "g"], op_col="op"
    ).filter(F.col("n") > 0)
    want = {(r["k"], r["g"]): (r["n"], r["sum_value"])
            for r in full.collect()}
    assert got == want
    assert got[(100, "z")][0] == 2


def test_streaming_quarantine_sink_routes_dlq(spark, tmp_path):
    """Mixed clean/corrupt JSON stream: clean rows land parsed, corrupt
    rows land in the DLQ with raw payload + batch id; counts sum to the
    input (nothing dropped)."""
    import json as _json

    from pyrope_spark.streaming.ingest import streaming_quarantine_sink

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"id": 1, "payload": _json.dumps({"k": 10, "device": "a"})},
        {"id": 2, "payload": "{not json"},
        {"id": 3, "payload": _json.dumps({"k": 30, "device": "c"})},
        {"id": 4, "payload": "also broken}"},
    ]
    with open(src / "batch.json", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema("id long, payload string")
        .json(str(src))
    )
    q = streaming_quarantine_sink(
        stream,
        "payload",
        "k INT, device STRING",
        str(tmp_path / "clean"),
        str(tmp_path / "dlq"),
        str(tmp_path / "ckpt"),
    ).start()
    q.awaitTermination(120)
    clean = spark.read.parquet(str(tmp_path / "clean"))
    dlq = spark.read.parquet(str(tmp_path / "dlq"))
    assert clean.count() + dlq.count() == 4
    got = {r["id"]: r for r in clean.collect()}
    assert set(got) == {1, 3} and got[1]["k"] == 10 and got[3]["device"] == "c"
    bad = {r["id"]: r for r in dlq.collect()}
    assert set(bad) == {2, 4}
    assert bad[2]["payload"] == "{not json"          # raw payload preserved
    assert bad[2]["dlq_batch_id"] is not None


def test_streaming_histogram_drift_folds_and_scores(spark, tmp_path):
    """Two micro-batches fold into exactly the one-shot histogram; the
    drift table flags the key whose stream shifted off its baseline and
    clears the stationary key."""
    import json as _json

    from pyspark.sql import functions as F

    from pyrope_spark.streaming.sketches import streaming_histogram_drift

    # baseline: 'a' uniform low, 'b' uniform low
    base_rows = [("a", 0.1 * (i % 5)) for i in range(50)]
    base_rows += [("b", 0.1 * (i % 5)) for i in range(50)]
    baseline = spark.createDataFrame(base_rows, "k string, value double")

    src = tmp_path / "src"
    src.mkdir()
    # stream: 'a' stays low (no drift), 'b' jumps high (full drift)
    for bi in range(2):
        with open(src / f"b{bi}.json", "w") as f:
            for i in range(25):
                f.write(_json.dumps({"k": "a", "value": 0.1 * (i % 5)}) + "\n")
                f.write(_json.dumps({"k": "b", "value": 0.9}) + "\n")
    stream = spark.readStream.schema("k string, value double").json(str(src))
    q = streaming_histogram_drift(
        stream,
        str(tmp_path / "state"),
        baseline,
        key_col="k",
        value_col="value",
        vmin=0,
        vmax=1_000_000,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(120)

    state = spark.read.parquet(str(tmp_path / "state"))
    # fold parity: state == one-shot histogram over all streamed rows
    allrows = spark.read.schema("k string, value double").json(str(src))
    from pyrope_spark.streaming.sketches import _hist_bin

    direct = (
        allrows.select("k", _hist_bin("value", 10, 0, 1_000_000, 1_000_000).alias("bin"))
        .groupBy("k", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    assert sorted(map(tuple, state.collect())) == sorted(
        map(tuple, direct.collect())
    )

    drift = {
        r["k"]: r["l1_drift_ppm"]
        for r in spark.read.parquet(str(tmp_path / "state.drift")).collect()
    }
    assert drift["a"] == 0
    assert drift["b"] == 2_000_000  # disjoint supports -> full mass moved


def test_streaming_histogram_drift_replay_repairs_drift_table(
    spark, tmp_path
):
    """Crash window between the state swap and the drift write: the
    state already includes the batch but {state_dir}.drift is stale or
    missing.  The same-stream replay skips the state merge yet still
    recomputes the drift table from the committed state (r8 ADVICE) —
    the old early-return left it behind until a later live batch."""
    import json as _json
    import os
    import shutil

    from pyrope_spark.streaming.sketches import streaming_histogram_drift

    baseline = spark.createDataFrame(
        [("a", 0.1 * (i % 5)) for i in range(50)], "k string, value double"
    )
    src = tmp_path / "hdr_src"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for _ in range(25):
            f.write(_json.dumps({"k": "a", "value": 0.9}) + "\n")
    state = str(tmp_path / "hdr_state")
    ckpt = str(tmp_path / "hdr_ckpt")

    def run() -> None:
        stream = (
            spark.readStream.schema("k string, value double").json(str(src))
        )
        q = streaming_histogram_drift(
            stream, state, baseline, key_col="k", value_col="value",
            vmin=0, vmax=1_000_000, checkpoint_dir=ckpt, trigger_once=True,
        )
        q.awaitTermination(120)

    run()
    want = sorted(
        map(tuple, spark.read.parquet(state + ".drift").collect())
    )
    # crash simulation: state swapped + marker stamped, but the drift
    # write and the checkpoint commit were both lost
    shutil.rmtree(state + ".drift")
    os.remove(os.path.join(ckpt, "commits", "0"))
    _crc = os.path.join(ckpt, "commits", ".0.crc")
    if os.path.exists(_crc):
        os.remove(_crc)
    run()
    got = sorted(map(tuple, spark.read.parquet(state + ".drift").collect()))
    assert got == want  # repaired on the skipped replay, batch_id intact


def test_streaming_holt_state_and_trend_aware_surprise(spark, tmp_path):
    """(level, trend) carries across micro-batches and matches the hand
    recurrence; the surprise flag compares against the PRIOR forecast
    l + b, so a steadily trending series does NOT alarm where a plain
    ewma baseline would."""
    from pyspark.sql import functions as F

    from pyrope_spark.streaming.sketches import streaming_holt

    src = tmp_path / "holt_src"

    def df(rows):
        return spark.createDataFrame(
            [(u, t, v) for u, t, v in rows],
            "user_id long, ts string, value double",
        ).select("user_id", F.col("ts").cast("timestamp"), "value")

    # alpha=beta=0.5; x = 10, 20, 30 -> l,b: (10,0), (15,2.5), (23.75,5.625)
    b1 = df([(1, "2026-01-01 00:00:00", 10.0), (1, "2026-01-01 00:01:00", 20.0)])
    b1.write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(b1.schema).parquet(str(src))
    q = (
        streaming_holt(stream, 0.5, 0.5, surprise_threshold=15.0)
        .writeStream.outputMode("append").format("memory")
        .queryName("holt_out")
        .option("checkpointLocation", str(tmp_path / "holt_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        df([(1, "2026-01-01 00:02:00", 30.0),
            (1, "2026-01-01 00:03:00", 100.0)]).write.mode("append").parquet(
            str(src)
        )
        q.processAllAvailable()
        rows = {
            r["ts_us"]: r for r in spark.sql("select * from holt_out").collect()
        }
    finally:
        q.stop()
    vals = [rows[k] for k in sorted(rows)]
    assert [v["level"] for v in vals][:3] == [10.0, 15.0, 23.75]
    assert [v["trend"] for v in vals][:3] == [0.0, 2.5, 5.625]
    # forecasts: None, 10.0 (l+b prior), 17.5, 29.375
    assert vals[0]["forecast"] is None
    assert [v["forecast"] for v in vals][1:] == [10.0, 17.5, 29.375]
    # x=30 vs forecast 17.5 -> |12.5| <= 15, no alarm (trend absorbed);
    # x=100 vs forecast 29.375 -> alarm
    assert [v["surprised"] for v in vals] == [False, False, False, True]


def test_streaming_debounce_matches_batch_and_carries_state(spark, tmp_path):
    """Survivors across two micro-batches equal the batch operator's on the
    union, including a burst that SPANS the batch boundary (state carries
    the last-seen ts); n_suppressed_before streams the closed burst's
    suppressed tail when the next burst opens."""
    from pyrope_spark.operators.temporal import debounce_events
    from pyrope_spark.streaming.sketches import streaming_debounce

    S = 1_000_000_000
    src = tmp_path / "deb_src"
    src.mkdir()
    schema = "event_id long, user_id long, ts_ns long, event_type string, value double"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    batch1 = [
        (1, 1, 0 * S, "click", 0.0),
        (2, 1, 100 * S, "click", 0.0),   # suppressed
    ]
    batch2 = [
        (3, 1, 350 * S, "click", 0.0),   # 250s after #2: SAME burst (state)
        (4, 1, 1000 * S, "click", 0.0),  # new burst; closes burst 0 (supp 2)
        (5, 2, 0 * S, "click", 0.0),     # other key: its own state
    ]
    write(batch1)
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = streaming_debounce(stream, gap_s=300)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("deb_out")
        .option("checkpointLocation", str(tmp_path / "deb_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        write(batch2)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM deb_out").collect()
    finally:
        q.stop()
    survivors = {(int(r["user_id"]), r["event_id"]): r for r in rows}
    assert set(survivors) == {(1, 1), (1, 4), (2, 5)}
    # the burst-spanning state: event 3 was suppressed (250s gap), so the
    # burst that closed when #4 arrived had 2 suppressed events
    assert survivors[(1, 4)]["n_suppressed_before"] == 2

    # batch parity on the union: same survivor set
    union = spark.createDataFrame(batch1 + batch2, schema)
    batch_out = debounce_events(union, gap_s=300).collect()
    assert {(r["user_id"], r["event_id"]) for r in batch_out} == {
        (1, 1), (1, 4), (2, 5)
    }
    by = {(r["user_id"], r["burst_id"]): r for r in batch_out}
    assert by[(1, 0)]["n_suppressed"] == 2


def test_streaming_interval_coverage_cross_batch(spark, tmp_path):
    """Online active-time accumulation: overlap merged within a batch,
    a segment left OPEN across the batch boundary extends in the next
    batch, and totals equal the batch operator on the unioned input."""
    from pyrope_spark.operators.temporal import interval_union_coverage
    from pyrope_spark.streaming.sketches import streaming_interval_coverage

    src_dir = tmp_path / "iv_in"
    src_dir.mkdir()
    schema = "user_id string, start_s long, end_s long"

    b1 = spark.createDataFrame(
        [("u1", 0, 10), ("u1", 5, 20), ("u2", 100, 110)], schema
    )
    b1.write.mode("append").parquet(str(src_dir))
    stream = spark.readStream.schema(b1.schema).parquet(str(src_dir))
    q = (
        streaming_interval_coverage(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("iv_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_iv"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.user_id: r
            for r in spark.sql("select * from iv_out").collect()
        }
        assert got["u1"].covered_s == 20 and got["u1"].n_segments == 1
        assert got["u2"].covered_s == 10
        # batch 2: u1 extends the OPEN segment (15 <= 20) then gaps
        spark.createDataFrame(
            [("u1", 15, 30), ("u1", 50, 60)], schema
        ).write.mode("append").parquet(str(src_dir))
        q.processAllAvailable()
        rows = [
            r
            for r in spark.sql("select * from iv_out").collect()
            if r.user_id == "u1"
        ]
        latest = max(rows, key=lambda r: r.n_intervals)
        assert latest.n_intervals == 4
        assert latest.n_segments == 2
        assert latest.covered_s == 30 + 10
        # parity with the batch operator over the unioned input
        batch = interval_union_coverage(
            spark.createDataFrame(
                [("u1", 0, 10), ("u1", 5, 20), ("u1", 15, 30), ("u1", 50, 60)],
                schema,
            )
        ).collect()[0]
        assert (batch.covered_s, batch.n_segments, batch.n_intervals) == (
            latest.covered_s, latest.n_segments, latest.n_intervals,
        )
    finally:
        q.stop()


def test_streaming_transition_deltas_sum_to_batch_matrix(spark, tmp_path):
    from pyspark.sql import functions as F

    from pyrope_spark.operators.analytics import transition_matrix
    from pyrope_spark.streaming.sketches import streaming_transition_deltas

    src_dir = tmp_path / "tr_in"
    src_dir.mkdir()
    schema = "event_id long, user_id string, event_type string, ts_ns long"

    b1 = spark.createDataFrame(
        [(1, "u1", "a", 1), (2, "u1", "b", 2), (3, "u2", "a", 1)], schema
    )
    b1.write.mode("append").parquet(str(src_dir))
    stream = spark.readStream.schema(b1.schema).parquet(str(src_dir))
    q = (
        streaming_transition_deltas(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("tr_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_tr"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: u1 continues b -> a (CROSS-batch transition via state),
        # u2 continues a -> a (self-loop)
        spark.createDataFrame(
            [(4, "u1", "a", 3), (5, "u2", "a", 2)], schema
        ).write.mode("append").parquet(str(src_dir))
        q.processAllAvailable()
        got = {
            (r.prev_state, r.next_state): r.total
            for r in spark.sql(
                "select prev_state, next_state, sum(cnt) as total "
                "from tr_out group by 1, 2"
            ).collect()
        }
        # batch-operator truth over the unioned input
        all_ev = spark.createDataFrame(
            [
                (1, "u1", "a", 1), (2, "u1", "b", 2), (3, "u2", "a", 1),
                (4, "u1", "a", 3), (5, "u2", "a", 2),
            ],
            schema,
        ).withColumn("ts", F.timestamp_seconds(F.col("ts_ns")))
        truth = {
            (r.prev_state, r.next_state): r.cnt
            for r in transition_matrix(
                all_ev, user_col="user_id", order_cols=("ts_ns", "event_id")
            ).collect()
        }
        assert got == truth
        assert got[("b", "a")] == 1   # the cross-batch transition
        assert got[("a", "a")] == 1   # the self-loop
    finally:
        q.stop()


def test_streaming_pchart_matches_batch_chart(spark, tmp_path):
    """Per-group (n, flagged) counters folded across micro-batches, then
    pchart_readout over the state == the batch proportion_control_chart
    over the unioned rows, bit-identical (integer counters have no
    merge-order sensitivity)."""
    from pyrope_spark.operators.experiment import (
        pchart_readout,
        proportion_control_chart,
    )
    from pyrope_spark.streaming.sketches import streaming_pchart_maintain

    src = tmp_path / "pc_src"
    state = str(tmp_path / "pc_state")
    schema = "grp long, flagged boolean"
    b1 = spark.createDataFrame(
        [(g, i < (40 if g == 9 else 10)) for g in range(10)
         for i in range(60)],
        schema,
    )
    b1.write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(b1.schema).parquet(str(src))
    q = streaming_pchart_maintain(
        stream, state, group_col="grp", flag_col="flagged",
        checkpoint_dir=str(tmp_path / "pc_ckpt"),
    )
    try:
        q.processAllAvailable()
        # second batch finishes each group's 100 rows (40 more per group)
        b2 = spark.createDataFrame(
            [(g, 60 <= i + 60 < (40 if g == 9 else 10))  # all False
             for g in range(10) for i in range(40)],
            schema,
        )
        b2.write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        r.grp: r.asDict()
        for r in pchart_readout(spark.read.parquet(state)).collect()
    }
    batch = {
        r.grp: r.asDict()
        for r in proportion_control_chart(
            b1.unionByName(b2),
            group_expr=F.col("grp"),
            flag_expr=F.col("flagged"),
        ).collect()
    }
    assert streamed == batch
    assert streamed[9]["out_of_band"] == 1
    assert all(streamed[g]["out_of_band"] == 0 for g in range(9))


def test_streaming_novelty_matches_batch_operator(spark, tmp_path):
    """Docs streamed in id order, scored per batch against the
    accumulated first-owner set == the batch ngram_novelty over the full
    corpus, row-identical (min-id firsts merge under monotone ids)."""
    from pyrope_spark.operators.dedup import ngram_novelty_per_doc
    from pyrope_spark.streaming.sketches import streaming_novelty_maintain

    src = tmp_path / "nv_src"
    state = str(tmp_path / "nv_state")
    outd = str(tmp_path / "nv_out")
    schema = "doc_id long, text string"
    b1 = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")], schema
    )
    b1.write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(b1.schema).parquet(str(src))
    q = streaming_novelty_maintain(
        stream, state, outd, ngram_n=2,
        checkpoint_dir=str(tmp_path / "nv_ckpt"),
    )
    try:
        q.processAllAvailable()
        b2 = spark.createDataFrame(
            [(4, "a b x y q r"), (5, "q r s t")], schema
        )
        b2.write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        r.doc_id: (r.n_shingles, r.n_novel, r.novelty_ppm)
        for r in spark.read.parquet(outd).collect()
    }
    batch = {
        r.doc_id: (r.n_shingles, r.n_novel, r.novelty_ppm)
        for r in ngram_novelty_per_doc(
            b1.unionByName(b2), ngram_n=2
        ).collect()
    }
    assert streamed == batch
    assert streamed[2][2] == 0           # verbatim re-use, later id
    assert streamed[4][1] == 3           # 'a b'/'x y' seen in batch 1


def test_streaming_pchart_replay_is_exactly_once(spark, tmp_path):
    """foreachBatch is at-least-once: a crash between the state swap and
    the checkpoint commit re-executes the batch on restart.  Simulated
    faithfully by deleting the checkpoint's ``commits/0`` after a clean
    run — the SAME stream resumes and re-delivers batch 0.  The
    stream-bound batch-id high-water mark (r7+r8 ADVICE) skips it, so
    the sum-merged counters are not doubled."""
    import os
    import shutil

    from pyrope_spark.streaming.sketches import streaming_pchart_maintain

    src = tmp_path / "pcr_src"
    state = str(tmp_path / "pcr_state")
    ckpt = str(tmp_path / "pcr_ckpt")
    schema = "grp long, flagged boolean"
    rows = spark.createDataFrame(
        [(g, i < 5) for g in range(3) for i in range(20)], schema
    )
    rows.write.mode("append").parquet(str(src))

    def run() -> None:
        stream = spark.readStream.schema(rows.schema).parquet(str(src))
        q = streaming_pchart_maintain(
            stream, state, group_col="grp", flag_col="flagged",
            checkpoint_dir=ckpt,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    first = {
        r.grp: (r.n, r.flagged) for r in spark.read.parquet(state).collect()
    }
    assert first == {g: (20, 5) for g in range(3)}
    # crash window: offsets/0 committed, commits/0 lost -> restart
    # re-executes batch 0 against state that already includes it
    os.remove(os.path.join(ckpt, "commits", "0"))
    _crc = os.path.join(ckpt, "commits", ".0.crc")
    if os.path.exists(_crc):
        os.remove(_crc)
    run()
    again = {
        r.grp: (r.n, r.flagged) for r in spark.read.parquet(state).collect()
    }
    assert again == first  # not doubled


def test_streaming_pchart_foreign_stream_fails_loudly(spark, tmp_path):
    """A DIFFERENT checkpoint (or none) against marker-carrying state
    restarts batch ids at 0 — the old guard silently dropped its NEW
    data as a "replay" (r8 ADVICE).  Now it raises instead: the caller
    must resume the original checkpoint or start a fresh state_dir."""
    import pytest

    from pyrope_spark.streaming.sketches import streaming_pchart_maintain

    src = tmp_path / "pcf_src"
    state = str(tmp_path / "pcf_state")
    schema = "grp long, flagged boolean"
    rows = spark.createDataFrame([(0, True), (0, False)], schema)
    rows.write.mode("append").parquet(str(src))

    def run(ckpt: str | None) -> None:
        stream = spark.readStream.schema(rows.schema).parquet(str(src))
        q = streaming_pchart_maintain(
            stream, state, group_col="grp", flag_col="flagged",
            checkpoint_dir=str(tmp_path / ckpt) if ckpt else None,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run("pcf_ckpt1")
    # new data arrives, but the user points a FRESH checkpoint at the
    # same state dir: batch ids restart at 0 — ambiguous, must raise
    spark.createDataFrame([(1, True)], schema).write.mode("append").parquet(
        str(src)
    )
    from pyspark.errors import PySparkException

    with pytest.raises((ValueError, PySparkException), match="checkpoint"):
        run("pcf_ckpt2")
    with pytest.raises((ValueError, PySparkException), match="checkpoint"):
        run(None)
    # state unchanged by either failed run; resuming the ORIGINAL
    # checkpoint picks the new file up as batch 1 and merges it
    run("pcf_ckpt1")
    got = {
        r.grp: (r.n, r.flagged) for r in spark.read.parquet(state).collect()
    }
    assert got == {0: (2, 1), 1: (1, 1)}


def test_streaming_novelty_replay_no_duplicate_out_rows(spark, tmp_path):
    """Replaying the novelty stream (same checkpoint, commits/0 lost —
    the crash-window replay) leaves the per-doc output row set
    unchanged: the stream-bound batch marker skips the replayed batch,
    and even when processed each micro-batch owns a batch_id partition
    it overwrites, never appends (r7+r8 ADVICE)."""
    import os

    from pyrope_spark.streaming.sketches import streaming_novelty_maintain

    src = tmp_path / "nvr_src"
    state = str(tmp_path / "nvr_state")
    outd = str(tmp_path / "nvr_out")
    ckpt = str(tmp_path / "nvr_ckpt")
    schema = "doc_id long, text string"
    rows = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")], schema
    )
    rows.write.mode("append").parquet(str(src))

    def run() -> None:
        stream = spark.readStream.schema(rows.schema).parquet(str(src))
        q = streaming_novelty_maintain(
            stream, state, outd, ngram_n=2, checkpoint_dir=ckpt,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    first = sorted(
        (r.doc_id, r.n_shingles, r.n_novel)
        for r in spark.read.parquet(outd).collect()
    )
    assert len(first) == 3
    os.remove(os.path.join(ckpt, "commits", "0"))
    _crc = os.path.join(ckpt, "commits", ".0.crc")
    if os.path.exists(_crc):
        os.remove(_crc)
    run()
    again = sorted(
        (r.doc_id, r.n_shingles, r.n_novel)
        for r in spark.read.parquet(outd).collect()
    )
    assert again == first  # no duplicate appends


# --------------------------------------------------------------------------
# r9 chunk-order regression (VERDICT r9 #2): Arrow delivers one micro-batch
# to applyInPandasWithState as SEVERAL chunks whose order is arbitrary under
# load; the five stateful folds must sort the CONCATENATED batch, never each
# chunk (commit 5caa649 fixed a per-chunk-sort corruption — holt level
# 55.9375 vs 23.75). maxRecordsPerBatch=7 over a 61-row shuffled single-key
# batch forces ~9 chunks: any per-chunk (or no-)sort folds the recurrence
# out of order and diverges from the sorted-batch oracle.


def _chunk_order_ewma(spark, tmp_path, run):
    import random

    rows = [(i, float((i * 37) % 61)) for i in range(61)]
    random.Random(9).shuffle(rows)
    from pyspark.sql import functions as F

    from pyrope_spark.streaming.sketches import streaming_ewma

    df = spark.createDataFrame(
        [(1, i, v) for (i, v) in rows], "user_id long, sec long, value double"
    ).select(
        "user_id",
        F.timestamp_seconds(F.lit(1767225600) + F.col("sec")).alias("ts"),
        "value",
    )
    got = run(df, lambda s: streaming_ewma(s, 0.3), "co_ewma")
    got_by_ts = {r.ts_us: r.ewma for r in got}
    s = None
    for i, v in sorted(rows):
        s = v if s is None else 0.3 * v + 0.7 * s
        assert got_by_ts[(1767225600 + i) * 1_000_000] == round(s, 6)


def _chunk_order_holt(spark, tmp_path, run):
    import random

    rows = [(i, float((i * 37) % 61)) for i in range(61)]
    random.Random(10).shuffle(rows)
    from pyspark.sql import functions as F

    from pyrope_spark.streaming.sketches import streaming_holt

    df = spark.createDataFrame(
        [(1, i, v) for (i, v) in rows], "user_id long, sec long, value double"
    ).select(
        "user_id",
        F.timestamp_seconds(F.lit(1767225600) + F.col("sec")).alias("ts"),
        "value",
    )
    got = run(df, lambda s: streaming_holt(s, 0.5, 0.5), "co_holt")
    got_by_ts = {r.ts_us: (r.level, r.trend) for r in got}
    lb = None
    for i, v in sorted(rows):
        if lb is None:
            lb = (v, 0.0)
        else:
            l0, b0 = lb
            l = 0.5 * v + 0.5 * (l0 + b0)
            lb = (l, 0.5 * (l - l0) + 0.5 * b0)
        assert got_by_ts[(1767225600 + i) * 1_000_000] == (
            round(lb[0], 6), round(lb[1], 6)
        )


def _chunk_order_debounce(spark, tmp_path, run):
    import random

    # bursts: events every 10s with a >300s gap every 7th event
    ts, t = [], 0
    for i in range(61):
        t += 400_000_000_000 if i % 7 == 0 else 10_000_000_000
        ts.append(t)
    rows = [(i + 1, t) for i, t in enumerate(ts)]
    random.Random(11).shuffle(rows)

    from pyrope_spark.streaming.sketches import streaming_debounce

    df = spark.createDataFrame(
        [("u", "e", t, eid) for (eid, t) in rows],
        "user_id string, event_type string, ts_ns long, event_id long",
    )
    got = run(df, lambda s: streaming_debounce(s, gap_s=300), "co_deb")
    got_ids = sorted(r.event_id for r in got)
    # oracle: fold sorted by (ts, id)
    surv, last = [], None
    for eid, t in sorted(rows, key=lambda r: (r[1], r[0])):
        if last is None or t - last > 300 * 1_000_000_000:
            surv.append(eid)
        last = t
    assert got_ids == sorted(surv)


def _chunk_order_intervals(spark, tmp_path, run):
    import random

    rows = [(i * 10, i * 10 + (14 if i % 3 else 6)) for i in range(61)]
    random.Random(12).shuffle(rows)

    from pyrope_spark.streaming.sketches import streaming_interval_coverage

    df = spark.createDataFrame(
        [("u", s, e) for (s, e) in rows],
        "user_id string, start_s long, end_s long",
    )
    got = run(df, lambda s: streaming_interval_coverage(s), "co_iv")
    assert len(got) == 1
    # oracle fold over start-sorted intervals
    covered, seg_s, seg_e, n_seg = 0, None, None, 0
    for s, e in sorted(rows):
        if seg_s is None:
            n_seg, seg_s, seg_e = 1, s, e
        elif s > seg_e:
            covered += seg_e - seg_s
            n_seg += 1
            seg_s, seg_e = s, e
        else:
            seg_e = max(seg_e, e)
    total = covered + (seg_e - seg_s)
    r = got[0]
    assert (r.n_intervals, r.n_segments, r.covered_s) == (61, n_seg, total)


def _chunk_order_transitions(spark, tmp_path, run):
    import random

    states = ["abcde"[(i * i) % 5] for i in range(61)]
    rows = [(i + 1, i, st) for i, st in enumerate(states)]
    random.Random(13).shuffle(rows)

    from pyrope_spark.streaming.sketches import streaming_transition_deltas

    df = spark.createDataFrame(
        [(eid, "u", st, t) for (eid, t, st) in rows],
        "event_id long, user_id string, event_type string, ts_ns long",
    )
    got = run(df, lambda s: streaming_transition_deltas(s), "co_tr")
    got_counts = {(r.prev_state, r.next_state): r.cnt for r in got}
    truth: dict = {}
    last = None
    for _, _, st in sorted(rows, key=lambda r: (r[1], r[0])):
        if last is not None:
            truth[(last, st)] = truth.get((last, st), 0) + 1
        last = st
    assert got_counts == truth


@pytest.mark.parametrize(
    "case",
    [
        _chunk_order_ewma,
        _chunk_order_holt,
        _chunk_order_debounce,
        _chunk_order_intervals,
        _chunk_order_transitions,
    ],
    ids=["ewma", "holt", "debounce", "intervals", "transitions"],
)
def test_stateful_folds_survive_multichunk_microbatches(spark, tmp_path, case):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "7")

    def run(batch_df, transform, name):
        src = tmp_path / f"{name}_src"
        # single output file so the 61 rows arrive as ONE input partition
        # that Arrow then splits into ~9 chunks of 7
        batch_df.coalesce(1).write.mode("append").parquet(str(src))
        stream = spark.readStream.schema(batch_df.schema).parquet(str(src))
        q = (
            transform(stream)
            .writeStream.outputMode("append").format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            return spark.sql(f"select * from {name}").collect()
        finally:
            q.stop()

    try:
        case(spark, tmp_path, run)
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
