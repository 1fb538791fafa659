from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from pyrope_spark.operators.temporal import as_of_join, sessionize


def _ts(m):
    return datetime(2024, 1, 1) + timedelta(minutes=m)


def test_sessionize_gap_breaks(spark):
    rows = [
        ("u1", _ts(0)), ("u1", _ts(10)), ("u1", _ts(100)), ("u1", _ts(105)),
        ("u2", _ts(0)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = sessionize(df, gap_s=1800).collect()  # 30 min gap
    got = {(r["user_id"], r["ts"].minute + r["ts"].hour * 60): r["session_id"] for r in out}
    assert got[("u1", 0)] == 0 and got[("u1", 10)] == 0
    assert got[("u1", 100)] == 1 and got[("u1", 105)] == 1
    assert got[("u2", 0)] == 0


def test_as_of_join_basic(spark):
    left = spark.createDataFrame(
        [("k", _ts(5), "a"), ("k", _ts(20), "b"), ("k", _ts(1), "c")],
        "key string, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [("k", _ts(2), 100), ("k", _ts(10), 200)],
        "key string, ts timestamp, val int",
    )
    out = {r["name"]: r["right_val"] for r in
           as_of_join(left, right, key_cols=["key"]).collect()}
    assert out == {"c": None, "a": 100, "b": 200}


def test_as_of_join_equal_ts_inclusive_vs_strict(spark):
    left = spark.createDataFrame([("k", _ts(10), "x")], "key string, ts timestamp, name string")
    right = spark.createDataFrame([("k", _ts(10), 7)], "key string, ts timestamp, val int")
    inc = as_of_join(left, right, key_cols=["key"]).collect()[0]["right_val"]
    strict = as_of_join(left, right, key_cols=["key"], strict=True).collect()[0]["right_val"]
    assert inc == 7
    assert strict is None


def test_interval_join_bucket_boundaries(spark):
    """Pairs must match regardless of where interval/point fall relative to
    bucket edges — including intervals spanning many buckets and points on
    exact interval endpoints (closed='both')."""
    from pyrope_spark.operators.temporal import interval_join

    base = datetime(2026, 1, 1, 0, 0, 0)
    pts = spark.createDataFrame(
        [
            ("u1", base, 1.0),  # on start boundary
            ("u1", base + timedelta(seconds=3600 * 5), 2.0),  # mid, far bucket
            ("u1", base + timedelta(seconds=3600 * 10), 3.0),  # on end boundary
            ("u1", base + timedelta(seconds=3600 * 10, microseconds=1), 4.0),  # after
            ("u2", base + timedelta(seconds=30), 5.0),  # other key
        ],
        "user_id string, ts timestamp, v double",
    )
    iv = spark.createDataFrame(
        [("u1", "w", base, base + timedelta(seconds=3600 * 10))],
        "user_id string, win string, start_ts timestamp, end_ts timestamp",
    )
    got = interval_join(pts, iv, key_cols=["user_id"], bucket_s=3600).collect()
    assert sorted(r.v for r in got) == [1.0, 2.0, 3.0]


def test_interval_join_closed_modes(spark):
    from pyrope_spark.operators.temporal import interval_join

    base = datetime(2026, 1, 1)
    pts = spark.createDataFrame(
        [("k", base, "at_start"), ("k", base + timedelta(seconds=100), "at_end")],
        "user_id string, ts timestamp, tag string",
    )
    iv = spark.createDataFrame(
        [("k", base, base + timedelta(seconds=100))],
        "user_id string, start_ts timestamp, end_ts timestamp",
    )
    def tags(closed):
        rows = interval_join(
            pts, iv, key_cols=["user_id"], bucket_s=60, closed=closed
        ).collect()
        return sorted(r.tag for r in rows)

    assert tags("both") == ["at_end", "at_start"]
    assert tags("left") == ["at_start"]
    assert tags("right") == ["at_end"]


def test_interval_join_no_duplicate_pairs_and_plan(spark):
    """An interval spanning N buckets must still yield each matching pair
    once, and the join must be an equi-join (hash/sort-merge), not a
    nested-loop range join."""
    from pyrope_spark.operators.temporal import interval_join

    base = datetime(2026, 1, 1)
    pts = spark.createDataFrame(
        [("k", base + timedelta(seconds=s), float(s)) for s in range(0, 1000, 100)],
        "user_id string, ts timestamp, v double",
    )
    iv = spark.createDataFrame(
        [("k", base, base + timedelta(seconds=1000))],
        "user_id string, start_ts timestamp, end_ts timestamp",
    )
    out = interval_join(pts, iv, key_cols=["user_id"], bucket_s=60)
    rows = out.collect()
    assert len(rows) == 10 == len({r.v for r in rows})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_gapfill_locf_and_lerp(spark):
    """One key, hourly buckets with observations at hours 0, 3 (gap 1-2) and
    a trailing observation at 5: locf carries, lerp interpolates linearly."""
    from pyrope_spark.operators.temporal import gapfill

    base = datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, base + timedelta(hours=0), 10.0),
            (1, base + timedelta(hours=0, minutes=30), 20.0),  # avg h0 = 15
            (1, base + timedelta(hours=3), 30.0),
            (1, base + timedelta(hours=5), 50.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    res = gapfill(ev, key_cols=["user_id"]).orderBy("bucket_ts_s").collect()
    assert len(res) == 6  # hours 0..5 dense
    h = {i: res[i] for i in range(6)}
    assert h[0]["v_raw"] == 15.0 and not h[0]["is_gap"]
    assert h[1]["v_raw"] is None and h[1]["is_gap"]
    # locf: gap hours 1-2 carry 15.0
    assert h[1]["v_locf"] == 15.0 and h[2]["v_locf"] == 15.0
    # lerp between (h0,15) and (h3,30): h1=20, h2=25
    assert abs(h[1]["v_lerp"] - 20.0) < 1e-9
    assert abs(h[2]["v_lerp"] - 25.0) < 1e-9
    # gap h4 between (h3,30) and (h5,50) -> 40
    assert abs(h[4]["v_lerp"] - 40.0) < 1e-9
    assert h[5]["v_raw"] == 50.0


def test_gapfill_edges_and_multi_key(spark):
    """Leading gaps have NULL locf/lerp; keys densify independently; count
    aggregation supported."""
    from pyrope_spark.operators.temporal import gapfill

    base = datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, base + timedelta(hours=1), 1.0),
            (1, base + timedelta(hours=3), 3.0),
            (2, base + timedelta(hours=10), 7.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    res = gapfill(ev, key_cols=["user_id"], agg="count").collect()
    by_key = {}
    for r in res:
        by_key.setdefault(r["user_id"], []).append(r)
    assert len(by_key[1]) == 3 and len(by_key[2]) == 1  # h1..h3; h10 only
    k1 = sorted(by_key[1], key=lambda r: r["bucket_ts_s"])
    assert k1[0]["v_raw"] == 1.0 and k1[1]["is_gap"] and k1[2]["v_raw"] == 1.0
    # single-observation key: no gaps, locf == raw (count of 1 event = 1.0)
    assert by_key[2][0]["v_locf"] == 1.0 and not by_key[2][0]["is_gap"]


def test_rolling_zscore_flags_spike_not_warmup(spark):
    from pyrope_spark.operators.temporal import rolling_zscore

    base = datetime(2026, 1, 1)
    vals = [10.0, 11.0, 9.0, 10.0, 11.0, 9.0, 10.0, 100.0, 10.0]
    ev = spark.createDataFrame(
        [(1, base + timedelta(minutes=i), v, i) for i, v in enumerate(vals)],
        "user_id long, ts timestamp, value double, event_id long",
    )
    rows = rolling_zscore(
        ev, key_cols=["user_id"], tiebreak_cols=["event_id"],
        window_n=24, min_obs=5, z_thresh=3.0,
    ).orderBy("event_id").collect()
    # first min_obs rows have no z (insufficient trailing history)
    assert all(r["zscore_micro"] is None for r in rows[:5])
    assert not any(r["is_anomaly"] for r in rows[:5])
    spike = rows[7]
    assert spike["is_anomaly"] and spike["zscore_micro"] > 3_000_000
    # the spike is EXCLUDED from its own baseline, and later points are
    # judged against a baseline that now contains it -> not anomalous
    assert not rows[8]["is_anomaly"]
    # steady values before the spike are not anomalous
    assert not rows[6]["is_anomaly"]


def test_rolling_zscore_constant_series_no_flags(spark):
    from pyrope_spark.operators.temporal import rolling_zscore

    base = datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [(1, base + timedelta(minutes=i), 5.0, i) for i in range(10)],
        "user_id long, ts timestamp, value double, event_id long",
    )
    rows = rolling_zscore(
        ev, key_cols=["user_id"], tiebreak_cols=["event_id"], min_obs=3
    ).collect()
    # zero variance -> z undefined everywhere, nothing flagged
    assert all(r["zscore_micro"] is None and not r["is_anomaly"] for r in rows)


def test_ewma_closed_form_and_order(spark):
    from pyrope_spark.operators.temporal import ewma

    rows = [
        (1, 1, "2026-01-01 00:00:00", 10.0),
        (1, 2, "2026-01-01 00:01:00", 20.0),
        (1, 3, "2026-01-01 00:02:00", 30.0),
        (2, 4, "2026-01-01 00:00:00", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_id"]: r["ewma_micro"] for r in ewma(df, 0.5).collect()}
    assert out[1] == 10_000_000
    assert out[2] == 15_000_000      # 0.5*20 + 0.5*10
    assert out[3] == 22_500_000      # 0.5*30 + 0.5*15
    assert out[4] == 5_000_000       # independent key


def test_ewma_tie_order_by_id(spark):
    from pyrope_spark.operators.temporal import ewma

    rows = [
        (1, 2, "2026-01-01 00:00:00", 100.0),   # same ts: id 1 first
        (1, 1, "2026-01-01 00:00:00", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_id"]: r["ewma_micro"] for r in ewma(df, 0.5).collect()}
    assert out[1] == 0 and out[2] == 50_000_000


def test_ewma_partitioned_matches_grouped(spark):
    """The partitioned fast path == the per-key grouped path exactly,
    including when a key's rows split across input partitions."""
    import numpy as np

    from pyrope_spark.operators.temporal import ewma

    r = np.random.default_rng(13)
    rows = [
        (int(i % 17), int(i), f"2026-01-01 {i % 24:02d}:{(i * 7) % 60:02d}:00",
         float(r.integers(0, 100)))
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp")).repartition(11)
    key = lambda d: sorted(
        (x["user_id"], x["event_id"], x["ewma_micro"]) for x in d.collect()
    )
    assert key(ewma(df, 0.3, impl="partitioned")) == key(
        ewma(df, 0.3, impl="grouped")
    )


def test_ewma_partitioned_survives_tiny_arrow_batches(spark):
    """Force multi-batch partitions (arrow batch = 16 rows) so keys split
    across batches inside a task; the carried {key: s} dict must keep the
    recurrence exact."""
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf, None)
    spark.conf.set(conf, "16")
    try:
        import numpy as np

        from pyrope_spark.operators.temporal import ewma

        r = np.random.default_rng(4)
        rows = [
            (int(i % 3), int(i),
             f"2026-01-01 {i % 24:02d}:{(i * 13) % 60:02d}:00",
             float(r.integers(0, 50)))
            for i in range(400)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        key = lambda d: sorted(
            (x["user_id"], x["event_id"], x["ewma_micro"]) for x in d.collect()
        )
        assert key(ewma(df, 0.4, impl="partitioned")) == key(
            ewma(df, 0.4, impl="grouped")
        )
    finally:
        if old is not None:
            spark.conf.set(conf, old)
        else:
            spark.conf.unset(conf)


def test_concurrency_curve_half_open(spark):
    from pyrope_spark.operators.temporal import concurrency_curve

    iv = spark.createDataFrame(
        [
            ("2026-01-01 10:00:00", "2026-01-01 10:10:00"),
            ("2026-01-01 10:05:00", "2026-01-01 10:15:00"),
            # starts exactly when the first ends: half-open -> no overlap
            ("2026-01-01 10:10:00", "2026-01-01 10:20:00"),
        ],
        "start_ts string, end_ts string",
    ).select(
        F.col("start_ts").cast("timestamp").alias("start_ts"),
        F.col("end_ts").cast("timestamp").alias("end_ts"),
    )
    rows = {str(r["ts"]): r["concurrent"] for r in concurrency_curve(iv).collect()}
    assert rows["2026-01-01 10:00:00"] == 1
    assert rows["2026-01-01 10:05:00"] == 2          # peak
    assert rows["2026-01-01 10:10:00"] == 2          # one ends, one starts
    assert rows["2026-01-01 10:15:00"] == 1
    assert rows["2026-01-01 10:20:00"] == 0


def test_counter_rate_resets_and_first(spark):
    from pyrope_spark.operators.temporal import counter_rate

    rows = [
        (1, 1, "2026-01-01 00:00:00", 100.0),
        (1, 2, "2026-01-01 00:00:10", 150.0),   # +50 over 10s -> 5.0
        (1, 3, "2026-01-01 00:00:20", 30.0),    # reset: rate = 30/10 = 3.0
        (2, 4, "2026-01-01 00:00:00", 7.0),     # first for key 2 -> NULL
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_id"]: r["rate"] for r in counter_rate(df).collect()}
    assert out[1] is None
    assert out[2] == 5.0
    assert out[3] == 3.0
    assert out[4] is None


def test_mad_anomalies_matches_bruteforce(spark):
    """MAD flags == brute-force nearest-rank median/MAD recomputed in
    python; planted 100.0 outlier among ~1.0 values is flagged, the
    inliers are not."""
    from pyrope_spark.operators.temporal import mad_anomalies

    vals = [1.0, 1.1, 0.9, 1.05, 0.95, 1.2, 0.8, 100.0, 1.0, 1.02]
    rows = [("a", i, v) for i, v in enumerate(vals)]
    rows += [("b", 100 + i, float(i)) for i in range(7)]  # spread-out key
    df = spark.createDataFrame(rows, "k string, id long, value double")
    out = {
        (r["k"], r["id"]): r
        for r in mad_anomalies(df, "k", "value", "id", k=3).collect()
    }

    def brute(kv):
        sv = sorted((round(v * 1_000_000), i) for _, i, v in kv)
        med = sv[(len(sv) + 1) // 2 - 1][0]
        devs = sorted((abs(v - med), i) for v, i in sv)
        mad = devs[(len(devs) + 1) // 2 - 1][0]
        return {
            (kv[0][0], i): (v, med, mad)
            for v, i in sv
            if abs(v - med) > 3 * mad
        }

    expect = {}
    for key in ("a", "b"):
        expect.update(brute([r for r in rows if r[0] == key]))
    assert set(out) == set(expect)
    assert ("a", 7) in out  # the planted 100.0
    got = out[("a", 7)]
    v, med, mad = expect[("a", 7)]
    assert (got["value_micro"], got["median_micro"], got["mad_micro"]) == (
        v, med, mad,
    )


def test_histogram_drift_detects_planted_shift(spark):
    """A key whose value distribution shifts between halves drifts near
    2e6 ppm; a stationary key stays at 0."""
    from datetime import datetime

    from pyrope_spark.operators.profile import histogram_drift

    t0 = datetime(2024, 1, 1)
    t1 = datetime(2024, 1, 10)
    rows = []
    # 'shift': all lows first half, all highs second half
    for i in range(50):
        rows.append(("shift", 0.0 + i * 0.001, t0))
        rows.append(("shift", 100.0 + i * 0.001, t1))
        # 'flat': identical values both halves
        rows.append(("flat", 5.0, t0))
        rows.append(("flat", 5.0, t1))
    df = spark.createDataFrame(rows, "k string, value double, ts timestamp")
    out = {r["k"]: r for r in histogram_drift(df, "k", "value", "ts").collect()}
    assert out["flat"]["l1_drift_ppm"] == 0
    # disjoint supports -> both halves' full mass moves: L1 = 2e6 exactly
    assert out["shift"]["l1_drift_ppm"] == 2_000_000


def test_seasonal_profile_closed_form(spark):
    """Two dows with known means -> exact micro means and index."""
    from datetime import datetime

    from pyrope_spark.operators.temporal import seasonal_profile

    sun = datetime(2024, 1, 7)   # Sunday  -> Spark dayofweek = 1
    mon = datetime(2024, 1, 8)   # Monday  -> 2
    rows = [("a", 10.0, sun), ("a", 20.0, sun), ("a", 60.0, mon)]
    df = spark.createDataFrame(rows, "k string, value double, ts timestamp")
    out = {r["dow"]: r for r in seasonal_profile(df, "k", "value", "ts").collect()}
    assert out[1]["dow_mean_micro"] == 15_000_000     # (10+20)/2
    assert out[2]["dow_mean_micro"] == 60_000_000
    assert out[1]["key_mean_micro"] == 30_000_000     # 90/3
    assert out[1]["seasonal_index_micro"] == 500_000  # 15/30
    assert out[2]["seasonal_index_micro"] == 2_000_000
    assert out[1]["n_obs"] == 2 and out[2]["n_obs"] == 1


def test_cusum_changepoint_planted_shift(spark):
    """Series 10,10,10,10,50,50,50,50 -> |CUSUM| peaks exactly at the
    boundary (position 4); a constant key peaks at 0 magnitude."""
    from datetime import datetime, timedelta

    from pyrope_spark.operators.temporal import cusum_changepoint

    t0 = datetime(2024, 1, 1)
    rows = []
    for i, v in enumerate([10.0] * 4 + [50.0] * 4):
        rows.append(("shift", i, t0 + timedelta(minutes=i), v))
    for i in range(6):
        rows.append(("const", 100 + i, t0 + timedelta(minutes=i), 7.0))
    df = spark.createDataFrame(rows, "k string, id long, ts timestamp, value double")
    out = {r["k"]: r for r in cusum_changepoint(df, "k", "value", "ts", "id").collect()}
    assert out["shift"]["position"] == 4
    # S_4 = n*cum4 - 4*total = 8*40e6 - 4*240e6 = -640e6 -> |S|/n = 80e6
    assert out["shift"]["cusum_peak_micro"] == 80_000_000
    assert out["const"]["cusum_peak_micro"] == 0
    assert out["const"]["position"] == 1  # tie on |S|=0 -> earliest row


def test_holt_closed_form_and_trend_tracking(spark):
    from pyrope_spark.operators.temporal import holt

    # x = 10, 20, 30 with alpha=0.5, beta=0.5:
    # t1: l=10, b=0
    # t2: l=.5*20+.5*10=15, b=.5*(15-10)+.5*0=2.5
    # t3: l=.5*30+.5*17.5=23.75, b=.5*(23.75-15)+.5*2.5=5.625
    rows = [
        (1, 1, "2026-01-01 00:00:00", 10.0),
        (1, 2, "2026-01-01 00:01:00", 20.0),
        (1, 3, "2026-01-01 00:02:00", 30.0),
        (2, 4, "2026-01-01 00:00:00", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_id"]: r for r in holt(df, 0.5, 0.5).collect()}
    assert out[1]["level_micro"] == 10_000_000 and out[1]["trend_micro"] == 0
    assert out[2]["level_micro"] == 15_000_000
    assert out[2]["trend_micro"] == 2_500_000
    assert out[2]["forecast_micro"] == 17_500_000
    assert out[3]["level_micro"] == 23_750_000
    assert out[3]["trend_micro"] == 5_625_000
    assert out[4]["level_micro"] == 7_000_000  # independent key


def test_holt_state_survives_batch_splits(spark):
    """Keys split across Arrow batches inside a task must carry (l, b)."""
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf, None)
    spark.conf.set(conf, "16")
    try:
        import math

        from pyrope_spark.operators.temporal import holt

        n, a, bt = 200, 0.5, 0.25
        rows = [
            (int(i % 3), int(i), f"2026-01-01 {i % 24:02d}:{(i * 13) % 60:02d}:00",
             float((i * 37) % 50))
            for i in range(n)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp")).repartition(7)
        got = {r["event_id"]: r["level_micro"] for r in holt(df, a, bt).collect()}
        # python reference over the same (ts, id) order
        series: dict = {}
        ordered = sorted(rows, key=lambda r: (r[0], r[2], r[1]))
        want = {}
        for u, i, _, x in ordered:
            st = series.get(u)
            if st is None:
                l, b = float(x), 0.0
            else:
                l0, b0 = st
                l = a * x + (1.0 - a) * (l0 + b0)
                b = bt * (l - l0) + (1.0 - bt) * b0
            series[u] = (l, b)
            want[i] = int(math.floor(l * 1e6))
        assert got == want
    finally:
        if old is not None:
            spark.conf.set(conf, old)
        else:
            spark.conf.unset(conf)


# --------------------------------------------------------------------------
# Time-weighted average (TWAP)
# --------------------------------------------------------------------------


def test_twap_duration_weighting_closed_form(spark):
    from pyrope_spark.operators.temporal import time_weighted_avg

    S = 1_000_000_000
    day = 86_400 * S
    # key 'a', one day: v=10 holds 0s..80000s, v=2 holds the rest
    rows = [
        (1, 0 * S + day, "a", 10.0),
        (2, 80_000 * S + day, "a", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_ns long, event_type string, value double"
    )
    r = time_weighted_avg(df).collect()[0]
    assert r["day_epoch"] == 1
    assert r["n_events"] == 2
    assert r["total_dur_ms"] == 86_400_000
    # (10e6*80_000_000 + 2e6*6_400_000) div 86_400_000 = 9_407_407
    assert r["twap_micro"] == 9_407_407
    assert r["mean_micro"] == 6_000_000  # the plain mean says 6.0


def test_twap_last_event_carries_to_day_boundary(spark):
    from pyrope_spark.operators.temporal import time_weighted_avg

    S = 1_000_000_000
    rows = [(1, 43_200 * S, "a", 4.0)]  # single mid-day event
    df = spark.createDataFrame(
        rows, "event_id long, ts_ns long, event_type string, value double"
    )
    r = time_weighted_avg(df).collect()[0]
    assert r["total_dur_ms"] == 43_200_000
    assert r["twap_micro"] == 4_000_000


def test_twap_same_ts_tiebreak_and_day_split(spark):
    from pyrope_spark.operators.temporal import time_weighted_avg

    S = 1_000_000_000
    day = 86_400 * S
    rows = [
        # two events at the SAME instant: first (lower id) gets dur 0
        (1, 10 * S, "a", 100.0),
        (2, 10 * S, "a", 1.0),
        # next day is its own group
        (3, day + 10 * S, "a", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_ns long, event_type string, value double"
    )
    by_day = {r["day_epoch"]: r for r in time_weighted_avg(df).collect()}
    d0 = by_day[0]
    # v=100 held 0ms; v=1 held to the boundary -> twap == 1.0
    assert d0["twap_micro"] == 1_000_000
    assert d0["mean_micro"] == 50_500_000
    assert by_day[1]["twap_micro"] == 7_000_000


# --------------------------------------------------------------------------
# Burst debouncing
# --------------------------------------------------------------------------


def test_debounce_burst_split_and_survivors(spark):
    from pyrope_spark.operators.temporal import debounce_events

    S = 1_000_000_000
    rows = [
        # burst 1: 0s, 100s, 250s (each <=300s after previous)
        (1, 1, 0 * S, "click", 0.0),
        (2, 1, 100 * S, "click", 0.0),
        (3, 1, 250 * S, "click", 0.0),
        # burst 2 starts 301s later
        (4, 1, 551 * S + 1, "click", 0.0),
        # other type is its own key
        (5, 1, 10 * S, "view", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_ns long, event_type string, value double"
    )
    out = debounce_events(df, gap_s=300).collect()
    by = {(r["event_type"], r["burst_id"]): r for r in out}
    b1 = by[("click", 0)]
    assert b1["event_id"] == 1 and b1["n_suppressed"] == 2
    assert b1["burst_span_ms"] == 250_000
    b2 = by[("click", 1)]
    assert b2["event_id"] == 4 and b2["n_suppressed"] == 0
    assert by[("view", 0)]["event_id"] == 5


def test_debounce_gap_boundary_exact(spark):
    from pyrope_spark.operators.temporal import debounce_events

    S = 1_000_000_000
    rows = [
        (1, 1, 0, "e", 0.0),
        (2, 1, 300 * S, "e", 0.0),      # exactly 300s: SAME burst (> rule)
        (3, 1, 600 * S + 1, "e", 0.0),  # 300s + 1ns after #2: new burst
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_ns long, event_type string, value double"
    )
    out = debounce_events(df, gap_s=300).collect()
    bursts = sorted((r["burst_id"], r["event_id"], r["n_suppressed"]) for r in out)
    assert bursts == [(0, 1, 1), (1, 3, 0)]


def test_debounce_same_instant_tiebreak(spark):
    from pyrope_spark.operators.temporal import debounce_events

    rows = [
        (9, 1, 1000, "e", 0.0),
        (2, 1, 1000, "e", 0.0),  # same ts: lower id survives
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_ns long, event_type string, value double"
    )
    out = debounce_events(df, gap_s=300).collect()
    assert len(out) == 1 and out[0]["event_id"] == 2
    assert out[0]["n_suppressed"] == 1


def test_dow_adjusted_anomalies_periodic_is_quiet(spark):
    # perfectly weekly-periodic traffic: every residual is 0 -> no flags,
    # even though weekend volume is 5x weekday volume (a raw-count MAD
    # gate would flag the rhythm itself)
    from datetime import datetime, timedelta

    from pyrope_spark.operators.temporal import dow_adjusted_anomalies

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(21):
        # count is a pure function of this day's dow
        dow = (d + (t0 - datetime(1970, 1, 1)).days + 4) % 7
        n = 50 if dow in (5, 6) else 10
        for j in range(n):
            rows.append((eid, t0 + timedelta(days=d, minutes=j), 1,
                         "view", 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double"
    )
    out = dow_adjusted_anomalies(ev, k=5).collect()
    assert len(out) == 21
    assert all(r.resid_milli == 0 for r in out)
    assert all(r.flagged == 0 for r in out)


def test_dow_adjusted_anomalies_flags_spike(spark):
    # same periodic base, one day spiked 10x: that day must be flagged
    from datetime import datetime, timedelta

    from pyrope_spark.operators.temporal import dow_adjusted_anomalies

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(21):
        dow = (d + (t0 - datetime(1970, 1, 1)).days + 4) % 7
        n = 50 if dow in (5, 6) else 10
        if d == 10:
            n *= 10
        for j in range(n):
            rows.append((eid, t0 + timedelta(days=d, minutes=j), 1,
                         "view", 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double"
    )
    out = {r.d: r for r in dow_adjusted_anomalies(ev, k=5).collect()}
    spike_day = (t0 - datetime(1970, 1, 1)).days + 10
    assert out[spike_day].flagged == 1
    assert out[spike_day].resid_milli > 0
