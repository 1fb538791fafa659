"""Funnel analysis (operators/funnel.py) — progression, strict ordering,
window anchoring, greedy-from-earliest semantics, and the counts rollup."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyrope_spark.operators.funnel import funnel, funnel_counts


def _ev(spark, rows):
    base = datetime(2026, 1, 1)
    return spark.createDataFrame(
        [(u, base + timedelta(seconds=s), t) for (u, s, t) in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_progression_levels(spark):
    ev = _ev(
        spark,
        [
            # u1 completes in order
            (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
            # u2 stops after click
            (2, 0, "view"), (2, 10, "click"),
            # u3 only views
            (3, 0, "view"),
            # u4 purchase BEFORE click: strict ordering blocks level 3
            (4, 0, "view"), (4, 10, "purchase"), (4, 20, "click"),
            # u5 never views -> absent from output
            (5, 0, "click"), (5, 10, "purchase"),
        ],
    )
    out = {r["user_id"]: r for r in
           funnel(ev, steps=["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["max_step"] == 3 and out[1]["completed"]
    assert out[1]["duration_us"] == 20_000_000
    assert out[2]["max_step"] == 2 and not out[2]["completed"]
    assert out[3]["max_step"] == 1
    assert out[4]["max_step"] == 2  # click matched at t=20, no purchase after
    assert out[4]["t3_us"] is None


def test_funnel_window_anchored_at_first_step(spark):
    ev = _ev(
        spark,
        [
            # chain completes but purchase lands outside the 60s anchor window
            (1, 0, "view"), (1, 10, "click"), (1, 100, "purchase"),
            # inside window
            (2, 0, "view"), (2, 10, "click"), (2, 50, "purchase"),
        ],
    )
    out = {r["user_id"]: r for r in
           funnel(ev, steps=["view", "click", "purchase"], within_s=60).collect()}
    assert out[1]["max_step"] == 2 and out[2]["max_step"] == 3


def test_funnel_greedy_anchors_at_earliest_first_step(spark):
    # Documented deviation: anchor = earliest 'view' (t=0); with window 30s
    # the purchase at t=40 is out of window even though anchoring at the
    # second view (t=20) would convert. Greedy reports level 2.
    ev = _ev(
        spark,
        [(1, 0, "view"), (1, 25, "click"), (1, 20, "view"), (1, 40, "purchase")],
    )
    out = funnel(ev, steps=["view", "click", "purchase"], within_s=30).collect()[0]
    assert out["t1_us"] is not None and out["max_step"] == 2


def test_funnel_equal_timestamps_not_matched(spark):
    # strictly-after: click at the same instant as view does not count
    ev = _ev(spark, [(1, 0, "view"), (1, 0, "click")])
    out = funnel(ev, steps=["view", "click"]).collect()[0]
    assert out["max_step"] == 1


def test_funnel_counts_monotone(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
            (2, 0, "view"), (2, 1, "click"),
            (3, 0, "view"),
            (4, 0, "view"),
        ],
    )
    f = funnel(ev, steps=["view", "click", "purchase"])
    counts = {r["max_step"]: r for r in funnel_counts(f).collect()}
    assert counts[1]["n_at_level"] == 2
    assert counts[1]["n_reached"] == 4  # everyone reached level 1
    assert counts[2]["n_reached"] == 2
    assert counts[3]["n_reached"] == 1


def test_cohort_retention_matrix(spark):
    from pyrope_spark.operators.funnel import cohort_retention

    # period 100s; u1,u2 start period 0; u2 returns period 1; u3 starts period 1
    ev = _ev(
        spark,
        [
            (1, 10, "view"),
            (2, 20, "view"), (2, 130, "click"), (2, 250, "view"),
            (3, 110, "view"),
        ],
    )
    rows = {(r["cohort_s"], r["offset"]): r
            for r in cohort_retention(ev, period_s=100).collect()}
    base = rows[min(c for c, _ in rows), 0]
    # cohort of period containing t=10: u1+u2 -> size 2
    assert base["n_cohort"] == 2 and base["n_active"] == 2
    assert base["retention"] == 1.0
    c0 = base["cohort_s"]
    assert rows[(c0, 1)]["n_active"] == 1  # only u2 returns next period
    assert rows[(c0, 1)]["retention"] == 0.5
    assert rows[(c0, 2)]["n_active"] == 1  # u2 again at t=250
    # u3's cohort is the next period, size 1, offset 0 only
    c1 = c0 + 100
    assert rows[(c1, 0)]["n_cohort"] == 1
    assert (c1, 1) not in rows


def test_conversion_lag_percentiles_closed_form(spark):
    from datetime import datetime, timedelta

    from pyrope_spark.operators.funnel import conversion_lag_percentiles

    base = datetime(2024, 1, 1)
    rows = []
    # users u0..u3 view at t=0; lags 10, 20, 30 s; u3 never converts;
    # u4 purchases BEFORE viewing (not eligible), then converts at lag 40
    for i, lag in enumerate([10, 20, 30]):
        rows.append((f"u{i}", "view", base))
        rows.append((f"u{i}", "purchase", base + timedelta(seconds=lag)))
    rows.append(("u3", "view", base))
    rows.append(("u4", "purchase", base - timedelta(seconds=5)))
    rows.append(("u4", "view", base))
    rows.append(("u4", "purchase", base + timedelta(seconds=40)))
    df = spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")
    out = conversion_lag_percentiles(
        df, percentiles=(0.5, 1.0)
    ).collect()[0]
    assert out.n_from_users == 5
    assert out.n_converted == 4       # u3 out; u4 in (pre-view purchase ignored)
    # lags sorted: 10,20,30,40 -> p50 = rank ceil(2)= 20, p100 = 40
    assert out.p50 == 20 and out.p100 == 40


def test_conversion_lag_horizon_excludes_slow(spark):
    from datetime import datetime, timedelta

    from pyrope_spark.operators.funnel import conversion_lag_percentiles

    base = datetime(2024, 1, 1)
    rows = [
        ("a", "view", base),
        ("a", "purchase", base + timedelta(seconds=100)),
        ("b", "view", base),
        ("b", "purchase", base + timedelta(seconds=9_999_999)),  # beyond horizon
    ]
    df = spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")
    out = conversion_lag_percentiles(df, horizon_s=3600, percentiles=(1.0,)).collect()[0]
    assert out.n_converted == 1 and out.p100 == 100
