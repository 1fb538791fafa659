#!/usr/bin/env python
"""Round-5 scale probes (VERDICT r4 Next #8): the round-4 session-4
analytics additions at 5M+ events — value_histogram, check_expectations,
categorical_stats, counter_rate, concurrency_curve. All five are one-to-
two-shuffle linear shapes by design; this run pins the evidence. Prints
one JSON line; results recorded in PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from pyrope_spark.session import get_spark  # noqa: E402
from scale_probe_r4c import synth_events  # noqa: E402

N_EVENTS = int(os.environ.get("PROBE_EVENTS", "5000000"))
N_USERS = int(os.environ.get("PROBE_USERS", "1000000"))


def n_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange"
    )


def main() -> None:
    spark = get_spark("scale_probe_r5")
    t: dict[str, float] = {}
    d: dict = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 1)
        print(f"[probe] {name}: {t[name]}s", file=sys.stderr)
        return out

    ev = synth_events(spark, N_EVENTS, N_USERS).withColumn(
        "event_id", F.monotonically_increasing_id()
    ).cache()
    ev.count()

    # ---------------- equi-width histogram: two linear passes
    from pyrope_spark.operators.profile import check_expectations, value_histogram

    # probe trap (session-workflow memory): .count() lets Catalyst prune
    # the expensive columns — force each probe with an agg OVER the
    # computed column instead
    hist = value_histogram(ev, "value", n_bins=50)
    timed("value_histogram_5M", lambda: hist.agg(F.sum("cnt")).collect())
    d["value_histogram_exchanges"] = n_exchanges(hist)

    # ---------------- data-quality gate: one aggregate + one count-distinct
    rules = [
        {"name": "user_not_null", "kind": "not_null", "col": "user_id"},
        {"name": "value_min", "kind": "min", "col": "value", "value": 0},
        {"name": "value_max", "kind": "max", "col": "value", "value": 99.9},
        {"name": "type_regex", "kind": "regex", "col": "event_type",
         "pattern": "^[a-z]+$"},
        {"name": "event_unique", "kind": "unique", "col": "event_id"},
    ]
    exp = check_expectations(ev, rules)
    timed(
        "check_expectations_5M_5rules",
        lambda: exp.agg(F.sum("violations")).collect(),
    )

    # ---------------- per-group categorical profile over 1M groups
    from pyrope_spark.operators.analytics import categorical_stats

    cat = categorical_stats(ev, ["user_id"], "event_type")
    timed(
        "categorical_stats_5M_1Mgroups",
        lambda: cat.agg(F.sum("gini_impurity"), F.sum("mode_count")).collect(),
    )
    d["categorical_stats_exchanges"] = n_exchanges(cat)

    # ---------------- counter rate over 1M keys (~5 samples/key)
    from pyrope_spark.operators.temporal import concurrency_curve, counter_rate

    rate = counter_rate(ev)
    timed(
        "counter_rate_5M_1Mkeys", lambda: rate.agg(F.sum("rate")).collect()
    )
    d["counter_rate_exchanges"] = n_exchanges(rate)

    # ---------------- concurrency curve over 5M intervals
    iv = ev.select(
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.make_interval(secs=F.lit(600) + F.col("value"))).alias(
            "end_ts"
        ),
    )
    curve = concurrency_curve(iv)
    timed(
        "concurrency_curve_5M_intervals",
        lambda: curve.agg(F.max("concurrent"), F.count(F.lit(1))).collect(),
    )
    d["concurrency_curve_rows"] = curve.count()

    print(json.dumps({"probe": "r5_analytics_scale", "n_events": N_EVENTS,
                      "timings_s": t, "derived": d}))


if __name__ == "__main__":
    main()
