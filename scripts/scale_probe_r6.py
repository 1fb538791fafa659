#!/usr/bin/env python
"""Round-6 event-scale probes (VERDICT r5 ask #8): the four round-5
session-3 additions that never had a PLANS probe row — retention_curve,
frequent_path_trigrams, funnel_within_24h, growth_accounting — run as the
EXACT registered queries against a synthetic 5M-event / 200k-user log
written to a temp sf dir (same schema as testdata events.parquet), so the
probe measures the shipped plan, not a rephrasing. Also records each
query's executed-plan Exchange count: all four should be 1-3-shuffle
linear shapes. One JSON line at the end."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pyrope_spark.session import get_spark  # noqa: E402

PARTS = 32
N = 5_000_000
N_USERS = 200_000
SF_DIR = "/tmp/probe_r6_sf"
out: dict = {}


def timed(name, fn):
    t0 = time.time()
    r = fn()
    out[name] = round(time.time() - t0, 1)
    print(f"[probe] {name}: {out[name]}s -> {r}", flush=True)


def synth_events(spark):
    """events-parquet-shaped log: per user a signup event on a random day,
    then view/click/purchase/error traffic over 180 days (sessions emerge
    from timestamp clustering)."""

    def gen(it):
        import pandas as pd

        types = np.array(["view", "click", "purchase", "error"])
        for pdf in it:
            for pid in pdf["pid"]:
                rng = np.random.default_rng(11 + int(pid))
                lo, hi = int(pid) * N // PARTS, (int(pid) + 1) * N // PARTS
                rows = hi - lo
                uid = rng.integers(0, N_USERS, rows)
                # ~4% signup rows, rest weighted traffic
                r = rng.random(rows)
                et = np.where(
                    r < 0.04,
                    "signup",
                    types[rng.choice(4, rows, p=[0.5, 0.3, 0.1, 0.1])],
                )
                tse = rng.integers(1_700_000_000, 1_715_552_000, rows)
                yield pd.DataFrame(
                    {
                        "event_id": np.arange(lo, hi, dtype=np.int64),
                        "tse": tse,
                        "user_id": uid.astype(np.int64),
                        "event_type": et,
                        "value": np.round(rng.random(rows) * 100, 2),
                        "props": '{"k": 1}',
                    }
                )

    base = spark.createDataFrame(
        [(i,) for i in range(PARTS)], "pid int"
    ).repartition(PARTS)
    return base.mapInPandas(
        gen,
        "event_id long, tse long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.to_timestamp(F.from_unixtime("tse")).alias("ts"),
        "user_id", "event_type", "value", "props",
    )


def main():
    spark = get_spark("probe_r6")
    shutil.rmtree(SF_DIR, ignore_errors=True)
    os.makedirs(SF_DIR, exist_ok=True)
    synth_events(spark).write.mode("overwrite").parquet(
        os.path.join(SF_DIR, "events.parquet")
    )

    import __spark_entry__ as entry

    qs = entry.queries()

    def run(name, force):
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out[f"{name}_exchanges"] = plan.count("Exchange")
        timed(f"{name}_5M_200kusers", lambda: force(df))

    run("retention_curve", lambda df: len(df.collect()))
    run("frequent_path_trigrams", lambda df: len(df.collect()))
    run("growth_accounting", lambda df: len(df.collect()))
    # per-user output: aggregate a COMPUTED column so Catalyst cannot prune
    # the funnel steps (the .count() probe trap)
    run(
        "funnel_within_24h",
        lambda df: df.agg(
            F.count("*"), F.sum("max_step"), F.sum("duration_us")
        ).collect()[0][0],
    )

    shutil.rmtree(SF_DIR, ignore_errors=True)
    print(json.dumps({"probe": "r6_event_scale", "n_events": N, **out}))


if __name__ == "__main__":
    main()
