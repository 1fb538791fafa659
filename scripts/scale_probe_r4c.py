#!/usr/bin/env python
"""Round-4 (session 3) scale probes: duplicate passages at 1M docs,
CMS sketch at 1M docs, gapfill / funnel / cohort retention at 5M events
over 10k users. Prints one JSON line; results recorded in PLANS.md.

Passages run with fingerprint='xxhash64' (the production path — the
portable char_fp mode exists for the oracle); everything else runs the
same code the driver queries use.
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
from scale_probe_r4 import synth_docs  # noqa: E402

N_DOCS = int(os.environ.get("PROBE_DOCS", "1000000"))
N_EVENTS = int(os.environ.get("PROBE_EVENTS", "5000000"))
N_USERS = int(os.environ.get("PROBE_USERS", "10000"))


def synth_events(spark, n, users):
    """Deterministic events: hash-mixed second offsets over 30 days,
    5 event types."""
    types = F.array(*[F.lit(t) for t in ["view", "click", "purchase", "error", "signup"]])
    sec = F.pmod(F.col("id") * 2654435761, F.lit(30 * 86400))
    return spark.range(n).select(
        (F.col("id") % users).alias("user_id"),
        F.timestamp_seconds(F.lit(1704067200) + sec).alias("ts"),
        # mix the per-user event index in, or the type is constant per user
        # (40503 * users % 5 == 0 for users a multiple of 5)
        F.element_at(
            types,
            (
                F.pmod(
                    F.col("id") * 40503 + (F.col("id") / users).cast("long") * 7919,
                    F.lit(5),
                )
                + 1
            ).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.col("id") * 69069, F.lit(1000)) / 10.0).alias("value"),
    )


def main() -> None:
    spark = get_spark("scale_probe_r4c")
    t: dict[str, float] = {}
    d: dict = {}

    def timed(name, fn):
        t0 = time.time()
        r = fn()
        t[name] = round(time.time() - t0, 1)
        print(f"[probe] {name}: {t[name]}s -> {r}", file=sys.stderr)
        return r

    docs = synth_docs(spark, N_DOCS).cache()
    timed("gen_docs_1M", docs.count)

    from pyrope_spark.operators.passages import duplicate_passages

    d["passage_spans"] = timed(
        f"duplicate_passages_{N_DOCS}d_w8_xxh",
        lambda: duplicate_passages(docs, window=8, fingerprint="xxhash64").count(),
    )

    from pyrope_spark.operators.sketch import cms_build, cms_estimate

    def cms():
        sk = cms_build(docs, depth=4, width=65536).cache()
        n = sk.count()
        d["cms_rows"] = n
        return n

    timed(f"cms_build_{N_DOCS}d_d4_w65536", cms)
    probe_terms = spark.range(1000).select(
        F.concat(F.lit("w"), F.col("id") * 50).alias("term")
    )
    sk = cms_build(docs, depth=4, width=65536).cache()
    sk.count()
    d["cms_est_terms"] = timed(
        "cms_estimate_1000terms",
        lambda: cms_estimate(sk, probe_terms, depth=4, width=65536).count(),
    )
    docs.unpersist()

    ev = synth_events(spark, N_EVENTS, N_USERS).cache()
    timed("gen_events_5M", ev.count)

    from pyrope_spark.operators.temporal import gapfill

    d["gapfill_rows"] = timed(
        f"gapfill_{N_EVENTS}e_{N_USERS}u_1h",
        lambda: gapfill(
            ev, key_cols=["user_id"], bucket_s=3600, observation_round=6
        ).count(),
    )

    from pyrope_spark.operators.funnel import cohort_retention, funnel

    d["funnel_rows"] = timed(
        f"funnel_{N_EVENTS}e_3steps",
        lambda: funnel(
            ev, steps=["view", "click", "purchase"], within_s=86400
        ).count(),
    )
    d["cohort_rows"] = timed(
        f"cohort_retention_{N_EVENTS}e_weekly",
        lambda: cohort_retention(ev, period_s=7 * 86400).count(),
    )

    print(json.dumps({"timings_s": t, "derived": d}))


if __name__ == "__main__":
    main()
