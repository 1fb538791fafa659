#!/usr/bin/env python
"""Round-4 (session 4c) scale probes: EWMA over 5M events / 1M keys,
audit query over 5M synthesized audit events, binary token-shard export at
1M docs, streaming-style bottom-k/hll fold costs at 5M. Prints one JSON
line; results recorded in PLANS.md.
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
from scale_probe_r4c import synth_events  # noqa: E402

N_EVENTS = int(os.environ.get("PROBE_EVENTS", "5000000"))
N_USERS = int(os.environ.get("PROBE_USERS", "1000000"))
N_DOCS = int(os.environ.get("PROBE_DOCS", "1000000"))


def main() -> None:
    spark = get_spark("scale_probe_r4f")
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

    # ---------------- EWMA: 5M events over 1M keys (~5 events/key)
    from pyrope_spark.operators.temporal import ewma

    timed("ewma_5M_1Mkeys", lambda: ewma(ev, 0.3).count())

    # ---------------- audit query over 5M synthesized audit events
    from pyrope_spark.operators.audit import audit_query

    audit = ev.select(
        F.concat(F.lit("e"), F.col("event_id").cast("string")).alias("event_id"),
        "ts",
        F.concat(F.lit("t"), (F.col("user_id") % 50).cast("string")).alias("tenant_id"),
        F.col("user_id").cast("string").alias("user_id"),
        F.upper(F.col("event_type")).alias("action"),
        F.lit("Index").alias("resource_type"),
        (F.col("value") > 50).alias("success"),
    )
    timed(
        "audit_query_5M",
        lambda: audit_query(audit, tenant_id="t7", action="Purchase").count(),
    )
    ev.unpersist()

    # ---------------- token shards at 1M docs (40 tokens each)
    import shutil
    import tempfile

    from pyrope_spark.operators.curation import write_token_shards

    docs = synth_docs(spark, N_DOCS).cache()
    docs.count()
    out_dir = tempfile.mkdtemp(prefix="shards_")
    try:
        manifest = timed(
            "write_token_shards_1M_docs",
            lambda: write_token_shards(
                docs, out_dir, ctx_tokens=512, n_shards=64
            ),
        )
        d["shards"] = len(manifest)
        d["shard_bytes_total"] = sum(m["n_bytes"] for m in manifest)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    docs.unpersist()

    print(json.dumps({"timings": t, "derived": d, "n_events": N_EVENTS,
                      "n_docs": N_DOCS}))


if __name__ == "__main__":
    main()
