#!/usr/bin/env python
"""r10 optimization probe: time EVERY declared query in isolation (noop
sink, min of N) and capture its .explain("formatted") plan + plan-shape
counters (Exchange / BatchEvalPython / ArrowEvalPython / joins strategy /
PushedFilters presence).

Outputs:
  - plans/r10/<query>_probe.txt   (formatted plan; renamed *_before.txt
    for queries the round actually touches)
  - OPT_PROBE_r10.json            {name: {sec, exchanges, py_nodes, ...}}

Usage: python scripts/opt_probe_r10.py [--repeat N] [--sf DIR] [name ...]
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS = "/root/repo/plans/r10"
OUT = "/root/repo/OPT_PROBE_r10.json"


def main() -> int:
    import __spark_entry__ as entrymod
    from pyrope_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeat = 2
    for a in sys.argv[1:]:
        if a.startswith("--repeat="):
            repeat = int(a.split("=")[1])
    os.makedirs(PLANS, exist_ok=True)
    spark = get_spark("opt_probe_r10")
    qs = entrymod.queries()
    names = args or sorted(qs)
    results: dict[str, dict] = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    for i, name in enumerate(names):
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t_start = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            with open(f"{PLANS}/{name}_probe.txt", "w") as f:
                f.write(plan)
            best = None
            for _ in range(repeat):
                t0 = time.time()
                df = qs[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            results[name] = {
                "sec": round(best, 3),
                "build_s": round(t_start and 0, 3),
                "exchanges": plan.count("Exchange"),
                "aqe_reads": plan.count("AQEShuffleRead"),
                "batch_eval_py": plan.count("BatchEvalPython"),
                "arrow_eval_py": plan.count("ArrowEvalPython"),
                "map_in_py": plan.count("MapInPandas") + plan.count("MapInArrow"),
                "smj": plan.count("SortMergeJoin"),
                "bhj": plan.count("BroadcastHashJoin"),
                "shj": plan.count("ShuffledHashJoin"),
                "bnlj": plan.count("BroadcastNestedLoopJoin"),
                "cartesian": plan.count("CartesianProduct"),
                "scans": plan.count("Scan parquet"),
                "pushed": plan.count("PushedFilters: ["),
                "pushed_empty": plan.count("PushedFilters: []"),
            }
        except Exception as e:  # keep probing; record the failure
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        spark.catalog.clearCache()
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"[{i + 1}/{len(names)}] {name}: "
              f"{results[name].get('sec', results[name].get('error'))}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
