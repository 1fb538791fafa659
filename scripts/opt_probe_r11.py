#!/usr/bin/env python
"""r11 optimization probe: time declared queries in isolation (noop sink,
min of N) and capture .explain("formatted") plans + plan-shape counters
(Exchange / BatchEvalPython / ArrowEvalPython / join strategy /
PushedFilters presence).

Outputs:
  - plans/r11/<query>_probe.txt   (formatted plan; copied to *_before.txt
    for queries the round actually touches)
  - OPT_PROBE_r11.json            {name: {sec, exchanges, py_nodes, ...}}

Usage: python scripts/opt_probe_r11.py [--repeat N|--repeat=N] [name ...]
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
PLANS = "/root/repo/plans/r11"
OUT = "/root/repo/OPT_PROBE_r11.json"


def main() -> int:
    import __spark_entry__ as entrymod
    from pyrope_spark.session import get_spark

    argv = sys.argv[1:]
    args: list[str] = []
    repeat = 2
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--repeat="):
            repeat = int(a.split("=")[1])
        elif a == "--repeat":
            i += 1
            repeat = int(argv[i])
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    os.makedirs(PLANS, exist_ok=True)
    spark = get_spark("opt_probe_r11")
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
            build_s = time.time() - t_start
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
                "build_s": round(build_s, 3),
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
