#!/usr/bin/env python
"""Round-over-round bench comparison with contention adjudication
(VERDICT r8 What's-wrong #1 / Next-round #3).

Usage: python scripts/bench_compare.py OLD.json NEW.json [--threshold 1.5]

Reads two BENCH_full artifacts and prints:
- the contention-sentinel verdict: if NEW's fixed calibration micro-tasks
  (512x512 numpy GEMM on the driver, 20M-row codegen agg on the
  executors) run >1.2x slower than OLD's, every timing in NEW is suspect
  — the host was loaded, not the code (r8's driver run was uniformly
  ~1.4x inflated by a co-tenant Spark JVM and nothing in the artifact
  could say so);
- per-entry moves beyond --threshold in either direction, compared on
  "min_n" where both artifacts have it (isolated post-clearCache min-of-3
  — the noise-proof number) and on in-suite "queries" otherwise;
- the suite totals.

Exit code 0 always — this is a report, not a gate; the sf-correctness
gates are the pass/fail surface.
"""

from __future__ import annotations

import argparse
import json
import sys

CALIB_TOLERANCE = 1.2


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def calib_ratio(old: dict, new: dict) -> tuple[float | None, list[str]]:
    """Worst new/old ratio across the calibration micro-tasks (start and
    end probes each), or None if either artifact predates the sentinel."""
    so, sn = old.get("sentinel"), new.get("sentinel")
    if not so or not sn:
        return None, []
    notes = []
    worst = 0.0
    for phase in ("start", "end"):
        po, pn = so.get(phase, {}), sn.get(phase, {})
        for key in ("calib_numpy_s", "calib_spark_s"):
            if key in po and key in pn and po[key] > 0:
                r = pn[key] / po[key]
                worst = max(worst, r)
                notes.append(f"  {phase}.{key}: {po[key]} -> {pn[key]} ({r:.2f}x)")
        if "loadavg_1m" in po and "loadavg_1m" in pn:
            notes.append(
                f"  {phase}.loadavg_1m: {po['loadavg_1m']} -> {pn['loadavg_1m']}"
            )
    return (worst if worst > 0 else None), notes


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)

    ratio, notes = calib_ratio(old, new)
    contended = ratio is not None and ratio > CALIB_TOLERANCE
    print(f"suite total: {old.get('value')} s -> {new.get('value')} s")
    if ratio is None:
        print("sentinel: not present in both artifacts (pre-r9 run) — "
              "timing moves cannot be adjudicated for host contention")
    else:
        verdict = (
            f"CONTENDED (worst calibration {ratio:.2f}x > {CALIB_TOLERANCE}x"
            " — treat every slowdown below as suspect)"
            if contended
            else f"clean (worst calibration {ratio:.2f}x <= {CALIB_TOLERANCE}x)"
        )
        print(f"sentinel: {verdict}")
        for n in notes:
            print(n)

    def section(title: str, o: dict, n: dict) -> None:
        moved = []
        for k in sorted(set(o) & set(n)):
            vo, vn = o[k], n[k]
            if (
                isinstance(vo, (int, float))
                and isinstance(vn, (int, float))
                and vo > 0
                and vn > 0
            ):
                r = vn / vo
                if r > args.threshold or r < 1 / args.threshold:
                    moved.append((r, k, vo, vn))
        print(f"\n{title}: {len(moved)} entries moved >{args.threshold}x "
              f"(of {len(set(o) & set(n))} shared)")
        for r, k, vo, vn in sorted(moved, reverse=True):
            flag = " [suspect: contended run]" if contended and r > 1 else ""
            print(f"  {k}: {vo} -> {vn} ({r:.2f}x){flag}")

    section("min_n (isolated, compare here first)",
            old.get("min_n", {}), new.get("min_n", {}))
    section("queries (in-suite)", old.get("queries", {}), new.get("queries", {}))
    sys.exit(0)


if __name__ == "__main__":
    main()
