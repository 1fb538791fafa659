#!/usr/bin/env python
"""Fold a round's driver correctness artifact into the coverage-gate map.

The driver's CORRECTNESS_r{N}.json samples only the FIRST 50 registered
queries; ``pyrope_spark/queries.py`` orders the registry so queries without
a prior driver-green row register first (VERDICT r4 What's-wrong #2).
This script records which queries got their first driver-artifact green row
in a new artifact, so the next round's ordering rotates coverage onward.

Usage:
  python scripts/update_coverage_gate.py CORRECTNESS_r05.json r05
"""

from __future__ import annotations

import json
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = os.path.join(REPO, "pyrope_spark", "coverage_gate.json")


def main() -> None:
    artifact, label = sys.argv[1], sys.argv[2]
    with open(os.path.join(REPO, artifact)) as f:
        rows = json.load(f)
    with open(GATE) as f:
        gate = json.load(f)
    added = []
    for name, res in rows.items():
        green = (res.get("rows_match") and res.get("schema_match")
                 and res.get("hash_match") is not False and not res.get("err"))
        if green and name not in gate:
            gate[name] = label
            added.append(name)
    with open(GATE, "w") as f:
        json.dump(gate, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"added {len(added)} first-green rows: {added}")


if __name__ == "__main__":
    main()
