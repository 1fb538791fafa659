#!/usr/bin/env python
"""Label-noise detector quality sweep: planted flip rates on separable
synthetic clusters -> precision/recall of label_noise_scan at k=5.
Results recorded in RECALL.md (re-run after detector changes)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F  # noqa: F401

from pyrope_spark.operators.similarity import label_noise_scan
from pyrope_spark.session import get_spark


def main() -> None:
    spark = get_spark("noise_sweep")
    rng = np.random.default_rng(42)
    n_per, n_clusters, dim, sep = 200, 5, 16, 4.0
    centers = rng.normal(0, sep, (n_clusters, dim))
    rows = []
    true_label = {}
    for c in range(n_clusters):
        pts = centers[c] + rng.normal(0, 1.0, (n_per, dim))
        for i, p in enumerate(pts):
            vid = c * n_per + i
            rows.append((vid, c, [float(x) for x in p]))
            true_label[vid] = c

    print("| flip rate | flipped | flagged | precision | recall |")
    print("| --- | --- | --- | --- | --- |")
    for rate in (0.02, 0.05, 0.10, 0.20):
        r2 = np.random.default_rng(7)
        flipped = set()
        out_rows = []
        for vid, c, v in rows:
            lbl = c
            if r2.random() < rate:
                lbl = (c + 1 + int(r2.integers(0, n_clusters - 1))) % n_clusters
                flipped.add(vid)
            out_rows.append((vid, lbl, v))
        df = spark.createDataFrame(
            out_rows, "vec_id long, label int, embedding array<float>"
        )
        res = label_noise_scan(df, k=5, mode="arrow").collect()
        flagged = {r["vec_id"] for r in res if r["flagged"]}
        tp = len(flagged & flipped)
        prec = tp / len(flagged) if flagged else 1.0
        rec = tp / len(flipped) if flipped else 1.0
        print(
            f"| {rate:.2f} | {len(flipped)} | {len(flagged)} "
            f"| {prec:.3f} | {rec:.3f} |"
        )


if __name__ == "__main__":
    main()
