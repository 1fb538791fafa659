#!/usr/bin/env python
"""sf1-sample correctness gate (VERDICT r7 Next #7): run the most
expensive ORACLED queries at 10x the driver's bench scale (the
key-shifted sf1-equivalent dir from scripts/gen_sf1.py) through the same
strict compare as driver_check — committed per round as
CORRECTNESS_r8_sf1-sample.json.

The 20 names are the top oracled entries of BENCH_full_r07.json by
in-suite cost (synthetic-vector and streaming bench-only entries
excluded — they have no sf-dir input).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import driver_check as dc  # noqa: E402

TOP20 = [
    "ngram_novelty_per_doc",
    "quality_clf_train_score_docs",
    "source_shingle_overlap",
    "winnowing_fingerprints",
    "bpe_merges",
    "embedding_norm_outliers",
    "greedy_coverage_selection",
    "containment_dup_pairs",
    "cdc_chunking",
    "dsir_importance_resample",
    "kcore_copurchase",
    "bm25_prf_search",
    "triangle_copurchase",
    "chunk_documents_strided",
    "setsim_prefix_join",
    "fd_discovery_matrix",
    "frequent_triples_baskets",
    "duplicate_passages",
    "community_modularity_lpa",
    "split_leakage_audit",
]


def main() -> int:
    sf1 = os.environ.get("SF1_DIR", "/tmp/pyrope_sf1")
    if not os.path.isdir(sf1):
        raise SystemExit(f"{sf1} missing - run scripts/gen_sf1.py first")
    dc.SF_T2 = sf1
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CORRECTNESS_r8_sf1-sample.json",
    )
    return dc.main([*TOP20, "--json", out])


if __name__ == "__main__":
    raise SystemExit(main())
