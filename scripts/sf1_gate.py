#!/usr/bin/env python
"""sf1-sample correctness gate (VERDICT r7 Next #7): run the most
expensive ORACLED queries at 10x the driver's bench scale (the
key-shifted sf1-equivalent dir from scripts/gen_sf1.py) through the same
strict compare as driver_check — committed per round as
CORRECTNESS_r8_sf1-sample.json.

The 20 names are the top oracled entries of BENCH_full_r07.json by
in-suite cost (synthetic-vector and streaming bench-only entries
excluded — they have no sf-dir input; quality_clf_train_score_docs is a
bench-only MLlib entry, so embedding_neardup_blocked takes its slot;
greedy_coverage_selection's DuckDB twin replays the greedy set-cover
loop — iteration x corpus-sized scans — and blew the 30 GB temp cap at
sf1 while the Spark operator finished fine, so events_gapfill takes its
slot and greedy coverage stays sf0.1-gated).

Three more sf1-ORACLE-infeasible swaps, all with the Spark side green
and the DuckDB twin the bottleneck: kcore_copurchase and
triangle_copurchase (iterative peeling / triangle join over the 10x
co-purchase pair table exceed the 30 GB DuckDB temp cap) ->
join_strategy_advice + semantic_dedup; setsim_prefix_join (the prefix
candidate join runs single-threaded in DuckDB's list kernels — killed
after 25 min) -> vocab_coverage_curve. All four excluded queries remain
hash-green at sf0.01 + sf0.1 in the full gate.

Each query gets its OWN DuckDB connection with an explicit temp
directory and a hard temp-size cap: the first gate run at this scale
spilled >40 GB of DuckDB sort temp into the repo cwd before any result —
one runaway oracle must fail loudly, not fill the disk.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import driver_check as dc  # noqa: E402

TOP20 = [
    "ngram_novelty_per_doc",
    "embedding_neardup_blocked",
    "source_shingle_overlap",
    "winnowing_fingerprints",
    "bpe_merges",
    "embedding_norm_outliers",
    "events_gapfill",
    "containment_dup_pairs",
    "cdc_chunking",
    "dsir_importance_resample",
    "join_strategy_advice",
    "bm25_prf_search",
    "semantic_dedup",
    "chunk_documents_strided",
    "vocab_coverage_curve",
    "fd_discovery_matrix",
    "frequent_triples_baskets",
    "duplicate_passages",
    "community_modularity_lpa",
    "split_leakage_audit",
]

SPILL = "/tmp/pyrope_sf1_duckspill"


def main() -> int:
    sf1 = os.environ.get("SF1_DIR", "/tmp/pyrope_sf1")
    if not os.path.isdir(sf1):
        raise SystemExit(f"{sf1} missing - run scripts/gen_sf1.py first")

    import __spark_entry__ as entrymod
    from pyrope_spark.catalog import TABLES
    from pyrope_spark.session import get_spark

    spark = get_spark("sf1_gate")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CORRECTNESS_r8_sf1-sample.json",
    )
    # resume: green rows from a prior (crashed/partial) run are kept
    results: dict[str, dict] = {}
    if os.path.exists(out):
        with open(out) as f:
            results = {
                k: v for k, v in json.load(f).items() if v.get("hash_match")
            }
    failures: list[str] = []

    for name in TOP20:
        if name in results:
            print(f"[skip] {name}: green in prior run", flush=True)
            continue
        t0 = time.time()
        row = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        try:
            mine = qs[name](spark, sf1).toPandas()
            row["spark_rows"] = len(mine)
            spark_s = time.time() - t0
            os.makedirs(SPILL, exist_ok=True)
            con = duckdb.connect()
            con.execute(f"SET temp_directory='{SPILL}'")
            con.execute("SET max_temp_directory_size='30GB'")
            con.execute("SET memory_limit='48GB'")
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{sf1}/{t}.parquet'"
                )
            t1 = time.time()
            oracle = con.execute(oracles[name]).df()
            con.close()
            row["oracle_rows"] = len(oracle)
            a, b = dc.canon(mine), dc.canon(oracle)
            status = []
            row["rows_match"] = len(a) == len(b)
            if not row["rows_match"]:
                status.append(f"rowcount {len(a)} != {len(b)}")
            row["schema_match"] = list(a.columns) == list(b.columns)
            if not row["schema_match"]:
                status.append(f"cols {list(a.columns)} != {list(b.columns)}")
            if row["schema_match"] and list(a.dtypes) != list(b.dtypes):
                diffs = [f"{c}: spark={da} oracle={db}"
                         for c, da, db in zip(a.columns, a.dtypes, b.dtypes)
                         if da != db]
                status.append(f"dtypes differ: {diffs}")
            if not status:
                try:
                    pd.testing.assert_frame_equal(
                        a, b, check_dtype=True, check_exact=False,
                        rtol=0, atol=2e-6,
                    )
                    row["hash_match"] = True
                except AssertionError as exc:
                    status.append(f"values differ: {str(exc)[:300]}")
            row["err"] = "; ".join(status) or None
            if status:
                failures.append(name)
                print(f"[FAIL] {name}: {'; '.join(status)}", flush=True)
            else:
                print(
                    f"[OK]   {name}: {len(a)} rows match "
                    f"(spark {spark_s:.1f}s, oracle {time.time() - t1:.1f}s)",
                    flush=True,
                )
        except Exception as exc:  # noqa: BLE001
            row["err"] = str(exc)[:300]
            failures.append(name)
            print(f"[FAIL] {name}: {row['err']}", flush=True)
        finally:
            shutil.rmtree(SPILL, ignore_errors=True)
        results[name] = row
        # incremental write: a crash mid-run never loses green rows
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")

    with open(out, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(f"\n{len(failures)} failures"
          + (f": {failures}" if failures else "") + f"\nwrote {out}",
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
