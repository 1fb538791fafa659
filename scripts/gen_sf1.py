#!/usr/bin/env python
"""Generate an sf1-equivalent synthetic dir (VERDICT r7 Next #7): 10x the
sf0.1 tables, built by key-shifted copies so the correctness gate can run
at 10x the usual scale.

Both engines (Spark and the DuckDB oracle) read the SAME parquet, so any
well-formed data is a valid correctness probe; the copies are shaped to
keep query behavior realistic rather than pathological:

- every key column (and its foreign references) shifts by copy_i * OFFSET,
  so join fan-outs stay 1:1 instead of exploding 10x;
- document text gets a per-copy prefix token (identical 10x texts would
  turn every doc into a 10-way duplicate cluster and inflate all pair
  queries 45x); n_chars tracks the new length;
- embeddings get a tiny per-copy additive shift for the same reason;
- region/nation (dimension tables referenced by nationkey) stay single-copy.

Writes to $SF1_DIR (default /tmp/pyrope_sf1). ~6M lineitem rows at the
default $SF1_COPIES=10; SF1_COPIES=3 builds the sf0.3-equivalent dir
used to close the sf1-infeasible-oracle gap (r8 VERDICT #5).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SF1_DIR", "/tmp/pyrope_sf1")
COPIES = int(os.environ.get("SF1_COPIES", "10"))
OFF = 1_000_000_000  # > any sf0.1 key


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE copies AS SELECT unnest(generate_series(0, {COPIES - 1})) AS i"
    )

    def gen(table: str, select_sql: str) -> None:
        con.execute(
            f"COPY ({select_sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{DST}/{table}.parquet'"
        ).fetchone()[0]
        print(f"[gen] {table}: {n} rows")

    for t in ("region", "nation"):
        gen(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    gen("customer", f"""
        SELECT c_custkey + i * {OFF} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet', copies""")
    gen("supplier", f"""
        SELECT s_suppkey + i * {OFF} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM '{SRC}/supplier.parquet', copies""")
    gen("part", f"""
        SELECT p_partkey + i * {OFF} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM '{SRC}/part.parquet', copies""")
    gen("orders", f"""
        SELECT o_orderkey + i * {OFF} AS o_orderkey,
               o_custkey + i * {OFF} AS o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', copies""")
    gen("lineitem", f"""
        SELECT l_orderkey + i * {OFF} AS l_orderkey,
               l_partkey + i * {OFF} AS l_partkey,
               l_suppkey + i * {OFF} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', copies""")
    gen("events", f"""
        SELECT event_id + i * {OFF} AS event_id, ts,
               user_id + i * {OFF} AS user_id, event_type, value, props
        FROM '{SRC}/events.parquet', copies""")
    gen("documents", f"""
        SELECT doc_id + i * {OFF} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE 'cp' || i || ' ' || text END AS text,
               lang, source,
               CASE WHEN i = 0 THEN n_chars
                    ELSE n_chars + length('cp' || i || ' ') END AS n_chars
        FROM '{SRC}/documents.parquet', copies""")
    gen("embeddings", f"""
        SELECT vec_id + i * {OFF} AS vec_id,
               list_transform(embedding,
                              e -> CAST(e + i * 0.0011 AS FLOAT)) AS embedding,
               label
        FROM '{SRC}/embeddings.parquet', copies""")
    print(f"[gen] done -> {DST}")


if __name__ == "__main__":
    sys.exit(main())
