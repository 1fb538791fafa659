"""Bucketed-table storage — the co-located-join layout for repeated joins.

At 100 TB the dominant cost of a recurring equi-join (facts x facts on a
shared key, postings x postings, store tail x delta) is re-shuffling both
sides every run. Spark's bucketing persists the shuffle INTO the layout:
``bucketBy(n, key)`` hash-splits each side's files by key at write time, and
a join between two tables bucketed the same way (same key, same n) needs no
Exchange at all — the plan goes straight to sort-merge over matching
buckets. The shuffle is paid once at write, amortized over every later join
and same-key aggregation.

Bucketed writes require the session catalog (``saveAsTable``) — plain
``.parquet(path)`` silently drops bucket metadata. These helpers wrap the
catalog plumbing so operators stay path-like.

Sizing: pick ``n_buckets`` so a bucket's rows fit one task comfortably
(~100-500 MB of parquet per bucket per table); both join sides MUST use the
same n or Spark falls back to shuffling the mismatched side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) catalog table.

    Sorting within buckets (``sortBy``) additionally removes the per-task
    Sort from later sort-merge joins — worth it for tables joined far more
    often than written.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata only survives the catalog
    path — ``spark.read.parquet`` on the files would lose it)."""
    return spark.table(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str) -> bool:
    """True when both catalog tables exist with identical bucket specs —
    the precondition for the exchange-free join."""
    cat = spark.catalog
    if not (cat.tableExists(left) and cat.tableExists(right)):
        return False

    def spec(t):
        rows = spark.sql(f"DESCRIBE EXTENDED {t}").collect()
        info = {r["col_name"]: r["data_type"] for r in rows}
        return info.get("Num Buckets"), info.get("Bucket Columns")

    return spec(left) == spec(right) and spec(left)[0] is not None


def zorder_key(cols: list, bits: int = 21):
    """Z-order (Morton) interleave of 2-3 NON-NEGATIVE integer columns into
    one BIGINT sort key — the multi-dimensional clustering layout (Delta
    OPTIMIZE ZORDER): writing files range-partitioned/sorted by this key
    gives every interleaved dimension locality, so min/max row-group
    pruning skips on ANY of them, not just the first sort column.

    ``bits`` low bits per column are interleaved (bits * ncols <= 63);
    values must fit ``bits`` (pre-bucket wider domains: ``pmod``, epoch
    div, or a rank). Pure integer bit expressions — identical in Spark and
    DuckDB, so layouts derived from it are reproducible anywhere.

    Use: ``df.repartitionByRange(n, zkey).sortWithinPartitions(zkey)
    .write...`` — one range shuffle buys multi-dimension skipping for
    every later scan.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if not 2 <= n <= 3:
        raise ValueError("zorder_key interleaves 2 or 3 columns")
    if bits * n > 63:
        raise ValueError(f"bits={bits} * {n} cols exceeds 63")
    if not all(isinstance(c, str) for c in cols):
        raise TypeError("zorder_key takes column NAMES (SQL expr strings)")
    exprs = [
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), "
        f"(acc, i) -> acc + shiftleft(shiftright(cast({c} as bigint), i) & 1, "
        f"i * {n} + {j}))"
        for j, c in enumerate(cols)
    ]
    return F.expr(" + ".join(f"({e})" for e in exprs))


def zorder_key_sql(cols: list[str], bits: int = 21) -> str:
    """DuckDB rendering of :func:`zorder_key` — identical bit layout."""
    n = len(cols)
    exprs = []
    for j, c in enumerate(cols):
        exprs.append(
            f"list_sum(list_transform(range(0, {bits}), "
            f"i -> ((CAST({c} AS BIGINT) >> i) & 1) << (i * {n} + {j})))"
        )
    return "CAST(" + " + ".join(f"({e})" for e in exprs) + " AS BIGINT)"


def write_versioned(
    df: DataFrame,
    path: str,
    *,
    note: str | None = None,
) -> int:
    """Append-only versioned parquet: each call writes ``path/v=N`` (next
    N) plus a ``manifest-N.json`` (version, row count, schema, note) and
    repoints ``LATEST``. Readers pin a version for reproducibility
    (:func:`read_versioned`) — the corpus-snapshot counterpart of the
    engine's tmp+swap state dirs, with history retained instead of
    replaced. Paired with ``curation.corpus_diff`` between two versions it
    is the dataset-versioning loop: write v(N), diff vs v(N-1), reprocess
    only the changed docs.

    Returns the version number written. Writes are atomic at the manifest
    level: data lands first, the manifest (and LATEST) only after — a
    crashed write leaves an unreferenced directory, never a half-visible
    version. Version numbers are CLAIMED with an exclusive ``os.mkdir``
    before writing (ADVICE r4): two concurrent writers racing ``listdir``
    can both pick N, but only one mkdir(v=N) succeeds; the loser retries
    N+1. Note these helpers use driver-local filesystem APIs (listdir /
    open / replace) — they assume ``path`` is a posix-visible directory
    (local disk, NFS, or a FUSE object-store mount with atomic rename).
    On a raw object store, port the manifest/LATEST pointers to a
    transactional table format (Delta/Iceberg) instead.
    """
    import json
    import os

    os.makedirs(path, exist_ok=True)
    versions = [
        int(d.split("=")[1])
        for d in os.listdir(path)
        if d.startswith("v=") and os.path.isdir(os.path.join(path, d))
    ]
    n = max(versions) + 1 if versions else 1
    while True:
        vdir = os.path.join(path, f"v={n}")
        try:
            os.mkdir(vdir)  # exclusive claim of this version number
            break
        except FileExistsError:
            n += 1
    df.write.mode("overwrite").parquet(vdir)
    spark = df.sparkSession
    count = spark.read.parquet(vdir).count()
    manifest = {
        "version": n,
        "count": count,
        "schema": df.schema.jsonValue(),
        "note": note,
    }
    mtmp = os.path.join(path, f".manifest-{n}.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, os.path.join(path, f"manifest-{n}.json"))
    ltmp = os.path.join(path, ".LATEST.tmp")
    with open(ltmp, "w") as f:
        f.write(str(n))
    os.replace(ltmp, os.path.join(path, "LATEST"))
    return n


def read_versioned(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a pinned version (default: LATEST). Refuses versions without a
    manifest (half-written data is invisible by construction)."""
    import os

    if version is None:
        with open(os.path.join(path, "LATEST")) as f:
            version = int(f.read().strip())
    if not os.path.isfile(os.path.join(path, f"manifest-{version}.json")):
        raise FileNotFoundError(f"version {version} has no manifest under {path}")
    return spark.read.parquet(os.path.join(path, f"v={version}"))


def list_versions(path: str) -> list[dict]:
    """Manifests, ascending by version."""
    import json
    import os

    out = []
    for fn in os.listdir(path):
        if fn.startswith("manifest-") and fn.endswith(".json"):
            with open(os.path.join(path, fn)) as f:
                out.append(json.load(f))
    return sorted(out, key=lambda m: m["version"])


def forget_keys(
    spark: SparkSession,
    table_paths: dict[str, str],
    keys_df: DataFrame,
    *,
    key_col: str,
    audit_log_path: str | None = None,
) -> dict[str, int]:
    """Right-to-be-forgotten batch job: remove every row matching the key
    set from each parquet table, atomically per table (tmp + swap — the
    engine's state-dir discipline), and append one audit event per table
    when ``audit_log_path`` is given (the reference's AuditLogger pattern:
    compliance deletes must leave a trail).

    ``table_paths``: {logical name: parquet dir}. Tables missing the key
    column are skipped (reported as -1). The rewrite is one anti-join per
    table — broadcast when the key set is small, the common GDPR case.

    Returns {table: rows_removed} (and writes the audit trail). At 100 TB,
    run against partition-pruned paths (partition the tables by a key hash
    range so each forget touches only matching partitions) — the full
    rewrite here is the correctness-grade path.
    """
    import os
    import shutil
    import uuid
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    keys = keys_df.select(F.col(key_col)).distinct().cache()
    n_keys = keys.count()
    removed: dict[str, int] = {}
    audit_rows = []
    for name, path in table_paths.items():
        df = spark.read.parquet(path)
        if key_col not in df.columns:
            removed[name] = -1
            continue
        before = df.count()
        kept = df.join(F.broadcast(keys), key_col, "left_anti")
        tmp = path.rstrip("/") + ".tmp-forget"
        kept.write.mode("overwrite").parquet(tmp)
        after = spark.read.parquet(tmp).count()
        # swap discipline (ADVICE r4): rename the live dir ASIDE first, then
        # promote tmp, then drop the backup — every crash point leaves a
        # recoverable directory at a known name (rmtree-then-replace had a
        # window where the data existed only in .tmp-forget). Mirrors the
        # update_bm25_index convention (fulltext.py).
        bak = path.rstrip("/") + ".bak-forget"
        if os.path.isdir(bak):
            shutil.rmtree(bak)
        os.replace(path, bak)
        os.replace(tmp, path)
        shutil.rmtree(bak)
        removed[name] = before - after
        audit_rows.append((
            uuid.uuid4().hex,
            datetime.now(timezone.utc).replace(tzinfo=None),
            None, None, "FORGET_KEYS", "Table", name,
            f'{{"keys": {n_keys}, "rows_removed": {before - after}}}',
            None, True,
        ))
    keys.unpersist()
    if audit_log_path and audit_rows:
        from pyrope_spark.operators.audit import AUDIT_SCHEMA, append_audit_events

        append_audit_events(
            spark.createDataFrame(audit_rows, AUDIT_SCHEMA), audit_log_path
        )
    return removed
