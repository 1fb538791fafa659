"""Table maintenance: small-file compaction with layout preservation.

The 100 TB operational reality: streaming ingest, incremental dedup and
per-shard writers leave behind thousands of KB-scale parquet files, and
scan cost at that point is dominated by file-open/footer overhead, not
bytes. Compaction rewrites a directory into ~``target_mb`` files:

- size-aware: output file count = ceil(bytes / target_mb), never a blind
  ``coalesce(1)``;
- layout-preserving: pass ``sort_cols`` (e.g. the table's z-order key —
  ``storage.zorder_key``) to repartitionByRange + sortWithinPartitions so
  min/max row-group pruning survives the rewrite; without sort_cols a
  plain repartition balances bytes;
- atomic: tmp + rename-aside swap (the repo-wide state-swap discipline) —
  readers never see a half-compacted directory, any crash leaves a
  readable table at a known name;
- verified: row count compared before/after inside the job; a mismatch
  aborts BEFORE the swap.

Returns a report row (files/bytes before and after, rows) — the input to
a compact-when-worthwhile scheduling policy (files_before >>
files_after).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _dir_stats(path: str) -> tuple[int, int]:
    files = bytes_ = 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                files += 1
                bytes_ += os.path.getsize(os.path.join(root, n))
    return files, bytes_


def compact_small_files(
    spark: SparkSession,
    path: str,
    *,
    target_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite ``path`` into ~target_mb parquet files; see module doc."""
    files_before, bytes_before = _dir_stats(path)
    df = spark.read.parquet(path)
    rows_before = df.count()
    n_out = max(1, -(-bytes_before // (target_mb * 1024 * 1024)))
    if sort_cols:
        out = df.repartitionByRange(n_out, *[F.col(c) for c in sort_cols])
        out = out.sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_out)
    tmp = path.rstrip("/") + ".tmp-compact"
    out.write.mode("overwrite").parquet(tmp)
    rows_after = spark.read.parquet(tmp).count()
    if rows_after != rows_before:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: {rows_before} -> {rows_after}; aborted"
        )
    bak = path.rstrip("/") + ".bak-compact"
    if os.path.isdir(bak):
        shutil.rmtree(bak)
    os.replace(path, bak)
    os.replace(tmp, path)
    shutil.rmtree(bak)
    files_after, bytes_after = _dir_stats(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes_before": bytes_before,
        "bytes_after": bytes_after,
        "rows": rows_before,
    }


# --------------------------------------- incremental aggregate maintenance

def build_agg_view(
    changes: DataFrame,
    *,
    keys: list[str],
    value_col: str = "value",
    op_col: str | None = None,
) -> DataFrame:
    """Materialize a per-key (n, sum_value) aggregate from a changelog.
    ``op_col`` (+1 insert / -1 retract) weights both the count and the
    sum, so an update arrives as a delete+insert pair and cancels
    exactly.  The sum is decimal(18,6) — exact, order-independent, and
    therefore MERGEABLE: incremental maintenance produces bit-identical
    state to a full recompute (a float sum would drift by fold order and
    the parity guarantee below would be an approximation).
    """
    op = F.col(op_col) if op_col else F.lit(1)
    return (
        changes.groupBy(*keys)
        .agg(
            F.sum(op).cast("long").alias("n"),
            F.sum(
                op.cast("decimal(18,6)")
                * F.col(value_col).cast("decimal(18,6)")
            ).alias("sum_value"),
        )
    )


def maintain_agg_view(
    base_agg: DataFrame,
    delta_changes: DataFrame,
    *,
    keys: list[str],
    value_col: str = "value",
    op_col: str | None = None,
) -> DataFrame:
    """Incremental materialized-view maintenance: fold a new changelog
    batch into an existing (n, sum_value) aggregate WITHOUT touching
    historical rows.  The merge is union + re-aggregate (one shuffle on
    the view key, map-side partials) rather than a full-outer join — at
    100 TB the base aggregate is keyed small relative to history, and the
    union-agg shape lets AQE coalesce and never materializes null-padded
    join sides.  Keys whose count reaches zero (fully retracted) drop out,
    so the view stays the exact image of ``build_agg_view`` over the full
    changelog — parity the registered oracle asserts literally.
    """
    delta_agg = build_agg_view(
        delta_changes, keys=keys, value_col=value_col, op_col=op_col
    )
    merged = (
        base_agg.select(*keys, "n", "sum_value")
        .unionByName(delta_agg)
        .groupBy(*keys)
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_value").cast("decimal(18,6)").alias("sum_value"),
        )
    )
    return merged.filter(F.col("n") > 0)


def zonemap_stats(
    df, bucket_col, value_cols: list[str]
):
    """Zonemap (min/max/count per storage bucket) — the scan-pruning index.

    Parquet footers carry these per row-group; a table-level zonemap makes
    the same decision BEFORE listing files: a predicate whose range misses
    a bucket's [min, max] skips the bucket entirely.  This builds the
    zonemap as a queryable table: one hash aggregate of the fact table on
    the bucket key, min/max/count per value column.

    Pair with ``prunable_flag`` to evaluate a candidate predicate against
    the zonemap — the fraction of prunable rows is exactly the I/O a
    range-partitioned layout saves, which is the number that justifies
    (or rejects) a re-clustering job (``zorder_clustering_key``,
    ``compact_small_files`` keep the sort that makes zonemaps tight).

    Scale shape (100 TB): map-side-partial aggregate, output = |buckets|
    rows.  No shuffle beyond the one hash agg; the zonemap table itself
    is small enough to broadcast into every planner decision.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in value_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(bucket_col).agg(*aggs)


def prunable_flag(lo_col: str, hi_col: str, lo, hi):
    """Column expression: TRUE when a bucket's [min, max] is DISJOINT from
    the query range [lo, hi] — the bucket can be skipped without reading a
    row. Conservative by construction: overlap => not prunable."""
    return (F.col(hi_col) < F.lit(lo)) | (F.col(lo_col) > F.lit(hi))
