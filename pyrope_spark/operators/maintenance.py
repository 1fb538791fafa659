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
