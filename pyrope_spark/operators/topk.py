"""Per-query top-K (reference: bounded min-heap during scan + final sort,
``Vector/BruteForceVectorIndex.cs:291,333-334,358-370``).

Spark-first design:

- Single global top-K -> ``ORDER BY score DESC LIMIT k`` lowers to
  ``TakeOrderedAndProject`` (no full sort, no full shuffle).
- Per-group (per-query) top-K -> window ``row_number``. At scale the naive
  window shuffles every scored row on ``query_id``; for Q queries over N
  vectors that is N*Q rows through the shuffle. :func:`topk_per_group`
  therefore supports a **two-phase** plan: a per-partition local top-K
  (cheap, no shuffle) cuts the candidate set to ~K*partitions per query
  before the global window — the same local/global split Spark uses for
  partial aggregation, applied to top-K.

Ties break deterministically by ascending id so results are hash-comparable
with the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    score_col: str = "score",
    tiebreak_col: str | None = "id",
    rank_col: str = "rank",
    two_phase: bool = False,
) -> DataFrame:
    """Keep the ``k`` highest-``score_col`` rows per group with a ``rank``
    column (1-based, descending score, ties by ascending ``tiebreak_col``).

    ``two_phase=True`` first takes a local top-K inside each input partition
    (sortWithinPartitions + per-partition running rank via mapInPandas would
    add a Python hop, so we use a window keyed by ``spark_partition_id`` —
    Catalyst sees the partition id is already co-located, but AQE still plans
    a local shuffle; the candidate cut is what matters at scale).
    """
    order = [F.desc(score_col)]
    if tiebreak_col is not None:
        order.append(F.asc(tiebreak_col))

    if two_phase:
        local_w = Window.partitionBy(F.spark_partition_id(), *group_cols).orderBy(*order)
        df = (
            df.withColumn("_local_rank", F.row_number().over(local_w))
            .filter(F.col("_local_rank") <= k)
            .drop("_local_rank")
        )

    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
