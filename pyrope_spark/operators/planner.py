"""Join-strategy advisor: sketch- and skew-driven physical-join decisions.

The planning loop a 100 TB deployment runs OFFLINE, from metadata-scale
inputs only — no scan of the joined data at decision time:

- build-side size -> ``broadcast`` when it fits the broadcast budget
  (the decision Spark itself makes from size-in-bytes; here it is made
  from row counts x avg width so it can be planned before any scan);
- key skew (``profile.key_skew_report``'s max key share) -> ``salt``
  with ``n_salts ~ hot-key rows / average-partition rows`` (the sizing
  rule documented on ``joins.salted_join``) when one key would
  overwhelm a reducer and the shape defeats AQE (stream-static joins,
  agg-on-same-key reuse);
- otherwise ``shuffle`` (plain sort-merge; AQE handles residual skew);
- ``cms_join_cardinality``'s estimated output rows ride along as the
  blow-up warning (est_join_rows >> max input -> a many-to-many key).

Pure integer/CASE expressions over a stats table — deterministic and
SQL-replicable, so the whole advisor is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BROADCAST_ROW_LIMIT = 1_000_000  # ~10 MB at 10-byte keys+payload refs
SKEW_SHARE_SALT = 0.10  # one key holding >10% of rows -> salt
JOIN_BLOWUP_FACTOR = 4  # est output > 4x max input -> many-to-many warning


def join_strategy_advice(
    stats: DataFrame,
    *,
    broadcast_row_limit: int = BROADCAST_ROW_LIMIT,
    skew_share_salt: float = SKEW_SHARE_SALT,
    blowup_factor: int = JOIN_BLOWUP_FACTOR,
    n_partitions: int = 200,
) -> DataFrame:
    """stats columns: join_name, left_rows, right_rows, max_key_share
    (heaviest big-side key's fraction of rows), est_join_rows (CMS
    estimate or exact). Adds: strategy ('broadcast' | 'salt' |
    'shuffle'), n_salts, blowup_warning."""
    small = F.least(F.col("left_rows"), F.col("right_rows"))
    strategy = (
        F.when(small <= broadcast_row_limit, F.lit("broadcast"))
        .when(F.col("max_key_share") > skew_share_salt, F.lit("salt"))
        .otherwise(F.lit("shuffle"))
    )
    big = F.greatest(F.col("left_rows"), F.col("right_rows"))
    # hot-key rows / average-partition rows, >= 2, only when salting
    n_salts = F.when(
        strategy == "salt",
        F.greatest(
            F.lit(2),
            F.ceil(F.col("max_key_share") * big / (big / n_partitions)),
        ),
    ).otherwise(F.lit(0))
    return stats.select(
        "*",
        strategy.alias("strategy"),
        n_salts.cast("long").alias("n_salts"),
        (F.col("est_join_rows") > blowup_factor * big).alias("blowup_warning"),
    )
