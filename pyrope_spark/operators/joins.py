"""Join-strategy utilities for skewed keys.

AQE's skew-join handling (spark.sql.adaptive.skewJoin) splits oversized
sort-merge partitions at runtime and is the first line of defense — leave it
on. ``salted_join`` is the explicit fallback for shapes AQE cannot rescue:
a stream-static join (no runtime re-plan), a skewed key feeding a
groupBy-on-the-same-key right after (the exchange is reused, so splitting
never happens), or a hot key so large that even a split partition blows an
executor.

Mechanics: the skewed (big) side gets a deterministic salt in [0, n_salts)
(xxhash64 of the whole row — no RNG, layout-independent), the small side is
replicated n_salts times with an inline explode, and the equi-join runs on
(key, salt). Same result set as the plain join — the hot key's rows now
spread across n_salts reducers instead of one. Cost: small side shuffle
volume x n_salts; pick n_salts ~ (hot-key rows / average-partition rows).

No reference analog (single-node engine); this is 100 TB plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    ``how`` supports inner and left (left = big side preserved); the
    replicated-side outer variants are not meaningful (a right row matching
    zero salts would duplicate n_salts times) and raise.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return big_s.join(small_s, [*on, "_salt"], how).drop("_salt")


# ------------------------------------------------------ fuzzy string join

def fuzzy_levenshtein_join(
    left: DataFrame,
    right: DataFrame,
    threshold: int,
    *,
    left_col: str = "name",
    right_col: str = "name",
    left_keep: tuple[str, ...] = (),
    right_keep: tuple[str, ...] = (),
) -> DataFrame:
    """Entity-resolution join: pairs whose strings are within ``threshold``
    edit distance — WITHOUT the all-pairs cross join. Length is a
    Levenshtein lower bound (|len(a) - len(b)| <= distance), so candidates
    come from a length-band equi-join: strings bucket by
    ``len div (threshold+1)`` and each left row probes its own and both
    neighbor buckets (any pair within the band meets in >= 1 shared probe;
    dedup by DISTINCT). The exact ``levenshtein`` filter then confirms.

    Shuffle volume = 3x left + right keyed on small-int buckets — linear,
    never |L| x |R|. Within-bucket fan-out is bounded by the length
    distribution (strings of similar length), the documented residual
    hotspot for corpora where one length dominates (pre-block further by
    a first-character or q-gram key in that regime).

    ``levenshtein`` is identical classic edit distance in Spark and
    DuckDB, so the whole join replicates in the SQL oracle.
    """
    if threshold < 0:
        raise ValueError("threshold must be >= 0")
    w = threshold + 1
    lb = F.floor(F.length(F.col("_ls")) / w).cast("long")
    l_src = left.select(
        F.col(left_col).alias("_ls"), *[F.col(c) for c in left_keep]
    ).withColumn(
        "_bkt",
        F.explode(F.array(lb - 1, lb, lb + 1)),
    )
    r_src = right.select(
        F.col(right_col).alias("_rs"), *[F.col(c) for c in right_keep]
    ).withColumn("_bkt", F.floor(F.length(F.col("_rs")) / w).cast("long"))
    cand = l_src.join(r_src, "_bkt").drop("_bkt").distinct()
    return (
        cand.withColumn("distance", F.levenshtein("_ls", "_rs"))
        .filter(F.col("distance") <= threshold)
        .select(
            F.col("_ls").alias(f"left_{left_col}"),
            F.col("_rs").alias(f"right_{right_col}"),
            F.col("distance").cast("long").alias("distance"),
            *[F.col(c) for c in left_keep],
            *[F.col(c) for c in right_keep],
        )
    )
