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
    qgram_block: bool = False,
    q: int = 2,
) -> DataFrame:
    """Entity-resolution join: pairs whose strings are within ``threshold``
    edit distance — WITHOUT the all-pairs cross join. Length is a
    Levenshtein lower bound (|len(a) - len(b)| <= distance), so candidates
    come from a length-band equi-join: strings bucket by
    ``len div (threshold+1)`` and each left row probes its own and both
    neighbor buckets (any pair within the band meets in >= 1 shared probe).

    Shuffle volume = 3x left + right keyed on small-int buckets — linear,
    never |L| x |R|. Within-bucket fan-out is bounded by the length
    distribution; for corpora where one length dominates (real name corpora
    do), ``qgram_block=True`` adds a SECOND, also-lossless blocking level:
    prefix-filtered positional q-grams (ED-Join, Xiao/Wang/Lin VLDB'08).
    An edit op destroys at most ``q`` of a string's (gram, occurrence)
    tokens, so |bag-intersection| >= n_tokens - q*t for any pair within
    distance t; by the prefix-filter theorem the ``q*t + 1`` smallest
    tokens — in a shared global order, here ascending document frequency
    over both sides (rarest grams first, the order that bounds candidate
    volume) — of each side must then share >= 1 token.
    Occurrence-indexed tokens make the bag bound a set bound (gram #k is in
    both sets iff both bags hold >= k copies). Strings too short to carry
    ``q*t + 1`` q-grams (len < q*(t+1)) have no prefix guarantee, so every
    string with len < q*(t+1) + t routes through the length-band path —
    any pair whose shorter member lacks the guarantee has BOTH members
    under that cutoff (length lower bound), so nothing is lost; pairs
    caught by both paths dedup on row ids.

    Duplicate multiplicity is preserved: candidates dedup on per-row ids
    (one id per INPUT row), never on values — genuinely duplicate input
    rows each produce their own output pairs (ADVICE r4). Keep columns are
    prefixed ``l_`` / ``r_`` so the two sides can never collide.

    ``levenshtein`` is identical classic edit distance in Spark and
    DuckDB, so the whole join replicates in the SQL oracle.
    """
    if threshold < 0:
        raise ValueError("threshold must be >= 0")
    w = threshold + 1
    l_src = left.select(
        F.col(left_col).alias("_ls"),
        *[F.col(c).alias(f"l_{c}") for c in left_keep],
    ).withColumn("_lid", F.monotonically_increasing_id())
    r_src = right.select(
        F.col(right_col).alias("_rs"),
        *[F.col(c).alias(f"r_{c}") for c in right_keep],
    ).withColumn("_rid", F.monotonically_increasing_id())
    if qgram_block:
        # The qgram path evaluates l_src/r_src in TWO independent plan
        # branches (long qgram + short length-band) and dedups cross-path
        # pairs on (_lid, _rid) — monotonically_increasing_id is only
        # stable across branches if the id assignment is materialized
        # once, so pin it (a nondeterministic upstream ordering would
        # otherwise give the same row different ids per branch and leak
        # duplicate overlap-region pairs through the dedup).
        l_src = l_src.cache()
        r_src = r_src.cache()
        l_src.count()
        r_src.count()

    def band_pairs(l_in: DataFrame, r_in: DataFrame) -> DataFrame:
        lb = F.floor(F.length(F.col("_ls")) / w).cast("long")
        l_b = l_in.withColumn("_bkt", F.explode(F.array(lb - 1, lb, lb + 1)))
        r_b = r_in.withColumn(
            "_bkt", F.floor(F.length(F.col("_rs")) / w).cast("long")
        )
        return l_b.join(r_b, "_bkt").drop("_bkt")

    if not qgram_block:
        cand = band_pairs(l_src, r_src)
    else:
        from pyspark.sql import Window

        # Routing: the prefix guarantee needs >= pi q-grams, i.e.
        # len >= m_min = q*(t+1). LONG path takes every string with the
        # guarantee (len >= m_min); SHORT path takes len < m_min + t. The
        # two OVERLAP on [m_min, m_min + t): a pair whose shorter member
        # lacks the guarantee has max-len < m_min + t (length lower bound)
        # -> both members in SHORT; a pair with both >= m_min -> both in
        # LONG. Every qualifying pair lands in at least one path; the
        # id-dedup collapses pairs caught by both.
        m_min = q * (threshold + 1)
        cutoff = m_min + threshold
        pi = q * threshold + 1  # prefix length

        def all_tokens(src: DataFrame, scol: str, idc: str) -> DataFrame:
            grams = src.select(
                idc, scol,
                F.posexplode(
                    F.expr(
                        f"transform(sequence(1, length({scol}) - {q - 1}), "
                        f"i -> substring({scol}, i, {q}))"
                    )
                ).alias("_pos", "_g"),
            )
            occ = F.row_number().over(
                Window.partitionBy(idc, "_g").orderBy("_pos")
            )
            return grams.withColumn("_occ", occ)

        long_l = l_src.filter(F.length("_ls") >= m_min)
        long_r = r_src.filter(F.length("_rs") >= m_min)
        lt_all = all_tokens(long_l.select("_lid", "_ls"), "_ls", "_lid")
        rt_all = all_tokens(long_r.select("_rid", "_rs"), "_rs", "_rid")
        # Global token order = ascending document frequency over BOTH
        # sides (ties by hash) — the canonical prefix-filter order: the
        # pi-prefix then holds each string's RAREST tokens, so candidate
        # volume is bounded by rare-gram postings, not frequent-gram
        # cross-products (hash order on a skewed or small-vocabulary gram
        # distribution selects frequent grams and degenerates toward the
        # all-pairs join this blocking exists to avoid). Any shared total
        # order preserves correctness; both sides MUST use the same one,
        # hence the union df table.
        df_tab = (
            lt_all.select("_g", "_occ")
            .unionByName(rt_all.select("_g", "_occ"))
            .groupBy("_g", "_occ")
            .agg(F.count(F.lit(1)).alias("_df"))
        )

        def prefix_tokens(tok: DataFrame, scol: str, idc: str) -> DataFrame:
            ranked = tok.join(F.broadcast(df_tab), ["_g", "_occ"]).withColumn(
                "_tokrank",
                F.row_number().over(
                    Window.partitionBy(idc).orderBy(
                        F.col("_df").asc(), F.xxhash64("_g", "_occ"), "_pos"
                    )
                ),
            )
            return ranked.filter(F.col("_tokrank") <= pi).select(
                idc, scol, "_g", "_occ"
            )

        lt = prefix_tokens(lt_all, "_ls", "_lid")
        rt = prefix_tokens(rt_all, "_rs", "_rid")
        qcand = (
            lt.join(rt, ["_g", "_occ"])
            .filter(
                F.abs(F.length("_ls") - F.length("_rs")) <= threshold
            )
            .select("_lid", "_rid")
            .dropDuplicates(["_lid", "_rid"])
            .join(long_l, "_lid")
            .join(long_r, "_rid")
        )
        short_cand = band_pairs(
            l_src.filter(F.length("_ls") < cutoff),
            r_src.filter(F.length("_rs") < cutoff),
        )
        cand = qcand.unionByName(short_cand)

    cand = cand.dropDuplicates(["_lid", "_rid"])
    return (
        cand.withColumn("distance", F.levenshtein("_ls", "_rs"))
        .filter(F.col("distance") <= threshold)
        .select(
            F.col("_ls").alias(f"left_{left_col}"),
            F.col("_rs").alias(f"right_{right_col}"),
            F.col("distance").cast("long").alias("distance"),
            *[F.col(f"l_{c}") for c in left_keep],
            *[F.col(f"r_{c}") for c in right_keep],
        )
    )
