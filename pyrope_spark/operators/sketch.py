"""Count-min sketch frequency estimation and heavy hitters.

The Cormode-Muthukrishnan count-min sketch (2005) as a DataFrame operator:
``d`` independent hash rows of ``width`` counters; a term's estimate is the
min over rows of its bucket's counter — always an over-estimate, with error
<= eps * total_count at width = ceil(e/eps) w.h.p. The sketch TABLE (d *
width rows, term-free) is the shippable artifact: at 100 TB the token
stream aggregates into a fixed-size table with map-side partial counts
(one hash shuffle of at most d*width distinct keys per partition), and
estimation is a broadcast join of query terms against it — the raw corpus
is never re-scanned per query.

Hashing is the engine-portable affine family over the Horner rolling
fingerprint (see the collision notes at CMS_MULTS below — both the base
hash and the mixing modulus are chosen so no single collision can defeat
every row at once), so the whole sketch replicates bit-for-bit in the
DuckDB oracle.

No reference analog (nearest is the reference's fixed-bound latency
histogram, MetricsService.cs); this extends the engine's sketch surface
alongside HLL distinct (profile.py) for training-data corpus statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyrope_spark.functions.text import (
    FP_ROLL_P,
    char_fp_rolling,
    char_fp_rolling_sql,
    tokens,
    tokens_sql,
)

# distinct small odd multipliers per hash row (affine family mod the LARGE
# rolling-hash prime); offsets break the shared fixed point at fp=0.
# Two deliberate choices against correlated collisions:
# - the base fp is the Horner rolling hash, not char_fp (whose
#   arithmetic-progression weights collide systematically on structured
#   vocabularies — a base collision defeats every row at once);
# - the affine mix reduces mod FP_ROLL_P (~1e15), not a small prime: with a
#   small modulus, fp1 = fp2 (mod m) collides in ALL rows simultaneously
#   for any multiplier, silently breaking the min-over-rows rescue.
# fp * 61 stays under 6.2e16 — far inside int64.
CMS_MULTS = [31, 37, 41, 43, 47, 53, 59, 61]
CMS_OFFS = [17, 257, 4099, 65537, 262147, 524309, 1048583, 2097169]


def _bucket(fp: Column, d: int, width: int) -> Column:
    return F.pmod(fp * CMS_MULTS[d] + CMS_OFFS[d], F.lit(FP_ROLL_P)) % width


def _bucket_sql(fp_expr: str, d: int, width: int) -> str:
    return (
        f"(((({fp_expr}) * {CMS_MULTS[d]} + {CMS_OFFS[d]}) % {FP_ROLL_P} "
        f"+ {FP_ROLL_P}) % {FP_ROLL_P}) % {width}"
    )


def cms_build(
    docs: DataFrame,
    *,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the sketch table (d, bucket, cnt) over the corpus token stream.

    One explode + one (d, bucket) hash shuffle; the shuffle carries at most
    depth * width distinct keys per map partition (partial aggregation
    collapses the token stream to counter increments executor-side).
    """
    if not 1 <= depth <= len(CMS_MULTS):
        raise ValueError(f"depth must be in 1..{len(CMS_MULTS)}")
    toks = docs.select(
        F.explode(tokens(F.col(text_col))).alias("term")
    ).select(char_fp_rolling(F.col("term")).alias("fp"))
    rows = toks.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"), _bucket(F.col("fp"), d, width).alias("bucket")
                )
                for d in range(depth)
            ])
        ).alias("db")
    ).select("db.d", "db.bucket")
    return rows.groupBy("d", "bucket").agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    *,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimated count per query term: min over the d bucket counters.

    The d lookups are one join of (term, d, bucket) rows against the
    fixed-size sketch — broadcast the sketch side (d*width rows) so the
    estimate is shuffle-free relative to the query set.
    """
    probes = terms.select(
        F.col(term_col).alias("term"), char_fp_rolling(F.col(term_col)).alias("fp")
    ).select(
        "term",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"), _bucket(F.col("fp"), d, width).alias("bucket")
                )
                for d in range(depth)
            ])
        ).alias("db"),
    ).select("term", "db.d", "db.bucket")
    joined = probes.join(F.broadcast(sketch), ["d", "bucket"], "left").fillna(
        0, subset=["cnt"]
    )
    return joined.groupBy("term").agg(F.min("cnt").cast("long").alias("est_count"))


def cms_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    min_exact: int = 1,
) -> str:
    """DuckDB rendering of build + estimate over every distinct corpus term
    with exact count >= min_exact, alongside the exact count."""
    fp_term = char_fp_rolling_sql("term")
    unions = "\nUNION ALL\n".join(
        f"SELECT {d} AS d, {_bucket_sql('fp', d, width)} AS bucket, cnt FROM tf"
        for d in range(depth)
    )
    probe_unions = "\nUNION ALL\n".join(
        f"SELECT term, cnt AS exact_count, {d} AS d, "
        f"{_bucket_sql('fp', d, width)} AS bucket FROM tf"
        for d in range(depth)
    )
    return f"""
WITH tk AS (
  SELECT {tokens_sql(text_col)} AS t FROM {table}
), terms AS (
  SELECT u.term FROM tk, unnest(t) AS u(term)
), tf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cnt, {fp_term} AS fp
  FROM terms GROUP BY term
), sketch AS (
  SELECT d, bucket, CAST(sum(cnt) AS BIGINT) AS bcnt
  FROM ({unions}) GROUP BY d, bucket
), probes AS (
{probe_unions}
), est AS (
  SELECT p.term, p.exact_count,
         CAST(min(COALESCE(s.bcnt, 0)) AS BIGINT) AS est_count
  FROM probes p LEFT JOIN sketch s ON p.d = s.d AND p.bucket = s.bucket
  GROUP BY p.term, p.exact_count
)
SELECT term, est_count, exact_count FROM est WHERE exact_count >= {min_exact}
"""


def bloom_build(
    items: DataFrame,
    *,
    col: str = "term",
    n_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """Bloom filter over a key set, materialized as the sparse table of SET
    BIT positions (bit BIGINT) — distinct'd, so the artifact is bounded by
    n_bits rows regardless of corpus size and ships as a tiny parquet.

    The scale role: a membership pre-filter for incremental dedup
    (curation.dedup_against_index) — probing new keys against the bloom
    table is a broadcast join that discards the (typically dominant)
    never-seen majority without shuffling the historical index. No false
    negatives ever; false-positive rate ~ (1 - e^(-kn/m))^k, so survivors
    still confirm against the exact index.

    Same engine-portable affine hash family as the CMS (multiplier/offset
    rows over the rolling fingerprint), so the filter replicates
    bit-for-bit in SQL.
    """
    if not 1 <= n_hashes <= len(CMS_MULTS):
        raise ValueError(f"n_hashes must be in 1..{len(CMS_MULTS)}")
    fp = items.select(char_fp_rolling(F.col(col)).alias("fp"))
    bits = fp.select(
        F.explode(
            F.array(*[_bucket(F.col("fp"), d, n_bits) for d in range(n_hashes)])
        ).alias("bit")
    )
    return bits.distinct()


def bloom_might_contain(
    bloom_bits: DataFrame,
    probes: DataFrame,
    *,
    col: str = "term",
    n_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """(probe, might_contain) — true iff every hash position is set.

    The bloom side is broadcast (<= n_bits rows); the probe stream joins
    map-side and reduces with one groupBy(probe) count — no shuffle of the
    historical key set.
    """
    pos = probes.select(
        F.col(col).alias("probe"), char_fp_rolling(F.col(col)).alias("fp")
    ).select(
        "probe",
        F.explode(
            F.array(*[_bucket(F.col("fp"), d, n_bits) for d in range(n_hashes)])
        ).alias("bit"),
    )
    hit = pos.join(F.broadcast(bloom_bits), "bit", "left_semi")
    counts = hit.groupBy("probe").agg(F.count(F.lit(1)).alias("_nhit"))
    return probes.select(F.col(col).alias("probe")).distinct().join(
        counts, "probe", "left"
    ).select(
        "probe",
        (F.coalesce(F.col("_nhit"), F.lit(0)) == n_hashes).alias("might_contain"),
    )


def bloom_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    build_pred: str = "doc_id % 2 = 0",
    n_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> str:
    """DuckDB rendering: bloom over the build split's terms, probed with
    every distinct corpus term, alongside exact membership."""
    fp = char_fp_rolling_sql("term")
    build_bits = "\nUNION\n".join(
        f"SELECT DISTINCT {_bucket_sql('fp', d, n_bits)} AS bit FROM bt"
        for d in range(n_hashes)
    )
    probe_pos = "\nUNION ALL\n".join(
        f"SELECT term, {_bucket_sql('fp', d, n_bits)} AS bit FROM pt"
        for d in range(n_hashes)
    )
    return f"""
WITH build_terms AS (
  SELECT DISTINCT u.term
  FROM (SELECT {tokens_sql(text_col)} AS t FROM {table} WHERE {build_pred}) s,
       unnest(t) AS u(term)
), bt AS (
  SELECT term, {fp} AS fp FROM build_terms
), bits AS (
{build_bits}
), all_terms AS (
  SELECT DISTINCT u.term
  FROM (SELECT {tokens_sql(text_col)} AS t FROM {table}) s, unnest(t) AS u(term)
), pt AS (
  SELECT term, {fp} AS fp FROM all_terms
), pos AS (
{probe_pos}
), hits AS (
  SELECT p.term, count(*) AS nhit
  FROM pos p JOIN bits b ON p.bit = b.bit
  GROUP BY p.term
)
SELECT t.term AS probe,
       (COALESCE(h.nhit, 0) = {n_hashes}) AS might_contain,
       (t.term IN (SELECT term FROM build_terms)) AS in_build
FROM all_terms t LEFT JOIN hits h USING (term)
"""


# --------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet et al. 2007) as a TABLE
# --------------------------------------------------------------------------
#
# Spark's approx_count_distinct gives a one-shot HLL *estimate*; what a
# 100 TB pipeline additionally needs is the HLL *state* as a first-class
# mergeable artifact: per-shard register tables that union+max into the
# corpus-wide sketch (incremental ingest, per-partition profiles, cross-
# snapshot set sizes) without re-scanning history. One register table is
# m = 2^p rows max per group — trivially broadcastable.
#
# Engine-portable construction (replicates bit-for-bit in the DuckDB
# oracle): the register input is a DOUBLE Horner pass —
# h = char_fp_rolling(string(char_fp_rolling(key || salt))). One pass is
# not enough: fp(key || salt) is AFFINE in the key's own fingerprint
# (suffix chars only multiply-and-add a constant mod P), so sequential
# keys land on a stride-M lattice whose per-bucket leading-zero maxima are
# systematically biased (measured +25..-37% at p=8..11 on sequential ids
# — far beyond the 6.5%/2.3% theoretical sigma). Re-fingerprinting the
# DECIMAL STRING of the first hash is nonlinear (digit decomposition has
# carries), which breaks the lattice; measured errors drop inside the
# paper's sigma at p=8 and p=11. The salt guarantees the first chain
# saturates mod P for short keys.
#
# From h: u = h mod 2^40 (near-uniform 40-bit value: FP_ROLL_P/2^40 ~ 909
# wraps, residual nonuniformity ~0.1%) -> bucket = u mod m, w = u div m
# treated as a bw = (40-p)-bit value -> rho = bw + 1 - bitlen(w) (bitlen
# via length(bin(w)), identical in Spark and DuckDB; rho = bw+1 at w = 0).
# The estimator's 1/2^Mj sum is computed EXACTLY as a BIGINT (sum of
# 2^(bw+1-Mj), bounded by m * 2^bw <= 2^41), so the order-insensitive
# value hash is safe — the only float ops are one division and the final
# round, identical IEEE in both engines. The 32-bit upper-range
# correction does not apply (hash space 2^40 with the ~2^50 source).

HLL_DEFAULT_P = 5
HLL_SALT = "#hll#"
HLL_UBITS = 40


def _hll_alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_build(
    df: DataFrame,
    key_col: str,
    *,
    group_cols: tuple[str, ...] = (),
    p: int = HLL_DEFAULT_P,
) -> DataFrame:
    """Register table (group..., bucket, rho) — max-rho per bucket. One hash
    shuffle of at most m distinct buckets per group (map-side max partials
    collapse the key stream executor-side); duplicates need no pre-distinct
    (max absorbs them)."""
    m = 1 << p
    bw = HLL_UBITS - p
    h1 = char_fp_rolling(
        F.concat(F.col(key_col).cast("string"), F.lit(HLL_SALT))
    )
    h = char_fp_rolling(h1.cast("string"))
    u = F.pmod(h, F.lit(1 << HLL_UBITS))
    rows = df.select(*group_cols, u.alias("_u")).select(
        *group_cols,
        F.pmod(F.col("_u"), F.lit(m)).cast("int").alias("bucket"),
        F.expr(
            f"CASE WHEN (_u div {m}) = 0 THEN {bw + 1} "
            f"ELSE {bw} + 1 - length(bin(_u div {m})) END"
        ).cast("int").alias("_rho"),
    )
    return rows.groupBy(*group_cols, "bucket").agg(F.max("_rho").alias("rho"))


def hll_merge(
    a: DataFrame, b: DataFrame, *, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Union two register tables into one sketch: groupBy max — the lossless
    merge that makes per-shard sketches composable (build(x) U build(y) ==
    build(x U y), exactly)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    sketch: DataFrame,
    *,
    group_cols: tuple[str, ...] = (),
    p: int = HLL_DEFAULT_P,
) -> DataFrame:
    """(group..., m, zero_registers, s_scaled, est_distinct) from a register
    table. ``s_scaled`` is the EXACT integer ``2^(bw+1) * sum(2^-Mj)``
    (absent registers contribute ``2^(bw+1)`` each); the estimate is
    ``alpha * m^2 * 2^(bw+1) / s_scaled`` with the paper's linear-counting
    small-range correction (raw <= 2.5m and empty registers present).

    ``p`` must match the ``p`` the sketch was built with — the register
    table itself doesn't carry it (ADVICE r4), so the estimate validates
    ``max(bucket) < 2^p`` at runtime and raises instead of silently
    producing garbage when a p=12 sketch is estimated with a smaller p
    (both m and the rho bit-width would be wrong)."""
    m = 1 << p
    bw = HLL_UBITS - p
    num = _hll_alpha(m) * m * m * float(1 << (bw + 1))  # exact double literal
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_present"),
        F.max("bucket").alias("_maxb"),
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), cast({bw + 1} - rho as int))")
        ).alias("_s_hit"),
    )
    # assert_true is woven into the m expression (not a dropped column) so
    # Catalyst cannot prune the check away
    m_checked = F.when(
        F.assert_true(
            F.col("_maxb") < F.lit(m),
            F.lit(f"hll_estimate: sketch has bucket >= {m} — built with a "
                  f"larger p than the p={p} passed here"),
        ).isNull(),
        F.lit(m),
    ).otherwise(F.lit(m))
    out = agg.select(
        *group_cols,
        m_checked.cast("long").alias("m"),
        (F.lit(m) - F.col("_present")).cast("long").alias("zero_registers"),
        (
            F.col("_s_hit")
            + (F.lit(m) - F.col("_present")).cast("long") * F.lit(1 << (bw + 1)).cast("long")
        ).cast("long").alias("s_scaled"),
    )
    raw = F.lit(num) / F.col("s_scaled").cast("double")
    v = F.col("zero_registers")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return out.withColumn("est_distinct", F.round(est, 3))


def hll_oracle_sql(
    *,
    table: str = "events",
    key_expr: str = "CAST(user_id AS VARCHAR)",
    group_col: str = "event_type",
    p: int = HLL_DEFAULT_P,
) -> str:
    """DuckDB rendering of build + estimate per group, with the exact
    distinct count side-by-side."""
    m = 1 << p
    bw = HLL_UBITS - p
    num = repr(_hll_alpha(m) * m * m * float(1 << (bw + 1)))
    fp1 = char_fp_rolling_sql(f"k || '{HLL_SALT}'")
    fp2 = char_fp_rolling_sql("CAST(h1 AS VARCHAR)")
    return f"""
WITH keys AS (
  SELECT {group_col} AS g, {key_expr} AS k FROM {table}
), h1t AS (
  SELECT g, {fp1} AS h1 FROM keys
), hashed AS (
  SELECT g, ({fp2}) % {1 << HLL_UBITS} AS u FROM h1t
), rr AS (
  SELECT g, CAST(u % {m} AS INT) AS bucket,
         CAST(CASE WHEN (u // {m}) = 0 THEN {bw + 1}
              ELSE {bw} + 1 - length(bin(u // {m})) END AS INT) AS rho
  FROM hashed
), reg AS (
  SELECT g, bucket, MAX(rho) AS rho FROM rr GROUP BY g, bucket
), agg AS (
  SELECT g, COUNT(*) AS present,
         CAST(SUM(CAST(1 AS BIGINT) << ({bw + 1} - rho)) AS BIGINT) AS s_hit
  FROM reg GROUP BY g
), est AS (
  SELECT g, CAST({m} AS BIGINT) AS m,
         CAST({m} - present AS BIGINT) AS zero_registers,
         CAST(s_hit + ({m} - present) * (CAST(1 AS BIGINT) << {bw + 1})
              AS BIGINT) AS s_scaled
  FROM agg
), fin AS (
  SELECT g, m, zero_registers, s_scaled,
         CASE WHEN ({num} / CAST(s_scaled AS DOUBLE)) <= {2.5 * m}
                   AND zero_registers > 0
              THEN round({float(m)!r} * ln({float(m)!r} /
                         CAST(zero_registers AS DOUBLE)), 3)
              ELSE round({num} / CAST(s_scaled AS DOUBLE), 3) END
           AS est_distinct
  FROM est
), exact AS (
  SELECT {group_col} AS g, CAST(COUNT(DISTINCT {key_expr}) AS BIGINT)
           AS exact_distinct
  FROM {table} GROUP BY {group_col}
)
SELECT fin.g AS {group_col}, fin.m, fin.zero_registers, fin.s_scaled,
       fin.est_distinct, exact.exact_distinct
FROM fin JOIN exact ON fin.g = exact.g
"""


# --------------------------------------------------------------------------
# Bottom-k sample sketch (deterministic mergeable uniform sample)
# --------------------------------------------------------------------------
#
# The k rows with the smallest md5(seed|id) form a uniform-without-
# replacement sample of the population — and the sketch is MERGEABLE with
# no information loss: bottomk(A U B) == bottomk(bottomk(A) U bottomk(B)),
# because the k globally smallest hashes are necessarily among each side's
# k smallest. That makes it the quantile/sample counterpart of the HLL
# register table: per-shard sketches union+cut into the corpus sketch
# without re-scanning history, deterministically (same id set -> same
# sample, any layout, any run).
#
# Use with ``analytics.nearest_rank_percentiles`` over the sample for
# mergeable approximate quantiles at 100 TB: the exact nearest-rank path
# sorts the full column; the sketch path sorts k rows per group after a
# two-phase cut, with sampling error ~ O(1/sqrt(k)) on quantile ranks.

BOTTOMK_SEED = "bk42"


def _bk_hash(id_col: str, seed: str):
    return F.md5(
        F.concat(F.lit(seed + "|"), F.col(id_col).cast("string")).cast("binary")
    )


def bottomk_sample(
    df: DataFrame,
    k: int,
    *,
    id_col: str,
    keep_cols: tuple[str, ...] = (),
    group_cols: tuple[str, ...] = (),
    seed: str = BOTTOMK_SEED,
) -> DataFrame:
    """(group..., id, _bk_h, keep...) — the k hash-smallest rows per group.
    Two-phase cut (the domain_cap / topk_per_group shape): a local cut per
    (input partition, group) bounds the global per-group window at
    k * partitions rows, so a hot group cannot melt one reducer."""
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    src = df.select(
        *group_cols,
        F.col(id_col).cast("string").alias("_bk_id"),
        _bk_hash(id_col, seed).alias("_bk_h"),
        *keep_cols,
    )
    order = [F.asc("_bk_h"), F.asc("_bk_id")]
    local_w = Window.partitionBy(F.spark_partition_id(), *group_cols).orderBy(*order)
    pruned = (
        src.withColumn("_lr", F.row_number().over(local_w))
        .filter(F.col("_lr") <= k)
        .drop("_lr")
    )
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        pruned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def bottomk_merge(
    a: DataFrame,
    b: DataFrame,
    k: int,
    *,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Merge two bottom-k sketches (disjoint id sets): union + global cut.
    Equals the sketch of the unioned population exactly."""
    from pyspark.sql.window import Window

    order = [F.asc("_bk_h"), F.asc("_bk_id")]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        a.unionByName(b)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def bottomk_quantiles_oracle_sql(
    k: int,
    *,
    table: str = "events",
    id_col: str = "event_id",
    value_col: str = "value",
    group_col: str = "event_type",
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    seed: str = BOTTOMK_SEED,
) -> str:
    """DuckDB rendering: per-group bottom-k sample -> nearest-rank quantiles
    on the sample, exact nearest-rank quantiles side-by-side."""

    def _nr(src: str, prefix: str) -> str:
        cols = ", ".join(
            f"MAX(CASE WHEN vrn = CEIL({p} * n) THEN round({value_col}, 6) END)"
            f" AS {prefix}p{int(p * 100)}"
            for p in percentiles
        )
        return (
            f"SELECT {group_col}, {cols} FROM ("
            f"SELECT {group_col}, {value_col}, "
            f"row_number() OVER (PARTITION BY {group_col} ORDER BY {value_col}) AS vrn, "
            f"COUNT(*) OVER (PARTITION BY {group_col}) AS n FROM {src}) "
            f"GROUP BY {group_col}"
        )

    return f"""
WITH s AS (
  SELECT {group_col}, {value_col} FROM (
    SELECT {group_col}, {value_col},
           row_number() OVER (
             PARTITION BY {group_col}
             ORDER BY md5('{seed}|' || CAST({id_col} AS VARCHAR)) ASC,
                      CAST({id_col} AS VARCHAR) ASC) AS rn
    FROM {table}) WHERE rn <= {k}
),
sq AS ({_nr('s', '')}),
eq AS ({_nr(table, 'exact_')})
SELECT sq.*, {', '.join(f'eq.exact_p{int(p * 100)}' for p in percentiles)}
FROM sq JOIN eq USING ({group_col})
"""


# --------------------------------------------------------------------------
# CMS inner product: equi-join cardinality estimation from sketches
# --------------------------------------------------------------------------

def cms_join_cardinality(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    *,
    depth: int = 4,
) -> DataFrame:
    """Estimated equi-join row count |A JOIN B ON key| from the two sides'
    CMS sketches: the true size is sum_k cntA(k) * cntB(k) — the inner
    product of the frequency vectors — and each CMS row's bucket-wise dot
    product over-estimates it (collisions only ADD mass), so the MIN over
    the d rows is the classic AMS/CMS join-size estimator (Cormode &
    Muthukrishnan 2005, section 4.2).

    The planner use: estimate a join's output before running it, from two
    fixed-size tables (d x width each), no scan of either input — the
    input to a broadcast-vs-shuffle or salt-or-not decision at 100 TB.
    All-integer arithmetic: replicates exactly in SQL.
    """
    a = sketch_a.select("d", "bucket", F.col("cnt").alias("_ca"))
    b = sketch_b.select("d", "bucket", F.col("cnt").alias("_cb"))
    # Left-join from the depth spine of sketch_a and coalesce empty
    # intersections to 0 (ADVICE r4): a depth row whose bucket sets don't
    # intersect means the true join size is 0 for that estimator row — an
    # inner join dropped it from the groupBy, so the MIN was taken over
    # the surviving rows and over-reported (and a fully-empty intersection
    # returned NULL instead of 0).
    dots = (
        a.join(b, ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_dot"))
    )
    spine = sketch_a.select("d").distinct()
    per_row = spine.join(dots, "d", "left").select(
        "d", F.coalesce(F.col("_dot"), F.lit(0)).alias("_dot")
    )
    return per_row.agg(
        F.min("_dot").cast("long").alias("est_join_rows"),
        F.count(F.lit(1)).cast("long").alias("rows_used"),
    )


def cms_join_cardinality_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    split_pred_a: str = "doc_id % 2 = 0",
    split_pred_b: str = "doc_id % 2 = 1",
    depth: int = 4,
    width: int = 1024,
) -> str:
    """DuckDB rendering: CMS over each half's token stream, the min-dot
    estimate, and the exact token-equi-join size side-by-side."""

    def side(name: str, pred: str) -> str:
        unions = "\nUNION ALL\n".join(
            f"SELECT {d} AS d, {_bucket_sql('fp', d, width)} AS bucket, cnt "
            f"FROM tf_{name}"
            for d in range(depth)
        )
        return f"""tk_{name} AS (
  SELECT {tokens_sql(text_col)} AS t FROM {table} WHERE {pred}
), tf_{name} AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cnt,
         {char_fp_rolling_sql('term')} AS fp
  FROM (SELECT u.term FROM tk_{name}, unnest(t) AS u(term)) GROUP BY term
), sk_{name} AS (
  SELECT d, bucket, CAST(sum(cnt) AS BIGINT) AS cnt FROM ({unions})
  GROUP BY d, bucket
)"""

    return f"""
WITH {side('a', split_pred_a)},
{side('b', split_pred_b)},
dots AS (
  -- left join from sketch_a's depth spine, empty intersection -> dot 0
  -- (matches cms_join_cardinality's zero-intersection handling)
  SELECT s.d, CAST(COALESCE(SUM(a.cnt * b.cnt), 0) AS BIGINT) AS dot
  FROM (SELECT DISTINCT d FROM sk_a) s
  LEFT JOIN sk_a a ON a.d = s.d
  LEFT JOIN sk_b b ON a.d = b.d AND a.bucket = b.bucket
  GROUP BY s.d
),
exact AS (
  SELECT CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS exact_join_rows
  FROM tf_a a JOIN tf_b b USING (term)
)
SELECT CAST(MIN(dot) AS BIGINT) AS est_join_rows,
       CAST(COUNT(*) AS BIGINT) AS rows_used,
       (SELECT exact_join_rows FROM exact) AS exact_join_rows
FROM dots
"""


def hll_rolling_merge(
    sketch: DataFrame,
    day_col: str = "day",
    window_days: int = 7,
) -> DataFrame:
    """Trailing-window register merge: for each day in the sketch, the
    MAX-rho union of the previous ``window_days`` days' registers.

    THE argument for sketches-as-tables: per-day registers are built once
    (one pass over the fact table, ~m rows/day); any trailing window is
    then answered from the register table alone — a 7-day distinct over
    100 TB costs a join of |days| x m rows, not a re-scan.  The range
    join is on the tiny register table, so Spark broadcasts it; MAX(rho)
    merging is exactly the HLL union (register tables are a semilattice —
    the property the pytest asserts as merge == full rebuild).
    """
    spine = sketch.select(F.col(day_col).alias("_d")).distinct()
    joined = spine.join(
        sketch,
        (F.col(day_col) > F.date_sub(F.col("_d"), window_days))
        & (F.col(day_col) <= F.col("_d")),
    )
    return joined.groupBy(F.col("_d").alias(day_col), F.col("bucket")).agg(
        F.max("rho").alias("rho")
    )


def moments_build(
    df: DataFrame,
    key_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Mergeable moment sketch per key: (n, s1, s2) with EXACT integers.

    s1 = sum of micro-unit values (BIGINT), s2 = sum of squares
    (DECIMAL(38,0) — micro squares overflow int64 past ~9e3 rows of
    magnitude-1e6 values).  The pair is a commutative monoid: partials
    from any partitioning merge by simple addition into exactly the
    full-scan result — the property incremental stats maintenance needs
    (same contract as the HLL registers and the (n, sum) agg views).
    """
    v = F.round(F.col(value_col) * scale).cast("long")
    return df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v.cast("decimal(38,0)") * v).alias("s2"),
    )


def moments_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two moment-sketch tables (union + re-add)."""
    return (
        a.unionByName(b)
        .groupBy("key")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("s1").cast("long").alias("s1"),
            F.sum("s2").cast("decimal(38,0)").alias("s2"),
        )
    )


def moments_stats(sketch: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Exact-rational stats from a moment sketch: mean in micro (one
    div) and the variance NUMERATOR ``n*s2 - s1^2`` kept as an exact
    DECIMAL — comparing spread across keys never divides (var_a > var_b
    iff num_a*den_b > num_b*den_a with den = n^2), the same
    deferred-division discipline as ``groupwise_trend``."""
    return sketch.select(
        "key",
        "n",
        "s1",
        "s2",
        F.expr("s1 DIV n").alias("mean_micro"),
        (
            F.col("n").cast("decimal(38,0)") * F.col("s2")
            - F.col("s1").cast("decimal(38,0)") * F.col("s1")
        ).alias("var_numerator"),
    )


# --------------------------------------------------------------------------
# KMV set-operation estimates: audience overlap between two segments from
# ONE bottom-k sketch of the union (Beyer et al. 2007, "On Synopses for
# Distinct-Value Estimation Under Multiset Operations"). The k smallest
# hashes of A ∪ B are a uniform sample of the union, so the share of
# sketch members lying in A ∩ B estimates the Jaccard similarity, and
# the k-th smallest hash estimates |A ∪ B| — audience overlap over a
# 100 TB log from one distinct-aggregate plus a k-row global cut.
# --------------------------------------------------------------------------

KMV_HASH_SPACE = float(1 << 60)  # 16^15, the 15-hex-digit prefix domain


def kmv_overlap(
    events: DataFrame,
    *,
    type_a: str,
    type_b: str,
    k: int = 64,
    id_col: str = "user_id",
    type_col: str = "event_type",
    seed: str = BOTTOMK_SEED,
) -> DataFrame:
    """One-row overlap report between the ``type_a`` and ``type_b``
    member sets: (k_used, n_union_sketch, n_both, jaccard_ppm,
    union_est, intersection_est, exact_union, exact_both,
    exact_jaccard_ppm).

    Sketch side: distinct members with in_a/in_b flags (one keyed
    aggregate over the filtered log), md5-hashed, two-phase global
    bottom-k cut (partition-local top-k first, so the global sort sees
    ≤ k·partitions rows). ``jaccard_ppm = n_both·1e6 div k_used``.
    ``union_est`` is exact (= n_union_sketch) while the sketch is
    unsaturated, else the KMV estimator ``floor((k-1)·2^60 / h_k)``
    via one identical IEEE multiply/divide/floor on both engines.

    The exact columns (full distinct counts — gate-scale affordable)
    ride along so the report quantifies its own sketch error.
    """
    from pyspark.sql.window import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    members = (
        events.filter(F.col(type_col).isin([type_a, type_b]))
        .groupBy(F.col(id_col).alias("_id"))
        .agg(
            F.max((F.col(type_col) == type_a).cast("int")).alias("in_a"),
            F.max((F.col(type_col) == type_b).cast("int")).alias("in_b"),
        )
    )
    hashed = members.select(
        F.col("_id").cast("string").alias("_id"),
        _bk_hash("_id", seed).alias("_h"),
        "in_a",
        "in_b",
    )
    order = [F.asc("_h"), F.asc("_id")]
    local_w = Window.partitionBy(F.spark_partition_id()).orderBy(*order)
    pruned = (
        hashed.withColumn("_lr", F.row_number().over(local_w))
        .filter(F.col("_lr") <= k)
        .drop("_lr")
    )
    w = Window.partitionBy().orderBy(*order)
    sk = (
        pruned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .withColumn(
            "_hk_int",
            F.expr("CAST(conv(substring(_h, 1, 15), 16, 10) AS BIGINT)"),
        )
    )
    sketch_row = sk.agg(
        F.count(F.lit(1)).cast("long").alias("n_union_sketch"),
        F.sum(F.expr("in_a * in_b")).cast("long").alias("n_both"),
        F.max(F.expr("CASE WHEN _rn = " + str(k) + " THEN _hk_int END")).alias(
            "_hk"
        ),
    ).select(
        F.least(F.lit(k).cast("long"), F.col("n_union_sketch")).alias("k_used"),
        "n_union_sketch",
        "n_both",
        F.when(
            F.col("n_union_sketch") < k, F.col("n_union_sketch")
        )
        .otherwise(
            F.expr(
                f"CAST(floor(CAST({k - 1} AS DOUBLE) * {KMV_HASH_SPACE!r}"
                " / CAST(_hk AS DOUBLE)) AS BIGINT)"
            )
        )
        .alias("union_est"),
    )
    exact_row = members.agg(
        F.count(F.lit(1)).cast("long").alias("exact_union"),
        F.sum(F.expr("in_a * in_b")).cast("long").alias("exact_both"),
    )
    return sketch_row.crossJoin(exact_row).select(
        "k_used",
        "n_union_sketch",
        "n_both",
        F.expr("n_both * 1000000 div k_used").alias("jaccard_ppm"),
        "union_est",
        F.expr("(n_both * union_est) div k_used").alias("intersection_est"),
        "exact_union",
        "exact_both",
        F.expr("exact_both * 1000000 div exact_union").alias(
            "exact_jaccard_ppm"
        ),
    )


def kmv_overlap_oracle_sql(
    *,
    type_a: str,
    type_b: str,
    k: int = 64,
    table: str = "events",
    id_col: str = "user_id",
    type_col: str = "event_type",
    seed: str = BOTTOMK_SEED,
) -> str:
    """DuckDB twin of :func:`kmv_overlap` — same md5 order, same hex
    prefix integerization, same IEEE estimator expression."""
    return f"""
WITH members AS (
  SELECT CAST({id_col} AS VARCHAR) AS id,
         MAX(CASE WHEN {type_col} = '{type_a}' THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN {type_col} = '{type_b}' THEN 1 ELSE 0 END) AS in_b
  FROM {table} WHERE {type_col} IN ('{type_a}', '{type_b}')
  GROUP BY 1
), hashed AS (
  SELECT id, md5('{seed}|' || id) AS h, in_a, in_b FROM members
), sk AS (
  SELECT *, CAST(('0x' || substring(h, 1, 15)) AS BIGINT) AS hk_int
  FROM (SELECT *, row_number() OVER (ORDER BY h ASC, id ASC) AS rn
        FROM hashed)
  WHERE rn <= {k}
), srow AS (
  SELECT CAST(count(*) AS BIGINT) AS n_union_sketch,
         CAST(SUM(in_a * in_b) AS BIGINT) AS n_both,
         MAX(CASE WHEN rn = {k} THEN hk_int END) AS hk
  FROM sk
), erow AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_union,
         CAST(SUM(in_a * in_b) AS BIGINT) AS exact_both
  FROM members
)
SELECT LEAST({k}, n_union_sketch) AS k_used,
       n_union_sketch, n_both,
       n_both * 1000000 // LEAST({k}, n_union_sketch) AS jaccard_ppm,
       CASE WHEN n_union_sketch < {k} THEN n_union_sketch
            ELSE CAST(floor(CAST({k - 1} AS DOUBLE) * {KMV_HASH_SPACE!r}
                            / CAST(hk AS DOUBLE)) AS BIGINT)
       END AS union_est,
       (n_both * (CASE WHEN n_union_sketch < {k} THEN n_union_sketch
                       ELSE CAST(floor(CAST({k - 1} AS DOUBLE)
                                       * {KMV_HASH_SPACE!r}
                                       / CAST(hk AS DOUBLE)) AS BIGINT)
                  END)) // LEAST({k}, n_union_sketch) AS intersection_est,
       exact_union, exact_both,
       exact_both * 1000000 // exact_union AS exact_jaccard_ppm
FROM srow CROSS JOIN erow
"""
