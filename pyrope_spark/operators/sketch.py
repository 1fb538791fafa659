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
