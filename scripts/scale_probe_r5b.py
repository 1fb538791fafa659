#!/usr/bin/env python
"""Round-5 probe: fuzzy_levenshtein_join q-gram secondary blocking at 1M
names with a SKEWED length distribution (VERDICT r4 plan-audit watch item:
real name corpora concentrate in a few length buckets, making the
length-band join's within-bucket fan-out quadratic-ish).

Evidence produced:
1. band-only candidate volume at 1M (computed from bucket sizes — running
   it would be the quadratic blow-up itself) vs the q-gram path's actual
   candidate count;
2. q-gram path wall time at 1M right x 100k left;
3. pair-set equality band vs q-gram at 100k (both are lossless, so the
   outputs must be identical).
Prints one JSON line; results recorded in PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyrope_spark.operators.joins import fuzzy_levenshtein_join  # noqa: E402
from pyrope_spark.session import get_spark  # noqa: E402

N_RIGHT = int(os.environ.get("PROBE_NAMES", "1000000"))
N_LEFT = N_RIGHT // 10


def synth_names(spark, n, *, skew_len: int = 12, skew_frac: float = 0.8):
    """Deterministic names, ``skew_frac`` of them EXACTLY ``skew_len``
    chars (the one-dominant-length regime): hash-mixed lowercase chars."""
    frac_pm = int(skew_frac * 1000)
    length = F.when(
        F.pmod(F.col("id") * 2654435761, F.lit(1000)) < frac_pm,
        F.lit(skew_len),
    ).otherwise((F.pmod(F.col("id") * 40503, F.lit(10)) + 8).cast("int"))
    # per-(id, position) murmur3 mix — a linear-congruence char formula
    # collapses mod 26 (69069 % 26 == 13 gives period 2 over ids: every
    # other name identical, which turns the probe into an all-pairs bomb)
    chars = F.expr(
        "array_join(transform(sequence(1, _len), "
        "i -> chr(97 + pmod(hash(id, i), 26))), '')"
    )
    return (
        spark.range(n)
        .withColumn("_len", length)
        .select(F.col("id").alias("rid"), chars.alias("name"))
    )


def corrupt(df):
    """Drop one deterministic character — every corrupted name is within
    edit distance 1 of its original."""
    pos = (F.pmod(F.col("rid"), F.length("name") - 2) + 2).cast("int")
    return df.select(
        F.col("rid").alias("lid"),
        F.concat(
            F.expr("substring(name, 1, cast(pmod(rid, length(name) - 2) + 1 as int))"),
            F.expr(
                "substring(name, cast(pmod(rid, length(name) - 2) + 3 as int), "
                "length(name))"
            ),
        ).alias("name"),
    )


def main() -> None:
    spark = get_spark("scale_probe_r5b")
    t: dict[str, float] = {}
    d: dict = {}

    right = synth_names(spark, N_RIGHT).cache()
    n_right = right.count()
    left = corrupt(right.limit(N_LEFT).withColumnRenamed("rid", "rid2")
                   .withColumnRenamed("rid2", "rid")).cache()
    n_left = left.count()

    # 1. band-only candidate volume (computed, not run): with threshold 1
    # every string of the dominant length lands in the same w=2 bucket
    lb = right.groupBy(F.floor(F.length("name") / 2).alias("b")).count()
    rb = {r["b"]: r["count"] for r in lb.collect()}
    lbuckets = left.select(
        F.explode(
            F.array(
                F.floor(F.length("name") / 2) - 1,
                F.floor(F.length("name") / 2),
                F.floor(F.length("name") / 2) + 1,
            )
        ).alias("b")
    ).groupBy("b").count()
    band_candidates = sum(
        r["count"] * rb.get(r["b"], 0) for r in lbuckets.collect()
    )
    d["band_candidate_pairs_1M"] = band_candidates

    # 2. q-gram path at full scale. q=3: these synthetic names are
    # UNIFORM-random letters, the q-gram worst case — a bigram vocabulary
    # is only 26^2=676 keys, so even rarest-first prefixes carry ~1.5k-row
    # postings at 1M and the candidate join explodes (first attempt OOMed
    # at ~1.3e9 candidates). Trigrams give 17,576 keys (~230-row
    # postings). Real name corpora are Zipfy with far larger effective
    # vocabularies, where q=2 + rarest-first order is the standard choice.
    t0 = time.time()
    out = fuzzy_levenshtein_join(
        left, right, 1, qgram_block=True, q=3,
        left_keep=("lid",), right_keep=("rid",),
    )
    n_pairs = out.count()
    t["qgram_join_1M"] = round(time.time() - t0, 1)
    d["qgram_result_pairs_1M"] = n_pairs
    d["qgram_vs_band_candidate_ratio"] = (
        round(band_candidates / max(n_pairs, 1))
    )

    # 3. losslessness check: band == qgram pair sets, pinned at 20k scale
    # (the band path's dominant-length bucket is the quadratic blow-up
    # being demonstrated — running it bigger IS the failure mode)
    r100 = right.limit(20_000).cache()
    l100 = left.limit(2_000).cache()
    r100.count(), l100.count()

    def pairset(qgram):
        t0 = time.time()
        rows = fuzzy_levenshtein_join(
            l100, r100, 1, qgram_block=qgram, q=3,
            left_keep=("lid",), right_keep=("rid",),
        ).select("l_lid", "r_rid").collect()
        dt = round(time.time() - t0, 1)
        return {(r["l_lid"], r["r_rid"]) for r in rows}, dt

    qg, t["qgram_join_20k"] = pairset(True)
    band, t["band_join_20k"] = pairset(False)
    d["pairsets_equal_20k"] = qg == band
    d["pairs_20k"] = len(qg)

    print(json.dumps({
        "probe": "r5_fuzzy_qgram_scale", "n_right": n_right,
        "n_left": n_left, "timings_s": t, "derived": d,
    }))


if __name__ == "__main__":
    main()
