#!/usr/bin/env python
"""Round-6 session-3 probes:

1. BPE training at a realistic vocabulary: ~5M-word corpus over a
   200k-distinct-word zipf-ish vocab. The claim under test is the scale
   shape in operators/bpe.py — ONE corpus-scale shuffle (word_freqs),
   then per-merge cost bounded by |vocab|, not corpus size. Reports the
   corpus-pass wall and the per-merge wall separately.
2. theil_sen / spearman / xcorr daily-series shapes at 5M events over a
   10-year calendar (3650 days): the pairwise-slope table is C(days,2)
   per key — bounded by the calendar (6.6M pairs/key at 10y), never by
   the event count; the corpus-scale stage is the daily aggregate.
3. setsim_prefix_join re-probe after the persist+int64+broadcast verify
   rewrite (r6b/r6c corpora): 200k template corpus and the 100k
   boilerplate corpus, both paths.

One JSON line at the end; recorded in PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pyrope_spark.session import get_spark  # noqa: E402

PARTS = 32
out: dict = {}


def timed(name, fn):
    t0 = time.time()
    r = fn()
    out[name] = round(time.time() - t0, 1)
    print(f"[probe] {name}: {out[name]}s -> {r}", flush=True)
    return r


def synth_zipf_docs(spark, n_docs=200_000, words_per_doc=25, vocab=200_000):
    """Corpus whose word-frequency table is ~``vocab`` distinct words with
    a zipf-ish skew (realistic subword-training input)."""

    def gen(it):
        import pandas as pd

        for pdf in it:
            for pid in pdf["pid"]:
                rng = np.random.default_rng(17 + int(pid))
                lo = int(pid) * n_docs // PARTS
                hi = (int(pid) + 1) * n_docs // PARTS
                n = hi - lo
                # zipf over the vocab: id = floor(vocab * u^3) skews low ids hot
                u = rng.random((n, words_per_doc))
                ids = (vocab * u**3).astype(np.int64)
                texts = [
                    " ".join(f"tk{x}q{x % 97}" for x in row) for row in ids
                ]
                yield pd.DataFrame(
                    {"doc_id": np.arange(lo, hi), "text": texts}
                )

    base = spark.range(PARTS).select(F.col("id").alias("pid")).repartition(PARTS)
    return base.mapInPandas(gen, "doc_id long, text string")


def synth_events(spark, n=5_000_000, days=3650, users=200_000):
    def gen(it):
        import pandas as pd

        types = np.array(["view", "click", "purchase", "signup", "error"])
        for pdf in it:
            for pid in pdf["pid"]:
                rng = np.random.default_rng(7 + int(pid))
                lo, hi = int(pid) * n // PARTS, (int(pid) + 1) * n // PARTS
                m = hi - lo
                day = rng.integers(0, days, m)
                sec = rng.integers(0, 86400, m)
                ts = (
                    np.datetime64("2016-01-01")
                    + day.astype("timedelta64[D]")
                    + sec.astype("timedelta64[s]")
                )
                yield pd.DataFrame(
                    {
                        "event_id": np.arange(lo, hi),
                        "ts": ts,
                        "user_id": rng.integers(0, users, m),
                        "event_type": types[rng.integers(0, 5, m)],
                        "value": np.round(rng.random(m) * 100, 2),
                    }
                )

    base = spark.range(PARTS).select(F.col("id").alias("pid")).repartition(PARTS)
    return base.mapInPandas(
        gen, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def main():
    spark = get_spark()
    from pyrope_spark.operators.bpe import bpe_train, pair_counts, word_freqs
    from pyrope_spark.operators.dedup import setsim_prefix_join
    import scripts.scale_probe_r6b as p6b
    import scripts.scale_probe_r6c as p6c

    # ---- 1. BPE at 200k-word vocab
    docs = synth_zipf_docs(spark).cache()
    timed("bpe_docs_materialize_200k_docs_5m_words", lambda: docs.count())
    wf = timed(
        "bpe_word_freqs_corpus_pass",
        lambda: word_freqs(docs).count(),
    )
    out["bpe_vocab_size"] = wf
    t0 = time.time()
    merges, vocab = bpe_train(docs, num_merges=30)
    n_merges = merges.count()
    wall = time.time() - t0
    out["bpe_train_30_merges"] = round(wall, 1)
    out["bpe_per_merge_s"] = round(wall / max(n_merges, 1), 2)
    out["bpe_merges_learned"] = n_merges
    print(f"[probe] bpe_train_30_merges: {out['bpe_train_30_merges']}s "
          f"({out['bpe_per_merge_s']}s/merge, {n_merges} merges)", flush=True)
    docs.unpersist()

    # ---- 2. daily-series stats at 5M events / 3650 days
    ev = synth_events(spark).cache()
    timed("events_materialize_5m", lambda: ev.count())
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("v")
    )
    a = daily.select("event_type", F.col("day").alias("d1"), F.col("v").alias("v1"))
    b = daily.select("event_type", F.col("day").alias("d2"), F.col("v").alias("v2"))
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "event_type",
            F.expr("(v2 - v1) * 1000000 DIV datediff(d2, d1)").alias("s"),
        )
    )
    timed("theil_sen_pair_slopes_3650d_5types", lambda: slopes.count())
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy("s")
    med = (
        slopes.withColumn("rn", F.row_number().over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(W.partitionBy("event_type")))
        .filter(F.col("rn") == F.expr("(cnt + 1) DIV 2"))
    )
    timed("theil_sen_full_median_3650d", lambda: med.count())
    ev.unpersist()

    # ---- 3. setsim after the rewrite
    d200 = p6b.synth_docs(spark).cache()
    d200.count()
    timed(
        "setsim_200k_broadcast_path",
        lambda: setsim_prefix_join(d200, n=2, t_num=8, t_den=10).count(),
    )
    timed(
        "setsim_200k_shuffle_path",
        lambda: setsim_prefix_join(
            d200, n=2, t_num=8, t_den=10, max_broadcast_docs=1
        ).count(),
    )
    d200.unpersist()
    d100 = p6c.synth_boilerplate_docs(spark).cache()
    d100.count()
    timed(
        "setsim_100k_boilerplate",
        lambda: setsim_prefix_join(d100, n=2, t_num=8, t_den=10).count(),
    )
    d100.unpersist()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
