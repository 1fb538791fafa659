#!/usr/bin/env python
"""Round-6 session probes for the new operators, at event/corpus scale:

- holt (level+trend recurrence): 5M events x 200k users — must match the
  ewma partitioned-pass linear shape (one shuffle).
- item_item_cosine_topk: 2M baskets x ~4 items from a 50k-item zipf-ish
  catalog (~8M lines) — pair fanout bounded by basket size by construction;
  plus a mega-basket run demonstrating the max_basket_size cap.
- setsim_prefix_join: 200k synthetic docs with planted near-dups — the
  lossless prefix join at corpus scale vs the DF-capped exact join
  (ngram_jaccard_pairs) on the same corpus.

One JSON line at the end; rows recorded in PLANS.md.
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


def exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0].count("Exchange hashpartitioning")


def synth_events(spark, n=5_000_000, n_users=200_000):
    def gen(it):
        import pandas as pd

        for pdf in it:
            for pid in pdf["pid"]:
                rng = np.random.default_rng(21 + int(pid))
                lo, hi = int(pid) * n // PARTS, (int(pid) + 1) * n // PARTS
                rows = hi - lo
                yield pd.DataFrame(
                    {
                        "event_id": np.arange(lo, hi, dtype=np.int64),
                        "ts": pd.to_datetime(
                            rng.integers(1735689600, 1751241600, rows), unit="s"
                        ),
                        "user_id": rng.integers(0, n_users, rows),
                        "value": rng.random(rows) * 100.0,
                    }
                )

    base = spark.createDataFrame([(i,) for i in range(PARTS)], "pid int").repartition(
        PARTS
    )
    return base.mapInPandas(
        gen, "event_id long, ts timestamp, user_id long, value double"
    )


def synth_baskets(spark, n_baskets=2_000_000, n_items=50_000, avg_items=4):
    def gen(it):
        import pandas as pd

        for pdf in it:
            for pid in pdf["pid"]:
                rng = np.random.default_rng(31 + int(pid))
                lo, hi = (
                    int(pid) * n_baskets // PARTS,
                    (int(pid) + 1) * n_baskets // PARTS,
                )
                bks, its = [], []
                for b in range(lo, hi):
                    k = 2 + int(rng.integers(0, 2 * avg_items - 3))
                    # zipf-ish popularity: squared-uniform concentrates mass
                    items = (rng.random(k) ** 2 * n_items).astype(np.int64)
                    bks.extend([b] * k)
                    its.extend(items.tolist())
                yield pd.DataFrame({"basket_id": bks, "item_id": its})

    base = spark.createDataFrame([(i,) for i in range(PARTS)], "pid int").repartition(
        PARTS
    )
    return base.mapInPandas(gen, "basket_id long, item_id long")


def synth_docs(spark, n_docs=200_000):
    """Template corpus over a ~2k-word vocab; ~5% of docs are 1-word-mutated
    copies of the previous doc (planted near-dups)."""

    def gen(it):
        import pandas as pd

        vocab = [f"w{i}" for i in range(2000)]
        for pdf in it:
            for pid in pdf["pid"]:
                rng = np.random.default_rng(41 + int(pid))
                lo, hi = int(pid) * n_docs // PARTS, (int(pid) + 1) * n_docs // PARTS
                ids, texts = [], []
                prev = None
                for d in range(lo, hi):
                    if prev is not None and rng.random() < 0.05:
                        words = list(prev)
                        words[int(rng.integers(0, len(words)))] = vocab[
                            int(rng.integers(0, len(vocab)))
                        ]
                    else:
                        words = [
                            vocab[int(x)]
                            for x in rng.integers(0, len(vocab), 30)
                        ]
                    prev = words
                    ids.append(d)
                    texts.append(" ".join(words))
                yield pd.DataFrame({"doc_id": ids, "text": texts})

    base = spark.createDataFrame([(i,) for i in range(PARTS)], "pid int").repartition(
        PARTS
    )
    return base.mapInPandas(gen, "doc_id long, text string")


def main():
    spark = get_spark()
    from pyrope_spark.operators.dedup import ngram_jaccard_pairs, setsim_prefix_join
    from pyrope_spark.operators.recommend import item_item_cosine_topk
    from pyrope_spark.operators.temporal import holt

    ev = synth_events(spark).cache()
    timed("events_materialize_5m", lambda: ev.count())
    h = holt(ev, 0.5, 0.25)
    timed("holt_5m_200k_users", lambda: h.count())
    out["holt_exchanges"] = exchanges(h)
    ev.unpersist()

    bk = synth_baskets(spark).cache()
    timed("baskets_materialize_8m_lines", lambda: bk.count())
    ii = item_item_cosine_topk(bk, k=10)
    timed("item_item_2m_baskets_50k_items", lambda: ii.count())
    out["item_item_exchanges"] = exchanges(ii)

    # mega-basket hazard: one 20k-item basket would add C(20k,2)=2e8 pairs;
    # the cap drops it a priori
    mega = spark.range(20_000).select(
        F.lit(99_999_999).alias("basket_id"), F.col("id").alias("item_id")
    )
    capped = item_item_cosine_topk(
        bk.unionByName(mega), k=10, max_basket_size=64
    )
    timed("item_item_megabasket_capped", lambda: capped.count())
    bk.unpersist()

    docs = synth_docs(spark).cache()
    timed("docs_materialize_200k", lambda: docs.count())
    ps = setsim_prefix_join(docs, n=2, t_num=8, t_den=10)
    timed("setsim_prefix_200k_docs", lambda: ps.count())
    out["setsim_exchanges"] = exchanges(ps)
    ex = ngram_jaccard_pairs(docs, n=2, threshold=0.8, max_shingle_df=200)
    timed("ngram_jaccard_dfcap200_200k_docs", lambda: ex.count())
    docs.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
