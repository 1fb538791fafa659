#!/usr/bin/env python
"""Round-6 session-4 probes — scale shapes of this session's operators:

1. containment_pairs at 100k docs (template corpus with planted 20%
   subset-copies): the one-sided prefix filter's candidate fanout vs the
   all-pairs count it avoids, plus wall time. Claim under test: the
   inner-prefix-vs-full-table join is bounded by rare-shingle document
   frequencies, not |docs|^2.
2. attribution_credit at 5M events / 200k users: the user-keyed range
   join + two conversion-keyed aggregates should stay linear
   (per-user journey fanout bounded by activity in the window).
3. frequent_triples at 1M baskets: the Apriori prune chain's candidate
   counts per stage (items -> pairs -> triples) and wall time.
4. pca_fit at 500k x 64: the sufficient-statistics pass wall (one
   mapInPandas sweep) and partial count — the eigh is driver-side
   microseconds; the probe pins that the corpus pass dominates and
   scales with partitions.

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


def template_docs_with_subsets(spark, n_docs=100_000, words=30):
    """80% template docs (distinct), 20% subset-copies: a random 70-90%
    leading slice of a template doc — containment >= 0.8 against its
    source at 3-gram shingles for slices >= ~85%."""

    def gen(it):
        import pandas as pd

        vocab = [f"w{i}" for i in range(5000)]
        for pdf in it:
            rows = []
            for pid in pdf["id"]:
                r = np.random.default_rng(pid)
                toks = list(r.choice(vocab, size=words))
                rows.append((int(pid) * 2, " ".join(toks)))
                if pid % 5 == 0:
                    keep = int(words * (0.85 + 0.1 * float(r.random())))
                    rows.append((int(pid) * 2 + 1, " ".join(toks[:keep])))
            yield pd.DataFrame(rows, columns=["doc_id", "text"])

    return (
        spark.range(0, n_docs, numPartitions=PARTS)
        .mapInPandas(gen, "doc_id long, text string")
    )


def synth_events(spark, n_events=5_000_000, n_users=200_000, span_days=30):
    def gen(it):
        import pandas as pd

        for pdf in it:
            ids = pdf["id"].to_numpy()
            r = np.random.default_rng(int(ids[0]) + 1)
            n = len(ids)
            ts = (r.integers(0, span_days * 86400, size=n) * 1_000_000_000)
            yield pd.DataFrame(
                {
                    "event_id": ids,
                    "user_id": r.integers(0, n_users, size=n),
                    "ts_ns": ts,
                    "event_type": r.choice(
                        ["view", "click", "purchase"], p=[0.6, 0.3, 0.1], size=n
                    ),
                    "value": np.round(r.random(size=n) * 100, 2),
                }
            )

    return spark.range(0, n_events, numPartitions=PARTS).mapInPandas(
        gen, "event_id long, user_id long, ts_ns long, event_type string, value double"
    )


def synth_baskets(spark, n_baskets=1_000_000, n_items=50_000):
    def gen(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for b in pdf["id"]:
                r = np.random.default_rng(int(b) + 7)
                k = int(r.integers(2, 7))
                # zipf-ish popularity so frequent pairs/triples exist
                items = np.unique(
                    (r.pareto(1.3, size=k) * 50).astype(np.int64) % n_items
                )
                rows += [(int(b), int(i)) for i in items]
            yield pd.DataFrame(rows, columns=["bid", "item"])

    return spark.range(0, n_baskets, numPartitions=PARTS).mapInPandas(
        gen, "bid long, item long"
    )


def main() -> None:
    spark = get_spark("probe_r6e")

    # 1. containment at 100k docs
    from pyrope_spark.operators.dedup import containment_pairs

    docs = template_docs_with_subsets(spark, 100_000).persist()
    timed("containment_corpus_rows", docs.count)
    pairs = timed(
        "containment_100k_docs",
        lambda: containment_pairs(docs, n=3, t_num=8, t_den=10).count(),
    )
    out["containment_pairs_found"] = pairs
    docs.unpersist()

    # 2. attribution at 5M events
    from pyrope_spark.operators.attribution import attribution_credit

    ev = synth_events(spark).persist()
    timed("attribution_event_rows", ev.count)
    timed(
        "attribution_5m_events",
        lambda: attribution_credit(ev, lookback_s=7 * 86400).count(),
    )
    ev.unpersist()

    # 3. frequent triples at 1M baskets
    from pyrope_spark.operators.analytics import frequent_triples

    bk = synth_baskets(spark).persist()
    timed("baskets_rows", bk.count)
    n3 = timed(
        "frequent_triples_1m_baskets",
        lambda: frequent_triples(
            bk, basket_col="bid", item_col="item", min_support=50
        ).count(),
    )
    out["triples_found"] = n3
    bk.unpersist()

    # 4. PCA at 500k x 64
    from pyrope_spark.operators.pca import pca_fit

    def gen_vec(it):
        import pandas as pd

        for pdf in it:
            ids = pdf["id"].to_numpy()
            r = np.random.default_rng(int(ids[0]) + 3)
            x = r.standard_normal((len(ids), 64))
            x[:, 0] *= 8.0  # planted dominant direction
            yield pd.DataFrame({"vec_id": ids, "embedding": list(map(list, x))})

    vec = (
        spark.range(0, 500_000, numPartitions=PARTS)
        .mapInPandas(gen_vec, "vec_id long, embedding array<double>")
        .persist()
    )
    timed("pca_vec_rows", vec.count)
    m = None

    def fit():
        nonlocal m
        m = pca_fit(vec, n_components=8)
        return m.n

    timed("pca_fit_500k_d64", fit)
    out["pca_top_component_axis0"] = round(float(abs(m.components[0][0])), 4)
    vec.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
