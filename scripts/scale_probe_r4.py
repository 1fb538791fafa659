#!/usr/bin/env python
"""Round-4 1M-row scale probes (VERDICT r3 Next #6): semantic_dedup,
decontaminate, shuffle_shards, sq8_rerank_topk at 1M rows on local[32].

Prints one JSON line with per-step wall timings; results are recorded in
PLANS.md (round-4 probe table). Synthetic inputs are generated distributed
(one RNG stream per partition, same pattern as bench.py) — documents as
deterministic token sequences over a 50k vocabulary, embeddings as uniform
float32 with a 10% planted near-duplicate tail so the dedup path does real
grouping work.
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

N_DOCS = int(os.environ.get("PROBE_DOCS", "1000000"))
N_VECS = int(os.environ.get("PROBE_VECS", "1000000"))
DIM = 64
PARTS = 32


def synth_embeddings(spark, n, dim, seed=42, dup_frac=0.1):
    """Uniform float32; the last dup_frac of each partition's rows are
    near-copies (1e-4 noise) of its first rows — planted semantic dups."""

    def gen(it):
        import pandas as pd

        for pdf in it:
            for pid in pdf["pid"]:
                rng = np.random.default_rng(seed + int(pid))
                lo = int(pid) * n // PARTS
                hi = (int(pid) + 1) * n // PARTS
                rows = hi - lo
                base = rng.random((rows, dim), dtype=np.float32)
                ndup = int(rows * dup_frac)
                if ndup:
                    base[rows - ndup:] = base[:ndup] + rng.normal(
                        0, 1e-4, (ndup, dim)
                    ).astype(np.float32)
                yield pd.DataFrame(
                    {"vec_id": list(range(lo, hi)), "embedding": list(base)}
                )

    base = spark.createDataFrame(
        [(i,) for i in range(PARTS)], "pid int"
    ).repartition(PARTS)
    return base.mapInPandas(gen, "vec_id long, embedding array<float>")


def synth_docs(spark, n, words=40, vocab=50_000):
    """Deterministic token sequences: word_j(doc i) = hash-mixed index into
    a 50k vocabulary — overlapping 4-grams occur across docs by construction
    (the mix reuses windows for every 16th doc)."""
    w = F.sequence(F.lit(0), F.lit(words - 1))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                w,
                lambda j: F.concat(
                    F.lit("w"),
                    F.pmod(
                        (F.col("id") / 16).cast("long") * 31 + j * 7 + F.col("id") % 16,
                        F.lit(vocab),
                    ),
                ),
            ),
        ).alias("text"),
    )


def main() -> None:
    spark = get_spark("scale_probe_r4")
    t: dict[str, float] = {}
    d: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 1)
        print(f"[probe] {name}: {t[name]}s", file=sys.stderr)
        return out

    # ---- inputs (cached, generation untimed in the operator rows)
    emb = synth_embeddings(spark, N_VECS, DIM).cache()
    timed("gen_embeddings_1M", emb.count)
    docs = synth_docs(spark, N_DOCS).cache()
    timed("gen_docs_1M", docs.count)

    # ---- semantic_dedup at nlist=sqrt(N)=1000 (the SemDeDup cell regime)
    from pyrope_spark.operators.dedup import semantic_dedup

    out = {}

    def sd():
        r = semantic_dedup(emb, nlist=1000, threshold=0.95)
        out["dups"] = r.filter("is_dup").count()

    timed("semantic_dedup_1M_nlist1000", sd)
    d["semantic_dedup_dups_found"] = out["dups"]

    # ---- decontaminate: 1M train docs vs a 5k benchmark slice
    from pyrope_spark.operators.curation import decontaminate

    bench = docs.filter(F.col("doc_id") % 200 == 7).cache()
    bench.count()

    def dc():
        r = decontaminate(docs, bench)
        out["contaminated"] = r.filter("contaminated").count()

    timed("decontaminate_1M_vs_5k", dc)
    d["decontaminate_flagged"] = out["contaminated"]

    # ---- shuffle_shards into 128 shards
    from pyrope_spark.operators.curation import shuffle_shards

    def sh():
        out["shards"] = (
            shuffle_shards(docs, n_shards=128)
            .groupBy("shard").count().count()
        )

    timed("shuffle_shards_1M_128", sh)
    d["shuffle_shards_distinct"] = out["shards"]

    # ---- sq8_rerank_topk: coarse byte scan + exact confirm at 1M x d64
    from pyrope_spark.operators.similarity import sq8_rerank_topk

    rng = np.random.default_rng(1337)
    qdf = spark.createDataFrame(
        [(f"q{i}", [float(x) for x in rng.random(DIM, dtype=np.float32)]) for i in range(100)],
        "query_id string, vector array<float>",
    ).cache()
    qdf.count()
    vecs = emb.select(
        F.col("vec_id").cast("string").alias("id"), F.col("embedding").alias("vector")
    )

    def rr():
        out["rerank_rows"] = sq8_rerank_topk(
            vecs, qdf, k=10, rerank=30, metric="l2", impl="segments"
        ).count()

    timed("sq8_rerank_1M_q100", rr)
    d["sq8_rerank_rows"] = out["rerank_rows"]

    print(json.dumps({"probe": "r4_1M", "timings": t, "derived": d}))


if __name__ == "__main__":
    main()
