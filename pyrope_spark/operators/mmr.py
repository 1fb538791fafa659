"""Maximal Marginal Relevance diversified re-ranking (Carbonell &
Goldstein 1998).

The search-quality stage after any ANN method: from a per-query candidate
pool (typically ``ann_topk(..., rerank=R)`` output), greedily select k
results trading relevance against redundancy:

    MMR(d) = lambda * rel(d) - (1 - lambda) * max_{s in selected} sim(d, s)

Distributed shape: one ``applyInPandas`` cogroup per query — the kernel is
an R x R cosine matrix + k greedy sweeps (R is the rerank pool, typically
50-500, so the per-group work is micro); queries process in parallel across
executors with no driver involvement and no cross-query state. This is the
same per-query-group pattern as the distributed rerank confirm stage
(similarity.exact_rerank).

Determinism contract (what makes the DuckDB oracle replicate): selection
compares ROUNDED scores (round-half-away-from-zero at ``round_to``
decimals, mirroring DuckDB/Spark round() rather than numpy's banker
rounding) with ascending-id tie-break; sims/rels are combined in float64
from the float32 inputs exactly as the SQL rendering casts DOUBLE[].
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _round_half_away(x: np.ndarray, decimals: int) -> np.ndarray:
    s = 10.0**decimals
    # + 0.0 normalizes -0.0 (sign(x)*0 for tiny negative x) to +0.0 —
    # engines and value-hashes render the two differently
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s + 0.0


def mmr_rerank(
    candidates: DataFrame,
    *,
    k: int = 10,
    lam: float = 0.5,
    query_col: str = "query_id",
    id_col: str = "id",
    vec_col: str = "embedding",
    score_col: str = "score",
    round_to: int = 6,
) -> DataFrame:
    """Greedy MMR over each query's candidate pool.

    Input: (query_col, id_col, vec_col ARRAY<FLOAT>, score_col) — score is
    the relevance (higher = better; cosine similarity from the ANN stage).
    Output: (query_col, id_col, rank 1..k, mmr_score) where rank 1 carries
    the rounded relevance (nothing selected yet, the redundancy term is
    empty) and later ranks the rounded MMR value at selection time.
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    out_schema = (
        f"{query_col} string, {id_col} string, rank long, mmr_score double"
    )
    qc, ic, vc, sc = query_col, id_col, vec_col, score_col
    kk, ll, rr = k, lam, round_to

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        ids = pdf[ic].astype(str).to_numpy()
        order0 = np.argsort(ids, kind="stable")  # stable id order for ties
        V = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vc].to_numpy()]
        )[order0]
        rel = pdf[sc].to_numpy(dtype=np.float64)[order0]
        ids = ids[order0]
        norms = np.sqrt((V * V).sum(axis=1))
        norms[norms < 1e-6] = np.inf  # zero-norm guard: sim contributes 0
        Vn = V / norms[:, None]
        sim = Vn @ Vn.T
        rel_r = _round_half_away(rel, rr)
        picked: list[int] = []
        max_sim = np.full(n, -np.inf)
        scores_out: list[float] = []
        for step in range(min(kk, n)):
            if not picked:
                cand_scores = rel_r
            else:
                cand_scores = _round_half_away(
                    ll * rel - (1.0 - ll) * max_sim, rr
                )
            cand = cand_scores.copy()
            cand[picked] = -np.inf
            # argmax with ascending-id tie-break: ids are sorted, argmax
            # returns the first (= smallest id) among equals
            j = int(np.argmax(cand))
            picked.append(j)
            scores_out.append(float(cand[j]))
            max_sim = np.maximum(max_sim, sim[:, j])
        return pd.DataFrame(
            {
                qc: pdf[qc].iloc[0],
                ic: [ids[j] for j in picked],
                "rank": np.arange(1, len(picked) + 1, dtype=np.int64),
                "mmr_score": scores_out,
            }
        )

    return (
        candidates.select(
            F.col(qc).cast("string").alias(qc),
            F.col(ic).cast("string").alias(ic),
            F.col(vc).alias(vc),
            F.col(sc).cast("double").alias(sc),
        )
        .groupBy(qc)
        .applyInPandas(kernel, out_schema)
    )
