"""Independent brute-force Python references for the session-3 operators.

The DuckDB oracles replicate the SAME pipeline step-for-step, so a shared
algorithmic bug would pass the hash gate; these checks re-derive the
expected output from first principles (dict/loop implementations that share
no structure with the Spark plans) on seeded random inputs.
"""

from __future__ import annotations

import random
from collections import Counter, defaultdict
from datetime import datetime, timedelta

from pyrope_spark.operators.funnel import funnel
from pyrope_spark.operators.passages import duplicate_passages
from pyrope_spark.operators.scd import scd2_build


def _rand_docs(seed, n_docs=30, vocab=12, doc_len=(8, 40)):
    rng = random.Random(seed)
    return [
        (i, " ".join(f"w{rng.randrange(vocab)}" for _ in range(rng.randint(*doc_len))))
        for i in range(n_docs)
    ]


def _brute_passages(docs, window):
    """First-principles: count every window occurrence corpus-wide, mark
    positions whose window repeats, merge overlapping/adjacent coverage."""
    occs = Counter()
    per_doc = {}
    for did, text in docs:
        toks = text.lower().split()
        per_doc[did] = toks
        for p in range(len(toks) - window + 1):
            occs[tuple(toks[p : p + window])] += 1
    spans = []
    for did, toks in per_doc.items():
        dup_pos = [
            p + 1
            for p in range(len(toks) - window + 1)
            if occs[tuple(toks[p : p + window])] > 1
        ]
        cur = None
        for p in dup_pos:
            e = p + window - 1
            if cur and p <= cur[1] + 1:
                cur[1] = max(cur[1], e)
                cur[2] += 1
            else:
                if cur:
                    spans.append((did, cur[0], cur[1], cur[2]))
                cur = [p, e, 1]
        if cur:
            spans.append((did, cur[0], cur[1], cur[2]))
    return sorted(spans)


def test_passages_match_bruteforce_on_random_corpora(spark):
    for seed in (7, 21, 99):
        docs = _rand_docs(seed)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
            for r in duplicate_passages(df, window=8).collect()
        )
        assert got == _brute_passages(docs, 8), f"seed {seed}"


def _rand_events(seed, n=300, users=12, types=("view", "click", "purchase")):
    rng = random.Random(seed)
    base = datetime(2026, 1, 1)
    return [
        (
            rng.randrange(users),
            base + timedelta(seconds=rng.randrange(100000)),
            rng.choice(types),
            i,
        )
        for i in range(n)
    ]


def test_funnel_matches_bruteforce_on_random_events(spark):
    steps = ["view", "click", "purchase"]
    within = 20000
    for seed in (3, 17):
        rows = _rand_events(seed)
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string, event_id long"
        )
        got = {
            r["user_id"]: (r["max_step"], r["t1_us"], r["t3_us"])
            for r in funnel(df, steps=steps, within_s=within).collect()
        }
        # brute force: greedy earliest chain per user
        by_user = defaultdict(list)
        for u, ts, et, _ in rows:
            by_user[u].append((ts, et))
        exp = {}
        for u, evs in by_user.items():
            evs.sort()
            s1 = [ts for ts, et in evs if et == steps[0]]
            if not s1:
                continue
            t = [min(s1)]
            for step in steps[1:]:
                nxt = [
                    ts
                    for ts, et in evs
                    if et == step
                    and ts > t[-1]
                    and (ts - t[0]).total_seconds() * 1e6 <= within * 1e6
                ]
                if not nxt:
                    break
                t.append(min(nxt))
            us = lambda d: int(d.timestamp() * 1e6)
            exp[u] = (
                len(t),
                us(t[0]),
                us(t[2]) if len(t) == 3 else None,
            )
        assert got == exp, f"seed {seed}"


def test_scd2_matches_bruteforce_on_random_changelog(spark):
    rng = random.Random(42)
    base = datetime(2026, 1, 1)
    rows = [
        (rng.randrange(6), base + timedelta(seconds=i * 10), rng.choice("abc"), i)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, status string, seq long")
    got = sorted(
        (r["k"], r["version"], r["status"], r["valid_from"], r["valid_to"])
        for r in scd2_build(
            df, key_cols=["k"], ts_col="ts", attr_cols=["status"],
            tiebreak_cols=["seq"],
        ).collect()
    )
    by_key = defaultdict(list)
    for k, ts, st_, seq in rows:
        by_key[k].append((ts, seq, st_))
    exp = []
    for k, evs in by_key.items():
        evs.sort()
        kept = [e for i, e in enumerate(evs) if i == 0 or e[2] != evs[i - 1][2]]
        for v, (ts, seq, st_) in enumerate(kept, start=1):
            nxt = kept[v][0] if v < len(kept) else None
            exp.append((k, v, st_, ts, nxt))
    assert got == sorted(exp)


def test_gapfill_matches_bruteforce_on_random_events(spark):
    from pyrope_spark.operators.temporal import gapfill

    rng = random.Random(11)
    base = datetime(2026, 1, 1)
    rows = [
        (rng.randrange(5), base + timedelta(seconds=rng.randrange(40) * 900),
         round(rng.uniform(-50, 50), 3))
        for _ in range(120)
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, value double")
    got = {
        (r["k"], r["bucket_ts_s"]): r
        for r in gapfill(df, key_cols=["k"], bucket_s=3600,
                         observation_round=6).collect()
    }
    # brute force
    per = defaultdict(lambda: defaultdict(list))
    for k, ts, v in rows:
        per[k][int(ts.timestamp() // 3600) * 3600].append(v)
    import math
    for k, buckets in per.items():
        obs = {b: round(sum(vs) / len(vs), 6) for b, vs in buckets.items()}
        bs = sorted(obs)
        dense = range(bs[0], bs[-1] + 1, 3600)
        assert {b for kk, b in got if kk == k} == set(dense)
        for b in dense:
            r = got[(k, b)]
            assert (r["v_raw"] is None) == (b not in obs)
            prevs = [x for x in bs if x <= b]
            assert r["v_locf"] == (obs[max(prevs)] if prevs else None)
            if b in obs:
                assert r["v_lerp"] == obs[b]
            elif prevs and any(x > b for x in bs):
                p, n = max(prevs), min(x for x in bs if x > b)
                lo, hi = obs[p], obs[n]
                exp = lo + (hi - lo) * (b - p) / (n - p)
                assert abs(r["v_lerp"] - exp) < 1e-6, (k, b, r["v_lerp"], exp)


def test_cms_matches_bruteforce_hash_family(spark):
    from pyrope_spark.functions.text import FP_ROLL_P, FP_ROLL_R, FP_ROLL_SEED
    from pyrope_spark.operators.sketch import CMS_MULTS, CMS_OFFS, cms_build, cms_estimate

    rng = random.Random(5)
    texts = [" ".join(f"t{rng.randrange(40)}" for _ in range(20)) for _ in range(25)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    depth, width = 3, 64
    sketch = cms_build(docs, depth=depth, width=width)
    exact = Counter(w for t in texts for w in t.split())

    def fp(token):  # python mirror of char_fp_rolling
        acc = FP_ROLL_SEED
        for c in token:
            acc = (acc * FP_ROLL_R + ord(c)) % FP_ROLL_P
        return acc

    table = defaultdict(int)
    for term, cnt in exact.items():
        for d in range(depth):
            table[(d, (fp(term) * CMS_MULTS[d] + CMS_OFFS[d]) % FP_ROLL_P % width)] += cnt
    terms = spark.createDataFrame([(t,) for t in exact], "term string")
    est = {r["term"]: r["est_count"] for r in
           cms_estimate(sketch, terms, depth=depth, width=width).collect()}
    for term, cnt in exact.items():
        expected = min(
            table[(d, (fp(term) * CMS_MULTS[d] + CMS_OFFS[d]) % FP_ROLL_P % width)]
            for d in range(depth)
        )
        assert est[term] == expected and expected >= cnt
