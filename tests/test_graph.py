"""PageRank (operators/graph.py) — known-graph values, mass/ranking
properties, and the integer-recurrence determinism contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyrope_spark.operators.graph import PR_SCALE, pagerank_fixed_iters


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _brute_pr(pairs, iters=3, d=85, scale=PR_SCALE):
    e = sorted({(s, t) for s, t in pairs if s != t})
    nodes = sorted({x for p in e for x in p})
    out = {}
    for s, _ in e:
        out[s] = out.get(s, 0) + 1
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    base = ((100 - d) * scale) // (100 * n)
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for s, t in e:
            nxt[t] += (d * r[s]) // (100 * out[s])
        r = nxt
    return r


def test_pagerank_matches_reference_recurrence(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 3), (2, 3)]  # dup edge
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_fixed_iters(_edges(spark, pairs)).collect()
    }
    assert got == _brute_pr(pairs)


def test_pagerank_hub_ranks_highest(spark):
    # star: everyone points at 0
    pairs = [(i, 0) for i in range(1, 6)]
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_fixed_iters(_edges(spark, pairs)).collect()
    }
    assert got[0] == max(got.values())
    leaves = {got[i] for i in range(1, 6)}
    assert len(leaves) == 1  # symmetric leaves tie exactly (integer math)


def test_pagerank_self_loops_dropped_and_deterministic(spark):
    pairs = [(1, 1), (1, 2), (2, 1)]
    df = _edges(spark, pairs)
    a = {r["node"]: r["rank_micro"]
         for r in pagerank_fixed_iters(df).collect()}
    b = {r["node"]: r["rank_micro"]
         for r in pagerank_fixed_iters(df.repartition(7)).collect()}
    assert a == b == _brute_pr(pairs)


def test_triangle_counts_known_graph(spark):
    """K4 -> every node in C(3,2)=3 triangles; a star hub adds wedges but
    no triangles; each triangle counted exactly once per corner."""
    from pyrope_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    star = [(10, x) for x in (11, 12, 13, 14, 15)]
    edges = spark.createDataFrame(k4 + star, "a long, b long")
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}  # star nodes absent (0 triangles)


def test_triangle_counts_matches_bruteforce(spark):
    """Random-ish deterministic graph: degree-ordered count == brute-force
    closed-wedge enumeration."""
    from itertools import combinations

    from pyrope_spark.operators.graph import triangle_counts

    # deterministic pseudo-random edge set (no RNG): multiplicative hash
    nodes = list(range(20))
    edges = [
        (a, b)
        for a, b in combinations(nodes, 2)
        if (a * 2654435761 + b * 40503) % 7 < 2
    ]
    es = set(edges)
    expect: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if ((a, b) in es) and ((b, c) in es) and ((a, c) in es):
            for n in (a, b, c):
                expect[n] = expect.get(n, 0) + 1
    df = spark.createDataFrame(edges, "a long, b long")
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert out == expect
    assert sum(expect.values()) % 3 == 0 and expect  # sanity: non-trivial


def test_kcore_peel_known_graph(spark):
    """Triangle + pendant chain: the 2-core is exactly the triangle; the
    chain peels away over two rounds; in_core marks convergence."""
    from pyrope_spark.operators.graph import kcore_peel

    # triangle 1-2-3 plus chain 3-4-5 (4 has deg 2 in round 0, dies in
    # round 1 after 5 is peeled)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "a long, b long"
    )
    out = {r["node"]: r for r in kcore_peel(edges, k=2, iters=2).collect()}
    assert set(out) == {1, 2, 3}
    assert all(r["deg"] == 2 and r["in_core"] for r in out.values())
    # one round is NOT enough: 4 still alive (its degree was 2 pre-peel)
    one = {r["node"] for r in kcore_peel(edges, k=2, iters=1).collect()}
    assert 4 in one and 5 not in one


def test_bfs_khop_distances_and_frontier_bound(spark):
    from pyrope_spark.operators.graph import bfs_khop

    # path 1 -> 2 -> 3 -> 4 -> 5, plus shortcut 1 -> 4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["dist"] for r in bfs_khop(edges, seeds, k=3).collect()}
    # shortcut wins over the long path to 4; 5 reached via the shortcut
    assert got == {1: 0, 2: 1, 3: 2, 4: 1, 5: 2}
    # k=1 never reaches beyond the first frontier
    got1 = {r["node"]: r["dist"] for r in bfs_khop(edges, seeds, k=1).collect()}
    assert got1 == {1: 0, 2: 1, 4: 1}


def test_label_prop_two_cliques_converge_to_two_labels(spark):
    from pyrope_spark.operators.graph import label_prop_fixed_iters

    # two triangles bridged by one edge
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(tri1 + tri2 + [(3, 10)], "src long, dst long")
    lab = {r["node"]: r["label"]
           for r in label_prop_fixed_iters(edges, iters=3).collect()}
    # hand-traced sync rounds with the (count desc, label asc) tie-break:
    # triangle {1,2,3} converges to label 1; the bridge drags label 3 into
    # the second triangle, which adopts it as its community label
    assert lab == {1: 1, 2: 1, 3: 1, 10: 3, 11: 3, 12: 3}
    # deterministic: a second run is identical
    lab2 = {r["node"]: r["label"]
            for r in label_prop_fixed_iters(edges, iters=3).collect()}
    assert lab == lab2


def test_star_cc_path_graph_logarithmic(spark):
    """A 200-node path has diameter 199 — min-label CC would need ~199
    rounds; the star method must finish inside max_rounds=15 (O(log n))
    and label every node with the path minimum."""
    from pyrope_spark.operators.graph import connected_components_star

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "src long, dst long"
    )
    comp = {
        r.id: r.component
        for r in connected_components_star(edges, max_rounds=15).collect()
    }
    assert len(comp) == 200
    assert set(comp.values()) == {0}


def test_star_cc_matches_minlabel_on_planted_clusters(spark):
    """Random planted components: star CC == min-label CC exactly."""
    import random

    from pyrope_spark.operators.dedup import connected_components
    from pyrope_spark.operators.graph import connected_components_star

    rng = random.Random(13)
    edges = []
    for c in range(12):  # 12 components over disjoint id ranges
        ids = list(range(c * 50, c * 50 + rng.randint(2, 40)))
        rng.shuffle(ids)
        for a, b in zip(ids, ids[1:]):  # random spanning path
            edges.append((a, b))
        for _ in range(10):  # extra chords
            edges.append((rng.choice(ids), rng.choice(ids)))
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    star = {
        r.id: r.component for r in connected_components_star(df).collect()
    }
    minlabel = {
        r.id: r.component for r in connected_components(df).collect()
    }
    assert star == minlabel


def test_star_cc_two_triangles_and_bridge(spark):
    from pyrope_spark.operators.graph import connected_components_star

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10)],
        "src long, dst long",
    )
    comp = {
        r.id: r.component
        for r in connected_components_star(edges).collect()
    }
    assert comp == {n: 1 for n in [1, 2, 3, 10, 11, 12]}


def test_hub_proximity_closed_form_path(spark):
    from pyrope_spark.operators.graph import hub_proximity

    # directed path 1->2->3->4->5, hub = {1}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    hubs = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r for r in hub_proximity(edges, hubs, k=3).collect()}
    # within 3 hops: nodes 2 (d1), 3 (d2), 4 (d3); 5 is out of range; the
    # hub itself (dist 0) is excluded
    assert set(out) == {2, 3, 4}
    assert out[2]["harmonic_ppm"] == 1_000_000
    assert out[3]["harmonic_ppm"] == 500_000
    assert out[4]["harmonic_ppm"] == 333_333
    assert all(r["n_hubs_within_k"] == 1 for r in out.values())


def test_hub_proximity_multi_hub_sums(spark):
    from pyrope_spark.operators.graph import hub_proximity

    # hubs 1 and 4 both reach node 3: dists 2 and 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 3)], "src long, dst long"
    )
    hubs = spark.createDataFrame([(1,), (4,)], "node long")
    out = {r["node"]: r for r in hub_proximity(edges, hubs, k=3).collect()}
    assert out[3]["n_hubs_within_k"] == 2
    assert out[3]["harmonic_ppm"] == 500_000 + 1_000_000
    # node 2: only hub 1 at dist 1
    assert out[2]["n_hubs_within_k"] == 1


def test_hub_proximity_shortcut_wins(spark):
    from pyrope_spark.operators.graph import hub_proximity

    # two routes from hub 1 to node 4: 1->2->3->4 and direct 1->4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "src long, dst long"
    )
    hubs = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r for r in hub_proximity(edges, hubs, k=3).collect()}
    assert out[4]["harmonic_ppm"] == 1_000_000  # min dist 1, not 3


def test_component_size_bands_closed_form(spark):
    from pyrope_spark.operators.graph import component_size_bands

    # components: two of size 2, one of size 3 (band 2), one of size 8
    # (band 4); member shares 7/15 and 8/15
    rows = (
        [(i, 100) for i in range(2)]
        + [(10 + i, 200) for i in range(2)]
        + [(20 + i, 300) for i in range(3)]
        + [(30 + i, 400) for i in range(8)]
    )
    asg = spark.createDataFrame(rows, "id long, component long")
    out = {r.band: r for r in component_size_bands(asg).collect()}
    assert set(out) == {2, 4}
    assert out[2].n_components == 3 and out[2].n_members == 7
    assert out[4].n_components == 1 and out[4].n_members == 8
    assert out[2].member_share_ppm == 7 * 10**6 // 15
    assert out[4].member_share_ppm == 8 * 10**6 // 15
