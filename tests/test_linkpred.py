"""Closed-form tests for graph link prediction (common-neighbors +
resource-allocation) and degree-assortativity sufficient statistics."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyrope_spark.operators.graph import (
    degree_assortativity_stats,
    link_prediction_ra,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src LONG, dst LONG")


def test_linkpred_closed_form(spark):
    # square with one diagonal: 1-2, 1-3, 2-3, 2-4, 3-4
    # degs: 1:2, 2:3, 3:3, 4:2
    # non-edge (1,4): common neighbors {2,3} -> cn=2,
    #   ra = 1e6//3 + 1e6//3 = 666666
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
    out = link_prediction_ra(e, min_common=1, top_n=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.u, r.w) == (1, 4)
    assert r.common_neighbors == 2
    assert r.ra_ppm == 2 * (1_000_000 // 3)
    assert r.rk == 1


def test_linkpred_excludes_existing_edges_and_min_common(spark):
    # triangle 1-2-3 plus pendant 4-1: (2,3) is an edge -> excluded even
    # though they share neighbor 1; (2,4)/(3,4) share only node 1 -> cn=1,
    # filtered by min_common=2
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (1, 4)])
    out = link_prediction_ra(e, min_common=2, top_n=10).collect()
    assert out == []
    out1 = link_prediction_ra(e, min_common=1, top_n=10).collect()
    got = {(r.u, r.w): (r.common_neighbors, r.ra_ppm) for r in out1}
    # deg(1) = 3; pairs through center 1: (2,3) is an edge (excluded),
    # (2,4) and (3,4) survive with ra = 1e6//3
    assert got == {(2, 4): (1, 333333), (3, 4): (1, 333333)}


def test_linkpred_direction_and_duplicate_invariance(spark):
    e1 = _edges(spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
    e2 = _edges(
        spark,
        [(2, 1), (1, 3), (3, 2), (4, 2), (3, 4), (1, 2), (2, 3)],
    )
    a = sorted(map(tuple, link_prediction_ra(e1, min_common=1).collect()))
    b = sorted(map(tuple, link_prediction_ra(e2, min_common=1).collect()))
    assert a == b


def test_linkpred_hub_cap_drops_hub_centers(spark):
    # star center 9 connects 1..4 (deg 4); 5 connects to 1 and 2
    # (deg(1)=deg(2)=deg(5)=2). With max_hub_degree=3 the star center is
    # dropped as a wedge center: candidates are (1,2) via center 5 and
    # (5,9) via centers 1 and 2.
    e = _edges(spark, [(9, 1), (9, 2), (9, 3), (9, 4), (1, 5), (2, 5)])
    out = link_prediction_ra(e, min_common=1, max_hub_degree=3).collect()
    got = {(r.u, r.w): r.common_neighbors for r in out}
    assert got == {(1, 2): 1, (5, 9): 2}
    full = link_prediction_ra(e, min_common=1).collect()
    # without the cap, star-leaf pairs through center 9 appear too
    assert {(r.u, r.w) for r in full} >= {(1, 3), (1, 4), (2, 3), (3, 4)}


def test_linkpred_top_n_rank_order(spark):
    # two candidate pairs with different RA: center degrees differ
    # pair (1,3) via center 2 (deg 2) -> ra 500000
    # pair (4,6) via centers 5 and 7 (deg 2 each) -> cn 2, ra 1000000
    e = _edges(spark, [(1, 2), (2, 3), (4, 5), (5, 6), (4, 7), (7, 6)])
    out = link_prediction_ra(e, min_common=1, top_n=1).collect()
    assert len(out) == 1 and (out[0].u, out[0].w) == (4, 6)


def test_assortativity_path_graph_is_minus_one(spark):
    # P3: 1-2-3. Newman r = -1 exactly.
    e = _edges(spark, [(1, 2), (2, 3)])
    r = degree_assortativity_stats(e).collect()[0]
    assert (r.m2, r.sum_xy, r.sum_x, r.sum_xx) == (4, 8, 6, 10)
    num = r.m2 * r.sum_xy - r.sum_x * r.sum_x
    den = r.m2 * r.sum_xx - r.sum_x * r.sum_x
    assert num / den == -1.0


def test_assortativity_regular_graph_degenerate(spark):
    # cycle 1-2-3-1: every degree 2 -> zero variance, num == den == 0
    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    r = degree_assortativity_stats(e).collect()[0]
    assert r.m2 == 6
    num = r.m2 * r.sum_xy - r.sum_x * r.sum_x
    den = r.m2 * r.sum_xx - r.sum_x * r.sum_x
    assert num == 0 and den == 0


def test_assortativity_matches_numpy_pearson(spark):
    import numpy as np

    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1), (5, 6), (6, 2)]
    e = _edges(spark, pairs)
    r = degree_assortativity_stats(e).collect()[0]
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in pairs:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    expected = np.corrcoef(xs, ys)[0, 1]
    num = r.m2 * r.sum_xy - r.sum_x * r.sum_x
    den = r.m2 * r.sum_xx - r.sum_x * r.sum_x
    assert abs(num / den - expected) < 1e-12


# --------------------------------------------------------------------------
# community_modularity (round-6 session-5 wave 10)
# --------------------------------------------------------------------------


def _asg(spark, pairs):
    return spark.createDataFrame(pairs, "node LONG, label LONG")


def test_modularity_two_cliques_hand_traced(spark):
    from pyrope_spark.operators.graph import community_modularity

    # two triangles joined by one bridge: m = 7
    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)],
    )
    asg = _asg(spark, [(1, 1), (2, 1), (3, 1), (4, 2), (5, 2), (6, 2)])
    r = community_modularity(e, asg).collect()[0]
    assert r.m_edges == 7 and r.n_communities == 2 and r.intra_edges == 6
    # per community: in=3, tot = 2+2+3 = 7 -> contrib 4*7*3 - 49 = 35 each
    assert r.q_num == 70
    assert r.q_ppm == 70 * 1_000_000 // (4 * 49)   # ~0.357


def test_modularity_single_community_is_zero(spark):
    from pyrope_spark.operators.graph import community_modularity

    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    asg = _asg(spark, [(1, 9), (2, 9), (3, 9)])
    r = community_modularity(e, asg).collect()[0]
    # all edges intra, tot = 2m: Q = m/m - (2m/2m)^2 = 0 exactly
    assert r.q_num == 0 and r.q_ppm == 0


def test_modularity_unassigned_nodes_are_singletons(spark):
    from pyrope_spark.operators.graph import community_modularity

    e = _edges(spark, [(1, 2), (3, 4)])
    asg = _asg(spark, [(1, 1), (2, 1)])  # 3, 4 unassigned
    r = community_modularity(e, asg).collect()[0]
    # communities: {1,2} (in=1, tot=2), {3} and {4} singleton halves of
    # one inter edge (in=0, tot=1 each). m=2.
    assert r.n_communities == 3
    assert r.intra_edges == 1
    # q_num = (4*2*1 - 4) + (0 - 1) + (0 - 1) = 2
    assert r.q_num == 2


def test_recency_weighted_popularity_halving(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    from pyrope_spark.operators.analytics import recency_weighted_popularity

    rows = [
        # item 1: 8.0 today, 8.0 seven days ago (one half-life), 8.0
        # 21 days ago (3 half-lives)
        (1, '{"k": 1}', datetime(2024, 1, 22), 8.0),
        (2, '{"k": 1}', datetime(2024, 1, 15), 8.0),
        (3, '{"k": 1}', datetime(2024, 1, 1), 8.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, props STRING, ts TIMESTAMP, value DOUBLE"
    )
    out = recency_weighted_popularity(
        df,
        item_expr=F.get_json_object("props", "$.k").cast("long"),
        half_life_days=7,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_events == 3
    assert r.decayed_value_micro == 8_000_000 + 4_000_000 + 1_000_000


def test_weighted_pagerank_weights_direct_flow(spark):
    from pyrope_spark.operators.graph import (
        pagerank_fixed_iters,
        weighted_pagerank_fixed_iters,
    )

    # a sends 3 parallel edges to b, 1 to c: weighted PR gives b 3/4 of
    # a's damped mass; the unweighted distinct-edge PR splits evenly
    e = _edges(spark, [(1, 2), (1, 2), (1, 2), (1, 3)])
    w = {r.node: r.rank_micro
         for r in weighted_pagerank_fixed_iters(e, iters=1, scale=1_000_000).collect()}
    # per-node init 333333; a's flow: to b 85*333333*3//(100*4) = 249999
    assert w[2] == 150_000 // 3 + (85 * 333_333 * 3) // 400
    assert w[3] == 150_000 // 3 + (85 * 333_333 * 1) // 400
    u = {r.node: r.rank_micro
         for r in pagerank_fixed_iters(e, iters=1, scale=1_000_000).collect()}
    assert u[2] == u[3]          # distinct edges: even split
    assert w[2] > w[3]           # weights break the tie
