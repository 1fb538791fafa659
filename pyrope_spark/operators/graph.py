"""Graph analytics over edge tables: fixed-iteration PageRank.

An iterative algorithm on Spark is a LOOP OF JOINS — each iteration is
one shuffle (contributions grouped by destination) against a static edge
table.  The 100 TB shape: edges are hash-partitioned by ``src`` once and
reused every iteration (no re-shuffle of the edge side; only the small
rank table moves), dangling mass is ignored (the standard simplified
variant), and the iteration count is FIXED so the plan is a finite DAG —
convergence-driven loops belong in a driver while-loop with
checkpointing every ~5 iterations to cut lineage.

Determinism: ranks live in INTEGER MICRO-UNITS (scale 1e12) with floor
division — ``pr' = floor(15*SCALE/(100*N)) + Σ floor(85*pr_u /
(100*outdeg_u))`` — so every engine computes bit-identical ranks at
every iteration; a float PageRank differs in ulps by reduce order and
could flip ranking ties.  The DuckDB oracle unrolls the same recurrence
as chained CTEs.

No reference analog (the reference has no graph operators); this is
beyond-reference surface for link-structure signals over training
corpora (domain authority, co-purchase centrality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PR_SCALE = 10**12


def pagerank_fixed_iters(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Fixed-``iters`` PageRank over a distinct directed edge set.

    Nodes = src ∪ dst.  Initial rank = floor(scale / N).  Per iteration
    every node gets ``floor((100-d)*scale / (100*N))`` base mass plus the
    damped floor-divided contribution of each in-neighbor.  Dangling
    nodes contribute nothing (their mass evaporates — documented
    simplified variant; total mass is therefore not conserved, rankings
    are).  Returns (node, rank_micro) with rank_micro the exact integer.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = e.join(outdeg, "src")  # static, reused each iteration
    n_nodes = nodes.count()  # scalar; node set is the small side by design
    base = ((100 - damping_pct) * scale) // (100 * n_nodes)
    ranks = nodes.withColumn("rank_micro", F.lit(scale // n_nodes).cast("long"))
    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"CAST({damping_pct} * rank_micro AS BIGINT) "
                    f"DIV (100 * outdeg)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("in_mass"), F.lit(0)))
                .cast("long")
                .alias("rank_micro"),
            )
        )
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    *,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> str:
    """DuckDB twin: the same integer recurrence unrolled as chained CTEs
    (``edges_sql`` must yield columns src, dst)."""
    d = damping_pct
    parts = [
        f"""
WITH raw_edges AS ({edges_sql}),
e AS (
  SELECT DISTINCT src, dst FROM raw_edges WHERE src <> dst
),
nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
),
deg AS (
  SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src
),
ew AS (
  SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src)
),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (
  SELECT node, CAST({scale} // n AS BIGINT) AS rank_micro FROM nodes, nn
)"""
    ]
    for i in range(iters):
        parts.append(
            f""",
c{i} AS (
  SELECT ew.dst AS node,
         SUM(({d} * r{i}.rank_micro) // (100 * ew.outdeg)) AS in_mass
  FROM ew JOIN r{i} ON ew.src = r{i}.node
  GROUP BY ew.dst
),
r{i + 1} AS (
  SELECT nodes.node,
         CAST((({100 - d} * {scale}) // (100 * nn.n))
              + COALESCE(c{i}.in_mass, 0) AS BIGINT) AS rank_micro
  FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON nodes.node = c{i}.node
)"""
        )
    parts.append(f"\nSELECT node, rank_micro FROM r{iters}")
    return "".join(parts)


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation.

    Input: one row per UNDIRECTED edge as ``(a, b)`` with ``a < b`` (the
    caller dedups).  Every edge is re-oriented from its lower-ranked to
    its higher-ranked endpoint under the total order ``(degree, node)`` —
    the classic orientation that bounds every out-neighborhood by
    O(sqrt(E)), so the wedge self-join costs Sum(outdeg^2) <= E^1.5
    instead of Sum(deg^2), which a power-law hub would otherwise blow up
    quadratically.  Triangles close with a second join against the
    oriented edge set; each triangle is found EXACTLY once (its nodes'
    ranks form a unique chain u->v->w), then credited to all three
    corners with an explode + re-aggregate.

    Scale shape (100 TB): degrees are one aggregate over edges; the
    orientation join broadcasts the degree table when small (else hash
    join on node); wedge + closure are two hash joins whose volume the
    orientation provably caps.  No iteration, no driver state.
    """
    # r10 opt (guide §1.2 / §5, the connected_components_star discipline):
    # without materialization the edges subtree is inlined into the plan
    # ~6x (degree union twice, orientation join, and transitively the
    # three oriented consumers) — the probe measured an 842-node physical
    # plan for the registered triangle query.  Checkpoint the two reused
    # edge-sized tables once each; values are unchanged.
    edges = edges.localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    da = deg.select(F.col("node").alias("_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("_b"), F.col("deg").alias("deg_b"))
    oriented = (
        edges.join(da, F.col("a") == F.col("_a"))
        .join(db, F.col("b") == F.col("_b"))
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(
                F.struct(F.col("b").alias("u"), F.col("a").alias("v"))
            )
            .alias("e")
        )
        .select("e.u", "e.v")
        .localCheckpoint(eager=True)  # consumed by wedge, closure, and e3
    )
    e2 = oriented.select(F.col("u").alias("v2"), F.col("v").alias("w"))
    wedges = oriented.join(e2, F.col("v") == F.col("v2")).select("u", "v", "w")
    e3 = oriented.select(F.col("u").alias("u3"), F.col("v").alias("w3"))
    tri = wedges.join(
        e3, (F.col("u") == F.col("u3")) & (F.col("w") == F.col("w3"))
    ).select("u", "v", "w")
    corners = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count("*").cast("long").alias("n_triangles")
    )


def triangle_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin of ``triangle_counts`` over an edge-list subquery
    producing columns (a, b) with a < b, one row per undirected edge."""
    return f"""
WITH edges AS ({edges_sql}),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM edges UNION ALL SELECT b FROM edges
  ) GROUP BY 1
), oriented AS (
  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
              THEN e.a ELSE e.b END AS u,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
              THEN e.b ELSE e.a END AS v
  FROM edges e
  JOIN deg da ON e.a = da.node
  JOIN deg db ON e.b = db.node
), tri AS (
  SELECT e1.u, e1.v, e2.v AS w
  FROM oriented e1
  JOIN oriented e2 ON e1.v = e2.u
  JOIN oriented e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
  SELECT u AS node FROM tri
  UNION ALL SELECT v FROM tri
  UNION ALL SELECT w FROM tri
) GROUP BY 1
"""


def kcore_peel(edges: DataFrame, k: int = 2, iters: int = 2) -> DataFrame:
    """Fixed-iteration k-core peeling: who survives ``iters`` rounds of
    "drop every node with degree < k".

    Each round recomputes degrees over the SURVIVING edge set and
    semi-joins both endpoints against the keep-set — the classic peel,
    deterministic because the round count is FIXED (the data-dependent
    run-to-convergence variant can't be hash-compared across engines; the
    caller picks ``iters`` and reads ``in_core`` to see whether the fix
    point was reached, exactly the fixed-iteration contract PageRank uses
    here).  Output: every node alive after the last peel with its final
    degree and ``in_core`` (degree >= k — all true iff converged).

    Scale shape (100 TB): per round, one degree aggregate + two hash
    semi-joins on node — 3 shuffles/round, edge set shrinking
    monotonically; the keep-set is usually broadcastable after round 1.
    Community detection's cheap cousin: the k-core is where the dense
    subgraphs (spam rings, bot clusters, bulk-duplicate part bundles)
    live, and the peel is the 100 TB-safe way to find it without
    iteration-to-convergence.
    """
    # r10 opt: each round reads its surviving edge set FOUR times (degree
    # union twice + both semi-joins), so an un-materialized loop inlines
    # the edge lineage ~4^iters times into the final plan (probe: 298
    # Exchange nodes for the registered 2-iter query).  Checkpoint per
    # round — the connected_components_star discipline; values unchanged.
    alive = edges.localCheckpoint(eager=True)
    for _ in range(iters):
        deg = (
            alive.select(F.col("a").alias("node"))
            .unionAll(alive.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        alive = (
            alive.join(
                keep.select(F.col("node").alias("_ka")),
                F.col("a") == F.col("_ka"),
                "left_semi",
            )
            .join(
                keep.select(F.col("node").alias("_kb")),
                F.col("b") == F.col("_kb"),
                "left_semi",
            )
            .localCheckpoint(eager=True)
        )
    final_deg = (
        alive.select(F.col("a").alias("node"))
        .unionAll(alive.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    return final_deg.select(
        "node", "deg", (F.col("deg") >= k).alias("in_core")
    )


def kcore_oracle_sql(edges_sql: str, k: int = 2, iters: int = 2) -> str:
    """DuckDB twin: the same peel unrolled as chained CTEs."""
    parts = [f"e0 AS ({edges_sql})"]
    for i in range(iters):
        parts.append(
            f"""d{i} AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM e{i} UNION ALL SELECT b FROM e{i}
  ) GROUP BY 1
), k{i} AS (SELECT node FROM d{i} WHERE deg >= {k}),
e{i + 1} AS (
  SELECT a, b FROM e{i}
  WHERE a IN (SELECT node FROM k{i}) AND b IN (SELECT node FROM k{i})
)"""
        )
    return f"""
WITH {', '.join(parts)}
SELECT node, CAST(count(*) AS BIGINT) AS deg,
       count(*) >= {k} AS in_core
FROM (SELECT a AS node FROM e{iters} UNION ALL SELECT b FROM e{iters})
GROUP BY 1
"""


def bfs_khop(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    k: int = 3,
) -> DataFrame:
    """Hop distance from a seed set within ``k`` hops (directed) — the
    reachability/influence primitive (blast radius of a contaminated
    source, items within k referral hops). Iteration i relaxes
    ``dist(v) = min(dist(v), min_{u->v} dist(u) + 1)`` — a loop of joins
    against the static distinct edge table, one shuffle per hop, the
    PageRank discipline; k is FIXED so the plan is a finite DAG. Unreached
    nodes are absent (no infinity sentinel to disagree on). All-integer.

    Output: (node, dist BIGINT in [0, k])."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    dist = seeds.select(
        F.col(node_col).alias("node"), F.lit(0).cast("long").alias("dist")
    ).distinct()
    for _ in range(k):
        nxt = e.join(dist, e["src"] == dist["node"]).select(
            F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
        )
    return dist


def bfs_khop_oracle_sql(edges_sql: str, seeds_sql: str, *, k: int = 3) -> str:
    """DuckDB twin of [[bfs_khop]]: the min-plus relaxation unrolled as
    chained CTEs. ``edges_sql`` yields (src, dst); ``seeds_sql`` yields
    (node)."""
    parts = [
        f"""
WITH raw_edges AS ({edges_sql}),
e AS (SELECT DISTINCT src, dst FROM raw_edges WHERE src <> dst),
d0 AS (SELECT DISTINCT node, CAST(0 AS BIGINT) AS dist FROM ({seeds_sql}))"""
    ]
    for i in range(k):
        parts.append(
            f""",
d{i + 1} AS (
  SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
    SELECT node, dist FROM d{i}
    UNION ALL
    SELECT e.dst AS node, d{i}.dist + 1 AS dist
    FROM e JOIN d{i} ON e.src = d{i}.node
  ) GROUP BY node
)"""
        )
    parts.append(f"\nSELECT node, dist FROM d{k}")
    return "".join(parts)


def label_prop_fixed_iters(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
) -> DataFrame:
    """Fixed-iteration SYNCHRONOUS label propagation communities over the
    symmetrized edge set: every node starts as its own label; each
    iteration every node adopts the MODE of its neighbors' labels with the
    deterministic (count desc, label asc) tie-break — async/random-order
    LPA (the usual formulation) is irreproducible across partitionings,
    so this engine pins the synchronous variant, trading the known
    oscillation risk for bit-stable output (iters is small and fixed; the
    oracle unrolls the same rounds). Complements [[dedup_groups_cc]]
    (connected components = structure) with density-based communities.

    Output: (node, label BIGINT) — label is some member node id."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # r10 opt: und joins every round and lab chains round-over-round —
    # un-materialized, the edge lineage inlined once per round and the
    # label lineage recursively (probe: 298 Exchange nodes for the
    # registered 3-iter query).  Checkpoint the symmetrized edge set once
    # and each round's labels (connected_components_star discipline);
    # values unchanged.
    und = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = und.select(F.col("src").alias("node")).distinct()
    lab = nodes.select("node", F.col("node").cast("long").alias("label"))
    for _ in range(iters):
        nb = und.join(lab, und["dst"] == lab["node"]).select(
            F.col("src").alias("node"), "label"
        )
        cnt = nb.groupBy("node", "label").agg(F.count(F.lit(1)).alias("_c"))
        w = Window.partitionBy("node").orderBy(
            F.col("_c").desc(), F.col("label").asc()
        )
        lab = (
            cnt.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("node", F.col("label").cast("long").alias("label"))
            .localCheckpoint(eager=True)
        )
    return lab


def label_prop_oracle_sql(edges_sql: str, *, iters: int = 3) -> str:
    """DuckDB twin of [[label_prop_fixed_iters]], rounds unrolled."""
    parts = [
        f"""
WITH raw_edges AS ({edges_sql}),
e0 AS (SELECT src, dst FROM raw_edges
       UNION ALL SELECT dst, src FROM raw_edges),
und AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
l0 AS (SELECT DISTINCT src AS node, CAST(src AS BIGINT) AS label FROM und)"""
    ]
    for i in range(iters):
        parts.append(
            f""",
cnt{i} AS (
  SELECT und.src AS node, l{i}.label, COUNT(*) AS c
  FROM und JOIN l{i} ON und.dst = l{i}.node
  GROUP BY und.src, l{i}.label
),
l{i + 1} AS (
  SELECT node, CAST(label AS BIGINT) AS label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, label ASC) AS rk
    FROM cnt{i}
  ) WHERE rk = 1
)"""
        )
    parts.append(f"\nSELECT node, label FROM l{iters}")
    return "".join(parts)


# --------------------------------------- connected components (star method)

def connected_components_star(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) -> (id, component), component = min node id, one row per
    node appearing in any edge — the same contract as
    ``dedup.connected_components``.

    Why a second CC: min-label propagation needs DIAMETER rounds (a
    200-node path takes 200 shuffles), which is fine for the near-clique
    graphs blocked dedup emits but wrong for arbitrary graphs (reply
    chains, citation paths, long crawl redirects). The star method
    converges in O(log d) rounds on ANY graph by rewiring the edge set
    itself toward stars:

    - large-star: every node's LARGER neighbors re-point to the minimum
      of its neighborhood (including itself) — emits (v, m(u)) for
      v in N(u), v > u, where m(u) = min(N(u) + {u}).
    - small-star: edges oriented big->small; each node and its smaller
      neighbors re-point to the smallest — emits (u, m(u)) and
      (v, m(u)) for the non-minimal smaller neighbors v.

    Both emit strictly (larger, smaller) pairs, so the edge set stays
    canonically oriented and monotonically contracts toward the star
    fixpoint {(x, min_C) : x in C}. Convergence = the round's output IS
    the previous edge set (exact set check: equal counts + empty
    ``exceptAll`` — a hash/count shortcut could false-converge).

    Each round ``localCheckpoint(eager=True)``s its edge set: unlike the
    near-clique dedup graphs min-label CC serves (few rounds, cache+count
    suffices), this operator exists FOR long-diameter graphs, i.e. for
    round counts where cache+count's one-plan-layer-per-round growth
    nests AQE subtrees until the driver heap dies in plan bookkeeping
    (measured: a 200-node path OOMed an 8g driver inside 10 rounds; the
    same lesson as operators/bpe.py's merge loop). Within-round AQE is
    unaffected — each round plans from checkpointed leaves. Raises after
    ``max_rounds`` (2 log2(n) rounds suffice per the paper; 50 covers any
    conceivable corpus) rather than silently returning a partial
    contraction.
    """
    cur = (
        edges.select(
            F.greatest(F.col(src_col), F.col(dst_col)).alias("u"),
            F.least(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        # large-star over the symmetric neighborhood
        sym = cur.select("u", "v").union(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star on the (already big->small) large-star output
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        nxt = (
            large.join(smins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        unchanged = nxt.count() == cur.count() and nxt.exceptAll(cur).isEmpty()
        cur = nxt
        if unchanged:
            return (
                cur.select(F.col("u").alias("id"), F.col("v").alias("component"))
                .union(cur.select("v", "v").distinct())
                .distinct()
            )
    raise RuntimeError(
        f"connected_components_star did not converge in {max_rounds} rounds"
    )


def hub_proximity(
    edges: DataFrame,
    hubs: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    k: int = 3,
) -> DataFrame:
    """Bounded harmonic centrality toward a hub set: for every node, the
    sum of 1/dist over hubs within ``k`` hops (directed, toward-node
    distances) — "how close is this item to the catalog's anchor items",
    the closeness signal a full all-pairs harmonic centrality can't
    afford at corpus scale. Distances come from a multi-SOURCE labeled
    min-plus relaxation: state is (hub, node, dist), one shuffle per hop
    against the static distinct edge table ([[bfs_khop]] lifted to
    per-hub labels). State is |hubs| x reached nodes — the hub set
    bounds it a priori (pick top-degree anchors or a sampled set; at
    1000 hubs x 10M reachable nodes the state is a join-sized table,
    never |V|^2).

    Scores are integer: ``harmonic_ppm = Σ 1_000_000 div dist`` over
    hubs at dist >= 1 (a hub's own row, dist 0, is excluded — standard
    harmonic convention). Output: (node, n_hubs_within_k, harmonic_ppm),
    nodes with no hub in range absent.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    dist = hubs.select(
        F.col(node_col).alias("hub"),
        F.col(node_col).alias("node"),
        F.lit(0).cast("long").alias("dist"),
    ).distinct()
    for _ in range(k):
        nxt = e.join(dist, e["src"] == dist["node"]).select(
            "hub", F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("hub", "node")
            .agg(F.min("dist").cast("long").alias("dist"))
        )
    return (
        dist.filter(F.col("dist") >= 1)
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hubs_within_k"),
            F.sum(F.expr("1000000 div dist")).cast("long").alias("harmonic_ppm"),
        )
    )


def hub_proximity_oracle_sql(
    edges_sql: str, hubs_sql: str, *, k: int = 3
) -> str:
    """DuckDB twin of [[hub_proximity]]: the labeled min-plus relaxation
    unrolled as chained CTEs."""
    parts = [
        f"""
WITH raw_edges AS ({edges_sql}),
e AS (SELECT DISTINCT src, dst FROM raw_edges WHERE src <> dst),
d0 AS (SELECT DISTINCT node AS hub, node, CAST(0 AS BIGINT) AS dist
       FROM ({hubs_sql}))"""
    ]
    for i in range(k):
        parts.append(
            f""",
d{i + 1} AS (
  SELECT hub, node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
    SELECT hub, node, dist FROM d{i}
    UNION ALL
    SELECT d{i}.hub, e.dst AS node, d{i}.dist + 1 AS dist
    FROM e JOIN d{i} ON e.src = d{i}.node
  ) GROUP BY hub, node
)"""
        )
    parts.append(
        f"""
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_hubs_within_k,
       CAST(SUM(1000000 // dist) AS BIGINT) AS harmonic_ppm
FROM d{k} WHERE dist >= 1 GROUP BY node"""
    )
    return "".join(parts)


def link_prediction_ra(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    min_common: int = 2,
    top_n: int = 1000,
    max_hub_degree: int | None = None,
) -> DataFrame:
    """Missing-link candidates ranked by resource allocation (Zhou et al.
    2009): for each non-adjacent pair (u, w), ``ra_ppm = Σ_z 1e6 // deg(z)``
    over their common neighbors z, plus the plain common-neighbor count.

    Reference intent: the "users who bought X also bought Y" candidate
    generator over the co-purchase graph (the graph-side sibling of
    item_item_cosine_topk — structural instead of vector similarity).

    All-integer: RA contributions are truncating ``1e6 // deg`` per common
    neighbor (deg >= 1 always — z has at least the two wedge edges), so
    the ranking replicates bit-for-bit in the DuckDB twin.

    Scale shape (100 TB): wedges are one self-join of the adjacency list
    keyed by the CENTER node z, so the join volume is Σ deg(z)² — the
    quantity ``max_hub_degree`` bounds a priori by dropping centers above
    the cap (standard at scale, and principled here: a hub's per-pair RA
    contribution is <= 1e6/cap, i.e. the dropped mass is the smallest
    signal). Candidate pairs then take ONE keyed aggregate, one anti-join
    against the edge set (predict NEW links only), and a two-phase global
    top-n cut (the final single-partition sort sees <= top_n * partitions
    rows, never the candidate set).
    """
    from pyspark.sql.window import Window

    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    adj = und.select(F.col("a").alias("z"), F.col("b").alias("nbr")).unionAll(
        und.select(F.col("b").alias("z"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("z").agg(F.count("*").cast("long").alias("deg"))
    centers = adj.join(deg, "z")
    if max_hub_degree is not None:
        centers = centers.filter(F.col("deg") <= max_hub_degree)
    left = centers.select("z", F.col("nbr").alias("u"), "deg")
    right = centers.select(F.col("z").alias("z2"), F.col("nbr").alias("w"))
    wedges = left.join(
        right, (F.col("z") == F.col("z2")) & (F.col("u") < F.col("w"))
    ).select("u", "w", "deg")
    cand = wedges.groupBy("u", "w").agg(
        F.count("*").cast("long").alias("common_neighbors"),
        F.sum(F.expr("1000000 div deg")).cast("long").alias("ra_ppm"),
    )
    new_links = cand.join(
        und,
        (F.col("u") == F.col("a")) & (F.col("w") == F.col("b")),
        "left_anti",
    ).filter(F.col("common_neighbors") >= min_common)
    order = [
        F.desc("ra_ppm"),
        F.desc("common_neighbors"),
        F.asc("u"),
        F.asc("w"),
    ]
    local_w = Window.partitionBy(F.spark_partition_id()).orderBy(*order)
    pruned = (
        new_links.withColumn("_lr", F.row_number().over(local_w))
        .filter(F.col("_lr") <= top_n)
        .drop("_lr")
    )
    w = Window.orderBy(*order)
    return (
        pruned.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= top_n)
    )


def link_prediction_oracle_sql(
    edges_sql: str,
    *,
    min_common: int = 2,
    top_n: int = 1000,
    max_hub_degree: int | None = None,
) -> str:
    """DuckDB twin of [[link_prediction_ra]] (``edges_sql`` yields src, dst)."""
    hub_filter = (
        f"WHERE deg <= {max_hub_degree}" if max_hub_degree is not None else ""
    )
    return f"""
WITH raw_edges AS ({edges_sql}),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM raw_edges
  WHERE src <> dst AND src IS NOT NULL AND dst IS NOT NULL
),
adj AS (
  SELECT a AS z, b AS nbr FROM und UNION ALL SELECT b AS z, a AS nbr FROM und
),
deg AS (SELECT z, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
centers AS (SELECT adj.z, adj.nbr, deg.deg FROM adj JOIN deg USING (z) {hub_filter}),
wedges AS (
  SELECT l.nbr AS u, r.nbr AS w, l.deg
  FROM centers l JOIN centers r ON l.z = r.z AND l.nbr < r.nbr
),
cand AS (
  SELECT u, w, CAST(count(*) AS BIGINT) AS common_neighbors,
         CAST(SUM(1000000 // deg) AS BIGINT) AS ra_ppm
  FROM wedges GROUP BY 1, 2
),
new_links AS (
  SELECT c.* FROM cand c
  ANTI JOIN und ON c.u = und.a AND c.w = und.b
  WHERE c.common_neighbors >= {min_common}
)
SELECT u, w, common_neighbors, ra_ppm, CAST(rk AS BIGINT) AS rk FROM (
  SELECT *, row_number() OVER (
    ORDER BY ra_ppm DESC, common_neighbors DESC, u ASC, w ASC) AS rk
  FROM new_links
) WHERE rk <= {top_n}
"""


def degree_assortativity_stats(
    edges: DataFrame, *, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Exact BIGINT sufficient statistics for Newman's degree-assortativity
    coefficient over the undirected simple graph: one row of
    ``(m2, sum_xy, sum_x, sum_xx)`` where each undirected edge contributes
    BOTH orientations (the standard symmetrization), x/y are endpoint
    degrees.  The float coefficient
    ``r = (m2*sum_xy - sum_x^2) / (m2*sum_xx - sum_x^2)`` is one driver- or
    test-side division away — kept OUT of the hashed output so the query
    stays integer-exact cross-engine (the emit-sufficient-statistics
    discipline of [[embedding_gram_micro]]).

    Scale shape: one degree aggregate + one broadcast-or-hash join back to
    edges + one global sum — two shuffles, no iteration.
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    da = deg.select(F.col("node").alias("_a"), F.col("deg").alias("dx"))
    db = deg.select(F.col("node").alias("_b"), F.col("deg").alias("dy"))
    per_edge = (
        und.join(da, F.col("a") == F.col("_a"))
        .join(db, F.col("b") == F.col("_b"))
        .select("dx", "dy")
    )
    return per_edge.agg(
        (F.count("*") * 2).cast("long").alias("m2"),
        (F.sum(F.col("dx") * F.col("dy")) * 2).cast("long").alias("sum_xy"),
        F.sum(F.col("dx") + F.col("dy")).cast("long").alias("sum_x"),
        F.sum(F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy"))
        .cast("long")
        .alias("sum_xx"),
    )


def degree_assortativity_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin of [[degree_assortativity_stats]]."""
    return f"""
WITH raw_edges AS ({edges_sql}),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM raw_edges
  WHERE src <> dst AND src IS NOT NULL AND dst IS NOT NULL
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY 1
),
per_edge AS (
  SELECT da.deg AS dx, db.deg AS dy
  FROM und JOIN deg da ON und.a = da.node JOIN deg db ON und.b = db.node
)
SELECT CAST(count(*) * 2 AS BIGINT) AS m2,
       CAST(SUM(dx * dy) * 2 AS BIGINT) AS sum_xy,
       CAST(SUM(dx + dy) AS BIGINT) AS sum_x,
       CAST(SUM(dx * dx + dy * dy) AS BIGINT) AS sum_xx
FROM per_edge
"""


def personalized_pagerank_fixed_iters(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Fixed-``iters`` personalized PageRank: the restart mass returns to
    the SEED set instead of spreading uniformly — "importance from the
    point of view of these nodes", the classic recommendation /
    related-items ranker (seeds = a user's purchased items).

    Same all-integer recurrence as [[pagerank_fixed_iters]] (floor-divided
    damped contributions, dangling mass evaporates), except the base term
    ``floor((100-d)·scale / (100·|S|))`` lands ONLY on seed nodes and the
    initial mass is ``scale // |S|`` on seeds, 0 elsewhere — so rank
    concentrates in the seeds' neighborhoods instead of washing out to
    the global stationary vector.

    Scale shape: identical to pagerank — one keyed join + aggregate per
    iteration against the static out-degree-weighted edge table; the seed
    table broadcasts.  Output: (node, rank_micro), nodes with rank 0
    dropped (at 100 TB the touched set, not |V|, is the output).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    s = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = e.join(outdeg, "src")
    n_seeds = s.count()
    if n_seeds == 0:
        raise ValueError("personalized pagerank needs a non-empty seed set")
    base = ((100 - damping_pct) * scale) // (100 * n_seeds)
    seed_base = s.withColumn("base", F.lit(base).cast("long"))
    ranks = s.withColumn(
        "rank_micro", F.lit(scale // n_seeds).cast("long")
    ).select("node", "rank_micro")
    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"CAST({damping_pct} * rank_micro AS BIGINT) "
                    f"DIV (100 * outdeg)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            contrib.join(F.broadcast(seed_base), "node", "full")
            .select(
                "node",
                (
                    F.coalesce(F.col("base"), F.lit(0))
                    + F.coalesce(F.col("in_mass"), F.lit(0))
                )
                .cast("long")
                .alias("rank_micro"),
            )
            .filter(F.col("rank_micro") > 0)
        )
    return ranks


def personalized_pagerank_oracle_sql(
    edges_sql: str,
    seeds_sql: str,
    *,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> str:
    """DuckDB twin of [[personalized_pagerank_fixed_iters]] —
    ``seeds_sql`` yields one column ``node``."""
    d = damping_pct
    parts = [
        f"""
WITH raw_edges AS ({edges_sql}),
e AS (
  SELECT DISTINCT src, dst FROM raw_edges WHERE src <> dst
),
s AS (SELECT DISTINCT node FROM ({seeds_sql})),
deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
ew AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src)),
ns AS (SELECT COUNT(*) AS n FROM s),
sb AS (SELECT node, CAST(({100 - d} * {scale}) // (100 * n) AS BIGINT) AS base
       FROM s, ns),
r0 AS (
  SELECT node, CAST({scale} // n AS BIGINT) AS rank_micro FROM s, ns
)"""
    ]
    for i in range(iters):
        parts.append(
            f""",
c{i} AS (
  SELECT ew.dst AS node,
         SUM(({d} * r{i}.rank_micro) // (100 * ew.outdeg)) AS in_mass
  FROM ew JOIN r{i} ON ew.src = r{i}.node
  GROUP BY ew.dst
),
r{i + 1} AS (
  SELECT COALESCE(c{i}.node, sb.node) AS node,
         CAST(COALESCE(sb.base, 0) + COALESCE(c{i}.in_mass, 0) AS BIGINT)
           AS rank_micro
  FROM c{i} FULL JOIN sb ON c{i}.node = sb.node
  WHERE COALESCE(sb.base, 0) + COALESCE(c{i}.in_mass, 0) > 0
)"""
        )
    parts.append(f"\nSELECT node, rank_micro FROM r{iters}")
    return "".join(parts)


def community_modularity(
    edges: DataFrame,
    assignments: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
    scale: int = 1_000_000,
) -> DataFrame:
    """Newman modularity of a community assignment over the undirected
    simple graph — the quality score for [[label_prop_communities]] /
    [[cc_star_components]] output (Q near 0: the partition is no better
    than random; Q > ~0.3: real community structure).

    ``Q = Σ_c (in_c / m  −  (tot_c / 2m)²)`` where ``in_c`` counts
    intra-community edges and ``tot_c`` sums member degrees.  Emitted as
    the EXACT integer ``q_ppm = Σ_c (4·m·in_c − tot_c²) · 1e6 div 4m²``
    (everything cross-multiplied to the common 4m² denominator before
    the single division), plus per-community rows with the same exact
    numerators — so the hashable output never touches a float.

    Scale shape: one degree aggregate, two label joins onto edges
    (hash on node — the natural keys), one (label) aggregate, one 1-row
    total.  Unassigned nodes form singleton communities implicitly
    (coalesce to the node id).
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    asg = assignments.select(
        F.col(node_col).alias("n"), F.col(label_col).alias("lbl")
    )
    la = asg.select(F.col("n").alias("_a"), F.col("lbl").alias("lbl_a"))
    lb = asg.select(F.col("n").alias("_b"), F.col("lbl").alias("lbl_b"))
    lab = (
        und.join(la, F.col("a") == F.col("_a"), "left")
        .join(lb, F.col("b") == F.col("_b"), "left")
        .select(
            F.coalesce(F.col("lbl_a"), F.col("a")).alias("ca"),
            F.coalesce(F.col("lbl_b"), F.col("b")).alias("cb"),
        )
    )
    m_row = und.agg(F.count("*").cast("long").alias("m"))
    in_c = (
        lab.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count("*").cast("long").alias("in_edges"))
    )
    tot_c = (
        lab.select(F.col("ca").alias("community"))
        .unionAll(lab.select(F.col("cb").alias("community")))
        .groupBy("community")
        .agg(F.count("*").cast("long").alias("tot_degree"))
    )
    per = (
        tot_c.join(in_c, "community", "left")
        .select(
            "community",
            F.coalesce(F.col("in_edges"), F.lit(0)).cast("long").alias("in_edges"),
            "tot_degree",
        )
        .crossJoin(F.broadcast(m_row))
        .select(
            "community",
            "in_edges",
            "tot_degree",
            (
                4 * F.col("m") * F.col("in_edges")
                - F.col("tot_degree") * F.col("tot_degree")
            )
            .cast("long")
            .alias("q_contrib_num"),
        )
    )
    return per.crossJoin(F.broadcast(m_row)).groupBy("m").agg(
        F.count("*").cast("long").alias("n_communities"),
        F.sum("in_edges").cast("long").alias("intra_edges"),
        F.sum("q_contrib_num").cast("long").alias("q_num"),
    ).select(
        F.col("m").cast("long").alias("m_edges"),
        "n_communities",
        "intra_edges",
        "q_num",
        F.expr(f"q_num * {scale} div (4 * m * m)").cast("long").alias("q_ppm"),
    )


def community_modularity_oracle_sql(
    edges_sql: str,
    assignments_sql: str,
    *,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of [[community_modularity]] — ``assignments_sql``
    yields (node, label)."""
    return f"""
WITH raw_edges AS ({edges_sql}),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM raw_edges
  WHERE src <> dst AND src IS NOT NULL AND dst IS NOT NULL
),
asg AS (SELECT node AS n, label AS lbl FROM ({assignments_sql})),
lab AS (
  SELECT COALESCE(la.lbl, und.a) AS ca, COALESCE(lb.lbl, und.b) AS cb
  FROM und
  LEFT JOIN asg la ON und.a = la.n
  LEFT JOIN asg lb ON und.b = lb.n
),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
in_c AS (
  SELECT ca AS community, CAST(count(*) AS BIGINT) AS in_edges
  FROM lab WHERE ca = cb GROUP BY 1
),
tot_c AS (
  SELECT community, CAST(count(*) AS BIGINT) AS tot_degree FROM (
    SELECT ca AS community FROM lab UNION ALL SELECT cb FROM lab
  ) GROUP BY 1
),
per AS (
  SELECT t.community, COALESCE(i.in_edges, 0) AS in_edges, t.tot_degree,
         CAST(4 * m.m * COALESCE(i.in_edges, 0)
              - t.tot_degree * t.tot_degree AS BIGINT) AS q_contrib_num
  FROM tot_c t LEFT JOIN in_c i ON t.community = i.community CROSS JOIN m
)
SELECT CAST(m.m AS BIGINT) AS m_edges,
       CAST(COUNT(*) AS BIGINT) AS n_communities,
       CAST(SUM(per.in_edges) AS BIGINT) AS intra_edges,
       CAST(SUM(per.q_contrib_num) AS BIGINT) AS q_num,
       CAST(SUM(per.q_contrib_num) * {scale} // (4 * m.m * m.m) AS BIGINT)
         AS q_ppm
FROM per CROSS JOIN m GROUP BY m.m
"""


def weighted_pagerank_fixed_iters(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Weighted PageRank: each out-edge carries mass proportional to its
    integer weight over the node's total out-weight — on a co-purchase
    graph where (a,b) occurred 40 times and (a,c) once, b deserves 40×
    the rank flow, which the unweighted [[pagerank_fixed_iters]]
    (distinct edges) cannot express.

    With ``weight_col=None`` parallel edges are COUNTED into weights
    (the natural multigraph reading).  Same all-integer recurrence as
    the unweighted op, with the per-edge contribution
    ``floor(d·rank·w / (100·W_out))`` — one extra multiply, still one
    division, so ranks replicate bit-for-bit in the unrolled-CTE twin.
    """
    if weight_col is None:
        e = (
            edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.count("*").cast("long").alias("w"))
        )
    else:
        e = (
            edges.select(
                F.col(src_col).alias("src"),
                F.col(dst_col).alias("dst"),
                F.col(weight_col).cast("long").alias("w"),
            )
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.sum("w").cast("long").alias("w"))
        )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("wout"))
    ew = e.join(outw, "src")
    n_nodes = nodes.count()
    base = ((100 - damping_pct) * scale) // (100 * n_nodes)
    ranks = nodes.withColumn("rank_micro", F.lit(scale // n_nodes).cast("long"))
    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"CAST({damping_pct} * rank_micro * w AS BIGINT) "
                    f"DIV (100 * wout)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("in_mass"), F.lit(0)))
            .cast("long")
            .alias("rank_micro"),
        )
    return ranks


def weighted_pagerank_oracle_sql(
    edges_sql: str,
    *,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> str:
    """DuckDB twin of [[weighted_pagerank_fixed_iters]] with
    ``weight_col=None`` semantics (``edges_sql`` yields src, dst; parallel
    edges count into weights)."""
    d = damping_pct
    parts = [
        f"""
WITH raw_edges AS ({edges_sql}),
e AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM raw_edges
  WHERE src <> dst GROUP BY 1, 2
),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
outw AS (SELECT src, SUM(w) AS wout FROM e GROUP BY 1),
ew AS (SELECT e.src, e.dst, e.w, outw.wout FROM e JOIN outw USING (src)),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (
  SELECT node, CAST({scale} // n AS BIGINT) AS rank_micro FROM nodes, nn
)"""
    ]
    for i in range(iters):
        parts.append(
            f""",
c{i} AS (
  SELECT ew.dst AS node,
         SUM(({d} * r{i}.rank_micro * ew.w) // (100 * ew.wout)) AS in_mass
  FROM ew JOIN r{i} ON ew.src = r{i}.node
  GROUP BY ew.dst
),
r{i + 1} AS (
  SELECT nodes.node,
         CAST((({100 - d} * {scale}) // (100 * nn.n))
              + COALESCE(c{i}.in_mass, 0) AS BIGINT) AS rank_micro
  FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON nodes.node = c{i}.node
)"""
        )
    parts.append(f"\nSELECT node, rank_micro FROM r{iters}")
    return "".join(parts)


def component_size_bands(
    assignment: DataFrame,
    *,
    id_col: str = "id",
    component_col: str = "component",
) -> DataFrame:
    """Duplicate-cluster shape report: component sizes folded into
    power-of-2 bands (band = exact integer ``length(bin(size))``), with
    member counts and each band's share of all clustered members — the
    one-screen answer to "is the dup graph a sea of pairs or one giant
    template blob", which decides whether keep-best dedup
    ([[dedup_keep_best]]) or template stripping is the right tool.

    Scale shape: one component-keyed aggregate over the assignment
    table, then band-sized rows; the share division rides one broadcast
    1-row total.
    """
    sizes = assignment.groupBy(F.col(component_col).alias("comp")).agg(
        F.count(F.col(id_col)).cast("long").alias("sz")
    )
    banded = sizes.withColumn(
        "band", F.expr("CAST(length(bin(sz)) AS BIGINT)")
    )
    per_band = banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_components"),
        F.sum("sz").cast("long").alias("n_members"),
    )
    tot = per_band.groupBy().agg(
        F.sum("n_members").cast("long").alias("tot")
    )
    return (
        per_band.crossJoin(F.broadcast(tot))
        .select(
            "band",
            "n_components",
            "n_members",
            F.expr(
                "CAST(CAST(n_members AS DECIMAL(38,0)) * 1000000 DIV tot "
                "AS BIGINT)"
            ).alias("member_share_ppm"),
        )
        .orderBy("band")
    )


def component_size_bands_oracle_sql(assignment_sql: str) -> str:
    """DuckDB twin of [[component_size_bands]]; ``assignment_sql`` must
    yield (doc_id, component) like the [[connected_components_star]]
    oracle."""
    return f"""
WITH sizes AS (
  SELECT component AS comp, CAST(COUNT(*) AS BIGINT) AS sz
  FROM ({assignment_sql}) GROUP BY 1
),
banded AS (
  SELECT *, CAST(length(bin(sz)) AS BIGINT) AS band FROM sizes
),
per_band AS (
  SELECT band, CAST(COUNT(*) AS BIGINT) AS n_components,
         CAST(SUM(sz) AS BIGINT) AS n_members
  FROM banded GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_members) AS BIGINT) AS tot FROM per_band)
SELECT band, n_components, n_members,
       CAST(n_members * 1000000 // tot AS BIGINT) AS member_share_ppm
FROM per_band CROSS JOIN tot
ORDER BY band
"""
