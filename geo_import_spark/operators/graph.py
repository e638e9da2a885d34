"""Deterministic integer PageRank over a synthetic citation graph.

Graph: nodes = customers (c_custkey, contiguous 0..n-1); edges = one
per order, src = the ordering customer, dst = a hash of the order key
modulo n — multi-edges kept. Every quantity is BIGINT micro-units so
three Lloyd-style fixed iterations are hash-exact across engines:

    r0(v)   = 1_000_000
    c(u->v) = r(u) div outdeg(u)           (positive floor division)
    r'(v)   = 150_000 + (85 * sum_in(v)) div 100

(d = 0.85 damping expressed as integer *85 div 100; dangling mass is
dropped — the standard simplification — identically on both sides.)

Scale shape: out-degrees are ONE map-side-combined aggregate joined
into the edge list once, outside the loop. Each iteration is the
canonical PageRank pair of shuffles — edges x ranks equi-join on src,
contribution sum on dst — plus a node left-join that reuses the dst
hash partitioning. Lineage is truncated per iteration
(localCheckpoint) so a 50-iteration run doesn't build a 100-stage
plan (the dedup_clusters pattern, dedup.py).

Reference parity: geo-import has no graph operator — this extends the
iterative-algorithm family (dedup_clusters' label propagation) that a
training-data pipeline needs for link-graph quality scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_ITERS = 3
PR_SCALE = 1_000_000
PR_BASE = 150_000  # (1 - 0.85) * PR_SCALE


def pagerank(orders: DataFrame, customer: DataFrame,
             iters: int = PR_ITERS,
             checkpoint_dir: str | None = None) -> DataFrame:
    """(node_id, pr) after `iters` exact integer PageRank steps.

    `checkpoint_dir` opts the per-iteration lineage truncation into
    durable parquet rounds with resume (plans/itercheckpoint.py) —
    default stays localCheckpoint (dies with an executor)."""
    from geo_import_spark.plans.itercheckpoint import LoopCheckpointer

    ck = LoopCheckpointer(checkpoint_dir, name="ranks")
    nodes = customer.select(F.col("c_custkey").cast("long").alias("id"))
    n = nodes.agg(F.count("*").alias("n"))
    edges = orders.crossJoin(F.broadcast(n)).select(
        F.col("o_custkey").cast("long").alias("src"),
        ((F.col("o_orderkey") * F.lit(2654435761)) % F.col("n")).alias("dst"),
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    edges_d = edges.join(deg, "src")  # static across iterations

    ranks = nodes.select("id", F.lit(PR_SCALE).cast("long").alias("r"))
    start_iter = 0
    if ck.durable:
        last, saved = ck.latest(customer.sparkSession)
        if last is not None:
            ranks, start_iter = saved, last + 1
    for it in range(start_iter, iters):
        sums = (
            edges_d.join(ranks, edges_d["src"] == ranks["id"])
            .select(F.col("dst").alias("id"), F.expr("r div d").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = ck.truncate(
            nodes.join(sums, "id", "left").select(
                "id",
                (
                    F.lit(PR_BASE)
                    + F.expr(f"(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")
                ).cast("long").alias("r"),
            ),
            it,
            eager=ck.durable,
        )
    return ranks.select(F.col("id").alias("node_id"), F.col("r").alias("pr"))


def _sql_iter(prev: str) -> str:
    return f"""
  SELECT nodes.id AS id,
         {PR_BASE} + CAST((85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id, CAST(sum(p.r // e.d) AS BIGINT) AS s
    FROM edges_d e JOIN {prev} p ON e.src = p.id
    GROUP BY e.dst) s ON nodes.id = s.id
"""


def sql_pagerank(iters: int = PR_ITERS) -> str:
    cte = [
        "nodes AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        (
            "edges AS (SELECT CAST(o_custkey AS BIGINT) AS src,"
            " (o_orderkey * 2654435761) % (SELECT n FROM nn) AS dst"
            " FROM orders)"
        ),
        "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)",
        (
            "edges_d AS (SELECT edges.src, edges.dst, deg.d"
            " FROM edges JOIN deg ON edges.src = deg.src)"
        ),
        f"r0 AS (SELECT id, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(iters):
        cte.append(f"r{i + 1} AS ({_sql_iter(f'r{i}')})")
    return (
        "WITH " + ",\n".join(cte)
        + f"\nSELECT id AS node_id, r AS pr FROM r{iters}"
    )


SQL_PAGERANK = sql_pagerank()


# --- supplier co-occurrence graph ---------------------------------------------
#
# Nodes = suppliers; an undirected edge (a, b), a < b, connects two
# suppliers that shipped line items of the SAME order, weighted by the
# number of co-orders. Order sizes are bounded (a handful of lines),
# so the per-order pair fan-out is O(k²) with small k — the self-join
# on orderkey never blows up, unlike a supplier-level cross join.


def cooccur_edges(lineitem: DataFrame) -> DataFrame:
    """Distinct weighted co-occurrence edges.

    Output: (src, dst, w) with src < dst, w = co-order count.

    Plan: distinct (orderkey, suppkey) first (shrinks multi-line
    pairs), then ONE self-equi-join on orderkey (both sides share the
    exchange) with the a<b filter, then a map-side-combined count on
    the edge key.
    """
    os_ = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s")
    ).distinct()
    a = os_.select("ok", F.col("s").alias("src"))
    b = os_.select("ok", F.col("s").alias("dst"))
    return (
        a.join(b, "ok")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


SQL_COOCCUR_EDGES = """
WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem)
SELECT a.s AS src, b.s AS dst, count(*) AS w
FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
GROUP BY a.s, b.s
"""


def degree_histogram(lineitem: DataFrame) -> DataFrame:
    """Degree distribution of the co-occurrence graph: how many nodes
    have each (distinct-neighbor) degree.

    Output: (degree, n_nodes). Two map-side-combined aggregates over
    the edge list (each edge contributes to both endpoints via a
    union — no window, no collect).
    """
    e = cooccur_edges(lineitem)
    ends = e.select(F.col("src").alias("node")).unionAll(
        e.select(F.col("dst").alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


SQL_DEGREE_HISTOGRAM = """
WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem),
e AS (
  SELECT a.s AS src, b.s AS dst
  FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
  GROUP BY a.s, b.s
),
ends AS (SELECT src AS node FROM e UNION ALL SELECT dst FROM e),
deg AS (SELECT node, count(*) AS degree FROM ends GROUP BY node)
SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree
"""


def triangle_count(lineitem: DataFrame) -> DataFrame:
    """Exact triangle count of the co-occurrence graph.

    Output (one row): (n_nodes, n_edges, n_triangles).

    Plan: the canonical two-join enumeration over ORIENTED edges
    (src < dst): wedges (a<b<c) from e(a,b)⋈e(b,c), closed by
    e(a,c). Orientation alone bounds the join fan-out by the
    out-degree of the ordered graph; at web scale the standard
    refinement is degree-ordering the orientation — the plan shape
    (two equi-joins, no cross product) is already that one.

    The edge list is node-dimension-sized (≤ |suppliers|²/2), so it
    is PERSISTED for the three consumers (edge count, node count,
    wedge closure) and unpersisted before returning — the expensive
    fact-table self-join inside cooccur_edges runs exactly once, not
    once per branch (a lazy five-branch plan re-derived it five
    times). The scalar result is computed eagerly and returned as a
    literal one-row frame.
    """
    spark = lineitem.sparkSession
    e = cooccur_edges(lineitem).select("src", "dst").persist()
    try:
        n_edges = e.count()  # materializes the persisted edge list
        n_nodes = (
            e.select(F.col("src").alias("n"))
            .unionAll(e.select(F.col("dst").alias("n")))
            .distinct().count()
        )
        ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
        n_tri = ab.join(bc, "b").join(ac, ["a", "c"]).count()
    finally:
        e.unpersist()
    return spark.createDataFrame(
        [(n_nodes, n_edges, n_tri)],
        "n_nodes long, n_edges long, n_triangles long",
    )


SQL_TRIANGLE_COUNT = """
WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem),
e AS (
  SELECT a.s AS src, b.s AS dst
  FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
  GROUP BY a.s, b.s
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM e ab JOIN e bc ON ab.dst = bc.src
            JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
),
nn AS (SELECT count(*) AS n_nodes FROM
       (SELECT DISTINCT n FROM
         (SELECT src AS n FROM e UNION ALL SELECT dst FROM e))),
ne AS (SELECT count(*) AS n_edges FROM e)
SELECT n_nodes, n_edges, n_triangles FROM nn, ne, tri
"""


# ---------------------------------------------------------------------------
# BFS hop distance (unweighted single-source shortest path)
# ---------------------------------------------------------------------------

BFS_MAX_ROUNDS = 20


def bfs_hops(lineitem: DataFrame, max_rounds: int = BFS_MAX_ROUNDS,
             checkpoint_dir: str | None = None) -> DataFrame:
    """(node, hops) for every supplier reachable from the minimum
    supplier id in the co-occurrence graph — unweighted SSSP by
    distance-label relaxation.

    Plan: the same loop shape as dedup.duplicate_clusters with the
    label being an INT distance instead of a string — per round, one
    edges x frontier equi-join plus a min-merge groupBy keyed on node,
    converging in diameter rounds (co-occurrence graphs are
    small-world; the exact changed-row count stops the loop early).
    Lineage truncates per round; `checkpoint_dir` swaps in durable
    parquet rounds with resume (plans/itercheckpoint.py).

    Only reachable nodes appear — their hops are exact BIGINTs, so the
    result hash-checks against the recursive-CTE mirror as long as the
    graph diameter stays under both caps (asserted by the convergence
    test and the corpus' dense co-order structure).
    """
    from geo_import_spark.plans.itercheckpoint import LoopCheckpointer

    ck = LoopCheckpointer(checkpoint_dir, name="bfs")
    e = cooccur_edges(lineitem).select("src", "dst")
    edges = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    src0 = nodes.agg(F.min("node").alias("s0"))

    start_round = 1
    dist = None
    if ck.durable:
        last, saved = ck.latest(lineitem.sparkSession)
        if last is not None:
            dist, start_round = saved, last + 1
    if dist is None:
        dist = ck.truncate(
            nodes.crossJoin(F.broadcast(src0)).select(
                "node",
                F.when(F.col("node") == F.col("s0"), F.lit(0))
                .cast("long")
                .alias("hops"),
            ),
            0,
        )
    changed = 0  # loop may be skipped entirely on resume at max_rounds
    for rnd in range(start_round, max_rounds + 1):
        relaxed = (
            edges.join(
                dist.filter(F.col("hops").isNotNull()),
                edges["src"] == F.col("node"),
            )
            .select(F.col("dst").alias("node"), (F.col("hops") + 1).alias("hops"))
        )
        new_dist = ck.truncate(
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("hops").alias("hops")),
            rnd,
        )
        changed = (
            new_dist.alias("n")
            .join(dist.alias("o"), "node")
            .filter(
                ~F.col("n.hops").eqNullSafe(F.col("o.hops"))
            )
            .count()
        )
        dist = new_dist
        if changed == 0:
            break
    if changed != 0:
        # ADVICE r4: mirror the recursive CTE's convergence guarantee —
        # a diameter above max_rounds must raise, not silently return
        # under-relaxed distances that hash-mismatch the oracle.
        raise RuntimeError(
            f"bfs_hops did not converge in {max_rounds} rounds "
            f"(last round changed {changed} distances); raise max_rounds "
            f"or pass checkpoint_dir and re-run to resume"
        )
    return dist.filter(F.col("hops").isNotNull()).select("node", "hops")


def sql_bfs_hops(max_rounds: int = BFS_MAX_ROUNDS) -> str:
    return f"""
WITH RECURSIVE os AS (
  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
), e0 AS (
  SELECT a.s AS src, b.s AS dst
  FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
  GROUP BY a.s, b.s
), e AS (
  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
), walk(node, d) AS (
  SELECT (SELECT MIN(src) FROM e), 0
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.d < {int(max_rounds)}
)
SELECT node, CAST(MIN(d) AS BIGINT) AS hops FROM walk GROUP BY node
"""


# ---------------------------------------------------------------------------
# Weighted single-source shortest path (Bellman-Ford relaxation)
# ---------------------------------------------------------------------------

SSSP_MAX_ROUNDS = 12


def _weighted_edges(lineitem: DataFrame) -> DataFrame:
    """Undirected cost edges over the co-occurrence graph: the
    standard affinity->dissimilarity flip, cost = 100 div w + 1
    (BIGINT, positive), so strongly co-ordered suppliers are CLOSE.
    Both directions of each oriented edge carry the same cost."""
    e = cooccur_edges(lineitem).select(
        "src", "dst", F.expr("100 div w + 1").cast("long").alias("c")
    )
    return e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "c")
    )


def weighted_sssp(lineitem: DataFrame, max_rounds: int = SSSP_MAX_ROUNDS,
                  checkpoint_dir: str | None = None) -> DataFrame:
    """(node, dist) — exact weighted shortest-path cost from the
    minimum supplier id, Bellman-Ford relaxation over the undirected
    cost graph (cost = 100 div w + 1 per edge; see _weighted_edges).

    bfs_hops generalized from hop counting to weighted relaxation:
    per round, ONE edges x settled-frontier equi-join plus a
    min-merge groupBy on node; positive integer costs converge in at
    most (longest shortest path in hops) rounds, and the loop stops
    the round nothing improves. Lineage truncates per round
    (localCheckpoint); `checkpoint_dir` swaps in durable parquet
    rounds with kill-and-resume (plans/itercheckpoint.py). Exceeding
    `max_rounds` with changes still pending RAISES (the bfs_hops /
    duplicate_clusters convergence contract) — never silently
    returns under-relaxed distances.

    The DuckDB mirror unrolls exactly `max_rounds` min-merge rounds
    (relaxation is idempotent after the fixpoint, so early exit on
    the Spark side cannot diverge from the full unroll). Only
    reachable nodes appear; distances are exact BIGINTs.
    """
    from geo_import_spark.plans.itercheckpoint import LoopCheckpointer

    ck = LoopCheckpointer(checkpoint_dir, name="sssp")
    edges = _weighted_edges(lineitem).localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    src0 = nodes.agg(F.min("node").alias("s0"))

    start_round = 1
    dist = None
    if ck.durable:
        last, saved = ck.latest(lineitem.sparkSession)
        if last is not None:
            dist, start_round = saved, last + 1
    if dist is None:
        dist = ck.truncate(
            nodes.crossJoin(F.broadcast(src0)).select(
                "node",
                F.when(F.col("node") == F.col("s0"), F.lit(0))
                .cast("long")
                .alias("dist"),
            ),
            0,
        )
    changed = 0
    for rnd in range(start_round, max_rounds + 1):
        relaxed = (
            edges.join(
                dist.filter(F.col("dist").isNotNull()),
                edges["src"] == F.col("node"),
            )
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("c")).alias("dist"),
            )
        )
        new_dist = ck.truncate(
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist")),
            rnd,
        )
        changed = (
            new_dist.alias("n")
            .join(dist.alias("o"), "node")
            .filter(~F.col("n.dist").eqNullSafe(F.col("o.dist")))
            .count()
        )
        dist = new_dist
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"weighted_sssp did not converge in {max_rounds} rounds "
            f"(last round changed {changed} distances); raise max_rounds "
            f"or pass checkpoint_dir and re-run to resume"
        )
    return dist.filter(F.col("dist").isNotNull()).select("node", "dist")


def sql_weighted_sssp(max_rounds: int = SSSP_MAX_ROUNDS) -> str:
    """Unrolled Bellman-Ford mirror: d_{k+1}(v) = min(d_k(v),
    min_{(u,v)} d_k(u) + c(u,v)), exactly `max_rounds` rounds — a
    no-op after the fixpoint the Spark side asserts it reaches."""
    rounds = []
    prev = "d0"
    for k in range(1, max_rounds + 1):
        # MATERIALIZED is load-bearing: each round references the
        # previous one twice (keep + relax); inlined CTEs would expand
        # the chain 2^k times.
        rounds.append(f"""d{k} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM {prev}
    UNION ALL
    SELECT e.dst AS node, p.dist + e.c AS dist
    FROM {prev} p JOIN e ON e.src = p.node
    WHERE p.dist IS NOT NULL
  ) GROUP BY node
)""")
        prev = f"d{k}"
    chain = ",\n".join(rounds)
    return f"""
WITH os AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
),
e0 AS MATERIALIZED (
  SELECT a.s AS src, b.s AS dst,
         CAST(100 // count(*) + 1 AS BIGINT) AS c
  FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
  GROUP BY a.s, b.s
),
e AS MATERIALIZED (
  SELECT src, dst, c FROM e0 UNION ALL SELECT dst, src, c FROM e0
),
nodes AS (SELECT DISTINCT src AS node FROM e),
d0 AS (
  SELECT node,
         CASE WHEN node = (SELECT MIN(node) FROM nodes)
              THEN CAST(0 AS BIGINT) END AS dist
  FROM nodes
),
{chain}
SELECT node, dist FROM {prev} WHERE dist IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Local clustering coefficient
# ---------------------------------------------------------------------------


def local_clustering(lineitem: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient of the co-occurrence
    graph: lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1)), the fraction of a
    node's neighbor pairs that are themselves connected (Watts &
    Strogatz 1998). Nodes with deg < 2 have no neighbor pair and get
    lcc = 0.0 (the standard convention).

    Output: (node, degree, triangles, lcc), one row per graph node.

    Plan: the node-dimension-sized edge list is lineage-pinned with
    localCheckpoint (the tile_pyramid pattern — distributed, never a
    driver collect) so its three consumers (degree agg, wedge join,
    closure join) share ONE run of the fact-table self-join inside
    cooccur_edges. Triangles are enumerated once each via
    the oriented wedge join (a<b<c) and credited to all three corners
    by a 3-way explode — two dimension-sized equi-joins plus two
    map-side-combined aggregates, never a cross product. The lcc
    division is the only double: 2T and d(d−1) are exact BIGINTs on
    both engines, and a single correctly-rounded IEEE division of the
    same two integers is bit-identical (same discipline as Moran's I).

    Scale: everything after cooccur_edges is O(edges + triangles);
    at web scale the wedge fan-out is bounded by orienting low-degree
    → high-degree (degree ordering) — the plan shape (two equi-joins)
    is already the one that refinement keeps.
    """
    e = cooccur_edges(lineitem).select("src", "dst").localCheckpoint()
    ends = e.select(F.col("src").alias("node")).unionAll(
        e.select(F.col("dst").alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    tcnt = corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
    return deg.join(tcnt, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
        F.when(
            F.col("degree") >= 2,
            (F.coalesce(F.col("triangles"), F.lit(0)) * 2).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
        ).otherwise(F.lit(0.0)).alias("lcc"),
    )


SQL_LOCAL_CLUSTERING = """
WITH os AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
),
e AS MATERIALIZED (
  SELECT a.s AS src, b.s AS dst
  FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
  GROUP BY a.s, b.s
),
ends AS (SELECT src AS node FROM e UNION ALL SELECT dst FROM e),
deg AS (SELECT node, count(*) AS degree FROM ends GROUP BY node),
tri AS (
  SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
  FROM e ab JOIN e bc ON ab.dst = bc.src
            JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
),
corners AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
tc AS (SELECT node, count(*) AS triangles FROM corners GROUP BY node)
SELECT deg.node AS node, degree,
       COALESCE(triangles, 0) AS triangles,
       CASE WHEN degree >= 2 THEN
         CAST(COALESCE(triangles, 0) * 2 AS DOUBLE)
           / CAST(degree * (degree - 1) AS DOUBLE)
       ELSE 0.0 END AS lcc
FROM deg LEFT JOIN tc ON deg.node = tc.node
"""


# ---------------------------------------------------------------------------
# k-core decomposition (fixed k) over the sparsified part co-order graph
# ---------------------------------------------------------------------------

KCORE_K = 4
KCORE_SPARSIFY = 16  # keep edges with hash28(src:dst) % 16 == 0
KCORE_MAX_ROUNDS = 24


def _part_edges_sparse(lineitem: DataFrame,
                       sparsify: int = KCORE_SPARSIFY) -> DataFrame:
    """Deterministically sparsified part co-order graph: distinct
    (src < dst) part pairs sharing an order, kept iff
    hash28(src || ':' || dst) % sparsify == 0 (the trainprep
    md5-sampling convention — rehash-stable across engines and runs).

    The corpus' raw co-order graphs are near-complete (every
    part/supplier pairs with most others), which makes any fixed-k
    core trivial; hash sparsification is the standard determinisic
    edge-sampling step that yields a graph with real core structure
    while keeping the oracle mirror exact."""
    from geo_import_spark.operators.textops import hash28

    os_ = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
    ).distinct()
    a = os_.select("ok", F.col("p").alias("src"))
    b = os_.select("ok", F.col("p").alias("dst"))
    return (
        a.join(b, "ok")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .filter(
            hash28(F.concat_ws(":", F.col("src"), F.col("dst")))
            % F.lit(sparsify)
            == 0
        )
    )


def k_core(lineitem: DataFrame, k: int = KCORE_K,
           max_rounds: int = KCORE_MAX_ROUNDS,
           checkpoint_dir: str | None = None) -> DataFrame:
    """(node, core_deg): the k-core of the sparsified part co-order
    graph — the maximal subgraph in which every node keeps >= k
    distinct neighbors — with each survivor's within-core degree.

    Iterative peeling (Seidman 1983): drop nodes whose current degree
    is < k, recompute degrees over the induced subgraph, repeat to
    fixpoint. Per round: the pinned symmetric edge list semi-joins
    the alive set on BOTH endpoints (two dimension-sized hash joins),
    then one map-side-combined count per src — the same
    loop-with-lineage-truncation shape as bfs_hops, with the
    convergence guard raising if the peel has not reached fixpoint
    within max_rounds (monotone, so fixpoint is guaranteed to exist;
    the guard bounds wall-clock, not correctness).

    Scale: each round shuffles |edges alive| rows keyed by node —
    peeling is the textbook distributed k-core (e.g. GraphX/Pregel
    formulations); rounds are bounded by the peel depth, which is
    small on heavy-tailed graphs (degeneracy ordering depth).
    """
    from geo_import_spark.plans.itercheckpoint import LoopCheckpointer

    ck = LoopCheckpointer(checkpoint_dir, name="kcore")
    e = _part_edges_sparse(lineitem)
    return peel_core(e, k=k, max_rounds=max_rounds, ck=ck,
                     spark=lineitem.sparkSession)


def peel_core(undirected: DataFrame, k: int, max_rounds: int,
              ck=None, spark=None) -> DataFrame:
    """The peel loop over any undirected (src, dst) edge frame —
    factored out of k_core so planted graphs test the fixpoint,
    monotonicity, and guard semantics directly."""
    from geo_import_spark.plans.itercheckpoint import LoopCheckpointer

    if ck is None:
        ck = LoopCheckpointer(None, name="kcore")
    edges = undirected.unionAll(
        undirected.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    ).localCheckpoint(eager=True)

    alive = edges.select(F.col("src").alias("node")).distinct()
    n_prev = alive.count()
    start_round = 0
    if ck.durable and spark is not None:
        last, saved = ck.latest(spark)
        if last is not None:
            alive, start_round = saved, last + 1
            n_prev = alive.count()

    deg = None
    for it in range(start_round, max_rounds):
        deg = (
            edges.join(alive.select(F.col("node").alias("src")), "src")
            .join(alive.select(F.col("node").alias("dst")), "dst")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("core_deg"))
        )
        nxt = ck.truncate(
            deg.filter(F.col("core_deg") >= k).select(
                F.col("src").alias("node")
            ),
            it,
            eager=True,
        )
        n_next = nxt.count()
        alive = nxt
        if n_next == n_prev:
            break
        n_prev = n_next
    else:
        raise RuntimeError(
            f"k_core: peel did not reach fixpoint in {max_rounds} rounds"
        )
    # at fixpoint every alive node's deg row is >= k and final
    return deg.filter(F.col("core_deg") >= k).select(
        F.col("src").alias("node"), "core_deg"
    )


def sql_k_core(k: int = KCORE_K, sparsify: int = KCORE_SPARSIFY,
               max_rounds: int = KCORE_MAX_ROUNDS) -> str:
    """Unrolled-peel mirror (the sql_weighted_sssp pattern): exactly
    max_rounds MATERIALIZED rounds — a no-op after the fixpoint the
    Spark side's guard proves it reaches. Round r keeps the nodes
    with >= k alive neighbors in round r-1's alive set."""
    from geo_import_spark.operators.textops import SQL_HASH28

    h = SQL_HASH28.format(x="CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)")
    rounds = []
    prev = "a0"
    for r in range(1, max_rounds + 1):
        rounds.append(f"""a{r} AS MATERIALIZED (
  SELECT e.src AS node FROM e
  JOIN {prev} s ON s.node = e.src
  JOIN {prev} d ON d.node = e.dst
  GROUP BY e.src HAVING COUNT(*) >= {int(k)}
)""")
        prev = f"a{r}"
    chain = ",\n".join(rounds)
    return f"""
WITH os AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
),
e0 AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT DISTINCT a.p AS src, b.p AS dst
    FROM os a JOIN os b ON a.ok = b.ok AND a.p < b.p
  ) WHERE ({h}) % {int(sparsify)} = 0
),
e AS MATERIALIZED (
  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
),
a0 AS (SELECT DISTINCT src AS node FROM e),
{chain}
SELECT e.src AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
FROM e
JOIN {prev} s ON s.node = e.src
JOIN {prev} d ON d.node = e.dst
GROUP BY e.src HAVING COUNT(*) >= {int(k)}
"""


# ---------------------------------------------------------------------------
# Link prediction: common-neighbor / Jaccard scores for 2-hop pairs
# ---------------------------------------------------------------------------

LINKPRED_TOP_K = 200
LINKPRED_MAX_MID_DEG = 100_000  # wedge-middle degree guard (see doc)


def link_prediction(lineitem: DataFrame,
                    top_k: int = LINKPRED_TOP_K,
                    sparsify: int = KCORE_SPARSIFY,
                    max_mid_deg: int = LINKPRED_MAX_MID_DEG) -> DataFrame:
    """Top-k predicted links on the sparsified part co-order graph
    (the k_core edge set): for every NON-adjacent 2-hop pair (u, w),
    cn = |N(u) ∩ N(w)| and the Jaccard coefficient
    cn / (deg_u + deg_w - cn) — the classic neighborhood link
    predictor (Liben-Nowell & Kleinberg, CIKM 2003).

    Exactness: cn and degrees are exact BIGINTs; the score is ONE
    double division of two exact ints, so the (score, u, w) ordering
    — and therefore the top-k cut — is decided identically in both
    engines; (u, w) pairs are unique so the total order has no
    nondeterministic ties.

    Plan: ONE wedge self-join of the directed edge list on the
    middle vertex (u < w halves the pairs), a map-side-combined
    count on the pair key, a LEFT ANTI join against the existing
    edges, two broadcast-sized degree joins, and a TakeOrdered
    top-k. The sparsified edge list is lineage-pinned
    (localCheckpoint, the local_clustering pattern) so its six
    consumers share ONE lineitem pass instead of re-expanding the
    distinct+self-join subtree per reference. The deterministic hash
    sparsification (_part_edges_sparse) bounds the typical degree;
    the wedge fan-out is additionally ENFORCED bounded: middles with
    degree > max_mid_deg are excluded via one broadcast-sized
    anti-join (a single celebrity hub contributes O(deg^2) wedge
    pairs, the classic quadratic skew bomb — dropping it is the
    standard common-neighbor practice because a hub's co-neighbors
    say little anyway). The cap never triggers on the sparsified
    corpus (hash-parity preserved); the planted test exercises it.

    Output: (u, w, cn, deg_u, deg_w, jaccard), top_k by
    (jaccard DESC, u, w).
    """
    edges = _part_edges_sparse(lineitem, sparsify=sparsify).localCheckpoint(
        eager=False
    )
    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    hot = deg.filter(F.col("deg") > int(max_mid_deg)).select(
        F.col("src").alias("m")
    )
    wedge_l = und.select(F.col("dst").alias("m"), F.col("src").alias("u"))
    wedge_r = und.select(F.col("src").alias("m"), F.col("dst").alias("w"))
    pairs = (
        wedge_l.join(F.broadcast(hot), "m", "left_anti")
        .join(wedge_r, "m")
        .filter(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    cand = pairs.join(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("w")),
        ["u", "w"],
        "left_anti",
    )
    scored = (
        cand.join(deg.select(F.col("src").alias("u"),
                             F.col("deg").alias("deg_u")), "u")
        .join(deg.select(F.col("src").alias("w"),
                         F.col("deg").alias("deg_w")), "w")
        .select(
            "u", "w", "cn", "deg_u", "deg_w",
            (F.col("cn").cast("double")
             / (F.col("deg_u") + F.col("deg_w") - F.col("cn")).cast("double")
             ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("jaccard").desc(), F.col("u"), F.col("w")
    ).limit(top_k)


def sql_link_prediction(top_k: int = LINKPRED_TOP_K,
                        sparsify: int = KCORE_SPARSIFY) -> str:
    """Mirror over the sql_k_core sparsified edge CTEs: one wedge
    join, anti-join via NOT EXISTS, the identical one-division
    score and (jaccard DESC, u, w) top-k."""
    from geo_import_spark.operators.textops import SQL_HASH28

    h = SQL_HASH28.format(
        x="CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)")
    return f"""
WITH os AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
),
e0 AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT DISTINCT a.p AS src, b.p AS dst
    FROM os a JOIN os b ON a.ok = b.ok AND a.p < b.p
  ) WHERE ({h}) % {int(sparsify)} = 0
),
e AS MATERIALIZED (
  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
pairs AS (
  SELECT l.src AS u, r.dst AS w, CAST(COUNT(*) AS BIGINT) AS cn
  FROM e l JOIN e r ON l.dst = r.src AND l.src < r.dst
  GROUP BY l.src, r.dst
),
cand AS (
  SELECT * FROM pairs p
  WHERE NOT EXISTS (SELECT 1 FROM e0
                    WHERE e0.src = p.u AND e0.dst = p.w)
)
SELECT c.u AS u, c.w AS w, c.cn AS cn,
       du.deg AS deg_u, dw.deg AS deg_w,
       CAST(c.cn AS DOUBLE)
         / CAST(du.deg + dw.deg - c.cn AS DOUBLE) AS jaccard
FROM cand c
JOIN deg du ON du.src = c.u
JOIN deg dw ON dw.src = c.w
ORDER BY jaccard DESC, u, w
LIMIT {int(top_k)}
"""
