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
             iters: int = PR_ITERS) -> DataFrame:
    """(node_id, pr) after `iters` exact integer PageRank steps."""
    nodes = customer.select(F.col("c_custkey").cast("long").alias("id"))
    n = nodes.agg(F.count("*").alias("n"))
    edges = orders.crossJoin(F.broadcast(n)).select(
        F.col("o_custkey").cast("long").alias("src"),
        ((F.col("o_orderkey") * F.lit(2654435761)) % F.col("n")).alias("dst"),
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    edges_d = edges.join(deg, "src")  # static across iterations

    ranks = nodes.select("id", F.lit(PR_SCALE).cast("long").alias("r"))
    for _ in range(iters):
        sums = (
            edges_d.join(ranks, edges_d["src"] == ranks["id"])
            .select(F.col("dst").alias("id"), F.expr("r div d").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(sums, "id", "left").select(
            "id",
            (
                F.lit(PR_BASE)
                + F.expr(f"(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")
            ).cast("long").alias("r"),
        ).localCheckpoint(eager=False)
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
