"""Geometry validation: exact ring self-intersection detection and
signed ring orientation over the engine's flat geometry struct.

An ingest engine must reject (or at least flag) invalid geometry
before it poisons downstream joins — the reference validates features
structurally on decode (`es6-lib/lib/decoders/geojson.js` feature
validation, `merger.js` fixups close open rings but never repair a
self-intersection). These operators give that gate teeth at the
geometry level:

- `validate_rings`: a ring is flagged invalid iff any two
  NON-ADJACENT edges intersect (touch counts) — the strict simplicity
  test. Adjacent edges (consecutive, or the first/last wrap pair)
  legitimately share a vertex and are excluded; everything else that
  meets is a defect. Cross-ring pairs within one polygon are all
  non-adjacent (a hole may not cross its shell).
- `ring_orientation`: the exact signed shoelace sum (2x area) per
  ring on the µ-degree integer lattice — CCW / CW / degenerate
  (a bowtie's two lobes cancel to exactly 0 in integer arithmetic).

Exactness: vertices quantize to BIGINT micro-degrees with the same
`CAST(round(x*1e6) AS BIGINT)` both engines (geodist.py convention;
the corpus lattice is EDGE_EPS off the rounding boundary), and the
intersection predicate is the linejoin.segment_pred template — one
SQL text rendered for BOTH the Spark plan and the DuckDB oracle.

Scale shape: edges explode map-side from the ring arrays (no
shuffle); the edge-pair self-join keys on poly_id, so it is ONE hash
shuffle of the edge set, and the per-key fan-out is O(V^2) where V is
bounded by the decoder's vertex-count guard (sources/geojson.py /
kml.py) — the same invariant that protects the PIP kernel bounds this
join. No cross join, no driver collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_import_spark.operators.linejoin import segment_pred

_U = "CAST(round({c} * 1000000, 0) AS BIGINT)"


def ring_edges(polys: DataFrame) -> DataFrame:
    """Explode (poly_id, geom) into directed ring edges on the µdeg
    lattice: (poly_id, ring, j, ne, x1, y1, x2, y2) with j the edge
    index within its ring and ne the ring's edge count. Rings are
    stored closed (last vertex == first), so edges are consecutive
    vertex pairs. Pure map-side: two bounded explodes, zero shuffles.
    """
    r = polys.select(
        "poly_id",
        F.col("geom.ring_offsets").alias("ro"),
        F.col("geom.xs").alias("xs"),
        F.col("geom.ys").alias("ys"),
        F.explode(
            F.sequence(F.lit(0), F.size("geom.ring_offsets") - 2)
        ).alias("ring"),
    ).select(
        "poly_id",
        "ring",
        "xs",
        "ys",
        F.element_at("ro", F.col("ring") + 1).alias("rs"),
        F.element_at("ro", F.col("ring") + 2).alias("re"),
    )
    e = r.select(
        "poly_id",
        "ring",
        "xs",
        "ys",
        "rs",
        (F.col("re") - F.col("rs") - 1).alias("ne"),
        F.explode(F.sequence("rs", F.col("re") - 2)).alias("i"),
    )
    u = lambda c: F.expr(_U.format(c=c))  # noqa: E731
    return e.select(
        "poly_id",
        "ring",
        (F.col("i") - F.col("rs")).alias("j"),
        "ne",
        u("element_at(xs, i + 1)").alias("x1"),
        u("element_at(ys, i + 1)").alias("y1"),
        u("element_at(xs, i + 2)").alias("x2"),
        u("element_at(ys, i + 2)").alias("y2"),
    )


def validate_rings(polys: DataFrame) -> DataFrame:
    """(poly_id, n_edges, n_crossings, is_valid): count of
    non-adjacent edge pairs that intersect (exact integer CLRS
    predicate, touching counts), per polygon across all its rings.

    One shuffle on poly_id for the pair join (per-key fan-out bounded
    by the decoder vertex guard), one map-side-combined count.
    """
    e = ring_edges(polys)
    a = e.select(
        "poly_id",
        F.col("ring").alias("ra"),
        F.col("j").alias("ja"),
        F.col("ne").alias("nea"),
        F.col("x1").alias("ax1"),
        F.col("y1").alias("ay1"),
        F.col("x2").alias("ax2"),
        F.col("y2").alias("ay2"),
    )
    b = e.select(
        "poly_id",
        F.col("ring").alias("rb"),
        F.col("j").alias("jb"),
        F.col("x1").alias("bx1"),
        F.col("y1").alias("by1"),
        F.col("x2").alias("bx2"),
        F.col("y2").alias("by2"),
    )
    same_ring = F.col("ra") == F.col("rb")
    ordered = (F.col("ra") < F.col("rb")) | (
        same_ring & (F.col("ja") < F.col("jb"))
    )
    adjacent = same_ring & (
        (F.col("jb") - F.col("ja") == 1)
        | ((F.col("ja") == 0) & (F.col("jb") == F.col("nea") - 1))
    )
    crossings = (
        a.join(b, "poly_id")
        .filter(ordered & ~adjacent)
        .filter(F.expr(segment_pred()))
        .groupBy("poly_id")
        .agg(F.count("*").alias("n_crossings"))
    )
    base = e.groupBy("poly_id").agg(F.count("*").alias("n_edges"))
    return base.join(crossings, "poly_id", "left").select(
        "poly_id",
        "n_edges",
        F.coalesce("n_crossings", F.lit(0).cast("long")).alias("n_crossings"),
        (F.coalesce("n_crossings", F.lit(0).cast("long")) == 0).alias(
            "is_valid"
        ),
    )


def ring_orientation(polys: DataFrame) -> DataFrame:
    """(poly_id, ring, area2_u, orientation): the exact signed
    shoelace sum 2*A in squared micro-degrees (BIGINT) per ring, and
    its classification — 'CCW' (>0), 'CW' (<0), 'degenerate' (=0; a
    symmetric bowtie's lobes cancel exactly in integer arithmetic).

    One map-side-combined aggregation on (poly_id, ring).
    """
    e = ring_edges(polys)
    return (
        e.groupBy("poly_id", "ring")
        .agg(
            F.sum(
                F.col("x1") * F.col("y2") - F.col("x2") * F.col("y1")
            ).alias("area2_u")
        )
        .select(
            "poly_id",
            "ring",
            "area2_u",
            F.when(F.col("area2_u") > 0, F.lit("CCW"))
            .when(F.col("area2_u") < 0, F.lit("CW"))
            .otherwise(F.lit("degenerate"))
            .alias("orientation"),
        )
    )


def _sql_edges(sql_vertices: str) -> str:
    """Oracle edge CTE text: the validation layer's per-vertex rows
    (poly_id, j, vx, vy, n_v) -> directed µdeg edges with lead()."""
    u = lambda c: _U.format(c=c)  # noqa: E731
    return f"""
v AS ({sql_vertices}),
e AS (
  SELECT poly_id, j,
         (n_v - 1) AS ne,
         {u('vx')} AS x1, {u('vy')} AS y1,
         lead({u('vx')}) OVER (PARTITION BY poly_id ORDER BY j) AS x2,
         lead({u('vy')}) OVER (PARTITION BY poly_id ORDER BY j) AS y2
  FROM v
)"""


def sql_validate_rings(sql_vertices: str) -> str:
    """DuckDB oracle: brute-force non-adjacent edge pairs with the
    SAME segment_pred text (the oracle layer is single-ring, so
    ring adjacency reduces to edge-index adjacency)."""
    pred = segment_pred(
        ax1="a.x1", ay1="a.y1", ax2="a.x2", ay2="a.y2",
        bx1="b.x1", by1="b.y1", bx2="b.x2", by2="b.y2",
    )
    return f"""
WITH {_sql_edges(sql_vertices)},
edges AS (SELECT * FROM e WHERE x2 IS NOT NULL),
cross_pairs AS (
  SELECT a.poly_id, COUNT(*) AS n_crossings
  FROM edges a JOIN edges b
    ON a.poly_id = b.poly_id AND a.j < b.j
   AND NOT (b.j - a.j = 1 OR (a.j = 0 AND b.j = a.ne - 1))
  WHERE {pred}
  GROUP BY a.poly_id
)
SELECT edges.poly_id AS poly_id,
       COUNT(*) AS n_edges,
       COALESCE(MAX(cp.n_crossings), 0) AS n_crossings,
       COALESCE(MAX(cp.n_crossings), 0) = 0 AS is_valid
FROM edges LEFT JOIN cross_pairs cp ON edges.poly_id = cp.poly_id
GROUP BY edges.poly_id
"""


def sql_ring_orientation(sql_vertices: str) -> str:
    return f"""
WITH {_sql_edges(sql_vertices)}
SELECT poly_id,
       CAST(0 AS INTEGER) AS ring,
       CAST(SUM(x1 * y2 - x2 * y1) AS BIGINT) AS area2_u,
       CASE WHEN SUM(x1 * y2 - x2 * y1) > 0 THEN 'CCW'
            WHEN SUM(x1 * y2 - x2 * y1) < 0 THEN 'CW'
            ELSE 'degenerate' END AS orientation
FROM e WHERE x2 IS NOT NULL
GROUP BY poly_id
"""


# ---------------------------------------------------------------------------
# Winding normalization (shell CCW, holes CW) — pure map, zero shuffle
# ---------------------------------------------------------------------------


def normalize_rings(polys: DataFrame) -> DataFrame:
    """OGC winding normalization: every SHELL ring (first ring of its
    part, per part_offsets) is rewound CCW and every HOLE ring CW —
    the close-rings/linify family's missing third fix (the reference
    closes rings but never repairs winding; PostGIS calls this
    ST_ForcePolygonCCW). Degenerate rings (signed area 0) are left
    untouched.

    The signed shoelace per ring is an exact BIGINT fold on the µdeg
    lattice (the validation module's `_U` convention), computed
    INLINE with nested aggregate/transform over the flat offsets —
    no explode, no groupBy, no join: the whole operator is two
    map-only projections, so it composes into any decoder pipeline
    with zero added shuffles at any scale.

    Output: (poly_id, geom) with rewound xs/ys (offsets unchanged;
    rings are stored closed, and reversing a closed ring keeps it
    closed), plus `flips` (boolean per ring) and `signs` (the
    pre-normalization signed 2A in squared µdeg) for reporting.

    Composition note: feeding this operator its OWN unmaterialized
    output nests the array expression tree combinatorially (each
    element_at re-expands the rebuilt-array subtree) — materialize
    (cache/localCheckpoint/write) between repeated passes, as any
    real decode pipeline already does between stages.
    """
    geom = F.col("geom")
    ro, po = geom["ring_offsets"], geom["part_offsets"]
    xs, ys = geom["xs"], geom["ys"]
    ux = lambda i: F.round(F.element_at(xs, i) * 1_000_000, 0).cast("long")  # noqa: E731
    uy = lambda i: F.round(F.element_at(ys, i) * 1_000_000, 0).cast("long")  # noqa: E731

    def sign(r):
        rs = F.element_at(ro, r + 1)
        re_ = F.element_at(ro, r + 2)
        return F.aggregate(
            F.sequence(rs + 1, re_ - 1),
            F.lit(0).cast("long"),
            lambda acc, i: acc + ux(i) * uy(i + 1) - ux(i + 1) * uy(i),
        )

    shells = F.slice(po, 1, F.size(po) - 1)
    ring_seq = F.sequence(F.lit(0), F.size(ro) - 2)
    signs = F.transform(ring_seq, sign)
    flips = F.transform(
        ring_seq,
        lambda r: F.when(
            F.array_contains(shells, r),
            F.element_at(signs, r + 1) < 0,
        ).otherwise(F.element_at(signs, r + 1) > 0),
    )
    staged = polys.select(
        "poly_id", "geom", signs.alias("signs"), flips.alias("flips")
    )
    g = F.col("geom")
    ro2 = g["ring_offsets"]

    def rebuild(coords):
        def one(r):
            rs = F.element_at(ro2, r + 1)
            ln = F.element_at(ro2, r + 2) - rs
            sl = F.slice(coords, rs + 1, ln)
            return F.when(
                F.element_at(F.col("flips"), r + 1), F.reverse(sl)
            ).otherwise(sl)

        return F.flatten(
            F.transform(F.sequence(F.lit(0), F.size(ro2) - 2), one)
        )

    return staged.select(
        "poly_id",
        F.struct(
            g["gtype"].alias("gtype"),
            g["part_offsets"].alias("part_offsets"),
            g["ring_offsets"].alias("ring_offsets"),
            rebuild(g["xs"]).alias("xs"),
            rebuild(g["ys"]).alias("ys"),
        ).alias("geom"),
        "signs",
        "flips",
    )
