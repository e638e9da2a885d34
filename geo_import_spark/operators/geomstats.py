"""Per-geometry planar statistics: shoelace area, perimeter,
area-weighted centroid — 100% JVM array expressions over the engine's
flat geometry layout (ring_offsets / xs / ys), no Python bridge.

The reference computes no geometry analytics (its geometry handling is
decode -> validate -> project, SURVEY.md §2.3-2.4); this operator is
part of the engine's analytics surface, sitting on the same flat
layout every decoder emits (sources/geojson.py, kml.py, shapefile.py).

Semantics (planar, degrees): per ring r, segments j run over the
closed vertex list [ro[r], ro[r+1]-1]; the signed shoelace sum
S = sum(x_j*y_{j+1} - x_{j+1}*y_j) gives area = |S/2| (holes wound
opposite to the shell subtract), perimeter sums all ring boundary
lengths, centroid = (sum((x_j+x_{j+1})*cross_j), ...) / (6*S/2).

Determinism: every sum is a LEFT FOLD in vertex order
(F.aggregate(..., 0.0, a+t)), mirrored bit-exactly by the DuckDB
oracle's list_reduce — double results hash-compare across engines.

Scale: one narrow projection per geometry, no shuffle, no UDF — the
whole operator lives inside whole-stage codegen next to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def geom_stats(
    geoms: DataFrame, geom_col: str = "geom", id_cols: tuple[str, ...] = ("poly_id",)
) -> DataFrame:
    """(id_cols..., n_rings, n_vertices, area, perimeter, cx, cy).

    Empty geometries produce NULL stats (n_rings/n_vertices = 0);
    zero-area (degenerate) geometries produce NULL centroid.
    """
    g = F.col(geom_col)
    xs, ys, ro = g["xs"], g["ys"], g["ring_offsets"]
    nv = F.size(xs)

    # Ring-boundary mask: segment j (0-based first-vertex index) is a
    # real edge unless vertex j+1 starts a later ring — those j are
    # exactly `interior ring offset - 1`. Single-ring geometries have
    # an empty interior list, so every segment is valid.
    interior = F.slice(ro, 2, F.greatest(F.size(ro) - 2, F.lit(0)))
    segs = F.sequence(F.lit(0), nv - 2)

    def vx(j):
        return F.element_at(xs, j + 1)

    def vy(j):
        return F.element_at(ys, j + 1)

    def masked(j, term):
        return F.when(F.array_contains(interior, j + 1), F.lit(0.0)).otherwise(term)

    def cross(j):
        return vx(j) * vy(j + 1) - vx(j + 1) * vy(j)

    def fold(terms):
        return F.aggregate(terms, F.lit(0.0), lambda a, t: a + t)

    cross_sum = fold(F.transform(segs, lambda j: masked(j, cross(j))))

    def seglen(j):
        dx = vx(j + 1) - vx(j)
        dy = vy(j + 1) - vy(j)
        return F.sqrt(dx * dx + dy * dy)

    perimeter = fold(F.transform(segs, lambda j: masked(j, seglen(j))))
    cx_sum = fold(F.transform(segs, lambda j: masked(j, (vx(j) + vx(j + 1)) * cross(j))))
    cy_sum = fold(F.transform(segs, lambda j: masked(j, (vy(j) + vy(j + 1)) * cross(j))))

    area_signed = cross_sum / 2.0
    nonzero = area_signed != 0.0
    stats = F.when(
        nv >= 2,
        F.struct(
            F.abs(area_signed).alias("area"),
            perimeter.alias("perimeter"),
            F.when(nonzero, cx_sum / (6.0 * area_signed)).alias("cx"),
            F.when(nonzero, cy_sum / (6.0 * area_signed)).alias("cy"),
        ),
    )
    return geoms.withColumn("_s", stats).select(
        *id_cols,
        (F.size(ro) - 1).cast("int").alias("n_rings"),
        nv.cast("int").alias("n_vertices"),
        F.col("_s.area").alias("area"),
        F.col("_s.perimeter").alias("perimeter"),
        F.col("_s.cx").alias("cx"),
        F.col("_s.cy").alias("cy"),
    )
