"""Deterministic synthetic interleaved-span corpus (BASELINE.json input_hint).

The engine's canonical input is an Iceberg-style table

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

with geometry spans carrying GeoJSON Feature JSON (the reference's SoQL
geometry value, SURVEY.md §1.2). No external data is allowed, so the
corpus is derived **deterministically, with integer arithmetic only**,
from the driver's TPC-H-ish parquet tables — which lets the DuckDB
oracle (`__spark_entry__.oracle_sql`) recompute the exact same
coordinates in pure SQL and cross-check join results value-for-value:

- document points   <- orders   (one doc per order; lon/lat hashed from o_orderkey)
- polygon layer     <- nation x 4 replicas (rectangles; poly 0 is a huge
                       hot polygon to exercise skew handling)
- kNN query probes  <- customer

All spans are built with JVM-side column expressions (concat /
format_string / transform) — zero Python in the generator.

Every formula below exists verbatim (same op order) in SQL form in
`__spark_entry__.py`; keep the two in sync.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

# Boundary offset keeping rectangle edges off the 1e-6 point-coordinate
# grid => containment decisions are tie-free and engine-independent.
EDGE_EPS = 0.00000045
N_POLY_REPLICAS = 4
KNN_K = 10


def spread_scan(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Spread a narrow base scan across the cluster before expensive
    downstream map work.

    The single-file test parquet yields 1-2 input partitions, so every
    downstream map stage — including the Arrow parse UDF — would run on
    1-2 tasks no matter how many cores (measured: the sf0.1 layer-merge
    parse ran single-threaded, 12 s vs 1.3 s wide). Repartitioning the
    NARROW base (a few MB) is one cheap shuffle that parallelizes all
    the generated/parsed work after it. No-op when the scan already has
    >= defaultParallelism partitions — a real table at 100 TB always
    does, so this never adds a shuffle at scale."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _point_lon(key):
    return ((key * F.lit(2654435761)) % 360000000) / 1000000.0 - 180.0


def _point_lat(key):
    return ((key * F.lit(1779033703) + 12345) % 170000000) / 1000000.0 - 85.0


def points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One WGS84 point per order: (doc_id, lon, lat, a_string, a_num)."""
    orders = spread_scan(spark, spark.read.parquet(f"{sf_dir}/orders.parquet"))
    k = F.col("o_orderkey")
    return orders.select(
        F.concat(F.lit("doc-"), k.cast("string")).alias("doc_id"),
        _point_lon(k).alias("lon"),
        _point_lat(k).alias("lat"),
        F.col("o_orderstatus").alias("a_string"),
        F.col("o_custkey").cast("double").alias("a_num"),
    )


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved-span documents table (the engine's canonical input).

    Span layout per doc (offsets recomputed after conditional drops):
      text('order <k> <status>'), geometry(GeoJSON Feature),
      media('media://<hash>') for even keys, text(priority) for k%3==0.
    """
    orders = spread_scan(spark, spark.read.parquet(f"{sf_dir}/orders.parquet"))
    k = F.col("o_orderkey")
    lon = _point_lon(k)
    lat = _point_lat(k)
    feature = F.concat(
        F.lit('{"type":"Feature","geometry":{"type":"Point","coordinates":['),
        lon.cast("string"),
        F.lit(","),
        lat.cast("string"),
        F.lit(']},"properties":{"a_string":"'),
        F.col("o_orderstatus"),
        F.lit('","a_num":'),
        F.col("o_custkey").cast("string"),
        F.lit("}}"),
    )
    media_ref = F.concat(
        F.lit("media://"), ((k * 1103515245 + 12345) % 4294967296).cast("string")
    )
    span = lambda kind, text, mref: F.struct(  # noqa: E731
        F.lit(kind).alias("kind"),
        text.alias("text"),
        mref.alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    null_span = F.lit(None).cast(SPAN_TYPE)
    raw = F.array(
        span("text", F.concat(F.lit("order "), k.cast("string"), F.lit(" "), F.col("o_orderstatus")), F.lit("")),
        span("geometry", feature, F.lit("")),
        F.when(k % 2 == 0, span("media", F.lit(""), media_ref)).otherwise(null_span),
        F.when(k % 3 == 0, span("text", F.col("o_orderpriority"), F.lit(""))).otherwise(null_span),
    )
    present = F.filter(raw, lambda x: x.isNotNull())
    spans = F.transform(
        present,
        lambda x, i: F.struct(
            x["kind"].alias("kind"),
            x["text"].alias("text"),
            x["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return orders.select(
        F.concat(F.lit("doc-"), k.cast("string")).alias("doc_id"), spans.alias("spans")
    )


def polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangle polygon layer: nation x replicas -> ~100 polygons.

    Columns: poly_id, layer_id, pk, minx/miny/maxx/maxy (tie-free
    bounds), geom (flat struct, closed CCW ring). pk=0 is a 200x140
    degree hot polygon (skew driver, SURVEY §4.2.2).
    """
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reps = spark.range(N_POLY_REPLICAS).select(F.col("id").cast("int").alias("rep"))
    df = nation.crossJoin(F.broadcast(reps)).select(
        (F.col("n_nationkey") * N_POLY_REPLICAS + F.col("rep")).cast("long").alias("pk"),
        F.col("n_regionkey").cast("string").alias("layer_id"),
    )
    pk = F.col("pk")
    cx = ((pk * 2654435761) % 340000000) / 1000000.0 - 170.0
    cy = ((pk * 1779033703 + 777) % 150000000) / 1000000.0 - 75.0
    w = F.when(pk == 0, F.lit(200.0)).otherwise((pk % 7).cast("double") * 3.0 + 4.0)
    h = F.when(pk == 0, F.lit(140.0)).otherwise((pk % 5).cast("double") * 3.0 + 3.0)
    minx = F.greatest(cx - w / 2.0 + EDGE_EPS, F.lit(-179.9999995))
    maxx = F.least(cx + w / 2.0 + EDGE_EPS, F.lit(179.9999995))
    miny = F.greatest(cy - h / 2.0 + EDGE_EPS, F.lit(-84.9999995))
    maxy = F.least(cy + h / 2.0 + EDGE_EPS, F.lit(84.9999995))
    df = df.select(
        F.concat(F.lit("poly-"), pk.cast("string")).alias("poly_id"),
        "layer_id",
        "pk",
        minx.alias("minx"),
        miny.alias("miny"),
        maxx.alias("maxx"),
        maxy.alias("maxy"),
    )
    geom = F.struct(
        F.lit("Polygon").alias("gtype"),
        F.array(F.lit(0), F.lit(1)).alias("part_offsets"),
        F.array(F.lit(0), F.lit(5)).alias("ring_offsets"),
        F.array("minx", "maxx", "maxx", "minx", "minx").alias("xs"),
        F.array("miny", "miny", "maxy", "maxy", "miny").alias("ys"),
    )
    return df.withColumn("geom", geom)


N_CONCAVE_REPLICAS = 2


def concave_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concave (L-shaped) polygon layer: nation x 2 -> 50 polygons.

    Each L is the union of two axis-aligned rectangles sharing the
    corner (xm, ym) — lower slab [x0,x1]x[y0,ym] plus upper-left block
    [x0,xm]x[ym,y1] (the notch is the upper-right quadrant). The ring
    is a single closed 6-vertex CCW loop, so the exact even-odd ray
    cast decides containment while the polygon's *bbox* still covers
    the notch: bbox-passing candidates in the notch MUST be rejected
    by the ray cast, which is exactly what the DuckDB
    union-of-two-rectangles oracle verifies end-to-end (VERDICT r2 #2;
    the reference-grade exactness claim of tests/test_kernels.py).

    Every bound carries the same EDGE_EPS off-grid offset as the
    rectangle layer, and xm/ym are computed as cx + EDGE_EPS /
    cy + EDGE_EPS in BOTH engines (never x0 + w/2 — different
    rounding), so containment is tie-free and bit-identical.
    """
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reps = spark.range(N_CONCAVE_REPLICAS).select(F.col("id").cast("int").alias("rep"))
    df = nation.crossJoin(F.broadcast(reps)).select(
        (F.col("n_nationkey") * N_CONCAVE_REPLICAS + F.col("rep"))
        .cast("long")
        .alias("pk")
    )
    pk = F.col("pk")
    cx = ((pk * 2654435761 + 101) % 300000000) / 1000000.0 - 150.0
    cy = ((pk * 1779033703 + 555) % 120000000) / 1000000.0 - 60.0
    w = (pk % 7).cast("double") * 3.0 + 6.0
    h = (pk % 5).cast("double") * 3.0 + 5.0
    df = df.select(
        F.concat(F.lit("lpoly-"), pk.cast("string")).alias("poly_id"),
        (cx - w / 2.0 + EDGE_EPS).alias("x0"),
        (cy - h / 2.0 + EDGE_EPS).alias("y0"),
        (cx + w / 2.0 + EDGE_EPS).alias("x1"),
        (cy + h / 2.0 + EDGE_EPS).alias("y1"),
        (cx + EDGE_EPS).alias("xm"),
        (cy + EDGE_EPS).alias("ym"),
    )
    geom = F.struct(
        F.lit("Polygon").alias("gtype"),
        F.array(F.lit(0), F.lit(1)).alias("part_offsets"),
        F.array(F.lit(0), F.lit(7)).alias("ring_offsets"),
        F.array("x0", "x1", "x1", "xm", "xm", "x0", "x0").alias("xs"),
        F.array("y0", "y0", "ym", "ym", "y1", "y1", "y0").alias("ys"),
    )
    return df.withColumn("geom", geom)


N_HOLED_REPLICAS = 2


def holed_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holed polygon layer: nation x 2 -> 50 rectangles each with a
    centered rectangular HOLE (half the width/height). Containment
    under the even-odd ray cast is `inside outer AND NOT inside
    inner`, which is exactly what the DuckDB oracle states — so this
    layer gives the multi-ring path of the PIP kernel a hash-checked
    end-to-end CORRECTNESS row (the ray cast must reject bbox-passing
    candidates that fall in the hole).

    geom: ring_offsets [0, 5, 10] — shell (CCW) then hole (CW, the
    conventional winding; the even-odd verdict is orientation-free).
    All bounds ride the EDGE_EPS off-grid lattice (tie-free).
    """
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reps = spark.range(N_HOLED_REPLICAS).select(
        F.col("id").cast("int").alias("rep")
    )
    df = nation.crossJoin(F.broadcast(reps)).select(
        (F.col("n_nationkey") * N_HOLED_REPLICAS + F.col("rep"))
        .cast("long")
        .alias("pk")
    )
    pk = F.col("pk")
    cx = ((pk * 2654435761 + 707) % 300000000) / 1000000.0 - 150.0
    cy = ((pk * 1779033703 + 313) % 120000000) / 1000000.0 - 60.0
    w = (pk % 7).cast("double") * 3.0 + 8.0
    h = (pk % 5).cast("double") * 3.0 + 6.0
    df = df.select(
        F.concat(F.lit("hpoly-"), pk.cast("string")).alias("poly_id"),
        pk,
        (cx - w / 2.0 + EDGE_EPS).alias("x0"),
        (cy - h / 2.0 + EDGE_EPS).alias("y0"),
        (cx + w / 2.0 + EDGE_EPS).alias("x1"),
        (cy + h / 2.0 + EDGE_EPS).alias("y1"),
        (cx - w / 4.0 + EDGE_EPS).alias("ix0"),
        (cy - h / 4.0 + EDGE_EPS).alias("iy0"),
        (cx + w / 4.0 + EDGE_EPS).alias("ix1"),
        (cy + h / 4.0 + EDGE_EPS).alias("iy1"),
    )
    x0, y0, x1, y1 = (F.col(c) for c in ("x0", "y0", "x1", "y1"))
    ix0, iy0, ix1, iy1 = (F.col(c) for c in ("ix0", "iy0", "ix1", "iy1"))
    geom = F.struct(
        F.lit("Polygon").alias("gtype"),
        F.array(F.lit(0), F.lit(1)).alias("part_offsets"),
        F.array(F.lit(0), F.lit(5), F.lit(10)).alias("ring_offsets"),
        F.array(x0, x1, x1, x0, x0, ix0, ix0, ix1, ix1, ix0).alias("xs"),
        F.array(y0, y0, y1, y1, y0, iy0, iy1, iy1, iy0, iy0).alias("ys"),
    )
    return df.withColumn("geom", geom)


SQL_HOLED_POLYGONS = f"""
WITH pkt AS (
  SELECT (n_nationkey * {N_HOLED_REPLICAS} + rep) AS pk
  FROM nation CROSS JOIN (SELECT UNNEST(range({N_HOLED_REPLICAS})) AS rep)
), geo AS (
  SELECT pk,
         ((pk * 2654435761 + 707) % 300000000) / 1000000.0 - 150.0 AS cx,
         ((pk * 1779033703 + 313) % 120000000) / 1000000.0 - 60.0 AS cy,
         CAST(pk % 7 AS DOUBLE) * 3.0 + 8.0 AS w,
         CAST(pk % 5 AS DOUBLE) * 3.0 + 6.0 AS h
  FROM pkt
)
SELECT 'hpoly-' || CAST(pk AS VARCHAR) AS poly_id,
       cx - w / 2.0 + {EDGE_EPS} AS x0,
       cy - h / 2.0 + {EDGE_EPS} AS y0,
       cx + w / 2.0 + {EDGE_EPS} AS x1,
       cy + h / 2.0 + {EDGE_EPS} AS y1,
       cx - w / 4.0 + {EDGE_EPS} AS ix0,
       cy - h / 4.0 + {EDGE_EPS} AS iy0,
       cx + w / 4.0 + {EDGE_EPS} AS ix1,
       cy + h / 4.0 + {EDGE_EPS} AS iy1
FROM geo
"""


N_MULTIPART_REPLICAS = 2


def multipart_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultiPolygon layer: nation x 2 -> 50 two-part geometries, each
    two DISJOINT rectangles (the second translated right of the first
    by a gap wider than either part). Containment under the even-odd
    ray cast is `inside part A OR inside part B`, which is exactly the
    DuckDB oracle — this gives `part_offsets > 1` its hash-checked
    end-to-end CORRECTNESS row (holed covers multi-RING; this covers
    multi-PART).

    geom: part_offsets [0, 1, 2], ring_offsets [0, 5, 10] — one shell
    per part. All bounds ride the EDGE_EPS off-grid lattice.
    """
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reps = spark.range(N_MULTIPART_REPLICAS).select(
        F.col("id").cast("int").alias("rep")
    )
    df = nation.crossJoin(F.broadcast(reps)).select(
        (F.col("n_nationkey") * N_MULTIPART_REPLICAS + F.col("rep"))
        .cast("long")
        .alias("pk")
    )
    pk = F.col("pk")
    cx = ((pk * 2246822519 + 101) % 240000000) / 1000000.0 - 120.0
    cy = ((pk * 3266489917 + 211) % 100000000) / 1000000.0 - 50.0
    w = (pk % 6).cast("double") * 2.0 + 6.0
    h = (pk % 4).cast("double") * 2.0 + 5.0
    # part B sits 2*w to the right: a gap of w between the parts, so
    # interiors are disjoint and no point can be in both.
    df = df.select(
        F.concat(F.lit("mpoly-"), pk.cast("string")).alias("poly_id"),
        pk,
        (cx - w / 2.0 + EDGE_EPS).alias("ax0"),
        (cy - h / 2.0 + EDGE_EPS).alias("ay0"),
        (cx + w / 2.0 + EDGE_EPS).alias("ax1"),
        (cy + h / 2.0 + EDGE_EPS).alias("ay1"),
        (cx + w * 1.5 + EDGE_EPS).alias("bx0"),
        (cy - h / 2.0 + EDGE_EPS).alias("by0"),
        (cx + w * 2.5 + EDGE_EPS).alias("bx1"),
        (cy + h / 2.0 + EDGE_EPS).alias("by1"),
    )
    ax0, ay0, ax1, ay1 = (F.col(c) for c in ("ax0", "ay0", "ax1", "ay1"))
    bx0, by0, bx1, by1 = (F.col(c) for c in ("bx0", "by0", "bx1", "by1"))
    geom = F.struct(
        F.lit("MultiPolygon").alias("gtype"),
        F.array(F.lit(0), F.lit(1), F.lit(2)).alias("part_offsets"),
        F.array(F.lit(0), F.lit(5), F.lit(10)).alias("ring_offsets"),
        F.array(ax0, ax1, ax1, ax0, ax0, bx0, bx1, bx1, bx0, bx0).alias("xs"),
        F.array(ay0, ay0, ay1, ay1, ay0, by0, by0, by1, by1, by0).alias("ys"),
    )
    return df.withColumn("geom", geom)


SQL_MULTIPART_POLYGONS = f"""
WITH pkt AS (
  SELECT (n_nationkey * {N_MULTIPART_REPLICAS} + rep) AS pk
  FROM nation CROSS JOIN (SELECT UNNEST(range({N_MULTIPART_REPLICAS})) AS rep)
), geo AS (
  SELECT pk,
         ((pk * 2246822519 + 101) % 240000000) / 1000000.0 - 120.0 AS cx,
         ((pk * 3266489917 + 211) % 100000000) / 1000000.0 - 50.0 AS cy,
         CAST(pk % 6 AS DOUBLE) * 2.0 + 6.0 AS w,
         CAST(pk % 4 AS DOUBLE) * 2.0 + 5.0 AS h
  FROM pkt
)
SELECT 'mpoly-' || CAST(pk AS VARCHAR) AS poly_id,
       cx - w / 2.0 + {EDGE_EPS} AS ax0,
       cy - h / 2.0 + {EDGE_EPS} AS ay0,
       cx + w / 2.0 + {EDGE_EPS} AS ax1,
       cy + h / 2.0 + {EDGE_EPS} AS ay1,
       cx + w * 1.5 + {EDGE_EPS} AS bx0,
       cy - h / 2.0 + {EDGE_EPS} AS by0,
       cx + w * 2.5 + {EDGE_EPS} AS bx1,
       cy + h / 2.0 + {EDGE_EPS} AS by1
FROM geo
"""


N_VALIDATION_REPLICAS = 4


def validation_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ring-validation layer: nation x 4 -> 100 single-ring polygons,
    a deterministic mix of shapes for the geometry-validation
    operators (operators/validation.py):

    - pk % 3 == 0: BOWTIE — the rectangle's four corners in crossing
      order, so two non-adjacent edges properly intersect (invalid)
      and the signed shoelace area is exactly 0 (the two triangles
      cancel in integer arithmetic).
    - else, pk % 5 == 0: the rectangle ring REVERSED (clockwise) —
      valid but CW-oriented.
    - else: the plain CCW rectangle (valid).
    Half the non-reversed rings (pk % 2 == 0) carry a collinear
    midpoint vertex on the bottom edge, so ring sizes vary (5 vs 6
    vertices) and the operators can't hardcode quad geometry.

    Corners ride the same EDGE_EPS off-grid lattice as the other
    layers, so round(x*1e6) is tie-free in both engines.
    """
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reps = spark.range(N_VALIDATION_REPLICAS).select(
        F.col("id").cast("int").alias("rep")
    )
    df = nation.crossJoin(F.broadcast(reps)).select(
        (F.col("n_nationkey") * N_VALIDATION_REPLICAS + F.col("rep"))
        .cast("long")
        .alias("pk")
    )
    pk = F.col("pk")
    cx = ((pk * 2654435761 + 303) % 320000000) / 1000000.0 - 160.0
    cy = ((pk * 1779033703 + 999) % 140000000) / 1000000.0 - 70.0
    w = (pk % 7).cast("double") * 2.0 + 5.0
    h = (pk % 5).cast("double") * 2.0 + 4.0
    df = df.select(
        F.concat(F.lit("vpoly-"), pk.cast("string")).alias("poly_id"),
        "pk",
        (cx - w / 2.0 + EDGE_EPS).alias("x0"),
        (cy - h / 2.0 + EDGE_EPS).alias("y0"),
        (cx + w / 2.0 + EDGE_EPS).alias("x1"),
        (cy + h / 2.0 + EDGE_EPS).alias("y1"),
        (cx + EDGE_EPS).alias("xm"),
    )
    bowtie = pk % 3 == 0
    rev = (pk % 3 != 0) & (pk % 5 == 0)
    mid = pk % 2 == 0
    x0, y0, x1, y1, xm = (F.col(c) for c in ("x0", "y0", "x1", "y1", "xm"))
    xs = (
        F.when(bowtie & mid, F.array(x0, xm, x1, x0, x1, x0))
        .when(bowtie, F.array(x0, x1, x0, x1, x0))
        .when(rev, F.array(x0, x0, x1, x1, x0))
        .when(mid, F.array(x0, xm, x1, x1, x0, x0))
        .otherwise(F.array(x0, x1, x1, x0, x0))
    )
    ys = (
        F.when(bowtie & mid, F.array(y0, y0, y0, y1, y1, y0))
        .when(bowtie, F.array(y0, y0, y1, y1, y0))
        .when(rev, F.array(y0, y1, y1, y0, y0))
        .when(mid, F.array(y0, y0, y0, y1, y1, y0))
        .otherwise(F.array(y0, y0, y1, y1, y0))
    )
    geom = F.struct(
        F.lit("Polygon").alias("gtype"),
        F.array(F.lit(0), F.lit(1)).alias("part_offsets"),
        F.array(F.lit(0), F.size(xs)).alias("ring_offsets"),
        xs.alias("xs"),
        ys.alias("ys"),
    )
    return df.select("poly_id", "pk", geom.alias("geom"))


def knn_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN probes from customer: (query_id, qlon, qlat, k)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    c = F.col("c_custkey")
    return cust.select(
        F.concat(F.lit("q-"), c.cast("string")).alias("query_id"),
        (((c * 2654435761 + 11) % 360000000) / 1000000.0 - 180.0).alias("qlon"),
        (((c * 1779033703 + 7) % 170000000) / 1000000.0 - 85.0).alias("qlat"),
        F.lit(KNN_K).alias("k"),
    )


# --- SQL mirrors (DuckDB oracle building blocks; keep in sync above) ---

SQL_POINTS = """
SELECT 'doc-' || CAST(o_orderkey AS VARCHAR) AS doc_id,
       ((o_orderkey * 2654435761) % 360000000) / 1000000.0 - 180.0 AS lon,
       ((o_orderkey * 1779033703 + 12345) % 170000000) / 1000000.0 - 85.0 AS lat,
       o_orderstatus AS a_string,
       CAST(o_custkey AS DOUBLE) AS a_num
FROM orders
"""

SQL_POLYGONS = f"""
WITH pkt AS (
  SELECT (n_nationkey * {N_POLY_REPLICAS} + rep) AS pk,
         CAST(n_regionkey AS VARCHAR) AS layer_id
  FROM nation CROSS JOIN (SELECT UNNEST(range({N_POLY_REPLICAS})) AS rep)
), geo AS (
  SELECT pk, layer_id,
         ((pk * 2654435761) % 340000000) / 1000000.0 - 170.0 AS cx,
         ((pk * 1779033703 + 777) % 150000000) / 1000000.0 - 75.0 AS cy,
         CASE WHEN pk = 0 THEN 200.0 ELSE CAST(pk % 7 AS DOUBLE) * 3.0 + 4.0 END AS w,
         CASE WHEN pk = 0 THEN 140.0 ELSE CAST(pk % 5 AS DOUBLE) * 3.0 + 3.0 END AS h
  FROM pkt
)
SELECT 'poly-' || CAST(pk AS VARCHAR) AS poly_id, layer_id, pk,
       GREATEST(cx - w / 2.0 + {EDGE_EPS}, -179.9999995) AS minx,
       GREATEST(cy - h / 2.0 + {EDGE_EPS}, -84.9999995) AS miny,
       LEAST(cx + w / 2.0 + {EDGE_EPS}, 179.9999995) AS maxx,
       LEAST(cy + h / 2.0 + {EDGE_EPS}, 84.9999995) AS maxy
FROM geo
"""

SQL_CONCAVE_POLYGONS = f"""
WITH pkt AS (
  SELECT (n_nationkey * {N_CONCAVE_REPLICAS} + rep) AS pk
  FROM nation CROSS JOIN (SELECT UNNEST(range({N_CONCAVE_REPLICAS})) AS rep)
), geo AS (
  SELECT pk,
         ((pk * 2654435761 + 101) % 300000000) / 1000000.0 - 150.0 AS cx,
         ((pk * 1779033703 + 555) % 120000000) / 1000000.0 - 60.0 AS cy,
         CAST(pk % 7 AS DOUBLE) * 3.0 + 6.0 AS w,
         CAST(pk % 5 AS DOUBLE) * 3.0 + 5.0 AS h
  FROM pkt
)
SELECT 'lpoly-' || CAST(pk AS VARCHAR) AS poly_id,
       cx - w / 2.0 + {EDGE_EPS} AS x0,
       cy - h / 2.0 + {EDGE_EPS} AS y0,
       cx + w / 2.0 + {EDGE_EPS} AS x1,
       cy + h / 2.0 + {EDGE_EPS} AS y1,
       cx + {EDGE_EPS} AS xm,
       cy + {EDGE_EPS} AS ym
FROM geo
"""

# Per-VERTEX rows of the validation layer (poly_id, j, vx, vy, n_v) —
# the oracle's view of validation_polygons' rings. The vertex lists
# are the SAME five CASE branches as the Spark arrays above, indexed
# 1-based by DuckDB list subscripting; downstream oracles derive
# edges with lead() and never see the generator's validity flags.
SQL_VALIDATION_VERTICES = f"""
WITH pkt AS (
  SELECT (n_nationkey * {N_VALIDATION_REPLICAS} + rep) AS pk
  FROM nation CROSS JOIN (SELECT UNNEST(range({N_VALIDATION_REPLICAS})) AS rep)
), geo AS (
  SELECT pk,
         ((pk * 2654435761 + 303) % 320000000) / 1000000.0 - 160.0 AS cx,
         ((pk * 1779033703 + 999) % 140000000) / 1000000.0 - 70.0 AS cy,
         CAST(pk % 7 AS DOUBLE) * 2.0 + 5.0 AS w,
         CAST(pk % 5 AS DOUBLE) * 2.0 + 4.0 AS h,
         (pk % 3 = 0) AS bowtie,
         (pk % 3 <> 0 AND pk % 5 = 0) AS rev,
         (pk % 2 = 0) AS mid
  FROM pkt
), corner AS (
  SELECT pk, bowtie, rev, mid,
         cx - w / 2.0 + {EDGE_EPS} AS x0,
         cy - h / 2.0 + {EDGE_EPS} AS y0,
         cx + w / 2.0 + {EDGE_EPS} AS x1,
         cy + h / 2.0 + {EDGE_EPS} AS y1,
         cx + {EDGE_EPS} AS xm
  FROM geo
), rings AS (
  SELECT pk,
         CASE WHEN bowtie AND mid THEN [x0, xm, x1, x0, x1, x0]
              WHEN bowtie THEN [x0, x1, x0, x1, x0]
              WHEN rev THEN [x0, x0, x1, x1, x0]
              WHEN mid THEN [x0, xm, x1, x1, x0, x0]
              ELSE [x0, x1, x1, x0, x0] END AS xs,
         CASE WHEN bowtie AND mid THEN [y0, y0, y0, y1, y1, y0]
              WHEN bowtie THEN [y0, y0, y1, y1, y0]
              WHEN rev THEN [y0, y1, y1, y0, y0]
              WHEN mid THEN [y0, y0, y0, y1, y1, y0]
              ELSE [y0, y0, y1, y1, y0] END AS ys
  FROM corner
)
SELECT 'vpoly-' || CAST(pk AS VARCHAR) AS poly_id,
       j, xs[j + 1] AS vx, ys[j + 1] AS vy, len(xs) AS n_v
FROM rings CROSS JOIN (SELECT UNNEST(range(6)) AS j)
WHERE j < len(xs)
"""

# --- dirty text corpus (for the composed curation filter) ----------------------
# The driver's documents table is all-clean (no exact dups, no quality
# failures), so the end-to-end curation verdict needs a corpus with
# injected defects. Each defect class is a deterministic CASE branch
# on doc_id (priority order matters and is identical in SQL).

DIRTY_DUP_TEXT = "boilerplate navigation footer copyright contact about"


def dirty_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text) with ~14% exact dups (constant boilerplate),
    ~9% too-short, ~6% gibberish, ~8% repetitive docs injected."""
    docs = spread_scan(
        spark, spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    k = F.col("doc_id")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    text = (
        F.when(k % 7 == 3, F.lit(DIRTY_DUP_TEXT))
        .when(k % 11 == 0, F.array_join(F.slice(toks, 1, 2), " "))
        .when(k % 17 == 5, F.concat_ws(
            " ", *[F.repeat(F.lit("x"), 40) for _ in range(6)],
            k.cast("string")))
        .when(k % 13 == 0, F.concat_ws(
            " ", F.array_join(F.array_repeat(F.lit("badger"), 40), " "),
            k.cast("string")))
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", text.alias("text"))


SQL_DIRTY_DOCUMENTS = f"""
SELECT doc_id,
       CASE
         WHEN doc_id % 7 = 3 THEN '{DIRTY_DUP_TEXT}'
         WHEN doc_id % 11 = 0 THEN array_to_string(
           list_filter(regexp_split_to_array(lower(text), '\\s+'),
                       t -> t <> '')[1:2], ' ')
         WHEN doc_id % 17 = 5 THEN array_to_string(
           list_transform(range(6), i -> repeat('x', 40)), ' ')
           || ' ' || CAST(doc_id AS VARCHAR)
         WHEN doc_id % 13 = 0 THEN array_to_string(
           list_transform(range(40), i -> 'badger'), ' ')
           || ' ' || CAST(doc_id AS VARCHAR)
         ELSE text
       END AS text
FROM documents
"""


# --- line-segment layers (exact integer micro-degrees) -------------------------
# Both layers live in one SEG_BOX x SEG_BOX micro-degree window so
# segment crossings actually occur at test SF; every coordinate is
# BIGINT arithmetic end-to-end (no doubles anywhere), making the
# intersection predicate decidable exactly in both engines.

SEG_BOX = 800_000  # 0.8 degrees in micro-degrees (dense enough for
# crossings at the smallest test SF)
SEG_DHALF = 49_995  # |dx|,|dy| < 2*SEG_DHALF + 2 << linejoin.SEG_GRID


def _segments(base: DataFrame, key, tag: str, s1: int, s2: int, s3: int,
              s4: int) -> DataFrame:
    k = key.cast("long")
    x1 = (k * 2654435761 + s1) % SEG_BOX
    y1 = (k * 1779033703 + s2) % SEG_BOX
    # dx odd => never 0 => no degenerate (point) segments
    dx = ((k * 2246822519 + s3) % (2 * SEG_DHALF + 1) - SEG_DHALF) * 2 + 1
    dy = ((k * 3266489917 + s4) % (2 * SEG_DHALF + 1) - SEG_DHALF) * 2
    return base.select(
        F.concat(F.lit(tag), k.cast("string")).alias("line_id"),
        x1.alias("x1"),
        y1.alias("y1"),
        (x1 + dx).alias("x2"),
        (y1 + dy).alias("y2"),
    )


def line_segments_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line layer A <- supplier: (line_id, x1, y1, x2, y2) bigint micro-deg."""
    sup = spread_scan(spark, spark.read.parquet(f"{sf_dir}/supplier.parquet"))
    return _segments(sup, F.col("s_suppkey"), "la-", 17, 23, 5, 3)


def line_segments_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line layer B <- customer: (line_id, x1, y1, x2, y2) bigint micro-deg."""
    cust = spread_scan(spark, spark.read.parquet(f"{sf_dir}/customer.parquet"))
    return _segments(cust, F.col("c_custkey"), "lb-", 41, 53, 11, 13)


def _sql_segments(table: str, key: str, tag: str, s1: int, s2: int, s3: int,
                  s4: int) -> str:
    m = 2 * SEG_DHALF + 1
    return f"""
SELECT '{tag}' || CAST({key} AS VARCHAR) AS line_id,
       ({key} * 2654435761 + {s1}) % {SEG_BOX} AS x1,
       ({key} * 1779033703 + {s2}) % {SEG_BOX} AS y1,
       ({key} * 2654435761 + {s1}) % {SEG_BOX}
         + (({key} * 2246822519 + {s3}) % {m} - {SEG_DHALF}) * 2 + 1 AS x2,
       ({key} * 1779033703 + {s2}) % {SEG_BOX}
         + (({key} * 3266489917 + {s4}) % {m} - {SEG_DHALF}) * 2 AS y2
FROM {table}
"""


SQL_SEGMENTS_A = _sql_segments("supplier", "s_suppkey", "la-", 17, 23, 5, 3)
SQL_SEGMENTS_B = _sql_segments("customer", "c_custkey", "lb-", 41, 53, 11, 13)


SQL_KNN_QUERIES = """
SELECT 'q-' || CAST(c_custkey AS VARCHAR) AS query_id,
       ((c_custkey * 2654435761 + 11) % 360000000) / 1000000.0 - 180.0 AS qlon,
       ((c_custkey * 1779033703 + 7) % 170000000) / 1000000.0 - 85.0 AS qlat
FROM customer
"""


def mixed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-schema geometry corpus for the layer-merge operator:
    4 property schemas cycled by o_orderkey % 4 —
      r=1: {a_string, a_num, extra}   r=2: {b_string}
      r=3: {a_string, a_num: null}    r=0: {a_string, a_num}
    The r=3 null-typed rows land in the same layer as r=0 via the
    null-wildcard match + refinement (layer.js:135-154, 214-236).
    """
    orders = spread_scan(spark, spark.read.parquet(f"{sf_dir}/orders.parquet"))
    k = F.col("o_orderkey")
    lon = _point_lon(k)
    lat = _point_lat(k)
    r = k % 4
    props = (
        F.when(r == 1, F.concat(
            F.lit('{"a_string":"'), F.col("o_orderstatus"),
            F.lit('","a_num":'), F.col("o_custkey").cast("string"),
            F.lit(',"extra":'), (F.col("o_custkey") + 1).cast("string"), F.lit("}")))
        .when(r == 2, F.concat(
            F.lit('{"b_string":"'), F.col("o_orderpriority"), F.lit('"}')))
        .when(r == 3, F.concat(
            F.lit('{"a_string":"'), F.col("o_orderstatus"),
            F.lit('","a_num":null}')))
        .otherwise(F.concat(
            F.lit('{"a_string":"'), F.col("o_orderstatus"),
            F.lit('","a_num":'), F.col("o_custkey").cast("string"), F.lit("}")))
    )
    feature = F.concat(
        F.lit('{"type":"Feature","geometry":{"type":"Point","coordinates":['),
        lon.cast("string"), F.lit(","), lat.cast("string"),
        F.lit(']},"properties":'), props, F.lit("}"),
    )
    spans = F.array(
        F.struct(
            F.lit("geometry").alias("kind"), feature.alias("text"),
            F.lit("").alias("media_ref"), F.lit(0).alias("offset"),
        )
    )
    return orders.select(
        F.concat(F.lit("doc-"), k.cast("string")).alias("doc_id"), spans.alias("spans")
    )


def mercator_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometry corpus in EPSG:3857 meters (per-feature crs tag) for
    the reprojection operator — Web-Mercator inverse is closed-form,
    so the DuckDB oracle recomputes WGS84 output exactly."""
    orders = spread_scan(spark, spark.read.parquet(f"{sf_dir}/orders.parquet"))
    k = F.col("o_orderkey")
    mx = ((k * 2654435761) % 35990000000) / 1000.0 - 17995000.0
    my = ((k * 1779033703 + 999) % 39970000000) / 1000.0 - 19985000.0
    feature = F.concat(
        F.lit('{"type":"Feature","geometry":{"type":"Point","coordinates":['),
        mx.cast("string"), F.lit(","), my.cast("string"),
        F.lit(']},"properties":{"a_string":"'), F.col("o_orderstatus"),
        F.lit('"},"crs":{"type":"name","properties":{"name":"EPSG:3857"}}}'),
    )
    spans = F.array(
        F.struct(
            F.lit("geometry").alias("kind"), feature.alias("text"),
            F.lit("").alias("media_ref"), F.lit(0).alias("offset"),
        )
    )
    return orders.select(
        F.concat(F.lit("doc-"), k.cast("string")).alias("doc_id"), spans.alias("spans")
    )


SQL_LAYER_LABELS = """
SELECT 'doc-' || CAST(o_orderkey AS VARCHAR) AS doc_id,
       CASE o_orderkey % 4
         WHEN 1 THEN 'a_string,a_num,extra'
         WHEN 2 THEN 'b_string'
         ELSE 'a_string,a_num' END AS layer_label
FROM orders
"""

SQL_LAYER_NORM = """
SELECT 'doc-' || CAST(o_orderkey AS VARCHAR) AS doc_id,
       o_orderstatus AS a_string,
       CASE WHEN o_orderkey % 4 = 3 THEN NULL
            ELSE CAST(o_custkey AS DOUBLE) END AS a_num
FROM orders WHERE o_orderkey % 4 IN (0, 3)
"""

# Verbatim .prj WKT of the reference's EPSG:2834 fixture
# (es6-test/fixtures/simple_points_epsg_2834.zip) — drives the WKT
# parse path end-to-end in the driver gate.
LCC_WKT = (
    'PROJCS["NAD83_HARN_Ohio_North",GEOGCS["GCS_NAD83(HARN)",'
    'DATUM["D_North_American_1983_HARN",SPHEROID["GRS_1980",6378137,298.257222101]],'
    'PRIMEM["Greenwich",0],UNIT["Degree",0.017453292519943295]],'
    'PROJECTION["Lambert_Conformal_Conic"],'
    'PARAMETER["standard_parallel_1",41.7],'
    'PARAMETER["standard_parallel_2",40.43333333333333],'
    'PARAMETER["latitude_of_origin",39.66666666666666],'
    'PARAMETER["central_meridian",-82.5],'
    'PARAMETER["false_easting",600000],'
    'PARAMETER["false_northing",0],UNIT["Meter",1]]'
)

# A projection the registry rejects (reference srs would parse it; the
# engine routes it to the error side-channel) — exercises VERDICT r4 #1.
BOGUS_WKT = (
    'PROJCS["S-JTSK_Krovak",GEOGCS["GCS_S_JTSK",DATUM["D_S_JTSK",'
    'SPHEROID["Bessel_1841",6377397.155,299.1528128]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
    'PROJECTION["Krovak"],PARAMETER["False_Easting",0.0],UNIT["Meter",1.0]]'
)

# Snyder FORWARD lcc constants for EPSG:2834, precomputed as literals
# from the proj4 params the reference test pins (e, n, a*F, rho0) —
# hardcoded so the generator shares NO code with the engine's inverse.
_LCC_E = 0.08181919104281579
_LCC_N = 0.6569503123409683
_LCC_AF = 12260321.366982508
_LCC_RHO0 = 7485451.598330295


def lcc_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometry corpus projected with FORWARD Lambert Conformal Conic
    (EPSG:2834, Ohio North) carried as raw .prj WKT per feature; every
    7th doc instead carries an unsupported Krovak WKT. The lon/lat
    lattice steps 100 microdegrees with a +17/+43 offset, so the
    quantized floor(deg*1e4) sits 0.17 from the rounding boundary —
    the engine's forward+inverse residual (~1e-8 quanta) can never
    flip it, keeping the hash exact without mirroring the iterative
    inverse in SQL."""
    import json as _json

    orders = spread_scan(spark, spark.read.parquet(f"{sf_dir}/orders.parquet"))
    k = F.col("o_orderkey")
    lon = F.lit(-84.5) + ((k * 2654435761) % 40000) * 100 / 1000000.0 + F.lit(17e-6)
    lat = F.lit(38.6) + ((k * 1779033703 + 999) % 38000) * 100 / 1000000.0 + F.lit(43e-6)
    phi = F.radians(lat)
    esin = F.lit(_LCC_E) * F.sin(phi)
    ts = F.tan(F.lit(math.pi / 4.0) - phi / 2.0) / F.pow(
        (F.lit(1.0) - esin) / (F.lit(1.0) + esin), F.lit(_LCC_E / 2.0)
    )
    rho = F.lit(_LCC_AF) * F.pow(ts, F.lit(_LCC_N))
    th = F.lit(_LCC_N) * (F.radians(lon) - F.lit(math.radians(-82.5)))
    x = F.lit(600000.0) + rho * F.sin(th)
    y = F.lit(_LCC_RHO0) - rho * F.cos(th)
    bogus = (k % 7) == 0
    coords = F.concat(
        F.when(bogus, F.lit("5000.0")).otherwise(x.cast("string")),
        F.lit(","),
        F.when(bogus, F.lit("5000.0")).otherwise(y.cast("string")),
    )
    crs_json = F.when(bogus, F.lit(_json.dumps(BOGUS_WKT))).otherwise(
        F.lit(_json.dumps(LCC_WKT))
    )
    feature = F.concat(
        F.lit('{"type":"Feature","geometry":{"type":"Point","coordinates":['),
        coords,
        F.lit(']},"properties":{},"crs":{"type":"name","properties":{"name":'),
        crs_json,
        F.lit("}}}"),
    )
    spans = F.array(
        F.struct(
            F.lit("geometry").alias("kind"), feature.alias("text"),
            F.lit("").alias("media_ref"), F.lit(0).alias("offset"),
        )
    )
    return orders.select(
        F.concat(F.lit("doc-"), k.cast("string")).alias("doc_id"), spans.alias("spans")
    )


SQL_REPROJECT_LCC = """
SELECT 'doc-' || CAST(o_orderkey AS VARCHAR) AS doc_id,
       CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE
         CAST(FLOOR((-84.5 + ((o_orderkey * 2654435761) % 40000) * 100
                     / 1000000.0 + 0.000017) * 10000) AS BIGINT) END AS lon_q,
       CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE
         CAST(FLOOR((38.6 + ((o_orderkey * 1779033703 + 999) % 38000) * 100
                     / 1000000.0 + 0.000043) * 10000) AS BIGINT) END AS lat_q,
       CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END AS reproj_err
FROM orders
"""


SQL_REPROJECT_3857 = """
SELECT 'doc-' || CAST(o_orderkey AS VARCHAR) AS doc_id,
       degrees((((o_orderkey * 2654435761) % 35990000000) / 1000.0 - 17995000.0)
               / 6378137.0) AS lon,
       degrees(2.0 * atan(exp((((o_orderkey * 1779033703 + 999) % 39970000000)
               / 1000.0 - 19985000.0) / 6378137.0)) - pi() / 2.0) AS lat
FROM orders
"""
