"""Hilbert space-filling-curve index as chained JVM integer steps.

The engine's write-side clustering keys are the Z-order key
(functions/cells.py zorder) and range fences (operators/
partitioning.py). The Hilbert curve strictly improves on Z-order for
scan locality: consecutive Hilbert indexes are always grid neighbors
(unit steps, no Z-order "seams"), so range-reading a Hilbert-sorted
table touches spatially compact file sets — the reason Iceberg and
Delta both offer Hilbert ordering next to Z-order.

Encoding is the standard per-bit rotate/flip walk (the public-domain
xy2d algorithm as on Wikipedia's "Hilbert curve" page), expressed as
BITS chained projections — each step is a handful of CASE/bit
expressions over (x, y, d), so the Spark side is BITS narrow
whole-stage-codegen stages fused into one, and the oracle is the SAME
step template chained through CTEs. Pure integer arithmetic: `&` for
bit tests (valid in Spark AND DuckDB; `^` is XOR in Spark but POWER
in DuckDB, so the rotation quadrant is computed arithmetically:
3*rx + ry - 2*rx*ry == (3*rx) XOR ry for bits).

Scale shape: encode is a pure zero-shuffle map; sorting or
range-fencing by hd is the one shuffle any clustering write pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 10  # 1024 x 1024 grid; d in [0, 2^20)


def _d(v: float) -> str:
    return f"CAST({v!r} AS DOUBLE)"


def grid_exprs(lon: str, lat: str, bits: int) -> tuple[str, str]:
    """Clamped integer grid coords on the 2^bits lattice — the same
    floor arithmetic as the quadtree cell index (cells.py), shared
    with the oracle as text."""
    n = 1 << bits
    gx = (
        f"greatest(least(CAST(floor((({lon}) + {_d(180.0)}) / {_d(360.0)}"
        f" * {_d(float(n))}) AS BIGINT), {n - 1}), 0)"
    )
    gy = (
        f"greatest(least(CAST(floor(({_d(90.0)} - ({lat})) / {_d(180.0)}"
        f" * {_d(float(n))}) AS BIGINT), {n - 1}), 0)"
    )
    return gx, gy


def step_exprs(s: int) -> tuple[str, str, str]:
    """(x', y', d') of one Hilbert rotate/flip step at bit weight s,
    over columns x, y, d — evaluated simultaneously (x' reads y and
    y' reads x), which both a Spark withColumns and a SQL SELECT
    projection guarantee."""
    rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
    quadrant = f"(3 * {rx} + {ry} - 2 * {rx} * {ry})"
    d_next = f"(d + CAST({s} AS BIGINT) * {s} * {quadrant})"
    x_next = (
        f"(CASE WHEN {ry} = 1 THEN x"
        f" WHEN {rx} = 1 THEN {s - 1} - y ELSE y END)"
    )
    y_next = (
        f"(CASE WHEN {ry} = 1 THEN y"
        f" WHEN {rx} = 1 THEN {s - 1} - x ELSE x END)"
    )
    return x_next, y_next, d_next


def hilbert_cols(points: DataFrame, bits: int = DEFAULT_BITS,
                 lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Append (gx, gy, hd): the grid cell and its Hilbert index.
    BITS chained narrow projections, zero shuffles, no UDF."""
    gx, gy = grid_exprs(lon, lat, bits)
    df = points.withColumns({
        "gx": F.expr(gx),
        "gy": F.expr(gy),
    }).withColumns({
        "x": F.col("gx"),
        "y": F.col("gy"),
        "d": F.lit(0).cast("long"),
    })
    for level in range(bits - 1, -1, -1):
        x_next, y_next, d_next = step_exprs(1 << level)
        df = df.withColumns({
            "x": F.expr(x_next),
            "y": F.expr(y_next),
            "d": F.expr(d_next),
        })
    return df.withColumn("hd", F.col("d")).drop("x", "y", "d")


def sql_hilbert(sql_points: str, bits: int = DEFAULT_BITS,
                keep: str = "doc_id") -> str:
    """Oracle: the same step template chained through CTEs."""
    gx, gy = grid_exprs("lon", "lat", bits)
    ctes = [
        f"s AS (SELECT {keep}, {gx} AS gx, {gy} AS gy FROM pts)",
        f"h0 AS (SELECT {keep}, gx, gy, gx AS x, gy AS y,"
        f" CAST(0 AS BIGINT) AS d FROM s)",
    ]
    prev = "h0"
    for i, level in enumerate(range(bits - 1, -1, -1)):
        x_next, y_next, d_next = step_exprs(1 << level)
        cur = f"h{i + 1}"
        ctes.append(
            f"{cur} AS (SELECT {keep}, gx, gy, {x_next} AS x,"
            f" {y_next} AS y, {d_next} AS d FROM {prev})"
        )
        prev = cur
    joined = ",\n".join(ctes)
    return (
        f"WITH pts AS ({sql_points}),\n{joined}\n"
        f"SELECT {keep}, gx, gy, d AS hd FROM {prev}"
    )


def hilbert_encode(points: DataFrame, bits: int = DEFAULT_BITS,
                   id_col: str = "doc_id") -> DataFrame:
    """(id, gx, gy, hd) per point — the clustering-key view."""
    return hilbert_cols(points, bits).select(id_col, "gx", "gy", "hd")
