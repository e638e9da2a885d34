"""Geohash encoding (public spec: Niemeyer base32 interleaved lat/lon)
as pure JVM column expressions — no UDF, no loop, no Python.

The classic interval-halving loop is re-expressed in closed form:
quantize lon/lat to the top `ceil(n/2)` / `floor(n/2)` bits of their
normalized fraction (floor((lon+180)/360 * 2^L) — one double multiply
whose expression tree the DuckDB mirror repeats verbatim, so the floor
is engine-identical), interleave the two bit strings (lon first, per
spec) with a sum over bit positions, then slice 5-bit groups into the
base32 alphabet. Everything after the one double multiply is exact
integer arithmetic; precision 9 = 45 bits fits comfortably in int64.

Verified against the standard public test vectors
(e.g. (57.64911, 10.40744) -> u4pruydqq).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
GEOHASH_PRECISION = 9  # chars; 45 bits


def geohash_col(lon: Column, lat: Column,
                precision: int = GEOHASH_PRECISION) -> Column:
    """Base32 geohash of (lon, lat) at `precision` chars."""
    n = 5 * precision
    lon_bits = (n + 1) // 2  # lon leads the interleave
    lat_bits = n // 2
    # edge clamp: lon=180 / lat=90 would quantize to 2^L; clamp to max
    lon_q = F.least(
        F.floor((lon + 180.0) / 360.0 * float(1 << lon_bits)).cast("long"),
        F.lit((1 << lon_bits) - 1),
    )
    lat_q = F.least(
        F.floor((lat + 90.0) / 180.0 * float(1 << lat_bits)).cast("long"),
        F.lit((1 << lat_bits) - 1),
    )
    # interleave: even global bit positions (0-based from the MSB) take
    # lon bits, odd take lat bits
    terms = []
    for i in range(lon_bits):
        terms.append(
            F.shiftleft(
                F.shiftright(lon_q, lon_bits - 1 - i).bitwiseAND(F.lit(1)),
                n - 1 - 2 * i,
            )
        )
    for i in range(lat_bits):
        terms.append(
            F.shiftleft(
                F.shiftright(lat_q, lat_bits - 1 - i).bitwiseAND(F.lit(1)),
                n - 2 - 2 * i,
            )
        )
    gh = terms[0]
    for t in terms[1:]:
        gh = gh + t
    chars = [
        F.substring(
            F.lit(GEOHASH_BASE32),
            (F.shiftright(gh, 5 * (precision - 1 - j)).bitwiseAND(F.lit(31))
             + 1).cast("int"),
            1,
        )
        for j in range(precision)
    ]
    return F.concat(*chars)


def sql_geohash(lon: str, lat: str,
                precision: int = GEOHASH_PRECISION) -> str:
    """The identical computation as DuckDB SQL text."""
    n = 5 * precision
    lon_bits = (n + 1) // 2
    lat_bits = n // 2
    lon_q = (
        f"least(CAST(floor((({lon}) + 180.0) / 360.0 * {float(1 << lon_bits)})"
        f" AS BIGINT), {(1 << lon_bits) - 1})"
    )
    lat_q = (
        f"least(CAST(floor((({lat}) + 90.0) / 180.0 * {float(1 << lat_bits)})"
        f" AS BIGINT), {(1 << lat_bits) - 1})"
    )
    terms = [
        f"((({lon_q} >> {lon_bits - 1 - i}) & 1) << {n - 1 - 2 * i})"
        for i in range(lon_bits)
    ] + [
        f"((({lat_q} >> {lat_bits - 1 - i}) & 1) << {n - 2 - 2 * i})"
        for i in range(lat_bits)
    ]
    gh = " + ".join(terms)
    chars = " || ".join(
        f"substr('{GEOHASH_BASE32}',"
        f" CAST((({gh}) >> {5 * (precision - 1 - j)}) & 31 AS INT) + 1, 1)"
        for j in range(precision)
    )
    return f"({chars})"


# --- multi-resolution geohash rollup --------------------------------------------

ROLLUP_PRECISIONS = (2, 3, 4)


def geohash_rollup(points, precisions: tuple[int, ...] = ROLLUP_PRECISIONS):
    """Point counts per geohash cell at several precisions in ONE
    pass — the spatial twin of the temporal multi-res rollup
    (operators/temporal.py rollup_multires).

    Each point encodes ONCE at the finest precision, then explodes
    into its prefix per requested precision (a geohash prefix IS the
    coarser cell — the interleave makes precision a prefix property).
    One map-side-combined shuffle on (precision, cell): every input
    partition ships at most |occupied cells| rows per level.

    Returns (precision, cell, n_points).
    """
    from pyspark.sql import functions as F

    pmax = max(precisions)
    enc = points.select(
        geohash_col(F.col("lon"), F.col("lat"), pmax).alias("gh")
    )
    levels = F.array(*[
        F.struct(
            F.lit(p).alias("precision"),
            F.substring("gh", 1, p).alias("cell"),
        )
        for p in precisions
    ])
    return (
        enc.select(F.explode(levels).alias("l"))
        .groupBy(F.col("l.precision").alias("precision"),
                 F.col("l.cell").alias("cell"))
        .agg(F.count("*").alias("n_points"))
    )


def sql_geohash_rollup(points_sql: str,
                       precisions: tuple[int, ...] = ROLLUP_PRECISIONS) -> str:
    pmax = max(precisions)
    branches = " UNION ALL ".join(
        f"SELECT {p} AS precision, substr(gh, 1, {p}) AS cell FROM enc"
        for p in precisions
    )
    return f"""
WITH pts AS ({points_sql}),
enc AS (SELECT {sql_geohash('lon', 'lat', pmax)} AS gh FROM pts),
lv AS ({branches})
SELECT precision, cell, count(*) AS n_points
FROM lv GROUP BY precision, cell
"""
