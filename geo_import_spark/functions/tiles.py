"""Web-Mercator raster tile (z/x/y, quadkey) assignment, pure NumPy.

Standard slippy-map formula (OSM/Bing public spec). Used to assign
media spans to raster tiles (north rule: "raster-tile assignment
(z/x/y quadkey) for media spans"); the reference has no tiling —
this is a new-engine operator (SURVEY.md §2.7 `tile_assign`).
"""

from __future__ import annotations

import numpy as np

WEBMERC_MAX_LAT = 85.05112878


def tile_xy(lon: np.ndarray, lat: np.ndarray, z: int):
    """(x, y) tile indices at zoom z. Vectorized, lat clamped to ±85.051°."""
    n = np.int64(1) << np.int64(z)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -WEBMERC_MAX_LAT, WEBMERC_MAX_LAT)
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    rad = np.radians(lat)
    y = np.floor((1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / np.pi) / 2.0 * n).astype(np.int64)
    np.clip(x, 0, n - 1, out=x)
    np.clip(y, 0, n - 1, out=y)
    return x, y


def quadkey_list(x: np.ndarray, y: np.ndarray, z: int) -> list[str]:
    """Quadkey strings per (x, y) at zoom z (vectorized digit math)."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    m = x.shape[0]
    digits = np.empty((m, z), dtype=np.uint8)
    for i in range(z):
        shift = z - 1 - i
        digits[:, i] = (((x >> shift) & 1) + 2 * ((y >> shift) & 1)).astype(np.uint8) + ord("0")
    flat = digits.tobytes().decode("ascii")
    return [flat[i * z : (i + 1) * z] for i in range(m)]
