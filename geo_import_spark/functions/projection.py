"""CRS reprojection to WGS84 — pure NumPy, vectorized over flat
coordinate ndarrays (the engine's replacement for the reference's
per-coordinate proj4 calls, es6-lib/soql/geom.js:10-16 +
decoders/wgs84-reprojector.js:43-71).

Implements the projections the reference test corpus exercises
(published formulas, classic proj4-style series):

- longlat / CRS84 / EPSG:4326 — identity
- tmerc / utm (EPSG:26915 = UTM 15N on GRS80/NAD83) — Snyder series
  inverse with footpoint-latitude iteration
- somerc (EPSG:23700 = Hungarian EOV on GRS67 + 3-param datum shift)
  — Swiss oblique mercator per the published swisstopo formulas,
  with geocentric Helmert transform to WGS84
- lcc (Lambert Conformal Conic, 1SP/2SP) — Snyder eq. 15-1..15-5
  inverse; the projection behind most US StatePlane zones and the
  reference's own municipios.zip smoke fixture and EPSG:2834 unit
  test (es6-test/unit/shapefile.js:45-65 pins its proj4 string)

Arbitrary `.prj` WKT1 `PROJCS[...]` strings parse via
`parse_projcs_wkt` (PROJECTION name + PARAMETER list + SPHEROID +
linear UNIT + DATUM/TOWGS84 → the same def-dict form), mirroring the
reference's srs.parse of any .prj (es6-lib/decoders/shapefile.js:26-34).
Unsupported projections/datums raise ValueError, which the reproject
stage routes to the error side-channel (never a task crash).

Golden targets (reference es6-test/unit/merger.js:110-184, delta 1e-9):
  EPSG:26915 (102, 0.5)  -> (-97.48783007891072, 0.00000450969282)
  EPSG:23700 (103, 1.5)  -> (10.7889673904, 45.0359670320)
"""

from __future__ import annotations

import math
import re

import numpy as np

ELLPS = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "GRS67": (6378160.0, 298.247167427),
}

WGS84_URNS = {
    "urn:ogc:def:crs:OGC:1.3:CRS84",
    "urn:ogc:def:crs:EPSG::4326",
    "EPSG:4326",
    "CRS84",
    "+proj=longlat +ellps=WGS84 +no_defs",
}

# Minimal EPSG registry for the corpus CRSs (proj4-style params).
EPSG_DEFS = {
    4326: {"proj": "longlat"},
    26915: {"proj": "utm", "zone": 15, "ellps": "GRS80", "towgs84": (0.0, 0.0, 0.0)},
    23700: {
        "proj": "somerc",
        "lat_0": 47.14439372222222,
        "lon_0": 19.04857177777778,
        "k_0": 0.99993,
        "x_0": 650000.0,
        "y_0": 200000.0,
        "ellps": "GRS67",
        "towgs84": (52.17, -71.82, -14.9),
    },
    3857: {"proj": "webmerc", "ellps": "WGS84"},  # pseudo-mercator (sphere a)
    # NAD83(HARN) / Ohio North — the reference's .prj unit-test CRS;
    # params = the proj4 string its test pins (es6-test/unit/
    # shapefile.js:52: +proj=lcc +lat_1=41.7 +lat_2=40.43333333333333
    # +lat_0=39.66666666666666 +lon_0=-82.5 +x_0=600000 +y_0=0
    # +ellps=GRS80 +units=m +no_defs).
    2834: {
        "proj": "lcc",
        "lat_1": 41.7,
        "lat_2": 40.43333333333333,
        "lat_0": 39.66666666666666,
        "lon_0": -82.5,
        "x_0": 600000.0,
        "y_0": 0.0,
        "ellps": "GRS80",
        "towgs84": (0.0, 0.0, 0.0),
    },
}

# WKT1 PROJECTION names (ESRI + OGC spellings) -> engine proj keys.
_WKT_PROJECTIONS = {
    "lambert_conformal_conic": "lcc",
    "lambert_conformal_conic_2sp": "lcc",
    "transverse_mercator": "tmerc",
    "mercator_auxiliary_sphere": "webmerc",  # ESRI web-mercator
    "popular_visualisation_pseudo_mercator": "webmerc",
}

# Datum names (WKT1 DATUM["..."]) that are WGS84-coincident at the
# meter level -> implicit towgs84 (0,0,0). NAD83 and its HARN/CORS
# realizations differ from WGS84 by < 2 m, the same approximation
# proj4 applies when a .prj carries no TOWGS84 (and the one the
# reference inherits through srs/proj4js).
_NULL_SHIFT_DATUMS = re.compile(
    r"(north[_ ]?american[_ ]?(datum[_ ])?1983|nad[_ ]?83|wgs[_ ]?(19)?84)",
    re.IGNORECASE,
)


def _ellps_key(a: float, rf: float) -> str:
    """Map SPHEROID (a, 1/f) to a named ellipsoid when it matches one
    (1e-6 tolerance), else register the custom pair under a synthetic
    key so every downstream helper's ELLPS lookup still works."""
    for name, (ka, krf) in list(ELLPS.items()):
        if abs(a - ka) < 1e-6 and abs(rf - krf) < 1e-6:
            return name
    key = f"CUSTOM_{a:.6f}_{rf:.9f}"
    ELLPS[key] = (a, rf)
    return key


def parse_projcs_wkt(wkt: str) -> dict:
    """WKT1 `PROJCS[...]` (OGC or ESRI flavor) -> projection def dict.

    Extracts PROJECTION name, the PARAMETER list (case-insensitive
    names — ESRI writes `False_Easting`, OGC `false_easting`),
    SPHEROID (a, 1/f), the PROJCS linear UNIT (meters factor; US
    survey feet StatePlane zones convert through it), and the datum
    shift (explicit TOWGS84, else a null shift for NAD83/WGS84-family
    datums). Raises ValueError for projections or datums outside the
    registry — callers route that to the error side-channel.

    Reference parity: es6-lib/decoders/shapefile.js:26-34 srs-parses
    any .prj into proj4 params; this is the engine's equivalent over
    the same WKT grammar.
    """
    pm = re.search(r'PROJECTION\[\s*"([^"]+)"', wkt, re.IGNORECASE)
    if not pm:
        raise ValueError("PROJCS WKT without a PROJECTION clause")
    pname = pm.group(1).strip().lower()
    proj = _WKT_PROJECTIONS.get(pname)
    if proj is None:
        raise ValueError(f"unsupported WKT projection {pm.group(1)!r}")

    params: dict[str, float] = {}
    for m in re.finditer(
        r'PARAMETER\[\s*"([^"]+)"\s*,\s*([-+0-9.eE]+)', wkt, re.IGNORECASE
    ):
        params[m.group(1).strip().lower()] = float(m.group(2))

    sp = re.search(
        r'SPHEROID\[\s*"[^"]*"\s*,\s*([-+0-9.eE]+)\s*,\s*([-+0-9.eE]+)',
        wkt,
        re.IGNORECASE,
    )
    if not sp:
        raise ValueError("PROJCS WKT without a SPHEROID clause")
    ellps = _ellps_key(float(sp.group(1)), float(sp.group(2)))

    tow_m = re.search(r"TOWGS84\[([^\]]*)\]", wkt, re.IGNORECASE)
    if tow_m:
        vals = [float(v) for v in tow_m.group(1).split(",")[:3]]
        towgs84 = tuple(vals + [0.0] * (3 - len(vals)))
    else:
        dm = re.search(r'DATUM\[\s*"([^"]+)"', wkt, re.IGNORECASE)
        dname = dm.group(1) if dm else ""
        if not _NULL_SHIFT_DATUMS.search(dname):
            raise ValueError(
                f"unsupported datum {dname!r} (no TOWGS84 in WKT)"
            )
        towgs84 = (0.0, 0.0, 0.0)

    # the PROJCS linear unit is the LAST UNIT clause in WKT1 (the
    # GEOGCS angular unit precedes it); factor = meters per map unit.
    units = re.findall(r'UNIT\[\s*"[^"]*"\s*,\s*([-+0-9.eE]+)', wkt)
    to_meter = float(units[-1]) if units else 1.0

    d: dict = {
        "proj": proj,
        "ellps": ellps,
        "towgs84": towgs84,
        "to_meter": to_meter,
        "lat_0": params.get("latitude_of_origin", 0.0),
        "lon_0": params.get("central_meridian", 0.0),
        "k_0": params.get("scale_factor", 1.0),
        # false easting/northing are expressed in map units
        "x_0": params.get("false_easting", 0.0) * to_meter,
        "y_0": params.get("false_northing", 0.0) * to_meter,
    }
    if proj == "lcc":
        lat1 = params.get("standard_parallel_1")
        if lat1 is None:
            # 1SP form: the standard parallel IS the origin latitude
            lat1 = d["lat_0"]
        d["lat_1"] = lat1
        d["lat_2"] = params.get("standard_parallel_2", lat1)
    return d


def parse_crs(crs: str | None) -> dict | None:
    """CRS tag (urn / EPSG:n / proj4 longlat / .prj WKT) -> projection
    def, or None for WGS84-equivalent (reproject skip,
    soql/geom.js:11-15)."""
    if crs is None or crs in WGS84_URNS:
        return None
    m = re.match(r"^(?:urn:ogc:def:crs:EPSG::|EPSG:)(\d+)$", crs)
    if m:
        code = int(m.group(1))
        if code == 4326:
            return None
        if code in EPSG_DEFS:
            return EPSG_DEFS[code]
        raise ValueError(f"unsupported EPSG code {code}")
    if crs.startswith("+proj=longlat"):
        return None
    w = crs.lstrip()
    if w.upper().startswith("PROJCS"):
        return parse_projcs_wkt(w)
    if w.upper().startswith("GEOGCS"):
        # geographic .prj: identity when the datum is WGS84-coincident
        dm = re.search(r'DATUM\[\s*"([^"]+)"', w, re.IGNORECASE)
        if dm and _NULL_SHIFT_DATUMS.search(dm.group(1)):
            return None
        raise ValueError(f"unsupported geographic CRS {crs[:80]!r}")
    raise ValueError(f"unsupported CRS {crs!r}")


# --- classic series helpers (Snyder / proj4-style) --------------------------

def _e0fn(x):
    return 1.0 - 0.25 * x * (1.0 + x / 16.0 * (3.0 + 1.25 * x))


def _e1fn(x):
    return 0.375 * x * (1.0 + 0.25 * x * (1.0 + 0.46875 * x))


def _e2fn(x):
    return 0.05859375 * x * x * (1.0 + 0.75 * x)


def _e3fn(x):
    return x * x * x * (35.0 / 3072.0)


def _mlfn(e0, e1, e2, e3, phi):
    return e0 * phi - e1 * np.sin(2.0 * phi) + e2 * np.sin(4.0 * phi) - e3 * np.sin(6.0 * phi)


def tmerc_inverse(x, y, lon0_deg, k0, x0, y0, ellps, lat0: float = 0.0):
    """Transverse-mercator E/N (meters) -> lon/lat degrees.
    Vectorized Snyder series; footpoint latitude by fixed-point
    iteration (tolerance 1e-12 rad)."""
    a, rf = ELLPS[ellps]
    f = 1.0 / rf
    es = 2.0 * f - f * f
    ep2 = es / (1.0 - es)
    e0, e1, e2, e3 = _e0fn(es), _e1fn(es), _e2fn(es), _e3fn(es)
    ml0 = a * _mlfn(e0, e1, e2, e3, math.radians(lat0))

    x = np.asarray(x, dtype=np.float64) - x0
    y = np.asarray(y, dtype=np.float64) - y0
    con = (ml0 + y / k0) / a
    phi = con.copy()
    for _ in range(8):
        dphi = (con + e1 * np.sin(2 * phi) - e2 * np.sin(4 * phi) + e3 * np.sin(6 * phi)) / e0 - phi
        phi += dphi
        if np.max(np.abs(dphi)) <= 1e-12:
            break
    sin_p, cos_p, tan_p = np.sin(phi), np.cos(phi), np.tan(phi)
    c = ep2 * cos_p * cos_p
    cs = c * c
    t = tan_p * tan_p
    ts = t * t
    cn = 1.0 - es * sin_p * sin_p
    n = a / np.sqrt(cn)
    r = n * (1.0 - es) / cn
    d = x / (n * k0)
    ds = d * d
    lat = phi - (n * tan_p * ds / r) * (
        0.5
        - ds / 24.0 * (5.0 + 3.0 * t + 10.0 * c - 4.0 * cs - 9.0 * ep2
                       - ds / 30.0 * (61.0 + 90.0 * t + 298.0 * c + 45.0 * ts
                                      - 252.0 * ep2 - 3.0 * cs))
    )
    lon = math.radians(lon0_deg) + d * (
        1.0 - ds / 6.0 * (1.0 + 2.0 * t + c
                          - ds / 20.0 * (5.0 - 2.0 * c + 28.0 * t - 3.0 * cs
                                         + 8.0 * ep2 + 24.0 * ts))
    ) / cos_p
    return np.degrees(lon), np.degrees(lat)


def somerc_inverse(x, y, lat0_deg, lon0_deg, k0, x0, y0, ellps):
    """Swiss oblique mercator E/N -> lon/lat degrees on the source
    ellipsoid (published swisstopo formulas)."""
    a, rf = ELLPS[ellps]
    f = 1.0 / rf
    es = 2.0 * f - f * f
    e = math.sqrt(es)
    phi0 = math.radians(lat0_deg)
    lam0 = math.radians(lon0_deg)
    s0, c0 = math.sin(phi0), math.cos(phi0)
    R = k0 * a * math.sqrt(1.0 - es) / (1.0 - es * s0 * s0)
    alpha = math.sqrt(1.0 + es / (1.0 - es) * c0 ** 4)
    b0 = math.asin(s0 / alpha)
    K = (
        math.log(math.tan(math.pi / 4.0 + b0 / 2.0))
        - alpha * math.log(math.tan(math.pi / 4.0 + phi0 / 2.0))
        + alpha * e / 2.0 * math.log((1.0 + e * s0) / (1.0 - e * s0))
    )

    Y = (np.asarray(x, dtype=np.float64) - x0) / R  # east -> sphere lon
    X = (np.asarray(y, dtype=np.float64) - y0) / R  # north -> sphere isolat
    b = 2.0 * (np.arctan(np.exp(X)) - math.pi / 4.0)
    bb = np.arcsin(math.cos(b0) * np.sin(b) + math.sin(b0) * np.cos(b) * np.cos(Y))
    ll = np.arctan2(np.sin(Y), np.cos(b0) * np.cos(Y) - math.sin(b0) * np.tan(b))

    lon = lam0 + ll / alpha
    # Fixed point for the ellipsoidal latitude. Tolerance and update
    # form replicate proj4 2.3.12 exactly (per-element stop at 1e-7
    # rad): the reference goldens (merger.js:110-146) bake in the
    # ~1.5e-9 deg residual of that loose stop, so converging further
    # would *break* byte-parity with the reference.
    S0 = (np.log(np.tan(math.pi / 4.0 + bb / 2.0)) - K) / alpha
    phi = bb.copy()
    active = np.ones(phi.shape, dtype=bool)
    for _ in range(20):
        prev = phi[active]
        nxt = 2.0 * np.arctan(
            np.exp(
                S0[active]
                + e * np.log(np.tan(math.pi / 4.0 + np.arcsin(e * np.sin(prev)) / 2.0))
            )
        ) - math.pi / 2.0
        phi[active] = nxt
        still = np.abs(nxt - prev) > 1e-7
        active[active.nonzero()[0][~still]] = False
        if not active.any():
            break
    return np.degrees(lon), np.degrees(phi)


def lcc_inverse(x, y, lat1_deg, lat2_deg, lat0_deg, lon0_deg, x0, y0, ellps):
    """Lambert Conformal Conic E/N (meters) -> lon/lat degrees on the
    source ellipsoid. Snyder (1987) eq. 14-1..14-2 constants with the
    eq. 15-1..15-5 inverse; the conformal-latitude fixed point
    converges quadratically (<1e-12 rad in <=15 rounds). Handles both
    the 2SP secant form and 1SP (lat_1 == lat_2) tangent form, and
    southern-hemisphere cones (n < 0)."""
    a, rf = ELLPS[ellps]
    f = 1.0 / rf
    es = 2.0 * f - f * f
    e = math.sqrt(es)

    def _msfn(phi):
        return math.cos(phi) / math.sqrt(1.0 - es * math.sin(phi) ** 2)

    def _tsfn(phi):
        s = e * math.sin(phi)
        return math.tan(math.pi / 4.0 - phi / 2.0) / ((1.0 - s) / (1.0 + s)) ** (e / 2.0)

    phi1 = math.radians(lat1_deg)
    phi2 = math.radians(lat2_deg)
    phi0 = math.radians(lat0_deg)
    m1, t1 = _msfn(phi1), _tsfn(phi1)
    if abs(phi1 - phi2) > 1e-10:
        n = (math.log(m1) - math.log(_msfn(phi2))) / (
            math.log(t1) - math.log(_tsfn(phi2))
        )
    else:
        n = math.sin(phi1)
    F_ = m1 / (n * t1**n)
    rho0 = a * F_ * _tsfn(phi0) ** n

    dx = np.asarray(x, dtype=np.float64) - x0
    dy = rho0 - (np.asarray(y, dtype=np.float64) - y0)
    if n < 0.0:
        dx, dy = -dx, -dy
    rho = np.hypot(dx, dy)
    theta = np.arctan2(dx, dy)
    t = (rho / (a * abs(F_))) ** (1.0 / n)
    phi = math.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(15):
        s = e * np.sin(phi)
        prev = phi
        phi = math.pi / 2.0 - 2.0 * np.arctan(t * ((1.0 - s) / (1.0 + s)) ** (e / 2.0))
        if np.max(np.abs(phi - prev)) < 1e-12:
            break
    phi = np.where(rho == 0.0, math.copysign(math.pi / 2.0, n), phi)
    lon = math.radians(lon0_deg) + theta / n
    return np.degrees(lon), np.degrees(phi)


def webmerc_inverse(x, y):
    """EPSG:3857 meters -> lon/lat degrees (spherical, exact)."""
    a = ELLPS["WGS84"][0]
    lon = np.degrees(np.asarray(x, dtype=np.float64) / a)
    lat = np.degrees(2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / a)) - math.pi / 2.0)
    return lon, lat


# --- geocentric 3-param datum shift -----------------------------------------

def _geodetic_to_geocentric(lon_deg, lat_deg, ellps):
    a, rf = ELLPS[ellps]
    f = 1.0 / rf
    es = 2.0 * f - f * f
    lam = np.radians(lon_deg)
    phi = np.radians(lat_deg)
    sin_p = np.sin(phi)
    N = a / np.sqrt(1.0 - es * sin_p * sin_p)
    X = N * np.cos(phi) * np.cos(lam)
    Y = N * np.cos(phi) * np.sin(lam)
    Z = N * (1.0 - es) * sin_p
    return X, Y, Z


def _geocentric_to_geodetic(X, Y, Z, ellps):
    """Iterative (Bowring start + fixed point), converges < 1e-12."""
    a, rf = ELLPS[ellps]
    f = 1.0 / rf
    es = 2.0 * f - f * f
    b = a * (1.0 - f)
    ep2 = es / (1.0 - es)
    p = np.sqrt(X * X + Y * Y)
    lam = np.arctan2(Y, X)
    theta = np.arctan2(Z * a, p * b)
    phi = np.arctan2(
        Z + ep2 * b * np.sin(theta) ** 3, p - es * a * np.cos(theta) ** 3
    )
    for _ in range(10):
        sin_p = np.sin(phi)
        N = a / np.sqrt(1.0 - es * sin_p * sin_p)
        prev = phi
        phi = np.arctan2(Z + es * N * sin_p, p)
        if np.max(np.abs(phi - prev)) < 1e-15:
            break
    return np.degrees(lam), np.degrees(phi)


def helmert_to_wgs84(lon_deg, lat_deg, src_ellps, towgs84):
    dx, dy, dz = towgs84
    if dx == 0.0 and dy == 0.0 and dz == 0.0 and src_ellps == "WGS84":
        return lon_deg, lat_deg
    X, Y, Z = _geodetic_to_geocentric(lon_deg, lat_deg, src_ellps)
    return _geocentric_to_geodetic(X + dx, Y + dy, Z + dz, "WGS84")


# --- public entry -----------------------------------------------------------

def to_wgs84(crs: str | None, x: np.ndarray, y: np.ndarray):
    """Transform coordinate arrays in `crs` to WGS84 lon/lat degrees.
    Identity (same array objects) when crs is WGS84-equivalent —
    mirrors the reference's from==to skip."""
    d = parse_crs(crs)
    if d is None:
        return x, y
    proj = d["proj"]
    tm = d.get("to_meter", 1.0)
    if tm != 1.0:  # map units (e.g. US survey feet) -> meters
        x = np.asarray(x, dtype=np.float64) * tm
        y = np.asarray(y, dtype=np.float64) * tm
    if proj == "lcc":
        lon, lat = lcc_inverse(
            x, y, d["lat_1"], d["lat_2"], d["lat_0"], d["lon_0"],
            d.get("x_0", 0.0), d.get("y_0", 0.0), d["ellps"],
        )
    elif proj == "utm":
        lon0 = 6 * d["zone"] - 183
        lon, lat = tmerc_inverse(x, y, lon0, 0.9996, 500000.0, 0.0, d["ellps"])
    elif proj == "tmerc":
        lon, lat = tmerc_inverse(
            x, y, d["lon_0"], d.get("k_0", 1.0), d.get("x_0", 0.0),
            d.get("y_0", 0.0), d["ellps"], d.get("lat_0", 0.0)
        )
    elif proj == "somerc":
        lon, lat = somerc_inverse(
            x, y, d["lat_0"], d["lon_0"], d["k_0"], d["x_0"], d["y_0"], d["ellps"]
        )
    elif proj == "webmerc":
        return webmerc_inverse(x, y)
    elif proj == "longlat":
        lon, lat = np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    else:
        raise ValueError(f"unsupported projection {proj!r}")
    tow = d.get("towgs84")
    if tow:
        lon, lat = helmert_to_wgs84(lon, lat, d["ellps"], tow)
    return lon, lat
