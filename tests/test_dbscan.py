"""Grid DBSCAN: full Python mirror (roles + components + border
assignment) and role-mix sanity."""

import math

from geo_import_spark import corpus
from geo_import_spark.operators import dbscan


def _mirror(points, level, min_pts):
    n = 1 << level
    hist = {}
    for lon, lat in points:
        x = max(min(int(math.floor((lon + 180.0) / 360.0 * n)), n - 1), 0)
        y = max(min(int(math.floor((90.0 - lat) / 180.0 * n)), n - 1), 0)
        hist[(x, y)] = hist.get((x, y), 0) + 1
    width = max(3, len(str(n - 1)))

    def key(c):
        return f"c{c[0]:0{width}d}{c[1]:0{width}d}"

    def nbrs(c, include_self):
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if not include_self and dx == 0 and dy == 0:
                    continue
                yield (c[0] + dx, c[1] + dy)

    core = {
        c
        for c in hist
        if sum(hist.get(nc, 0) for nc in nbrs(c, True)) >= min_pts
    }
    # union-find over 8-connected core cells
    parent = {c: c for c in core}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    for c in core:
        for nc in nbrs(c, False):
            if nc in core:
                ra, rb = find(c), find(nc)
                if ra != rb:
                    parent[rb] = ra
    comp = {}
    for c in core:
        comp.setdefault(find(c), []).append(c)
    label = {}
    for cells in comp.values():
        rep = min(key(c) for c in cells)
        for c in cells:
            label[c] = rep

    out = {}
    for c, npts in hist.items():
        if c in core:
            out[c] = (npts, "core", label[c])
        else:
            adj = [label[nc] for nc in nbrs(c, False) if nc in core]
            if adj:
                out[c] = (npts, "border", min(adj))
            else:
                out[c] = (npts, "noise", None)
    return out


def test_matches_python_mirror(spark, sf_dir):
    pts = [
        (r["lon"], r["lat"])
        for r in corpus.points(spark, sf_dir).collect()
    ]
    n = 1 << dbscan.DBSCAN_LEVEL
    hist = {}
    for lon, lat in pts:
        x = max(min(int(math.floor((lon + 180.0) / 360.0 * n)), n - 1), 0)
        y = max(min(int(math.floor((90.0 - lat) / 180.0 * n)), n - 1), 0)
        hist[(x, y)] = hist.get((x, y), 0) + 1
    nbr = {}
    for (x, y), c in hist.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                k = (x + dx, y + dy)
                nbr[k] = nbr.get(k, 0) + c
    mx = max(nbr[c] for c in hist)
    exp = _mirror(
        pts, dbscan.DBSCAN_LEVEL,
        dbscan.adaptive_min_pts(len(pts), mx, dbscan.DBSCAN_LEVEL),
    )
    got = {
        (r["x"], r["y"]): (r["n_points"], r["role"], r["cluster_id"])
        for r in dbscan.grid_dbscan(corpus.points(spark, sf_dir)).collect()
    }
    assert got == exp


def test_role_mix_nontrivial(spark, sf_dir):
    rows = dbscan.grid_dbscan(corpus.points(spark, sf_dir)).collect()
    roles = {r["role"] for r in rows}
    assert "core" in roles
    assert roles & {"border", "noise"}, "threshold should split the grid"
    for r in rows:
        assert (r["cluster_id"] is None) == (r["role"] == "noise")
