"""End-to-end flagship tests: corpus -> parse -> PIP -> tiles -> kNN,
each verified against a NumPy brute-force oracle (SURVEY.md §5b)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geo_import_spark import corpus
from geo_import_spark.functions import tiles as tilemod
from geo_import_spark.operators import knn as knnmod
from geo_import_spark.operators import pip as pipmod
from geo_import_spark.operators import tiling
from geo_import_spark.sources import geojson


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    # unpersist on teardown: a cached fragment left in the shared
    # session's CacheManager substitutes into LATER tests' plans
    # (plan-shape assertions in test_plan_properties see a different
    # tree once corpus.documents resolves to an InMemoryRelation)
    df = corpus.documents(spark, sf_dir).cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def pts_pdf(spark, sf_dir):
    return corpus.points(spark, sf_dir).toPandas()


@pytest.fixture(scope="module")
def polys_pdf(spark, sf_dir):
    return corpus.polygons(spark, sf_dir).select(
        "poly_id", "minx", "miny", "maxx", "maxy"
    ).toPandas()


def test_span_sequence_preserved(docs, spark, sf_dir):
    """Input-hint invariant: (kind, text, media_ref, order by offset)
    survives the engine's explode/reassemble round trip."""
    exploded = docs.select("doc_id", F.explode("spans").alias("s"))
    rebuilt = (
        exploded.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("s")).alias("spans2"))
    )
    joined = docs.join(rebuilt, "doc_id")
    # offsets are the leading sort determinant only if offset is first;
    # instead compare element-by-element after sorting by offset
    reordered = joined.select(
        "doc_id",
        F.col("spans").alias("a"),
        F.array_sort(
            F.col("spans2"), lambda x, y: x["offset"] - y["offset"]
        ).alias("b"),
    )
    bad = reordered.filter(F.col("a") != F.col("b")).count()
    assert bad == 0
    # offsets are dense 0..n-1
    bad_off = docs.select(
        F.exists(
            F.transform("spans", lambda x, i: x["offset"] == i.cast("int")),
            lambda ok: ~ok,
        ).alias("any_bad")
    ).filter("any_bad").count()
    assert bad_off == 0


def test_parse_points_match_formula(docs, pts_pdf, spark):
    pts = geojson.point_spans(docs).toPandas().set_index("doc_id").sort_index()
    exp = pts_pdf.set_index("doc_id").sort_index()
    assert len(pts) == len(exp)
    np.testing.assert_array_equal(pts["lon"].values, exp["lon"].values)
    np.testing.assert_array_equal(pts["lat"].values, exp["lat"].values)


def test_pip_matches_bruteforce(docs, spark, sf_dir, pts_pdf, polys_pdf):
    points = geojson.point_spans(docs)
    polys = corpus.polygons(spark, sf_dir)
    got = (
        pipmod.pip_join(points, polys, base_level=13, max_cells=64)
        .toPandas()
        .sort_values(["doc_id", "span_offset", "poly_id"])
        .reset_index(drop=True)
    )
    # brute force: every point against every rectangle
    lon = pts_pdf["lon"].values[:, None]
    lat = pts_pdf["lat"].values[:, None]
    inside = (
        (lon > polys_pdf["minx"].values[None, :])
        & (lon < polys_pdf["maxx"].values[None, :])
        & (lat > polys_pdf["miny"].values[None, :])
        & (lat < polys_pdf["maxy"].values[None, :])
    )
    ii, jj = np.nonzero(inside)
    exp = pd.DataFrame(
        {
            "doc_id": pts_pdf["doc_id"].values[ii],
            "poly_id": polys_pdf["poly_id"].values[jj],
        }
    ).sort_values(["doc_id", "poly_id"]).reset_index(drop=True)
    assert len(got) == len(exp), (len(got), len(exp))
    pd.testing.assert_frame_equal(
        got[["doc_id", "poly_id"]].reset_index(drop=True), exp
    )
    assert len(got) > 0  # corpus actually exercises the join


def test_pip_salted_equals_unsalted(docs, spark, sf_dir):
    points = geojson.point_spans(docs)
    polys = corpus.polygons(spark, sf_dir)
    a = pipmod.pip_join(points, polys).toPandas()
    b = pipmod.pip_join(points, polys, salt_factor=4).toPandas()
    key = ["doc_id", "span_offset", "poly_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_pip_broadcast_equals_shuffle_path(docs, spark, sf_dir):
    """The broadcast-rings refinement (default) and the shuffle-join
    fallback produce identical hit sets."""
    points = geojson.point_spans(docs)
    polys = corpus.polygons(spark, sf_dir)
    a = pipmod.pip_join(points, polys, broadcast_polys=True).toPandas()
    b = pipmod.pip_join(points, polys, broadcast_polys=False).toPandas()
    key = ["doc_id", "span_offset", "poly_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_tiles_match_bruteforce(docs, spark, sf_dir, pts_pdf):
    points = geojson.point_spans(docs)
    anchors = tiling.first_geometry_anchor(points)
    got = tiling.assign_tiles(docs, anchors, z=12).toPandas()
    exp_x, exp_y = tilemod.tile_xy(pts_pdf["lon"].values, pts_pdf["lat"].values, 12)
    exp = pd.DataFrame({"doc_id": pts_pdf["doc_id"], "x": exp_x, "y": exp_y})
    m = got.merge(exp, on="doc_id", suffixes=("", "_exp"))
    assert len(m) == len(got) > 0
    assert (m["x"] == m["x_exp"]).all() and (m["y"] == m["y_exp"]).all()
    # quadkey is consistent with x/y
    qk = tilemod.quadkey_list(m["x"].values, m["y"].values, 12)
    assert (m["quadkey"] == qk).all()
    # media spans only on even doc keys
    keys = m["doc_id"].str.replace("doc-", "").astype(int)
    assert (keys % 2 == 0).all()


def test_knn_matches_bruteforce(docs, spark, sf_dir, pts_pdf):
    points = geojson.point_spans(docs)
    queries = corpus.knn_queries(spark, sf_dir).limit(40)
    got = (
        knnmod.knn_join(queries, points, k=5, level=6)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    qp = queries.toPandas()
    rows = []
    for _, q in qp.iterrows():
        d = np.sqrt(
            (pts_pdf["lon"].values - q["qlon"]) ** 2
            + (pts_pdf["lat"].values - q["qlat"]) ** 2
        )
        order = np.lexsort((pts_pdf["doc_id"].values, d))[:5]
        for rank, idx in enumerate(order, 1):
            rows.append((q["query_id"], pts_pdf["doc_id"].values[idx], rank))
    exp = pd.DataFrame(rows, columns=["query_id", "doc_id", "rank"]).sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got[["query_id", "doc_id", "rank"]], exp, check_dtype=False)
