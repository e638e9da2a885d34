"""Streaming PIP == batch PIP: the stream-static broadcast plan must
emit exactly the batch containment rows, once each, in append mode."""

import pytest

from pyspark.sql import functions as F

from geo_import_spark import corpus
from geo_import_spark.operators import pip as pipmod
from geo_import_spark.sources import geojson
from geo_import_spark.streaming import pip as spip


def test_streaming_pip_matches_batch(spark, sf_dir, tmp_path):
    docs = corpus.documents(spark, sf_dir)
    pts = geojson.point_spans(docs).select("doc_id", "span_offset", "lon", "lat")
    polys = corpus.polygons(spark, sf_dir)
    expected = {
        (r["doc_id"], r["span_offset"], r["poly_id"])
        for r in pipmod.pip_join(pts, polys).collect()
    }
    assert expected  # non-degenerate fixture

    src = str(tmp_path / "pts_src")
    pts.write.parquet(src)
    stream = spark.readStream.schema(pts.schema).parquet(src)
    out = spip.streaming_pip_join(stream, polys)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("stream_pip")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = [
        (r["doc_id"], r["span_offset"], r["poly_id"])
        for r in spark.sql("SELECT * FROM stream_pip").collect()
    ]
    assert len(got) == len(set(got))  # exactly-once, no dup emission
    assert set(got) == expected


def test_streaming_pip_rejects_batch_input_and_huge_dimension(
    spark, sf_dir, tmp_path
):
    docs = corpus.documents(spark, sf_dir)
    pts = geojson.point_spans(docs).select("doc_id", "span_offset", "lon", "lat")
    polys = corpus.polygons(spark, sf_dir)
    with pytest.raises(ValueError, match="must be a streaming"):
        spip.streaming_pip_join(pts, polys)

    # a polygon side over the broadcast budget must raise, not plan a
    # stateful join: fake the estimate by replicating the dimension
    big = polys.crossJoin(
        spark.range(200_000).select(F.col("id").alias("rep"))
    ).withColumn("poly_id", F.concat("poly_id", F.lit("#"), F.col("rep")))
    empty = tmp_path / "empty_src"
    empty.mkdir()
    stream = spark.readStream.schema(pts.schema).parquet(str(empty))
    with pytest.raises(ValueError, match="exceeds the broadcast budget"):
        spip.streaming_pip_join(stream, big)
