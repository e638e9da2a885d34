"""Reconciliation ops: diff classification truth and checksum
mergeability/sensitivity."""

from pyspark.sql import functions as F

from geo_import_spark import corpus
from geo_import_spark.operators import reconcile


def test_frame_diff_classification(spark, sf_dir):
    a = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b = corpus.dirty_documents(spark, sf_dir)
    got = {r["doc_id"]: r["status"]
           for r in reconcile.frame_diff(a, b, "doc_id", "text").collect()}
    ta = {r["doc_id"]: r["text"] for r in a.select("doc_id", "text").collect()}
    tb = {r["doc_id"]: r["text"] for r in b.collect()}
    assert set(got) == set(ta) | set(tb)
    for d, s in got.items():
        if d not in tb:
            assert s == "only_a"
        elif d not in ta:
            assert s == "only_b"
        elif ta[d] == tb[d]:
            assert s == "same"
        else:
            assert s == "changed"
    assert {"same", "changed"} <= set(got.values())


def test_frame_diff_detects_only_sides(spark, sf_dir):
    a = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b = a.filter(F.col("doc_id") % 2 == 0)
    got = reconcile.frame_diff(a, b, "doc_id", "text").groupBy("status") \
        .count().collect()
    m = {r["status"]: r["count"] for r in got}
    assert set(m) == {"same", "only_a"}
    assert m["same"] == b.count()


def test_checksum_is_order_free_and_mergeable(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full = reconcile.table_checksum(docs, "text").collect()[0]
    shuffled = reconcile.table_checksum(
        docs.repartition(13, "doc_id"), "text"
    ).collect()[0]
    assert (full["n_rows"], full["checksum"]) == (
        shuffled["n_rows"], shuffled["checksum"]
    )
    h1 = reconcile.table_checksum(
        docs.filter(F.col("doc_id") % 2 == 0), "text").collect()[0]
    h2 = reconcile.table_checksum(
        docs.filter(F.col("doc_id") % 2 == 1), "text").collect()[0]
    assert h1["checksum"] + h2["checksum"] == full["checksum"]
    # sensitive: one changed row moves the checksum
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 0, F.lit("tampered")).otherwise(F.col("text")),
    )
    assert reconcile.table_checksum(mutated, "text").collect()[0][
        "checksum"] != full["checksum"]
