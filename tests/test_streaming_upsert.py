"""Streaming MERGE sink: micro-batched upserts through foreachBatch
equal one batch upsert; replaying a batch is idempotent."""

from pyspark.sql import functions as F

from geo_import_spark.plans.table import Table
from geo_import_spark.streaming import upsert as sup


def _base(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang")
    )


def test_streaming_upsert_equals_batch_merge(spark, sf_dir, tmp_path):
    base = _base(spark, sf_dir)
    seed = base.filter(F.col("doc_id") % 2 == 0)
    updates = base.filter(F.col("doc_id") % 3 == 0).withColumn(
        "text", F.concat(F.lit("v2 "), F.col("text"))
    )

    t = Table(str(tmp_path / "t_stream"))
    t.commit(spark, seed, mode="overwrite", stat_cols=["doc_id"])

    src = str(tmp_path / "updates")
    updates.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(updates.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = sup.upsert_sink(
        stream, t, ["doc_id"], checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)

    t2 = Table(str(tmp_path / "t_batch"))
    t2.commit(spark, seed, mode="overwrite", stat_cols=["doc_id"])
    t2.upsert(spark, updates, ["doc_id"])

    got = sorted(map(tuple, t.read(spark).collect()))
    exp = sorted(map(tuple, t2.read(spark).collect()))
    assert got == exp
    # updated keys carry v2 text; untouched evens survive
    texts = {r[0]: r[1] for r in got}
    assert all(texts[d].startswith("v2 ") for d in texts if d % 3 == 0)


def test_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    base = _base(spark, sf_dir)
    t = Table(str(tmp_path / "t_replay"))
    t.commit(spark, base.limit(50), mode="overwrite", stat_cols=["doc_id"])
    upd = base.limit(10).withColumn("text", F.lit("same-update"))
    t.upsert(spark, upd, ["doc_id"])
    once = sorted(map(tuple, t.read(spark).collect()))
    t.upsert(spark, upd, ["doc_id"])  # replay
    twice = sorted(map(tuple, t.read(spark).collect()))
    assert once == twice
