"""Per-file Bloom point-lookup index: correctness (no false
negatives), real file skipping on scattered keys, and snapshot
immutability of the bloom commit."""

from pyspark.sql import functions as F

from geo_import_spark.plans.table import Table


def _make_table(spark, root, n_files=8, rows=4000):
    t = Table(root)
    df = (
        spark.range(rows)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        # hash-repartition scatters each key range across all files,
        # which defeats min/max pruning — the bloom's use case
        .repartition(n_files, "v")
    )
    t.commit(spark, df, stat_cols=["k"])
    return t


def test_bloom_lookup_correct_and_prunes(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "tbl"))
    n_files = len(t.current_snapshot()["files"])
    t.add_blooms(spark, ["k"])

    # every key must be findable (no false negatives)
    for key in (0, 1234, 3999):
        got = t.read_lookup(spark, "k", key).collect()
        assert [r.k for r in got] == [key]

    # a point key lives in exactly one file; bloom fp-rate at this
    # fill is small, so candidates must be well under the file count
    cand = t.lookup_files(spark, "k", 1234)
    assert 1 <= len(cand) < n_files

    # absent key: zero rows, and usually zero files
    assert t.read_lookup(spark, "k", 999_999).count() == 0


def test_bloom_commit_preserves_data_and_history(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "tbl"))
    before = t.current_snapshot()
    t.add_blooms(spark, ["k"])
    after = t.current_snapshot()
    # same file set, new snapshot id, parent chain intact
    assert {f["path"] for f in after["files"]} == {
        f["path"] for f in before["files"]
    }
    assert after["snapshot_id"] != before["snapshot_id"]
    assert after["parent_id"] == before["snapshot_id"]
    assert t.read(spark).count() == 4000


def test_unindexed_files_never_skipped(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "tbl"), n_files=4)
    t.add_blooms(spark, ["k"])
    # append new data WITHOUT blooms: lookups must still see it
    extra = spark.createDataFrame([(100000, 1)], "k long, v long")
    t.commit(spark, extra, mode="append", stat_cols=["k"])
    got = t.read_lookup(spark, "k", 100000).collect()
    assert [r.k for r in got] == [100000]
