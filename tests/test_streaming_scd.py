"""Streaming SCD2 == batch scd2_history minus each user's open
(is_current) row."""

import pandas as pd

from geo_import_spark.operators import scd
from geo_import_spark.streaming import scd as sscd


def test_scd2_stream_matches_batch(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "ev_src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    hist = sscd.scd2_stream(stream)
    q = (
        hist.writeStream.format("memory")
        .queryName("closed_scd")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql(
            "SELECT user_id, state, version, valid_from_us, valid_to_us "
            "FROM closed_scd"
        )
        .toPandas()
        .sort_values(["user_id", "version"])
        .reset_index(drop=True)
    )

    batch = scd.scd2_history(events).toPandas()
    expected = (
        batch[~batch["is_current"]]
        .drop(columns=["is_current"])
        .sort_values(["user_id", "version"])
        .reset_index(drop=True)
    )
    assert len(got) == len(expected) > 0
    pd.testing.assert_frame_equal(
        got[expected.columns], expected, check_dtype=False, check_exact=True
    )
    # every user's current row is exactly the one the stream kept open
    n_users = events.select("user_id").distinct().count()
    assert batch["is_current"].sum() == n_users
