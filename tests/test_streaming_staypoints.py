"""Streaming staypoints == batch staypoints minus each track's final
(still-open) run."""

import pandas as pd

from geo_import_spark.operators import trajectory
from geo_import_spark.streaming import trajectory as straj


def test_staypoints_stream_matches_batch(spark, sf_dir, tmp_path):
    walk = trajectory.walk_points(spark, sf_dir)
    src = str(tmp_path / "walk_src")
    walk.write.parquet(src)

    stream = spark.readStream.schema(walk.schema).parquet(src)
    stays = straj.staypoints_stream(stream)
    q = (
        stays.writeStream.format("memory")
        .queryName("closed_stays")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql(
        "SELECT cust, n_pings, start_i, end_i, ax, ay, cx, cy "
        "FROM closed_stays"
    ).toPandas()

    batch = trajectory.staypoints(walk).toPandas()
    # each track's FINAL run is still open in the state store; earlier
    # runs are closed by a later eps-breaking hop. The final run is the
    # one containing the track's last ping — max start_i per cust IF it
    # passed the min_n filter (otherwise nothing to subtract).
    last_ping = (
        walk.groupBy("cust").agg({"i": "max"}).toPandas()
        .rename(columns={"max(i)": "last_i"})
    )
    merged = batch.merge(last_ping, on="cust")
    is_open = merged["end_i"] == merged["last_i"]
    expected = (
        merged[~is_open]
        .drop(columns=["stay_id", "last_i"])
        .sort_values(["cust", "start_i"])
        .reset_index(drop=True)
    )
    got = got.sort_values(["cust", "start_i"]).reset_index(drop=True)
    assert len(got) == len(expected)
    pd.testing.assert_frame_equal(
        got[expected.columns], expected, check_dtype=False, check_exact=True
    )
    assert len(got) > 0
