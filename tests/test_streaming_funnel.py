"""Streaming funnel vs the batch twin: stage transitions emitted over
ordered micro-batches must reproduce funnel_counts exactly, with state
carrying stage progress across batches."""

import glob
import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from geo_import_spark.operators import funnel as batch_funnel
from geo_import_spark.streaming import funnel as sfunnel


def _write_time_sliced(df, src, n_slices=3):
    """Write n time-ordered parquet files so maxFilesPerTrigger=1
    replays the stream in per-user ts order (file-source ordering is
    by modification time; slices are written sequentially)."""
    os.makedirs(src, exist_ok=True)
    pdf = df.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    bounds = [int(len(pdf) * i / n_slices) for i in range(n_slices + 1)]
    for i in range(n_slices):
        part = pdf.iloc[bounds[i]:bounds[i + 1]]
        tbl = pa.Table.from_pandas(part, preserve_index=False)
        # micro-second NTZ timestamps: what the Spark file source
        # expects for a `timestamp_ntz` schema column
        ts_idx = tbl.schema.get_field_index("ts")
        tbl = tbl.set_column(
            ts_idx, "ts", tbl.column("ts").cast(pa.timestamp("us"))
        )
        pq.write_table(tbl, f"{src}/{i:03d}.parquet")
        time.sleep(0.05)  # distinct mtimes -> deterministic replay order


def test_streaming_funnel_matches_batch(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )
    src = str(tmp_path / "events_sliced")
    _write_time_sliced(events, src)
    assert len(glob.glob(f"{src}/*.parquet")) == 3

    stream = (
        spark.readStream.schema("event_id long, ts timestamp_ntz, "
                                "user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sfunnel.funnel_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = (
        spark.sql("SELECT stage_idx, stage, count(DISTINCT user_id) AS n "
                  "FROM funnel_stream_out GROUP BY 1, 2")
        .toPandas().set_index("stage_idx")
    )
    expect = (
        batch_funnel.funnel_counts(events).toPandas().set_index("stage_idx")
    )
    for idx, row in expect.iterrows():
        n_stream = int(got.loc[idx, "n"]) if idx in got.index else 0
        assert n_stream == int(row.n_users), (idx, row.stage)
    # a user reaching stage k emits exactly one row per stage 1..k
    per_user = spark.sql(
        "SELECT user_id, count(*) c, max(stage_idx) m "
        "FROM funnel_stream_out GROUP BY user_id"
    ).toPandas()
    assert (per_user.c == per_user.m).all()
