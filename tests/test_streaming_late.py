"""Watermark late-data semantics: in append mode a window finalizes
once the watermark passes it, and an event arriving AFTER that (late
beyond the watermark) is dropped — its window's emitted count must not
include it."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write(pdf, path):
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    i = tbl.schema.get_field_index("ts")
    tbl = tbl.set_column(i, "ts", tbl.column("ts").cast(pa.timestamp("us")))
    pq.write_table(tbl, path)


def test_late_event_beyond_watermark_is_dropped(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    t = lambda s: pd.Timestamp(f"2024-01-01 {s}")
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    # batch 1: window 00:00 gets one event; 03:10 advances the
    # watermark to 02:10, so window 00:00 finalizes and is emitted
    _write(pd.DataFrame(
        [[1, t("00:10"), 1, "click", 0.0],
         [2, t("03:10"), 1, "click", 0.0]], columns=cols),
        str(src / "000.parquet"))

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("append")  # append = emit only finalized windows
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # batch 1 fully processed -> watermark advanced to 02:10
        q.processAllAvailable()
        # batch 2: 00:20 is LATE beyond the watermark -> must be
        # dropped; 06:00 advances the watermark to 05:00 so window
        # 03:00 finalizes too
        _write(pd.DataFrame(
            [[3, t("00:20"), 1, "click", 0.0],
             [4, t("06:00"), 1, "click", 0.0]], columns=cols),
            str(src / "001.parquet"))
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        pd.Timestamp(r.win_start).strftime("%H:%M"): r.n
        for r in spark.table("late_drop").collect()
    }
    # window 00:00 finalized with ONE event — the late 00:20 arrival
    # was dropped, not merged; window 03:00 finalized with one;
    # window 06:00 never finalized (watermark ends at 05:00)
    assert got == {"00:00": 1, "03:00": 1}
