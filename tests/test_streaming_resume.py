"""Kill-and-resume parity for STATEFUL STREAMING (VERDICT r4 #6 —
the streaming counterpart of test_itercheckpoint's durable batch
loops).

Recovery story under test: applyInPandasWithState state lives in the
HDFS-backed state store under `checkpointLocation`; the offset WAL +
commit log make micro-batches exactly-once into the sink. So a query
stopped cold between batches and restarted with the SAME checkpoint
must (a) restore every user's funnel progress — no re-emitted
transitions for stages already reached — and (b) drain the remaining
input to the identical final answer as the uninterrupted run and the
batch twin. That is the documented reason checkpointLocation suffices
for the streaming operators: state, offsets, and commits are all
under the one checkpoint root, unlike the batch loops which needed
their own `_SUCCESS`-gated round store (plans/itercheckpoint.py).
"""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from geo_import_spark.operators import funnel as batch_funnel
from geo_import_spark.streaming import funnel as sfunnel

_SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string"


def _slices(spark, sf_dir, n_slices=3):
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )
    pdf = events.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    bounds = [int(len(pdf) * i / n_slices) for i in range(n_slices + 1)]
    return events, [pdf.iloc[bounds[i] : bounds[i + 1]] for i in range(n_slices)]


def _write_slice(src, i, part):
    os.makedirs(src, exist_ok=True)
    tbl = pa.Table.from_pandas(part, preserve_index=False)
    ts_idx = tbl.schema.get_field_index("ts")
    tbl = tbl.set_column(ts_idx, "ts", tbl.column("ts").cast(pa.timestamp("us")))
    pq.write_table(tbl, f"{src}/{i:03d}.parquet")
    time.sleep(0.05)  # distinct mtimes -> deterministic replay order


def _drain(spark, src, ckpt, out):
    """Run the funnel stream over whatever is in `src` right now to
    completion (availableNow), then stop — each call is one 'process
    lifetime'; continuity across calls comes only from `ckpt`. The
    sink is a parquet FILE sink (fault-tolerant — the memory sink
    refuses checkpoint recovery by design), so the commit log also
    proves exactly-once delivery across the restart."""
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sfunnel.funnel_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    return spark.read.parquet(out).toPandas()


def test_streaming_funnel_kill_and_resume(spark, sf_dir, tmp_path):
    events, parts = _slices(spark, sf_dir, n_slices=3)
    src = str(tmp_path / "events_src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    # Phase 1: only the first time slice exists; drain it, then the
    # query object is gone (stand-in for a killed driver — nothing
    # survives in memory, only the checkpoint + sink directories).
    _write_slice(src, 0, parts[0])
    p1 = _drain(spark, src, ckpt, out)
    assert len(p1) > 0  # some users advanced in slice 0

    # Phase 2: the rest of the input arrives; a NEW query restarts
    # from the same checkpoint and drains to completion. `both` is the
    # sink's full contents — exactly what a downstream reader sees.
    _write_slice(src, 1, parts[1])
    _write_slice(src, 2, parts[2])
    both = _drain(spark, src, ckpt, out)
    p2_rows = len(both) - len(p1)

    # (a) State restored: a stage transition is emitted exactly once
    # per user across the two process lifetimes — a lost state store
    # would re-emit stage 1..k for users who advanced in phase 1.
    dup = both.groupby(["user_id", "stage_idx"]).size()
    assert (dup == 1).all(), dup[dup > 1].head()

    # (b) Final answer identical to the batch twin: per-stage distinct
    # user counts match funnel_counts on the full event table.
    got = both.groupby("stage_idx")["user_id"].nunique()
    expect = batch_funnel.funnel_counts(events).toPandas().set_index("stage_idx")
    for idx, row in expect.iterrows():
        assert int(got.get(idx, 0)) == int(row.n_users), (idx, row.stage)

    # (c) Per-user emission shape: one row per stage 1..max reached.
    per_user = both.groupby("user_id").agg(c=("stage_idx", "size"), m=("stage_idx", "max"))
    assert (per_user.c == per_user.m).all()

    # (d) The resumed run did real work (slice 0 alone must not have
    # completed the funnel for everyone) — guards against a vacuous
    # phase 2 making (a)/(b) trivially true.
    assert p2_rows > 0
