"""Streaming SCD2: the stateful twin of operators/scd.scd2_history.

State per user_id: the OPEN dimension row (state string, its
valid_from, its version). An incoming observation with a different
state CLOSES the open row — emitted downstream with valid_to = the
new row's valid_from — and opens the next version. Open rows live in
the state store across micro-batches (exactly-once via the streaming
checkpoint) and are emitted only when closed, so the output is
append-mode compatible; the batch twin's is_current rows are exactly
the rows still open here (asserted in tests/test_streaming_scd.py).

Scale: state is O(active entities) — one short row each — hash
partitioned by the groupBy key; each micro-batch shuffles only its
own observations. This is the streaming MERGE pattern for type-2
dimensions: closed rows append to the history table, open rows
materialize on demand from the state snapshot (or a final close-out
pass at stream end).

In-order contract: like the batch build, versioning follows
(ts, event_id) order; late events older than the open row would need
a watermarked reorder buffer upstream (streaming/dedup.py's
watermark discipline) — out of scope for the twin, which feeds
time-ordered micro-batches.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SCD_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("state", T.StringType()),
        T.StructField("version", T.LongType()),
        T.StructField("valid_from_us", T.LongType()),
        T.StructField("valid_to_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur_state", T.StringType()),
        T.StructField("valid_from_us", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
)


def _scd_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    pdf = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    if state.exists:
        cur, from_us, ver = state.get
    else:
        cur, from_us, ver = None, -1, 0
    closed: list[tuple[str, int, int, int]] = []
    for ts_us, st in zip(pdf["ts_us"].to_numpy(), pdf["state"]):
        if cur is None:
            cur, from_us, ver = st, int(ts_us), 1
        elif st != cur:
            closed.append((cur, ver, from_us, int(ts_us)))
            cur, from_us, ver = st, int(ts_us), ver + 1
    state.update((cur, int(from_us), int(ver)))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "state": [c[0] for c in closed],
                "version": [c[1] for c in closed],
                "valid_from_us": [c[2] for c in closed],
                "valid_to_us": [c[3] for c in closed],
            }
        )


def scd2_stream(events: DataFrame) -> DataFrame:
    """Streaming SCD2 over events(user_id, ts, event_id, event_type).

    `events` must be a STREAMING DataFrame; the batch twin is
    operators/scd.scd2_history."""
    obs = events.select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"),
        "event_id",
        F.col("event_type").alias("state"),
    )
    return obs.groupBy("user_id").applyInPandasWithState(
        _scd_fn,
        outputStructType=SCD_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
