"""Custom stateful streaming operator: gap sessionization via
applyInPandasWithState (SURVEY §2.6 — the reference's long-lived
ingest daemon keeps per-upload progress state; the Spark-first
re-expression of "custom state machine over a stream" is
applyInPandasWithState on a keyed stream).

State per user_id: the open session (start, last_ts, n_events).
An incoming event whose gap from last_ts exceeds the limit CLOSES the
open session (emitted downstream) and opens a new one. Open sessions
stay in the state store across micro-batches — exactly-once via the
streaming checkpoint — and are emitted only when closed, so the
output is append-mode compatible.

Scale: state is O(active users), partitioned by the groupBy key
(user_id) across executors; each micro-batch shuffles only that
batch's events. The batch-mode twin (streaming/events.sessionize)
is the oracle: closed sessions here == batch sessions minus each
user's final (still-open) session — asserted in
tests/test_round3b.py.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# (session_start_us, last_ts_us, n_events) — epoch microseconds so the
# state store holds fixed-width longs, not timezone-carrying objects.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values()
        # pandas datetime64[ns] -> epoch microseconds
        us = ts.astype("int64").to_numpy() // 1000
        if state.exists:
            start_us, last_us, n_ev = state.get
        else:
            start_us = last_us = -1
            n_ev = 0
        closed: list[tuple[int, int, int]] = []
        for t in us:
            if start_us < 0:
                start_us, last_us, n_ev = t, t, 1
            elif t - last_us > gap_us:
                closed.append((start_us, last_us, n_ev))
                start_us, last_us, n_ev = t, t, 1
            else:
                last_us, n_ev = t, n_ev + 1
        state.update((int(start_us), int(last_us), int(n_ev)))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": pd.to_datetime(
                        [c[0] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [c[1] for c in closed], unit="us"
                    ),
                    "n_events": [c[2] for c in closed],
                }
            )

    return fn


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming gap sessionization over events(ts, user_id, ...).

    `events` must be a STREAMING DataFrame (readStream) — Spark
    rejects applyInPandasWithState in batch queries ("unsupported in
    batch query"); the batch twin is streaming/events.sessionize.
    """
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes * 60),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
