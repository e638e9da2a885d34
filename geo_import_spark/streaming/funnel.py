"""Custom stateful streaming operator: ordered-funnel progression via
applyInPandasWithState.

Batch twin: operators/funnel.funnel_counts (strict min-time funnel).
State per user: the earliest completion time of each stage reached so
far (epoch µs, −1 = not reached). An event of stage k's type advances
the user iff stage k−1 is reached and the event is STRICTLY after its
completion time and stage k is still unreached — under in-order
delivery per user (the file-source replay used in tests, or any
source with per-key ordering) the first qualifying event IS the
minimum, so emitted transitions equal the batch semantics exactly;
out-of-order sources degrade gracefully to "first-seen qualifying"
semantics (the standard streaming funnel tradeoff — exact min-time
would need per-stage full event retention).

Output: one append-mode row per stage ADVANCE —
(user_id, stage_idx, stage, t_us). Aggregating count-distinct users
per stage_idx downstream reproduces funnel_counts.

Scale: state is |active users| × |stages| longs, partitioned by the
groupBy key; each micro-batch shuffles only its own events.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.funnel import FUNNEL_STAGES

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage_idx", T.LongType()),
        T.StructField("stage", T.StringType()),
        T.StructField("t_us", T.LongType()),
    ]
)


def _state_schema(n_stages: int) -> T.StructType:
    return T.StructType(
        [T.StructField(f"t{i}", T.LongType()) for i in range(n_stages)]
    )


def _funnel_fn(stages: tuple[str, ...]):
    idx_of = {s: i for i, s in enumerate(stages)}

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pdf = pd.concat(list(pdfs))
        # per-batch deterministic order: (ts, event_id)
        pdf = pdf.sort_values(["ts", "event_id"])
        t = list(state.get) if state.exists else [-1] * len(stages)
        out: list[tuple[int, int, str, int]] = []
        for ts, etype in zip(
            pdf["ts"].astype("int64").to_numpy() // 1000,
            pdf["event_type"].to_numpy(),
        ):
            i = idx_of.get(etype)
            if i is None or t[i] >= 0:
                continue
            if i == 0 or (t[i - 1] >= 0 and ts > t[i - 1]):
                t[i] = int(ts)
                out.append((user_id, i + 1, stages[i], int(ts)))
        state.update(tuple(t))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "stage_idx", "stage", "t_us"]
            )

    return fn


def funnel_stream(events: DataFrame,
                  stages: tuple[str, ...] = FUNNEL_STAGES) -> DataFrame:
    """Streaming funnel progression over a STREAMING events frame
    (event_id, ts, user_id, event_type, ...) — Spark restricts
    applyInPandasWithState to streaming queries; the batch twin is
    operators/funnel.funnel_counts."""
    return (
        events.select("event_id", "ts", "user_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_fn(stages),
            outputStructType=OUT_SCHEMA,
            stateStructType=_state_schema(len(stages)),
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
