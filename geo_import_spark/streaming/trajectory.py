"""Streaming staypoint detection: the stateful twin of
operators/trajectory.staypoints over a live ping stream.

State per track (cust): the last seen ping and the OPEN run
(start index, ping count, coordinate sums, anchor). A ping whose hop
from the last one exceeds eps CLOSES the open run — emitted downstream
iff it reached min_n pings — and opens a new run at the ping. Open
runs live in the state store across micro-batches (exactly-once via
the streaming checkpoint) and only closed runs are emitted, so the
output is append-mode compatible.

Equivalence contract (tested in tests/test_streaming_staypoints.py):
closed staypoints == batch staypoints minus each track's FINAL run
(still open in the state store when input drains). Like
sessionize_stream, pings are sorted by index inside each micro-batch
and assumed in order across batches per key (the file/Kafka
per-partition ordering a track naturally has).

Scale: state is O(active tracks) and fixed-width (7 longs); each
micro-batch shuffles only its own pings, keyed by cust.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from geo_import_spark.operators.trajectory import STAY_EPS_U, STAY_MIN_N

STAY_SCHEMA = T.StructType(
    [
        T.StructField("cust", T.LongType()),
        T.StructField("n_pings", T.LongType()),
        T.StructField("start_i", T.LongType()),
        T.StructField("end_i", T.LongType()),
        T.StructField("ax", T.LongType()),
        T.StructField("ay", T.LongType()),
        T.StructField("cx", T.DoubleType()),
        T.StructField("cy", T.DoubleType()),
    ]
)

# (last_i, last_x, last_y, run_start_i, run_n, run_sum_x, run_sum_y,
#  run_ax, run_ay) — fixed-width longs only.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_i", T.LongType()),
        T.StructField("last_x", T.LongType()),
        T.StructField("last_y", T.LongType()),
        T.StructField("start_i", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_x", T.LongType()),
        T.StructField("sum_y", T.LongType()),
        T.StructField("ax", T.LongType()),
        T.StructField("ay", T.LongType()),
    ]
)


def _stay_fn(eps_u: int, min_n: int):
    eps2 = int(eps_u) * int(eps_u)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (cust,) = key
        pdf = pd.concat(list(pdfs)).sort_values("i")
        if state.exists:
            (last_i, last_x, last_y, start_i, n,
             sum_x, sum_y, ax, ay) = state.get
        else:
            last_i = None
            start_i = n = sum_x = sum_y = ax = ay = 0
        closed: list[tuple] = []
        for i, x, y in zip(
            pdf["i"].to_numpy(), pdf["x"].to_numpy(), pdf["y"].to_numpy()
        ):
            i, x, y = int(i), int(x), int(y)
            if last_i is None:
                start_i, n, sum_x, sum_y, ax, ay = i, 1, x, y, x, y
            else:
                dx, dy = x - last_x, y - last_y
                if dx * dx + dy * dy > eps2:
                    if n >= min_n:
                        closed.append(
                            (cust, n, start_i, last_i, ax, ay,
                             sum_x / n, sum_y / n)
                        )
                    start_i, n, sum_x, sum_y, ax, ay = i, 1, x, y, x, y
                else:
                    n, sum_x, sum_y = n + 1, sum_x + x, sum_y + y
            last_i, last_x, last_y = i, x, y
        state.update(
            (int(last_i), int(last_x), int(last_y), int(start_i), int(n),
             int(sum_x), int(sum_y), int(ax), int(ay))
        )
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["cust", "n_pings", "start_i", "end_i",
                         "ax", "ay", "cx", "cy"],
            )

    return fn


def staypoints_stream(
    pings: DataFrame,
    eps_u: int = STAY_EPS_U,
    min_n: int = STAY_MIN_N,
) -> DataFrame:
    """Streaming staypoints over pings(cust, i, x, y).

    `pings` must be a STREAMING DataFrame (readStream); the batch twin
    is operators/trajectory.staypoints.
    """
    return (
        pings.select("cust", "i", "x", "y")
        .groupBy("cust")
        .applyInPandasWithState(
            _stay_fn(eps_u, min_n),
            outputStructType=STAY_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
