"""Type-2 slowly-changing-dimension (SCD2) history build from a
change log — the standard warehouse transform that turns an
observation stream (entity, ts, state) into versioned validity
intervals [valid_from, valid_to) with an is_current flag.

Gaps-and-islands without a groupBy: one lag() marks state changes,
a running sum numbers the islands, and — because an island's
valid_from IS the timestamp of its change row — filtering to the
change rows replaces the per-island aggregate entirely. valid_to is
the lead() of valid_from over the same entity partitioning, so the
WHOLE operator is two window passes and a filter over ONE Exchange
on the entity key (the dup_coverage single-partitioning discipline).

Exactness: timestamps cross engines as epoch micros (module
convention, timeseries.py), versions and flags are exact
integers/booleans, states are strings — hash parity is structural.

Scale (100 TB): one shuffle on the entity key, window state is one
row of lookback; no joins, no aggregation, output ≤ input. MERGE of
a new day's changes into an existing SCD2 table composes with
Table.upsert (plans/table.py) by re-running the islands over the
(current ∪ delta) slice of touched entities only.

Reference parity: geo-import has no dimension-history machinery —
this extends the table-format family (frame_diff, snapshot_delta,
Table) the engine adds on top of the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(events: DataFrame) -> DataFrame:
    """(user_id, state, version, valid_from_us, valid_to_us,
    is_current): one row per maximal run of equal event_type per
    user, ordered by (ts, event_id); valid_to_us is exclusive (the
    next run's valid_from) and NULL on the current row."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wv = Window.partitionBy("user_id").orderBy("version")
    e = events.select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"),
        "event_id",
        F.col("event_type").alias("state"),
    )
    marked = e.withColumn(
        "chg",
        F.when(
            F.lag("state").over(w).isNull()
            | (F.lag("state").over(w) != F.col("state")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("version", F.sum("chg").over(w))
    starts = marked.filter(F.col("chg") == 1)
    return starts.select(
        "user_id",
        "state",
        "version",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(wv).alias("valid_to_us"),
    ).withColumn("is_current", F.col("valid_to_us").isNull())


SQL_SCD2_HISTORY = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         event_type AS state
  FROM events
),
marked AS (
  SELECT user_id, ts_us, event_id, state,
         CASE WHEN LAG(state) OVER w IS NULL
                OR LAG(state) OVER w <> state
              THEN 1 ELSE 0 END AS chg
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
ver AS (
  SELECT user_id, ts_us, state, chg,
         CAST(SUM(chg) OVER (PARTITION BY user_id
                             ORDER BY ts_us, event_id) AS BIGINT)
           AS version
  FROM marked
)
SELECT user_id, state, version,
       ts_us AS valid_from_us,
       LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY version)
         AS valid_to_us,
       LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY version)
         IS NULL AS is_current
FROM ver WHERE chg = 1
"""
