"""Temporal join/rollup operators over the events stream: as-of join,
bounded range join, multi-resolution (hypertable-style) rollup, exact
group quantiles, and ordered window frames (moving sum + lag).

These are the custom operators Spark's built-in API lacks as single
calls, re-expressed as compositions of DataFrame primitives (the
preferred strategy — no UDF needed anywhere here):

- as-of join = union the two sides, ONE window per user carrying the
  last right-side row forward, filter to left rows. One shuffle on
  user_id; never builds the per-user cross product.
- range join = time-bucket both sides by the radius, explode the left
  side into its 3 adjacent buckets, equi-join on (user, bucket), then
  the exact |dt| filter. Each qualifying pair matches in EXACTLY one
  bucket (the right row's own), so no dedup pass is needed. One
  shuffle keyed by (user, bucket) — never ts-cross-join.
- multi-resolution rollup = explode each event into its (resolution,
  bucket) assignments, ONE map-side-combined shuffle on (res, bucket,
  type) — the one-pass continuous-aggregate build.

Cross-engine determinism: timestamps are compared/bucketed in exact
integer microseconds (unix_micros / epoch_us); value sums use the
package-wide exact micro-unit convention (streaming/events.py).

Reference parity: geo-import has no event/time model — these extend
the engine for the training-pipeline/event use case (SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ASOF_LEFT = "purchase"
ASOF_RIGHT = "click"
RANGE_LEFT = "error"
RANGE_RIGHT = "click"
RANGE_RADIUS_S = 1800
ROLLUP_RES_S = (3600, 21600, 86400)  # 1h / 6h / 1d


def asof_join(events: DataFrame,
              left_type: str = ASOF_LEFT,
              right_type: str = ASOF_RIGHT) -> DataFrame:
    """For each left-type event, the latest right-type event of the
    same user with right.ts <= left.ts (inclusive; ties on ts broken
    toward the larger right event_id). Inner semantics: lefts with no
    preceding right are dropped.

    Plan: filter → tagged union → ONE window over user_id ordered by
    (ts, tag, event_id) carrying last(right_id) forward → filter to
    left rows. The sort key puts an equal-ts right BEFORE the left it
    should match, which is exactly the inclusive as-of contract.

    Output: (event_id, user_id, matched_event_id, lag_us).
    """
    # parquet loads ts as TIMESTAMP_NTZ; the session tz is pinned to UTC
    # (session.py), so the cast is the identity wall-clock -> epoch map
    # and matches DuckDB's epoch_us on the same NTZ value.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    left = events.filter(F.col("event_type") == left_type).select(
        "event_id", "user_id", us.alias("us"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("right_id"),
    )
    right = events.filter(F.col("event_type") == right_type).select(
        "event_id", "user_id", us.alias("us"),
        F.lit(0).alias("tag"),
        F.col("event_id").alias("right_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = left.unionByName(right).select(
        "event_id", "user_id", "us", "tag",
        F.last("right_id", ignorenulls=True).over(w).alias("m_id"),
        F.max(F.when(F.col("tag") == 0, F.col("us"))).over(w).alias("m_us"),
    )
    return (
        merged.filter((F.col("tag") == 1) & F.col("m_id").isNotNull())
        .select(
            "event_id", "user_id",
            F.col("m_id").alias("matched_event_id"),
            (F.col("us") - F.col("m_us")).alias("lag_us"),
        )
    )


SQL_ASOF_JOIN = """
WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS us
           FROM events WHERE event_type = '{left_type}'),
r AS (SELECT event_id, user_id, epoch_us(ts) AS us
      FROM events WHERE event_type = '{right_type}'),
j AS (
  SELECT l.event_id AS event_id, l.user_id AS user_id,
         r.event_id AS m_id, l.us - r.us AS lag_us,
         row_number() OVER (PARTITION BY l.event_id
                            ORDER BY r.us DESC, r.event_id DESC) AS rn
  FROM l JOIN r ON l.user_id = r.user_id AND r.us <= l.us
)
SELECT event_id, user_id, m_id AS matched_event_id, lag_us
FROM j WHERE rn = 1
"""


def range_join(events: DataFrame,
               left_type: str = RANGE_LEFT,
               right_type: str = RANGE_RIGHT,
               radius_s: int = RANGE_RADIUS_S) -> DataFrame:
    """All same-user (left, right) event pairs within +-radius seconds
    of each other.

    Output: (a_event_id, b_event_id, user_id, diff_us) with
    diff_us = left.us - right.us in [-radius, +radius] microseconds.
    """
    rad_us = radius_s * 1_000_000
    # parquet loads ts as TIMESTAMP_NTZ; the session tz is pinned to UTC
    # (session.py), so the cast is the identity wall-clock -> epoch map
    # and matches DuckDB's epoch_us on the same NTZ value.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bucket = F.floor(F.col("us") / rad_us)
    left = (
        events.filter(F.col("event_type") == left_type)
        .select(F.col("event_id").alias("a_event_id"), "user_id", us.alias("us"))
        .withColumn("b0", bucket)
        .withColumn("bucket", F.explode(F.array(F.col("b0") - 1, F.col("b0"), F.col("b0") + 1)))
        .drop("b0")
    )
    right = (
        events.filter(F.col("event_type") == right_type)
        .select(F.col("event_id").alias("b_event_id"), "user_id", us.alias("b_us"))
        .withColumn("bucket", F.floor(F.col("b_us") / rad_us))
    )
    return (
        left.join(right, ["user_id", "bucket"])
        .withColumn("diff_us", F.col("us") - F.col("b_us"))
        .filter(F.abs(F.col("diff_us")) <= rad_us)
        .select("a_event_id", "b_event_id", "user_id", "diff_us")
    )


SQL_RANGE_JOIN = """
WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS us
           FROM events WHERE event_type = '{left_type}'),
r AS (SELECT event_id, user_id, epoch_us(ts) AS us
      FROM events WHERE event_type = '{right_type}')
SELECT l.event_id AS a_event_id, r.event_id AS b_event_id,
       l.user_id AS user_id, l.us - r.us AS diff_us
FROM l JOIN r ON l.user_id = r.user_id
WHERE abs(l.us - r.us) <= {radius_s} * 1000000
"""


def rollup_multires(events: DataFrame,
                    resolutions_s: tuple[int, ...] = ROLLUP_RES_S) -> DataFrame:
    """Hypertable-style continuous aggregate: per event_type counts
    and exact micro-unit value sums at every resolution, one pass.

    Output: (res_s, bucket_start_us, event_type, n, total_micros).
    """
    # parquet loads ts as TIMESTAMP_NTZ; the session tz is pinned to UTC
    # (session.py), so the cast is the identity wall-clock -> epoch map
    # and matches DuckDB's epoch_us on the same NTZ value.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    res = F.explode(F.array(*[F.lit(r) for r in resolutions_s])).alias("res_s")
    exploded = events.select(
        "event_type", us.alias("us"),
        F.floor(F.col("value") * 1_000_000).cast("long").alias("vmicros"),
        res,
    )
    res_us = F.col("res_s").cast("long") * 1_000_000  # int32 would overflow at 1d
    bucket_us = F.floor(F.col("us") / res_us) * res_us
    return (
        exploded.groupBy("res_s", bucket_us.alias("bucket_start_us"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("vmicros").alias("total_micros"))
    )


QUANTILES = (0.5, 0.9, 0.99)


def group_quantiles(events: DataFrame,
                    quantiles: tuple[float, ...] = QUANTILES) -> DataFrame:
    """Exact per-type order-statistic quantiles of the value column
    (discrete/lower quantile: element at rank floor((n-1)*p) + 1 of
    the sorted group — deterministic, unlike interpolated percentiles
    whose FMA ordering differs across engines, and exact, unlike
    approx_percentile's sketch).

    Plan: one sort window per event_type (rank + count in the same
    window spec), then a pivot-style conditional aggregation — a
    second tiny shuffle on event_type. At scale the window's sort is
    the cost; for a fixed quantile set over a hot group this is the
    operator you replace with a t-digest — kept exact here because
    exactness is what the oracle verifies.

    Output: (event_type, n, q50_micros, q90_micros, q99_micros).
    """
    from pyspark.sql import Window

    micros = F.floor(F.col("value") * 1_000_000).cast("long")
    w = Window.partitionBy("event_type").orderBy("vmicros", "event_id")
    ranked = (
        events.select("event_type", "event_id", micros.alias("vmicros"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("event_type")))
    )
    aggs = [F.max("n").alias("n")]
    for q in quantiles:
        rank = F.floor((F.col("n") - 1) * q) + 1
        aggs.append(
            F.max(F.when(F.col("rn") == rank, F.col("vmicros"))).alias(
                f"q{int(q * 100)}_micros"
            )
        )
    return ranked.groupBy("event_type").agg(*aggs)


SQL_GROUP_QUANTILES = """
WITH r AS (
  SELECT event_type, CAST(floor(value * 1000000) AS BIGINT) AS vmicros,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(floor(value * 1000000) AS BIGINT), event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       {q_cols}
FROM r GROUP BY event_type
"""


def sql_group_quantiles(quantiles: tuple[float, ...] = QUANTILES) -> str:
    q_cols = ",\n       ".join(
        f"MAX(CASE WHEN rn = CAST(floor((n - 1) * {q}) AS BIGINT) + 1 "
        f"THEN vmicros END) AS q{int(q * 100)}_micros"
        for q in quantiles
    )
    return SQL_GROUP_QUANTILES.format(q_cols=q_cols)


MOVING_WINDOW = 5


def user_moving_agg(events: DataFrame, window_rows: int = MOVING_WINDOW) -> DataFrame:
    """Ordered per-user window frame: trailing N-row moving sum of the
    micro-unit value and the gap to the previous event — the
    lag/frame window-function family over the event stream. One
    shuffle on user_id; both measures share the same window spec so
    Spark computes them in a single Window operator.

    Output: (event_id, user_id, moving_sum_micros, gap_us).
    gap_us is NULL for each user's first event.
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    micros = F.floor(F.col("value") * 1_000_000).cast("long")
    base = events.select(
        "event_id", "user_id", us.alias("us"), micros.alias("vmicros")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    wlag = Window.partitionBy("user_id").orderBy("us", "event_id")
    return base.select(
        "event_id",
        "user_id",
        F.sum("vmicros").over(w).alias("moving_sum_micros"),
        (F.col("us") - F.lag("us").over(wlag)).alias("gap_us"),
    )


SQL_USER_MOVING_AGG = """
WITH b AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         CAST(floor(value * 1000000) AS BIGINT) AS vmicros
  FROM events
)
SELECT event_id, user_id,
       CAST(SUM(vmicros) OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN {preceding} PRECEDING AND CURRENT ROW) AS BIGINT)
         AS moving_sum_micros,
       us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap_us
FROM b
"""


SQL_ROLLUP_MULTIRES = """
WITH e AS (
  SELECT event_type, epoch_us(ts) AS us,
         CAST(floor(value * 1000000) AS BIGINT) AS vmicros,
         unnest([{res_list}]) AS res_s
  FROM events
)
SELECT res_s,
       CAST(floor(CAST(us AS DOUBLE) / (res_s * 1000000.0))
            * res_s * 1000000 AS BIGINT) AS bucket_start_us,
       event_type, COUNT(*) AS n,
       CAST(SUM(vmicros) AS BIGINT) AS total_micros
FROM e
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Session path mining (top event-type sequences)
# ---------------------------------------------------------------------------

SESSION_PATH_GAP_MIN = 30
SESSION_PATH_TOP_K = 50
SESSION_PATH_MAX_LEN = 5_000  # per-session guard (see docstring)


def session_paths(events: DataFrame,
                  gap_minutes: int = SESSION_PATH_GAP_MIN,
                  top_k: int = SESSION_PATH_TOP_K,
                  max_len: int = SESSION_PATH_MAX_LEN) -> DataFrame:
    """Top-k most frequent event-type paths across gap-based
    sessions — the clickstream "common journeys" rollup: each
    session's events in (us, event_id) order join into a '>'-
    delimited path string, then one global count per path.

    Exactness: session boundaries are exact integer µs-gap
    comparisons (the sessionize rule at µs precision with event_id
    tiebreaks); the path string is built from a sorted struct array,
    so the string — and the (n_sessions DESC, path) top-k order,
    paths being unique — is identical in both engines.

    Plan: ONE user_id exchange carries both windows (lag gap +
    running session id); the path build is a groupBy on (user_id,
    session) whose collect_list is bounded by session length; the
    final count is map-side combined on the path key and TakeOrdered
    cuts top-k. No joins, no data-sized driver state. Sessions
    longer than max_len are DROPPED before the array build (the
    ewma_scan/cusum guard, mirrored in SQL) — a bot session with
    millions of events can't blow the per-group array at 100x.

    Output: (path, n_sessions, n_users), top_k by
    (n_sessions DESC, path).
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e = events.select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    gap = F.col("us") - F.lag("us").over(w)
    wlen = Window.partitionBy("user_id", "sid")
    sess = (
        e.withColumn(
            "is_new", F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
        )
        .withColumn("sid", F.sum("is_new").over(w))
        # guard BEFORE the array build: oversized sessions never
        # reach collect_list, so the cap bounds executor memory,
        # not just the output
        .withColumn("sess_n", F.count(F.lit(1)).over(wlen))
        .filter(F.col("sess_n") <= int(max_len))
    )
    paths = (
        sess.groupBy("user_id", "sid")
        .agg(F.array_sort(
            F.collect_list(F.struct("us", "event_id", "event_type"))
        ).alias("seq"))
        .select(
            "user_id",
            F.array_join(
                F.transform(F.col("seq"), lambda x: x["event_type"]), ">"
            ).alias("path"),
        )
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_sessions").desc(), F.col("path"))
        .limit(int(top_k))
    )


def sql_session_paths(gap_minutes: int = SESSION_PATH_GAP_MIN,
                      top_k: int = SESSION_PATH_TOP_K,
                      max_len: int = SESSION_PATH_MAX_LEN) -> str:
    """Mirror: identical µs-gap windows, the same pre-aggregation
    session-length cap, string_agg with the same (us, event_id)
    order, same top-k cut."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    return f"""
WITH e AS (
  SELECT user_id, event_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
),
g AS (
  SELECT *, CASE WHEN us - lag(us) OVER w > {gap_us}
                   OR lag(us) OVER w IS NULL
                 THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                              ORDER BY us, event_id) AS sid
  FROM g
),
sc AS (
  SELECT *, COUNT(*) OVER (PARTITION BY user_id, sid) AS sess_n
  FROM s
),
p AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY us, event_id) AS path
  FROM sc WHERE sess_n <= {int(max_len)} GROUP BY user_id, sid
)
SELECT path, COUNT(*) AS n_sessions,
       COUNT(DISTINCT user_id) AS n_users
FROM p GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {int(top_k)}
"""


# ---------------------------------------------------------------------------
# Interval coverage (gaps-and-islands union length per user)
# ---------------------------------------------------------------------------


def interval_coverage(events: DataFrame) -> DataFrame:
    """Total covered time per user when every event opens an interval
    [us, us + vmi] (duration = the event's value in micro-units,
    deterministic from the corpus) — the classic overlapping-interval
    union via gaps-and-islands: a new island starts when an interval
    begins after the running max end of everything before it; each
    island contributes max(end) - min(start).

    Exactness: starts/ends/durations are exact int64 µs; island
    detection is an integer comparison and the covered sum an integer
    aggregate — no floats anywhere, hash parity structural.

    Plan: ONE user_id exchange carries both windows (running max end
    over the preceding frame + running island-id sum) and the two
    groupBys that follow (island rollup, user rollup) — the
    walk_staypoints single-exchange shape. No joins, no self-join on
    intervals (the O(n^2) naive overlap test this formulation
    replaces at scale).

    Output: (user_id, n_intervals, n_islands, covered_us).
    """
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    e = events.select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        (F.unix_micros(F.col("ts").cast("timestamp"))
         + F.floor(F.col("value") * 1_000_000).cast("long")).alias("end_us"),
    )
    isl = (
        e.withColumn("prev_max_end", F.max("end_us").over(wprev))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_max_end").isNull()
                | (F.col("us") > F.col("prev_max_end")), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("is_new").over(w))
    )
    per_island = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("n_iv"),
        (F.max("end_us") - F.min("us")).alias("len_us"),
    )
    return per_island.groupBy("user_id").agg(
        F.sum("n_iv").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("len_us").alias("covered_us"),
    )


SQL_INTERVAL_COVERAGE = """
WITH e AS (
  SELECT user_id, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         epoch_us(CAST(ts AS TIMESTAMP))
           + CAST(floor(value * 1000000) AS BIGINT) AS end_us
  FROM events
),
g AS (
  SELECT *,
         MAX(end_us) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS prev_max_end
  FROM e
),
h AS (
  SELECT *, CASE WHEN prev_max_end IS NULL OR us > prev_max_end
                 THEN 1 ELSE 0 END AS is_new
  FROM g
),
s AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                              ORDER BY us, event_id) AS island
  FROM h
),
pi AS (
  SELECT user_id, island, COUNT(*) AS n_iv,
         MAX(end_us) - MIN(us) AS len_us
  FROM s GROUP BY user_id, island
)
SELECT user_id, CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
       COUNT(*) AS n_islands, CAST(SUM(len_us) AS BIGINT) AS covered_us
FROM pi GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Seasonal load profile (day-of-week x hour-of-day)
# ---------------------------------------------------------------------------

US_PER_HOUR_T = 3_600_000_000
US_PER_DAY_T = 86_400_000_000


def seasonal_profile(events: DataFrame) -> DataFrame:
    """Per-type seasonal load profile: event count, exact micro-unit
    value sum, and mean per (event_type, day-of-week, hour-of-day) —
    the seasonal-naive baseline a forecasting pipeline subtracts
    before anomaly scoring.

    dow/hod derive from epoch µs by integer arithmetic (epoch day 0
    = Thursday, so dow = (days + 3) % 7 with Monday = 0), identical
    in both engines — no timezone/calendar library in the loop. The
    mean is the single closing double division.

    Plan: one map-side-combined aggregate on a <= |types|*168-value
    key; output dimension-sized at any input scale.

    Output: (event_type, dow, hod, n, sum_mi, mean_mi).
    """
    e = events.select(
        "event_type",
        ((F.expr(f"unix_micros(cast(ts as timestamp)) div {US_PER_DAY_T}")
          + 3) % 7).alias("dow"),
        (F.expr(f"unix_micros(cast(ts as timestamp)) div {US_PER_HOUR_T}")
         % 24).alias("hod"),
        F.floor(F.col("value") * 1_000_000).cast("long").alias("vmi"),
    )
    agg = e.groupBy("event_type", "dow", "hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vmi").alias("sum_mi"),
    )
    return agg.select(
        "event_type", "dow", "hod", "n", "sum_mi",
        (F.col("sum_mi").cast("double") / F.col("n").cast("double"))
        .alias("mean_mi"),
    )


SQL_SEASONAL_PROFILE = f"""
WITH e AS (
  SELECT event_type,
         (epoch_us(CAST(ts AS TIMESTAMP)) // {US_PER_DAY_T} + 3) % 7 AS dow,
         epoch_us(CAST(ts AS TIMESTAMP)) // {US_PER_HOUR_T} % 24 AS hod,
         CAST(floor(value * 1000000) AS BIGINT) AS vmi
  FROM events
),
agg AS (
  SELECT event_type, dow, hod, COUNT(*) AS n,
         CAST(SUM(vmi) AS BIGINT) AS sum_mi
  FROM e GROUP BY event_type, dow, hod
)
SELECT event_type, dow, hod, n, sum_mi,
       CAST(sum_mi AS DOUBLE) / CAST(n AS DOUBLE) AS mean_mi
FROM agg
"""
