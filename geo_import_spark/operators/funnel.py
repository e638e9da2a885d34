"""Product-analytics operators over the event stream: ordered funnel,
weekly retention cohorts, last-touch attribution, and event-type
transition counts.

These compose the engine's event layer (streaming/events.py,
operators/temporal.py) into the four queries every analytics
deployment runs daily. They follow the package's portability
conventions:

- Timestamps cross engines as **integer microseconds**
  (`unix_micros` / DuckDB `epoch_us` on the same NTZ value), and
  calendar bucketing is **integer day/week arithmetic on epoch
  micros** (floor-div), never engine calendar functions — week
  truncation is then bit-identical everywhere.
- Ordering ties break on `event_id` (unique), so window `last()` and
  the oracle's `ORDER BY ... LIMIT 1` pick the same row.
- Every per-user computation keys its shuffle on `user_id`; the
  sequential funnel stages re-join on the SAME key, so Catalyst
  reuses one exchange instead of reshuffling the fact per stage.

Scale: all four are one-shuffle-per-user-key plans with map-side
combine on the final small aggregates; none collect to the driver.
Reference parity note: geo-import has no event analytics — this
module extends the engine per the brief's training-data-pipeline
goal, mirroring how streaming/events.py extends §2.6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000

FUNNEL_STAGES = ("view", "click", "purchase")


def _us() -> F.Column:
    # parquet timestamps load as TIMESTAMP_NTZ; cast first (temporal.py
    # convention) so unix_micros matches DuckDB's epoch_us.
    return F.unix_micros(F.col("ts").cast("timestamp"))


def funnel_counts(events: DataFrame,
                  stages: tuple[str, ...] = FUNNEL_STAGES) -> DataFrame:
    """Ordered funnel: how many users reached each stage, where stage
    k requires an event of type stages[k] STRICTLY AFTER the user's
    earliest completion of stage k-1 (min-time semantics, the standard
    product-funnel definition).

    Output: (stage_idx: long 1-based, stage: string, n_users: long).

    Plan: stage 1 is one aggregate on user_id; each later stage joins
    the previous stage's (user, t) rows back to the events on
    user_id — the same shuffle key every round, so the fact table is
    exchanged ONCE and each stage's probe side is the (shrinking)
    qualified-user set.
    """
    base = events.select("user_id", "event_type", _us().alias("us"))
    reached: DataFrame | None = None
    prev: DataFrame | None = None
    for idx, stage in enumerate(stages):
        if prev is None:
            cur = (
                base.filter(F.col("event_type") == stage)
                .groupBy("user_id")
                .agg(F.min("us").alias("t"))
            )
        else:
            cur = (
                base.filter(F.col("event_type") == stage)
                .join(prev.select("user_id", F.col("t").alias("t_prev")),
                      "user_id")
                .filter(F.col("us") > F.col("t_prev"))
                .groupBy("user_id")
                .agg(F.min("us").alias("t"))
            )
        row = cur.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(idx + 1).cast("long").alias("stage_idx"),
            F.lit(stage).alias("stage"),
            "n_users",
        )
        reached = row if reached is None else reached.unionByName(row)
        prev = cur
    return reached


def sql_funnel_counts(stages: tuple[str, ...] = FUNNEL_STAGES) -> str:
    ctes, prev = [], None
    for i, stage in enumerate(stages):
        name = f"m{i + 1}"
        if prev is None:
            ctes.append(
                f"{name} AS (SELECT user_id, min(epoch_us(ts)) AS t "
                f"FROM events WHERE event_type = '{stage}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"{name} AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t "
                f"FROM events e JOIN {prev} p ON e.user_id = p.user_id "
                f"WHERE e.event_type = '{stage}' AND epoch_us(e.ts) > p.t "
                f"GROUP BY e.user_id)"
            )
        prev = name
    selects = " UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS stage_idx, '{s}' AS stage, "
        f"count(*) AS n_users FROM m{i + 1}"
        for i, s in enumerate(stages)
    )
    return "WITH " + ", ".join(ctes) + " " + selects


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly retention triangle: users bucketed by the epoch-week of
    their first event (cohort), counted as retained in every later
    week they are active.

    Weeks are `floor(epoch_us / day_us / 7)` — pure integer division,
    identical in both engines (no calendar/timezone semantics).

    Output: (cohort_week, week_offset, n_users), offset 0 = the
    cohort's own week.

    Plan: first-week aggregate and the activity join both key on
    user_id (one exchange); the (cohort, offset) aggregate counts
    DISTINCT users exactly — at 100 TB swap for approx_count_distinct
    or a pre-distinct on (user, week), which this plan already does.
    """
    e = (
        events.select("user_id", _us().alias("us"))
        # `div` is Spark's exact integer division on longs — no
        # double rounding anywhere in the bucketing
        .select("user_id",
                F.expr(f"us div {US_PER_DAY} div 7").alias("week"))
        .distinct()
    )
    first = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        e.join(first, "user_id")
        .select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


SQL_RETENTION_COHORTS = """
WITH e AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) // 7 AS week
  FROM events
),
first AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id)
SELECT cohort_week, week - cohort_week AS week_offset, count(*) AS n_users
FROM e JOIN first USING (user_id)
GROUP BY cohort_week, week - cohort_week
"""


ATTRIB_CONVERT = "purchase"
ATTRIB_WINDOW_DAYS = 7


def last_touch_attribution(events: DataFrame,
                           convert: str = ATTRIB_CONVERT,
                           window_days: int = ATTRIB_WINDOW_DAYS) -> DataFrame:
    """Last-touch attribution: for every conversion event, the type of
    the user's most recent NON-conversion event in the preceding
    window_days; conversions with no touch in the window attribute to
    '(none)'.

    "Most recent" orders by (us, event_id) — event_id is unique, so
    the window `last(..., ignoreNulls)` here and the oracle's
    lexicographic `(us, event_id) <` + `ORDER BY ... LIMIT 1` agree
    even on timestamp ties.

    Output: (touch_type, n_conversions).

    Plan: ONE window pass over the user_id shuffle (no self-join of
    the event table); the final aggregate is touch-type-sized.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = events.select("event_id", "user_id", "event_type", _us().alias("us"))
    touch = F.last(
        F.when(F.col("event_type") != convert,
               F.struct("us", "event_type")),
        ignorenulls=True,
    ).over(w)
    conv = (
        e.withColumn("touch", touch)
        .filter(F.col("event_type") == convert)
        .select(
            F.when(
                F.col("touch").isNotNull()
                & (F.col("touch.us")
                   >= F.col("us") - F.lit(window_days * US_PER_DAY)),
                F.col("touch.event_type"),
            ).otherwise(F.lit("(none)")).alias("touch_type")
        )
    )
    return conv.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_conversions")
    )


SQL_LAST_TOUCH_ATTRIBUTION = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
),
conv AS (
  SELECT p.user_id, p.us, p.event_id,
         (SELECT t.event_type FROM e t
          WHERE t.user_id = p.user_id
            AND t.event_type <> '{ATTRIB_CONVERT}'
            AND (t.us, t.event_id) < (p.us, p.event_id)
            AND t.us >= p.us - {ATTRIB_WINDOW_DAYS} * 86400000000
          ORDER BY t.us DESC, t.event_id DESC LIMIT 1) AS touch_type
  FROM e p WHERE p.event_type = '{ATTRIB_CONVERT}'
)
SELECT COALESCE(touch_type, '(none)') AS touch_type,
       count(*) AS n_conversions
FROM conv GROUP BY 1
"""
# note: the oracle's window test `t.us >= p.us - 7d` sits INSIDE the
# correlated subquery while the Spark plan tests it AFTER picking the
# lexicographic-last touch. They agree because us is monotone in the
# (us, event_id) order: the last preceding non-conversion event is
# in-window iff the window-filtered candidate set is non-empty and its
# max equals it — see test_attribution_window_edge for the boundary.


def event_transitions(events: DataFrame) -> DataFrame:
    """Per-user consecutive event-type transition counts (the Markov
    edge list): pairs (prev_type -> type) of adjacent events in
    (us, event_id) order.

    Output: (prev_type, next_type, n). One window pass on the
    user_id shuffle; the aggregate is |types|² rows.
    """
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e = events.select("event_id", "user_id", "event_type", _us().alias("us"))
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_EVENT_TRANSITIONS = """
WITH e AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, count(*) AS n
FROM e WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


def cohort_conversion(events: DataFrame) -> DataFrame:
    """Cohort × funnel composite: users cohorted by the epoch-week of
    their FIRST signup, with the fraction that purchased strictly
    after it. Counts are exact; the rate is one double division.

    Output: (cohort_week, n_users, n_converted, conversion).

    Plan: two per-user aggregates (first signup, purchase-after
    existence) sharing the user_id exchange, then a cohort-week-sized
    aggregate.
    """
    e = events.select("user_id", "event_type", _us().alias("us"))
    first_signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("signup_us"))
    )
    purchased = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_signup, "user_id")
        .filter(F.col("us") > F.col("signup_us"))
        .select("user_id").distinct()
        .withColumn("converted", F.lit(1))
    )
    cohorts = first_signup.select(
        "user_id",
        F.expr(f"signup_us div {US_PER_DAY} div 7").alias("cohort_week"),
    ).join(purchased.select("user_id", "converted"), "user_id", "left")
    return (
        cohorts.groupBy("cohort_week")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.coalesce("converted", F.lit(0))).alias("n_converted"),
        )
        .select(
            "cohort_week", "n_users", "n_converted",
            (F.col("n_converted").cast("double")
             / F.col("n_users").cast("double")).alias("conversion"),
        )
    )


SQL_COHORT_CONVERSION = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
first_signup AS (
  SELECT user_id, min(us) AS signup_us FROM e
  WHERE event_type = 'signup' GROUP BY user_id
),
purchased AS (
  SELECT DISTINCT e.user_id, 1 AS converted
  FROM e JOIN first_signup USING (user_id)
  WHERE e.event_type = 'purchase' AND e.us > signup_us
),
cohorts AS (
  SELECT f.user_id,
         CAST(signup_us // 86400000000 AS BIGINT) // 7 AS cohort_week,
         COALESCE(p.converted, 0) AS converted
  FROM first_signup f LEFT JOIN purchased p ON f.user_id = p.user_id
)
SELECT cohort_week, count(*) AS n_users,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       CAST(SUM(converted) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS conversion
FROM cohorts GROUP BY cohort_week
"""


LAG_QUANTILES = (0.5, 0.9, 0.99)


def conversion_lag_quantiles(
    events: DataFrame,
    quantiles: tuple[float, ...] = LAG_QUANTILES,
) -> DataFrame:
    """Exact order-statistic quantiles of the signup→purchase lag
    (first purchase strictly after the first signup, per converted
    user) — discrete/lower quantile at rank floor((n−1)·p)+1 with a
    (lag, user_id) total order, the temporal.group_quantiles
    discipline (deterministic, unlike interpolated percentiles).

    Output (one row): (n, q50_us, q90_us, q99_us).

    Plan: the two per-user reductions share the user_id exchange;
    quantiles sort |converted users| reduced rows once.
    """
    from pyspark.sql import Window

    e = events.select("user_id", "event_type", _us().alias("us"))
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("us").alias("s_us"))
    )
    lag = (
        e.filter(F.col("event_type") == "purchase")
        .join(signup, "user_id")
        .filter(F.col("us") > F.col("s_us"))
        .groupBy("user_id")
        .agg(F.min(F.col("us") - F.col("s_us")).alias("lag_us"))
    )
    w = Window.orderBy("lag_us", "user_id")
    ranked = (
        lag.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(
            Window.partitionBy(F.lit(1))))
    )
    aggs = [F.max("n").alias("n")]
    for q in quantiles:
        rank = F.floor((F.col("n") - 1) * q) + 1
        aggs.append(
            F.max(F.when(F.col("rn") == rank, F.col("lag_us")))
            .alias(f"q{int(q * 100)}_us")
        )
    return ranked.agg(*aggs)


def sql_conversion_lag_quantiles(
    quantiles: tuple[float, ...] = LAG_QUANTILES,
) -> str:
    q_cols = ",\n       ".join(
        f"MAX(CASE WHEN rn = CAST(floor((n - 1) * {q}) AS BIGINT) + 1 "
        f"THEN lag_us END) AS q{int(q * 100)}_us"
        for q in quantiles
    )
    return f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
signup AS (
  SELECT user_id, min(us) AS s_us FROM e
  WHERE event_type = 'signup' GROUP BY user_id
),
lag AS (
  SELECT e.user_id, min(e.us - s_us) AS lag_us
  FROM e JOIN signup USING (user_id)
  WHERE e.event_type = 'purchase' AND e.us > s_us
  GROUP BY e.user_id
),
ranked AS (
  SELECT lag_us,
         row_number() OVER (ORDER BY lag_us, user_id) AS rn,
         count(*) OVER () AS n
  FROM lag
)
SELECT MAX(n) AS n,
       {q_cols}
FROM ranked
"""
