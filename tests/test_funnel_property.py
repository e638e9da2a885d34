"""Property tests: the distributed funnel against a pure-Python
reference on randomized event sets (hypothesis), and the approximate
percentile's rank-error bound against exact order statistics."""

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from geo_import_spark.operators import funnel as fn

_spark = None


def _get_spark():
    # hypothesis re-enters the test many times; reuse the session
    global _spark
    if _spark is None:
        from geo_import_spark.session import get_spark

        _spark = get_spark(cpus=4, shuffle_partitions=4)
    return _spark


def _ref_funnel(rows, stages=fn.FUNNEL_STAGES):
    """Pure-Python min-time funnel: stage k needs an event of its type
    strictly after the user's stage-(k-1) completion time."""
    by_user = {}
    for uid, etype, t in rows:
        by_user.setdefault(uid, []).append((t, etype))
    counts = [0] * len(stages)
    for evs in by_user.values():
        evs.sort()
        prev = None
        for k, stage in enumerate(stages):
            cand = [t for t, e in evs if e == stage
                    and (k == 0 or (prev is not None and t > prev))]
            if not cand:
                break
            prev = min(cand)
            counts[k] += 1
    return {i + 1: c for i, c in enumerate(counts)}


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),             # user_id
        st.sampled_from(["view", "click", "purchase", "x"]),  # type
        st.integers(min_value=0, max_value=20),            # minute
    ),
    min_size=1, max_size=25,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(events_strategy)
def test_funnel_matches_reference(rows):
    spark = _get_spark()
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, uid, etype, base + dt.timedelta(minutes=m), 0.0, "")
         for i, (uid, etype, m) in enumerate(rows)],
        "event_id long, user_id long, event_type string, ts timestamp, "
        "value double, props string",
    )
    got = {r.stage_idx: r.n_users for r in fn.funnel_counts(df).collect()}
    assert got == _ref_funnel([(u, e, m) for (u, e, m) in rows])


def test_percentile_approx_rank_error_bound(spark, sf_dir):
    """approx_percentile's documented guarantee: rank error <= n /
    accuracy. Checked against the exact order statistic on the
    lineitem price column."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long").alias("price_c")
    )
    n = li.count()
    accuracy = 1000
    approx = li.agg(
        F.percentile_approx("price_c", 0.5, accuracy).alias("m")
    ).collect()[0].m
    exact_sorted = [r.price_c for r in
                    li.orderBy("price_c").collect()]
    # rank of the approx answer in the exact order
    import bisect

    lo = bisect.bisect_left(exact_sorted, approx)
    hi = bisect.bisect_right(exact_sorted, approx)
    target = 0.5 * n
    max_rank_err = n / accuracy + 1
    assert lo - max_rank_err <= target <= hi + max_rank_err
