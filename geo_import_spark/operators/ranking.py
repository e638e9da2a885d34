"""Ranking and reshaping analytics: top-k per group, categorical
pivot, and Pareto (cumulative-share) deciles.

Package conventions: money reduces in exact BIGINT cents
(relational.py), every window orders with a unique-key tie-break so
ranks are total and engine-portable, and cumulative sums run over
already-reduced group rows (deciles), never over the fact table.

Scale notes per operator are on the functions; the common shape is
aggregate-first (map-side combined on the natural key), then rank or
reshape the group rows — the expensive global sort in the Pareto
decile runs over |customers| reduced rows, not |orders|, and the
pivot is a fixed-width conditional aggregate (one shuffle, no
per-category jobs).

Reference parity: geo-import has no ranking layer — engine extension
per the brief, sibling to operators/statistics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .relational import SQL_CENTS, _cents

TOPK_PER_NATION = 3


def top_customers_per_nation(customer: DataFrame, orders: DataFrame,
                             nation: DataFrame,
                             k: int = TOPK_PER_NATION) -> DataFrame:
    """Top-k customers by lifetime order value within each nation —
    the canonical rank-within-partition query, with (revenue DESC,
    custkey) total ordering so rank() is deterministic.

    Output: (n_name, c_custkey, revenue_c, rnk).

    Plan: revenue reduces per customer FIRST (map-side combined on
    custkey); the rank window partitions by nation over those group
    rows; the nation dim broadcasts.
    """
    rev = orders.groupBy("o_custkey").agg(
        F.sum(_cents(F.col("o_totalprice"))).alias("revenue_c")
    )
    cust = customer.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "n_name")
    w = Window.partitionBy("n_name").orderBy(
        F.col("revenue_c").desc(), F.col("c_custkey")
    )
    return (
        rev.join(cust, rev.o_custkey == cust.c_custkey)
        .select("n_name", "c_custkey", "revenue_c",
                F.rank().over(w).cast("long").alias("rnk"))
        .filter(F.col("rnk") <= k)
    )


SQL_TOP_CUSTOMERS_PER_NATION = f"""
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM({SQL_CENTS.format(x='o_totalprice')}) AS BIGINT)
           AS revenue_c
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT n_name, c_custkey, revenue_c,
         CAST(rank() OVER (PARTITION BY n_name
                           ORDER BY revenue_c DESC, c_custkey) AS BIGINT)
           AS rnk
  FROM rev
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
)
SELECT n_name, c_custkey, revenue_c, rnk
FROM ranked WHERE rnk <= {TOPK_PER_NATION}
"""


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_type_pivot(events: DataFrame) -> DataFrame:
    """Wide per-user event-type counts — the pivot/crosstab reshape,
    planned as ONE conditional aggregate (fixed known categories), so
    a single shuffle produces the wide row; absent types count 0.

    Output: (user_id, n_click, n_error, n_purchase, n_signup, n_view).
    """
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
        .cast("long").alias(f"n_{t}")
        for t in PIVOT_TYPES
    ]
    return events.groupBy("user_id").agg(*aggs)


SQL_USER_TYPE_PIVOT = (
    "SELECT user_id, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{t}"
        for t in PIVOT_TYPES
    )
    + " FROM events GROUP BY user_id"
)


def revenue_pareto(orders: DataFrame) -> DataFrame:
    """Pareto concentration of customer lifetime value: customers
    ranked by revenue (DESC, custkey tie-break) into deciles; each
    decile row carries its exact revenue and the cumulative revenue
    through it — the "top 10% of customers drive X% of revenue"
    answer, with X computable exactly from the two BIGINT columns.

    Output: (decile, n_customers, rev_c, cum_rev_c).

    Plan: reduce per customer first; ntile(10) sorts |customers|
    group rows once; the cumulative sum runs over TEN decile rows
    (trivial window), not over customers.
    """
    rev = orders.groupBy("o_custkey").agg(
        F.sum(_cents(F.col("o_totalprice"))).alias("revenue_c")
    )
    w = Window.orderBy(F.col("revenue_c").desc(), F.col("o_custkey"))
    deciled = rev.select(
        "revenue_c", F.ntile(10).over(w).cast("long").alias("decile")
    )
    per_decile = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("revenue_c").alias("rev_c"),
    )
    cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_decile.select(
        "decile", "n_customers", "rev_c",
        F.sum("rev_c").over(cum).alias("cum_rev_c"),
    )


SQL_REVENUE_PARETO = f"""
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM({SQL_CENTS.format(x='o_totalprice')}) AS BIGINT)
           AS revenue_c
  FROM orders GROUP BY o_custkey
),
deciled AS (
  SELECT revenue_c,
         CAST(ntile(10) OVER (ORDER BY revenue_c DESC, o_custkey) AS BIGINT)
           AS decile
  FROM rev
),
per_decile AS (
  SELECT decile, count(*) AS n_customers,
         CAST(SUM(revenue_c) AS BIGINT) AS rev_c
  FROM deciled GROUP BY decile
)
SELECT decile, n_customers, rev_c,
       CAST(SUM(rev_c) OVER (ORDER BY decile
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cum_rev_c
FROM per_decile
"""


def customer_value_percentiles(orders: DataFrame) -> DataFrame:
    """percent_rank / cume_dist of each customer's lifetime value —
    the analytic-rank pair, over a (revenue, custkey) TOTAL order so
    both engines compute identical fractions (percent_rank and
    cume_dist are rational functions of integer ranks — deterministic
    doubles).

    Output: (o_custkey, revenue_c, pct_rank, cume).

    Plan: per-customer reduce first; one global sort over |customers|
    group rows. At 100 TB swap for approx ntile cut points — this is
    the exact oracle-comparable baseline.
    """
    rev = orders.groupBy("o_custkey").agg(
        F.sum(_cents(F.col("o_totalprice"))).alias("revenue_c")
    )
    w = Window.orderBy(F.col("revenue_c"), F.col("o_custkey"))
    return rev.select(
        "o_custkey", "revenue_c",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


SQL_CUSTOMER_VALUE_PERCENTILES = f"""
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM({SQL_CENTS.format(x='o_totalprice')}) AS BIGINT)
           AS revenue_c
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, revenue_c,
       percent_rank() OVER (ORDER BY revenue_c, o_custkey) AS pct_rank,
       cume_dist() OVER (ORDER BY revenue_c, o_custkey) AS cume
FROM rev
"""


def nation_top_names(customer: DataFrame, orders: DataFrame,
                     nation: DataFrame,
                     k: int = TOPK_PER_NATION) -> DataFrame:
    """Ordered string aggregation: per nation, the comma-joined names
    of its top-k customers by revenue, in rank order — the
    listagg/string_agg reshape. Ordering is total (revenue DESC,
    custkey), and the join runs AFTER the top-k filter, so the
    concat sees exactly k dimension-joined rows per nation.

    Output: (n_name, top_names).
    """
    top = top_customers_per_nation(customer, orders, nation, k)
    c = customer.select("c_custkey", "c_name")
    return (
        top.join(F.broadcast(c), "c_custkey")
        .groupBy("n_name")
        .agg(
            F.array_join(
                # collect (rnk, name) structs, sort by rank, project name
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("rnk"), F.col("c_name")))
                    ),
                    lambda s: s.getField("c_name"),
                ),
                ",",
            ).alias("top_names")
        )
    )


SQL_NATION_TOP_NAMES = f"""
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM({SQL_CENTS.format(x='o_totalprice')}) AS BIGINT)
           AS revenue_c
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT n_name, c_custkey, c_name, revenue_c,
         rank() OVER (PARTITION BY n_name
                      ORDER BY revenue_c DESC, c_custkey) AS rnk
  FROM rev
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
)
SELECT n_name, string_agg(c_name, ',' ORDER BY rnk) AS top_names
FROM ranked WHERE rnk <= {TOPK_PER_NATION}
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# 2D skyline (Pareto frontier)
# ---------------------------------------------------------------------------

def skyline_parts(part: DataFrame) -> DataFrame:
    """Skyline of parts minimizing (retail price, size): a part is kept
    iff NO other part is <= on both dimensions and < on at least one
    (classic Borzsonyi-et-al SKYLINE semantics; identical pairs are
    mutually non-dominating and both survive).

    Plan: the O(n^2) NOT EXISTS collapses to two window checks on the
    BIGINT-cent price axis —
      (1) the minimum size among STRICTLY cheaper parts must not be
          <= this size (RANGE frame ending 1 cent before the current
          price), and
      (2) the size must equal the minimum within its own price tick.
    A single global window would drag ALL rows to one task (Spark's
    unpartitioned-window pathology), so the operator runs TWO phases:
    a salted local-frontier pass (windows partitioned by a hash
    bucket, fully parallel) that discards everything dominated inside
    its bucket, then the same check globally over the tiny survivor
    union. Correct because dominance is transitive: any dominator of a
    discarded row either survives its bucket's frontier or is itself
    dominated by a survivor that also dominates the row. The final
    pass sorts only ~|skyline|-sized data. Exact integers end to end,
    so the mirror's NOT EXISTS agrees bit-for-bit.

    Output: (p_partkey, price_c, p_size).
    """
    priced = part.select(
        "p_partkey",
        F.expr("CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)").alias(
            "price_c"
        ),
        F.col("p_size").cast("long").alias("p_size"),
    )

    def frontier(df: DataFrame, bucket) -> DataFrame:
        w_cheaper = (
            Window.partitionBy(bucket)
            .orderBy("price_c")
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        w_same = Window.partitionBy(bucket, "price_c")
        flagged = df.select(
            "p_partkey",
            "price_c",
            "p_size",
            F.min("p_size").over(w_cheaper).alias("min_cheaper"),
            F.min("p_size").over(w_same).alias("min_same"),
        )
        return flagged.filter(
            (
                F.col("min_cheaper").isNull()
                | (F.col("min_cheaper") > F.col("p_size"))
            )
            & (F.col("p_size") == F.col("min_same"))
        ).select("p_partkey", "price_c", "p_size")

    local = frontier(priced, F.pmod(F.xxhash64("p_partkey"), F.lit(64)))
    return frontier(local, F.lit(0))


SQL_SKYLINE_PARTS = """
WITH p AS (
  SELECT p_partkey, CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
         CAST(p_size AS BIGINT) AS p_size
  FROM part
)
SELECT a.p_partkey, a.price_c, a.p_size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_c <= a.price_c AND b.p_size <= a.p_size
    AND (b.price_c < a.price_c OR b.p_size < a.p_size)
)
"""
