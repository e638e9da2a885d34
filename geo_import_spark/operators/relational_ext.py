"""Relational analytics, extended: the remaining TPC-H query shapes.

operators/relational.py ships Q1/Q3/Q5/Q13/Q17; this module adds the
other seventeen shapes (Q2, Q4, Q6-Q12, Q14-Q16, Q18-Q22), adapted to
the synthetic star schema (no partsupp table, no commit/receipt dates,
no shipmode/phone/container columns — each absence is substituted with
a same-shape predicate over the columns that DO exist, so every
classic plan pattern is still exercised: semi/anti joins, correlated
scalar subqueries rewritten to exact integer inequalities, OR-of-
conjunction pushdown, double aggregation, top-k with tie-breaks).

The engineering rules are the package conventions:

- **Exact integer money math** (operators/relational.py:_cents): all
  DOUBLE dollars become BIGINT cents before arithmetic, so every sum
  is order-independent and hash-identical across Spark and DuckDB.
  Ratios (Q8/Q14) divide two exact BIGINTs once at the very end —
  a single IEEE division is deterministic in both engines.
- **No float averages in predicates**: the classic `x > avg(y)`
  correlated predicate is rewritten `x * cnt > sum` on BIGINTs
  (Q22), same trick as Q17's `qty < 0.2*avg` → `5*qty*cnt < sum`.
- **Broadcast the dimensions, shuffle the fact once**: nation /
  region / part-key lists / per-group scalar aggregates are
  broadcast; lineitem↔orders on orderkey is the one real shuffle.
- **Aggregate before join** where the join only needs group totals
  (Q2/Q11/Q15/Q18/Q20/Q21), so the shuffle carries group rows, not
  the fact table.

Reference parity note: geo-import (the reference) has no relational
engine — this module, like relational.py, exists for the "complete
analytics engine" goal, with DuckDB oracle mirrors for every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import SQL_CENTS, _cents, _pct


def _tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> dict:
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def _rev_c4() -> F.Column:
    """price * (1 - discount) in exact 1e-4-dollar units."""
    return _cents(F.col("l_extendedprice")) * (100 - _pct(F.col("l_discount")))


SQL_REV_C4 = (
    f"{SQL_CENTS.format(x='l_extendedprice')}"
    f" * (100 - {SQL_CENTS.format(x='l_discount')})"
)


# --- Q2 shape: minimum-cost supplier per part ---------------------------------

Q2_TYPE = "STANDARD"
Q2_SIZE_LO, Q2_SIZE_HI = 10, 20
Q2_TOPK = 20


def min_cost_supplier(lineitem: DataFrame, part: DataFrame,
                      supplier: DataFrame) -> DataFrame:
    """TPC-H Q2 shape (partsupp-free): for STANDARD parts of mid
    size, find the cheapest observed line-item price per part and the
    supplier that quoted it (min suppkey on price ties), then list
    the top-k by supplier account balance.

    Plan: the filtered part-key list BROADCASTS into lineitem; the
    per-part min is one map-side-combined aggregate on l_partkey and
    the min-price rows join back on the SAME key (exchange reuse);
    supplier is a broadcast dim. Exact: prices compared in cents.
    """
    p = part.filter(
        (F.col("p_type") == Q2_TYPE)
        & F.col("p_size").between(Q2_SIZE_LO, Q2_SIZE_HI)
    ).select("p_partkey", "p_brand")
    li = lineitem.join(F.broadcast(p), lineitem.l_partkey == p.p_partkey).select(
        "l_partkey", "p_brand", _cents(F.col("l_extendedprice")).alias("price_c"),
        "l_suppkey",
    )
    best = li.groupBy("l_partkey").agg(F.min("price_c").alias("min_price_c"))
    winner = (
        li.join(best, "l_partkey")
        .filter(F.col("price_c") == F.col("min_price_c"))
        .groupBy("l_partkey", "p_brand", "min_price_c")
        .agg(F.min("l_suppkey").alias("s_suppkey"))
    )
    s = supplier.select("s_suppkey", "s_name", _cents(F.col("s_acctbal")).alias("s_acctbal_c"))
    return (
        winner.join(F.broadcast(s), "s_suppkey")
        .select("s_suppkey", "s_name", "s_acctbal_c",
                F.col("l_partkey").alias("p_partkey"), "p_brand", "min_price_c")
        .orderBy(F.col("s_acctbal_c").desc(), F.col("p_partkey"))
        .limit(Q2_TOPK)
    )


SQL_MIN_COST_SUPPLIER = f"""
WITH p AS (
  SELECT p_partkey, p_brand FROM part
  WHERE p_type = '{Q2_TYPE}' AND p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI}
),
li AS (
  SELECT l_partkey, p_brand,
         {SQL_CENTS.format(x='l_extendedprice')} AS price_c, l_suppkey
  FROM lineitem JOIN p ON lineitem.l_partkey = p.p_partkey
),
best AS (
  SELECT l_partkey, CAST(min(price_c) AS BIGINT) AS min_price_c
  FROM li GROUP BY l_partkey
),
winner AS (
  SELECT li.l_partkey, p_brand, min_price_c,
         CAST(min(l_suppkey) AS BIGINT) AS s_suppkey
  FROM li JOIN best ON li.l_partkey = best.l_partkey
               AND li.price_c = best.min_price_c
  GROUP BY li.l_partkey, p_brand, min_price_c
)
SELECT s_suppkey, s_name,
       {SQL_CENTS.format(x='s_acctbal')} AS s_acctbal_c,
       l_partkey AS p_partkey, p_brand, min_price_c
FROM winner JOIN supplier USING (s_suppkey)
ORDER BY s_acctbal_c DESC, p_partkey
LIMIT {Q2_TOPK}
"""


# --- Q4 shape: order priority checking (late existence) -----------------------

Q4_FROM, Q4_TO = "1996-07-01", "1996-10-01"
Q4_LATE_DAYS = 60


def late_order_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: count orders per priority, placed in one
    quarter, that had at least one line item shipped more than
    Q4_LATE_DAYS after the order date (the commit<receipt predicate
    of the original, re-expressed over the dates that exist).

    Plan: LEFT SEMI join — Spark's native EXISTS — on orderkey with
    the lateness condition fused into the join predicate, so each
    qualifying order is emitted once no matter how many late items it
    has; then a 5-row map-side-combined aggregate.
    """
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(Q4_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_TO).cast("timestamp"))
    )
    late = o.join(
        lineitem,
        (lineitem.l_orderkey == o.o_orderkey)
        & (lineitem.l_shipdate
           > o.o_orderdate + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


SQL_LATE_ORDER_PRIORITY = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{Q4_FROM} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q4_TO} 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
  )
GROUP BY o_orderpriority
"""


# --- Q6: forecasting revenue change -------------------------------------------

Q6_FROM, Q6_TO = "1996-01-01", "1997-01-01"
Q6_DISC_LO, Q6_DISC_HI = 5, 7  # percent points
Q6_QTY_LT = 24


def forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6: revenue that discounts in a band gave away over one
    ship-year for small quantities. Pure scan→filter→1-row aggregate;
    every predicate reaches the parquet scan (PushedFilters), and the
    discount band compares EXACT percent points, not doubles.
    """
    disc_p = _pct(F.col("l_discount"))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(Q6_FROM).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q6_TO).cast("timestamp"))
            & (F.col("l_quantity") < Q6_QTY_LT)
        )
        .select(_cents(F.col("l_extendedprice")).alias("price_c"),
                disc_p.alias("disc_p"))
        .filter(F.col("disc_p").between(Q6_DISC_LO, Q6_DISC_HI))
        .agg(
            F.sum(F.col("price_c") * F.col("disc_p")).alias("revenue_c4"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_FORECAST_REVENUE = f"""
SELECT CAST(SUM({SQL_CENTS.format(x='l_extendedprice')}
               * {SQL_CENTS.format(x='l_discount')}) AS BIGINT) AS revenue_c4,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_FROM} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q6_TO} 00:00:00'
  AND l_quantity < {Q6_QTY_LT}
  AND {SQL_CENTS.format(x='l_discount')} BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
"""


# --- Q7: volume shipping between two nations ----------------------------------

Q7_NATION_A, Q7_NATION_B = "NATION_3", "NATION_7"
Q7_FROM, Q7_TO = "1996-01-01", "1998-01-01"


def volume_shipping(t: dict) -> DataFrame:
    """TPC-H Q7: bilateral trade volume — revenue per (supplier
    nation, customer nation, ship year) for the two directed pairs of
    two nations, over a two-year ship window.

    Plan: supplier→nation and customer→nation are broadcast maps (the
    two-nation filter shrinks them further); lineitem⋈orders on
    orderkey is the single fact shuffle; the final aggregate has at
    most 2 pairs × 2 years rows.
    """
    nat = t["nation"].filter(
        F.col("n_name").isin(Q7_NATION_A, Q7_NATION_B)
    ).select("n_nationkey", "n_name")
    supp = (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t["customer"]
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit(Q7_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q7_TO).cast("timestamp"))
    ).select(
        "l_orderkey", "l_suppkey",
        F.year("l_shipdate").cast("long").alias("l_year"),
        _rev_c4().alias("rev_c4"),
    )
    return (
        li.join(t["orders"].select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev_c4").alias("revenue_c4"))
    )


SQL_VOLUME_SHIPPING = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({SQL_REV_C4}) AS BIGINT) AS revenue_c4
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE sn.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND cn.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND sn.n_name <> cn.n_name
  AND l_shipdate >= TIMESTAMP '{Q7_FROM} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q7_TO} 00:00:00'
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
"""


# --- Q8: national market share ------------------------------------------------

Q8_REGION = "EUROPE"
Q8_NATION = "NATION_8"
Q8_TYPE = "PROMO"
Q8_FROM, Q8_TO = "1996-01-01", "1998-01-01"


def market_share(t: dict) -> DataFrame:
    """TPC-H Q8: the target nation's share of PROMO-part revenue sold
    into one region, per order year. Numerator and denominator are
    exact BIGINT c4 sums; the share is ONE double division at the end
    (deterministic IEEE, identical both engines).

    Plan: part keys, region customers, and supplier→nation are all
    broadcast; one fact shuffle (lineitem⋈orders); 2-row aggregate.
    """
    p = t["part"].filter(F.col("p_type") == Q8_TYPE).select("p_partkey")
    region_nations = (
        t["nation"]
        .join(F.broadcast(t["region"].filter(F.col("r_name") == Q8_REGION)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey")
    )
    cust = t["customer"].join(
        F.broadcast(region_nations),
        F.col("c_nationkey") == F.col("n_nationkey"),
        "left_semi",
    ).select("c_custkey")
    supp = t["supplier"].join(
        F.broadcast(t["nation"].select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit(Q8_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q8_TO).cast("timestamp"))
    ).select("o_orderkey", "o_custkey",
             F.year("o_orderdate").cast("long").alias("o_year"))
    li = t["lineitem"].join(
        F.broadcast(p), t["lineitem"].l_partkey == p.p_partkey, "left_semi"
    ).select("l_orderkey", "l_suppkey", _rev_c4().alias("rev_c4"))
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey, "left_semi")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    )
    agg = vol.groupBy("o_year").agg(
        F.sum(F.when(F.col("supp_nation") == Q8_NATION, F.col("rev_c4"))
              .otherwise(F.lit(0))).alias("nation_rev_c4"),
        F.sum("rev_c4").alias("total_rev_c4"),
    )
    return agg.select(
        "o_year", "nation_rev_c4", "total_rev_c4",
        (F.col("nation_rev_c4").cast("double")
         / F.col("total_rev_c4").cast("double")).alias("mkt_share"),
    )


SQL_MARKET_SHARE = f"""
WITH vol AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         {SQL_REV_C4} AS rev_c4, sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = '{Q8_TYPE}')
    AND o_custkey IN (
      SELECT c_custkey FROM customer
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region ON r_regionkey = cn.n_regionkey
      WHERE r_name = '{Q8_REGION}')
    AND o_orderdate >= TIMESTAMP '{Q8_FROM} 00:00:00'
    AND o_orderdate <  TIMESTAMP '{Q8_TO} 00:00:00'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN rev_c4 ELSE 0 END)
            AS BIGINT) AS nation_rev_c4,
       CAST(SUM(rev_c4) AS BIGINT) AS total_rev_c4,
       CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN rev_c4 ELSE 0 END)
            AS DOUBLE)
         / CAST(SUM(rev_c4) AS DOUBLE) AS mkt_share
FROM vol GROUP BY o_year
"""


# --- Q9 shape: product type profit --------------------------------------------

Q9_NAME_LIKE = "red"


def product_type_profit(t: dict) -> DataFrame:
    """TPC-H Q9 shape (partsupp-free): profit per (supplier nation,
    order year) on parts whose name contains 'red', with cost modeled
    as quantity × p_retailprice (the supply-cost stand-in this schema
    affords). profit_c4 = rev_c4 − qty·retail_c·100, all BIGINT —
    negatives are fine, the math stays exact.

    Plan: filtered part keys broadcast; supplier→nation broadcast;
    one fact shuffle (lineitem⋈orders); 25×years aggregate.
    """
    p = t["part"].filter(F.col("p_name").contains(Q9_NAME_LIKE)).select(
        "p_partkey", _cents(F.col("p_retailprice")).alias("retail_c")
    )
    supp = t["supplier"].join(
        F.broadcast(t["nation"].select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    li = t["lineitem"].join(F.broadcast(p), t["lineitem"].l_partkey == p.p_partkey)
    li = li.select(
        "l_orderkey", "l_suppkey",
        (_rev_c4()
         - F.col("l_quantity").cast("long") * F.col("retail_c") * 100
         ).alias("profit_c4"),
    )
    o = t["orders"].select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("nation", "o_year")
        .agg(F.sum("profit_c4").alias("profit_c4"))
    )


SQL_PRODUCT_TYPE_PROFIT = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({SQL_REV_C4}
            - CAST(l_quantity AS BIGINT)
              * {SQL_CENTS.format(x='p_retailprice')} * 100) AS BIGINT)
         AS profit_c4
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN orders ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%{Q9_NAME_LIKE}%'
GROUP BY n_name, year(o_orderdate)
"""


# --- Q10: returned item reporting ---------------------------------------------

Q10_FROM, Q10_TO = "1996-10-01", "1997-01-01"
Q10_TOPK = 20


def returned_item_customers(t: dict) -> DataFrame:
    """TPC-H Q10: top-k customers by revenue lost to returns
    (returnflag='R') on orders from one quarter.

    Plan: orders date-filtered at the scan; lineitem filter
    returnflag='R' pushed down; one fact shuffle on orderkey; the
    groupBy keys on custkey so the customer+nation dims broadcast
    AFTER aggregation (group rows, not fact rows, probe the dim).
    """
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit(Q10_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_TO).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t["lineitem"].filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", _rev_c4().alias("rev_c4")
    )
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev_c4").alias("revenue_c4"))
    )
    cust = t["customer"].join(
        F.broadcast(t["nation"].select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_name",
             _cents(F.col("c_acctbal")).alias("c_acctbal_c"), "n_name")
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "revenue_c4", "c_acctbal_c", "n_name")
        .orderBy(F.col("revenue_c4").desc(), F.col("c_custkey"))
        .limit(Q10_TOPK)
    )


SQL_RETURNED_ITEM_CUSTOMERS = f"""
WITH per_cust AS (
  SELECT o_custkey, CAST(SUM({SQL_REV_C4}) AS BIGINT) AS revenue_c4
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '{Q10_FROM} 00:00:00'
    AND o_orderdate <  TIMESTAMP '{Q10_TO} 00:00:00'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, revenue_c4,
       {SQL_CENTS.format(x='c_acctbal')} AS c_acctbal_c, n_name
FROM per_cust
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
ORDER BY revenue_c4 DESC, c_custkey
LIMIT {Q10_TOPK}
"""


# --- Q11 shape: important part value concentration ----------------------------

Q11_REGION = "ASIA"  # region, not nation: every SF populates all 5 regions
Q11_FRACTION_DEN = 1000  # keep parts with value > total/1000


def important_part_value(t: dict) -> DataFrame:
    """TPC-H Q11 shape (partsupp-free): per-part traded value
    (Σ price_c·qty) restricted to suppliers of one region, keeping
    parts whose value exceeds 1/1000 of the region's total — the
    classic GROUP BY … HAVING sum > fraction × global-sum.

    The global total never becomes a driver double: the HAVING is the
    exact BIGINT inequality `value_c × 1000 > total_c`, with the
    1-row total cross-joined (broadcast) against the per-part rows.
    """
    nat = t["nation"].join(
        F.broadcast(t["region"].filter(F.col("r_name") == Q11_REGION)),
        F.col("n_regionkey") == F.col("r_regionkey"),
        "left_semi",
    ).select("n_nationkey")
    supp = t["supplier"].join(
        F.broadcast(nat),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "left_semi",
    ).select("s_suppkey")
    li = t["lineitem"].join(
        F.broadcast(supp), t["lineitem"].l_suppkey == supp.s_suppkey, "left_semi"
    ).select(
        "l_partkey",
        (_cents(F.col("l_extendedprice")) * F.col("l_quantity").cast("long"))
        .alias("value_c"),
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("value_c").alias("value_c"))
    total = per_part.agg(F.sum("value_c").alias("total_c"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_c") * Q11_FRACTION_DEN > F.col("total_c"))
        .select(F.col("l_partkey").alias("p_partkey"), "value_c")
    )


SQL_IMPORTANT_PART_VALUE = f"""
WITH li AS (
  SELECT l_partkey,
         {SQL_CENTS.format(x='l_extendedprice')} * CAST(l_quantity AS BIGINT)
           AS value_c
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = '{Q11_REGION}')
),
per_part AS (
  SELECT l_partkey, CAST(SUM(value_c) AS BIGINT) AS value_c
  FROM li GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, value_c
FROM per_part
WHERE value_c * {Q11_FRACTION_DEN} > (SELECT SUM(value_c) FROM per_part)
"""


# --- Q12 shape: late shipping vs order priority -------------------------------

Q12_FROM, Q12_TO = "1996-01-01", "1997-01-01"
Q12_LATE_DAYS = 30


def late_shipping_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12 shape (shipmode-free): for line items shipped in one
    year and late (shipped > 30 days after the order date), count
    critical-priority (1-URGENT/2-HIGH) vs other orders per return
    flag — the original's CASE-count split over the category column
    this schema has.

    Plan: one fact shuffle on orderkey; 3-row aggregate, both CASE
    counts map-side combined.
    """
    o = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(Q12_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q12_TO).cast("timestamp"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAYS")
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(crit, 1).otherwise(0)).cast("long").alias("high_line_count"),
        F.sum(F.when(crit, 0).otherwise(1)).cast("long").alias("low_line_count"),
    )


SQL_LATE_SHIPPING_PRIORITY = f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_FROM} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q12_TO} 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
GROUP BY l_returnflag
"""


# --- Q14: promotion effect ----------------------------------------------------

Q14_FROM, Q14_TO = "1996-03-01", "1996-04-01"


def promo_revenue_effect(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14: the share of one ship-month's revenue that came
    from PROMO parts. Both sums are exact BIGINT c4; the percentage
    is one double division at the end.

    Plan: part's (key → is-promo) map broadcasts into the date-pruned
    lineitem scan; 1-row aggregate.
    """
    p = part.select("p_partkey", (F.col("p_type") == "PROMO").alias("is_promo"))
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(Q14_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_TO).cast("timestamp"))
    ).select("l_partkey", _rev_c4().alias("rev_c4"))
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("is_promo"), F.col("rev_c4")).otherwise(0))
            .alias("promo_rev_c4"),
            F.sum("rev_c4").alias("total_rev_c4"),
        )
    )
    return agg.select(
        "promo_rev_c4", "total_rev_c4",
        (F.lit(100.0) * F.col("promo_rev_c4").cast("double")
         / F.col("total_rev_c4").cast("double")).alias("promo_pct"),
    )


SQL_PROMO_REVENUE_EFFECT = f"""
WITH li AS (
  SELECT p_type = 'PROMO' AS is_promo, {SQL_REV_C4} AS rev_c4
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '{Q14_FROM} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q14_TO} 00:00:00'
)
SELECT CAST(SUM(CASE WHEN is_promo THEN rev_c4 ELSE 0 END) AS BIGINT)
         AS promo_rev_c4,
       CAST(SUM(rev_c4) AS BIGINT) AS total_rev_c4,
       100.0 * CAST(SUM(CASE WHEN is_promo THEN rev_c4 ELSE 0 END) AS DOUBLE)
             / CAST(SUM(rev_c4) AS DOUBLE) AS promo_pct
FROM li
"""


# --- Q15: top supplier(s) of a quarter ----------------------------------------

Q15_FROM, Q15_TO = "1996-01-01", "1996-04-01"


def top_supplier(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """TPC-H Q15: the supplier(s) whose quarter revenue equals the
    maximum — the original's view + scalar-max pattern. The max is a
    1-row aggregate cross-joined (broadcast) back; ties all surface,
    exactly as the spec requires.
    """
    per_supp = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(Q15_FROM).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q15_TO).cast("timestamp"))
        )
        .select("l_suppkey", _rev_c4().alias("rev_c4"))
        .groupBy("l_suppkey")
        .agg(F.sum("rev_c4").alias("total_rev_c4"))
    )
    mx = per_supp.agg(F.max("total_rev_c4").alias("max_rev_c4"))
    s = supplier.select("s_suppkey", "s_name")
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev_c4") == F.col("max_rev_c4"))
        .join(F.broadcast(s), per_supp.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev_c4")
    )


SQL_TOP_SUPPLIER = f"""
WITH per_supp AS (
  SELECT l_suppkey, CAST(SUM({SQL_REV_C4}) AS BIGINT) AS total_rev_c4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_FROM} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q15_TO} 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev_c4
FROM per_supp JOIN supplier ON s_suppkey = l_suppkey
WHERE total_rev_c4 = (SELECT MAX(total_rev_c4) FROM per_supp)
"""


# --- Q16 shape: supplier counts per part group --------------------------------

Q16_EXCL_BRAND = "Brand#5"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 3, 9, 14, 19, 23, 36, 45)


def supplier_part_counts(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q16 shape (partsupp-free): how many distinct suppliers
    actually shipped parts of each (brand, type, size) group, for a
    size whitelist and excluding one brand and one type. The
    part↔supplier relation is derived from lineitem (the schema's
    only part-supplier evidence).

    Plan: filtered part rows broadcast into lineitem; countDistinct
    shuffles (brand,type,size,suppkey) pairs once (Spark plans
    distinct-agg as a two-phase expand+agg — group rows, not fact
    rows, cross the wire).
    """
    p = part.filter(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (F.col("p_type") != Q16_EXCL_TYPE)
        & F.col("p_size").isin(*Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type",
             F.col("p_size").cast("long").alias("p_size"))
    li = lineitem.select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_SUPPLIER_PART_COUNTS = f"""
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}' AND p_type <> '{Q16_EXCL_TYPE}'
  AND p_size IN {Q16_SIZES}
GROUP BY p_brand, p_type, p_size
"""


# --- Q18: large volume customers ----------------------------------------------

Q18_QTY_GT = 250
Q18_TOPK = 100


def large_volume_customers(t: dict) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds the threshold,
    with customer identity and the order's total price, top-k by
    price.

    Plan: the qty-sum is a map-side-combined aggregate on l_orderkey
    BEFORE any join (the HAVING prunes to a few hundred orders), so
    the joins back to orders/customer carry only qualifying keys.
    """
    big = (
        t["lineitem"].groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_QTY_GT)
    )
    o = t["orders"].select(
        "o_orderkey", "o_custkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        .alias("o_orderdate_us"),
        _cents(F.col("o_totalprice")).alias("o_totalprice_c"),
    )
    c = t["customer"].select("c_custkey", "c_name")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate_us",
                "o_totalprice_c", "sum_qty")
        .orderBy(F.col("o_totalprice_c").desc(), F.col("o_orderkey"))
        .limit(Q18_TOPK)
    )


SQL_LARGE_VOLUME_CUSTOMERS = f"""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > {Q18_QTY_GT}
)
SELECT c_custkey, c_name, o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
       {SQL_CENTS.format(x='o_totalprice')} AS o_totalprice_c, sum_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice_c DESC, o_orderkey
LIMIT {Q18_TOPK}
"""


# --- Q19: discounted revenue, OR-of-conjunctions ------------------------------

Q19_BRANCHES = (
    ("Brand#2", 1, 5, 1, 11),
    ("Brand#13", 1, 10, 10, 20),
    ("Brand#17", 1, 15, 20, 30),
)


def discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19: revenue matching any of three (brand, size-range,
    qty-range) conjunctions — the classic OR-of-ANDs the optimizer
    must keep joinable rather than exploding into a cross product.

    Plan: part attributes broadcast on partkey (ONE equi-join; the OR
    evaluates post-join as a filter — never a nested-loop join);
    1-row aggregate.
    """
    p = part.select("p_partkey", "p_brand", "p_size")
    li = lineitem.select(
        "l_partkey", F.col("l_quantity").cast("long").alias("qty"),
        _rev_c4().alias("rev_c4"),
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = F.lit(False)
    for brand, slo, shi, qlo, qhi in Q19_BRANCHES:
        cond = cond | (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(slo, shi)
            & F.col("qty").between(qlo, qhi)
        )
    return j.filter(cond).agg(
        F.sum("rev_c4").alias("revenue_c4"),
        F.count(F.lit(1)).alias("n_items"),
    )


_Q19_SQL_COND = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
    f" AND CAST(l_quantity AS BIGINT) BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in Q19_BRANCHES
)

SQL_DISCOUNTED_REVENUE = f"""
SELECT CAST(SUM({SQL_REV_C4}) AS BIGINT) AS revenue_c4,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {_Q19_SQL_COND}
"""


# --- Q20 shape: dominant suppliers of a part type -----------------------------

Q20_TYPE = "SMALL"
Q20_FROM, Q20_TO = "1996-01-01", "1997-01-01"


def dominant_type_suppliers(t: dict) -> DataFrame:
    """TPC-H Q20 shape (partsupp-free): suppliers that shipped MORE
    THAN HALF of some SMALL-type part's total ship-year quantity —
    the original's `availqty > 0.5 × shipped` re-expressed as the
    exact inequality `2×supp_qty > part_total` over shipped
    quantities.

    Plan: per-(part,supplier) and per-part aggregates share the
    l_partkey shuffle key (exchange reuse); the qualifying supplier
    keys semi-join supplier (broadcast).
    """
    p = t["part"].filter(F.col("p_type") == Q20_TYPE).select("p_partkey")
    li = (
        t["lineitem"].filter(
            (F.col("l_shipdate") >= F.lit(Q20_FROM).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q20_TO).cast("timestamp"))
        )
        .join(F.broadcast(p), t["lineitem"].l_partkey == p.p_partkey, "left_semi")
        .select("l_partkey", "l_suppkey",
                F.col("l_quantity").cast("long").alias("qty"))
    )
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").alias("supp_qty")
    )
    per_p = li.groupBy("l_partkey").agg(F.sum("qty").alias("part_qty"))
    dominant = (
        per_ps.join(per_p, "l_partkey")
        .filter(F.col("supp_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey").distinct()
    )
    s = t["supplier"].select("s_suppkey", "s_name")
    return s.join(
        dominant, s.s_suppkey == dominant.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


SQL_DOMINANT_TYPE_SUPPLIERS = f"""
WITH li AS (
  SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q20_FROM} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q20_TO} 00:00:00'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = '{Q20_TYPE}')
),
per_ps AS (
  SELECT l_partkey, l_suppkey, SUM(qty) AS supp_qty
  FROM li GROUP BY l_partkey, l_suppkey
),
per_p AS (
  SELECT l_partkey, SUM(qty) AS part_qty FROM li GROUP BY l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_ps JOIN per_p USING (l_partkey)
  WHERE supp_qty * 2 > part_qty)
"""


# --- Q21 shape: the sole late supplier ----------------------------------------

Q21_LATE_DAYS = 75
Q21_TOPK = 20


def sole_late_suppliers(orders: DataFrame, lineitem: DataFrame,
                        supplier: DataFrame) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on
    finished multi-supplier orders — the exists/not-exists pair of the
    original collapsed into one grouped pass: per order, count
    distinct suppliers and distinct LATE suppliers (late = shipped >
    75 days after order date); qualifying orders have ≥2 suppliers
    and exactly one late one, attributed via min(late suppkey) (min
    over a singleton set = the supplier).

    Plan: one fact shuffle on orderkey for the join, one aggregate on
    orderkey (same key — exchange reuse), then a supplier-sized
    count + broadcast name join. No self-joins of lineitem.
    """
    o = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate")
         > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
         ).alias("is_late"),
    )
    per_order = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey")))
        .alias("n_late"),
        F.min(F.when(F.col("is_late"), F.col("l_suppkey")))
        .alias("late_suppkey"),
    )
    blamed = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
    ).groupBy("late_suppkey").agg(F.count(F.lit(1)).alias("numwait"))
    s = supplier.select("s_suppkey", "s_name")
    return (
        blamed.join(F.broadcast(s), blamed.late_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey"))
        .limit(Q21_TOPK)
    )


SQL_SOLE_LATE_SUPPLIERS = f"""
WITH j AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY AS is_late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late,
         MIN(CASE WHEN is_late THEN l_suppkey END) AS late_suppkey
  FROM j GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order JOIN supplier ON s_suppkey = late_suppkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT {Q21_TOPK}
"""


# --- Q22 shape: dormant rich customers ----------------------------------------

Q22_SINCE = "2000-01-01"


def dormant_rich_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q22 shape (phone-prefix-free): customers with an
    above-average positive account balance and no orders since
    Q22_SINCE (every customer has SOME order in this corpus, so
    "dormant" is recency-scoped), counted per nation — the anti-join
    + scalar-average pattern.

    The average is never a float: `bal_c × cnt_pos > sum_pos_c` on
    BIGINTs (cnt_pos > 0), the package's exact-inequality rewrite.
    Plan: 1-row positive-balance aggregate broadcast-cross-joined;
    LEFT ANTI join against the distinct order custkeys; 25-row
    aggregate.
    """
    c = customer.select(
        "c_custkey", F.col("c_nationkey").cast("long").alias("c_nationkey"),
        _cents(F.col("c_acctbal")).alias("bal_c"),
    )
    pos = c.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("sum_pos_c"), F.count(F.lit(1)).alias("cnt_pos")
    )
    rich = c.crossJoin(F.broadcast(pos)).filter(
        (F.col("bal_c") > 0)
        & (F.col("bal_c") * F.col("cnt_pos") > F.col("sum_pos_c"))
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(Q22_SINCE).cast("timestamp")
    ).select("o_custkey")
    dormant = rich.join(
        recent, rich.c_custkey == F.col("o_custkey"), "left_anti"
    )
    return dormant.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum("bal_c").alias("totacctbal_c"),
    )


SQL_DORMANT_RICH_CUSTOMERS = f"""
WITH c AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
         {SQL_CENTS.format(x='c_acctbal')} AS bal_c
  FROM customer
),
pos AS (
  SELECT CAST(SUM(bal_c) AS BIGINT) AS sum_pos_c, count(*) AS cnt_pos
  FROM c WHERE bal_c > 0
)
SELECT c_nationkey, count(*) AS numcust,
       CAST(SUM(bal_c) AS BIGINT) AS totacctbal_c
FROM c, pos
WHERE bal_c > 0 AND bal_c * cnt_pos > sum_pos_c
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '{Q22_SINCE} 00:00:00')
GROUP BY c_nationkey
"""


# --- market-basket affinity ---------------------------------------------------

BASKET_MIN_SUPPORT = 3
BASKET_TOPK = 50


def basket_lift(lineitem: DataFrame) -> DataFrame:
    """Market-basket part-pair affinity: for part pairs co-occurring
    in ≥ BASKET_MIN_SUPPORT orders, lift = P(a,b)/(P(a)·P(b)) =
    co·N / (cnt_a·cnt_b) — exact integer numerator and denominator,
    ONE double division, top-k by (lift, pair) with total tie-break.

    Output: (part_a, part_b, co, cnt_a, cnt_b, lift).

    Plan: distinct (order, part) first; the pair self-join keys on
    orderkey (per-order fan-out bounded by order size); per-part
    counts broadcast back onto the pair aggregate; N is a broadcast
    1-row scalar.
    """
    op = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
    ).distinct()
    n_orders = op.select("ok").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    a = op.select("ok", F.col("p").alias("part_a"))
    b = op.select("ok", F.col("p").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= BASKET_MIN_SUPPORT)
    )
    cnt = op.groupBy("p").agg(F.count(F.lit(1)).alias("cnt"))
    ca = cnt.select(F.col("p").alias("part_a"), F.col("cnt").alias("cnt_a"))
    cb = cnt.select(F.col("p").alias("part_b"), F.col("cnt").alias("cnt_b"))
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a", "part_b", "co", "cnt_a", "cnt_b",
            ((F.col("co") * F.col("n_orders")).cast("double")
             / (F.col("cnt_a") * F.col("cnt_b")).cast("double")
             ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("part_a"), F.col("part_b"))
        .limit(BASKET_TOPK)
    )


SQL_BASKET_LIFT = f"""
WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
n AS (SELECT count(DISTINCT ok) AS n_orders FROM op),
pairs AS (
  SELECT a.p AS part_a, b.p AS part_b, count(*) AS co
  FROM op a JOIN op b ON a.ok = b.ok AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= {BASKET_MIN_SUPPORT}
),
cnt AS (SELECT p, count(*) AS cnt FROM op GROUP BY p)
SELECT part_a, part_b, co, ca.cnt AS cnt_a, cb.cnt AS cnt_b,
       CAST(co * n_orders AS DOUBLE)
         / CAST(ca.cnt * cb.cnt AS DOUBLE) AS lift
FROM pairs
JOIN cnt ca ON ca.p = part_a
JOIN cnt cb ON cb.p = part_b
CROSS JOIN n
ORDER BY lift DESC, part_a, part_b
LIMIT {BASKET_TOPK}
"""


# --- new vs returning customers per month -------------------------------------


def new_vs_returning(orders: DataFrame) -> DataFrame:
    """Per order-month: customers placing their FIRST-ever order vs
    returning customers — the acquisition/retention split. Months are
    exact integer month ids (year·12 + month−1) so bucketing is
    engine-portable; "first" uses the customer's min (orderdate,
    orderkey) so same-day first orders resolve deterministically.

    Output: (month_id, new_customers, returning_customers).

    Plan: per-customer first-order reduce (map-side combined on
    custkey), then a month-sized aggregate; customers counted once
    per month via pre-distinct (custkey, month).
    """
    o = orders.select(
        "o_custkey",
        (F.year(F.col("o_orderdate")) * 12
         + F.month(F.col("o_orderdate")) - 1).cast("long").alias("month_id"),
    )
    first = o.groupBy("o_custkey").agg(F.min("month_id").alias("first_month"))
    cm = o.distinct().join(first, "o_custkey")
    return (
        cm.groupBy("month_id")
        .agg(
            F.sum(F.when(F.col("month_id") == F.col("first_month"), 1)
                  .otherwise(0)).cast("long").alias("new_customers"),
            F.sum(F.when(F.col("month_id") == F.col("first_month"), 0)
                  .otherwise(1)).cast("long").alias("returning_customers"),
        )
    )


SQL_NEW_VS_RETURNING = """
WITH o AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS month_id
  FROM orders
),
first AS (SELECT o_custkey, min(month_id) AS first_month FROM o GROUP BY 1),
cm AS (SELECT DISTINCT o_custkey, month_id FROM o)
SELECT month_id,
       CAST(SUM(CASE WHEN month_id = first_month THEN 1 ELSE 0 END) AS BIGINT)
         AS new_customers,
       CAST(SUM(CASE WHEN month_id = first_month THEN 0 ELSE 1 END) AS BIGINT)
         AS returning_customers
FROM cm JOIN first USING (o_custkey)
GROUP BY month_id
"""


# --- frequent triples ---------------------------------------------------------

TRIPLE_MIN_SUPPORT = 2
TRIPLE_TOPK = 20


def basket_triples(lineitem: DataFrame) -> DataFrame:
    """Frequent part TRIPLES by co-order support — the Apriori step
    after pairs: triples enumerate via two orderkey-keyed joins with
    the a<b<c orientation (per-order fan-out C(k,3) with small k; no
    part-level joins anywhere), top-k by (support, triple) total
    order.

    Output: (part_a, part_b, part_c, support).
    """
    op = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
    ).distinct()
    a = op.select("ok", F.col("p").alias("part_a"))
    b = op.select("ok", F.col("p").alias("part_b"))
    c = op.select("ok", F.col("p").alias("part_c"))
    return (
        a.join(b, "ok").filter(F.col("part_a") < F.col("part_b"))
        .join(c, "ok").filter(F.col("part_b") < F.col("part_c"))
        .groupBy("part_a", "part_b", "part_c")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= TRIPLE_MIN_SUPPORT)
        .orderBy(F.col("support").desc(), "part_a", "part_b", "part_c")
        .limit(TRIPLE_TOPK)
    )


SQL_BASKET_TRIPLES = f"""
WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem)
SELECT a.p AS part_a, b.p AS part_b, c.p AS part_c, count(*) AS support
FROM op a
JOIN op b ON a.ok = b.ok AND a.p < b.p
JOIN op c ON b.ok = c.ok AND b.p < c.p
GROUP BY a.p, b.p, c.p
HAVING count(*) >= {TRIPLE_MIN_SUPPORT}
ORDER BY support DESC, part_a, part_b, part_c
LIMIT {TRIPLE_TOPK}
"""


# --- ship-delay histogram -----------------------------------------------------

DELAY_BUCKET_DAYS = 15


def ship_delay_histogram(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Distribution of order→ship latency per priority: exact integer
    day buckets (delay_days div 15) of every line item's shipdate
    minus its order's date — the duration-histogram shape.

    Output: (o_orderpriority, bucket, n_items).

    Plan: one fact shuffle on orderkey, then a (priority × buckets)-
    sized map-side-combined aggregate.
    """
    o = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    j = lineitem.select("l_orderkey", "l_shipdate").join(
        o, F.col("l_orderkey") == o.o_orderkey
    )
    delay = j.select(
        "o_orderpriority",
        (F.unix_micros(F.col("l_shipdate").cast("timestamp"))
         - F.unix_micros(F.col("o_orderdate").cast("timestamp"))
         ).alias("delay_us"),
    )
    return (
        delay.select(
            "o_orderpriority",
            F.expr(
                f"delay_us div 86400000000 div {DELAY_BUCKET_DAYS}"
            ).alias("bucket"),
        )
        .groupBy("o_orderpriority", "bucket")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


SQL_SHIP_DELAY_HISTOGRAM = f"""
SELECT o_orderpriority,
       (epoch_us(l_shipdate) - epoch_us(o_orderdate))
         // 86400000000 // {DELAY_BUCKET_DAYS} AS bucket,
       count(*) AS n_items
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY o_orderpriority, bucket
"""
