"""Relational analytics showcase: TPC-H-shaped pricing/revenue
queries over the lineitem/orders/customer/supplier/nation/region
tables, written the way a 100-TB Spark deployment should plan them.

Why these exist: the geospatial core (SURVEY.md §2) plus the
training-data operators cover the reference's surface and the north
rule's curation pipeline; this module demonstrates that the same
engine is a complete relational analytics engine — scan → filter →
multi-way join → partial aggregation → top-k — with the plans a
1000-executor cluster wants:

- **Predicate pushdown**: every date/segment/region filter reaches
  the parquet scan (`PushedFilters` in explain), so the fact-table
  read is pruned before any join.
- **Broadcast dimension joins**: region/nation/customer/supplier are
  dimension-sized; they broadcast (explicit `F.broadcast` hint), so
  the lineitem fact side NEVER shuffles for them. The only shuffle
  in q5 is lineitem↔orders on the orderkey — the unavoidable
  fact-fact co-location — and the final k-row aggregate.
- **Map-side partial aggregation**: all three queries aggregate on
  low-cardinality keys, so the shuffle carries k rows per task, not
  the fact table.
- **Exact integer money math**: prices/discounts/taxes are 2-decimal
  values stored as DOUBLE; every query converts them to BIGINT cents
  (`FLOOR(x*100 + 0.5)`) before arithmetic, so sums are exact,
  order-independent, and hash-identical across engines — the same
  determinism rule as the geometry lattice (operators/overlay.py)
  and the kmeans micro-units (operators/similarity.py).

Reference parity note: geo-import has no relational queries — this
extends the engine the same way trainprep.py does, per the brief's
"complete analytics engine" goal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --- exact money helpers ------------------------------------------------------


def _cents(col) -> F.Column:
    """2-decimal DOUBLE dollars -> exact BIGINT cents.

    FLOOR(x*100 + 0.5) is round-half-up and identical in Spark and
    DuckDB (CAST DOUBLE->BIGINT rounds in DuckDB but truncates in
    Spark, so the cast alone is NOT portable — the FLOOR is load-
    bearing). All money values here are positive.
    """
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


def _pct(col) -> F.Column:
    """2-decimal rate (0.00-0.99) -> exact BIGINT percent points."""
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


SQL_CENTS = "CAST(FLOOR({x} * 100 + 0.5) AS BIGINT)"

# --- Q1: pricing summary report ----------------------------------------------

Q1_CUTOFF = "1998-09-02"


def pricing_summary(lineitem: DataFrame, cutoff: str = Q1_CUTOFF) -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) totals over all
    line items shipped on/before the cutoff.

    Exact-integer accounting: disc_price = price*(1-discount) is
    cents × (100-disc_pct) → 1e-4-dollar units; charge additionally
    × (100+tax_pct) → 1e-6-dollar units. All BIGINT, all exact.

    Scale: filter is pushed to the parquet scan; ONE map-side-combined
    shuffle on a 6-value key. The 100-TB plan is scan-bound, as it
    should be.
    """
    price_c = _cents(F.col("l_extendedprice"))
    disc_p = _pct(F.col("l_discount"))
    tax_p = _pct(F.col("l_tax"))
    qty = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            qty.alias("qty"),
            price_c.alias("price_c"),
            (price_c * (100 - disc_p)).alias("disc_price_c4"),
            (price_c * (100 - disc_p) * (100 + tax_p)).alias("charge_c6"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty").alias("sum_qty"),
            F.sum("price_c").alias("sum_base_price_c"),
            F.sum("disc_price_c4").alias("sum_disc_price_c4"),
            F.sum("charge_c6").alias("sum_charge_c6"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM({SQL_CENTS.format(x='l_extendedprice')}) AS BIGINT) AS sum_base_price_c,
       CAST(SUM({SQL_CENTS.format(x='l_extendedprice')}
           * (100 - {SQL_CENTS.format(x='l_discount')})) AS BIGINT)  AS sum_disc_price_c4,
       CAST(SUM({SQL_CENTS.format(x='l_extendedprice')}
           * (100 - {SQL_CENTS.format(x='l_discount')})
           * (100 + {SQL_CENTS.format(x='l_tax')})) AS BIGINT)       AS sum_charge_c6,
       COUNT(*)                                              AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""
# note: SQL_CENTS on l_discount/l_tax yields percent points (rate*100)
# — same expression as dollars→cents, reused for the mirror's brevity.

# --- Q3: shipping priority (top-k unshipped revenue) ---------------------------

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-03-15"
Q3_TOPK = 10


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = Q3_SEGMENT,
    date: str = Q3_DATE,
    k: int = Q3_TOPK,
) -> DataFrame:
    """TPC-H Q3 shape: top-k orders by open revenue for one market
    segment — orders placed before `date` with line items shipped
    after it.

    Plan: customer (segment-filtered, dimension-sized) BROADCASTS
    into orders; the orders↔lineitem join is the one real shuffle,
    on the orderkey both sides already key on. Top-k is an exact
    TakeOrdered with the orderkey tie-break (deterministic LIMIT).
    """
    ts = F.lit(date).cast("timestamp")
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < ts).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    items = lineitem.filter(F.col("l_shipdate") > ts).select(
        "l_orderkey",
        (_cents(F.col("l_extendedprice")) * (100 - _pct(F.col("l_discount"))))
        .alias("rev_c4"),
    )
    return (
        ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(items, ords.o_orderkey == items.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev_c4").alias("revenue_c4"))
        .orderBy(F.col("revenue_c4").desc(), F.col("o_orderkey"))
        .limit(k)
        # timestamps cross engines as epoch micros (package convention,
        # operators/temporal.py) — hash-stable in the driver compare
        .select(
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            .alias("o_orderdate_us"),
            "o_orderpriority",
            "revenue_c4",
        )
    )


SQL_SHIPPING_PRIORITY = f"""
SELECT o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority,
       CAST(SUM({SQL_CENTS.format(x='l_extendedprice')}
           * (100 - {SQL_CENTS.format(x='l_discount')})) AS BIGINT) AS revenue_c4
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
  AND l_shipdate  > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_c4 DESC, o_orderkey
LIMIT {Q3_TOPK}
"""

# --- Q5: local supplier volume per nation --------------------------------------

Q5_REGION = "ASIA"
Q5_FROM = "1996-01-01"
Q5_TO = "1997-01-01"


def local_supplier_volume(
    spark_or_tables: SparkSession | dict,
    sf_dir: str | None = None,
    region_name: str = Q5_REGION,
) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation in one region, counting
    only line items whose supplier and ordering customer share the
    nation, for one order-date year.

    Plan: region→nation→supplier and region→nation→customer are
    chained BROADCAST joins (all dimension-sized; the explicit hint
    keeps them broadcast even if stats are stale). The fact path is
    lineitem ⋈ orders on orderkey — the single big shuffle — then a
    broadcast probe against the (custkey, suppkey, nation) pairs.
    Final aggregate is ≤25 rows.

    Accepts either a dict of DataFrames (tests) or (spark, sf_dir).
    """
    if isinstance(spark_or_tables, dict):
        t = spark_or_tables
    else:
        spark = spark_or_tables
        t = {
            n: spark.read.parquet(f"{sf_dir}/{n}.parquet")
            for n in ("region", "nation", "customer", "supplier", "orders", "lineitem")
        }
    nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = t["customer"].join(
        F.broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey", "n_name")
    supp = t["supplier"].select("s_suppkey", "s_nationkey")
    ords = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit(Q5_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_TO).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    items = t["lineitem"].select(
        "l_orderkey",
        "l_suppkey",
        (_cents(F.col("l_extendedprice")) * (100 - _pct(F.col("l_discount"))))
        .alias("rev_c4"),
    )
    return (
        items.join(ords, items.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("rev_c4").alias("revenue_c4"))
    )


SQL_LOCAL_SUPPLIER_VOLUME = f"""
SELECT n_name,
       CAST(SUM({SQL_CENTS.format(x='l_extendedprice')}
           * (100 - {SQL_CENTS.format(x='l_discount')})) AS BIGINT) AS revenue_c4
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey   = c_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
JOIN supplier ON s_suppkey   = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_FROM} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q5_TO} 00:00:00'
GROUP BY n_name
"""


# --- small-quantity revenue (TPC-H Q17 shape) ----------------------------------

Q17_BRAND = "Brand#4"


def small_quantity_revenue(lineitem: DataFrame, part: DataFrame,
                           brand: str = Q17_BRAND) -> DataFrame:
    """TPC-H Q17 shape: revenue that would be lost by dropping
    small-quantity orders of one brand — the classic correlated
    "quantity < 0.2 * per-part average" predicate.

    The average never materializes as a double: qty < 0.2 * sum/cnt
    is rewritten as the EXACT bigint inequality 5*qty*cnt < sum_qty
    (cnt > 0; quantities are integer-valued), so the filter is
    order-independent and hash-identical across engines — no float
    average, no epsilon.

    Plan: the brand's part keys BROADCAST into lineitem (the fact side
    never shuffles for the dimension); per-part stats are one
    map-side-combined aggregate on l_partkey and the stats join back
    on the SAME key, so Catalyst reuses the exchange — one real fact
    shuffle total, then a singleton aggregate.

    Returns one row: (sum_price_cents, n_small, avg_yearly_cents).
    """
    p = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(
        F.broadcast(p), lineitem["l_partkey"] == p["p_partkey"]
    ).select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        _cents(F.col("l_extendedprice")).alias("price_c"),
    )
    stats = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count("*").alias("cnt")
    )
    small = li.join(stats, "l_partkey").filter(
        F.col("qty") * 5 * F.col("cnt") < F.col("sum_qty")
    )
    return small.agg(
        F.sum("price_c").alias("sum_price_cents"),
        F.count("*").alias("n_small"),
        (F.sum("price_c").cast("double") / F.lit(700.0)).alias(
            "avg_yearly_cents"
        ),
    )


SQL_SMALL_QUANTITY_REVENUE = f"""
WITH p AS (SELECT p_partkey FROM part WHERE p_brand = '{Q17_BRAND}'),
li AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         {SQL_CENTS.format(x="l_extendedprice")} AS price_c
  FROM lineitem JOIN p ON lineitem.l_partkey = p.p_partkey
),
st AS (
  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sum_qty, count(*) AS cnt
  FROM li GROUP BY l_partkey
)
SELECT CAST(sum(price_c) AS BIGINT) AS sum_price_cents,
       count(*) AS n_small,
       CAST(sum(price_c) AS DOUBLE) / CAST(700.0 AS DOUBLE) AS avg_yearly_cents
FROM li JOIN st USING (l_partkey)
WHERE qty * 5 * cnt < sum_qty
"""


# --- customer order-count distribution (TPC-H Q13 shape) -------------------------

Q13_EXCLUDE = "2-HIGH"  # order priority class excluded from the count


def customer_distribution(customer: DataFrame,
                          orders: DataFrame,
                          exclude: str = Q13_EXCLUDE) -> DataFrame:
    """TPC-H Q13 shape: the histogram of customers by how many
    qualifying orders they placed — the canonical OUTER-join +
    double-aggregation pattern (customers with zero orders must
    appear in the 0 bucket, which an inner join silently drops).

    Plan: the filtered orders aggregate to (custkey, cnt) FIRST
    (map-side combined), so the left join carries one row per
    customer with orders — never the raw fact table; the second
    aggregate is histogram-sized. All counts are exact integers.

    Returns (c_count, custdist) ordered-free.
    """
    per_cust = (
        orders.filter(F.col("o_orderpriority") != exclude)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
    )
    joined = customer.join(
        per_cust, customer["c_custkey"] == per_cust["o_custkey"], "left"
    ).select(F.coalesce("cnt", F.lit(0)).alias("c_count"))
    return joined.groupBy("c_count").agg(F.count("*").alias("custdist"))


SQL_CUSTOMER_DISTRIBUTION = f"""
WITH per_cust AS (
  SELECT o_custkey, count(*) AS cnt
  FROM orders WHERE o_orderpriority <> '{Q13_EXCLUDE}'
  GROUP BY o_custkey
)
SELECT c_count, count(*) AS custdist FROM (
  SELECT COALESCE(per_cust.cnt, 0) AS c_count
  FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
) GROUP BY c_count
"""
