"""Statistical analytics with deterministic distributed math: exact
moment sums for correlation/regression, quartile segmentation, and
time-decay scoring that stays order-independent.

The package rule (operators/relational.py): a double accumulated
across partitions depends on reduction order and cannot be
hash-compared — so every operator here reduces ONLY integers and
applies the floating-point formula once to the reduced scalars:

- **Pearson / OLS** reduce the five moment sums n, Σx, Σy, Σxy, Σx²
  (and Σy²) over integer-lattice inputs (whole dollars = cents div
  100 / integer quantities — the rescale keeps Σy² at ~1e-4 of int64
  even at sf100), then evaluate r and (slope, intercept) as one
  closed-form double expression per group.
- **RFM segmentation** buckets customers by ntile(4) windows whose
  ordering carries a unique-key tie-break, so ranks are total and
  both engines bucket identically.
- **Decayed revenue** decays by whole elapsed half-lives with a pure
  integer right-shift division (cents div 2^k) — no `pow` anywhere,
  because libm pow differs by ULPs across engines and a ULP under a
  floor() breaks hash parity; the integer form is exact at any
  parallelism AND across engines.

Scale: every operator is scan → one map-side-combined shuffle on its
group key (or one window pass for RFM). geo-import has no statistics
layer (reference parity: none — engine extension per the brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .relational import SQL_CENTS, _cents


def _moments(df: DataFrame, key, x, y) -> DataFrame:
    """Exact integer moment sums per group: n, Σx, Σy, Σxy, Σx², Σy²."""
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )


def qty_price_correlation(lineitem: DataFrame) -> DataFrame:
    """Pearson correlation of (quantity, price-in-whole-dollars) per
    return flag, computed from exact integer moment sums; r is one
    double expression over the six reduced scalars.

    Price enters the moments as whole dollars (cents div 100, the
    exact rescale mirrored in the oracle): in cents, the largest
    per-flag Σy² measured at sf0.1 was 7.4e18 = 81% of int64 max, so
    the cents form would wrap silently at ~sf0.2 while DuckDB errors —
    the dollar rescale buys 1e4× headroom (safe past sf1000) at the
    cost of dropping sub-dollar remainders from the statistic.

    Output: (l_returnflag, n, r).
    """
    staged = lineitem.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        _cents(F.col("l_extendedprice")).alias("price_c"),
    ).select("l_returnflag", "x", F.expr("price_c div 100").alias("y"))
    m = _moments(staged, "l_returnflag", F.col("x"), F.col("y"))
    d = lambda c: F.col(c).cast("double")
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(d("n") * d("sxx") - d("sx") * d("sx")) * F.sqrt(
        d("n") * d("syy") - d("sy") * d("sy")
    )
    return m.select("l_returnflag", "n", (num / den).alias("r"))


SQL_QTY_PRICE_CORRELATION = f"""
WITH staged AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
         {SQL_CENTS.format(x='l_extendedprice')} // 100 AS y
  FROM lineitem
), m AS (
  SELECT l_returnflag, count(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM staged GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r
FROM m
"""


def price_qty_regression(lineitem: DataFrame) -> DataFrame:
    """Per-return-flag OLS of price_dollars ~ quantity from the same
    exact moment sums: slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²),
    intercept = (Σy − slope·Σx)/n — closed-form doubles over reduced
    integers, so both engines evaluate bit-identically. Price enters
    as whole dollars (cents div 100) for the same int64-headroom
    reason as qty_price_correlation.

    Output: (l_returnflag, n, slope, intercept) — slope/intercept in
    dollars per unit quantity / dollars.
    """
    staged = lineitem.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        _cents(F.col("l_extendedprice")).alias("price_c"),
    ).select("l_returnflag", "x", F.expr("price_c div 100").alias("y"))
    m = _moments(staged, "l_returnflag", F.col("x"), F.col("y"))
    d = lambda c: F.col(c).cast("double")
    slope = (d("n") * d("sxy") - d("sx") * d("sy")) / (
        d("n") * d("sxx") - d("sx") * d("sx")
    )
    return m.select(
        "l_returnflag", "n", slope.alias("slope"),
        ((d("sy") - slope * d("sx")) / d("n")).alias("intercept"),
    )


SQL_PRICE_QTY_REGRESSION = f"""
WITH staged AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
         {SQL_CENTS.format(x='l_extendedprice')} // 100 AS y
  FROM lineitem
), m AS (
  SELECT l_returnflag, count(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM staged GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
       (CAST(sy AS DOUBLE)
          - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * CAST(sx AS DOUBLE))
       / CAST(n AS DOUBLE) AS intercept
FROM m
"""


RFM_ASOF = "2001-09-01"


def rfm_segments(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """RFM quartile segmentation: per customer, recency (days since
    last order at the as-of date), frequency (order count), monetary
    (total cents); each dimension quartiled with ntile(4) over a
    TOTAL order (metric, then custkey) so both engines bucket
    identically; output is the segment histogram.

    Output: (r_q, f_q, m_q, n_customers).

    Plan: one aggregate on custkey, three window passes over ONE
    custkey-clustered exchange (ntile needs a global sort per metric;
    at 100 TB swap for approx-quantile cut points — the exact form is
    the oracle-comparable baseline).
    """
    us_asof = F.unix_micros(F.lit(RFM_ASOF).cast("timestamp"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
            .alias("last_us"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(_cents(F.col("o_totalprice"))).alias("money_c"),
        )
        .select(
            "o_custkey",
            (us_asof - F.col("last_us")).alias("age_us"),
            "freq", "money_c",
        )
        # `div` = exact long floor-division (funnel.py convention)
        .select(
            "o_custkey",
            F.expr("age_us div 86400000000").alias("recency_days"),
            "freq", "money_c",
        )
    )
    # recency: smaller = better -> ascending puts best in quartile 1
    rq = Window.orderBy(F.col("recency_days"), F.col("o_custkey"))
    fq = Window.orderBy(F.col("freq").desc(), F.col("o_custkey"))
    mq = Window.orderBy(F.col("money_c").desc(), F.col("o_custkey"))
    seg = per_cust.select(
        F.ntile(4).over(rq).cast("long").alias("r_q"),
        F.ntile(4).over(fq).cast("long").alias("f_q"),
        F.ntile(4).over(mq).cast("long").alias("m_q"),
    )
    return seg.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


SQL_RFM_SEGMENTS = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST((epoch_us(TIMESTAMP '{RFM_ASOF} 00:00:00')
               - max(epoch_us(o_orderdate))) // 86400000000 AS BIGINT)
           AS recency_days,
         count(*) AS freq,
         CAST(SUM({SQL_CENTS.format(x='o_totalprice')}) AS BIGINT) AS money_c
  FROM orders GROUP BY o_custkey
),
seg AS (
  SELECT CAST(ntile(4) OVER (ORDER BY recency_days, o_custkey) AS BIGINT) AS r_q,
         CAST(ntile(4) OVER (ORDER BY freq DESC, o_custkey) AS BIGINT) AS f_q,
         CAST(ntile(4) OVER (ORDER BY money_c DESC, o_custkey) AS BIGINT) AS m_q
  FROM per_cust
)
SELECT r_q, f_q, m_q, count(*) AS n_customers
FROM seg GROUP BY r_q, f_q, m_q
"""


DECAY_ASOF = "2001-09-01"
DECAY_HALFLIFE_DAYS = 365


def decayed_revenue(orders: DataFrame) -> DataFrame:
    """Half-life time-decayed revenue per customer: each order
    contributes totalprice halved once per full half-life elapsed —
    cents div 2^k with k = age_days div halflife.

    Deliberately step-wise, not smooth: a smooth 2^(−age/H) needs
    libm pow, whose last-ULP behavior differs across engines and, fed
    through floor(), breaks cross-engine hash parity. The step decay
    is pure BIGINT arithmetic — exact at any partitioning AND in both
    engines. k caps at 62 (shift-safe; the weight is 0 cents long
    before that).

    Output: (o_custkey, decayed_c) — cents.
    """
    us_asof = F.unix_micros(F.lit(DECAY_ASOF).cast("timestamp"))
    staged = orders.select(
        "o_custkey",
        _cents(F.col("o_totalprice")).alias("price_c"),
        (us_asof - F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .alias("age_us"),
    ).select(
        "o_custkey", "price_c",
        F.expr(
            f"age_us div 86400000000 div {DECAY_HALFLIFE_DAYS}"
        ).alias("k"),
    )
    term = F.expr(
        "price_c div shiftleft(CAST(1 AS BIGINT), CAST(least(k, 62) AS INT))"
    )
    return staged.groupBy("o_custkey").agg(
        F.sum(term).alias("decayed_c")
    )


SQL_DECAYED_REVENUE = f"""
WITH staged AS (
  SELECT o_custkey,
         {SQL_CENTS.format(x='o_totalprice')} AS price_c,
         (epoch_us(TIMESTAMP '{DECAY_ASOF} 00:00:00') - epoch_us(o_orderdate))
           // 86400000000 // {DECAY_HALFLIFE_DAYS} AS k
  FROM orders
)
SELECT o_custkey,
       CAST(SUM(price_c // (CAST(1 AS BIGINT) << CAST(LEAST(k, 62) AS INT)))
            AS BIGINT) AS decayed_c
FROM staged GROUP BY o_custkey
"""


AUTOCORR_LAG_DAYS = 7


def revenue_autocorr(orders: DataFrame,
                     lag_days: int = AUTOCORR_LAG_DAYS) -> DataFrame:
    """Lag-k autocorrelation of the daily revenue series: Pearson r
    between day d's and day d+lag's revenue over all day pairs where
    BOTH days have orders — the moment-sum discipline applied to a
    keyed self-join of the daily aggregate (day ids are exact integer
    epoch-day division; revenue is BIGINT cents; r is one closed-form
    double).

    Output (one row): (n_pairs, r).
    """
    daily = (
        orders.select(
            F.expr(
                "unix_micros(cast(o_orderdate as timestamp))"
                " div 86400000000"
            ).alias("day"),
            _cents(F.col("o_totalprice")).alias("price_c"),
        )
        .groupBy("day")
        # whole dollars, not cents: Σ(daily_cents)² overflows int64
        # already at sf0.01 (daily sums ~1e8c squared × thousands of
        # days); the exact `div 100` is mirrored in the oracle, and a
        # constant rescale leaves Pearson r unchanged up to the
        # dropped sub-dollar remainders. At much larger SF, raise the
        # divisor (div 10000) the same way on both sides.
        .agg(F.expr("sum(price_c) div 100").alias("rev_d"))
    )
    lead = daily.select(
        (F.col("day") - lag_days).alias("day"),
        F.col("rev_d").alias("rev_lead_d"),
    )
    pairs = daily.join(lead, "day").select(
        F.col("rev_d").alias("x"), F.col("rev_lead_d").alias("y")
    )
    m = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(d("n") * d("sxx") - d("sx") * d("sx")) * F.sqrt(
        d("n") * d("syy") - d("sy") * d("sy")
    )
    return m.select(F.col("n").alias("n_pairs"), (num / den).alias("r"))


SQL_REVENUE_AUTOCORR = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(SUM({SQL_CENTS.format(x='o_totalprice')}) // 100 AS BIGINT)
           AS rev_d
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT a.rev_d AS x, b.rev_d AS y
  FROM daily a JOIN daily b ON b.day = a.day + {AUTOCORR_LAG_DAYS}
),
m AS (
  SELECT count(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs
)
SELECT n AS n_pairs,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r
FROM m
"""


# ---------------------------------------------------------------------------
# Robust statistics: exact weighted median, Theil-Sen slope
# ---------------------------------------------------------------------------

def weighted_median(lineitem: DataFrame) -> DataFrame:
    """Lower weighted median of extended price (cents) weighted by
    quantity, per return flag: the smallest price p with
    2 * (weight at or below p) >= total weight — a total-order-free
    definition, so ties need no key tiebreak to stay deterministic.

    Plan (the scalable exact form): a raw cumsum window would drag
    each flag's ENTIRE row set into one task, so the operator first
    collapses to the (flag, price) HISTOGRAM with one
    map-side-combined aggregate — the window then runs over distinct
    prices per flag (bounded by price cardinality, not row count) and
    one min-aggregate picks the crossing. Output: (flag, w_median_c).
    """
    h = lineitem.groupBy(
        F.col("l_returnflag").alias("flag"),
        _cents(F.col("l_extendedprice")).alias("price_c"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("w"))
    win = (
        Window.partitionBy("flag")
        .orderBy("price_c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("flag")
    c = h.select(
        "flag",
        "price_c",
        F.sum("w").over(win).alias("cum_w"),
        F.sum("w").over(tot).alias("tot_w"),
    )
    return (
        c.filter(2 * F.col("cum_w") >= F.col("tot_w"))
        .groupBy("flag")
        .agg(F.min("price_c").alias("w_median_c"))
    )


SQL_WEIGHTED_MEDIAN = f"""
WITH h AS (
  SELECT l_returnflag AS flag, {SQL_CENTS.format(x="l_extendedprice")} AS price_c,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
), c AS (
  SELECT flag, price_c,
         SUM(w) OVER (PARTITION BY flag ORDER BY price_c
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_w,
         SUM(w) OVER (PARTITION BY flag) AS tot_w
  FROM h
)
SELECT flag, MIN(price_c) AS w_median_c
FROM c WHERE 2 * cum_w >= tot_w GROUP BY flag
"""


THEIL_SEN_MAX_GROUP = 256  # pair guard: n>(this) => 32k+ pairs/group


def theil_sen(orders: DataFrame,
              max_group: int = THEIL_SEN_MAX_GROUP) -> DataFrame:
    """Theil-Sen robust trend per customer: the lower median of all
    pairwise slopes (price cents per day) over the customer's orders —
    the classic outlier-resistant alternative to OLS.

    Pairs form within a group whose size is corpus-bounded (orders per
    customer stays ~constant as the table grows), so the quadratic
    blowup is per-group bounded and the whole operator is one
    self-equi-join on cust + one window keyed by cust: both share the
    hash partitioning; nothing global. Because "~constant" is a
    corpus property, not a law (ADVICE/VERDICT r4 #4: power-law real
    data breaks it), a per-group ORDER-COUNT GUARD excludes groups
    with more than max_group orders from the pair join entirely —
    the maxVerticesPerRow pattern — and emits a deterministic capped
    verdict (n_pairs NULL, sen_slope NULL) for them, mirrored exactly
    in the SQL oracle. One hot customer at 100x can therefore never
    create an O(n^2) partition. Slopes are doubles of exact int64
    differences (one identical division both engines); the LOWER
    median is the ceil(m/2)-th smallest VALUE — well-defined under
    ties, so the row_number pick hashes identically. Same-day pairs
    are excluded on both sides (undefined slope).

    Output: (cust, n_pairs, sen_slope).
    """
    pts = orders.select(
        F.col("o_custkey").cast("long").alias("cust"),
        F.col("o_orderkey").cast("long").alias("k"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("d"),
        _cents(F.col("o_totalprice")).alias("p"),
    )
    cnt = pts.groupBy("cust").agg(F.count("*").alias("n_orders"))
    eligible = pts.join(
        cnt.filter(F.col("n_orders") <= int(max_group)).select("cust"), "cust"
    )
    capped = cnt.filter(F.col("n_orders") > int(max_group)).select(
        "cust",
        F.lit(None).cast("long").alias("n_pairs"),
        F.lit(None).cast("double").alias("sen_slope"),
    )
    a, b = eligible.alias("a"), eligible.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cust") == F.col("b.cust"))
        & (F.col("a.k") < F.col("b.k"))
        & (F.col("a.d") != F.col("b.d")),
    ).select(
        F.col("a.cust").alias("cust"),
        (
            (F.col("b.p") - F.col("a.p")).cast("double")
            / (F.col("b.d") - F.col("a.d")).cast("double")
        ).alias("slope"),
    )
    w = Window.partitionBy("cust").orderBy("slope")
    ranked = pairs.select(
        "cust",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("cust")).alias("m"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(m + 1) DIV 2")
    ).select(
        "cust", F.col("m").alias("n_pairs"), F.col("slope").alias("sen_slope")
    ).unionByName(capped)


SQL_THEIL_SEN = f"""
WITH pts AS (
  SELECT CAST(o_custkey AS BIGINT) AS cust, CAST(o_orderkey AS BIGINT) AS k,
         CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS d,
         {SQL_CENTS.format(x="o_totalprice")} AS p
  FROM orders
), cnt AS (
  SELECT cust, COUNT(*) AS n_orders FROM pts GROUP BY cust
), pairs AS (
  SELECT a.cust AS cust,
         CAST(b.p - a.p AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
  FROM pts a JOIN pts b
    ON a.cust = b.cust AND a.k < b.k AND a.d != b.d
  JOIN cnt ON cnt.cust = a.cust AND cnt.n_orders <= {THEIL_SEN_MAX_GROUP}
), ranked AS (
  SELECT cust, slope,
         row_number() OVER (PARTITION BY cust ORDER BY slope) AS rn,
         COUNT(*) OVER (PARTITION BY cust) AS m
  FROM pairs
)
SELECT cust, m AS n_pairs, slope AS sen_slope
FROM ranked WHERE rn = (m + 1) // 2
UNION ALL
SELECT cust, CAST(NULL AS BIGINT) AS n_pairs,
       CAST(NULL AS DOUBLE) AS sen_slope
FROM cnt WHERE n_orders > {THEIL_SEN_MAX_GROUP}
"""


# ---------------------------------------------------------------------------
# MAD outliers: median absolute deviation per event type
# ---------------------------------------------------------------------------


def mad_outliers(events: DataFrame) -> DataFrame:
    """Robust dispersion + outlier count per event type: the lower
    median m of the value series, the lower median of |v − m| (MAD),
    and how many observations sit beyond the classic 3·MAD fence —
    all exact BIGINT micro-units (weighted_median's total-order-free
    lower-median definition, so no tiebreaks, no doubles anywhere).

    Output: (event_type, med_u, mad_u, n, n_outliers).

    Plan: events are touched ONCE — the (type, value) histogram is
    lineage-pinned and every later stage (median window, deviation
    histogram, MAD window, fence count) derives from it; medians
    join back as broadcast |types|-row frames. The windows run over
    distinct values per type (value cardinality, not row count) —
    the weighted_median scalability argument.
    """
    hist = (
        events.groupBy(
            F.col("event_type"),
            F.expr("CAST(floor(value * 1000000) AS BIGINT)").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=False)
    )

    def lower_median(h, val_col):
        win = (
            Window.partitionBy("event_type")
            .orderBy(val_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        tot = Window.partitionBy("event_type")
        c = h.select(
            "event_type",
            F.col(val_col),
            F.sum("w").over(win).alias("cum_w"),
            F.sum("w").over(tot).alias("tot_w"),
        )
        return (
            c.filter(2 * F.col("cum_w") >= F.col("tot_w"))
            .groupBy("event_type")
            .agg(F.min(val_col).alias("med"))
        )

    med = lower_median(hist, "v")
    dev_hist = (
        hist.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            F.abs(F.col("v") - F.col("med")).alias("dev"),
            "w",
        )
        .groupBy("event_type", "dev")
        .agg(F.sum("w").alias("w"))
    )
    mad = lower_median(dev_hist, "dev").withColumnRenamed("med", "mad_u")
    return (
        dev_hist.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("mad_u").alias("mad_u"),
            F.sum("w").alias("n"),
            F.sum(
                F.when(F.col("dev") > 3 * F.col("mad_u"), F.col("w"))
                .otherwise(F.lit(0))
            ).alias("n_outliers"),
        )
        .join(F.broadcast(med.withColumnRenamed("med", "med_u")),
              "event_type")
        .select("event_type", "med_u", "mad_u", "n", "n_outliers")
    )


SQL_MAD_OUTLIERS = """
WITH h AS (
  SELECT event_type, CAST(FLOOR(value * 1000000) AS BIGINT) AS v,
         COUNT(*) AS w
  FROM events GROUP BY 1, 2
),
mc AS (
  SELECT event_type, v,
         SUM(w) OVER (PARTITION BY event_type ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum_w,
         SUM(w) OVER (PARTITION BY event_type) AS tot_w
  FROM h
),
med AS (
  SELECT event_type, MIN(v) AS med_u FROM mc
  WHERE 2 * cum_w >= tot_w GROUP BY event_type
),
dh AS (
  SELECT h.event_type, ABS(h.v - med.med_u) AS dev,
         CAST(SUM(h.w) AS BIGINT) AS w
  FROM h JOIN med USING (event_type)
  GROUP BY 1, 2
),
dc AS (
  SELECT event_type, dev,
         SUM(w) OVER (PARTITION BY event_type ORDER BY dev
                      ROWS UNBOUNDED PRECEDING) AS cum_w,
         SUM(w) OVER (PARTITION BY event_type) AS tot_w
  FROM dh
),
mad AS (
  SELECT event_type, MIN(dev) AS mad_u FROM dc
  WHERE 2 * cum_w >= tot_w GROUP BY event_type
)
SELECT dh.event_type AS event_type,
       MIN(med.med_u) AS med_u,
       MAX(mad.mad_u) AS mad_u,
       CAST(SUM(dh.w) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN dh.dev > 3 * mad.mad_u THEN dh.w
                     ELSE 0 END) AS BIGINT) AS n_outliers
FROM dh JOIN mad USING (event_type) JOIN med USING (event_type)
GROUP BY dh.event_type
"""
