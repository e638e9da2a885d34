"""Table profiling: per-column null counts, exact distinct counts, and
canonical min/max — the data-quality summary a warehouse runs before
trusting a new drop (the table-level sibling of services/summary.py's
blob summaries).

One wide aggregate computes every column's stats in a single pass
(count / count-distinct / min / max are all map-side-combinable;
Spark plans the multi-distinct with an Expand, which multiplies the
shuffle rows by the distinct-column count — the honest cost of EXACT
distincts; swap in kmv_distinct (trainprep.py) when approximate is
acceptable at 100 TB). The one-row result is then unpivoted JVM-side
with stack().

Min/max are rendered to engine-portable canonical strings per type:
integers and integer-valued doubles via BIGINT, timestamps via epoch
seconds — never raw double/timestamp-to-string formatting, which
differs between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (column, spark render expr template, duckdb render template)
PROFILE_COLS = [
    ("l_orderkey", "CAST({x} AS STRING)", "CAST({x} AS VARCHAR)"),
    (
        "l_quantity",
        "CAST(CAST({x} AS BIGINT) AS STRING)",
        "CAST(CAST({x} AS BIGINT) AS VARCHAR)",
    ),
    ("l_returnflag", "{x}", "{x}"),
    (
        "l_shipdate",
        "CAST(unix_timestamp({x}) AS STRING)",
        "CAST(CAST(epoch({x}) AS BIGINT) AS VARCHAR)",
    ),
]


def profile_table(lineitem: DataFrame) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_val, max_val) for the
    profiled lineitem columns."""
    aggs = [F.count("*").alias("n_rows")]
    for c, render, _ in PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.count_distinct(c).alias(f"nd_{c}"),
            F.expr(render.format(x=f"min({c})")).alias(f"mn_{c}"),
            F.expr(render.format(x=f"max({c})")).alias(f"mx_{c}"),
        ]
    one = lineitem.agg(*aggs)
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c, _, _ in PROFILE_COLS
    )
    return one.select(
        "n_rows",
        F.expr(
            f"stack({len(PROFILE_COLS)}, {stack})"
            " AS (column, n_notnull, n_distinct, min_val, max_val)"
        ),
    ).select(
        "column",
        "n_rows",
        (F.col("n_rows") - F.col("n_notnull")).alias("n_nulls"),
        "n_distinct",
        "min_val",
        "max_val",
    )


def sql_profile_table() -> str:
    parts = []
    for c, _, render in PROFILE_COLS:
        parts.append(f"""
SELECT '{c}' AS column, count(*) AS n_rows,
       count(*) - count({c}) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       {render.format(x=f"min({c})")} AS min_val,
       {render.format(x=f"max({c})")} AS max_val
FROM lineitem""")
    return " UNION ALL ".join(parts)


SQL_PROFILE_TABLE = sql_profile_table()
