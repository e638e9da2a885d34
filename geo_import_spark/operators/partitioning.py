"""Range-partition boundary planning from a deterministic sample —
the write-side optimizer strategy behind sort-clustered tables
(plans/table.py compact(sort_cols=...)) exposed as a first-class,
oracle-checkable operator.

Spark's own RangePartitioner samples with an RNG, so its fences are
not reproducible run-to-run. Here the sample is the md5-per-mille
keep rule (the split_assign trick, operators/curation.py): a pure map
filter that selects the same ~rate/1000 of rows on every engine and
every run. The fences are then EXACT order statistics of the sample —
fence i = sample value at rank floor(i * n / buckets) — so two engines
compute byte-identical fences and a planner can cache them.

Scale shape: the corpus-sized work is ONE map-side filter (no
shuffle). Only the sample (rate/1000 of rows, e.g. 100 MB for 100 TB
at the default 1 per mille) is globally sorted for ranking — the same
cost profile as Spark's internal boundary estimation, but
deterministic. The single-partition rank window over the sample is
bounded by the sample size, never the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geo_import_spark.operators.textops import SQL_HASH28, hash28

FENCE_BUCKETS = 8
FENCE_PER_MILLE = 50  # sample rate at test SF; 1 at 100 TB


def range_fences(df: DataFrame, value_col: str, key_col: str,
                 n_buckets: int = FENCE_BUCKETS,
                 per_mille: int = FENCE_PER_MILLE) -> DataFrame:
    """(fence_idx, fence_value): the n_buckets-1 range fences that
    split `value_col` into near-equal buckets, from the deterministic
    md5(key) per-mille sample."""
    sample = df.filter(
        hash28(F.col(key_col).cast("string")) % 1000 < per_mille
    ).select(F.col(value_col).alias("v"), F.col(key_col).alias("k"))
    n = sample.agg(F.count("*").alias("n"))
    w = Window.orderBy("v", "k")  # total order; sample-sized, bounded
    ranked = sample.withColumn("rn", F.row_number().over(w))
    idx = (
        df.sparkSession.range(1, n_buckets)
        .select(F.col("id").cast("int").alias("fence_idx"))
        .crossJoin(F.broadcast(n))
        .select(
            "fence_idx",
            F.floor(F.col("fence_idx") * F.col("n") / n_buckets)
            .cast("int")
            .alias("target_rn"),
        )
    )
    return (
        ranked.join(F.broadcast(idx), ranked["rn"] == idx["target_rn"])
        .select("fence_idx", F.col("v").alias("fence_value"))
    )


def sql_range_fences(source_sql: str, value_col: str, key_col: str,
                     n_buckets: int = FENCE_BUCKETS,
                     per_mille: int = FENCE_PER_MILLE) -> str:
    h = SQL_HASH28.format(x=f"CAST({key_col} AS VARCHAR)")
    return f"""
WITH src AS ({source_sql}),
s AS (
  SELECT {value_col} AS v, {key_col} AS k FROM src
  WHERE {h} % 1000 < {per_mille}
),
r AS (
  SELECT v, row_number() OVER (ORDER BY v, k) AS rn,
         count(*) OVER () AS n
  FROM s
)
SELECT CAST(fence_idx AS INT) AS fence_idx, v AS fence_value
FROM r JOIN (SELECT unnest(range(1, {n_buckets})) AS fence_idx) i
  ON r.rn = CAST(floor(i.fence_idx * r.n / {n_buckets}) AS BIGINT)
"""
