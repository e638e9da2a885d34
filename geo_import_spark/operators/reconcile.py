"""Reconciliation operators: keyed data-diff between two tables and an
order-insensitive content checksum — the validation tooling every
migration/replication pipeline runs after a copy or a backfill (the
operational sibling of Table's snapshot machinery).

- `frame_diff` classifies every key as same / changed / only_a /
  only_b from ONE full-outer join on the key of two content-hash
  projections: each side reduces to (key, md5(content)) map-side, so
  the join carries two narrow frames regardless of row width. At
  100 TB both sides shuffle once on the key — the unavoidable
  co-location — and nothing else.
- `table_checksum` folds every row's 28-bit content hash into a SUM
  (exact bigint, order-free, mergeable across partitions/snapshots):
  two tables with equal checksums and counts almost certainly hold
  the same multiset of rows (2^-28 per-row collision, additive), and
  the checksum of a union is the sum of checksums — so replicas can
  be compared without moving data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_import_spark.operators.textops import hash28


def frame_diff(a: DataFrame, b: DataFrame, key: str,
               content: str) -> DataFrame:
    """(key, status) for every key in either frame; status in
    same | changed | only_a | only_b. `content` is the compared
    column (md5'd per side before the join)."""
    ha = a.select(F.col(key).alias("k"), F.md5(content).alias("ha"))
    hb = b.select(F.col(key).alias("k"), F.md5(content).alias("hb"))
    j = ha.join(hb, "k", "full_outer")
    status = (
        F.when(F.col("ha").isNull(), F.lit("only_b"))
        .when(F.col("hb").isNull(), F.lit("only_a"))
        .when(F.col("ha") == F.col("hb"), F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col("k").alias(key), status.alias("status"))


def sql_frame_diff(sql_a: str, sql_b: str, key: str, content: str) -> str:
    return f"""
WITH a AS ({sql_a}), b AS ({sql_b}),
ha AS (SELECT {key} AS k, md5({content}) AS ha FROM a),
hb AS (SELECT {key} AS k, md5({content}) AS hb FROM b)
SELECT COALESCE(ha.k, hb.k) AS {key},
       CASE WHEN ha.ha IS NULL THEN 'only_b'
            WHEN hb.hb IS NULL THEN 'only_a'
            WHEN ha.ha = hb.hb THEN 'same'
            ELSE 'changed' END AS status
FROM ha FULL OUTER JOIN hb ON ha.k = hb.k
"""


def table_checksum(df: DataFrame, content: str) -> DataFrame:
    """One row: (n_rows, checksum) with checksum = sum of per-row
    28-bit content hashes — order-free, mergeable, exact bigint
    (2^28 * rows overflows int64 only past ~3e10 rows)."""
    return df.agg(
        F.count("*").alias("n_rows"),
        F.coalesce(F.sum(hash28(F.col(content))), F.lit(0).cast("long"))
        .alias("checksum"),
    )


def sql_table_checksum(sql_src: str, content: str) -> str:
    h = f"CAST('0x' || substr(md5({content}), 1, 7) AS BIGINT)"
    return f"""
SELECT count(*) AS n_rows,
       COALESCE(CAST(sum({h}) AS BIGINT), 0) AS checksum
FROM ({sql_src})
"""
