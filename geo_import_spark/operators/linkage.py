"""Record linkage: blocked fuzzy matching by edit distance.

The classic entity-resolution shape: a quadratic all-pairs levenshtein
is impossible at scale, so candidates come from a BLOCKING key — here
(name length, last 4 chars), which is provably complete for the
planted corruption model (substitutions in the leading digit region
never touch the suffix) and discriminating (the suffix carries the
low-order key digits, so blocks stay O(n / 10^4)). The exact edit
distance then filters candidates inside the join.

Corruption corpus: each customer name spawns one dirty twin with a
deterministic single-digit substitution at position 10 + (key % 4) —
exact string surgery mirrored verbatim in SQL, always distance 1 from
its source (the replacement digit provably differs).

Both engines implement unit-cost Levenshtein identically, so the
(a_id, b_id, dist) output hash-checks.

Reference parity: none — geo-import has no linkage; this extends the
table-reconciliation family (operators/reconcile.py) with the fuzzy
variant a real ingest dedup needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LINK_MAX_DIST = 2


def clean_names(customer: DataFrame) -> DataFrame:
    """(a_id, name) — the trusted side."""
    return customer.select(
        F.col("c_custkey").cast("long").alias("a_id"),
        F.col("c_name").alias("name"),
    )


# one deterministic digit substitution at 1-indexed position
# 10 + (key % 4): new digit = (old + 1 + key % 8) % 10, which is never
# the old digit because (1 + key % 8) % 10 != 0.
_MUTATE = (
    "concat(substr(c_name, 1, 9 + ({k} % 4)), "
    "CAST((CAST(substr(c_name, 10 + ({k} % 4), 1) AS INT)"
    " + 1 + {k} % 8) % 10 AS STRING), "
    "substr(c_name, 11 + ({k} % 4)))"
)


def dirty_names(customer: DataFrame) -> DataFrame:
    """(b_id, name) — the corrupted twin of every customer name."""
    return customer.select(
        F.col("c_custkey").cast("long").alias("b_id"),
        F.expr(_MUTATE.format(k="CAST(c_custkey AS BIGINT)")).alias("name"),
    )


SQL_CLEAN_NAMES = (
    "SELECT CAST(c_custkey AS BIGINT) AS a_id, c_name AS name FROM customer"
)
SQL_DIRTY_NAMES = f"""
SELECT CAST(c_custkey AS BIGINT) AS b_id,
       {_MUTATE.format(k="CAST(c_custkey AS BIGINT)")} AS name
FROM customer
"""


def _block_key(name):
    return F.struct(
        F.length(name).alias("ln"),
        F.substring(name, -4, 4).alias("sfx"),
    )


def typo_link(a: DataFrame, b: DataFrame,
              max_dist: int = LINK_MAX_DIST) -> DataFrame:
    """(a_id, b_id, dist): all cross-side name pairs within edit
    distance max_dist that share the blocking key.

    ONE equi-join on (length, 4-char suffix) generates candidates —
    never a cross join; levenshtein filters JVM-side inside the join.
    Block completeness holds for edits that preserve length and the
    suffix (the corpus' corruption model; real deployments run
    several complementary blocking passes and union them).
    """
    aa = a.select("a_id", F.col("name").alias("a_name"),
                  _block_key(F.col("name")).alias("bk"))
    bb = b.select("b_id", F.col("name").alias("b_name"),
                  _block_key(F.col("name")).alias("bk"))
    return (
        aa.join(bb, "bk")
        .select(
            "a_id", "b_id",
            F.levenshtein("a_name", "b_name").alias("dist"),
        )
        .filter(F.col("dist") <= int(max_dist))
    )


def sql_typo_link(sql_a: str, sql_b: str,
                  max_dist: int = LINK_MAX_DIST) -> str:
    return f"""
WITH a AS ({sql_a}), b AS ({sql_b})
SELECT a.a_id AS a_id, b.b_id AS b_id,
       levenshtein(a.name, b.name) AS dist
FROM a JOIN b
  ON length(a.name) = length(b.name)
 AND substr(a.name, length(a.name) - 3, 4)
     = substr(b.name, length(b.name) - 3, 4)
WHERE levenshtein(a.name, b.name) <= {int(max_dist)}
"""
