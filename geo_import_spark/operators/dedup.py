"""Near-duplicate detection at corpus scale: word n-gram Jaccard and
MinHash + LSH banding.

Plans are the canonical scale-out shapes:

- n-gram Jaccard: shingle-explode both sides → equi-join on shingle
  (one shuffle keyed by shingle; hot shingles are the skew axis) →
  per-pair |A∩B| count → Jaccard via inclusion–exclusion with the
  per-doc set sizes carried through the explode.
- MinHash: 28-bit shingle hashes (md5-derived, engine-portable) →
  NUM_PERM permutations (a·h + b) mod P with fixed constants → per-doc
  signature array → LSH: slice the signature into bands, join docs
  sharing a band bucket. Candidate generation never compares all
  pairs — the only shuffles are keyed by shingle / band bucket.

Everything is JVM-side array expressions (no Python UDFs); SQL mirrors
for the DuckDB oracle are alongside each operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_import_spark.operators.textops import SQL_HASH28, SQL_TOKENS, hash28, tokens_col

NGRAM = 3
MINHASH_P = 1073741827  # prime > 2^30; (a·h + b) stays < 2^60
NUM_PERM = 16
LSH_BANDS = 4  # 4 bands x 4 rows
ROWS_PER_BAND = NUM_PERM // LSH_BANDS

# Fixed permutation constants — the same integers are inlined into the
# SQL mirror, so signatures are engine-identical.
PERM_A = [(j * 2654435761 + 1) % MINHASH_P or 1 for j in range(1, NUM_PERM + 1)]
PERM_B = [(j * 1779033703 + 7) % MINHASH_P for j in range(1, NUM_PERM + 1)]


def shingles_col(text_col, n: int = NGRAM):
    """Distinct word n-grams (space-joined) of a text column."""
    toks = tokens_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + d).cast("int")) for d in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    threshold: float = 0.2,
    max_df_frac: float | None = 0.01,
) -> DataFrame:
    """All doc pairs with word-3-gram Jaccard ≥ threshold.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b.

    max_df_frac caps shingle document frequency BEFORE the self-join:
    a shingle appearing in more than max_df_frac of all docs (hot
    boilerplate — the skew axis) is dropped from candidate generation,
    bounding the equi-join's per-key fan-out. Without it one hot
    shingle shared by f docs produces f^2/2 pairs — quadratic blowup
    at corpus scale. Per-doc set sizes (na/nb) still count ALL
    shingles, so the cap only *under*-counts intersections (standard
    recall-on-boilerplate tradeoff). None disables the cap.
    """
    ex = (
        documents.select("doc_id", shingles_col(F.col("text")).alias("sh"))
        .select("doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle"))
    )
    if max_df_frac is not None:
        cap = max_df_frac * documents.count()
        hot = (
            ex.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > cap)
            .select("shingle")
        )
        ex = ex.join(F.broadcast(hot), "shingle", "left_anti")
    a = ex.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"), "shingle")
    b = ex.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    ).cast("double")
    return shared.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def _sigs_col():
    """MinHash signature array (NUM_PERM mins) for the text column."""
    hs = F.transform(shingles_col(F.col("text")), hash28)

    def perm_fn(a, b):
        return lambda h: (h * F.lit(a) + F.lit(b)) % MINHASH_P

    return F.array(
        *[
            F.array_min(F.transform(hs, perm_fn(a, b)))
            for a, b in zip(PERM_A, PERM_B)
        ]
    )


def minhash_signatures(documents: DataFrame) -> DataFrame:
    """Per-doc MinHash signature, exploded to (doc_id, perm, sig) rows
    for stable cross-engine comparison."""
    return (
        documents.select("doc_id", _sigs_col().alias("sigs"))
        .select("doc_id", F.posexplode("sigs").alias("perm", "sig"))
        .select("doc_id", F.col("perm").cast("int").alias("perm"), "sig")
    )


def minhash_lsh_pairs(documents: DataFrame) -> DataFrame:
    """Candidate near-dup pairs: docs sharing at least one LSH band.

    Band bucket = band index + comma-joined signature slice; self-join
    on bucket. Output: (doc_a, doc_b) distinct, doc_a < doc_b.
    """
    sigs = documents.select("doc_id", _sigs_col().alias("sigs"))
    buckets = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(bnd)),
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice("sigs", bnd * ROWS_PER_BAND + 1, ROWS_PER_BAND),
                        lambda s: s.cast("string"),
                    ),
                ),
            )
            for bnd in range(LSH_BANDS)
        ]
    )
    keyed = sigs.select("doc_id", F.explode(buckets).alias("bucket"))
    a = keyed.select(F.col("doc_id").alias("doc_a"), "bucket")
    b = keyed.select(F.col("doc_id").alias("doc_b"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def duplicate_clusters(
    documents: DataFrame,
    pairs: DataFrame | None = None,
    max_rounds: int = 20,
) -> DataFrame:
    """Near-dup pairs -> connected components -> representative per doc:
    the last step of a production dedup pipeline (keep one doc per
    cluster). Output: (doc_id, cluster_rep) for EVERY document —
    singletons map to themselves; cluster_rep is the lexicographic min
    doc_id of the component (deterministic, engine-independent).

    Plan: iterative min-label propagation. labels start as
    (doc_id, doc_id); each round joins labels to the (bidirectional)
    edge list and takes the per-doc min over {own label} ∪ {neighbor
    labels} — one shuffle keyed by doc_id per round, converging in
    <= graph-diameter rounds (near-dup clusters are shallow: a dup
    cluster's diameter is small by construction, so 3-5 rounds settle
    real corpora). Lineage is truncated per round (localCheckpoint) so
    the driver-bounded loop never builds an unbounded plan. The
    fixpoint test is an exact changed-row count, not a hash.

    pairs defaults to minhash_lsh_pairs(documents); any (doc_a, doc_b)
    pair generator (ngram_jaccard_pairs, simhash buckets) plugs in.
    """
    if pairs is None:
        pairs = minhash_lsh_pairs(documents)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    edges = edges.localCheckpoint(eager=True)  # pair generation runs once

    labels = documents.select(
        "doc_id", F.col("doc_id").alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        neighbor = (
            edges.join(labels, edges["src"] == labels["doc_id"])
            .select(F.col("dst").alias("doc_id"), "label")
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("doc_id", F.col("label").alias("cluster_rep"))


# --- SQL mirrors ------------------------------------------------------------

SQL_SHINGLES = f"""
list_distinct(CASE WHEN len({SQL_TOKENS}) >= {NGRAM} THEN
  list_transform(range(1, len({SQL_TOKENS}) - {NGRAM - 2}),
    i -> {SQL_TOKENS}[i] || ' ' || {SQL_TOKENS}[i+1] || ' ' || {SQL_TOKENS}[i+2])
ELSE [] END)
"""

_PERM_A_SQL = "[" + ", ".join(str(a) for a in PERM_A) + "]"
_PERM_B_SQL = "[" + ", ".join(str(b) for b in PERM_B) + "]"

# Per-doc ordered signature list (index j = permutation j).
SQL_MINHASH_SIGS_LIST = f"""
SELECT doc_id,
       list_transform(range(1, {NUM_PERM + 1}), j ->
         list_min(list_transform(
           list_transform({SQL_SHINGLES}, x -> {SQL_HASH28.format(x='x')}),
           h -> (h * ({_PERM_A_SQL})[j] + ({_PERM_B_SQL})[j]) % {MINHASH_P}))) AS sigs
FROM documents
"""

SQL_NGRAM_JACCARD = f"""
WITH sh AS (SELECT doc_id, {SQL_SHINGLES} AS sh FROM documents),
ex0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM sh),
hot AS (
  SELECT shingle FROM ex0 GROUP BY shingle
  HAVING COUNT(*) > (SELECT {{max_df_frac}} * COUNT(*) FROM documents)
),
ex AS (SELECT * FROM ex0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
         COUNT(*) AS inter
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) AS jaccard
FROM shared
WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= {{threshold}}
"""

SQL_MINHASH_SIG = f"""
WITH sigs AS ({SQL_MINHASH_SIGS_LIST})
SELECT doc_id, CAST(j - 1 AS INTEGER) AS perm, sigs[j] AS sig
FROM sigs, (SELECT unnest(range(1, {NUM_PERM + 1})) AS j)
"""

SQL_MINHASH_LSH_PAIRS = f"""
WITH sigs AS ({SQL_MINHASH_SIGS_LIST}),
keyed AS (
  SELECT doc_id,
         CAST(b AS VARCHAR) || ':' ||
           array_to_string(list_transform(
             sigs[(b * {ROWS_PER_BAND} + 1):(b * {ROWS_PER_BAND} + {ROWS_PER_BAND})],
             s -> CAST(s AS VARCHAR)), ',') AS bucket
  FROM sigs, (SELECT unnest(range(0, {LSH_BANDS})) AS b)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM keyed a JOIN keyed b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
"""

# Connected components over the LSH pairs: min label reachable from
# each doc (bidirectional edges => component minimum). Mirrors
# duplicate_clusters() value-for-value, singletons included.
SQL_DUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS ({SQL_MINHASH_LSH_PAIRS}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
walk(doc_id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.doc_id
)
SELECT doc_id, MIN(label) AS cluster_rep FROM walk GROUP BY doc_id
"""
