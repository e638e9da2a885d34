"""Text-retrieval operators: BM25 top-k search for a literal query and
winnowing local fingerprints (Schleimer, Wilkerson, Aiken: "Winnowing:
Local Algorithms for Document Fingerprinting", SIGMOD 2003).

Scale shapes:

- `bm25_search` never shuffles the corpus. Term frequencies for a
  literal query are per-row array folds (tf_t = count of t in the
  token array), so scoring is a PURE MAP stage; the corpus-level
  statistics it needs (N, sum of doc lengths, per-term document
  frequencies) are ONE map-side-combined aggregate producing a single
  row that is broadcast back. The top-k is a TakeOrdered (sort+limit
  pushed to partial top-k per partition), never a global sort of the
  corpus.
- `winnow_fingerprints` is a pure map stage: k-gram hashes, the
  sliding min-hash window selection, and the within-document dedup
  (array_distinct) are all JVM array expressions evaluated row-at-a-
  time inside whole-stage codegen — zero shuffles, output partitioning
  inherits the input's.

Cross-engine determinism: the BM25 score uses ln() and double
division; the expression TREE is written identically in the Spark
code and the DuckDB mirror (same literals, same parenthesization —
IEEE doubles make identical trees bit-identical), and the final score
is rounded to 6 decimals because ln() may differ in the last ulp
between libm and the JVM intrinsic (the package rule, see
curation.lm_score). Fingerprint hashes are the package-standard
md5-derived 28-bit integers (textops.hash28).

Reference parity note: geo-import has no text pipeline — these extend
the engine for the training-data/search use case the brief's north
rule targets (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geo_import_spark.operators.textops import SQL_TOKENS, tokens_col

# --- BM25 ---------------------------------------------------------------------

BM25_QUERY = ("hash", "join", "merge", "stream")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20

# constants pre-folded so the Spark expression tree and the SQL mirror
# carry the SAME literals (k1+1 and 1-b, not runtime arithmetic)
_K1P1 = BM25_K1 + 1.0  # 2.2
_1MB = 1.0 - BM25_B  # 0.25


def bm25_search(documents: DataFrame,
                terms: tuple[str, ...] = BM25_QUERY,
                topk: int = BM25_TOPK) -> DataFrame:
    """Top-k documents for a literal term query under BM25
    (Robertson/Spärck Jones; Lucene's idf = ln(1 + (N-df+0.5)/(df+0.5))).

    Two passes over the corpus, zero corpus-wide shuffles:
    pass 1 folds (N, sum_dl, df per term) into ONE row (map-side
    combined); pass 2 scores every document map-side from its own
    token array + the broadcast stats row and takes the global top-k
    as a TakeOrdered. Ties rank by doc_id so the cut is total.

    Returns (doc_id, dl, score, rank), rank <= topk, score > 0.
    """
    staged = documents.select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    ).select("doc_id", "toks", F.size("toks").alias("dl"))

    stats = staged.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(F.array_contains("toks", t).cast("int")).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    )

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    norm = F.lit(BM25_K1) * (
        F.lit(_1MB) + F.lit(BM25_B) * (F.col("dl").cast("double") / avgdl)
    )
    score = None
    for i, t in enumerate(terms):
        tf = F.size(F.filter("toks", lambda x: x == t)).cast("double")
        idf = F.ln(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        contrib = idf * (tf * F.lit(_K1P1)) / (tf + norm)
        score = contrib if score is None else score + contrib

    scored = (
        staged.crossJoin(F.broadcast(stats))
        .select("doc_id", "dl", F.round(score, 6).alias("score"))
        .filter(F.col("score") > 0)
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(topk)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def _sql_bm25_contrib(i: int, term: str) -> str:
    tf = f"CAST(len(list_filter(toks, x -> x = '{term}')) AS DOUBLE)"
    idf = f"ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
    norm = (
        f"{BM25_K1} * ({_1MB} + {BM25_B} * (CAST(dl AS DOUBLE)"
        f" / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))"
    )
    return f"{idf} * ({tf} * {_K1P1}) / ({tf} + {norm})"


SQL_BM25_SEARCH = f"""
WITH s AS (
  SELECT doc_id, toks, len(toks) AS dl
  FROM (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents)
),
st AS (
  SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
         {", ".join(
             f"sum(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS df_{i}"
             for i, t in enumerate(BM25_QUERY)
         )}
  FROM s
),
sc AS (
  SELECT doc_id, dl,
         round({" + ".join(_sql_bm25_contrib(i, t) for i, t in enumerate(BM25_QUERY))}, 6)
           AS score
  FROM s CROSS JOIN st
)
SELECT doc_id, dl, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
FROM (SELECT * FROM sc WHERE score > 0 ORDER BY score DESC, doc_id ASC LIMIT {BM25_TOPK})
"""

# --- winnowing fingerprints -----------------------------------------------------

WINNOW_K = 5  # k-gram length (chars, over whitespace-normalized text)
WINNOW_W = 4  # window: guarantee = any match >= k+w-1 chars is caught


def winnow_fingerprints(documents: DataFrame,
                        k: int = WINNOW_K,
                        w: int = WINNOW_W) -> DataFrame:
    """Winnowing document fingerprints: hash every char k-gram of the
    whitespace-normalized text, then keep the minimum hash of each
    window of w consecutive k-grams, breaking ties by the RIGHTMOST
    position (the SIGMOD'03 rule that makes selections self-
    synchronizing). Duplicate (pos, fp) selections from adjacent
    windows collapse in-row (array_distinct) — the output is the
    document's fingerprint set, ~1/w of its grams.

    Everything is JVM array expressions over each row; a document
    shorter than k chars yields no fingerprints, one with fewer than w
    grams yields exactly one window (so every non-trivial document is
    fingerprinted — the winnowing guarantee).

    Returns (doc_id, pos, fp): 1-based gram position + 28-bit hash.
    """
    staged = documents.select(
        "doc_id",
        F.concat_ws(" ", tokens_col(F.col("text"))).alias("s"),
    ).select(
        "doc_id",
        "s",
        F.greatest(F.length("s") - F.lit(k - 1), F.lit(0)).alias("n_grams"),
    )
    # sequence(1, 0) yields [1, 0] (descending) in Spark, so empty
    # ranges are expressed as filter(sequence(1, greatest(n, 1)), <= n)
    staged = staged.select(
        "doc_id",
        "n_grams",
        F.expr(
            "transform(filter(sequence(1, greatest(n_grams, 1)), i -> i <= n_grams),"
            f" i -> cast(conv(substring(md5(substring(s, i, {k})), 1, 7), 16, 10)"
            " as bigint))"
        ).alias("hashes"),
        F.expr(
            f"CASE WHEN n_grams <= 0 THEN 0 WHEN n_grams < {w} THEN 1"
            f" ELSE n_grams - {w} + 1 END"
        ).alias("n_win"),
    )
    fps = F.expr(
        "array_distinct(transform("
        "filter(sequence(1, greatest(n_win, 1)), j -> j <= n_win),"
        " j -> named_struct("
        f"'pos', cast(array_max(filter(sequence(j, least(j + {w - 1}, n_grams)),"
        f" p -> element_at(hashes, p) = array_min(slice(hashes, j, {w})))) as bigint),"
        f" 'fp', array_min(slice(hashes, j, {w})))))"
    )
    return staged.select("doc_id", F.explode(fps).alias("f")).select(
        "doc_id", F.col("f.pos").alias("pos"), F.col("f.fp").alias("fp")
    )


# mirror dedups with DISTINCT after unnest (duckdb's list_distinct is
# unimplemented for struct lists); equivalent because (pos, fp) pairs
# can only repeat within one doc_id
SQL_WINNOW_FINGERPRINTS = f"""
WITH t AS (
  SELECT doc_id, array_to_string({SQL_TOKENS}, ' ') AS s FROM documents
),
g AS (
  SELECT doc_id, s, greatest(length(s) - {WINNOW_K - 1}, 0) AS n_grams FROM t
),
h AS (
  SELECT doc_id, n_grams,
         list_transform(generate_series(1, n_grams),
           i -> CAST('0x' || substr(md5(substr(s, i, {WINNOW_K})), 1, 7) AS BIGINT))
           AS hashes,
         CASE WHEN n_grams <= 0 THEN 0 WHEN n_grams < {WINNOW_W} THEN 1
              ELSE n_grams - {WINNOW_W} + 1 END AS n_win
  FROM g
),
w AS (
  SELECT doc_id,
         list_transform(generate_series(1, n_win),
           j -> {{pos: list_max(list_filter(
                        generate_series(j, least(j + {WINNOW_W - 1}, n_grams)),
                        p -> hashes[p] = list_min(hashes[j : j + {WINNOW_W - 1}]))),
                 fp: list_min(hashes[j : j + {WINNOW_W - 1}])}}) AS fps
  FROM h
)
SELECT DISTINCT doc_id, u.pos AS pos, u.fp AS fp
FROM w, unnest(fps) AS r(u)
"""
