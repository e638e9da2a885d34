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

# --- reciprocal-rank fusion (hybrid lexical + semantic retrieval) ---------------

RRF_C = 60  # the standard RRF constant (Cormack/Clarke/Buettcher, SIGIR'09)
RRF_QVEC = 0  # query embedding = vec_id 0 (vec_id aligns 1:1 with doc_id)
RRF_TOPK = 20


def rrf_fusion(documents: DataFrame,
               embeddings: DataFrame,
               terms: tuple[str, ...] = BM25_QUERY,
               qvec: int = RRF_QVEC,
               topk: int = RRF_TOPK) -> DataFrame:
    """Hybrid retrieval: fuse a lexical (BM25) and a semantic
    (embedding-cosine) ranking with reciprocal-rank fusion,
    score = sum over lists of 1/(C + rank), C = 60.

    Scale shape: both input rankings are top-k lists — the corpus
    work is exactly bm25_search's (zero corpus shuffles) plus one
    map-side cosine pass against the single broadcast query vector
    with a TakeOrdered top-k. The fusion itself joins two <= topk-row
    frames — size-k, never data. Ranks are integers, so the RRF score
    is a fixed two-term rational expression — engine-exact (IEEE
    division of exact integers is correctly rounded everywhere).

    Returns (doc_id, lex_rank, sem_rank, rrf, rank); absent-list
    ranks are 0, rank is dense over the fused union.
    """
    lex = bm25_search(documents, terms, topk).select(
        "doc_id", F.col("rank").alias("lex_rank")
    )

    e = embeddings.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = e.filter(F.col("vec_id") == qvec).select(F.col("v").alias("qv"))
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731 - local expression builder
        F.aggregate(
            F.zip_with(c, c, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
    )
    cand = e.crossJoin(F.broadcast(q)).select(
        "vec_id", (dot / (nrm("qv") * nrm("v"))).alias("cos")
    )
    top = cand.orderBy(F.desc("cos"), F.asc("vec_id")).limit(topk)
    sem = top.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("cos"), F.asc("vec_id")))
        .cast("int")
        .alias("sem_rank"),
    )

    fused = lex.join(sem, "doc_id", "full_outer")
    contrib = lambda c: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(RRF_C) + F.col(c)).cast("double"), F.lit(0.0)
    )
    scored = fused.select(
        "doc_id",
        F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
        F.coalesce("sem_rank", F.lit(0)).alias("sem_rank"),
        F.round(contrib("lex_rank") + contrib("sem_rank"), 9).alias("rrf"),
    )
    w = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("int"))


def _sql_rrf() -> str:
    dv = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    dot = "list_sum(list_transform(range(1, len(v) + 1), i -> qv[i] * v[i]))"
    n = lambda c: (  # noqa: E731
        f"sqrt(list_sum(list_transform(range(1, len({c}) + 1),"
        f" i -> {c}[i] * {c}[i])))"
    )
    contrib = (
        "COALESCE(CAST(1.0 AS DOUBLE)"
        f" / CAST({RRF_C} + {{r}} AS DOUBLE), CAST(0.0 AS DOUBLE))"
    )
    return f"""
WITH lex AS (
  SELECT doc_id, rank AS lex_rank FROM ({SQL_BM25_SEARCH})
),
e AS (SELECT vec_id, {dv} AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {RRF_QVEC}),
cand AS (
  SELECT vec_id, {dot} / ({n("qv")} * {n("v")}) AS cos
  FROM e CROSS JOIN q
),
sem AS (
  SELECT vec_id AS doc_id,
         CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS sem_rank
  FROM (SELECT * FROM cand ORDER BY cos DESC, vec_id ASC LIMIT {RRF_TOPK})
),
fused AS (
  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, lex_rank, sem_rank
  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
),
scored AS (
  -- contrib binds to the raw nullable columns (qualified), never the
  -- coalesced lateral aliases: absent-list contribution must be 0
  SELECT doc_id,
         COALESCE(fused.lex_rank, 0) AS lex_rank,
         COALESCE(fused.sem_rank, 0) AS sem_rank,
         round({contrib.format(r="fused.lex_rank")}
               + {contrib.format(r="fused.sem_rank")}, 9) AS rrf
  FROM fused
)
SELECT doc_id, lex_rank, sem_rank, rrf,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS INT) AS rank
FROM scored
"""


SQL_RRF_FUSION = _sql_rrf()

# --- inverted-index postings -----------------------------------------------------

POSTINGS_CAP = 3  # postings kept per term (top by tf, doc_id tie-break)
POSTINGS_SALT = 16  # exact two-level top-k fan-out for hot (stopword) terms


def inverted_postings(documents: DataFrame,
                      cap: int = POSTINGS_CAP) -> DataFrame:
    """Build inverted-index postings: for every term, its document
    frequency, total term frequency, and the top-`cap` postings by
    (tf DESC, doc_id ASC).

    Scale shape: (term, doc_id) term frequencies are ONE map-side-
    combined shuffle. Term-level stats (df, tf_total) are a second
    map-side-combined aggregate — combiners reduce a stopword's rows
    to one per partition, so the hot-key skew a naive window would hit
    never reaches the reducer. The top-cap postings use an EXACT
    two-level top-k: a first row_number over (term, doc_id % salt)
    keeps <= cap rows per salt lane (a stopword's window partition
    shrinks from |docs| to |docs|/salt), then the global row_number
    per term runs over <= salt*cap rows. Output is vocabulary-sized.

    Returns (term, df, tf_total, doc_id, tf, post_rank), post_rank <= cap.
    """
    tf = (
        documents.select(
            "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    stats = tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("tf_total")
    )
    lane = F.pmod(F.col("doc_id"), F.lit(POSTINGS_SALT))
    w1 = Window.partitionBy("term", "lane").orderBy(
        F.desc("tf"), F.asc("doc_id")
    )
    local = (
        tf.withColumn("lane", lane)
        .withColumn("lr", F.row_number().over(w1))
        .filter(F.col("lr") <= cap)
    )
    w2 = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    top = (
        local.withColumn("post_rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("post_rank") <= cap)
        .select("term", "doc_id", "tf", "post_rank")
    )
    return top.join(stats, "term").select(
        "term", "df", "tf_total", "doc_id", "tf", "post_rank"
    )


SQL_INVERTED_POSTINGS = f"""
WITH tf AS (
  SELECT term, doc_id, count(*) AS tf
  FROM (SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents)
  GROUP BY term, doc_id
),
stats AS (
  SELECT term, count(*) AS df, sum(tf) AS tf_total FROM tf GROUP BY term
),
top AS (
  SELECT term, doc_id, tf,
         CAST(row_number() OVER (PARTITION BY term
                                 ORDER BY tf DESC, doc_id ASC) AS INT) AS post_rank
  FROM tf
)
SELECT top.term AS term, df, tf_total, doc_id, tf, post_rank
FROM top JOIN stats ON top.term = stats.term
WHERE post_rank <= {POSTINGS_CAP}
"""

# --- winnowing match pairs (MOSS-style) -------------------------------------------

WINNOW_PAIR_MIN_SHARED = 8
WINNOW_PAIR_MAX_DF_FRAC = 0.05  # fingerprints in > 5% of docs are boilerplate


def winnow_pairs(documents: DataFrame,
                 min_shared: int = WINNOW_PAIR_MIN_SHARED,
                 max_df_frac: float = WINNOW_PAIR_MAX_DF_FRAC) -> DataFrame:
    """Document match candidates from shared winnowing fingerprints —
    the pair stage of a MOSS-style overlap detector on top of
    winnow_fingerprints.

    Same scale discipline as the n-gram Jaccard join (dedup.py):
    boilerplate fingerprints (document frequency above max_df_frac of
    the corpus) are dropped BEFORE the self-join — they contribute
    quadratic candidate pairs and no discrimination — and candidates
    come from the fp equi-join, never all-pairs. The winnowing
    guarantee transfers: any shared substring of length >= k + w - 1
    whose selected fingerprint survives the df cap yields a shared
    (fp) hit.

    Returns (doc_a, doc_b, n_shared), n_shared >= min_shared.
    """
    fps = winnow_fingerprints(documents).select("doc_id", "fp").distinct()
    nd = fps.agg(F.count_distinct("doc_id").alias("n"))
    keep = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("c"))
        .crossJoin(F.broadcast(nd))
        .filter(F.col("c") <= F.lit(max_df_frac) * F.col("n"))
        .select("fp")
    )
    uf = fps.join(keep, "fp")
    a = uf.select(F.col("doc_id").alias("doc_a"), "fp")
    b = uf.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


SQL_WINNOW_PAIRS = f"""
WITH fp AS ({SQL_WINNOW_FINGERPRINTS}),
u AS (SELECT DISTINCT doc_id, fp FROM fp),
nd AS (SELECT count(DISTINCT doc_id) AS n FROM u),
keep AS (
  SELECT fp FROM u GROUP BY fp
  HAVING count(*) <= {WINNOW_PAIR_MAX_DF_FRAC} * (SELECT n FROM nd)
),
uf AS (SELECT u.doc_id, u.fp FROM u JOIN keep USING (fp))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
FROM uf a JOIN uf b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= {WINNOW_PAIR_MIN_SHARED}
"""
