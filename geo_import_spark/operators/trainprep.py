"""Training-data preparation operators: deterministic stratified
sampling, benchmark decontamination, TF-IDF term weighting,
repetition (Gopher-style) quality stats, PII scan/redaction, and
token-budget sequence packing.

These are the corpus-curation steps a large-scale LLM data pipeline
runs between raw ingest and tokenization — re-expressed as Spark
plans with the same scale discipline as the rest of the engine:

- sampling / repetition / PII are pure map stages (zero shuffle,
  whole-stage codegen end to end);
- decontamination shuffles once on the shingle key with the benchmark
  side broadcast (it is small by construction);
- TF-IDF shuffles on (doc, token) then token — the canonical
  word-count shape — and joins document frequency back by token;
- packing is one window per source partition (the partition key is
  the salting axis if a single source dominates).

Every operator is mirrored in ANSI SQL for the DuckDB oracle; the
cross-engine determinism rules are the package-wide ones
(textops.py): md5-derived 28-bit hashes, int/int double division,
exact integer counts.

Reference parity note: geo-import has no text pipeline — these
operators extend the engine for the training-data use case the
brief's north rule targets (documents/embeddings tables), alongside
the geospatial core mapped in SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geo_import_spark.operators.textops import SQL_HASH28, SQL_TOKENS, hash28, tokens_col

# --- stratified sampling -----------------------------------------------------

# keep-percentage per language stratum (missing langs fall to DEFAULT)
SAMPLE_RATES: dict[str, int] = {"en": 80, "de": 50, "fr": 50, "es": 50, "zh": 25}
SAMPLE_DEFAULT = 10


def stratified_sample(documents: DataFrame,
                      rates: dict[str, int] | None = None,
                      default_pct: int = SAMPLE_DEFAULT) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a document iff
    md5-bucket(doc_id) % 100 < rate(lang). Rehash-stable (adding docs
    never flips existing keep decisions), reproducible across engines
    and runs, and a pure map stage — the sample of 100 TB costs one
    scan, no shuffle, no RNG state.

    documents(doc_id, lang, ...) -> (doc_id, lang, bucket) kept rows.
    """
    rates = SAMPLE_RATES if rates is None else rates
    bucket = hash28(F.col("doc_id").cast("string")) % 100
    rate = F.lit(default_pct)
    for lang, pct in rates.items():
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    return (
        documents.select("doc_id", "lang", bucket.alias("bucket"), rate.alias("rate"))
        .filter(F.col("bucket") < F.col("rate"))
        .select("doc_id", "lang", "bucket")
    )


_SQL_RATE = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in SAMPLE_RATES.items()
) + f" ELSE {SAMPLE_DEFAULT} END"

SQL_STRATIFIED_SAMPLE = f"""
WITH b AS (
  SELECT doc_id, lang,
         {SQL_HASH28.format(x="CAST(doc_id AS VARCHAR)")} % 100 AS bucket
  FROM documents
)
SELECT doc_id, lang, bucket FROM b WHERE bucket < {_SQL_RATE}
"""

# --- benchmark decontamination -----------------------------------------------

DECONTAM_NGRAM = 5
BENCH_MOD = 97  # doc_id % 97 == 0 -> the synthetic "benchmark" subset


def decontaminate(documents: DataFrame,
                  bench_mod: int = BENCH_MOD,
                  n: int = DECONTAM_NGRAM) -> DataFrame:
    """Flag training documents sharing any word n-gram with a
    benchmark set (the standard eval-contamination sweep).

    The benchmark here is the deterministic subset doc_id % bench_mod
    == 0; in production it is a small table of eval-set documents.
    Plan shape: benchmark shingles are distinct-ed and BROADCAST
    (the benchmark is tiny relative to the corpus by construction),
    so the corpus side is one scan + explode + broadcast semi-side
    join + one shuffle on doc_id for the per-doc count — the corpus
    never shuffles on the shingle key.

    Output: (doc_id, n_shared) for contaminated non-benchmark docs.
    """
    from geo_import_spark.operators.dedup import shingles_of_tokens

    sh = shingles_of_tokens(F.col("toks"), n)
    staged = documents.select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    )
    bench = (
        staged.filter(F.col("doc_id") % bench_mod == 0)
        .select(F.explode(sh).alias("shingle"))
        .distinct()
    )
    corpus_sh = (
        staged.filter(F.col("doc_id") % bench_mod != 0)
        .select("doc_id", F.explode(sh).alias("shingle"))
    )
    return (
        corpus_sh.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )


def _sql_shingles(n: int) -> str:
    gram = " || ' ' || ".join(f"toks[i + {d}]" for d in range(n))
    return (
        f"list_distinct(CASE WHEN len(toks) >= {n} THEN "
        f"list_transform(range(1, len(toks) - {n - 2}), i -> {gram}) "
        f"ELSE [] END)"
    )


SQL_DECONTAMINATE = f"""
WITH t AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
s AS (SELECT doc_id, unnest({_sql_shingles(DECONTAM_NGRAM)}) AS shingle FROM t),
bench AS (SELECT DISTINCT shingle FROM s WHERE doc_id % {BENCH_MOD} = 0)
SELECT s.doc_id AS doc_id, COUNT(*) AS n_shared
FROM s JOIN bench USING (shingle)
WHERE s.doc_id % {BENCH_MOD} <> 0
GROUP BY s.doc_id
"""

# --- TF-IDF top terms ---------------------------------------------------------

TFIDF_K = 5


def tfidf_top_terms(documents: DataFrame, k: int = TFIDF_K) -> DataFrame:
    """Top-k terms per document by a document-frequency-normalized
    weight: score = tf * N / df (monotone in tf-idf for fixed tf;
    int*int/int double division keeps it engine-exact — ln(N/df)
    would differ in the last ulp across math libraries).

    Plan: tf = one shuffle on (doc_id, token); df = map-side-combined
    re-agg of tf on token; N rides along as a broadcast scalar; the
    top-k is a row_number window on doc_id (already the tf
    partitioning key). Ties break on token order, so ranks are total.

    Output: (doc_id, token, tf, df, score, rank), rank <= k.
    """
    tf = (
        documents.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df_tbl = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = documents.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_tbl, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df").cast("double"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "token", "tf", "df", "score", "rank")
    )


SQL_TFIDF_TOP_TERMS = f"""
WITH tok AS (
  SELECT doc_id, unnest({SQL_TOKENS}) AS token FROM documents
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
), dft AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
), scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dft.df,
         CAST(tf.tf * (SELECT COUNT(*) FROM documents) AS DOUBLE)
           / CAST(dft.df AS DOUBLE) AS score
  FROM tf JOIN dft USING (token)
), ranked AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, token ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT doc_id, token, tf, df, score, rank FROM ranked WHERE rank <= {TFIDF_K}
"""

# --- repetition stats (Gopher-style quality rule) -----------------------------


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Per-doc token-bigram repetition: total bigrams, distinct
    bigrams, the most frequent bigram's count, and its fraction of
    all bigrams (the Gopher "top n-gram fraction" quality rule).

    Entirely JVM array expressions over each row — zero shuffle; at
    100 TB this is a pure map stage like quality_score. The top-bigram
    search is ONE fold over the sorted bigram array (O(n log n) per
    row): naive per-distinct-element counting via nested lambdas makes
    Catalyst re-evaluate the whole bigram expression per element
    (higher-order functions don't CSE their argument) — measured as a
    ~10^3x per-row blowup, so don't.

    Output: (doc_id, n_bigrams, n_uniq_bigrams, top_bigram,
    top_bigram_n, rep_ratio). Docs with < 2 tokens get nulls.
    """
    toks = tokens_col(F.col("text"))
    bg = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i.cast("int")),
                F.element_at(toks, (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    stats = F.aggregate(
        F.array_sort(bg),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit(None).cast("string").alias("best_bg"),
        ),
        # equal bigrams are adjacent after the sort; strictly-greater
        # update keeps the FIRST (= smallest) bigram of the argmax set
        lambda acc, b: F.struct(
            b.alias("prev"),
            F.when(b == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(b == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
            F.when(
                F.when(b == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
                > acc["best"],
                b,
            ).otherwise(acc["best_bg"]).alias("best_bg"),
        ),
    )
    staged = documents.select(
        "doc_id", F.size(bg).alias("n_bigrams"),
        F.size(F.array_distinct(bg)).alias("n_uniq_bigrams"),
        stats.alias("s"),
    )
    n_bg = F.col("n_bigrams")
    return staged.select(
        "doc_id", "n_bigrams", "n_uniq_bigrams",
        F.col("s.best_bg").alias("top_bigram"),
        F.when(n_bg > 0, F.col("s.best")).alias("top_bigram_n"),
        F.when(n_bg > 0, F.col("s.best").cast("double") / n_bg.cast("double"))
        .alias("rep_ratio"),
    )


SQL_REPETITION_STATS = f"""
WITH t AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
b AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
              ELSE [] END AS bg
  FROM t
), m AS (
  SELECT doc_id, bg, list_distinct(bg) AS uniq,
         list_transform(list_distinct(bg),
                        x -> len(list_filter(bg, e -> e = x))) AS counts
  FROM b
)
SELECT doc_id,
       CAST(len(bg) AS INTEGER) AS n_bigrams,
       CAST(len(uniq) AS INTEGER) AS n_uniq_bigrams,
       CASE WHEN len(bg) > 0 THEN
         list_min(list_filter(uniq, x -> len(list_filter(bg, e -> e = x)) = list_max(counts)))
       END AS top_bigram,
       CASE WHEN len(bg) > 0 THEN CAST(list_max(counts) AS INTEGER) END AS top_bigram_n,
       CASE WHEN len(bg) > 0 THEN CAST(list_max(counts) AS DOUBLE) / CAST(len(bg) AS DOUBLE) END AS rep_ratio
FROM m
"""

# --- PII scan / redaction -----------------------------------------------------

# RE2- and java.util.regex-compatible (no lookaround, no backrefs)
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+"
URL_RE = r"https?://[a-z0-9./_-]+"


def _contactized(doc_id_col, text_col):
    """Deterministic PII-bearing text derived from (doc_id, text) —
    the synthetic corpus carries no contact strings, so both engines
    append the same ones: an email for doc_id % 3 == 0 (two for % 9
    == 0) and a URL for doc_id % 4 == 0."""
    key = doc_id_col.cast("string")
    email = F.concat(F.lit(" reach user"), key, F.lit("@example.com"))
    email2 = F.concat(F.lit(" cc admin"), key, F.lit("@corp.example.org"))
    url = F.concat(F.lit(" see https://ex.com/d/"), key)
    return F.concat(
        text_col,
        F.when(doc_id_col % 3 == 0, email).otherwise(F.lit("")),
        F.when(doc_id_col % 9 == 0, email2).otherwise(F.lit("")),
        F.when(doc_id_col % 4 == 0, url).otherwise(F.lit("")),
    )


def pii_scan(documents: DataFrame, text_col=None) -> DataFrame:
    """PII scan + redaction over the text column: count and extract
    email/URL matches, and fingerprint the redacted text (emails ->
    <EMAIL>, then URLs -> <URL>). Pure JVM regex — one map stage, no
    shuffle; the redaction fingerprint lets a downstream exact-dedup
    run on PII-free content.

    The default input column is a deterministic contact-augmented
    text (see _contactized) because the synthetic corpus contains no
    organic PII; pass text_col=F.col("text") to scan raw text.

    Output: (doc_id, n_emails, first_email, n_urls, first_url,
    redacted_hash).
    """
    s = _contactized(F.col("doc_id"), F.col("text")) if text_col is None else text_col
    # group 0 = the whole match (Spark defaults to group 1, DuckDB to 0)
    emails = F.regexp_extract_all(s, F.lit(EMAIL_RE), 0)
    urls = F.regexp_extract_all(s, F.lit(URL_RE), 0)
    redacted = F.regexp_replace(
        F.regexp_replace(s, EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
    )
    return documents.select(
        "doc_id",
        F.size(emails).alias("n_emails"),
        F.get(emails, 0).alias("first_email"),
        F.size(urls).alias("n_urls"),
        F.get(urls, 0).alias("first_url"),
        F.md5(redacted).alias("redacted_hash"),
    )


SQL_PII_SCAN = f"""
WITH s AS (
  SELECT doc_id,
         text
           || CASE WHEN doc_id % 3 = 0
                   THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com'
                   ELSE '' END
           || CASE WHEN doc_id % 9 = 0
                   THEN ' cc admin' || CAST(doc_id AS VARCHAR) || '@corp.example.org'
                   ELSE '' END
           || CASE WHEN doc_id % 4 = 0
                   THEN ' see https://ex.com/d/' || CAST(doc_id AS VARCHAR)
                   ELSE '' END AS txt
  FROM documents
), m AS (
  SELECT doc_id,
         regexp_extract_all(txt, '{EMAIL_RE}') AS emails,
         regexp_extract_all(txt, '{URL_RE}') AS urls,
         regexp_replace(regexp_replace(txt, '{EMAIL_RE}', '<EMAIL>', 'g'),
                        '{URL_RE}', '<URL>', 'g') AS redacted
  FROM s
)
SELECT doc_id,
       CAST(len(emails) AS INTEGER) AS n_emails, emails[1] AS first_email,
       CAST(len(urls) AS INTEGER) AS n_urls, urls[1] AS first_url,
       md5(redacted) AS redacted_hash
FROM m
"""

# --- cube counts ---------------------------------------------------------------


def cube_counts(documents: DataFrame) -> DataFrame:
    """Corpus composition cube over (lang, source): doc counts and
    exact token totals at every grouping-set level — per (lang,
    source), per lang, per source, and grand total in ONE pass
    (Spark expands the cube map-side; one shuffle).

    NULL grouping cells are labeled '<all>' so the output is
    unambiguous (and engine-portable: DuckDB CUBE produces the same
    sets). Output: (lang, source, n_docs, total_tokens).
    """
    n_tok = F.size(tokens_col(F.col("text")))
    return (
        documents.select("lang", "source", n_tok.alias("n_tok"))
        .cube("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("total_tokens"))
        .select(
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            F.coalesce("source", F.lit("<all>")).alias("source"),
            "n_docs",
            "total_tokens",
        )
    )


SQL_CUBE_COUNTS = f"""
WITH t AS (
  SELECT lang, source, len({SQL_TOKENS}) AS n_tok FROM documents
)
SELECT COALESCE(lang, '<all>') AS lang,
       COALESCE(source, '<all>') AS source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM t GROUP BY CUBE (lang, source)
"""

# --- KMV distinct sketch --------------------------------------------------------

KMV_K = 8
KMV_SPACE = 1 << 28  # hash28 range


def kmv_distinct(documents: DataFrame, k: int = KMV_K) -> DataFrame:
    """K-minimum-values distinct-count sketch per language: the k-th
    smallest distinct token hash estimates the vocabulary size as
    (k-1) * |hash space| / kth_min (the classic KMV estimator).

    Unlike HyperLogLog registers, the KMV synopsis is a deterministic
    pure function of the input set — engine-portable bit-for-bit, and
    mergeable across partitions/tables by keeping the k smallest of a
    union (how a 100-TB scan would combine per-partition sketches).
    This plan: distinct (lang, token hash) → per-lang k-th order
    statistic via one row_number window; the exact distinct count
    rides along as the accuracy yardstick.

    Output: (lang, kth_min_hash, est_distinct, exact_distinct).
    """
    hashed = (
        documents.select("lang", F.explode(tokens_col(F.col("text"))).alias("token"))
        .distinct()
        .select("lang", hash28(F.col("token")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("lang").orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    counts = hashed.groupBy("lang").agg(F.count("*").alias("exact_distinct"))
    return (
        ranked.filter(F.col("rn") == k)
        .select(
            "lang",
            F.col("h").alias("kth_min_hash"),
            ((k - 1) * F.lit(float(KMV_SPACE)) / F.col("h").cast("double")).alias(
                "est_distinct"
            ),
        )
        .join(counts, "lang")
    )


SQL_KMV_DISTINCT = f"""
WITH tok AS (
  SELECT DISTINCT lang, unnest({SQL_TOKENS}) AS token FROM documents
), h AS (
  SELECT DISTINCT lang, {SQL_HASH28.format(x="token")} AS h FROM tok
), ranked AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM h
), counts AS (
  SELECT lang, COUNT(*) AS exact_distinct FROM h GROUP BY lang
)
SELECT r.lang AS lang, r.h AS kth_min_hash,
       ({KMV_K - 1} * {float(KMV_SPACE)}) / CAST(r.h AS DOUBLE) AS est_distinct,
       c.exact_distinct AS exact_distinct
FROM ranked r JOIN counts c ON r.lang = c.lang
WHERE r.rn = {KMV_K}
"""

# --- sequence packing ----------------------------------------------------------

PACK_BUDGET = 64  # tokens per packed sequence


def pack_sequences(documents: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences:
    within each source partition, documents are laid out in doc_id
    order and a document starts sequence floor(preceding_tokens /
    budget) — contiguous cumulative-sum binning, the deterministic
    (and SQL-expressible) cousin of greedy first-fit packing.

    One shuffle: the running sum is a window per source. At scale the
    source key is the packing parallelism unit — a corpus dominated
    by one source should pre-split it (salt the source key) since
    packing is order-defined and therefore sequential per group.

    Output: (doc_id, source, n_tokens, seq_id).
    """
    n_tok = F.size(tokens_col(F.col("text")))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        documents.select("doc_id", "source", n_tok.alias("n_tokens"))
        .withColumn(
            "seq_id",
            F.floor((cum - F.col("n_tokens")).cast("double") / budget).cast("long"),
        )
    )


SQL_PACK_SEQUENCES = f"""
WITH t AS (
  SELECT doc_id, source, CAST(len({SQL_TOKENS}) AS INTEGER) AS n_tokens
  FROM documents
), c AS (
  SELECT *, SUM(n_tokens) OVER (
    PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(floor(CAST(cum - n_tokens AS DOUBLE) / {PACK_BUDGET}) AS BIGINT) AS seq_id
FROM c
"""


# --- temperature mixture resampling ------------------------------------------

MIX_ALPHA = 0.5
MIX_TARGET = 200


def source_mix_sample(documents: DataFrame, alpha: float = MIX_ALPHA,
                      target: int = MIX_TARGET) -> DataFrame:
    """Temperature-based data-mixture resampling: per-source quotas
    proportional to n_source^alpha (alpha < 1 upweights small sources,
    the standard multilingual/multi-source training-mix move), filled
    deterministically by md5 rank so the same corpus always yields the
    same sample.

    quota_s = floor(target * n_s^alpha / Z), Z = sum over sources (in
    source order) of n_s^alpha. The per-source histogram is
    dimension-sized (one row per source), so collecting it to the
    driver is the same contract as broadcasting a dim table; the quota
    map re-enters the plan as a literal CASE. Selection = row_number
    over (md5(doc_id), doc_id) per source — rehash-stable and
    engine-portable. One scan + one shuffle on source (the ranking
    window); the histogram pass is map-side-combined.

    Z folds left-to-right over source-sorted weights — the DuckDB
    mirror folds the identically-ordered list, so quotas are bit-exact
    across engines. alpha=0.5 uses correctly-rounded sqrt on both
    sides; other alphas use pow (documented: pow parity is
    platform-typical but not IEEE-guaranteed).
    """
    import math

    rows = sorted(
        documents.groupBy("source").count().collect(), key=lambda r: r["source"]
    )
    weights = [
        (r["source"], math.sqrt(float(r["count"])) if alpha == 0.5
         else float(r["count"]) ** alpha)
        for r in rows
    ]
    z = 0.0
    for _, wgt in weights:
        z += wgt
    quota = None
    for src, wgt in weights:
        q = int(math.floor(target * wgt / z))
        quota = (
            F.when(F.col("source") == src, F.lit(q))
            if quota is None
            else quota.when(F.col("source") == src, F.lit(q))
        )
    quota = quota.otherwise(F.lit(0))
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        documents.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= quota)
        .select("doc_id", "source", "rk")
    )


SQL_SOURCE_MIX_SAMPLE = """
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
z AS (SELECT list_sum(list(sqrt(CAST(n AS DOUBLE)) ORDER BY source)) AS z FROM c),
q AS (
  SELECT source,
         CAST(FLOOR({target} * sqrt(CAST(n AS DOUBLE)) / z.z) AS BIGINT) AS quota
  FROM c, z
),
r AS (
  SELECT doc_id, source,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS INTEGER) AS rk
  FROM documents
)
SELECT r.doc_id, r.source, r.rk
FROM r JOIN q ON r.source = q.source
WHERE r.rk <= q.quota
"""

# --- BPE merge induction (step-1 pair counts) ---------------------------------

BPE_MERGE_TOPK = 20


def bpe_top_merges(documents: DataFrame, topk: int = BPE_MERGE_TOPK) -> DataFrame:
    """The first step of BPE vocabulary induction: count every adjacent
    character pair across all token occurrences and rank the top-k
    merge candidates (highest count first, ties on the pair).

    Plan: tokens explode to char pairs map-side (JVM transform over a
    position sequence), then ONE map-side-combined shuffle on the pair
    key (the key space is alphabet², tiny) and a TakeOrdered top-k.
    The rank window runs over the already-aggregated pair table — at
    most |alphabet|² rows — never the corpus.

    Returns (pair, n, rank), rank <= topk.
    """
    tok = documents.select(F.explode(tokens_col(F.col("text"))).alias("tok"))
    # sequence(1, 0) yields [1, 0] in Spark: empty ranges go through
    # filter(sequence(1, greatest(n, 1)), <= n) like retrieval.py
    pairs = tok.select(
        F.explode(
            F.expr(
                "transform(filter(sequence(1, greatest(length(tok) - 1, 1)),"
                " i -> i <= length(tok) - 1), i -> substring(tok, i, 2))"
            )
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    top = counts.orderBy(F.desc("n"), F.asc("pair")).limit(topk)
    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


SQL_BPE_TOP_MERGES = f"""
WITH tok AS (SELECT unnest({SQL_TOKENS}) AS tok FROM documents),
pairs AS (
  SELECT unnest(list_transform(generate_series(1, length(tok) - 1),
                               i -> substr(tok, i, 2))) AS pair
  FROM tok WHERE length(tok) >= 2
),
c AS (SELECT pair, count(*) AS n FROM pairs GROUP BY pair)
SELECT pair, n, CAST(row_number() OVER (ORDER BY n DESC, pair ASC) AS INT) AS rank
FROM (SELECT * FROM c ORDER BY n DESC, pair ASC LIMIT {BPE_MERGE_TOPK})
"""
