"""Corpus-curation operators round two: deterministic dataset
splitting, token-window chunking, corpus-LM document scoring, and
snapshot-incremental dedup with a pure-JVM Bloom prefilter.

These extend the training-data family (trainprep.py / textops.py)
with the remaining steps a production pretraining pipeline runs
between curation and tokenization:

- `split_assign` fixes the train/val/test membership of every
  document from its id hash alone — a pure map stage (zero shuffle),
  rehash-stable (new documents never flip old assignments), and
  reproducible across engines;
- `chunk_documents` slides a fixed token window with overlap across
  each document — explode over a computed chunk-start sequence, all
  JVM array expressions, no Python and no shuffle;
- `lm_score` scores each document by its mean corpus unigram
  log-probability (the classic cheap LM-quality filter): one
  map-side-combined shuffle builds the vocabulary, the
  vocabulary-sized count table joins back onto the token stream, and
  one shuffle on doc_id aggregates;
- `snapshot_delta` finds documents whose content fingerprint is NOT
  already in a prior snapshot. The scale pattern matters here: a
  Bloom bitmap over the snapshot fingerprints is built with plain
  column expressions + one bounded `bit_or` aggregation (m/64 longs,
  independent of data size), broadcast back, and splits the new batch
  into `definitely new` (bloom miss -> passes with NO shuffle, the
  overwhelming majority in steady state) and `maybe duplicate`
  (bloom hit -> exact left-anti join on the fingerprint). Bloom has
  no false negatives, the anti-join removes the false positives, so
  the union is exactly the anti-join result while only the hit
  fraction of the batch ever shuffles.

Cross-engine determinism follows the package rules (textops.py):
md5-derived 28-bit hashes, int/int double division; `lm_score`
rounds its final mean to 6 decimals in both engines because ln() may
differ in the last ulp between libm and the JVM intrinsic.

Reference parity note: geo-import has no text pipeline — these
operators extend the engine for the training-data use case the
brief's north rule targets, alongside the geospatial core mapped in
SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geo_import_spark.operators.textops import (
    SQL_HASH28,
    SQL_TOKENS,
    hash28,
    tokens_col,
)

# --- deterministic train/val/test split --------------------------------------

# per-mille bucket fences: [0, TEST) test, [TEST, VAL) val, rest train
SPLIT_TEST_PM = 10
SPLIT_VAL_PM = 30


def split_assign(documents: DataFrame,
                 test_pm: int = SPLIT_TEST_PM,
                 val_pm: int = SPLIT_VAL_PM) -> DataFrame:
    """Assign every document to train/val/test from md5(doc_id) alone.

    bucket = hash28(doc_id) % 1000; bucket < test_pm -> 'test',
    < val_pm -> 'val', else 'train'. Pure map stage: the split of a
    100 TB corpus costs one scan — no shuffle, no RNG state, and the
    assignment of existing documents never changes as the corpus
    grows (rehash-stable), which is what keeps eval sets honest
    across corpus versions.

    documents(doc_id, ...) -> (doc_id, bucket, split).
    """
    bucket = hash28(F.col("doc_id").cast("string")) % 1000
    return documents.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < test_pm, F.lit("test"))
        .when(bucket < val_pm, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


SQL_SPLIT_ASSIGN = f"""
WITH b AS (
  SELECT doc_id,
         {SQL_HASH28.format(x="CAST(doc_id AS VARCHAR)")} % 1000 AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < {SPLIT_TEST_PM} THEN 'test'
            WHEN bucket < {SPLIT_VAL_PM} THEN 'val'
            ELSE 'train' END AS split
FROM b
"""

# --- token-window chunking ----------------------------------------------------

CHUNK_SIZE = 32  # tokens per training chunk
CHUNK_OVERLAP = 8  # tokens shared between consecutive chunks


def chunk_documents(documents: DataFrame,
                    chunk_size: int = CHUNK_SIZE,
                    overlap: int = CHUNK_OVERLAP) -> DataFrame:
    """Slide a fixed token window with overlap across each document.

    stride = chunk_size - overlap; chunk i covers tokens
    [i*stride, i*stride + chunk_size); the chunk count is
    ceil(max(n_tokens - overlap, 1) / stride) so every token lands in
    at least one chunk and a short (or empty) document still emits
    exactly one chunk. All JVM array expressions (split / sequence /
    explode / slice / array_join): no Python, no shuffle — chunking
    100 TB is a pure map stage whose output partitioning inherits the
    input's.

    documents(doc_id, text, ...) ->
    (doc_id, chunk_id, n_chunk_tokens, chunk_text).
    """
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_size")
    toks = tokens_col(F.col("text"))
    staged = documents.select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).alias("n"),
    )
    n_chunks = F.ceil(
        F.greatest(F.col("n") - F.lit(overlap), F.lit(1))
        / F.lit(float(stride))
    ).cast("int")
    exploded = staged.select(
        "doc_id",
        "toks",
        "n",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    return exploded.select(
        "doc_id",
        "chunk_id",
        F.least(F.lit(chunk_size), F.col("n") - start).alias("n_chunk_tokens"),
        F.array_join(F.slice("toks", start + 1, F.lit(chunk_size)), " ").alias(
            "chunk_text"
        ),
    )


SQL_CHUNK_DOCUMENTS = f"""
WITH t AS (
  SELECT doc_id, {SQL_TOKENS} AS toks, len({SQL_TOKENS}) AS n
  FROM documents
),
c AS (
  SELECT doc_id, toks, n,
         CAST(ceil(greatest(n - {CHUNK_OVERLAP}, 1)
                   / {float(CHUNK_SIZE - CHUNK_OVERLAP)}) AS BIGINT) AS n_chunks
  FROM t
),
e AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(0, n_chunks - 1)) AS chunk_id
  FROM c
)
SELECT doc_id, chunk_id,
       least({CHUNK_SIZE}, n - chunk_id * {CHUNK_SIZE - CHUNK_OVERLAP})
         AS n_chunk_tokens,
       array_to_string(
         toks[chunk_id * {CHUNK_SIZE - CHUNK_OVERLAP} + 1
              : chunk_id * {CHUNK_SIZE - CHUNK_OVERLAP} + {CHUNK_SIZE}],
         ' ') AS chunk_text
FROM e
"""

# --- corpus unigram-LM document scoring ---------------------------------------


def lm_score(documents: DataFrame) -> DataFrame:
    """Mean corpus unigram log-probability per document — the classic
    cheap LM-quality filter (documents of improbable tokens score
    low).

    Plan shape at scale: the token stream aggregates once on `token`
    (map-side partial agg -> vocabulary-sized table), the vocabulary
    joins back onto the token stream (vocabulary << corpus: broadcast
    here; beyond the broadcast threshold Catalyst/AQE would fall back
    to a shuffled hash join and the plan stays one extra shuffle, not
    quadratic), and one shuffle on doc_id takes the mean. Documents
    with no tokens produce no row (they have no LM probability),
    matching the SQL oracle's join semantics.

    documents(doc_id, text, ...) -> (doc_id, n_tokens, lm_logprob)
    where lm_logprob = round(avg(ln(count(token)/total_tokens)), 6).
    """
    tok = documents.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("token")
    )
    vocab = tok.groupBy("token").agg(F.count("*").alias("n"))
    total = vocab.agg(F.sum("n").alias("total"))
    return (
        tok.join(F.broadcast(vocab), "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(F.ln(F.col("n").cast("double") / F.col("total").cast("double"))),
                6,
            ).alias("lm_logprob"),
        )
    )


SQL_LM_SCORE = f"""
WITH tok AS (
  SELECT doc_id, unnest({SQL_TOKENS}) AS token FROM documents
),
vocab AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
tot AS (SELECT sum(n) AS total FROM vocab)
SELECT tok.doc_id,
       count(*) AS n_tokens,
       round(avg(ln(CAST(vocab.n AS DOUBLE) / CAST(tot.total AS DOUBLE))), 6)
         AS lm_logprob
FROM tok JOIN vocab USING (token) CROSS JOIN tot
GROUP BY tok.doc_id
"""

# --- snapshot-incremental dedup with a Bloom prefilter -------------------------

BLOOM_BITS = 1 << 16  # m: bitmap size (power of two; 1024 longs)
BLOOM_PROBES = 4  # k: hash probes per key


def _bloom_positions(fp_col, m_bits: int, k: int) -> list:
    """k bit positions for a fingerprint via double hashing:
    bit_i = (h1 + i*h2) mod m, h1/h2 from disjoint md5 hex spans
    (h2 forced odd so the probe sequence cycles the full bitmap)."""
    h1 = F.conv(F.substring(F.md5(fp_col), 1, 7), 16, 10).cast("long")
    h2 = (
        F.conv(F.substring(F.md5(fp_col), 8, 7), 16, 10).cast("long")
        .bitwiseOR(F.lit(1))
    )
    return [(h1 + F.lit(i) * h2) % m_bits for i in range(k)]


def snapshot_bloom(snapshot_fps: DataFrame,
                   m_bits: int = BLOOM_BITS,
                   k: int = BLOOM_PROBES) -> list[int]:
    """Build the Bloom bitmap over snapshot fingerprints as a dense
    list of m/64 longs. Pure column expressions + ONE `bit_or`
    aggregation grouped on the word index — the shuffle is bounded by
    m/64 rows regardless of snapshot size, and the driver collects
    exactly m/64 longs (8 KiB at the default m), never data.

    snapshot_fps must have a `fp` column.
    """
    n_words = m_bits // 64
    bits = F.array(*_bloom_positions(F.col("fp"), m_bits, k))
    words = (
        snapshot_fps.select(F.explode(bits).alias("bit"))
        .select(
            (F.col("bit") / 64).cast("int").alias("word_idx"),
            # shiftleft's amount must be a literal in the Python API;
            # a SQL expr over the named column keeps it JVM-side
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    dense = [0] * n_words
    for r in words:
        dense[r["word_idx"]] = r["word"]
    return dense


def snapshot_delta(new_docs: DataFrame,
                   snapshot_docs: DataFrame,
                   m_bits: int = BLOOM_BITS,
                   k: int = BLOOM_PROBES) -> DataFrame:
    """Documents in `new_docs` whose whitespace-normalized content
    fingerprint is NOT already in `snapshot_docs` — the incremental
    step of a continuously-ingesting dedup pipeline.

    Exactly equivalent to a left-anti join on the fingerprint, but
    only the Bloom-hit fraction of the new batch ever reaches the
    shuffle: bloom misses (definitely new — the steady-state
    majority) pass through as a pure map stage; bloom hits go through
    the exact anti-join, which also removes the false positives. The
    bitmap itself is m/64 longs broadcast via a one-row crossJoin, so
    the probe runs as JVM `element_at`/bit-test expressions inside
    codegen — no Python anywhere.

    Returns (doc_id, fingerprint) of truly-new documents.
    """
    spark = new_docs.sparkSession
    fp_of = lambda df: df.select(  # noqa: E731
        "doc_id", F.md5(F.concat_ws(" ", tokens_col(F.col("text")))).alias("fingerprint")
    )
    snap = (
        fp_of(snapshot_docs)
        .select(F.col("fingerprint").alias("fp"))
        .distinct()
    )
    dense = snapshot_bloom(snap, m_bits, k)
    bloom_row = spark.createDataFrame([(dense,)], "bloom: array<long>")

    pos = _bloom_positions(F.col("fingerprint"), m_bits, k)
    new_fp = fp_of(new_docs).crossJoin(F.broadcast(bloom_row)).select(
        "doc_id",
        "fingerprint",
        "bloom",
        *[p.alias(f"_bit{i}") for i in range(k) for p in (pos[i],)],
    )
    hit = None
    for i in range(k):
        # variable shift amounts need the SQL form (Python shiftright
        # takes only literal amounts)
        probe = F.expr(
            f"(shiftright(element_at(bloom, CAST(_bit{i} / 64 AS INT) + 1),"
            f" CAST(_bit{i} % 64 AS INT)) & 1) = 1"
        )
        hit = probe if hit is None else (hit & probe)

    tagged = new_fp.select("doc_id", "fingerprint", hit.alias("might_dup"))
    definite_new = tagged.filter(~F.col("might_dup")).drop("might_dup")
    survivors = (
        tagged.filter(F.col("might_dup"))
        .drop("might_dup")
        .join(
            snap,
            F.col("fingerprint") == F.col("fp"),
            "left_anti",
        )
    )
    return definite_new.unionByName(survivors)


# oracle: plain anti-join semantics (snapshot = doc_id % 5 == 0, the
# query wrapper in __spark_entry__ uses the same snapshot rule)
SQL_SNAPSHOT_DELTA = f"""
WITH fp AS (
  SELECT doc_id, md5(array_to_string({SQL_TOKENS}, ' ')) AS fingerprint
  FROM documents
),
snap AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 5 = 0)
SELECT f.doc_id, f.fingerprint
FROM fp f
WHERE NOT EXISTS (SELECT 1 FROM snap s WHERE s.fingerprint = f.fingerprint)
"""


# --- composed curation verdict (C4/Gopher-style keep-or-drop) --------------------

REP_MAX = 0.5  # top-bigram fraction above which a doc is "repetitive"
MIN_TOKENS = 5
MAX_MEAN_TOKEN_LEN = 12.0


def curation_verdict(documents: DataFrame) -> DataFrame:
    """End-to-end keep/drop decision per document, composing the
    standard curation rules in a fixed priority order:

        dup         exact duplicate whose doc_id is not the group min
        too_short   fewer than MIN_TOKENS whitespace tokens
        gibberish   mean token length > MAX_MEAN_TOKEN_LEN
        repetitive  top-bigram fraction > REP_MAX (Gopher rule)
        keep        everything else

    The thresholds and signal math are the quality_score /
    repetition_stats expressions (textops.py / trainprep.py) fused
    into ONE pass: every signal is a JVM column expression over the
    same scan, and the only shuffle is the duplicate-canonicality
    window on md5(text) (min doc_id per content-hash group). At 100 TB
    this is the right shape — a pipeline that joined the individual
    operator outputs would shuffle the corpus on doc_id once per
    signal instead.

    Returns (doc_id, verdict, keep) with keep as int 0/1.
    """
    toks = tokens_col(F.col("text"))
    n_tokens = F.size(toks)
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    mean_tok = tok_chars.cast("double") / n_tokens.cast("double")
    # max bigram multiplicity: one fold over the sorted bigram array
    # (the repetition_stats pattern — see trainprep.py for why nested
    # higher-order counting is a measured ~10^3x blowup)
    bg = F.when(
        n_tokens >= 2,
        F.transform(
            F.sequence(F.lit(1), n_tokens - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i.cast("int")),
                F.element_at(toks, (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    best = F.aggregate(
        F.array_sort(bg),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, b: F.struct(
            b.alias("prev"),
            F.when(b == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(b == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )["best"]
    rep_ratio = F.when(
        F.size(bg) > 0, best.cast("double") / F.size(bg).cast("double")
    ).otherwise(F.lit(0.0))

    staged = documents.select(
        "doc_id",
        F.md5("text").alias("fp"),
        n_tokens.alias("n_tokens"),
        mean_tok.alias("mean_tok"),
        rep_ratio.alias("rep_ratio"),
    )
    canon = F.min("doc_id").over(Window.partitionBy("fp"))
    verdict = (
        F.when(F.col("doc_id") != canon, F.lit("dup"))
        .when(F.col("n_tokens") < MIN_TOKENS, F.lit("too_short"))
        .when(F.col("mean_tok") > MAX_MEAN_TOKEN_LEN, F.lit("gibberish"))
        .when(F.col("rep_ratio") > REP_MAX, F.lit("repetitive"))
        .otherwise(F.lit("keep"))
    )
    return staged.select(
        "doc_id",
        verdict.alias("verdict"),
        (verdict == "keep").cast("int").alias("keep"),
    )


def sql_curation_verdict(docs_cte: str) -> str:
    """DuckDB mirror over any (doc_id, text) CTE body."""
    toks = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"
    return f"""
WITH docs AS ({docs_cte}),
t AS (SELECT doc_id, text, {toks} AS toks FROM docs),
sig AS (
  SELECT doc_id, md5(text) AS fp, len(toks) AS n_tokens,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
           / CAST(len(toks) AS DOUBLE) AS mean_tok,
         CASE WHEN len(toks) >= 2 THEN
           CAST(list_max(list_transform(
                  list_distinct(list_transform(range(1, len(toks)),
                                               i -> toks[i] || ' ' || toks[i+1])),
                  x -> len(list_filter(
                         list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i+1]),
                         e -> e = x)))) AS DOUBLE)
             / CAST(len(toks) - 1 AS DOUBLE)
         ELSE 0.0 END AS rep_ratio
  FROM t
),
v AS (
  SELECT doc_id,
         CASE
           WHEN doc_id <> min(doc_id) OVER (PARTITION BY fp) THEN 'dup'
           WHEN n_tokens < {MIN_TOKENS} THEN 'too_short'
           WHEN mean_tok > {MAX_MEAN_TOKEN_LEN} THEN 'gibberish'
           WHEN rep_ratio > {REP_MAX} THEN 'repetitive'
           ELSE 'keep'
         END AS verdict
  FROM sig
)
SELECT doc_id, verdict, CAST(verdict = 'keep' AS INT) AS keep FROM v
"""
