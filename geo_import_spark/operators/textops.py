"""Text-analysis operators for the large-scale training-data pipeline:
tokenization, quality stats, language guess, token frequencies, and
document fingerprinting.

All computed with JVM-side column expressions (whole-stage codegen —
no Python in the hot path). Tokenization is the shared primitive the
dedup/simhash operators build on; every op is mirrored in ANSI SQL for
the DuckDB oracle (__spark_entry__.py).

Cross-engine determinism rules used throughout this package:
- hashes: md5 hex (identical in Spark / DuckDB / hashlib); numeric
  hash = first 7 hex digits as int (28 bits — products with 30-bit
  constants stay in int64)
- ratios: int/int double division only (IEEE-exact both engines)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny stopword vote tables (the corpus vocabulary is synthetic; these
# exercise the ratio machinery, not linguistics).
STOPWORDS_EN = ("a", "the", "of", "and", "is")

HASH_MOD = 1 << 28  # 28-bit token/shingle hash space


def tokens_col(text_col):
    """lower → split on whitespace → drop empties. JVM-side."""
    return F.filter(F.split(F.lower(text_col), r"\s+"), lambda t: t != "")


def hash28(col):
    """28-bit integer hash of a string: first 7 hex digits of md5.
    Mirror: CAST('0x' || substr(md5(x), 1, 7) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-doc token counts, stopword ratio, crude language guess.

    documents(doc_id, text, ...) -> (doc_id, n_tokens, n_uniq,
    stop_ratio, lang_guess).
    """
    toks = tokens_col(F.col("text"))
    stop = F.filter(toks, lambda t: t.isin(*STOPWORDS_EN))
    n_tokens = F.size(toks)
    stop_ratio = F.size(stop).cast("double") / n_tokens.cast("double")
    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        stop_ratio.alias("stop_ratio"),
        F.when(stop_ratio > 0.08, F.lit("en")).otherwise(F.lit("other")).alias("lang_guess"),
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """Corpus-wide token frequency: (token, n). Map-side partial agg +
    one shuffle on token — the canonical word-count plan."""
    return (
        documents.select(F.explode(tokens_col(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact duplicate groups by md5(text): one row per distinct text
    with the surviving representative (min doc_id) and group size."""
    return (
        documents.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count("*").alias("n_dups"))
    )


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Whitespace-normalized content fingerprint: md5 of the tokens
    re-joined with single spaces — invariant to runs of whitespace."""
    return documents.select(
        "doc_id",
        F.md5(F.concat_ws(" ", tokens_col(F.col("text")))).alias("fingerprint"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Per-doc quality signals for training-data filtering: char
    length, punctuation ratio, mean token length, and a coarse
    keep/flag class — the standard length/punct/stopword heuristics
    (reference model: C4/Gopher-style quality rules, re-expressed as
    JVM column arithmetic).

    All ratios are int/int double divisions (IEEE-exact in both
    engines); the class thresholds compare those exact doubles, so
    the classification is engine-portable.

    documents(doc_id, text, ...) -> (doc_id, n_chars, punct_ratio,
    mean_token_len, quality_class).
    """
    toks = tokens_col(F.col("text"))
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace("text", r"[.,!?;:]", ""))
    n_tokens = F.size(toks)
    tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    punct_ratio = n_punct.cast("double") / n_chars.cast("double")
    mean_tok = tok_chars.cast("double") / n_tokens.cast("double")
    cls = (
        F.when(n_tokens < 5, F.lit("too_short"))
        .when(mean_tok > 12.0, F.lit("gibberish"))
        .otherwise(F.lit("keep"))
    )
    return documents.select(
        "doc_id",
        n_chars.cast("int").alias("n_chars"),
        punct_ratio.alias("punct_ratio"),
        mean_tok.alias("mean_token_len"),
        cls.alias("quality_class"),
    )


ROLL_BASE = 31
ROLL_MOD = 1 << 28  # acc*31 + 0x10FFFF < 2^34: exact in int64


def rolling_fingerprint(documents: DataFrame) -> DataFrame:
    """Polynomial rolling-hash document fingerprint over the character
    stream: h = fold(h * 31 + codepoint) mod 2^28, h0 = 0. Content-
    order-sensitive (unlike the md5-of-sorted-tokens fingerprint) and
    computable incrementally over appended spans at scale. Pure JVM
    fold over the char array — one narrow scan, no shuffle.

    documents(doc_id, text, ...) -> (doc_id, rolling_hash: long).
    """
    chars = F.filter(F.split(F.col("text"), ""), lambda c: c != "")
    roll = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLL_BASE + F.ascii(c)) % ROLL_MOD,
    )
    return documents.select("doc_id", roll.alias("rolling_hash"))


def simhash(documents: DataFrame, bits: int = 28) -> DataFrame:
    """SimHash near-dup signature over the distinct-token set.

    Per bit i: count tokens whose hash has bit i set; majority → bit
    set in the signature. Bit extraction uses floor(h / 2^i) % 2 —
    exact integer arithmetic in the double domain (h < 2^28), identical
    in the SQL mirror. Output: (doc_id, simhash: long).
    """
    hs = F.transform(F.array_distinct(tokens_col(F.col("text"))), hash28)
    n = F.size(hs)

    def bit_term(acc, i):
        setcnt = F.size(
            F.filter(
                hs,
                lambda h: (
                    F.floor(h.cast("double") / F.pow(F.lit(2.0), i.cast("double"))).cast("long")
                    % 2
                )
                == 1,
            )
        )
        return acc + F.when(
            2 * setcnt > n, F.pow(F.lit(2.0), i.cast("double")).cast("long")
        ).otherwise(F.lit(0).cast("long"))

    sig = F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)), F.lit(0).cast("long"), bit_term
    )
    return documents.select("doc_id", sig.alias("simhash"))


# --- language identification -------------------------------------------------

# Character n-gram profiles: high-frequency trigrams per language
# (standard Cavnar-Trenkle-style profile method, shrunk to the
# most-discriminative markers so the scoring stays a fixed-size JVM
# expression). Scores are exact integer substring-occurrence counts,
# so the classification is engine-portable bit-for-bit.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", " an", "and", "ing", " of", "ion", " is"),
    "de": ("der", "die", "und", "ein", "sch", "ich", "cht", " zu"),
    "fr": (" le", "les", "ent", "que", " et", "ais", "eur", " un"),
    "es": (" de", " la", "ión", " el", " qu", "ado", "nte", " en"),
}
LANGS = tuple(LANG_PROFILES)  # scoring/tie-break order


def _occurrences(text_col, needle: str):
    """Exact count of (possibly overlapping-start) occurrences of a
    fixed trigram: (len(s) - len(replace(s, t, ''))) / len(t).
    Integer-exact and identical in the SQL mirror."""
    return (
        F.length(text_col) - F.length(F.replace(text_col, F.lit(needle)))
    ) / len(needle)


def lang_id(documents: DataFrame) -> DataFrame:
    """N-gram language identification over the text column.

    Per language L: score_L = total occurrences of L's profile
    trigrams in lower(' ' || text || ' ') (padded so word-boundary
    trigrams fire at the edges). lang = argmax, ties broken by LANGS
    order, all-zero -> 'und'. One narrow JVM scan, no shuffle, no
    Python — at 100 TB this is a pure map stage.

    documents(doc_id, text, ...) -> (doc_id, score_en, score_de,
    score_fr, score_es, lang).
    """
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    scores = {
        lang: sum(
            (_occurrences(padded, t) for t in profile), F.lit(0).cast("double")
        ).cast("long")
        for lang, profile in LANG_PROFILES.items()
    }
    best = F.greatest(*[scores[lang] for lang in LANGS])
    pick = F.when(best <= 0, F.lit("und"))
    for lang in LANGS:  # first language hitting the max wins
        pick = pick.when(scores[lang] == best, F.lit(lang))
    return documents.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in LANGS],
        pick.alias("lang"),
    )


# --- SQL mirrors ------------------------------------------------------------

SQL_TOKENS = (
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"
)


def _sql_lang_score(profile: tuple[str, ...]) -> str:
    terms = " + ".join(
        f"(length(s) - length(replace(s, '{t}', ''))) / {len(t)}" for t in profile
    )
    return f"CAST({terms} AS BIGINT)"


_SQL_LANG_PICK = "CASE WHEN best <= 0 THEN 'und' " + " ".join(
    f"WHEN score_{lang} = best THEN '{lang}'" for lang in LANGS
) + " END"

SQL_LANG_ID = f"""
WITH p AS (SELECT doc_id, ' ' || lower(text) || ' ' AS s FROM documents),
scored AS (
  SELECT doc_id,
         {", ".join(f"{_sql_lang_score(LANG_PROFILES[lang])} AS score_{lang}" for lang in LANGS)}
  FROM p
), m AS (
  SELECT *, greatest({", ".join(f"score_{lang}" for lang in LANGS)}) AS best FROM scored
)
SELECT doc_id, {", ".join(f"score_{lang}" for lang in LANGS)},
       {_SQL_LANG_PICK} AS lang
FROM m
"""
SQL_HASH28 = "CAST('0x' || substr(md5({x}), 1, 7) AS BIGINT)"

SQL_TEXT_STATS = f"""
WITH t AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INTEGER) AS n_uniq,
       CAST(len(list_filter(toks, t -> t IN {STOPWORDS_EN})) AS DOUBLE)
         / CAST(len(toks) AS DOUBLE) AS stop_ratio,
       CASE WHEN CAST(len(list_filter(toks, t -> t IN {STOPWORDS_EN})) AS DOUBLE)
                 / CAST(len(toks) AS DOUBLE) > 0.08
            THEN 'en' ELSE 'other' END AS lang_guess
FROM t
"""

SQL_TOKEN_COUNTS = f"""
SELECT token, COUNT(*) AS n
FROM (SELECT unnest({SQL_TOKENS}) AS token FROM documents)
GROUP BY token
"""

SQL_EXACT_DEDUP = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_dups
FROM documents GROUP BY md5(text)
"""

SQL_DOC_FINGERPRINT = f"""
SELECT doc_id, md5(array_to_string({SQL_TOKENS}, ' ')) AS fingerprint
FROM documents
"""

SQL_QUALITY_SCORE = f"""
WITH t AS (
  SELECT doc_id, text, {SQL_TOKENS} AS toks,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct
  FROM documents
), m AS (
  SELECT doc_id, n_chars, n_punct, len(toks) AS n_tokens,
         list_sum(list_transform(toks, x -> length(x))) AS tok_chars
  FROM t
)
SELECT doc_id,
       CAST(n_chars AS INTEGER) AS n_chars,
       CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS punct_ratio,
       CAST(tok_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_token_len,
       CASE WHEN n_tokens < 5 THEN 'too_short'
            WHEN CAST(tok_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 12.0 THEN 'gibberish'
            ELSE 'keep' END AS quality_class
FROM m
"""

SQL_ROLLING_FINGERPRINT = f"""
SELECT doc_id,
       CAST(list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(
             list_filter(regexp_split_to_array(text, ''), c -> c <> ''),
             c -> CAST(ord(c) AS BIGINT))),
         (acc, c) -> (acc * {ROLL_BASE} + c) % {ROLL_MOD}) AS BIGINT) AS rolling_hash
FROM documents
"""

SQL_SIMHASH = f"""
WITH t AS (
  SELECT doc_id,
         list_transform(list_distinct({SQL_TOKENS}),
                        x -> {SQL_HASH28.format(x='x')}) AS hs
  FROM documents
)
SELECT doc_id,
       CAST(list_sum(list_transform(range(0, 28), i ->
         CASE WHEN 2 * len(list_filter(hs, h -> (h >> i) & 1 = 1)) > len(hs)
              THEN CAST(1 AS BIGINT) << i ELSE 0 END)) AS BIGINT) AS simhash
FROM t
"""


# GPT-2-style pre-tokenizer approximation, restricted to the regex
# subset Java (Spark) and RE2 (DuckDB) match identically: letter runs,
# digit runs, punctuation runs — each optionally absorbing one leading
# space — plus residual space runs. No lookarounds (RE2 has none).
BPE_RE = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"


def bpe_token_stats(documents: DataFrame) -> DataFrame:
    """Per-doc token counts under a BPE-ish pre-tokenizer regex next to
    the whitespace count, plus the chars-per-token compression proxy a
    training-data pipeline budgets sequence lengths with.

    (doc_id, n_ws_tokens, n_bpe_tokens, chars_per_token). Pure map —
    one JVM regexp_extract_all per row, no shuffle; the regex is the
    engine-portable core of the GPT-2 pattern (the real tokenizer's
    lookahead `\\s+(?!\\S)` is unsupported by RE2, so the split on
    trailing-space runs differs from tiktoken by design — documented,
    deterministic, identical in the SQL mirror).
    """
    bpe = F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0)
    n_bpe = F.size(bpe)
    return documents.select(
        "doc_id",
        F.size(tokens_col(F.col("text"))).alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        (F.length("text").cast("double") / n_bpe.cast("double")).alias(
            "chars_per_token"
        ),
    )


SQL_BPE_TOKEN_STATS = f"""
SELECT doc_id,
       len({SQL_TOKENS}) AS n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_RE}')) AS n_bpe_tokens,
       CAST(length(text) AS DOUBLE) / CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS DOUBLE)
         AS chars_per_token
FROM documents
"""


# --- exact heavy hitters (Misra-Gries prefilter + exact verify) ------------------

HH_PHI = 0.02  # support threshold: emit terms with count > phi * total
HH_MG_K = 256  # per-partition summary size; k >= 1/phi - 1 => no false
#                negatives (global count > N/(k+1) always survives)


def mg_merge(counters, batch_terms, k: int):
    """Batched Misra-Gries step: fold a batch's value_counts into the
    running summary; when it exceeds k entries, subtract the (k+1)-th
    largest count from everything and drop the non-positives (each
    unit of decrement retires k+1 units of stream mass, so the classic
    undercount bound N/(k+1) holds). Shared by the batch prefilter
    below and the streaming stateful twin (streaming/heavy.py)."""
    counters = counters.add(batch_terms.value_counts(), fill_value=0)
    if len(counters) > k:
        m = counters.nlargest(k + 1).iloc[-1]
        counters = counters[counters > m] - m
    return counters


def _mg_candidates(token_df, k: int):
    """Per-partition batched Misra-Gries prefilter: O(k) state per
    partition regardless of stream length — this is the custom-
    operator case the DataFrame API can't express (SURVEY §2.7);
    everything around it stays JVM-side."""
    import pandas as pd

    def gen(batches):
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            counters = mg_merge(counters, pdf["term"], k)
        yield pd.DataFrame({"term": counters.index})

    return token_df.mapInPandas(gen, "term string")


def heavy_hitters(documents: DataFrame,
                  phi: float = HH_PHI,
                  k: int = HH_MG_K) -> DataFrame:
    """EXACT heavy hitters: all terms with count > phi * total tokens,
    with their exact counts — at scale, without shuffling the
    vocabulary.

    Two passes: (1) per-partition Misra-Gries summaries (bounded
    state, no shuffle) whose union provably contains every phi-heavy
    term; (2) the candidate set (<= k x partitions rows — sketch-
    sized, never data) BROADCASTS back onto the token stream for exact
    counts via one map-side-combined aggregate over candidate keys
    only. A naive groupBy would shuffle every distinct term; here the
    shuffle carries at most |candidates| keys per partition. The final
    counts are exact, so the output is deterministic no matter how
    batches hit the sketch.

    Returns (term, cnt, frac), frac = cnt / total as exact int/int
    double division.
    """
    toks = documents.select(
        F.explode(tokens_col(F.col("text"))).alias("term")
    )
    cand = _mg_candidates(toks, k).distinct()
    total = toks.agg(F.count("*").alias("n"))
    counts = (
        toks.join(F.broadcast(cand), "term")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt").cast("double") > F.lit(phi) * F.col("n").cast("double"))
        .select(
            "term",
            "cnt",
            (F.col("cnt").cast("double") / F.col("n").cast("double")).alias("frac"),
        )
    )


SQL_HEAVY_HITTERS = f"""
WITH toks AS (SELECT unnest({SQL_TOKENS}) AS term FROM documents),
tot AS (SELECT count(*) AS n FROM toks),
c AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term)
SELECT term, cnt, CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE) AS frac
FROM c CROSS JOIN tot
WHERE CAST(cnt AS DOUBLE) > {HH_PHI} * CAST(n AS DOUBLE)
"""


VOCAB_V = 16


def vocab_coverage(documents: DataFrame, v: int = VOCAB_V) -> DataFrame:
    """Tokenizer vocabulary coverage / OOV rate per corpus source: the
    vocabulary is the top-`v` tokens by corpus frequency (count DESC,
    token ASC — a total order, so the cut is deterministic), and each
    source reports how many of its token OCCURRENCES fall outside it.
    The default v=16 sits inside the synthetic corpus' 31-token
    whitespace vocabulary so the OOV tail is non-degenerate at every
    SF (v=100 would cover everything and pin oov_bp to 0).
    The training-data health check run before committing to a
    tokenizer: a source with a high OOV rate will fragment into
    byte-fallback tokens.

    Plan (one pass over documents): tokens aggregate ONCE into
    per-(source, token) counts — the only point-sized shuffle, with
    map-side combine; the vocabulary reduces that already-small frame
    by token and cuts with orderBy().limit(v), which Spark plans as
    TakeOrderedAndProject — a distributed per-partition top-v merged
    on the driver, NOT a single-partition global window; coverage is
    a broadcast-sized left join of the counts frame against the
    vocabulary followed by a map-side-combining groupBy onto
    |sources| rows. oov_bp is exact integer basis points — both
    operands non-negative, so Spark's DIV and DuckDB's // agree.

    Output: (source, total_tokens, oov_tokens, oov_bp).
    """
    counts = (
        documents.select(
            "source", F.explode(tokens_col(F.col("text"))).alias("token")
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = counts.groupBy("token").agg(F.sum("cnt").alias("tcnt"))
    vocab = (
        tot.orderBy(F.col("tcnt").desc(), F.col("token").asc())
        .limit(int(v))
        .select("token", F.lit(1).alias("in_vocab"))
    )
    j = counts.join(F.broadcast(vocab), "token", "left")
    return (
        j.groupBy("source")
        .agg(
            F.sum("cnt").alias("total_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), F.col("cnt")).otherwise(F.lit(0)))
            .alias("oov_tokens"),
        )
        .select(
            "source",
            "total_tokens",
            "oov_tokens",
            F.expr("CAST((oov_tokens * 10000) DIV total_tokens AS BIGINT)")
            .alias("oov_bp"),
        )
    )


def sql_vocab_coverage(v: int = VOCAB_V) -> str:
    return f"""
WITH toks AS (
  SELECT source, unnest({SQL_TOKENS}) AS token FROM documents
),
counts AS (
  SELECT source, token, count(*) AS cnt FROM toks GROUP BY source, token
),
tot AS (SELECT token, SUM(cnt) AS tcnt FROM counts GROUP BY token),
vocab AS (
  SELECT token FROM (
    SELECT token, row_number() OVER (ORDER BY tcnt DESC, token ASC) AS rk
    FROM tot
  ) WHERE rk <= {int(v)}
),
agg AS (
  SELECT c.source,
         SUM(c.cnt) AS total_tokens,
         SUM(CASE WHEN vb.token IS NULL THEN c.cnt ELSE 0 END) AS oov_tokens
  FROM counts c LEFT JOIN vocab vb ON vb.token = c.token
  GROUP BY c.source
)
SELECT source,
       CAST(total_tokens AS BIGINT) AS total_tokens,
       CAST(oov_tokens AS BIGINT) AS oov_tokens,
       CAST((oov_tokens * 10000) // total_tokens AS BIGINT) AS oov_bp
FROM agg
"""


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable map-side term-frequency summary
# ---------------------------------------------------------------------------

CMS_D = 4      # depth: independent hash rows
CMS_W = 1024   # width: counters per row
CMS_TOPK = 20  # validation candidates: exact top-k terms


def _cms_cells(term_col, d: int = CMS_D, w: int = CMS_W):
    """Array of (r, cell) structs — one md5-derived cell per sketch
    row, the trainprep hashing convention (row index salts the key)."""
    return F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("r"),
                (
                    hash28(F.concat(F.lit(f"{r}:"), term_col)) % F.lit(w)
                ).alias("cell"),
            )
            for r in range(d)
        ]
    )


def cms_term_estimates(documents: DataFrame,
                       d: int = CMS_D, w: int = CMS_W,
                       k: int = CMS_TOPK) -> DataFrame:
    """(term, exact_n, cms_est) for the exact top-k corpus terms:
    the Count-Min sketch point estimate next to ground truth
    (Cormode & Muthukrishnan 2005).

    The sketch is the canonical MERGEABLE map-side summary: each
    partition folds its tokens into d×w counters; the shuffle carries
    at most d×w rows no matter the corpus size (contrast the exact
    path's one-row-per-term shuffle). est(t) = min over rows of the
    counter t hashes into; CMS never undercounts (est >= exact,
    asserted in tests), and overcounts only by collision mass ~N/w
    per row.

    This validation query computes BOTH paths — exact counts (to
    pick candidates and expose the error) and the sketch — so it
    deliberately pays the exact shuffle; the production path at
    100 TB keeps only the sketch aggregate plus a candidate probe
    (the heavy_hitters pattern). Determinism: candidate top-k is
    totally ordered (count desc, term asc), cells are md5-derived,
    all counters exact BIGINTs — hash parity is structural.

    Plan: tokens explode ×d into cells -> ONE map-side-combined
    groupBy(r, cell) (the sketch, dimension-sized) -> candidates
    via TakeOrderedAndProject -> candidate×d probe rows join the
    BROADCAST sketch -> min per term.
    """
    toks = documents.select(
        F.explode(tokens_col(F.col("text"))).alias("term")
    ).localCheckpoint(eager=False)
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), F.asc("term")).limit(k)
    sketch = (
        toks.select(F.explode(_cms_cells(F.col("term"), d, w)).alias("rc"))
        .select(F.col("rc.r").alias("r"), F.col("rc.cell").alias("cell"))
        .groupBy("r", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    probes = top.select(
        "term",
        "exact_n",
        F.explode(_cms_cells(F.col("term"), d, w)).alias("rc"),
    ).select("term", "exact_n", F.col("rc.r").alias("r"),
             F.col("rc.cell").alias("cell"))
    return (
        probes.join(F.broadcast(sketch), ["r", "cell"])
        .groupBy("term")
        .agg(
            F.max("exact_n").alias("exact_n"),
            F.min("n").alias("cms_est"),
        )
    )


def sql_cms_term_estimates(d: int = CMS_D, w: int = CMS_W,
                           k: int = CMS_TOPK) -> str:
    cell = SQL_HASH28.format(x="CAST(r AS VARCHAR) || ':' || term")
    return f"""
WITH toks AS MATERIALIZED (
  SELECT unnest({SQL_TOKENS}) AS term FROM documents
),
exact AS MATERIALIZED (
  SELECT term, COUNT(*) AS exact_n FROM toks GROUP BY term
),
top AS (
  SELECT term, exact_n FROM exact
  ORDER BY exact_n DESC, term ASC LIMIT {int(k)}
),
cells AS (
  SELECT t.term, r.r, ({cell}) % {int(w)} AS cell
  FROM toks t CROSS JOIN (
    SELECT unnest(range({int(d)})) AS r
  ) r
),
sketch AS (
  SELECT r, cell, COUNT(*) AS n FROM cells GROUP BY r, cell
),
probes AS (
  SELECT t.term, t.exact_n, r.r, ({cell}) % {int(w)} AS cell
  FROM top t CROSS JOIN (
    SELECT unnest(range({int(d)})) AS r
  ) r
)
SELECT p.term AS term,
       MAX(p.exact_n) AS exact_n,
       MIN(s.n) AS cms_est
FROM probes p JOIN sketch s ON s.r = p.r AND s.cell = p.cell
GROUP BY p.term
"""
