"""Similarity search over an embedding column (array<float>).

- Brute-force cosine top-k: the correctness baseline. Query side is
  tiny → broadcast; dot/norms are JVM-side fold expressions
  (zip_with + aggregate, whole-stage codegen) — no Python. Top-k via
  window row_number partitioned by query.
- Random-hyperplane LSH buckets: the scale path — a 2^n_planes-way
  partitioning of the corpus so candidate generation is an equi-join
  on bucket instead of an all-pairs cross join. Plane components are
  a fixed integer-arithmetic pseudo-random grid (engine-portable; SQL
  mirror recomputes them bit-for-bit).

All float math is double (float32 inputs cast up), sequential
left-to-right folds — identical in the DuckDB mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 8
PLANE_MOD = 1000003


def _dvec(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_topk(
    embeddings: DataFrame, n_queries: int = 10, k: int = 10
) -> DataFrame:
    """Exact brute-force cosine top-k.

    Queries = vec_id < n_queries (broadcast); targets = all rows.
    Output: (query_id, vec_id, rank). rank 1 is the query itself
    (cos = 1) — kept for determinism.
    """
    e = embeddings.select("vec_id", _dvec("embedding").alias("v"))
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cand = e.crossJoin(F.broadcast(q))
    cos = _dot(F.col("qv"), F.col("v")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank")
    )


def _plane_component(j, i):
    """Deterministic plane value in [-0.5, 0.5): integer grid formula,
    identical in the SQL mirror."""
    return ((j * DIM + i) * 2654435761 % PLANE_MOD) / float(PLANE_MOD) - 0.5


PLANES = [[_plane_component(j, i) for i in range(DIM)] for j in range(N_PLANES)]


def _bucket_expr(v):
    """Random-hyperplane bucket id: bit j set iff dot(plane_j, v) > 0."""
    bucket = None
    for j, plane in enumerate(PLANES):
        d = _dot(F.array(*[F.lit(p) for p in plane]), v)
        bit = F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def lsh_buckets(embeddings: DataFrame) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: bit j set iff
    dot(plane_j, v) > 0. Output: (vec_id, bucket: int)."""
    return embeddings.select(
        "vec_id", _bucket_expr(_dvec("embedding")).alias("bucket")
    )


def lsh_topk(
    embeddings: DataFrame, n_queries: int = 10, k: int = 10
) -> DataFrame:
    """ANN top-k completing the LSH path: candidates come from an
    equi-join on bucket (multi-probe: the query's own bucket plus all
    8 Hamming-distance-1 buckets), then exact cosine re-rank per query.

    At scale this is the plan that replaces the brute-force cross
    join: the corpus is shuffled ONCE by bucket (or pre-bucketed at
    write time), the probe side is tiny and broadcast, and each
    candidate group re-ranks independently. Probe buckets are
    pairwise distinct (b ^ 1<<j != b), so candidate pairs are unique
    without a dedup shuffle. Output: (query_id, vec_id, rank) —
    rank over the candidate set only, so fewer than k rows per query
    is possible (recall is tested vs cosine_topk).
    """
    e = embeddings.select(
        "vec_id",
        _dvec("embedding").alias("v"),
        _bucket_expr(_dvec("embedding")).alias("bucket"),
    )
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    probes = q.select(
        "query_id",
        "qv",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << j))
                    for j in range(N_PLANES)
                ],
            )
        ).alias("bucket"),
    )
    cand = e.join(F.broadcast(probes), "bucket")
    cos = _dot(F.col("qv"), F.col("v")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank")
    )


EMBED_BANDS = 8  # independent hash tables (band 0 == the lsh_buckets planes)
EMBED_ROWS_PER_BAND = 8  # hyperplanes per band


def _band_bucket_expr(v, band: int):
    """Bucket within one band: bit jj set iff dot(plane_{band*R+jj}, v) > 0,
    planes drawn from the same integer grid as _bucket_expr (so band 0
    reproduces the lsh_buckets bucket exactly)."""
    bucket = None
    for jj in range(EMBED_ROWS_PER_BAND):
        j = band * EMBED_ROWS_PER_BAND + jj
        plane = [_plane_component(j, i) for i in range(DIM)]
        d = _dot(F.array(*[F.lit(p) for p in plane]), v)
        bit = F.when(d > 0, F.lit(1 << jj)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def embedding_near_dups(
    embeddings: DataFrame, threshold: float = 0.35
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the dedup-family variant
    of the LSH path, banded exactly like the MinHash pairs operator:
    each vector is hashed into EMBED_BANDS independent band tables
    (EMBED_ROWS_PER_BAND hyperplanes each), candidates are the
    same-(band,bucket) self-join unioned across bands via one explode
    (never an all-pairs cross join), deduped, then refined by the
    exact cosine >= threshold from a join back to the vectors.

    Recall: a pair is a candidate if ANY band agrees on all R plane
    signs — 1-(1-p^R)^B with p = 1-theta/pi, ~94% at cos 0.9
    (r=8, b=8), degrading smoothly for looser thresholds; raise B for
    more recall at linear candidate cost. Candidate volume stays
    ~p_rand^R*B of all pairs (~3% for random vectors), so the plan is
    three shuffles total (band self-join + pair distinct + refine
    joins) regardless of corpus size. Output: (vec_id_a, vec_id_b).
    """
    e = embeddings.select("vec_id", _dvec("embedding").alias("v"))
    keyed = e.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(band)),
                        _band_bucket_expr(F.col("v"), band).cast("string"),
                    )
                    for band in range(EMBED_BANDS)
                ]
            )
        ).alias("bucket"),
    )
    a = keyed.select(F.col("vec_id").alias("vec_id_a"), "bucket")
    b = keyed.select(F.col("vec_id").alias("vec_id_b"), "bucket")
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b")
        .distinct()
    )
    va = e.select(F.col("vec_id").alias("vec_id_a"), F.col("v").alias("va"))
    vb = e.select(F.col("vec_id").alias("vec_id_b"), F.col("v").alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    return (
        pairs.join(va, "vec_id_a")
        .join(vb, "vec_id_b")
        .filter(cos >= threshold)
        .select("vec_id_a", "vec_id_b")
    )


IVF_CELLS = 16  # coarse-quantizer cells (production: kmeans|| trained)
IVF_NPROBE = 4  # probed cells per query


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k — the second scale path beside
    LSH (lsh_topk): a coarse quantizer partitions the corpus into
    n_cells inverted lists; each query probes only its nprobe nearest
    cells and re-ranks exactly within them.

    The coarse quantizer here is a deterministic strided sample
    (centroids = vectors with vec_id < n_cells) so the DuckDB oracle
    can derive the identical centroids from the same table; at
    production scale you'd train kmeans|| centroids on a sample — the
    plan shape below is unchanged (centroids are always tiny
    driver/broadcast state, the corpus is assigned cell ids in one
    narrow JVM pass and shuffled ONCE by cell — or pre-bucketed at
    write time — and probes are a broadcast join).

    Assignment is argmax cosine vs each centroid, computed as a JVM
    literal-array fold (no Python, no per-vector join); ties take the
    smallest centroid id (array_position returns the FIRST max).
    Output: (query_id, vec_id, rank) — rank over the probed cells
    only, so recall < 1 is possible (tested vs cosine_topk).
    """
    e = embeddings.select("vec_id", _dvec("embedding").alias("v"))
    # Coarse-quantizer state: n_cells × DIM doubles — driver-side by
    # construction (like a trained kmeans model), never data-sized.
    cens = [
        r["v"]
        for r in e.filter(F.col("vec_id") < n_cells).orderBy("vec_id").collect()
    ]

    def _cos_lit(cen, v):
        c = F.array(*[F.lit(x) for x in cen])
        return _dot(c, v) / (F.sqrt(_dot(c, c)) * F.sqrt(_dot(v, v)))

    def _scores(v):
        return F.array(*[_cos_lit(cen, v) for cen in cens])

    # 1-based cell id = first position of the max score.
    cell = F.array_position(_scores(F.col("v")), F.array_max(_scores(F.col("v")))).cast("int")
    corpus = e.withColumn("cell", cell)
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.posexplode(_scores(F.col("v"))).alias("cpos", "score"),
    )
    w_probe = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cpos").asc()
    )
    probes = (
        q.withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", (F.col("cpos") + 1).cast("int").alias("cell"))
    )
    cand = corpus.join(F.broadcast(probes), "cell")
    cos = _dot(F.col("qv"), F.col("v")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank")
    )


# --- SQL mirrors ------------------------------------------------------------

_DV = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

SQL_COSINE_TOPK = f"""
WITH e AS (SELECT vec_id, {_DV} AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {{n_queries}}),
cand AS (
  SELECT q.query_id, e.vec_id,
         list_sum(list_transform(range(1, {DIM + 1}), i -> qv[i] * v[i]))
           / (sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> qv[i] * qv[i])))
              * sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> v[i] * v[i])))) AS cos
  FROM e CROSS JOIN q
)
SELECT query_id, vec_id, rank FROM (
  SELECT query_id, vec_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
  FROM cand
) WHERE rank <= {{k}}
"""

_SQL_BUCKET = f"""CAST(list_sum(list_transform(range(0, {N_PLANES}), j ->
         CASE WHEN list_sum(list_transform(range(1, {DIM + 1}), i ->
                ((((j * {DIM} + (i - 1)) * 2654435761) % {PLANE_MOD})
                   / {float(PLANE_MOD)} - 0.5) * v[i])) > 0
         THEN CAST(1 AS BIGINT) << j ELSE 0 END)) AS INTEGER)"""

SQL_LSH_BUCKETS = f"""
WITH e AS (SELECT vec_id, {_DV} AS v FROM embeddings)
SELECT vec_id, {_SQL_BUCKET} AS bucket
FROM e
"""

_SQL_COS = (
    f"list_sum(list_transform(range(1, {DIM + 1}), i -> qv[i] * v[i]))"
    f" / (sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> qv[i] * qv[i])))"
    f" * sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> v[i] * v[i]))))"
)

SQL_LSH_TOPK = f"""
WITH e AS (SELECT vec_id, {_DV} AS v FROM embeddings),
eb AS (SELECT vec_id, v, {_SQL_BUCKET} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket
      FROM eb WHERE vec_id < {{n_queries}}),
probes AS (
  SELECT query_id, qv,
         unnest(list_prepend(qbucket,
           list_transform(range(0, {N_PLANES}),
                          j -> xor(qbucket, CAST(1 AS INTEGER) << j)))) AS bucket
  FROM q
),
cand AS (
  SELECT p.query_id, eb.vec_id, p.qv, eb.v
  FROM eb JOIN probes p ON eb.bucket = p.bucket
)
SELECT query_id, vec_id, rank FROM (
  SELECT query_id, vec_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY {_SQL_COS} DESC, vec_id ASC) AS INTEGER) AS rank
  FROM cand
) WHERE rank <= {{k}}
"""

# IVF mirror: centroids are derived from the same table (vec_id <
# n_cells), scores via a 16-way cross join + row_number — semantics
# identical to the Spark literal-array argmax (first max on ties).
SQL_IVF_TOPK = f"""
WITH e AS (SELECT vec_id, {_DV} AS v FROM embeddings),
cen AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {{n_cells}}),
scored AS (
  SELECT e.vec_id, e.v, c.cid,
         list_sum(list_transform(range(1, {DIM + 1}), i -> c.cv[i] * e.v[i]))
           / (sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> c.cv[i] * c.cv[i])))
              * sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> e.v[i] * e.v[i])))) AS score
  FROM e CROSS JOIN cen c
),
assigned AS (
  SELECT vec_id, v, CAST(cid + 1 AS INTEGER) AS cell FROM (
    SELECT vec_id, v, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, cid ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, v AS qv, CAST(cid + 1 AS INTEGER) AS cell FROM (
    SELECT vec_id, v, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, cid ASC) AS rn
    FROM scored WHERE vec_id < {{n_queries}}
  ) WHERE rn <= {{nprobe}}
),
cand AS (
  SELECT p.query_id, p.qv, a.vec_id, a.v
  FROM assigned a JOIN probes p ON a.cell = p.cell
)
SELECT query_id, vec_id, rank FROM (
  SELECT query_id, vec_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY {_SQL_COS} DESC, vec_id ASC) AS INTEGER) AS rank
  FROM cand
) WHERE rank <= {{k}}
"""

SQL_EMBED_NEAR_DUPS = f"""
WITH e AS (SELECT vec_id, {_DV} AS v FROM embeddings),
keyed AS (
  SELECT vec_id, unnest(list_transform(range(0, {EMBED_BANDS}), band ->
    CAST(band AS VARCHAR) || ':' ||
    CAST(list_sum(list_transform(range(0, {EMBED_ROWS_PER_BAND}), jj ->
      CASE WHEN list_sum(list_transform(range(1, {DIM + 1}), i ->
             (((((band * {EMBED_ROWS_PER_BAND} + jj) * {DIM} + (i - 1)) * 2654435761)
                 % {PLANE_MOD}) / {float(PLANE_MOD)} - 0.5) * v[i])) > 0
      THEN CAST(1 AS BIGINT) << jj ELSE 0 END)) AS VARCHAR))) AS bucket
  FROM e
),
cand AS (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
  FROM keyed a JOIN keyed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT c.vec_id_a, c.vec_id_b
FROM cand c
JOIN e ea ON ea.vec_id = c.vec_id_a
JOIN e eb ON eb.vec_id = c.vec_id_b
WHERE list_sum(list_transform(range(1, {DIM + 1}), i -> ea.v[i] * eb.v[i]))
   / (sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> ea.v[i] * ea.v[i])))
      * sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> eb.v[i] * eb.v[i])))) >= {{threshold}}
"""


def knn_classify(embeddings: DataFrame, n_queries: int = 10, k: int = 10) -> DataFrame:
    """Majority-vote label classification over exact cosine top-k
    neighbors — the label-propagation / quality-classifier primitive a
    training-data pipeline runs on top of its ANN index.

    Queries = vec_id < n_queries. Rank 1 of cosine_topk is the query
    itself (cos = 1), so the vote is over ranks 2..k+1 (true
    neighbors). Ties in the vote break on the smallest label, making
    the prediction engine-independent. Output: (query_id, pred_label,
    n_votes).

    Scale path: the candidate stage is swappable — here the exact
    brute-force top-k (correctness baseline, broadcast query side);
    at corpus scale `ann_lsh_topk` / `ann_ivf_topk` produce the same
    (query_id, vec_id) shape and slot in unchanged. The vote itself
    touches only n_queries x k rows: the top-k frame is broadcast into
    the label join so the corpus never shuffles, and both aggregations
    run on a driver-trivial frame.
    """
    topk = cosine_topk(embeddings, n_queries=n_queries, k=k + 1).filter(
        F.col("rank") > 1
    )
    labeled = embeddings.select("vec_id", "label").join(
        F.broadcast(topk), "vec_id"
    )
    votes = labeled.groupBy("query_id", "label").agg(F.count("*").alias("n_votes"))
    w = W.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "n_votes")
    )


SQL_KNN_CLASSIFY = f"""
WITH e AS (SELECT vec_id, label, {_DV} AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {{n_queries}}),
cand AS (
  SELECT q.query_id, e.vec_id,
         list_sum(list_transform(range(1, {DIM + 1}), i -> qv[i] * v[i]))
           / (sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> qv[i] * qv[i])))
              * sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> v[i] * v[i])))) AS cos
  FROM e CROSS JOIN q
),
tk AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, vec_id ASC) AS rank
    FROM cand
  ) WHERE rank BETWEEN 2 AND {{k_plus_1}}
),
votes AS (
  SELECT t.query_id, e2.label, COUNT(*) AS n_votes
  FROM tk t JOIN embeddings e2 ON t.vec_id = e2.vec_id
  GROUP BY t.query_id, e2.label
)
SELECT query_id, label AS pred_label, n_votes FROM (
  SELECT query_id, label, n_votes,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY n_votes DESC, label ASC) AS rn
  FROM votes
) WHERE rn = 1
"""


# --- deterministic k-means (Lloyd) over quantized embeddings -------------------

KMEANS_K = 8
KMEANS_ITERS = 1  # centroid updates (the oracle mirrors this default)
KMEANS_SCALE = 1_000_000


def _quantized(embeddings: DataFrame) -> DataFrame:
    """(vec_id, q): embedding quantized to integer micro-units.
    floor(x * 1e6) is exact and engine-identical, and every later step
    (distance, argmin, centroid floor-mean) is integer or
    deterministic double math — the whole algorithm is hash-exact
    across engines, unlike float means whose value depends on
    reduction order."""
    return embeddings.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> cast(floor(x * {KMEANS_SCALE}) as bigint))"
        ).alias("q"),
    )


def _kmeans_assign(qdf: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Map-only assignment against literal centroid arrays: exact
    squared-L2 in bigint (|q| <= 1e6, dim 64 -> max 2.6e14, no
    overflow), argmin ties to the smaller cluster id."""
    k = len(centroids)
    dcols = []
    for j, c in enumerate(centroids):
        arr = F.array(*[F.lit(int(v)).cast("long") for v in c])
        dcols.append(
            F.aggregate(
                F.zip_with("q", arr, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias(f"d{j}")
        )
    staged = qdf.select("vec_id", "q", *dcols)
    m = F.least(*[F.col(f"d{j}") for j in range(k)])
    cl = F.when(F.col("d0") == m, 0)
    for j in range(1, k):
        cl = cl.when(F.col(f"d{j}") == m, j)
    return staged.select(
        "vec_id", "q", cl.cast("int").alias("cluster"), m.alias("dist")
    )


def kmeans_embed(embeddings: DataFrame,
                 k: int = KMEANS_K,
                 iters: int = KMEANS_ITERS) -> DataFrame:
    """Deterministic Lloyd k-means over the embedding table.

    Init: the k vectors with the smallest vec_id (seed-free,
    reproducible). Each iteration: (1) map-only assignment against
    the k x dim literal centroid grid — the corpus NEVER shuffles for
    assignment; (2) centroid update = posexplode to (cluster, pos)
    partial sums — ONE map-side-combined shuffle whose reduced size is
    k x dim x partitions, collected as k x dim longs to the driver
    (dimension-sized, never data); component mean is
    floor(double(s)/double(n)) (same expression as the mirror — `div`
    truncation differs between engines on negatives). Empty clusters
    keep their previous centroid.

    Returns the final assignment (vec_id, cluster, dist) with dist
    the exact bigint squared distance in micro-units².
    """
    qdf = _quantized(embeddings)
    centroids = _kmeans_centroids(qdf, k, iters)
    return _kmeans_assign(qdf, centroids).select("vec_id", "cluster", "dist")


def _kmeans_centroids(qdf: DataFrame, k: int, iters: int) -> list[list[int]]:
    """The Lloyd centroid loop of kmeans_embed (see its docstring for
    the shuffle budget); returns the final k x dim integer grid."""
    import math

    seed_rows = qdf.orderBy("vec_id").limit(k).collect()
    centroids = [list(r["q"]) for r in seed_rows]

    for _ in range(iters):
        assigned = _kmeans_assign(qdf, centroids)
        sums = (
            assigned.select("cluster", F.posexplode("q").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        nxt = [list(c) for c in centroids]  # empty clusters keep old
        for r in sums:
            nxt[r["cluster"]][r["pos"]] = math.floor(r["s"] / r["n"])
        centroids = nxt

    return centroids


# --- SemDeDup-style cluster-scoped semantic dedup -------------------------------

SEMDEDUP_TAU = 0.35  # same verified-off-boundary threshold as embedding_near_dups


def semantic_dedup(embeddings: DataFrame,
                   k: int = KMEANS_K,
                   iters: int = KMEANS_ITERS,
                   tau: float = SEMDEDUP_TAU) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023):
    cluster the embeddings (the deterministic quantized Lloyd k-means
    above), pick one representative per cluster, and mark every other
    cluster member whose cosine to the representative >= tau as a
    semantic duplicate. Clustering bounds the comparison set — each
    vector is compared against exactly ONE representative, never
    pairwise, so the pass is linear where naive near-dup is quadratic.

    Scale shape: assignment is the map-only literal-centroid argmin
    (corpus never shuffles); representative selection is ONE
    map-side-combined min_by per cluster producing k rows (k x dim
    longs collected — dimension-sized, never data); the dup test is a
    second map-only pass against the k literal representative vectors.
    Cosine math: dot and norms are EXACT bigint folds over the
    micro-unit lattice, divided as doubles and rounded to 6 — the
    mirror carries the identical expression tree.

    Returns (vec_id, cluster, rep_id, cos, is_dup); is_dup is int 0/1,
    the representative itself is 0.
    """
    import math

    qdf = _quantized(embeddings)
    centroids = _kmeans_centroids(qdf, k, iters)
    assigned = _kmeans_assign(qdf, centroids)  # (vec_id, q, cluster, dist)

    rep_rows = (
        assigned.groupBy("cluster")
        .agg(
            F.min_by(
                F.struct(F.col("vec_id").alias("rep_id"), F.col("q").alias("rq")),
                F.struct("dist", "vec_id"),
            ).alias("r")
        )
        .collect()
    )
    reps = {r["cluster"]: (r["r"]["rep_id"], list(r["r"]["rq"])) for r in rep_rows}

    def _ldot(a_col, lit_vals):
        arr = F.array(*[F.lit(int(v)).cast("long") for v in lit_vals])
        return F.aggregate(
            F.zip_with(a_col, arr, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    nq = F.aggregate(
        F.zip_with("q", "q", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    rep_id = None
    cos = None
    for cl in sorted(reps):
        rid, rq = reps[cl]
        nr = float(sum(v * v for v in rq))
        c_expr = _ldot("q", rq).cast("double") / (
            F.sqrt(nq.cast("double")) * F.sqrt(F.lit(nr))
        )
        cond = F.col("cluster") == cl
        rep_id = F.when(cond, rid) if rep_id is None else rep_id.when(cond, rid)
        cos = F.when(cond, c_expr) if cos is None else cos.when(cond, c_expr)

    # cos stays RAW: every input is an exact integer and cast/sqrt/mul/
    # div are correctly-rounded IEEE, so the double is bit-identical to
    # the mirror's — while decimal round(6) is NOT engine-portable at
    # x.xxxxx5 boundaries (Spark BigDecimal HALF_UP vs DuckDB's
    # float-path rounding disagree on ~1% of dense cosines).
    out = assigned.select(
        "vec_id",
        "cluster",
        rep_id.cast("bigint").alias("rep_id"),
        cos.alias("cos"),
    )
    return out.withColumn(
        "is_dup",
        (
            (F.col("cos") >= F.lit(tau)) & (F.col("vec_id") != F.col("rep_id"))
        ).cast("int"),
    )


# CAST AS BIGINT: DuckDB's list_sum(BIGINT) is HUGEINT, which pandas
# renders as float64 — the cast keeps the mirror's dist dtype int64
# like Spark's (values fit: <= 64 * (2e6)^2 = 2.6e14)
_SQL_KM_DIST = (
    "CAST(list_sum(list_transform(generate_series(1, len({q})),"
    " i -> ({q}[i] - {c}[i]) * ({q}[i] - {c}[i]))) AS BIGINT)"
)

SQL_KMEANS_EMBED = f"""
WITH q AS (
  SELECT vec_id,
         -- CAST to DOUBLE first: DuckDB keeps FLOAT * INT in float32,
         -- whose floor diverges from Spark's double math by 1 micro-unit
         -- on ~2% of components
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT)) AS q
  FROM embeddings
),
c0 AS (
  SELECT (row_number() OVER (ORDER BY vec_id) - 1) AS cluster, q AS c
  FROM (SELECT vec_id, q FROM q ORDER BY vec_id LIMIT {KMEANS_K})
),
a0 AS (
  SELECT vec_id, q, cluster, dist FROM (
    SELECT vec_id, q, cluster, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
    FROM (SELECT q.vec_id, q.q AS q, c0.cluster,
                 {_SQL_KM_DIST.format(q="q.q", c="c0.c")} AS dist
          FROM q CROSS JOIN c0))
  WHERE rn = 1
),
sums AS (
  SELECT cluster, t.i AS i,
         CAST(floor(CAST(sum(q[t.i]) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS m
  FROM a0, unnest(generate_series(1, len(q))) AS t(i)
  GROUP BY cluster, t.i
),
u AS (SELECT cluster, list(m ORDER BY i) AS c FROM sums GROUP BY cluster),
c1 AS (
  SELECT c0.cluster, COALESCE(u.c, c0.c) AS c
  FROM c0 LEFT JOIN u ON c0.cluster = u.cluster
)
SELECT vec_id, CAST(cluster AS INT) AS cluster, dist FROM (
  SELECT vec_id, cluster, dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
  FROM (SELECT q.vec_id, c1.cluster,
               {_SQL_KM_DIST.format(q="q.q", c="c1.c")} AS dist
        FROM q CROSS JOIN c1))
WHERE rn = 1
"""

_SQL_KM_PREFIX = SQL_KMEANS_EMBED[: SQL_KMEANS_EMBED.index("SELECT vec_id, CAST")]

_SQL_IDOT = (
    "CAST(list_sum(list_transform(generate_series(1, len({a})),"
    " i -> {a}[i] * {b}[i])) AS DOUBLE)"
)

SQL_SEMANTIC_DEDUP = f"""
{_SQL_KM_PREFIX.rstrip().rstrip(")")}),
a1 AS (
  SELECT vec_id, q, cluster, dist FROM (
    SELECT vec_id, q, cluster, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
    FROM (SELECT q.vec_id, q.q AS q, c1.cluster,
                 {_SQL_KM_DIST.format(q="q.q", c="c1.c")} AS dist
          FROM q CROSS JOIN c1))
  WHERE rn = 1
),
rep AS (
  SELECT cluster, vec_id AS rep_id, q AS rq FROM (
    SELECT cluster, vec_id, q,
           row_number() OVER (PARTITION BY cluster
                              ORDER BY dist ASC, vec_id ASC) AS rn
    FROM a1)
  WHERE rn = 1
),
j AS (
  SELECT a1.vec_id AS vec_id, CAST(a1.cluster AS INT) AS cluster,
         rep.rep_id AS rep_id,
         {_SQL_IDOT.format(a="a1.q", b="rep.rq")}
           / (sqrt({_SQL_IDOT.format(a="a1.q", b="a1.q")})
              * sqrt({_SQL_IDOT.format(a="rep.rq", b="rep.rq")})) AS cos
  FROM a1 JOIN rep ON a1.cluster = rep.cluster
)
SELECT vec_id, cluster, rep_id, cos,
       CAST((cos >= CAST({SEMDEDUP_TAU} AS DOUBLE) AND vec_id <> rep_id) AS INT)
         AS is_dup
FROM j
"""


# --- embedding outliers (farthest from own centroid) -----------------------------

OUTLIER_TOPK = 25


def embedding_outliers(embeddings: DataFrame,
                       k: int = KMEANS_K,
                       iters: int = KMEANS_ITERS,
                       topk: int = OUTLIER_TOPK) -> DataFrame:
    """The topk vectors farthest from their own k-means centroid —
    the cheap distance-based anomaly screen over an embedding corpus
    (mislabeled / off-distribution documents surface here first).

    Everything reuses the deterministic quantized Lloyd machinery:
    assignment is map-only against literal centroids, dist is the
    exact bigint squared distance, and the global top-k is a
    TakeOrdered (partial per-partition top-k, never a full sort).
    Ties rank by vec_id so the cut is total.

    Returns (vec_id, cluster, dist, rank), rank <= topk.
    """
    qdf = _quantized(embeddings)
    centroids = _kmeans_centroids(qdf, k, iters)
    assigned = _kmeans_assign(qdf, centroids).select("vec_id", "cluster", "dist")
    top = assigned.orderBy(F.desc("dist"), F.asc("vec_id")).limit(topk)
    w = W.orderBy(F.desc("dist"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


SQL_EMBEDDING_OUTLIERS = f"""
WITH a AS ({SQL_KMEANS_EMBED})
SELECT vec_id, cluster, dist,
       CAST(row_number() OVER (ORDER BY dist DESC, vec_id ASC) AS INT) AS rank
FROM (SELECT * FROM a ORDER BY dist DESC, vec_id ASC LIMIT {OUTLIER_TOPK})
"""


# --- per-dimension embedding standardization --------------------------------------

def embed_standardize(embeddings: DataFrame) -> DataFrame:
    """Per-dimension z-score standardization of the embedding corpus —
    the feature-scaling pass upstream ANN/k-means stacks assume.

    Determinism: dimensions are standardized on the quantized integer
    lattice (micro-units), so the per-dimension sum and sum-of-squares
    are EXACT bigints (one posexplode + map-side-combined aggregate to
    dim rows); mean and population variance then divide those exact
    integers as doubles with mirror-identical trees, and each z-score
    is (q - mean)/stddev over exact inputs — bit-identical across
    engines with no float accumulation anywhere.

    Plan: the corpus shuffles ONCE (posexplode to (pos, q) keyed agg,
    combiners reduce each partition to <= dim rows); the dim-sized
    stats frame broadcasts back onto the same exploded stream, so
    normalization is map-side. Output exploded as (vec_id, pos, z) —
    constant-width rows, no array-of-double hashing ambiguity.

    Overflow headroom: each element's v^2 <= 1e12 fits int64, but the
    SUM wraps at ~9e6 rows per dimension, so both moment accumulators
    are DECIMAL(38,0) (exact integers to 1e38 — safe past 1e25 rows;
    DuckDB mirrors with its exact HUGEINT sum). The mean/variance
    trees are unchanged: an exact integer converts to the same nearest
    double from DECIMAL(38,0) or HUGEINT (tests/test_kmeans.py
    overflow test runs 10M rows where the BIGINT path would wrap).
    """
    q = _quantized(embeddings).select(
        "vec_id", F.posexplode("q").alias("pos", "v")
    )
    stats = q.groupBy("pos").agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("s"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("ss"),
        F.count("*").alias("n"),
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = (
        F.col("ss").cast("double") / F.col("n").cast("double")
        - mean * mean
    )
    stats = stats.select(
        "pos", mean.alias("mean"), F.sqrt(var).alias("sd")
    )
    return (
        q.join(F.broadcast(stats), "pos")
        .select(
            "vec_id",
            "pos",
            ((F.col("v").cast("double") - F.col("mean")) / F.col("sd"))
            .alias("z"),
        )
    )


SQL_EMBED_STANDARDIZE = f"""
WITH q AS (
  SELECT vec_id, t.i AS pos, qv[t.i] AS v FROM (
    SELECT vec_id,
           list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * {KMEANS_SCALE})
                                    AS BIGINT)) AS qv
    FROM embeddings
  ), unnest(generate_series(1, len(qv))) AS t(i)
),
st AS (
  -- DuckDB's sum(BIGINT) is an exact HUGEINT; keep it wide (the
  -- BIGINT cast here would ERROR past ~9e6 rows/dim, mirroring the
  -- Spark side's old silent wrap — both sides now stay exact and
  -- convert the SAME integer to double)
  SELECT pos, sum(v) AS s, sum(v * v) AS ss, count(*) AS n
  FROM q GROUP BY pos
),
m AS (
  SELECT pos,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         sqrt(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
              - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) AS sd
  FROM st
)
SELECT q.vec_id, CAST(q.pos - 1 AS INT) AS pos,
       (CAST(q.v AS DOUBLE) - m.mean) / m.sd AS z
FROM q JOIN m ON q.pos = m.pos
"""


# --- product quantization (PQ codes + asymmetric-distance top-k) ---------------

PQ_M = 4          # subspaces
PQ_KC = 4         # centroids per subspace codebook
PQ_D = DIM // PQ_M  # dims per subspace


def _pq_codebooks(embeddings: DataFrame, kc: int = PQ_KC) -> list[list[float]]:
    """Deterministic codebooks: the first kc vectors (vec_id < kc),
    sliced per subspace — the IVF trick that lets the DuckDB oracle
    derive the IDENTICAL centroids from the same table (production
    swaps in per-subspace kmeans; the plan shape is unchanged —
    codebooks are always m·kc·d driver state, never data-sized)."""
    e = embeddings.select("vec_id", _dvec("embedding").alias("v"))
    return [
        r["v"]
        for r in e.filter(F.col("vec_id") < kc).orderBy("vec_id").collect()
    ]


def _pq_dsq_lit(v, s: int, cen: list[float]):
    """Σ_{i in subspace s} (v[i] − cen[i])², as an explicit 0.0-seeded
    left-associated chain of correctly-rounded IEEE ops — the same
    fold order DuckDB's list_sum uses, so the double is bit-identical
    (the _dot discipline with a literal second operand)."""
    chain = F.lit(0.0)
    for off in range(PQ_D):
        i = s * PQ_D + off + 1  # 1-based element_at index
        t = F.element_at(v, i) - F.lit(cen[i - 1])
        chain = chain + t * t
    return chain


def _pq_code_col(v, s: int, cens: list[list[float]]):
    """1-based code = first-minimum position (exact-tie → smallest
    centroid id, matching the oracle's ORDER BY d ASC, cid ASC)."""
    scores = F.array(*[_pq_dsq_lit(v, s, cen) for cen in cens])
    return F.array_position(scores, F.array_min(scores)).cast("int")


def pq_codes(embeddings: DataFrame, kc: int = PQ_KC) -> DataFrame:
    """Product-quantization codes (Jégou et al. 2011): each vector is
    compressed to m subspace codes — the memory format that lets a
    100-TB ANN corpus live in RAM (m·log2(kc) bits per vector instead
    of 4·DIM bytes).

    Output: (vec_id, c1..c4), 1-based codebook indices per subspace.

    Plan: map-only JVM literal-array folds against the m×kc×d literal
    codebooks — the corpus never shuffles and nothing touches Python
    (the kmeans_embed assignment pattern, per subspace).
    """
    cens = _pq_codebooks(embeddings, kc)
    e = embeddings.select("vec_id", _dvec("embedding").alias("v"))
    return e.select(
        "vec_id",
        *[
            _pq_code_col(F.col("v"), s, cens).alias(f"c{s + 1}")
            for s in range(PQ_M)
        ],
    )


def pq_adc_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    kc: int = PQ_KC,
) -> DataFrame:
    """PQ asymmetric-distance top-k: the query stays exact, every
    corpus vector is represented ONLY by its codes, and the scan cost
    per candidate is m codebook lookups — the IVF-PQ inner loop.

    approx_dist(q, x) = Σ_s ‖q_s − codebook_s[code_s(x)]‖², realized
    as an explicit s-ordered 0.0-seeded chain of per-subspace CASE
    selections over the literal codebooks (a GROUP-BY sum over
    subspace rows would add the 4 doubles in nondeterministic order
    and break the cross-engine hash; the chain fixes the order).

    Output: (query_id, vec_id, rank) — rank by (adc ASC, vec_id ASC).
    Recall vs the exact scan is approximate by construction (tested).

    Plan: codes and the per-query distance are all JVM expressions;
    queries broadcast into one stage against the code-compressed
    corpus — the corpus is scanned ONCE, shuffles only for the final
    per-query top-k window on n_queries partitions.
    """
    cens = _pq_codebooks(embeddings, kc)
    e = embeddings.select("vec_id", _dvec("embedding").alias("v"))
    codes = e.select(
        "vec_id",
        *[
            _pq_code_col(F.col("v"), s, cens).alias(f"c{s + 1}")
            for s in range(PQ_M)
        ],
    )
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    def _term(s: int):
        col = F.col(f"c{s + 1}")
        expr = None
        for j, cen in enumerate(cens):
            d = _pq_dsq_lit(F.col("qv"), s, cen)
            expr = F.when(col == j + 1, d) if expr is None else expr.when(col == j + 1, d)
        return expr

    adc = F.lit(0.0)
    for s in range(PQ_M):
        adc = adc + _term(s)
    w = W.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("vec_id").asc())
    return (
        codes.join(F.broadcast(q))
        .withColumn("adc", adc)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank")
    )


_PQ_DSQ_SQL = (
    f"list_sum(list_transform(range(s * {PQ_D} + 1, s * {PQ_D} + {PQ_D + 1}), "
    f"i -> (v[i] - cv[i]) * (v[i] - cv[i])))"
)


def _pq_codes_ctes(kc: int = PQ_KC) -> str:
    return f"""
e AS (SELECT vec_id, {_DV} AS v FROM embeddings),
cen AS (SELECT vec_id + 1 AS cid, v AS cv FROM e WHERE vec_id < {kc}),
sc AS (
  SELECT e.vec_id, ss.s, c.cid,
         row_number() OVER (
           PARTITION BY e.vec_id, ss.s
           ORDER BY {_PQ_DSQ_SQL} ASC, c.cid ASC
         ) AS rn
  FROM e
  CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS s) ss
  CROSS JOIN cen c
),
codes AS (
  SELECT vec_id,
         MAX(CASE WHEN s = 0 THEN cid END) AS c1,
         MAX(CASE WHEN s = 1 THEN cid END) AS c2,
         MAX(CASE WHEN s = 2 THEN cid END) AS c3,
         MAX(CASE WHEN s = 3 THEN cid END) AS c4
  FROM sc WHERE rn = 1 GROUP BY vec_id
)"""


SQL_PQ_CODES = f"""
WITH {_pq_codes_ctes()}
SELECT vec_id, CAST(c1 AS INTEGER) AS c1, CAST(c2 AS INTEGER) AS c2,
       CAST(c3 AS INTEGER) AS c3, CAST(c4 AS INTEGER) AS c4
FROM codes
"""


def _sql_pq_qdsq(s: int, cenref: str) -> str:
    """Query-side subspace distance with a FIXED s (the literal fold
    bounds match _pq_dsq_lit's chain for subspace s)."""
    lo, hi = s * PQ_D + 1, s * PQ_D + PQ_D + 1
    return (
        f"list_sum(list_transform(range({lo}, {hi}), "
        f"i -> (qv[i] - {cenref}[i]) * (qv[i] - {cenref}[i])))"
    )


SQL_PQ_ADC_TOPK = f"""
WITH {_pq_codes_ctes()},
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {{n_queries}}),
adc AS (
  SELECT q.query_id, x.vec_id,
         ((((0.0 + {_sql_pq_qdsq(0, 'k1.cv')}) + {_sql_pq_qdsq(1, 'k2.cv')})
            + {_sql_pq_qdsq(2, 'k3.cv')}) + {_sql_pq_qdsq(3, 'k4.cv')}) AS adc
  FROM codes x
  JOIN cen k1 ON k1.cid = x.c1
  JOIN cen k2 ON k2.cid = x.c2
  JOIN cen k3 ON k3.cid = x.c3
  JOIN cen k4 ON k4.cid = x.c4
  CROSS JOIN q
)
SELECT query_id, vec_id, rank FROM (
  SELECT query_id, vec_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc ASC, vec_id ASC) AS INTEGER) AS rank
  FROM adc
) WHERE rank <= {{k}}
"""


HARD_HI = 0.999       # near-dup exclusion band: cos >= HARD_HI is a positive
HARD_K = 5


def hard_negatives(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = HARD_K,
    hi: float = HARD_HI,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    k MOST similar vectors that are NOT positives — the query itself
    and near-duplicates (cos >= hi) are excluded, then the remainder
    ranks by cosine descending. The standard retrieval-training
    sampler (e.g. DPR/Contriever-style): negatives close enough to be
    informative, far enough to be true negatives.

    Plan: identical to cosine_topk (broadcast query side, JVM
    zip_with/aggregate dot products, one row_number window) with the
    positive-exclusion predicate fused BEFORE the rank — Catalyst
    pushes it into the same projected stage, so exclusion is free. At
    production scale the brute-force candidate pass swaps for the
    lsh_topk/ivf_topk candidate generators (same exclusion + re-rank
    stage); a cluster-exclusion variant (drop candidates sharing the
    query's kmeans cell) composes by one extra broadcast join on the
    same plan.

    The cos-vs-hi comparison is safe for hash parity: both engines
    evaluate the SAME expression tree over the same doubles, so the
    verdict is bit-identical (the discipline the ANN family already
    relies on for its rank ordering).

    Output: (query_id, vec_id, rank) — rank 1 is the hardest negative.
    """
    e = embeddings.select("vec_id", _dvec("embedding").alias("v"))
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cand = e.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("qv"), F.col("v")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("cos", cos)
        .filter(F.col("cos") < F.lit(float(hi)))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank")
    )


SQL_HARD_NEGATIVES = f"""
WITH e AS (SELECT vec_id, {_DV} AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {{n_queries}}),
cand AS (
  SELECT q.query_id, e.vec_id, {_SQL_COS} AS cos
  FROM e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, rank FROM (
  SELECT query_id, vec_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
  FROM cand WHERE cos < {{hi}}
) WHERE rank <= {{k}}
"""


# ---------------------------------------------------------------------------
# Matryoshka truncation evaluation (recall of prefix-dim retrieval)
# ---------------------------------------------------------------------------

MATRYOSHKA_DIMS = (8, 16, 32)


def matryoshka_recall(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    dims: tuple[int, ...] = MATRYOSHKA_DIMS,
) -> DataFrame:
    """Matryoshka-representation evaluation (Kusupati et al.,
    NeurIPS'22): how much of the full-dimension cosine top-k each
    PREFIX truncation recovers — the measurement that decides how
    far a deployment can shrink its vectors before retrieval decays.

    For every truncation width d: top-k by cosine over v[1..d],
    inner-joined against the full-DIM top-k per query; n_overlap is
    the per-query intersection size (exact integer; queries with an
    empty intersection are kept at 0 via a LEFT join from the query
    list, so the frame is always |dims| x n_queries rows).

    Determinism: every cosine is the same left-fold dot product the
    ANN family uses (identical association order in both engines),
    ranks break ties by vec_id, and the output is pure integer —
    hash parity is structural.

    Plan: one broadcast cosine pass per width (the cosine_topk
    shape: queries broadcast, corpus never shuffles) + k-row-sized
    joins; the at-scale path swaps each brute pass for the LSH/IVF
    variants without touching the evaluation join.

    Zero-norm PREFIXES are a real edge a valid full vector can
    produce (all-zero leading dims): those rows are dropped from
    that width's candidate pool before the cosine (mirroring what a
    vector index does with unindexable rows) rather than tripping
    ANSI divide-by-zero.

    Output: (trunc_dim, query_id, n_overlap).
    """
    full = cosine_topk(embeddings, n_queries, k)
    qids = full.select("query_id").distinct()
    outs = []
    for d in dims:
        sl = F.slice(_dvec(F.col("embedding")), 1, int(d))
        trunc = embeddings.select(
            "vec_id", sl.alias("embedding")
        ).filter(_dot(F.col("embedding"), F.col("embedding")) > 0)
        td = cosine_topk(trunc, n_queries, k)
        ov = (
            full.join(td, ["query_id", "vec_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_overlap"))
        )
        outs.append(
            qids.join(ov, "query_id", "left").select(
                F.lit(int(d)).alias("trunc_dim"),
                "query_id",
                F.coalesce("n_overlap", F.lit(0)).cast("long")
                .alias("n_overlap"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def sql_matryoshka_recall(
    n_queries: int = 10, k: int = 10,
    dims: tuple[int, ...] = MATRYOSHKA_DIMS,
) -> str:
    """Mirror: the SQL_COSINE_TOPK CTE once at full DIM and once per
    truncation width, identical join + zero-fill."""
    def topk_cte(tag: str, d: int) -> str:
        nrm = (f"list_sum(list_transform(range(1, {d + 1}),"
               " i -> v[i] * v[i])) > 0")
        return f"""
{tag}_e AS (SELECT * FROM e WHERE {nrm}),
{tag}_q AS (SELECT vec_id AS query_id, v AS qv FROM {tag}_e
            WHERE vec_id < {n_queries}),
{tag}_cand AS (
  SELECT q.query_id, e.vec_id,
         list_sum(list_transform(range(1, {d + 1}), i -> qv[i] * v[i]))
           / (sqrt(list_sum(list_transform(range(1, {d + 1}), i -> qv[i] * qv[i])))
              * sqrt(list_sum(list_transform(range(1, {d + 1}), i -> v[i] * v[i])))) AS cos
  FROM {tag}_e e CROSS JOIN {tag}_q q
),
{tag}_top AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, vec_id ASC) AS rank
    FROM {tag}_cand
  ) WHERE rank <= {k}
)"""

    ctes = [topk_cte("full", DIM)]
    selects = []
    for d in dims:
        ctes.append(topk_cte(f"t{d}", int(d)))
        selects.append(f"""
SELECT {int(d)} AS trunc_dim, q.query_id,
       COALESCE(ov.n_overlap, 0) AS n_overlap
FROM q LEFT JOIN (
  SELECT f.query_id, count(*) AS n_overlap
  FROM full_top f JOIN t{int(d)}_top t
    ON t.query_id = f.query_id AND t.vec_id = f.vec_id
  GROUP BY f.query_id
) ov ON ov.query_id = q.query_id""")
    body = ",\n".join(ctes)
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH e AS (SELECT vec_id, {_DV} AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {n_queries}),
{body}
{union}
"""


# ---------------------------------------------------------------------------
# Scalar int8 quantization evaluation (SQ8 recall vs full precision)
# ---------------------------------------------------------------------------


def sq8_recall(
    embeddings: DataFrame, n_queries: int = 10, k: int = 10
) -> DataFrame:
    """Scalar-quantization evaluation (the FAISS SQ8 scheme): each
    dimension is affinely quantized to 0..255 against the corpus'
    per-dimension [min, max] envelope, dequantized, and the cosine
    top-k over the reconstructed vectors is compared to the
    full-precision top-k — the measurement that decides whether a
    deployment can drop to 1 byte/dim (4x smaller than float32, 8x
    than float64).

    Determinism: per-dim min/max are exact aggregates; the quantize/
    dequantize expression is the same fixed shape in both engines
    (round parity is the house `_U` precedent); the cosine reuses
    the ANN family's left-fold dot product; output is pure integer.
    Constant dimensions (max == min) dequantize to the constant.

    Plan: ONE corpus pass builds the 2x|dim| envelope (a broadcast
    1-row frame), then the cosine_topk shape per representation;
    the corpus never shuffles.

    Zero-norm vectors (raw, or collapsed to zero by quantization)
    are unindexable under cosine and are dropped from the affected
    representation (the matryoshka_recall convention) instead of
    tripping ANSI divide-by-zero; the envelope is built over the
    indexable set.

    Output: (query_id, n_overlap) — intersection size between the
    SQ8 top-k and the full top-k per query.
    """
    e = embeddings.select("vec_id", _dvec("embedding").alias("v"))
    e = e.filter(_dot(F.col("v"), F.col("v")) > 0)
    dim_cols = []
    for i in range(1, DIM + 1):
        dim_cols.append(F.min(F.element_at("v", i)).alias(f"lo{i}"))
        dim_cols.append(F.max(F.element_at("v", i)).alias(f"hi{i}"))
    env = e.agg(*dim_cols)
    lo = F.array(*[F.col(f"lo{i}") for i in range(1, DIM + 1)])
    hi = F.array(*[F.col(f"hi{i}") for i in range(1, DIM + 1)])
    env = env.select(lo.alias("lo"), hi.alias("hi"))

    def dequant(v):
        # q = round((x - lo)*255/(hi - lo)); xq = lo + q*(hi - lo)/255
        return F.zip_with(
            v,
            F.zip_with(
                F.col("lo"), F.col("hi"),
                lambda a, b: F.struct(a.alias("lo"), b.alias("hi")),
            ),
            lambda x, s: F.when(
                s["hi"] > s["lo"],
                s["lo"]
                + F.round(
                    (x - s["lo"]) * 255.0 / (s["hi"] - s["lo"]), 0
                ) * (s["hi"] - s["lo"]) / 255.0,
            ).otherwise(s["lo"]),
        )

    eq = e.crossJoin(F.broadcast(env)).select(
        "vec_id", dequant(F.col("v")).alias("embedding")
    )
    eq = eq.filter(
        _dot(_dvec(F.col("embedding")), _dvec(F.col("embedding"))) > 0
    )
    full = cosine_topk(e.select("vec_id", F.col("v").alias("embedding")),
                       n_queries, k)
    sq = cosine_topk(eq, n_queries, k)
    qids = full.select("query_id").distinct()
    ov = (
        full.join(sq, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return qids.join(ov, "query_id", "left").select(
        "query_id",
        F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
    )


def sql_sq8_recall(n_queries: int = 10, k: int = 10) -> str:
    """Mirror: generate_series-indexed envelope (this DuckDB build
    lacks UNNEST WITH ORDINALITY), identical quantize/dequantize
    expression, the SQL_COSINE_TOPK CTE per representation, same
    join + zero-fill."""
    dq = ("CASE WHEN hi[i] > lo[i] THEN lo[i] + round((v[i] - lo[i])"
          " * 255.0 / (hi[i] - lo[i]), 0) * (hi[i] - lo[i]) / 255.0"
          " ELSE lo[i] END")
    nrm = (f"list_sum(list_transform(range(1, {DIM + 1}),"
           " i -> v[i] * v[i])) > 0")
    return f"""
WITH e0 AS (SELECT vec_id, {_DV} AS v FROM embeddings),
e AS (SELECT * FROM e0 WHERE {nrm}),
dims AS (
  SELECT d.i AS d, MIN(e.v[d.i]) AS mn, MAX(e.v[d.i]) AS mx
  FROM e, (SELECT UNNEST(range(1, {DIM + 1})) AS i) d
  GROUP BY d.i
),
env AS (SELECT list(mn ORDER BY d) AS lo, list(mx ORDER BY d) AS hi
        FROM dims),
eq0 AS (
  SELECT vec_id,
         list_transform(range(1, {DIM + 1}), i -> {dq}) AS v
  FROM e, env
),
eq AS (SELECT * FROM eq0 WHERE {nrm}),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {n_queries}),
full_cand AS (
  SELECT q.query_id, e.vec_id,
         list_sum(list_transform(range(1, {DIM + 1}), i -> qv[i] * v[i]))
           / (sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> qv[i] * qv[i])))
              * sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> v[i] * v[i])))) AS cos
  FROM e CROSS JOIN q
),
full_top AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, vec_id ASC) AS rank
    FROM full_cand
  ) WHERE rank <= {k}
),
sq_q AS (SELECT vec_id AS query_id, v AS qv FROM eq
         WHERE vec_id < {n_queries}),
sq_cand AS (
  SELECT q.query_id, e.vec_id,
         list_sum(list_transform(range(1, {DIM + 1}), i -> qv[i] * v[i]))
           / (sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> qv[i] * qv[i])))
              * sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> v[i] * v[i])))) AS cos
  FROM eq e CROSS JOIN sq_q q
),
sq_top AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, vec_id ASC) AS rank
    FROM sq_cand
  ) WHERE rank <= {k}
)
SELECT q.query_id,
       COALESCE(ov.n_overlap, 0) AS n_overlap
FROM q LEFT JOIN (
  SELECT f.query_id, count(*) AS n_overlap
  FROM full_top f JOIN sq_top t
    ON t.query_id = f.query_id AND t.vec_id = f.vec_id
  GROUP BY f.query_id
) ov ON ov.query_id = q.query_id
"""
