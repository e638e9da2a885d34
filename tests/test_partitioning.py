"""Range-fence planning: determinism, balance, and correct order
statistics vs a Python mirror."""

import hashlib

from geo_import_spark import corpus
from geo_import_spark.operators import partitioning


def _fences(spark, sf_dir):
    return sorted(
        (r["fence_idx"], r["fence_value"])
        for r in partitioning.range_fences(
            corpus.points(spark, sf_dir), "lon", "doc_id"
        ).collect()
    )


def test_fences_match_python_order_statistics(spark, sf_dir):
    pts = corpus.points(spark, sf_dir).select("doc_id", "lon").collect()
    sample = sorted(
        (r["lon"], r["doc_id"])
        for r in pts
        if int(hashlib.md5(r["doc_id"].encode()).hexdigest()[:7], 16) % 1000
        < partitioning.FENCE_PER_MILLE
    )
    n, b = len(sample), partitioning.FENCE_BUCKETS
    exp = sorted(
        (i, sample[(i * n) // b - 1][0]) for i in range(1, b)
    )
    assert _fences(spark, sf_dir) == exp


def test_fences_balance_the_corpus(spark, sf_dir):
    """Buckets defined by the fences hold roughly equal point counts
    (sample-quantile quality: each within 3x of ideal at test SF)."""
    fences = [v for _, v in _fences(spark, sf_dir)]
    lons = [r["lon"] for r in corpus.points(spark, sf_dir)
            .select("lon").collect()]
    b = partitioning.FENCE_BUCKETS
    counts = [0] * b
    for x in lons:
        i = sum(1 for f in fences if x > f)
        counts[i] += 1
    ideal = len(lons) / b
    assert all(c < 3 * ideal for c in counts), counts


def test_fences_are_rerun_deterministic(spark, sf_dir):
    assert _fences(spark, sf_dir) == _fences(spark, sf_dir)
