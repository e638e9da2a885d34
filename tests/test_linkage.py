"""Record linkage: planted-typo recall, distance verification, and
no-cross-join plan."""

from geo_import_spark import corpus
from geo_import_spark.operators import linejoin, linkage


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_planted_typos_fully_recovered(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    a = linkage.clean_names(cust)
    b = linkage.dirty_names(cust)
    got = {
        (r["a_id"], r["b_id"]): r["dist"]
        for r in linkage.typo_link(a, b).collect()
    }
    n = cust.count()
    # every planted twin is recovered at exactly distance 1
    self_pairs = {ai: d for (ai, bi), d in got.items() if ai == bi}
    assert len(self_pairs) == n
    assert all(d == 1 for d in self_pairs.values())
    # every reported pair is genuinely within distance 2
    names_a = {r["a_id"]: r["name"] for r in a.collect()}
    names_b = {r["b_id"]: r["name"] for r in b.collect()}
    for (ai, bi), d in got.items():
        assert _lev(names_a[ai], names_b[bi]) == d <= 2


def test_typo_link_plan_has_no_cross_join(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    plan = (
        linkage.typo_link(
            linkage.clean_names(cust), linkage.dirty_names(cust)
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_corridor_join_is_distinct_near_paths(spark, sf_dir):
    import __spark_entry__ as em

    pts = em._box_points_u(spark, sf_dir)
    segs = corpus.line_segments_a(spark, sf_dir)
    near = linejoin.near_segment_join(pts, segs).collect()
    exp = {
        (r["pt_id"], int(r["line_id"].split("-")[1]) % linejoin.N_PATHS)
        for r in near
    }
    got = {
        (r["pt_id"], r["path_id"])
        for r in linejoin.corridor_join(pts, segs).collect()
    }
    assert got == exp and got
