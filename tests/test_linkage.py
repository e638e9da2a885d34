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


def test_suffix_typos_fully_recovered(spark):
    """VERDICT r4 #3: a corruption model that mutates the LAST char —
    which the single (length, suffix) key provably misses — must be
    caught by the complementary (length, all-but-last-4) pass. Names
    carry entropy in their prefix (md5) so neither block collapses."""
    import hashlib

    rows_a, rows_b = [], []
    for i in range(300):
        name = hashlib.md5(f"ent-{i}".encode()).hexdigest()[:16]
        # suffix typo: last char cycled within the hex alphabet
        corrupt = name[:-1] + "0123456789abcdef"[
            ("0123456789abcdef".index(name[-1]) + 1) % 16
        ]
        rows_a.append((i, name))
        rows_b.append((i, corrupt))
    a = spark.createDataFrame(rows_a, "a_id long, name string")
    b = spark.createDataFrame(rows_b, "b_id long, name string")
    got = {
        (r["a_id"], r["b_id"]): r["dist"]
        for r in linkage.typo_link(a, b).collect()
    }
    self_pairs = {ai for (ai, bi) in got if ai == bi}
    assert len(self_pairs) == 300, "suffix typos must be fully recalled"
    assert all(got[(i, i)] == 1 for i in self_pairs)


def test_hot_block_guard_bounds_candidates(spark):
    """A degenerate corpus where every name shares the all-but-last-4
    prefix (the TPC-H shape): the oversized 'r:' block must be
    skipped, the discriminating 's:' blocks still link the twins, and
    the candidate count stays far below the quadratic cross product."""
    rows_a = [(i, f"Customer#{i:09d}") for i in range(500)]
    # mutate a LEADING digit (position 9) -> suffix intact
    rows_b = [
        (i, f"Customer#{(i + 100000000) % 1000000000:09d}") for i in range(500)
    ]
    a = spark.createDataFrame(rows_a, "a_id long, name string")
    b = spark.createDataFrame(rows_b, "b_id long, name string")
    out = linkage.typo_link(a, b, max_block=4096).collect()
    got = {(r["a_id"], r["b_id"]) for r in out}
    assert all((i, i) in got for i in range(500))
    # quadratic would be 250k pairs; the guard keeps it to the planted
    # twins plus the handful of true near-collisions in small blocks
    assert len(out) < 5000


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
