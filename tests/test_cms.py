"""Count-Min sketch: never-undercount guarantee, collision-free
exactness, forced-collision overcount, and the broadcast-probe plan
shape. Corpus hash parity runs in test_oracle_parity.py
(`cms_estimates`)."""

from pyspark.sql import functions as F

from geo_import_spark.operators import textops


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_when_no_collisions(spark):
    # few distinct terms, wide sketch: every estimate is exact
    docs = _docs(spark, ["a a b", "b c", "a"])
    out = {
        r["term"]: (r["exact_n"], r["cms_est"])
        for r in textops.cms_term_estimates(docs, w=4096).collect()
    }
    assert out == {"a": (3, 3), "b": (2, 2), "c": (1, 1)}


def test_width_one_estimates_total_mass(spark):
    # w=1 collapses every row to one counter = total token count
    docs = _docs(spark, ["a a b", "c"])
    out = textops.cms_term_estimates(docs, w=1).collect()
    assert all(r["cms_est"] == 4 for r in out)
    assert all(r["cms_est"] >= r["exact_n"] for r in out)


def test_never_undercounts_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = textops.cms_term_estimates(docs).collect()
    assert len(out) == textops.CMS_TOPK
    assert all(r["cms_est"] >= r["exact_n"] for r in out)


def test_topk_candidates_are_exact_topk(spark):
    # candidate selection is (count desc, term asc) — k=2 of a skewed
    # corpus must pick the two heaviest terms
    docs = _docs(spark, ["x x x y y z"])
    out = sorted(
        r["term"] for r in textops.cms_term_estimates(docs, k=2).collect()
    )
    assert out == ["x", "y"]


def test_sketch_is_broadcast_in_plan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = textops.cms_term_estimates(docs)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
