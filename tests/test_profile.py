"""Table profiling: per-column stats vs pandas ground truth."""

from geo_import_spark.operators import profile


def test_profile_matches_pandas(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pdf = li.toPandas()
    got = {r["column"]: r for r in profile.profile_table(li).collect()}
    assert set(got) == {c for c, _, _ in profile.PROFILE_COLS}
    for c, _, _ in profile.PROFILE_COLS:
        r = got[c]
        assert r["n_rows"] == len(pdf)
        assert r["n_nulls"] == int(pdf[c].isna().sum())
        assert r["n_distinct"] == pdf[c].nunique()
    assert got["l_orderkey"]["min_val"] == str(int(pdf["l_orderkey"].min()))
    assert got["l_quantity"]["max_val"] == str(int(pdf["l_quantity"].max()))
    assert got["l_returnflag"]["min_val"] == pdf["l_returnflag"].min()
