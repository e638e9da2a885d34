"""Driver-contract parity: every __spark_entry__ query vs its DuckDB
oracle at the small SF (mirrors the driver's CORRECTNESS gate:
row count + column names + order-insensitive value equality)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    if name not in entrymod.oracle_sql():
        # iterative/non-SQL-expressible ops: the driver records a
        # rows-only check; mirror that here
        rows = entrymod.queries()[name](spark, sf_dir).collect()
        assert len(rows) > 0, name
        return
    got = _norm(entrymod.queries()[name](spark, sf_dir).toPandas())
    exp = _norm(duck.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert len(got) > 0, name
    for c in got.columns:
        g, e = got[c], exp[c]
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            pd.testing.assert_series_equal(
                g.astype(float), e.astype(float), check_names=False
            )
        else:
            assert (g.astype(str).values == e.astype(str).values).all(), (name, c)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns == ["doc_id", "span_offset", "poly_id", "layer_id"]
    assert len(rows) >= 0
