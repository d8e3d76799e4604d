"""Replicates the driver's correctness gate locally: run every
queries() entry at sf0.01 and compare against its DuckDB oracle —
row count, column names, and order-insensitive values."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


SQL_CASES = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", SQL_CASES)
def test_query_matches_oracle(spark, duck, name):
    got = _canon(entry_mod.queries()[name](spark, SF_DIR).toPandas())
    want = _canon(duck.sql(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), \
        f"columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"rows {len(got)} != {len(want)}"
    for c in got.columns:
        a, w = got[c], want[c]
        if a.dtype.kind == "f" or w.dtype.kind == "f":
            assert all(math.isclose(x, y, rel_tol=1e-9)
                       for x, y in zip(a, w)), f"col {c} differs"
        else:
            mism = (a.astype(str) != w.astype(str))
            assert not mism.any(), \
                f"col {c}: {a[mism].head(3).tolist()} != " \
                f"{w[mism].head(3).tolist()}"


def test_rows_only_queries_run(spark):
    sql = entry_mod.oracle_sql()
    for name, fn in entry_mod.queries().items():
        if name not in sql:
            df = fn(spark, SF_DIR)
            assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
