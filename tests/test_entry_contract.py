"""Replicates the driver's correctness gate locally: every queries()
entry runs; every oracle_sql() entry matches the Spark result on
row-count + column names + order-insensitive values at sf0.01."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_med_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_med_dir}/{t}.parquet')")
    return con


def _normalize(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf[sorted(pdf.columns)]
    rows = []
    for row in pdf.itertuples(index=False):
        norm = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    norm.append("nan")
                else:
                    norm.append(round(v, 6))
            elif v is None or v is pd.NaT:
                norm.append(None)
            else:
                norm.append(v)
        rows.append(tuple(norm))
    return sorted(rows, key=repr)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "column" in df.columns


ALL_QUERIES = sorted(entry_mod.queries().keys())
SQL_QUERIES = sorted(entry_mod.oracle_sql().keys())


def test_oracle_keys_subset_of_queries():
    assert set(SQL_QUERIES) <= set(ALL_QUERIES)


def test_queries_rotation_orders_stale_first():
    """The registry is returned least-recently-driver-verified first
    (VERDICT r04 #1): the last-green round keys of queries() must be
    non-decreasing, with never-verified queries leading."""
    order = list(entry_mod.queries())
    last = entry_mod._last_verified_round()
    keys = [last.get(q, 0) for q in order]
    assert keys == sorted(keys), list(zip(order, keys))
    if any(k == 0 for k in keys):  # new queries exist -> they lead
        assert keys[0] == 0


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_runs(spark, sf_med_dir, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, sf_med_dir)
    assert df.count() >= 0  # runs and has stable schema
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_duckdb_oracle(spark, sf_med_dir, duck, name):
    spark_pdf = entry_mod.queries()[name](spark, sf_med_dir).toPandas()
    duck_pdf = duck.sql(entry_mod.oracle_sql()[name]).df()
    assert sorted(map(str.lower, spark_pdf.columns)) == sorted(map(str.lower, duck_pdf.columns)), name
    duck_pdf.columns = [c for c in duck_pdf.columns]
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    assert a == b, f"{name}: value mismatch"
