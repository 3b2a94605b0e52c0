"""Every queries() entry vs its DuckDB oracle at sf0.001 — mimics the
driver's correctness gate (row count + column names + sorted values)."""

import duckdb
import pandas as pd
import pytest

from bigquery_etl_fork_spark.queries import ORACLES, QUERIES, TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_matches_oracle(spark, duck, name):
    if name not in ORACLES:  # rows-only op (approximate result)
        got = QUERIES[name](spark, SF_DIR).toPandas()
        assert len(got) > 0
        if {"approx_users", "exact_users"} <= set(got.columns):
            err = (got["approx_users"] - got["exact_users"]).abs() / got["exact_users"]
            assert (err < 0.15).all(), f"approx_count_distinct error too high: {err.max()}"
        return
    got = QUERIES[name](spark, SF_DIR).toPandas()
    exp = duck.sql(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    g, e = _norm(got), _norm(exp)
    for col in g.columns:
        gv, ev = g[col].tolist(), e[col].tolist()
        mism = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(gv, ev))
            if (a != b and not (pd.isna(a) and pd.isna(b)))
        ]
        assert not mism, f"{name}.{col}: first mismatches {mism[:5]}"
