"""Driver-contract rehearsal: run every queries() entry at sf0.01 and
compare against its oracle_sql() via DuckDB — row count, column names,
and order-insensitive exact values (the driver's hash check, done as a
cell-wise comparison so mismatches are debuggable)."""

import duckdb
import pandas as pd
import pytest

from pywdcollections_spark.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    exp = _duck(ORACLES[name])
    assert sorted(got.columns) == sorted(exp.columns), \
        f"columns differ: {sorted(got.columns)} vs {sorted(exp.columns)}"
    assert len(got) == len(exp), f"row count {len(got)} vs {len(exp)}"
    g, e = _canon(got), _canon(exp)
    neq = (g != e).any(axis=1)
    if neq.any():
        bad = neq[neq].index[:5]
        msg = "\n".join(f"got={g.loc[i].to_dict()}\nexp={e.loc[i].to_dict()}"
                        for i in bad)
        raise AssertionError(f"{int(neq.sum())}/{len(g)} rows differ:\n{msg}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() > 0
