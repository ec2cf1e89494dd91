"""Local replica of the driver's correctness gate: run every
``queries()`` entry at sf0.001 and compare row-count + values against
its ``oracle_sql()`` twin in DuckDB (order-insensitive, exact)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = '/root/testdata/sf0.001'
TABLES = (
    'region nation customer supplier part orders lineitem events documents embeddings'
).split()


@pytest.fixture(scope='module')
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df):
    # sort columns by name, then rows; floats to exact repr
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        norm = []
        for v in row:
            if isinstance(v, float):
                norm.append('nan' if math.isnan(v) else repr(v))
            else:
                norm.append(repr(v))
        rows.append(tuple(norm))
    return sorted(rows)


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


def test_oracle_keys_subset_of_queries():
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())


@pytest.mark.parametrize('name', ORACLE_KEYS)
def test_query_vs_oracle(spark, ducks, name):
    q = entry_mod.queries()[name]
    got = q(spark, SF_DIR).toPandas()
    want = ducks.sql(entry_mod.oracle_sql()[name]).df()
    assert len(got) == len(want), f'{name}: rows {len(got)} vs {len(want)}'
    assert sorted(got.columns) == sorted(want.columns), (
        f'{name}: cols {sorted(got.columns)} vs {sorted(want.columns)}'
    )
    g, w = _normalize(got), _normalize(want)
    mism = [i for i, (a, b) in enumerate(zip(g, w)) if a != b]
    assert not mism, f'{name}: first mismatch row {mism[0]}:\nGOT {g[mism[0]]}\nWANT {w[mism[0]]}'


NO_ORACLE = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


@pytest.mark.parametrize('name', NO_ORACLE)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == ['url', 'text_sha']
