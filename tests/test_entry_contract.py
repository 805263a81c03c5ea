"""Driver-contract tests: entry() smoke + every queries() entry vs its
DuckDB oracle at sf0.001 (fast); the full sf0.01 gate is tests/driver_sim.py.
"""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.driver_sim import TABLES, compare

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns[0] == "url"
    assert len(rows) >= 0


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    spark_df = fn(spark, SF).toPandas()
    duck_df = duck.execute(entrymod.oracle_sql()[name]).df()
    problems = compare(name, spark_df, duck_df)
    assert not problems, problems


@pytest.mark.parametrize("name", ["extract_docs", "extract_lineage"])
def test_rows_only_queries(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF)
    assert df.count() > 0
