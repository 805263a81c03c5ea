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


def test_repeat_pairs_keeps_empty_word_docs(spark, tmp_path):
    """A doc whose text normalizes to zero tokens must still pair (its
    symdiff is just the other doc's word count) — an explode-derived inner
    join on sizes silently dropped these while the oracle kept them."""
    import pandas as pd

    sf_dir = str(tmp_path)
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["!!! ??? ... ,,, ;;;", "casa rio foro justica lei"],
            "lang": ["pt", "pt"],
            "source": ["srcX", "srcX"],
            "n_chars": [100, 95],
        }
    ).to_parquet(f"{sf_dir}/documents.parquet")
    got = entrymod.queries()["repeat_pairs"](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.execute(entrymod.oracle_sql()["repeat_pairs"]).df()
    problems = compare("repeat_pairs_empty", got, want)
    assert not problems, problems
    assert len(got) == 1 and int(got["symdiff"].iloc[0]) == 5
