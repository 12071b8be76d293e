"""Driver-contract guard: queries()/oracle_sql() stay in lockstep, and a
cheap sample of queries stays hash-green against DuckDB at sf0.001 (the
full sweep is tools/check_correctness.py; this keeps the contract honest
inside the suite)."""

import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SAMPLE = ["graph_degrees", "text_token_stats", "dedup_exact", "events_sessionize"]


def _entry():
    import __spark_entry__ as e

    return e


def test_every_query_has_an_oracle():
    e = _entry()
    q, o = e.queries(), e.oracle_sql()
    assert set(q) == set(o), set(q) ^ set(o)


def test_entry_runs_and_returns_rows(spark):
    e = _entry()
    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_sampled_queries_match_duckdb(spark):
    from tools.check_correctness import normalize

    e = _entry()
    q, o = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    for name in SAMPLE:
        got = normalize(q[name](spark, SF_DIR).toPandas())
        want = normalize(con.execute(o[name]).df())
        assert got.shape == want.shape, name
        import pandas.testing as pdt

        pdt.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)
