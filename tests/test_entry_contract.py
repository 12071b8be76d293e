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


def test_gate_rotation_puts_unchecked_queries_first():
    # The driver's correctness gate checks the first ~50 keys in insertion
    # order; every query not yet hash-green in a prior round must be inside
    # that window (or, if more than 50 are unchecked, fill it entirely).
    from networkit_spark.entry_queries import QUERIES, _DRIVER_HASH_GREEN

    keys = list(QUERIES)
    never = [k for k in keys if k not in _DRIVER_HASH_GREEN]
    assert keys[: len(never)] == never, "unchecked queries must lead the dict"


def test_gate_rotation_orders_by_staleness():
    # Rotation v2 (VERDICT r4 task 1): after the never-green tier, queries
    # whose semantics changed AFTER their last green check come next, then
    # everything else oldest-checked-round first — all derived from the
    # published CORRECTNESS_r*.json artifacts, never hand-bookkept.
    from networkit_spark.entry_queries import QUERIES, _GREEN_ROUNDS, _gate_tier

    keys = list(QUERIES)
    tiers = [_gate_tier(k) for k in keys]
    assert tiers == sorted(tiers), "gate tiers must be nondecreasing"
    for tier in (1, 2):
        rounds = [_GREEN_ROUNDS.get(k, 0) for k in keys if _gate_tier(k) == tier]
        assert rounds == sorted(rounds), f"tier {tier} must be oldest-green first"
    # a query changed in round N with a green only from an older round must
    # sit in the recheck tier (tier 1), ahead of every up-to-date green
    from networkit_spark.entry_queries import _SEMANTICS_CHANGED

    for name, changed in _SEMANTICS_CHANGED.items():
        last = _GREEN_ROUNDS.get(name, 0)
        if 0 < last < changed:
            assert _gate_tier(name) == 1, name


def test_driver_green_set_matches_correctness_artifacts():
    # _DRIVER_HASH_GREEN is bookkeeping over the driver's published
    # CORRECTNESS_r*.json artifacts; a name may only be marked green if some
    # round actually recorded hash_match=true for it.  This prevents a
    # hash-red query (linkpred_katz in r3) from ever being hand-waved green
    # and silently dropped out of the rotation window.
    import glob
    import json

    from networkit_spark.entry_queries import _DRIVER_HASH_GREEN

    artifacts = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))
    if not artifacts:
        pytest.skip("no driver correctness artifacts present")
    green: set[str] = set()
    for path in artifacts:
        with open(path) as fh:
            rows = json.load(fh)
        green |= {k for k, v in rows.items() if v.get("hash_match")}
    unearned = _DRIVER_HASH_GREEN - green
    assert not unearned, f"marked green without a green driver row: {sorted(unearned)}"


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
