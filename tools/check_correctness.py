"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet dir, compare
row count + sorted-column value multiset. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df_pandas):
    import pandas as pd

    df = df_pandas.reindex(sorted(df_pandas.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from networkit_spark.session import get_spark

    spark = get_spark("correctness-check", cores=8, shuffle_partitions=8)

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duck_connection(sf_dir)

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            failures.append(name)
            continue
        if name not in oracles:
            print(f"SKIP-ORACLE {name}: rows={len(got)} ({time.time()-t0:.1f}s)")
            continue
        try:
            want = normalize(con.execute(oracles[name]).df())
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            failures.append(name)
            continue
        status = "OK"
        if len(got) != len(want):
            status = f"ROWS {len(got)} vs {len(want)}"
        elif list(got.columns) != list(want.columns):
            status = f"SCHEMA {list(got.columns)} vs {list(want.columns)}"
        else:
            try:
                import pandas.testing as pt

                pt.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=1e-9)
            except AssertionError as e:
                status = "VALUES " + str(e).split("\n")[0]
        print(f"{status:<8} {name}: rows={len(got)} ({time.time()-t0:.1f}s)")
        if status != "OK":
            failures.append(name)
            # show a small diff sample
            if len(got) == len(want) and list(got.columns) == list(want.columns):
                neq = (got != want).any(axis=1)
                print("  spark:", got[neq].head(3).to_dict("records"))
                print("  duck :", want[neq].head(3).to_dict("records"))

    print("\nFAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
