#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (t2).

Runs each SparkEntry.oracleSql query in DuckDB against the sf parquet
tables, loads the matching Verify output parquet, sorts columns by name and
rows by all columns, and compares values. Not the driver itself — a
pre-flight so oracle mismatches are caught before the round gate runs.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify with repr-ish normalization: round-trip floats to 12 sig
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # large-sf runs (the sf1 scale proof) can otherwise OOM-kill the
    # process on window-heavy oracles; bounded memory spills instead
    import os
    con.execute(
        f"SET memory_limit='{os.environ.get('ORACLE_MEM', '24GB')}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expect = canon(con.sql(sql).df())
            got = canon(
                duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            if list(expect.columns) != list(got.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != "
                      f"{list(expect.columns)}")
                n_fail += 1
                continue
            dt_e = [str(t) for t in expect.dtypes]
            dt_g = [str(t) for t in got.dtypes]
            if dt_e != dt_g:
                print(f"FAIL {name}: dtypes {dt_g} != {dt_e}")
                n_fail += 1
                continue
            if len(expect) != len(got):
                print(f"FAIL {name}: rows {len(got)} != {len(expect)}")
                n_fail += 1
                continue
            eq = expect.astype(str).equals(got.astype(str))
            if not eq:
                diff = (expect.astype(str) != got.astype(str)).any(axis=1)
                print(f"FAIL {name}: value mismatch in {int(diff.sum())} rows")
                bad = diff[diff].index[:3]
                for i in bad:
                    print(f"  expect: {expect.loc[i].to_dict()}")
                    print(f"  got:    {got.loc[i].to_dict()}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
