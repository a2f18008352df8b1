#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs DuckDB on oracle_sql.json (emitted by graft.Verify) against the same
parquet tables, and compares each query's Spark parquet output the way the
driver does: both sides loaded into pandas, columns sorted by name, rows
sorted by every column, then DTYPES compared (this is what round 1's
repr-based canonicalizer missed — DuckDB HUGEINT/DECIMAL vs Spark
BIGINT/DOUBLE hash differently even when values are equal) and values
compared exactly (hash_pandas_object on the sorted frame).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd
from pandas.util import hash_pandas_object

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Sort columns by name and rows by every column; raises on unsortable
    (e.g. array) columns exactly like the driver's comparator."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def frame_hash(df):
    return hash_pandas_object(df, index=False).sum()


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # local iteration on a subset (matches Verify's name filter)
        oracle = {k: v for k, v in oracle.items() if k in set(only)}
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(exp.columns)}")
            fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: {len(got)} rows vs {len(exp)} rows")
            fail += 1
            continue
        dt_got = [str(t) for t in got.dtypes]
        dt_exp = [str(t) for t in exp.dtypes]
        if dt_got != dt_exp:
            diffs = [f"{c}: {a} != {b}"
                     for c, a, b in zip(got.columns, dt_got, dt_exp) if a != b]
            print(f"FAIL {name}: dtypes differ — {'; '.join(diffs)}")
            fail += 1
            continue
        if frame_hash(got) != frame_hash(exp):
            print(f"FAIL {name}: value hash mismatch ({len(got)} rows)")
            neq = got.ne(exp) & ~(got.isna() & exp.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print(f"  first diff row {i}:\n    got {got.loc[i].to_dict()}"
                      f"\n    exp {exp.loc[i].to_dict()}")
            fail += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
