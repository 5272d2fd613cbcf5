#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each query
parquet dumped by graft.Verify, run the declared oracle SQL in DuckDB
over the same fixture tables and compare values (column-name-sorted,
like the driver). Dev tool only — not part of the shipped library.
"""
import json
import sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)

fail = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_df = canon(pd.read_parquet(f"{OUT_DIR}/{name}"))
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}")
        fail += 1
        continue
    try:
        duck_df = canon(con.sql(sql).df())
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        fail += 1
        continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        fail += 1
        continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
        fail += 1
        continue
    mismatch = []
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        try:
            same = (a.astype(str) == b.astype(str))
        except Exception:
            same = a == b
        if not same.all():
            idx = (~same).idxmax()
            mismatch.append(f"{c}[row {idx}]: spark={a[idx]!r} duck={b[idx]!r}")
    if mismatch:
        print(f"FAIL {name}: {'; '.join(mismatch[:3])}")
        fail += 1
    else:
        print(f"OK   {name} ({len(spark_df)} rows)")

print(f"\n{len(oracle) - fail}/{len(oracle)} oracle queries match")
sys.exit(1 if fail else 0)
