#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir, loads the Spark parquet result and
runs the corresponding oracle SQL (oracle_sql.json) in DuckDB with the
testdata tables registered as views; canonicalizes both (sort columns by
name, sort rows, stringify with float normalization) and diffs.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if v is None or (isinstance(v, float) and v != v):
                row.append("NULL")
            elif isinstance(v, float):
                row.append(f"{v:.6g}")
            else:
                row.append(str(v))
        rows.append("|".join(row))
    rows.sort()
    return rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    import os
    ok = fail = 0
    for name in sorted(os.listdir(out_dir)):
        if name == "oracle_sql.json":
            continue
        spark_df = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(spark_df)} rows")
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name:24s} ORACLE SQL ERROR: {e}")
            fail += 1
            continue
        a, b = canon(spark_df), canon(oracle_df)
        cols_a = sorted(spark_df.columns)
        cols_b = sorted(oracle_df.columns)
        if cols_a != cols_b:
            print(f"{name:24s} COLUMN MISMATCH spark={cols_a} oracle={cols_b}")
            fail += 1
        elif a == b:
            print(f"{name:24s} OK ({len(a)} rows)")
            ok += 1
        else:
            print(f"{name:24s} MISMATCH spark={len(a)} oracle={len(b)} rows")
            only_a = [r for r in a if r not in set(b)][:3]
            only_b = [r for r in b if r not in set(a)][:3]
            for r in only_a:
                print(f"    spark-only:  {r}")
            for r in only_b:
                print(f"    oracle-only: {r}")
            fail += 1
    print(f"\n{ok} OK, {fail} FAIL")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
