#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <outDir>
  (after running: sbt "runMain graft.Verify <sfDir> <outDir>")

Reads outDir/<name>/ parquet (Spark side) + outDir/oracle_sql.json, runs
each oracle SQL in DuckDB with views named after the corpus tables, and
compares: column names (sorted), row count, and values (columns sorted by
name, floats rounded) in row order.
"""
import json, sys, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df

def cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if v is None or v is pd.NaT:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if hasattr(v, "tolist"):  # numpy arrays
        return str(v.tolist())
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            duck_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        s_rows = [tuple(cell(v) for v in r) for r in spark_df.itertuples(index=False)]
        d_rows = [tuple(cell(v) for v in r) for r in duck_df.itertuples(index=False)]
        if s_rows != d_rows:
            bad = next(i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b)
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  spark: {s_rows[bad]}")
            print(f"  duck : {d_rows[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(spark_df)} rows)")
        n_pass += 1
    # queries with no oracle: rows-only smoke
    all_dirs = {p.rstrip('/').split('/')[-1]
                for p in glob.glob(f"{out_dir}/*/")}
    for name in sorted(all_dirs - set(oracle)):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"{'SMOKE-PASS' if n > 0 else 'SMOKE-FAIL'} {name} ({n} rows)")
        if n == 0:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracles")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
