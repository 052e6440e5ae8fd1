#!/usr/bin/env python3
"""Dev-only local correctness check mimicking the driver's DuckDB oracle.

Usage: python3 scripts/localcheck.py <verify_out_dir> <sf_dir> [key ...]

Reads <out>/<name>/ parquet (Spark result) and <out>/oracle_sql.json,
runs each oracle SQL in DuckDB with the sf tables registered as views,
and compares rows / schema (sorted col names) / values with columns
sorted by name (approximating the driver's hash compare).

NOT part of the library — driver-side python (duckdb/pandas) is allowed
for dev tooling only.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    import datetime
    # normalize date vs midnight-timestamp representation differences
    if isinstance(a, pd.Timestamp) and isinstance(b, datetime.date):
        return a == pd.Timestamp(b)
    if isinstance(b, pd.Timestamp) and isinstance(a, datetime.date):
        return b == pd.Timestamp(a)
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main():
    out, sf = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    fails = 0
    for d in sorted(glob.glob(f"{out}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if only and name not in only:
            continue
        spark = canon(pd.concat(
            [pd.read_parquet(p) for p in sorted(glob.glob(f"{d}/*.parquet"))],
            ignore_index=True) if glob.glob(f"{d}/*.parquet")
            else pd.read_parquet(d))
        if name not in oracles:
            print(f"{name:24s} rows-only: spark_rows={len(spark)}"
                  + ("  !! EMPTY" if len(spark) == 0 else ""))
            if len(spark) == 0:
                fails += 1
            continue
        oracle = canon(con.execute(oracles[name]).df())
        ok_rows = len(spark) == len(oracle)
        ok_schema = list(spark.columns) == list(oracle.columns)
        ok_vals = ok_rows and ok_schema
        if ok_vals:
            for c in spark.columns:
                sv, ov = spark[c].tolist(), oracle[c].tolist()
                for i, (x, y) in enumerate(zip(sv, ov)):
                    if not values_equal(x, y):
                        ok_vals = False
                        print(f"  {name}.{c}[{i}]: spark={x!r} oracle={y!r}")
                        break
                if not ok_vals:
                    break
        status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        extra = "" if status == "OK" else (
            f" rows {len(spark)}/{len(oracle)} schema_ok={ok_schema} "
            f"spark_cols={list(spark.columns)} oracle_cols={list(oracle.columns)}")
        vac = "  (0 rows!)" if len(spark) == 0 else ""
        print(f"{name:24s} {status} rows={len(spark)}{extra}{vac}")
        if status == "FAIL" or len(spark) == 0:
            fails += 1
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
