#!/usr/bin/env python3
"""Dev-only local correctness check mimicking the driver's DuckDB oracle.

Usage: python3 scripts/localcheck.py <verify_out_dir> <sf_dir> [key ...]

Reads <out>/<name>/ parquet (Spark result) and <out>/oracle_sql.json,
runs each oracle SQL in DuckDB with the sf tables registered as views,
and compares rows / schema (sorted col names) / TYPES / values with
columns sorted by name (approximating the driver's type-tagged hash).

Type comparison is Arrow-level (round-10 lesson: DuckDB SUM(BIGINT)
widens to HUGEINT = decimal128(38,0), which pandas silently coerces to
float64 and the old value-only compare waved through while the
driver's typed hash failed). Both sides are read as Arrow tables and
each column's type is normalized to a family label; int64 vs decimal128
is a FAIL here, as it is at the driver.

NOT part of the library — driver-side python (duckdb/pyarrow) is
allowed for dev tooling only.
"""
import sys, json, glob, math
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def type_label(t: pa.DataType) -> str:
    """Normalize an Arrow type to the equivalence family the driver's
    typed hash effectively uses. Distinct families => hash mismatch."""
    # widths within a family collapse (the driver hashes Python values:
    # int32 and int64 both become int) but DECIMAL stays distinct —
    # DuckDB HUGEINT arrives as decimal128(38,0) = Python Decimal, and
    # the driver's typed hash fails it against Spark's int64 (round-10
    # q38_unpivot/mm_shard_pack lesson). Empirically calibrated: keys
    # with int32 vs int64 seams (q7_window, etl_dq_audit) were
    # driver-green in round 10.
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    # date vs midnight-timestamp: tolerated (values compared as dates)
    if pa.types.is_date(t) or pa.types.is_timestamp(t):
        return "datetime"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_label(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{type_label(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{type_label(t.key_type)},{type_label(t.item_type)}>"
    return str(t)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    import datetime
    # normalize date vs midnight-timestamp representation differences
    if isinstance(a, datetime.datetime):
        a = a.date() if (a.hour, a.minute, a.second, a.microsecond) == (0, 0, 0, 0) else a
    if isinstance(b, datetime.datetime):
        b = b.date() if (b.hour, b.minute, b.second, b.microsecond) == (0, 0, 0, 0) else b
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    return a == b


def read_spark(d: str) -> pa.Table:
    files = sorted(glob.glob(f"{d}/*.parquet"))
    if files:
        tabs = [pq.read_table(p) for p in files]
        return pa.concat_tables(tabs, promote_options="default") if len(tabs) > 1 else tabs[0]
    return pq.read_table(d)


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
        spark = read_spark(d)
        spark = spark.select(sorted(spark.column_names))
        if name not in oracles:
            print(f"{name:24s} rows-only: spark_rows={spark.num_rows}"
                  + ("  !! EMPTY" if spark.num_rows == 0 else ""))
            if spark.num_rows == 0:
                fails += 1
            continue
        oracle = con.execute(oracles[name]).arrow()
        if hasattr(oracle, "read_all"):  # RecordBatchReader on newer duckdb
            oracle = oracle.read_all()
        oracle = oracle.select(sorted(oracle.column_names))
        ok_rows = spark.num_rows == oracle.num_rows
        ok_schema = spark.column_names == oracle.column_names
        ok_types = ok_schema
        if ok_schema:
            for c in spark.column_names:
                st = type_label(spark.schema.field(c).type)
                ot = type_label(oracle.schema.field(c).type)
                if st != ot:
                    ok_types = False
                    print(f"  {name}.{c}: TYPE spark={st} oracle={ot}")
        ok_vals = ok_rows and ok_schema and ok_types
        if ok_vals:
            for c in spark.column_names:
                sv = spark.column(c).to_pylist()
                ov = oracle.column(c).to_pylist()
                for i, (x, y) in enumerate(zip(sv, ov)):
                    if not values_equal(x, y):
                        ok_vals = False
                        print(f"  {name}.{c}[{i}]: spark={x!r} oracle={y!r}")
                        break
                if not ok_vals:
                    break
        status = "OK" if (ok_rows and ok_schema and ok_types and ok_vals) else "FAIL"
        extra = "" if status == "OK" else (
            f" rows {spark.num_rows}/{oracle.num_rows} schema_ok={ok_schema} "
            f"types_ok={ok_types}")
        vac = "  (0 rows!)" if spark.num_rows == 0 else ""
        print(f"{name:24s} {status} rows={spark.num_rows}{extra}{vac}")
        if status == "FAIL" or spark.num_rows == 0:
            fails += 1
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
