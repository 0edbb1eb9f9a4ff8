#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs each oracle_sql.json query in DuckDB over the sf tables, loads the
Spark-side parquet result, and compares schema/rows/values (column-name-
sorted, like the driver). Usage:

    python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out \
        [--skip name1,name2,...]

--skip resumes a long (e.g. full-board sf0.1) run past queries a previous
invocation already passed — skipped queries are not counted.
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return pq.read_table(files[0]).to_pandas()

def norm(df):
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)

def values_equal(a, b):
    if a is None and b is None:
        return True
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

def main(sfdir, outdir, skip=()):
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = p.split("/")[-1].removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_rowsonly = 0
    for name in sorted(glob.glob(f"{outdir}/q*")):
        qname = name.split("/")[-1]
        if qname in skip:
            continue
        spark_df = load_spark(outdir, qname)
        if spark_df is None:
            print(f"{qname}: MISSING spark result"); n_fail += 1; continue
        if qname not in oracle:
            print(f"{qname}: rows-only ({len(spark_df)} rows)"); n_rowsonly += 1
            continue
        try:
            duck_df = con.execute(oracle[qname]).fetchdf()
        except Exception as e:
            print(f"{qname}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"{qname}: SCHEMA mismatch spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1; continue
        # Driver-strength dtype check: the driver hashes typed values, so an
        # int64-vs-float64 column is a failure even when every value compares
        # equal (e.g. DuckDB windowed sum -> HUGEINT -> pandas float64).
        dtype_bad = [
            (c, str(s[c].dtype), str(d[c].dtype))
            for c in s.columns
            if str(s[c].dtype) != str(d[c].dtype)
        ]
        if dtype_bad:
            for c, sd, dd in dtype_bad:
                print(f"{qname}: DTYPE mismatch col={c}: spark={sd} duck={dd}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"{qname}: ROWCOUNT mismatch spark={len(s)} duck={len(d)}")
            n_fail += 1; continue
        bad = 0
        for col in s.columns:
            sv, dv = s[col].tolist(), d[col].tolist()
            for i, (x, y) in enumerate(zip(sv, dv)):
                if not values_equal(x, y):
                    if bad == 0:
                        print(f"{qname}: VALUE mismatch col={col} row={i}: spark={x!r} duck={y!r}")
                    bad += 1
        if bad:
            print(f"{qname}: {bad} mismatched values"); n_fail += 1
        else:
            print(f"{qname}: OK ({len(s)} rows)"); n_pass += 1
    print(f"\npass={n_pass} rows-only={n_rowsonly} fail={n_fail}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    args = sys.argv[1:]
    skip = ()
    if "--skip" in args:
        i = args.index("--skip")
        skip = frozenset(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sys.exit(main(args[0], args[1], skip))
