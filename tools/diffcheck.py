#!/usr/bin/env python3
"""Local twin of the driver's DuckDB oracle compare.

Usage: diffcheck.py <sfDir> <verifyOutDir> [query1,query2,...]
"""
import sys, json, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None

oracles = json.load(open(os.path.join(out, 'oracle_sql.json')))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

fail = 0
for name in sorted(oracles):
    if only and name not in only: continue
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        print(f"{name}: NO SPARK DUMP"); fail += 1; continue
    spark_df = con.execute(
        f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
    ora_df = con.execute(oracles[name]).fetchdf()
    # driver protocol: sort columns by name, then compare values
    s = spark_df[sorted(spark_df.columns)]
    o = ora_df[sorted(ora_df.columns)]
    ok_rows = len(s) == len(o)
    ok_schema = list(s.columns) == list(o.columns)
    ok_vals = False
    if ok_rows and ok_schema:
        sv = s.astype(str).values.tolist()
        ov = o.astype(str).values.tolist()
        ok_vals = sv == ov
        if not ok_vals:
            for i, (a, b) in enumerate(zip(sv, ov)):
                if a != b:
                    print(f"  first diff row {i}: spark={a} oracle={b}")
                    break
    status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
    if status == "FAIL":
        fail += 1
        print(f"{name}: {status} rows(spark={len(s)},oracle={len(o)}) "
              f"schema(spark={list(s.columns)},oracle={list(o.columns)})")
    else:
        print(f"{name}: OK ({len(s)} rows)")
sys.exit(1 if fail else 0)
