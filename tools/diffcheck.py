#!/usr/bin/env python3
"""Local twin of the driver's DuckDB oracle compare.

Usage: diffcheck.py <sfDir> <verifyOutDir> [query1,query2,...] [--record out.json]

--record writes the machine-readable cycle record (the
bench/verify_sf*_r*.json shape: failed[], n_compared, n_failed,
n_hash_exact, queries{name: rows}).
"""
import sys, json, glob, os
import duckdb

args = sys.argv[1:]
record_path = None
if "--record" in args:
    i = args.index("--record")
    record_path = args[i + 1]
    del args[i:i + 2]
sf, out = args[0], args[1]
only = set(args[2].split(',')) if len(args) > 2 else None

oracles = json.load(open(os.path.join(out, 'oracle_sql.json')))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        if t == "events":
            # synthetic scale dirs (tools/scaleup.py) carry ts as a raw
            # BIGINT of epoch NANOS (matching the real testdata's physical
            # int64); the engine normalizes via timestamp_micros(ts div
            # 1000) — mirror that exactly so the oracle sees TIMESTAMP
            ts_type = con.execute(
                "SELECT typeof(ts) FROM events LIMIT 1").fetchone()[0]
            if ts_type == "BIGINT":
                con.execute(
                    f"CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) "
                    f"FROM read_parquet('{p}')")

fail = 0
rec = {"failed": [], "n_compared": 0, "n_failed": 0, "n_hash_exact": 0,
       "queries": {}}
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
    rec["n_compared"] += 1
    rec["queries"][name] = len(s)
    if status == "FAIL":
        fail += 1
        rec["n_failed"] += 1
        rec["failed"].append(name)
        print(f"{name}: {status} rows(spark={len(s)},oracle={len(o)}) "
              f"schema(spark={list(s.columns)},oracle={list(o.columns)})")
    else:
        rec["n_hash_exact"] += 1
        print(f"{name}: OK ({len(s)} rows)")
if record_path:
    with open(record_path, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    print(f"record -> {record_path}")
sys.exit(1 if fail else 0)
