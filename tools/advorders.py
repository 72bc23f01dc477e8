#!/usr/bin/env python3
"""Adversarial ORDERS/PART corpus — the last un-fuzzed input class.

The four existing generators cover documents (advcorpus), dimensions +
minimal lineitem (advcorpus r13), events (advevents), binary assets
(advassets) and embeddings (advvectors). The fact-side ORDERS and PART
tables were still only ever benign. This stages hostile versions of
BOTH (all other tables copied benign from sf0.01 so the join topology
is real) and replays the 16 orders/part-backed oracle queries:

    python3 tools/advorders.py /tmp/advorders
    sbt -batch "runMain graft.Verify /tmp/advorders /tmp/v_advo <queries>"
    python3 tools/diffcheck.py /tmp/advorders /tmp/v_advo <queries>

Planted hazards:
  - NULL keys and NULL attributes in every column (join/group/window
    null semantics; NULL o_custkey edges in the q36/q40 graphs);
  - DUPLICATE o_orderkey rows (join multiplicity — an engine path that
    assumes key uniqueness silently double-counts);
  - dangling orders (no lineitem) and orphan lineitems (key not in the
    crafted orders range) — outer/semi/anti and EXCEPT/INTERSECT edges;
  - float grids: -0.0 (the NormalizeFloatingNumbers group-key class),
    NaN, +/-Infinity, 1e308, tiny subnormals in o_totalprice /
    p_retailprice (aggregation, ranking and percentile edges — NaN
    ordering and NaN grouping differ BETWEEN engines unless pinned);
  - timestamp extremes: year 1 and 9999, plus the exact epoch;
  - strings: NULs, NBSP, Turkish dotted-I, RTL, emoji, zalgo,
    whitespace-only and '' in o_orderstatus / o_orderpriority /
    p_name / p_brand / p_type (group keys and CASE/label paths);
  - negative and NULL p_size; duplicate (p_brand, p_type) groups.
"""
import sys, os, shutil
import duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--")]
dst = args[0] if args else "/tmp/advorders"
os.makedirs(dst, exist_ok=True)
SRC = "/root/testdata/sf0.01"
for t in ["region", "nation", "customer", "supplier", "lineitem",
          "events", "documents", "embeddings"]:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")

con = duckdb.connect()

nasty = ["1-URGENT", "1-URGENT ", " 1-URGENT", "", "x\x00y", "a b",
         "İSTANBUL", "שלום", "🙂🙂",
         "z͑ͫ", "   ", None, "5-LOW", "5-low"]
status = ["P", "F", "O", "", None, "p", "P ", "ß"]
# default money values stay INSIDE the engine's DECIMAL(38,6) exact-sum
# domain (|v| < ~1e32) but hit every grid edge: -0.0 (group-key
# normalization), subnormal, 2^53 (double integer-precision edge),
# 0.1+0.2 (representation), +/-9.9e30 (near the grid ceiling).
# --hostile-floats swaps in NaN/Inf/1e308: OUT of the grid domain —
# both engines then fail LOUDLY on the decimal cast (verified: Spark
# ANSI NUMERIC_VALUE_OUT_OF_RANGE, DuckDB Conversion Error), which is
# the documented contract for garbage money columns — never silently
# wrong, and screened out by a V6/V7-style admission filter upstream.
vals = [0.0, -0.0, 5e-324, -1.5, 112946.26, None, 1.0, 2.0**53,
        0.1 + 0.2, 9.9e30, -9.9e30]
if "--hostile-floats" in sys.argv[1:]:
    vals = [float("nan"), float("inf"), float("-inf"), 1e308] + vals
dates = ["0001-01-07", "9999-12-31", "1970-01-01", "1998-10-03",
         None, "2262-04-11", "1677-09-22"]

con.execute("""CREATE TABLE o (o_orderkey BIGINT, o_custkey BIGINT,
  o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate TIMESTAMP,
  o_orderpriority VARCHAR)""")
rows = []
# keys 0..149 overlap sf0.01 lineitem's l_orderkey range (joins hit);
# keys 1_000_000+ dangle (no lineitem); every 10th key DUPLICATED with
# different attributes; every 13th custkey NULL, every 7th key NULL
for i in range(300):
    key = (i if i < 150 else 1_000_000 + i)
    if i % 7 == 3:
        key = None
    cust = None if i % 13 == 5 else (i * 31) % 1500
    rows.append((key, cust, status[i % len(status)], vals[i % len(vals)],
                 dates[i % len(dates)], nasty[i % len(nasty)]))
    if i % 10 == 0 and key is not None:
        rows.append((key, (cust or 0) + 1, status[(i + 1) % len(status)],
                     vals[(i + 3) % len(vals)], dates[(i + 1) % len(dates)],
                     nasty[(i + 2) % len(nasty)]))
con.executemany("INSERT INTO o VALUES (?,?,?,?,?,?)", [
    (k, c, s, v, d, p) for (k, c, s, v, d, p) in rows])
con.execute(f"COPY (SELECT * FROM o) TO '{dst}/orders.parquet' (FORMAT PARQUET)")

con.execute("""CREATE TABLE p (p_partkey BIGINT, p_name VARCHAR,
  p_brand VARCHAR, p_type VARCHAR, p_size INTEGER, p_retailprice DOUBLE)""")
prows = []
for i in range(160):
    key = i if i % 11 != 4 else None           # NULL partkeys
    size = None if i % 9 == 2 else (i % 60) - 5  # negatives + NULLs
    prows.append((key, nasty[(i * 3) % len(nasty)], nasty[(i * 5) % len(nasty)],
                  nasty[(i * 7) % len(nasty)], size, vals[(i * 3) % len(vals)]))
con.executemany("INSERT INTO p VALUES (?,?,?,?,?,?)", prows)
con.execute(f"COPY (SELECT * FROM p) TO '{dst}/part.parquet' (FORMAT PARQUET)")

for t in ["orders", "part"]:
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(f"{dst}/{t}.parquet: {n} rows (adversarial)")
