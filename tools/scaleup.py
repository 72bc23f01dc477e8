#!/usr/bin/env python3
"""Synthesize a k-x scaled copy of a testdata dir for scale rehearsals.

Facts are replicated k times with consistent key offsets (orderkey offsets
shared by orders/lineitem so joins keep their selectivity); documents get a
per-replica suffix token (so exact-dedup groups don't explode to k-cliques
of identical text while near-dup structure survives); embeddings get a
per-replica nudge on the first component (cosine structure survives, exact
duplicates don't). Dims (region/nation/customer/supplier/part) are copied
as-is — each customer simply has k-x the orders, which is how a growing
business actually scales, and keeps the nation graph at its real 25 nodes.

Usage: scaleup.py <srcDir> <dstDir> [k=10] [--events-user-offset]

--events-user-offset: give each events replica its own user_id space
(user_id + i*umax). Default replication keeps user_id/ts identical
across replicas, which multiplies per-(user, time-window) density by k
— the WORST case for stream-stream interval joins, whose matched-pair
output then grows k^2 (measured: 172 -> 1.72M pairs at k=100). Real
100x growth adds users and time at roughly constant per-user density;
this flag models that axis so join-output-bounded operators can be
rehearsed under both regimes.
Bench-only data: no oracle runs against it. events.ts is written as int64
NANOS (epoch_ns) to match the real testdata's physical encoding — the
engine reads it under nanosAsLong and normalizes to TimestampType, which
the streaming watermarks require (a duckdb-written TIMESTAMP column lands
as TIMESTAMP_NTZ in Spark and every st* query refuses it).
"""
import sys, os
import duckdb

src, dst = sys.argv[1], sys.argv[2]
k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
user_offset = "--events-user-offset" in sys.argv
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

def write(table, sql):
    con.execute(f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")

def rep(table, body):
    parts = [body.format(i=i, src=f"read_parquet('{src}/{table}.parquet')")
             for i in range(k)]
    return " UNION ALL ".join(parts)

for t in ["region", "nation", "customer", "supplier", "part"]:
    write(t, f"SELECT * FROM read_parquet('{src}/{t}.parquet')")

omax = con.execute(
    f"SELECT max(o_orderkey) + 1 FROM read_parquet('{src}/orders.parquet')").fetchone()[0]
write("orders", rep("orders",
    f"SELECT o_orderkey + {{i}} * {omax} AS o_orderkey, "
    "o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
    "FROM {src}"))
write("lineitem", rep("lineitem",
    f"SELECT l_orderkey + {{i}} * {omax} AS l_orderkey, "
    "l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
    "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
    "FROM {src}"))

emax = con.execute(
    f"SELECT max(event_id) + 1 FROM read_parquet('{src}/events.parquet')").fetchone()[0]
umax = con.execute(
    f"SELECT max(user_id) + 1 FROM read_parquet('{src}/events.parquet')").fetchone()[0]
user_expr = f"user_id + {{i}} * {umax} AS user_id" if user_offset else "user_id"
write("events", rep("events",
    f"SELECT event_id + {{i}} * {emax} AS event_id, "
    f"CAST(epoch_ns(ts) AS BIGINT) AS ts, {user_expr}, event_type, "
    "value, props FROM {src}"))

dmax = con.execute(
    f"SELECT max(doc_id) + 1 FROM read_parquet('{src}/documents.parquet')").fetchone()[0]
write("documents", rep("documents",
    f"SELECT doc_id + {{i}} * {dmax} AS doc_id, "
    "CASE WHEN {i} = 0 THEN text ELSE text || ' r{i}' END AS text, "
    "lang, source, "
    "CAST(length(CASE WHEN {i} = 0 THEN text ELSE text || ' r{i}' END) AS BIGINT) AS n_chars "
    "FROM {src}"))

vmax = con.execute(
    f"SELECT max(vec_id) + 1 FROM read_parquet('{src}/embeddings.parquet')").fetchone()[0]
write("embeddings", rep("embeddings",
    f"SELECT vec_id + {{i}} * {vmax} AS vec_id, "
    "CAST(list_concat([embedding[1] + {i} * CAST(0.001 AS FLOAT)], embedding[2:]) AS FLOAT[]) AS embedding, "
    "label FROM {src}"))
