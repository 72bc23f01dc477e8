#!/usr/bin/env python3
"""Adversarial EVENTS corpus for ENGINE<->ORACLE differential fuzzing.

The advcorpus/advvectors/adv-dimension generators cover the text,
vector and dimension read paths; this one covers the EVENTS table —
the read path of ~49 registry queries (the q analytics family, pf
filters, st streaming gates) and the one carrying the subtlest
cross-engine surface: TIMESTAMP(NANOS) physical encoding, JSON props
extraction, float aggregation grids, window tie orders.

Planted classes (each row deliberately targets one contract):
  - ns truncation: ts values differing only below the microsecond
    (….000000001, ….999999999) — the engine's `ts div 1000` and
    DuckDB's parquet ns->us read must truncate identically, including
    at the F1 closed-upper-bound midnight quirk.
  - pre-epoch ts (negative ns): integer `div` truncates toward zero
    while a floor-division reading would round down — a real
    divergence class for any engine pair.
  - far-future ts near the int64-ns ceiling (2262-04-11).
  - us-equal ts pairs for one user: window orders on ts alone would
    tie nondeterministically — every oracle must carry its tie-break.
  - value: -0.0, subnormal, 0.1+0.2, 1e15+0.1, 2^53+1, NULL, exact
    halves (rounding-grid probes for the davg/dsum DECIMAL grids).
  - event_type: case variants, leading/trailing space, empty, NULL,
    Cyrillic, emoji — membership filters and group keys.
  - user_id: NULL, negative, Long.MaxValue (join/group/window keys).
  - props: malformed JSON, nested, array, string-valued, duplicate
    keys, unicode keys, null-valued, NULL column — q24's extraction
    path in both engines.
  - duplicate event_ids; event_id order disagreeing with ts order.

Layout: adversarial events.parquet written via PYARROW with
timestamp[ns] physical type (the driver testdata's encoding — duckdb
cannot write TIMESTAMP_NS parquet); every other table is copied
benign from /root/testdata/sf0.01 so dim joins exercise the events
edge cases, not fixture noise.

Usage: advevents.py <dstDir>
Replay:
    python3 tools/advevents.py /tmp/advevents
    sbt -batch "runMain graft.Verify /tmp/advevents /tmp/v_advev <events queries>"
    python3 tools/diffcheck.py /tmp/advevents /tmp/v_advev <events queries>

Round-13 catch record (each fixed + pinned the same day; closing
replay 50/50 hash-exact incl. st26):
  - WATERMARK POISONING (st2/st5/st10/st12/st23 lost 1-3 rows each):
    ONE far-future (2262) event advanced the global watermark past the
    present and later-arriving well-timed rows were dropped as late.
    Fix: the event-time VALIDITY WINDOW screen at the streaming source
    (EventStreams.validEventTime + the onValidEventTime oracle
    wrapper) - the clock-skew guard every production ingest needs.
  - st13 DIED (ROW_VALUE_IS_NULL): a NULL user_id reached the CDC
    snapshot's bucket router. Fix: key-completeness screen at the
    door, oracle carries the same predicate.
  - st7 DIED twice: NULL value in the typed Tuple4 state
    (NOT_NULL_ASSERT_VIOLATION), then a 1e15 value OVERFLOWED the
    scaled-long session sum under ANSI. Fix: key+payload completeness
    plus the MaxAbsEventValue plausibility bound (the scaled-long
    grid's exactness domain), shared with the oracle text.
  - st12 counted a PHANTOM USER: dropDuplicatesWithinWatermark keeps
    one NULL-user row per window where count(DISTINCT user_id) counts
    none. Fix: key-completeness screen.
  - q50 cohorts off by one: the oracle's JOIN USING (user_id)
    naturally drops the NULL user, the engine's groupBy kept it as a
    phantom cohort member. Contract: cohorts are per-user; the engine
    screen is now explicit.
  - NULL-key ORDER BY placement (q07/q15/q23/q31/q34/q35/q37/q42/
    sql3/st1/st3/st5/st9/st10/st11/st23): Spark sorts ASC NULLS
    FIRST, DuckDB ASC NULLS LAST - every nullable ASC sort key in an
    events oracle now pins NULLS FIRST.
  - q24 JSON extraction: every Spark builtin diverges from DuckDB on
    garbage props (from_json is lenient on single quotes and takes
    the LAST duplicate key; get_json_object unquotes string values so
    "69" reads as 69; DuckDB's CAST errors on non-scalars and its
    TRY_CAST coerces '12.5'/'1e3'/'0x10'). Contract pinned by the
    native json_first_long expression: strict RFC-8259 parse, FIRST
    top-level key, INTEGER TOKEN only, NULL on long overflow - with
    an exact DuckDB twin (json_valid + raw-rendering integer regex +
    TRY_CAST).
  - q45 CUBE collision: a DATA-NULL event_type group renders
    identically to the CUBE margin row (NULL, NULL), so (dow,
    event_type) is not a total order over the output and the tie order
    diverged between engines -> n joined the sort keys on both sides.
  - pf3 clean-vs-raw: the clean store's critical-column null drop is
    LOAD-BEARING (a NULL-value purchase made the raw-table oracle
    count one extra row); pf3's oracle now carries the shared
    EventCriticalCols predicate.
Round-14 extension: the replay now covers the FULL registry (every
other table copied benign), not just the 50 events-backed queries —
188/188 oracle queries hash-exact on this corpus, one new catch:
  - st14 DIED (EXPRESSION_ENCODING_FAILED): a NULL user_id reached
    the Misra-Gries buffer and Catalyst's map encoder rejects null
    keys — one null killed the whole sketch aggregation. Fix at both
    layers: the sketch's reduce skips null terms (never-throw
    backstop, property-tested), and st14 screens user_id IS NOT NULL
    before the sketch (the st13 key-completeness posture).
Verified-identical (no fix needed): ns->us truncation at the F1
closed-bound midnight quirk and the hour boundaries (engine's
`ts div 1000` == DuckDB's parquet ns read, incl. pre-epoch rows in
batch); us-equal ts pairs order consistently under the pinned
tie-breaks; Long.MaxValue/-1 user ids group/join/window identically;
-0.0/subnormal/2^53+1 values survive the DECIMAL grids; unicode and
whitespace event_type group keys hash-exact.
"""
import sys
import shutil
import os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/advevents"
os.makedirs(dst, exist_ok=True)

SRC = "/root/testdata/sf0.01"
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"]:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")

NS = 1_000_000_000


_con = duckdb.connect()


def ts(s, ns_extra=0):
    """epoch ns of a naive UTC wall-clock string plus an ns offset."""
    us = _con.execute(
        f"SELECT epoch_us(TIMESTAMP '{s}')").fetchone()[0]
    return us * 1000 + ns_extra


rows = []  # (event_id, ts_ns, user_id, event_type, value, props)
eid = 0


def add(t, uid, etype, value, props):
    global eid
    rows.append((eid, t, uid, etype, value, props))
    eid += 1


# ---- benign anchors: a spread of in-window rows so every aggregate,
# window and session query has real structure to chew on
for d in range(6, 19):
    for h in (7, 12, 17):
        for k, et in enumerate(["view", "click", "purchase"]):
            add(ts(f"2024-01-{d:02d} {h:02d}:{15*k:02d}:00"),
                (d * 7 + h + k) % 40, et, round(1.5 * (k + 1) + d * 0.25, 2),
                '{"k": %d}' % ((d + h + k) % 100))

# ---- F1 boundary quirk: the midnight instant of the end date is
# INCLUSIVE; 1 ns after midnight truncates back onto the included
# microsecond in BOTH engines (ns->us truncation contract)
add(ts("2024-01-05 00:00:00"), 1, "view", 10.0, '{"k": 1}')
add(ts("2024-01-20 00:00:00"), 1, "view", 20.0, '{"k": 2}')
add(ts("2024-01-20 00:00:00", 1), 1, "view", 30.0, '{"k": 3}')          # 1 ns after
add(ts("2024-01-20 00:00:00", 999), 1, "view", 40.0, '{"k": 4}')        # 999 ns after
add(ts("2024-01-19 23:59:59") + 999_999_999, 1, "view", 50.0, '{"k": 5}')  # .999999999
# hour-range boundary (F2: hour between 6 and 18)
add(ts("2024-01-10 05:59:59", 999_999_000), 2, "view", 1.0, '{"k": 6}')
add(ts("2024-01-10 06:00:00"), 2, "view", 2.0, '{"k": 7}')
add(ts("2024-01-10 18:59:59", 999_999_000), 2, "view", 3.0, '{"k": 8}')
add(ts("2024-01-10 19:00:00"), 2, "view", 4.0, '{"k": 9}')

# ---- us-equal pair: same user, ts differing ONLY in ns -> identical
# microsecond timestamps; any per-user window must tie-break on keys
add(ts("2024-01-11 10:00:00", 100), 3, "click", 5.0, '{"k": 10}')
add(ts("2024-01-11 10:00:00", 900), 3, "view", 6.0, '{"k": 11}')

# ---- pre-epoch and far-future instants (outside every filter window,
# but they flow through global metrics, min/max, cohorts, spines)
add(ts("1969-12-31 23:59:59", 999_999_999), 4, "view", 1.0, '{"k": 12}')
add(ts("1969-12-31 23:59:59"), 4, "click", 1.0, '{"k": 13}')
add(ts("2262-04-11 23:47:16"), 4, "view", 1.0, '{"k": 14}')

# ---- float-grid probes on value
add(ts("2024-01-12 09:00:00"), 5, "purchase", -0.0, '{"k": 15}')
add(ts("2024-01-12 09:01:00"), 5, "purchase", 5e-324, '{"k": 16}')
add(ts("2024-01-12 09:02:00"), 5, "purchase", 0.1 + 0.2, '{"k": 17}')
add(ts("2024-01-12 09:03:00"), 5, "purchase", 1e15 + 0.1, '{"k": 18}')
add(ts("2024-01-12 09:04:00"), 5, "purchase", 2.0 ** 53 + 1, '{"k": 19}')
add(ts("2024-01-12 09:05:00"), 5, "purchase", 2.5, '{"k": 20}')
add(ts("2024-01-12 09:06:00"), 5, "purchase", None, '{"k": 21}')

# ---- event_type garbage: membership filters and group keys
for i, et in enumerate(["View", " view", "view ", "", None,
                        "просмотр", "🛒", "signup", "error"]):
    add(ts(f"2024-01-13 10:{i:02d}:00"), 6, et, 1.0, '{"k": %d}' % (30 + i))

# ---- user_id garbage: join/group/window keys
add(ts("2024-01-14 10:00:00"), None, "view", 1.0, '{"k": 40}')
add(ts("2024-01-14 10:01:00"), -1, "view", 1.0, '{"k": 41}')
add(ts("2024-01-14 10:02:00"), 9223372036854775807, "view", 1.0, '{"k": 42}')

# ---- props JSON garbage: q24's extraction path
for i, p in enumerate(['{"k": 69}', '{k: 69}', "{'k': 69}", '{"k": null}',
                       '{"k": {"a": 1}}', '{"k": [1, 2]}', '{"k": "x"}',
                       '{"k": 1, "k": 2}', '{"кей": 1}', "{}", "", None,
                       '{"k": 1e308}', '{"k": "69"}', "not json at all"]):
    add(ts(f"2024-01-15 11:{i:02d}:00"), 7, "click", 2.0, p)

# ---- id-order disagreement + duplicate event ids
t0 = ts("2024-01-16 12:00:00")
rows.append((eid, t0 + 60 * NS, 8, "view", 1.0, '{"k": 50}')); eid += 1
rows.append((eid, t0, 8, "view", 1.0, '{"k": 51}')); eid += 1
rows.append((eid - 1, t0 + 30 * NS, 8, "click", 1.0, '{"k": 52}'))  # dup id

tbl = pa.table({
    "event_id": pa.array([r[0] for r in rows], pa.int64()),
    "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
    "user_id": pa.array([r[2] for r in rows], pa.int64()),
    "event_type": pa.array([r[3] for r in rows], pa.string()),
    "value": pa.array([r[4] for r in rows], pa.float64()),
    "props": pa.array([r[5] for r in rows], pa.string()),
})
pq.write_table(tbl, f"{dst}/events.parquet")
n = duckdb.sql(
    f"SELECT count(*) FROM read_parquet('{dst}/events.parquet')").fetchone()[0]
phys = pq.read_schema(f"{dst}/events.parquet").field("ts").type
print(f"{dst}/events.parquet: {n} events, ts={phys}")
