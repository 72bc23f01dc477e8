#!/usr/bin/env python3
"""Adversarial EMBEDDINGS corpus for engine<->oracle differential fuzzing.

The sequel to advcorpus.py: that one fuzzes the documents-backed text
family; this one stages an embeddings.parquet full of the vector
garbage a real 100 TB pipeline emits — zero vectors (cosine divides by
zero), exact-duplicate vectors (top-k ties), a corpus row identical to
a query (cosine exactly 1), near-ties a hair apart at the r6 grid
boundary, huge-magnitude rows (1e18 components), denormals (1e-42),
one-hot and +/-1 extremes, antipodal pairs — and replays the REAL
Verify + diffcheck harness over every embeddings-backed hash-gated
query (sim1-sim17, dd6/dd7/dd16/dd24):

    python3 tools/advvectors.py /tmp/advvec
    sbt -batch "runMain graft.Verify /tmp/advvec /tmp/v_advvec <sim+dd queries>"
    python3 tools/diffcheck.py /tmp/advvec /tmp/v_advvec <sim+dd queries>

Shape mirrors the driver's sf0.01 table exactly (500 rows, dim 64,
labels 0..9, vec_id 0..499; queries are vec_id < 20) so every derived
constant (IVF k, PQ split, LSH bands) exercises the same code paths.

NaN / +Inf components, a NULL component, and an empty vector (vec_id
110-114) ship in the BASE corpus: the admission screen
(Similarity.admissible / the adm oracle CTE) must reject all of them
deterministically in BOTH engines, so with the screen in place the
whole corpus is hash-gateable. Before the screen existed, running this
corpus killed 19 of the 21 embeddings-backed queries (DIVIDE_BY_ZERO
on the zero vectors under ANSI mode, BIGINT grid overflow on the
1e18-component rows) — the finding that motivated it.
"""
import sys
import duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--")]
dst = args[0] if args else "/tmp/advvec"
import os
os.makedirs(dst, exist_ok=True)

DIM = 64
N = 500
NAN, INF = float("nan"), float("inf")

import random


def benign(i):
    r = random.Random(1000 + i)
    return [r.gauss(0.0, 0.15) for _ in range(DIM)]


vecs = {}
# ---- adversarial QUERY rows (vec_id < 20) -------------------------
vecs[0] = benign(0)
vecs[1] = [0.0] * DIM                      # zero-norm query
vecs[2] = [1e18] * DIM                     # huge magnitude
vecs[3] = [1e-42] * DIM                    # denormal floats
vecs[4] = [-x for x in benign(0)]          # antipode of query 0
vecs[5] = list(benign(0))                  # exact duplicate of query 0
vecs[6] = [0.0] * (DIM - 1) + [1.0]        # one-hot
vecs[7] = [1.0 if j % 2 == 0 else -1.0 for j in range(DIM)]
vecs[8] = [1e20 if j < 2 else 1e-40 for j in range(DIM)]  # cancellation
# components engineered to land ON the 1e-6 rounding grid boundary
vecs[9] = [0.0000005 * ((j % 3) + 1) for j in range(DIM)]
for i in range(10, 20):
    vecs[i] = benign(i)
# ---- adversarial CORPUS rows --------------------------------------
vecs[100] = benign(900)                    # tie pair (identical)
vecs[101] = list(vecs[100])
vecs[102] = list(vecs[0])                  # corpus copy of query 0
vecs[103] = [0.0] * DIM                    # zero-norm corpus row
vecs[104] = list(vecs[100]); vecs[104][-1] += 1e-7   # near-tie
vecs[105] = [x * 1e18 for x in vecs[0]]    # huge-scaled copy of query 0
vecs[106] = [x * 1e-30 for x in vecs[0]]   # tiny-scaled copy of query 0
vecs[107] = [-x for x in vecs[100]]        # antipode of the tie pair
vecs[108] = [0.0] * (DIM - 1) + [-1.0]     # one-hot negative
vecs[109] = [x * 1.0 for x in benign(909)]  # benign twin of the block
vecs[110] = benign(910); vecs[110][7] = NAN
vecs[111] = benign(911); vecs[111][7] = INF
vecs[112] = [NAN] * DIM
vecs[113] = benign(913); vecs[113][7] = None   # NULL component
vecs[114] = []                                 # empty vector
for i in range(N):
    if i not in vecs:
        vecs[i] = benign(i)

rows = [(i, vecs[i], i % 10) for i in range(N)]

con = duckdb.connect()
con.execute("CREATE TABLE e (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
con.executemany("INSERT INTO e VALUES (?,?,?)", rows)
# the Python client converts float('nan')/float('inf') to NULL on
# insert — restore the REAL specials via SQL (110/112 carry NaN where
# the Python row had it, 111 carries +Inf; 113 keeps its genuine NULL)
con.execute("UPDATE e SET embedding = list_transform(embedding,"
            " x -> coalesce(x, 'NaN'::FLOAT)) WHERE vec_id IN (110, 112)")
con.execute("UPDATE e SET embedding = list_transform(embedding,"
            " x -> coalesce(x, 'Infinity'::FLOAT)) WHERE vec_id = 111")
con.execute(
    f"COPY (SELECT * FROM e ORDER BY vec_id) TO '{dst}/embeddings.parquet' "
    f"(FORMAT PARQUET)")
n = con.execute(
    f"SELECT count(*) FROM read_parquet('{dst}/embeddings.parquet')"
).fetchone()[0]
print(f"{dst}/embeddings.parquet: {n} vectors, dim {DIM}, "
      f"adversarial base")
