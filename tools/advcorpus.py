#!/usr/bin/env python3
"""Adversarial documents corpus for ENGINE↔ORACLE differential fuzzing.

The driver corpus is benign ASCII, so its hash gate cannot see
divergences that only fire on web-scale garbage. This stages a
documents.parquet full of exactly that — NULs, NBSP, Turkish dotted-I,
ligatures, lone-plane codepoints, giant tokens, whitespace-only and
empty docs, RTL/CJK/emoji, zalgo — and the verify loop is:

    python3 tools/advcorpus.py /tmp/advcorpus
    sbt -batch "runMain graft.Verify /tmp/advcorpus /tmp/v_adv <text queries>"
    python3 tools/diffcheck.py /tmp/advcorpus /tmp/v_adv <text queries>

Only the documents-backed queries apply (td*/dd*/st2x text gates); the
cs1/os*/mm*/sim* families need their own tables/fixtures and report
PATH_NOT_FOUND / fixture-shape noise here by design. The sim/dd
embedding family has its own adversarial generator: tools/advvectors.py
(whose first run produced the vector admission contract + sim18).

Round-12 catch record (each fixed + pinned the same day):
  - dd20: Java '$' matches before a FINAL newline, RE2's does not →
    non-idempotent, engine↔oracle divergent canonicalization.
  - tokens(): Spark trim() strips ASCII space only, DuckDB's also
    strips NBSP → leading-U+00A0 tokens diverged. trim dropped.
  - td6: nullif'd token count made the r_n_tokens flag NULL in the
    engine, false in the oracle, on zero-token docs.
  - td3/dd2: Java lower('İ') is the two-char full mapping, DuckDB's is
    not → fingerprint divergence. ASCII-fold translate() now.
  - td3/dd2: DuckDB array_to_string([]) is NULL, Spark concat_ws is ''
    → zero-token fingerprint NULL vs md5('').
  - dd20: RE2 (?i) applies Unicode simple folding ('ſ'→'s'), Java's is
    ASCII-only → explicit [Hh][Tt][Tt][Pp] classes now (preemptive).
Known out-of-contract rows (documented, not fixed): os2/mm3 fixture
gates assume non-empty staged assets — Spark's file listing drops
zero-byte files (see Tables.binaryAssets scaladoc).
"""
import sys
import duckdb

dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/advcorpus"
import os
os.makedirs(dst, exist_ok=True)

adv = [
    "hello world the quick brown fox",
    "hello\nworld\nthe quick\nbrown fox\n",
    "tab\tsep\ttokens\tthe end",
    "trailing newline token\n",
    "word\x00nul word",
    "CAPS Mixed lower ÜMLAUT ümlaut STRASSE straße",
    "İstanbul ıssız TURKISH dotted",
    "ﬁligature ﬂow ǅungla",
    "a" * 5000 + " tiny",
    ("ab " * 3000).strip(),
    "emoji \U0001F600\U0001F600 \U0001F1FA\U0001F1F8 zwj "
    "\U0001F469‍\U0001F469‍\U0001F467 end",
    "rtl العربية "
    "עברית mix ltr",
    "cjk 中文分词 テスト 한국어",
    "combining á é vs á é",
    "math \U0001d518\U0001d52b\U0001d526\U0001d520\U0001d52c"
    "\U0001d521\U0001d522 plane1",
    "ctrl \x01\x02\x03 chars",
    "http://EXAMPLE.com/Path?q=1#f mixed with text",
    "punct !!! ??? ... ,,, ;;;",
    "digits 12345 67890 3.14159",
    "spaces     runs     collapse",
    " \t\n\r ",
    "",
    "single",
    "dup dup dup dup dup",
    " nbsp tokens here",
    "vertical\x0btab form\x0cfeed",
    "quote \" backslash \\ pipe | delim",
    "email a@b.co ip 1.2.3.4 phone +1 (555) 123-4567",
    "high \U0010FFFF plane end",
    "zalgo z̸΢̘a̶͘l̵̈g̷̈"
    "o̶͐ text",
]
langs = ["en", "de", "fr", "es", "nl"]
sources = ["s%02d" % i for i in range(5)]
docs = [(i, t, langs[i % 5], sources[i % 5]) for i, t in enumerate(adv)]
# benign padding so the streaming gates' history/arrival split
# (max(doc_id) - 49) leaves the adversarial docs in HISTORY and a sane
# arrival window
import random
random.seed(7)
words = ["table", "scan", "row", "key", "value", "fast", "slow", "agg",
         "join", "part"]
for i in range(len(adv), 80):
    docs.append((i, " ".join(random.choices(words, k=30)),
                 langs[i % 5], sources[i % 5]))

con = duckdb.connect()
con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
            "source VARCHAR)")
con.executemany("INSERT INTO d VALUES (?,?,?,?)", docs)
con.execute(
    f"COPY (SELECT doc_id, text, lang, source, length(text) AS n_chars "
    f"FROM d ORDER BY doc_id) TO '{dst}/documents.parquet' "
    f"(FORMAT PARQUET)")
n = con.execute(
    f"SELECT count(*) FROM read_parquet('{dst}/documents.parquet')"
).fetchone()[0]
print(f"{dst}/documents.parquet: {n} docs")
