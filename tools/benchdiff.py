#!/usr/bin/env python3
"""Compare two Bench records (bench/r*.json): per-query warm deltas and
plan-fingerprint changes.

Usage: benchdiff.py <old.json> <new.json> [pct_threshold=30]

Exit 1 if any shared query's plan fingerprint changed (a plan regression
is a correctness-of-intent signal, not noise); timing deltas are report
only — wall time in a shared JVM is noisy by nature.
"""
import sys, json

old = json.load(open(sys.argv[1]))["queries"]
new = json.load(open(sys.argv[2]))["queries"]
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0

plan_changed = []
for name in sorted(set(old) & set(new)):
    o, n = old[name], new[name]
    if o.get("plan_fp") != n.get("plan_fp"):
        plan_changed.append(name)
        print(f"PLAN  {name}: {o.get('plan_fp')} -> {n.get('plan_fp')}")
    dw = (n["warm"] - o["warm"]) / max(o["warm"], 1e-9) * 100
    if abs(dw) >= thr:
        print(f"TIME  {name}: warm {o['warm']:.3f}s -> {n['warm']:.3f}s ({dw:+.0f}%)")
for name in sorted(set(new) - set(old)):
    print(f"NEW   {name}: warm {new[name]['warm']:.3f}s")
for name in sorted(set(old) - set(new)):
    print(f"GONE  {name}")
print(f"-- {len(set(old) & set(new))} shared, {len(plan_changed)} plan changes")
sys.exit(1 if plan_changed else 0)
