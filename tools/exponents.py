#!/usr/bin/env python3
"""Scaling exponents between two bench records at different scale factors.

Usage: exponents.py <base.json> <scaled.json> <k>
Prints per-query warm ratio and exponent log_k(t_scaled / t_base), sorted
by exponent descending — the NOTES table for scale rehearsals. An
exponent of 1 is linear scaling; < 1 is sub-linear (fixed overhead or
output-bounded); > 1 bends upward and needs attribution.
"""
import sys, json, math

base, scaled, k = sys.argv[1], sys.argv[2], float(sys.argv[3])
a = json.load(open(base))["queries"]
b = json.load(open(scaled))["queries"]
common = sorted(set(a) & set(b), key=lambda q: -(b[q]["warm"] / a[q]["warm"]))
print(f"| query | base | {int(k)}x | ratio | exp |")
print("|---|---|---|---|---|")
worst = 0.0
for q in common:
    t1, tk = a[q]["warm"], b[q]["warm"]
    ratio = tk / t1
    exp = math.log(ratio, k) if ratio > 0 else float("nan")
    worst = max(worst, exp)
    print(f"| {q} | {t1:.2f} | {tk:.2f} | {ratio:.1f} | {exp:.2f} |")
print(f"\nqueries: {len(common)}  worst exponent: {worst:.2f}  "
      f"total base {sum(a[q]['warm'] for q in common):.1f}s -> "
      f"scaled {sum(b[q]['warm'] for q in common):.1f}s")
