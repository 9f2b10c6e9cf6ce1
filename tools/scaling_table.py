#!/usr/bin/env python3
"""Emit the per-family scaling table between two BENCH_* artifacts.

Usage: python3 tools/scaling_table.py BENCH_sf1.json BENCH_sf10.json [decades]

`decades` is the log10 data multiple between the two captures (default
1.0 — one decade). Prints a markdown table: family -> warm-sum ratio ->
log-exponent, plus the steepest individual entries, for PLANS.md.
Families follow Bench's convention (first two underscore segments).
"""
import json, math, sys
from collections import defaultdict

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
decades = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
wa, wb = a["queries_warm"], b["queries_warm"]
common = [k for k in wa if k in wb]

fam_a, fam_b = defaultdict(float), defaultdict(float)
for k in common:
    f = "_".join(k.split("_")[:2])
    fam_a[f] += wa[k]
    fam_b[f] += wb[k]

rows = []
for f in fam_a:
    if fam_a[f] < 0.05:
        continue
    r = fam_b[f] / fam_a[f]
    rows.append((r, f, fam_a[f], fam_b[f]))
rows.sort(reverse=True)
print(f"| family | {sys.argv[1]} warm | {sys.argv[2]} warm | ratio | exp |")
print("|---|---|---|---|---|")
for r, f, x, y in rows:
    print(f"| {f} | {x:.2f} | {y:.2f} | {r:.2f}x | "
          f"{math.log10(max(r, 1e-9)) / decades:.2f} |")

ta = sum(wa[k] for k in common)
tb = sum(wb[k] for k in common)
print(f"\ntotal warm (common {len(common)}): {ta:.1f} -> {tb:.1f} "
      f"= {tb/ta:.2f}x, exponent {math.log10(tb/ta)/decades:.2f}")

print("\nsteepest entries:")
for r, k in sorted(((wb[k]/max(wa[k], 1e-9), k) for k in common
                    if wa[k] > 0.05), reverse=True)[:15]:
    print(f"  {k:28s} {wa[k]:7.3f} -> {wb[k]:7.3f}  {r:5.2f}x")
