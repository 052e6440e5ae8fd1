#!/usr/bin/env python3
"""Regenerate BASELINE.md's sf1 scale table from a same-session pair of
artifacts: the sf1 scale run and the full-registry sf0.1 run (ratios
use same-session numbers so uniform co-tenancy inflation cancels).

Usage: python3 scripts/gen_sf1_table.py bench_sf1.json bench_sf01.json \
           [bench_sf3.json]
Prints the markdown two-column table, highest ratio first. With the
optional sf3 artifact (round 14, verdict #4), keys in the growth set
carry the measured marginal exponent alpha = ln(t_sf3/t_sf1)/ln(3) in
the ratio cell — the at-scale growth rate the single sf1/sf0.1 ratio
can only bound.
"""
import json
import math
import sys

sf1 = json.load(open(sys.argv[1]))
sf01 = json.load(open(sys.argv[2]))
sf3 = json.load(open(sys.argv[3]))["queries"] if len(sys.argv) > 3 else {}
rows = []
for k, v in sf1["queries"].items():
    b = sf01["queries"].get(k)
    if b and b > 0:
        # presence test, not truthiness (a legitimate 0.0 s sf3 time is
        # not "missing"), and both log args guarded > 0 — growth_table.py
        # discipline
        a = (math.log(sf3[k] / v) / math.log(3)) \
            if (k in sf3 and v > 0 and sf3[k] > 0) else None
        rows.append((k, v, b, v / b, a))
rows.sort(key=lambda r: -r[3])
n = len(rows)
half = (n + 1) // 2
left, right = rows[:half], rows[half:]
print("| key | sf1 s | sf0.1 s | ratio | | key | sf1 s | sf0.1 s | ratio |")
print("| --- | --- | --- | --- | --- | --- | --- | --- | --- |")
for i in range(half):
    def cell(r):
        alpha = f", α={r[4]:.2f}" if r[4] is not None else ""
        return f" {r[0]} | {r[1]:.2f} | {r[2]:.2f} | {r[3]:.1f}×{alpha} "
    l = f"|{cell(left[i])}|"
    r = f"|{cell(right[i])}|" if i < len(right) else "| | | | |"
    print(l + r)
errs = sf1.get("errors", {})
print()
print(f"{n} keys; errors: {errs if errs else 'none'}; "
      f"sf1 loadavg {sf1.get('loadavg')}")
