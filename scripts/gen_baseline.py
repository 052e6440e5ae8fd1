#!/usr/bin/env python3
"""Regenerate the BASELINE.md timing table from a BENCH.json artifact.

Usage: python3 scripts/gen_baseline.py [BENCH.json path]
Prints the markdown table (two-column layout, slowest first) plus the
total/loadavg summary lines; paste into BASELINE.md.
"""
import json, sys

path = sys.argv[1] if len(sys.argv) > 1 else "BENCH.json"
j = json.load(open(path))
q = sorted(j["queries"].items(), key=lambda kv: -kv[1])
n = len(q)
half = (n + 1) // 2
left, right = q[:half], q[half:]
print(f"## Numbers (sf0.1, seconds, median of 3; {n} queries)")
print()
print("| query | sec | | query | sec |")
print("| --- | --- | --- | --- | --- |")
for i in range(half):
    l = f"| {left[i][0]} | {left[i][1]:.2f} |"
    r = f" | {right[i][0]} | {right[i][1]:.2f} |" if i < len(right) else " | | |"
    print(l + r)
print()
total = sum(v for _, v in q)
print(f"**Total: {total:.1f} s.**", end=" ")
la = j.get("loadavg", {})
print(f"Host loadavg before/after: {la.get('before','?')} / {la.get('after','?')}.")
if j.get("errors"):
    print(f"ERRORS: {j['errors']}")
