#!/usr/bin/env python3
"""Three-point growth curve (round 14, verdict #4): given same-session
bench artifacts at sf0.1, sf1 (10x) and sf3 (30x), print per-key wall
times and the measured growth exponents

    beta  = ln(t_sf1 / t_sf0.1) / ln(10)   (the old single-ratio view)
    alpha = ln(t_sf3 / t_sf1)   / ln(3)    (the marginal exponent at scale)

alpha > beta means the key is ACCELERATING past sf1 — a knee the
sf1/sf0.1 ratio alone cannot see. alpha <= 1 is linear-or-better.

Usage: python3 scripts/growth_table.py bench_sf01.json bench_sf1.json \
           bench_sf3.json
"""
import json
import math
import sys

b01 = json.load(open(sys.argv[1]))["queries"]
b1 = json.load(open(sys.argv[2]))["queries"]
b3 = json.load(open(sys.argv[3]))["queries"]
rows = []
for k in sorted(b3):
    if k in b1 and k in b01 and b01[k] > 0 and b1[k] > 0:
        beta = math.log(b1[k] / b01[k]) / math.log(10)
        alpha = math.log(b3[k] / b1[k]) / math.log(3)
        rows.append((k, b01[k], b1[k], b3[k], beta, alpha))
rows.sort(key=lambda r: -r[5])
print("| key | sf0.1 s | sf1 s | sf3 s | β (0.1→1) | α (1→3) |")
print("| --- | --- | --- | --- | --- | --- |")
for k, t01, t1, t3, beta, alpha in rows:
    flag = " ⚠" if alpha > max(beta + 0.25, 1.0) else ""
    print(f"| {k} | {t01:.2f} | {t1:.2f} | {t3:.2f} "
          f"| {beta:.2f} | {alpha:.2f}{flag} |")
print()
print("α ⚠ flags keys accelerating past sf1 (α > max(β+0.25, 1)) — "
      "sub-second keys carry JVM-floor noise; judge those by seconds, "
      "not exponents.")
