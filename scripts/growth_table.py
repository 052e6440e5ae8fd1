#!/usr/bin/env python3
"""Growth curve (round 14, verdict #4; sf9 spot point round 16,
verdict #2): given same-session bench artifacts at sf0.1, sf1 (10x)
and sf3 (30x), print per-key wall times and the measured growth
exponents

    beta   = ln(t_sf1 / t_sf0.1) / ln(10)   (the old single-ratio view)
    alpha  = ln(t_sf3 / t_sf1)   / ln(3)    (the marginal exponent at scale)
    alpha9 = ln(t_sf9 / t_sf3)   / ln(3)    (optional sf9 spot point)

alpha > beta means the key is ACCELERATING past sf1 — a knee the
sf1/sf0.1 ratio alone cannot see. alpha <= 1 is linear-or-better.
The optional fourth artifact (sf9 = 90x, the round-16 protocol for
every key reading alpha >= 1.1 in a prior round) separates noise from
a real knee: two points cannot distinguish a constant from a slope,
three in a row can.

Usage: python3 scripts/growth_table.py bench_sf01.json bench_sf1.json \
           bench_sf3.json [bench_sf9.json]
"""
import json
import math
import sys

b01 = json.load(open(sys.argv[1]))["queries"]
b1 = json.load(open(sys.argv[2]))["queries"]
b3 = json.load(open(sys.argv[3]))["queries"]
b9 = json.load(open(sys.argv[4]))["queries"] if len(sys.argv) > 4 else {}
rows = []
for k in sorted(b3):
    if k in b1 and k in b01 and b01[k] > 0 and b1[k] > 0:
        beta = math.log(b1[k] / b01[k]) / math.log(10)
        alpha = math.log(b3[k] / b1[k]) / math.log(3)
        t9 = b9.get(k)
        alpha9 = (math.log(t9 / b3[k]) / math.log(3)
                  if t9 and b3[k] > 0 else None)
        rows.append((k, b01[k], b1[k], b3[k], beta, alpha, t9, alpha9))
rows.sort(key=lambda r: -r[5])
with9 = any(r[6] is not None for r in rows)
hdr9 = " sf9 s | α (3→9) |" if with9 else ""
print(f"| key | sf0.1 s | sf1 s | sf3 s | β (0.1→1) | α (1→3) |{hdr9}")
print("| --- | --- | --- | --- | --- | --- |" +
      (" --- | --- |" if with9 else ""))
for k, t01, t1, t3, beta, alpha, t9, alpha9 in rows:
    flag = " ⚠" if alpha > max(beta + 0.25, 1.0) else ""
    cell9 = ""
    if with9:
        if t9 is not None:
            f9 = " ⚠" if alpha9 > 1.1 else ""
            cell9 = f" {t9:.2f} | {alpha9:.2f}{f9} |"
        else:
            cell9 = " — | — |"
    print(f"| {k} | {t01:.2f} | {t1:.2f} | {t3:.2f} "
          f"| {beta:.2f} | {alpha:.2f}{flag} |{cell9}")
print()
print("α ⚠ flags keys accelerating past sf1 (α > max(β+0.25, 1)) — "
      "sub-second keys carry JVM-floor noise; judge those by seconds, "
      "not exponents. α(3→9) ⚠ flags > 1.1 at the 90x spot point.")
