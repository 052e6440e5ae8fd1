#!/usr/bin/env python3
"""Merge several BENCH.json artifacts into one best-of-medians artifact
for the BASELINE.md table (the protocol takes the per-key minimum of
the per-run medians: co-tenant load only ever inflates timings, so the
minimum across idle runs is the idle truth).

Usage: python3 scripts/merge_bench.py out.json run1.json run2.json ...
Then:  python3 scripts/gen_baseline.py out.json
"""
import json
import sys

out_path, runs = sys.argv[1], sys.argv[2:]
arts = [json.load(open(p)) for p in runs]
keys = sorted({k for a in arts for k in a["queries"]})
merged = {
    # Bench.scala writes metric "total" — keep that as the fallback too
    "metric": arts[0].get("metric", "total"),
    "unit": "sec",
    "sf": arts[0].get("sf"),
    "queries": {},
    "source_runs": {},
    "loadavg": {f"run{i+1}": a.get("loadavg") for i, a in enumerate(arts)},
    "errors": {},
}
for i, a in enumerate(arts):
    for k, v in a.get("errors", {}).items():
        if k in merged["errors"] and merged["errors"][k] != v:
            print(f"WARNING: error for '{k}' differs across runs; "
                  f"keeping the first ({runs[i]} overridden)")
        else:
            merged["errors"][k] = v
for k in keys:
    medians = [(a["queries"][k], i) for i, a in enumerate(arts)
               if k in a["queries"]]
    best, src = min(medians)
    merged["queries"][k] = best
    merged["source_runs"][k] = runs[src]
merged["value"] = sum(merged["queries"].values())
json.dump(merged, open(out_path, "w"), indent=1)
print(f"{out_path}: {len(keys)} keys, total {merged['value']:.1f}s "
      f"from {len(runs)} runs")
missing = [k for k in keys if any(k not in a["queries"] for a in arts)]
if missing:
    print(f"WARNING: keys absent from some runs: {missing}")
