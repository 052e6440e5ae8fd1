#!/usr/bin/env python3
"""Per-key sf1 oracle sweep (round 14, verdict #3): widen the sf1
hash-compare list from ~20 keys toward the full scale set, running
each key's DuckDB oracle in its OWN subprocess with a timeout so one
key's resource ceiling (e.g. graph_kcore's unrolled induced-subgraph
derivation spilling DuckDB) cannot take down the sweep.

Usage: python3 scripts/sf1_sweep.py <verify_out_dir> <sf_dir> \
           [timeout_sec] [key ...]
Defaults: timeout 600 s, keys = every dumped result dir.
Writes <verify_out_dir>/sweep_results.json and prints a summary.
Exit 1 only on FAIL (wrong answer); TIMEOUT/OOM are recorded as
resource ceilings, not correctness failures.
"""
import glob
import json
import os
import shutil
import subprocess
import sys
import time


def main():
    out, sf = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    keys = sys.argv[4:]
    if not keys:
        oracles = set(json.load(open(f"{out}/oracle_sql.json")))
        keys = sorted(d.rstrip("/").split("/")[-1]
                      for d in glob.glob(f"{out}/*/")
                      if d.rstrip("/").split("/")[-1] in oracles)
    results = {}
    for k in keys:
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, "scripts/localcheck.py", out, sf, k],
                capture_output=True, text=True, timeout=timeout)
            dt = time.time() - t0
            line = (p.stdout.strip().splitlines() or ["<no output>"])[-1]
            if p.returncode == 0:
                results[k] = {"status": "OK", "sec": round(dt, 1)}
            elif "MemoryError" in p.stderr or "Out of Memory" in p.stderr \
                    or "OutOfMemory" in p.stderr:
                results[k] = {"status": "OOM", "sec": round(dt, 1),
                              "note": "DuckDB resource ceiling"}
            else:
                results[k] = {"status": "FAIL", "sec": round(dt, 1),
                              "detail": line,
                              "stderr": p.stderr.strip()[-400:]}
        except subprocess.TimeoutExpired:
            results[k] = {"status": "TIMEOUT", "sec": timeout,
                          "note": "oracle exceeded sweep timeout"}
        # DuckDB leaves a .tmp spill dir in the repo on failure
        shutil.rmtree(".tmp", ignore_errors=True)
        r = results[k]
        print(f"{k:24s} {r['status']:8s} {r['sec']:7.1f}s "
              f"{r.get('detail', '')}", flush=True)
    with open(f"{out}/sweep_results.json", "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    n = len(results)
    ok = sum(1 for r in results.values() if r["status"] == "OK")
    fail = sum(1 for r in results.values() if r["status"] == "FAIL")
    ceil = n - ok - fail
    print(f"\n{ok}/{n} OK, {fail} FAIL, {ceil} resource-ceiling")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
