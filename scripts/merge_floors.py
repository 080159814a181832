#!/usr/bin/env python3
"""Merge BENCH_SELF-format floor records: per-query MIN across sweeps,
runs summed, fingerprint taken from the newest record (they must match —
a fingerprint mismatch across merged sweeps is an error, since floors
from different testdata are not comparable).

Usage: merge_floors.py out.json in1.json in2.json [...]
"""
import json, sys

out, ins = sys.argv[1], sys.argv[2:]
recs = [json.load(open(p)) for p in ins]
fps = [r.get("fingerprint") for r in recs if r.get("fingerprint")]
for fp in fps[1:]:
    if fp != fps[0]:
        sys.exit("fingerprint mismatch across sweeps — refusing to merge")
queries, runs = {}, {}
for r in recs:
    for k, v in r["queries"].items():
        if k not in queries or v < queries[k]:
            queries[k] = v
        runs[k] = runs.get(k, 0) + r.get("runs", {}).get(k, 1)
merged = {
    "metric": "total", "value": round(sum(queries.values()), 3), "unit": "sec",
    "queries": dict(sorted(queries.items())), "runs": dict(sorted(runs.items())),
    "sf": recs[-1].get("sf"), "fingerprint": fps[0] if fps else None,
    "merged_sweeps": len(recs), "complete": True,
}
json.dump(merged, open(out, "w"), separators=(",", ":"))
print(f"merged {len(recs)} sweeps, {len(queries)} queries, "
      f"floor-sum {merged['value']} s -> {out}")
