#!/usr/bin/env python3
"""Merge BENCH_SELF-format floor records: per-query MIN across sweeps,
runs summed, fingerprint taken from the newest record (they must match —
a fingerprint mismatch across merged sweeps is an error, since floors
from different testdata are not comparable). Inputs must each be
COMPLETE sweeps (complete:true): a truncated record carries floors from
fewer passes than its presence in merged_sweeps would imply, so merging
one would stamp a full-sweep claim on partial data — refused, mirroring
the fingerprint guard.

Usage: merge_floors.py out.json in1.json in2.json [...]
"""
import json, sys

out, ins = sys.argv[1], sys.argv[2:]
recs = [json.load(open(p)) for p in ins]
for p, r in zip(ins, recs):
    if r.get("complete") is not True:
        sys.exit(f"{p} has complete={r.get('complete')!r} — refusing to merge a "
                 "truncated sweep into a full-sweep floor record")
fps = [r.get("fingerprint") for r in recs if r.get("fingerprint")]
for fp in fps[1:]:
    if fp != fps[0]:
        sys.exit("fingerprint mismatch across sweeps — refusing to merge")
queries, cold, runs = {}, {}, {}
for r in recs:
    for k, v in r["queries"].items():
        if k not in queries or v < queries[k]:
            queries[k] = v
        runs[k] = runs.get(k, 0) + r.get("runs", {}).get(k, 1)
        # best (lowest) post-warm-up first-run across sweeps — kept so a
        # merged record still carries the cold/floor split per query
        c = r.get("cold", {}).get(k)
        if c is not None and (k not in cold or c < cold[k]):
            cold[k] = c
merged = {
    "metric": "total", "value": round(sum(queries.values()), 3), "unit": "sec",
    "queries": dict(sorted(queries.items())), "runs": dict(sorted(runs.items())),
    "sf": recs[-1].get("sf"), "fingerprint": fps[0] if fps else None,
    "merged_sweeps": len(recs), "complete": True,
}
if cold:
    merged["cold"] = dict(sorted(cold.items()))
json.dump(merged, open(out, "w"), separators=(",", ":"))
print(f"merged {len(recs)} sweeps, {len(queries)} queries, "
      f"floor-sum {merged['value']} s -> {out}")
