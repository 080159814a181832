#!/usr/bin/env python3
"""Compare a BENCH_SELF-format floor record against an anchor record
(default BASELINE_FLOOR.json) — the round's perf adjudication in one
mechanical step.

The anchor embeds the testdata fingerprint it was measured on. If the
fingerprints MATCH, every ratio is a real code-vs-code comparison; if
they DIFFER, scan-bound floors are expected to move and any "regression"
must first be re-anchored (see docs/diagnostics.md, floor-hygiene
protocol). This script prints which case applies, then the per-query
ratio table: new gates (no anchor entry), retired gates, and every gate
whose floor moved beyond the drift band (default 1.5x either way).

Usage: compare_floors.py current.json [anchor.json] [--band 1.5]
"""
import json, sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
band = 1.5
for a in sys.argv[1:]:
    if a.startswith("--band"):
        band = float(a.split("=", 1)[1]) if "=" in a else band
cur_p = args[0]
anc_p = args[1] if len(args) > 1 else "BASELINE_FLOOR.json"
cur, anc = json.load(open(cur_p)), json.load(open(anc_p))

fp_match = cur.get("fingerprint") == anc.get("fingerprint")
print(f"fingerprint match: {fp_match} "
      f"({'code-vs-code ratios' if fp_match else 'testdata changed — re-anchor before calling regressions'})")

cq, aq = cur["queries"], anc["queries"]
new = sorted(set(cq) - set(aq))
gone = sorted(set(aq) - set(cq))
if new:
    print(f"new gates ({len(new)}): " + ", ".join(f"{k}={cq[k]:.3f}s" for k in new))
if gone:
    print(f"retired gates ({len(gone)}): " + ", ".join(gone))

common = sorted(set(cq) & set(aq))
ratios = {k: (cq[k] / aq[k] if aq[k] > 0 else float("inf")) for k in common}
med = sorted(ratios.values())[len(ratios) // 2] if ratios else float("nan")
print(f"common gates: {len(common)}  median ratio: {med:.3f}  "
      f"floor-sum: {sum(cq[k] for k in common):.1f}s vs {sum(aq[k] for k in common):.1f}s")
worse = [(k, r) for k, r in ratios.items() if r > band]
better = [(k, r) for k, r in ratios.items() if r < 1.0 / band]
for title, rows in (("slower than band", sorted(worse, key=lambda x: -x[1])),
                    ("faster than band", sorted(better, key=lambda x: x[1]))):
    print(f"{title} ({len(rows)}):")
    for k, r in rows:
        runs = cur.get("runs", {}).get(k, "?")
        print(f"  {k:18s} {aq[k]:8.3f}s -> {cq[k]:8.3f}s  {r:6.2f}x  runs={runs}")
