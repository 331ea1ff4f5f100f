#!/usr/bin/env python3
"""Summarize a reps=3 bench record for BASELINE.md promotion: headline
numbers plus the mover audit vs the r10 quiet record and the r12 274-key
quiet record (the r11 verdict directive's comparison points)."""
import json
import sys

rec = sys.argv[1] if len(sys.argv) > 1 else "tools/bench_r12_reps3_293.json"
d = json.loads(open(rec).readline())
q = d["queries"]
n = len(q)
tot = d["value"]
print(f"record: {rec}")
print(f"n_queries={n} total={tot:.1f}s per_query={tot/n:.3f}s "
      f"steal_sec={d.get('steal_sec')} gc_sec={d.get('gc_sec')} "
      f"retries={d.get('retries_used')}")
mx = max(q.items(), key=lambda kv: kv[1])
print(f"max median: {mx[0]} {mx[1]:.2f}s  (3s gate headroom "
      f"{(1 - mx[1] / 3) * 100:.0f}%)")
for base, name in [("tools/bench_r10_reps3_final.json", "r10-final"),
                   ("tools/bench_r12_reps3_final.json", "r12-274")]:
    try:
        p = json.loads([l for l in open(base) if l.strip()][0])["queries"]
    except Exception:
        continue
    movers = [(k, p[k], v, v / p[k]) for k, v in q.items()
              if k in p and p[k] > 0.05 and v / p[k] > 1.5]
    movers.sort(key=lambda m: -m[3])
    print(f"\nmovers >1.5x vs {name} ({len(movers)}):")
    for k, a, b, r in movers[:12]:
        print(f"  {k}: {a:.3f} -> {b:.3f}  ({r:.2f}x)")
