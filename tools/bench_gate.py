#!/usr/bin/env python3
"""Bench regression gate (builder-side only, NOT shipped library code).

Parses the blessed per-query baselines out of BASELINE.md and gates a
graft.Bench JSON record (bench_out.json, or a log containing the JSON
line) row by row, per the BASELINE.md protocol:

- a query trips at warm > 1.5x its baseline AND > 0.5s absolute
  (sub-second entries are scheduler-noise-dominated; see BASELINE.md);
- ALWAYS parse the record's queries{} map — the line's tail interleaves
  the COLD map after warm, and eyeballing it has produced repeated
  phantom "13x" scares;
- trips in a run launched at load > ~1.5 are usually hypervisor steal:
  re-measure each suspect isolated (--only) before believing it.

Baseline extraction: 2-column rows take the 2nd cell, 4-column rows the
LAST cell (the blessed value). Rows whose blessed cell carries re-bless
prose (e.g. "3.99 (re-blessed r13 ...)") take the leading float of that
cell. A row appearing in several tables keeps the LAST parsed value.

Usage: python3 tools/bench_gate.py [bench_out.json | bench log]
"""
import json, re, sys

base = {}
for line in open('BASELINE.md'):
    cells = [c.strip() for c in line.strip().strip('|').split('|')]
    if len(cells) < 2 or not re.fullmatch(r'[a-z0-9_]+', cells[0]):
        continue
    m = re.match(r'([0-9]+\.[0-9]+)', cells[-1]) or re.match(r'([0-9]+\.[0-9]+)', cells[1])
    if m:
        base[cells[0]] = float(m.group(1))

txt = open(sys.argv[1] if len(sys.argv) > 1 else 'bench_out.json').read()
d = json.loads(re.search(r'\{"queries":.*"sf":"[^"]*"\}', txt).group(0))
q = d['queries']
print(f"entries={len(q)} warm_total={d['warm_total']:.1f} errors={d['n_errors']} commit={d.get('commit','?')[:9]}")

missing = sorted(k for k in q if k not in base)
env = tot = 0.0
trips = []
for k, v in sorted(q.items(), key=lambda kv: -kv[1]):
    b = base.get(k)
    if b is None:
        continue
    env += b
    tot += v
    if v / b > 1.5 and v > 0.5:
        trips.append((k, v, b, v / b))
print(f"envelope={env:.1f}s run(baselined)={tot:.1f}s ratio={tot/env:.3f}")
if missing:
    print(f"no-baseline entries (bless from a controlled --only run): {missing}")
print(f"trips (>1.5x & >0.5s): {len(trips)}")
for k, v, b, r in trips:
    print(f"  {k}: {v:.2f} vs {b:.2f} = {r:.2f}x  -> re-measure isolated before believing")
