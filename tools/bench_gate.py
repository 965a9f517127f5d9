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

Self-checks (r15, after the star_roundtrip/table_stats drift incident):
- if ANY cell of a row carries a "re-bless" marker, the blessed value
  MUST come from the cell carrying the marker — a re-bless edited into
  the wrong column aborts the gate instead of silently gating stale;
- a blessed cell that fails to parse as a float is a loud warning (with
  the cells[1] fallback named), never a silent substitution.

Usage: python3 tools/bench_gate.py [bench_out.json | bench log]
       python3 tools/bench_gate.py --selftest
"""
import json, re, sys

FLOAT = re.compile(r'([0-9]+\.[0-9]+)')

base = {}
errors = []
for line in open('BASELINE.md'):
    cells = [c.strip() for c in line.strip().strip('|').split('|')]
    if len(cells) < 2 or not re.fullmatch(r'[a-z0-9_]+', cells[0]):
        continue
    name = cells[0]
    reblessed = [i for i, c in enumerate(cells[1:], 1) if 're-bless' in c.lower()]
    m = FLOAT.match(cells[-1])
    if reblessed and (len(cells) - 1) not in reblessed:
        errors.append(f"{name}: re-bless marker in column {reblessed[0]} but the "
                      f"blessed (last) cell is '{cells[-1][:40]}' — move the "
                      f"re-blessed value into the blessed cell")
        continue
    if not m:
        m = FLOAT.match(cells[1])
        if m:
            print(f"WARNING: {name}: blessed (last) cell '{cells[-1][:40]}' is not "
                  f"a float; falling back to cells[1]={m.group(1)} — fix the row",
                  file=sys.stderr)
    if m:
        base[name] = float(m.group(1))

if errors:
    for e in errors:
        print(f"BASELINE.md DRIFT: {e}", file=sys.stderr)
    sys.exit(2)

if len(sys.argv) > 1 and sys.argv[1] == '--selftest':
    # Phantom-pass regression test for the r14 drift incident: under the
    # stale blessed cells (star_roundtrip 24.638, table_stats 2.591) a
    # 10.0s star_roundtrip would have passed silently. With the corrected
    # cells both must trip at these values.
    #
    # MAINTENANCE CONTRACT: the true_b constants below are pinned to the
    # CURRENT blessed cells of these two BASELINE.md rows. A legitimate
    # re-bless of either row MUST update its constant in the same commit
    # — a selftest failure after a re-bless is this contract firing, not
    # noise; never ship with it red.
    ok = True
    for name, stale, true_b, probe in [('star_roundtrip', 24.638, 4.63, 10.0),
                                       ('table_stats', 2.591, 3.99, 7.0)]:
        b = base.get(name)
        if b is None or abs(b - true_b) > 1e-9:
            print(f"SELFTEST FAIL: {name} blessed={b}, expected {true_b}")
            ok = False
        elif not (probe / b > 1.5 and probe > 0.5):
            print(f"SELFTEST FAIL: {name} probe {probe} does not trip at blessed {b}")
            ok = False
        elif probe / stale > 1.5:
            print(f"SELFTEST NOTE: {name} probe {probe} would also trip stale {stale}")
    print("selftest " + ("PASS" if ok else "FAIL"))
    sys.exit(0 if ok else 1)

# A bench log may contain several JSON records (appended re-runs): parse
# per line and keep the LAST line that is a valid record — never a greedy
# cross-line regex span.
txt = open(sys.argv[1] if len(sys.argv) > 1 else 'bench_out.json').read()
d = None
for line in txt.splitlines():
    line = line.strip()
    start = line.find('{"queries":')
    if start < 0:
        continue
    try:
        # raw_decode tolerates trailing text after the record's closing
        # brace (a log line like 'INFO {...} done'), which json.loads on
        # the whole tail would reject (r15 ADVICE)
        cand, _ = json.JSONDecoder().raw_decode(line[start:])
    except ValueError:
        continue
    if isinstance(cand, dict) and 'queries' in cand:
        d = cand
if d is None:
    sys.exit("no parseable bench record line found in input")
q = d['queries']
print(f"entries={len(q)} warm_total={d['warm_total']:.1f} errors={d['n_errors']} commit={d.get('commit','?')[:9]}")

# Ambient-speed gauge (r18): graft.Bench stamps q1_pricing_summary's warm
# time vs its blessed baseline into the record. gfac > ~1.3 means the HOST
# was slow when the record was taken — raw trips in such a record are
# ambient until an isolated re-measure says otherwise; the normalized
# ratios below divide the gauge factor out. gfac is a floor of 1.0 for
# normalization: a faster-than-baseline host must not excuse real trips.
gfac = 1.0
g = d.get('gauge')
if g and g.get('q1', -1) > 0 and g.get('baseline', 0) > 0:
    raw_gfac = g['q1'] / g['baseline']
    gfac = max(1.0, raw_gfac)
    print(f"gauge: q1={g['q1']:.2f}s vs {g['baseline']:.3f} blessed = "
          f"{raw_gfac:.2f}x ambient ({'SLOW HOST — treat raw trips as suspect' if raw_gfac > 1.3 else 'clean window'})")
else:
    print("gauge: absent (pre-r18 record or gauge errored) — raw ratios only")

# Skew-trio gate (r19, VERDICT r18 item 7): the trio exists to prove an
# ORDERING (salted beats the plain hot-key SMJ, and beats-or-matches AQE's
# runtime split), and its absolutes redistribute under in-run contention
# every round (BASELINE.md r10 note). Gate the CLAIM from the same record:
# when salted < plain AND salted <= aqe hold, the trio's absolute times are
# exempt from the per-row trip list; when the claim breaks, that is the
# regression — flag it regardless of ratios.
SKEW_TRIO = ('skew_join_salted', 'skew_join_plain', 'skew_join_aqe')
skew_exempt = set()
if all(k in q and q[k] > 0 for k in SKEW_TRIO):
    sv, pv, av = (q[k] for k in SKEW_TRIO)
    claim = sv < pv and sv <= av
    print(f"skew-trio claim (salted < plain, salted <= aqe): "
          f"salted={sv:.2f} plain={pv:.2f} aqe={av:.2f} -> "
          + ("HOLDS — trio absolutes exempt from trips" if claim
             else "BROKEN — investigate salted_join regardless of ratios"))
    if claim:
        skew_exempt = set(SKEW_TRIO)

missing = sorted(k for k in q if k not in base)
env = tot = 0.0
trips = []
for k, v in sorted(q.items(), key=lambda kv: -kv[1]):
    b = base.get(k)
    if b is None:
        continue
    env += b
    tot += v
    if v / b > 1.5 and v > 0.5 and k not in skew_exempt:
        trips.append((k, v, b, v / b))
print(f"envelope={env:.1f}s run(baselined)={tot:.1f}s ratio={tot/env:.3f}"
      + (f" gauge-normalized={tot/env/gfac:.3f}" if gfac > 1.0 else ""))
if missing:
    print(f"no-baseline entries (bless from a controlled --only run): {missing}")
norm_trips = [(k, v, b, r) for k, v, b, r in trips if r / gfac > 1.5]
# The gauge is measured on one scan-bound query; contention hits shuffle-
# and cache-bound entries non-uniformly, so dividing every ratio by it can
# hide a real regression during a slow window. The normalized count is a
# LOWER BOUND on suspicion — advisory only, never grounds to skip the
# isolated re-measure of a raw trip (r18 ADVICE).
print(f"trips (>1.5x & >0.5s): {len(trips)} raw"
      + (f", {len(norm_trips)} gauge-normalized (advisory lower bound — "
         f"re-measure every RAW trip isolated)" if gfac > 1.0 else ""))
for k, v, b, r in trips:
    norm = f" (normalized {r/gfac:.2f}x)" if gfac > 1.0 else ""
    print(f"  {k}: {v:.2f} vs {b:.2f} = {r:.2f}x{norm}  -> re-measure isolated before believing")
