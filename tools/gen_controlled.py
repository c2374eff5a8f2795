#!/usr/bin/env python3
"""Regenerate Bench.controlledSec from controlled close pairs.

Usage: gen_controlled.py r20_run1.json r20_run2.json [r19_run1.json r19_run2.json]

Value per query = min over the r20 close pair; for queries NOT touched
this round (plan unchanged), the min additionally folds in the r19
close pair when that is lower (more controlled runs = a tighter
controlled floor). Touched queries take the r20 pair alone — their r19
readings measured a different plan. Prints the Scala Map literal body
to splice into Bench.scala.
"""
import json, sys

# plan/staging changed THIS round — prior-round readings not comparable.
# REBUILD PER ROUND to contain ONLY queries whose plan changed since the
# readings being folded in (the r21 ADVICE low: stale prior-round names
# left in this set exclude valid lower readings and inflate the floors).
# r22 set: the corrections pair (cut-then-sort restored an enforced
# Sort) — everything else this round is measurement-harness or
# confirmed/reverted-in-place work whose plans match the r21 close pair.
TOUCHED = {"q_corrections", "q_corrections_geo"}

def load(p):
    """Per-query best of (original, successful retry): a retry is a
    same-session controlled re-measurement (the r21 host ran hot, so
    many originals carry a transient window the retry escaped)."""
    d = json.load(open(p))
    q = dict(d["queries"])
    for k, v in d.get("retries", {}).items():
        if v > 0 and v < q.get(k, float("inf")):
            q[k] = v
    return q

runs = [load(p) for p in sys.argv[1:]]
r20 = runs[:2]
r19 = runs[2:]

# union of BOTH current-round runs (the r20 ADVICE fix: sorted(r20[0])
# silently dropped any query present only in the second run)
names = sorted(set().union(*[set(r) for r in r20]))
vals = {}
for n in names:
    v = min(r[n] for r in r20 if n in r)
    if n not in TOUCHED and r19:
        v = min([v] + [r[n] for r in r19 if n in r])
    vals[n] = round(v, 2)

# emit Scala pairs, 2 per line like the existing literal
items = [f'"{n}" -> {vals[n]}' for n in names]
lines, cur = [], "    "
for it in items:
    if len(cur) + len(it) + 2 > 76 and cur.strip():
        lines.append(cur.rstrip())
        cur = "    "
    cur += it + ", "
lines.append(cur.rstrip().rstrip(","))
print("\n".join(lines))
