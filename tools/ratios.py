#!/usr/bin/env python3
"""Emit the README scale-ratio table from two bench JSON artifacts.

Usage: python3 tools/ratios.py BENCH-sf1ish.json BENCH-sf10ish.json [topN]

Prints a markdown table of per-query times and ratios sorted by the
second artifact's cost, plus the totals line. A ratio is only printed
when both artifacts carry the query.
"""
import json
import sys


def effective(v):
    """Gate value of one query entry: self-healed entries (dicts written
    by tools/selfheal.py) are read at their "gate" value —
    min(in_sweep, standalone); pre-r17 entries carry only the
    standalone — the same lens as check.py's gate."""
    return v.get("gate", v["standalone"]) if isinstance(v, dict) else v


a_path, b_path = sys.argv[1], sys.argv[2]
top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25

with open(a_path) as f:
    a = json.load(f)
with open(b_path) as f:
    b = json.load(f)

qa = {q: effective(v) for q, v in a["queries"].items()}
qb = {q: effective(v) for q, v in b["queries"].items()}
shared = [q for q in qb if q in qa and qa[q] > 0 and qb[q] > 0]
rows = sorted(shared, key=lambda q: -qb[q])

ta = sum(qa[q] for q in shared)
tb = sum(qb[q] for q in shared)
print(f"total over {len(shared)} shared queries: "
      f"{ta:.1f} s -> {tb:.1f} s ({tb / ta:.2f}x)")
print()
print("| query | a (s) | b (s) | ratio |")
print("|---|---|---|---|")
for q in rows[:top_n]:
    print(f"| {q} | {qa[q]:.2f} | {qb[q]:.2f} | {qb[q] / qa[q]:.1f}x |")
worst = max(shared, key=lambda q: qb[q] / qa[q])
print()
print(f"worst ratio: {worst} {qb[worst] / qa[worst]:.1f}x "
      f"({qa[worst]:.2f} -> {qb[worst]:.2f} s)")
