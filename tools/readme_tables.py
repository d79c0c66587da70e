#!/usr/bin/env python3
"""Regenerate README.md's decade-scale ratio tables from the committed
bench artifacts (BENCH-sf0.1-same-code.json / BENCH-sf1ish.json /
BENCH-sf10ish.json). Replaces the top-N and full <details> tables and
the totals sentences in both "## Scale:" sections in place."""
import json, re

def effective(v):
    """Self-healed entries (tools/selfheal.py) read at their "gate"
    value — min(in_sweep, standalone); pre-r17 entries carry only the
    standalone — the same lens as check.py's gate."""
    return v.get("gate", v["standalone"]) if isinstance(v, dict) else v

def load(p):
    d = json.load(open(p))
    return {k: effective(v) for k, v in d["queries"].items()
            if effective(v) > 0}

def table(qa, qb, names):
    rows = ["| query | before (s) | after (s) | ratio |", "|---|---|---|---|"]
    for q in names:
        rows.append(f"| {q} | {qa[q]:.2f} | {qb[q]:.2f} | {qb[q]/qa[q]:.1f}x |")
    return "\n".join(rows)

a = load("BENCH-sf0.1-same-code.json")
b = load("BENCH-sf1ish.json")
c = load("BENCH-sf10ish.json")

readme = open("README.md").read()

def must(m, what, heading):
    # fail NAMING the missing anchor, not with AttributeError on None
    assert m is not None, (
        f"README anchor not found: {what} under section {heading!r} — "
        "the section heading or table format drifted; fix README or this script")
    return m

def replace_section(readme, qa, qb, heading, top_n):
    shared = [q for q in qb if q in qa]
    ta, tb = sum(qa[q] for q in shared), sum(qb[q] for q in shared)
    by_ratio = sorted(shared, key=lambda q: -(qb[q] / qa[q]))
    top = [q for q in by_ratio if qb[q] >= 0.3][:top_n]
    full = sorted(shared, key=lambda q: -(qb[q] / qa[q]))
    # section spans from heading to the </details> that closes its full table
    assert heading in readme, f"README section heading not found: {heading!r}"
    start = readme.index(heading)
    assert "</details>" in readme[start:], f"no </details> closing {heading!r}"
    end = readme.index("</details>", start) + len("</details>")
    sec = readme[start:end]
    # totals sentence: the bold "**...**" line pair
    totals = r"\*\*10x the data costs [^*]+\*\*\s*\([^)]+\)"
    must(re.search(totals, sec), "totals sentence '**10x the data costs ...**'",
         heading)
    sec = re.sub(totals,
                 f"**10x the data costs {tb/ta:.2f}x the wall-clock** "
                 f"({ta:.1f} s -> {tb:.1f} s across all {len(shared)} shared queries)",
                 sec, count=1)
    # top table: first "| query |" table up to blank line
    m = must(re.search(r"\| query \| before[^\n]*\n\|---\|[^\n]*\n(?:\|[^\n]*\n)+", sec),
             "top '| query | before ...' table", heading)
    sec = sec[:m.start()] + table(qa, qb, top) + "\n" + sec[m.end():]
    # full table inside <details>
    m = must(re.search(r"(<details>.*?\n\n)(\| query \| before[^\n]*\n\|---\|[^\n]*\n(?:\|[^\n]*\n)+)",
                       sec, re.S),
             "full '| query | before ...' table inside <details>", heading)
    sec = sec[:m.start(2)] + table(qa, qb, full) + "\n" + sec[m.end(2):]
    return readme[:start] + sec + readme[end:]

readme = replace_section(readme, a, b, "## Scale: 10x bench (sf1ish)", 12)
readme = replace_section(readme, b, c, "## Scale: 100x decade (sf10ish)", 20)
open("README.md", "w").write(readme)
print("rewrote README tables")
