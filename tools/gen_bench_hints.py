#!/usr/bin/env python3
"""Regenerate tools/bench_hints.json from the committed per-round bench
tables: per-query expected seconds = the element-wise MIN across the given
tables (min de-noises ambient-load inflation; these are planning hints for
Bench's thin-by-default packing and pair-leg watchdog caps, not grades).
Keys:  "<query>"       expected solo-ish seconds at sf0.1
       "<query>@sf1"   expected seconds at the 10x dataset (pair leg)
Usage: python3 tools/gen_bench_hints.py bench_results_r13.json bench_results_r14.json
"""
import json, sys

hints = {}
def fold(name, v):
    if v is None or v < 0: return
    hints[name] = round(min(hints.get(name, float("inf")), v), 3)

for path in sys.argv[1:]:
    d = json.load(open(path))
    for n, v in d.get("queries", {}).items():
        fold(n, v)
    sf1 = d.get("sf1", {})
    for n, v in sf1.get("queries", {}).items():
        fold(n + "@sf1", v)
    for n, v in sf1.get("basePaired", {}).items():
        fold(n, v)

json.dump(dict(sorted(hints.items())), open("tools/bench_hints.json", "w"),
          indent=0, separators=(",", ":"))
print(f"wrote tools/bench_hints.json with {len(hints)} entries")
