#!/usr/bin/env python3
"""Dev-only harness (NOT part of the shipped library): the mechanical
bench-gate comparison (r16 verdict #8) — stop hand-triaging the
~1.2-1.3x box-drift band every round.

Every committed BENCH_GATE_r*.json is a warm min-of-3 full-sweep record
from the same harness, so the per-entry MIN across prior gates is the
best-known warm capability measured like-for-like ("the floor"). This
tool compares a candidate gate record (default: target/bench_latest.json)
against that floor and prints:

  - entries over the 2x gate vs the floor  -> exit 1 (a real breach)
  - the top-N ratios under 2x              -> the drift band, visible
    but NOT triage-worthy by policy: anything <= 2x vs the floor is
    box/interleave drift unless code for that entry changed this round
  - first-line entries (no prior gate has them)

Usage: python3 tools/bench_gate_check.py [candidate.json] [--top N]
"""
import glob
import json
import os
import re
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = d.get("queries") or {}
    return {k: v for k, v in qs.items() if isinstance(v, (int, float)) and v >= 0}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 10
    for i, a in enumerate(sys.argv[1:]):
        if a == "--top":
            top = int(sys.argv[1:][i + 1])
    cand_path = args[0] if args else "target/bench_latest.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gates = sorted(glob.glob(os.path.join(repo, "BENCH_GATE_r*.json")),
                   key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    if not gates:
        sys.exit("no committed BENCH_GATE_r*.json found")
    floor = {}
    for g in gates:
        if os.path.abspath(g) == os.path.abspath(cand_path):
            continue  # the candidate must not set its own floor
        for k, v in load(g).items():
            floor[k] = min(floor.get(k, v), v)
    cand = load(cand_path)
    rows = []
    fresh = []
    for k, v in sorted(cand.items()):
        if k in floor and floor[k] > 0:
            rows.append((v / floor[k], k, v, floor[k]))
        else:
            fresh.append((k, v))
    rows.sort(reverse=True)
    breaches = [r for r in rows if r[0] > 2.0]
    print(f"candidate: {cand_path} ({len(cand)} entries)")
    print(f"floors from: {', '.join(os.path.basename(g) for g in gates)}")
    print(f"comparable: {len(rows)}  first-line: {len(fresh)}  "
          f"median ratio: {sorted(r[0] for r in rows)[len(rows)//2]:.2f}x  "
          f"breaches(>2x): {len(breaches)}")
    if breaches:
        print("\nBREACHES (over 2x the like-for-like floor — investigate):")
        for r, k, v, f in breaches:
            print(f"  {k:45s} {v:7.2f}s  floor {f:7.2f}s  {r:5.2f}x")
    print(f"\ntop {top} ratios under the gate (drift band — no triage unless "
          f"the entry's code changed):")
    for r, k, v, f in [x for x in rows if x[0] <= 2.0][:top]:
        print(f"  {k:45s} {v:7.2f}s  floor {f:7.2f}s  {r:5.2f}x")
    if fresh:
        print("\nfirst lines (floor set next round):")
        for k, v in fresh:
            print(f"  {k:45s} {v:7.2f}s")
    sys.exit(1 if breaches else 0)


if __name__ == "__main__":
    main()
