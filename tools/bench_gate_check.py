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
    # FLOOR ERA (BASELINE.md r18): the r17 box step change persisted a
    # second round (r18 vs the r13-r17 floors: median 1.72x, 70 entries
    # over 2x, ALL in code untouched this round; MiniBench isolated
    # receipts on the same day land 1.5-2x over the old floors with 2x
    # swings BETWEEN runs of one JVM) — the old-box floors are not
    # reachable on this box generation, so per the judge-prescribed
    # re-base the floor era starts at r18. Pre-era gates stay committed
    # as the fast-box historical record; lower a future fast box's
    # numbers will re-enter the floor set naturally as new gates land.
    FLOOR_BASE_ROUND = 18
    gates = [g for g in gates
             if int(re.search(r"r(\d+)", g).group(1)) >= FLOOR_BASE_ROUND]
    if not gates:
        sys.exit("no committed BENCH_GATE_r*.json found in the floor era "
                 f"(>= r{FLOOR_BASE_ROUND})")
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
    med = (f"{sorted(r[0] for r in rows)[len(rows)//2]:.2f}x"
           if rows else "n/a (no prior era gate)")
    print(f"comparable: {len(rows)}  first-line: {len(fresh)}  "
          f"median ratio: {med}  breaches(>2x): {len(breaches)}")
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
