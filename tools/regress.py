#!/usr/bin/env python3
"""Per-query bench regression gate.

Usage: python3 tools/regress.py <old_bench_full.json> <new_bench_full.json> [ratio]

Compares warm per-query times between two `graft.Bench` full dumps and
reports queries slower than `ratio` (default 1.5x) in the new run,
ignoring queries under a 0.3 s floor (scheduling noise dominates there).
Exit 1 if any regression is found, so it can gate a commit:

    SPARK_GRAFT_BENCH_OUT=/tmp/b.json sbt "runMain graft.Bench"
    python3 tools/regress.py bench_full.json /tmp/b.json
"""
import json
import sys


def main(old_path, new_path, ratio=1.5, floor=0.3):
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    bad = []
    for q in sorted(set(old) & set(new)):
        o, n = old[q], new[q]
        if n >= floor and o > 0 and n / o >= ratio:
            bad.append((q, o, n, n / o))
    if added:
        print(f"new queries (no baseline): {', '.join(added)}")
    if removed:
        print(f"dropped queries: {', '.join(removed)}")
    if not bad:
        print(f"OK: no query regressed >= {ratio}x (floor {floor}s, "
              f"{len(set(old) & set(new))} compared)")
        return 0
    print(f"REGRESSIONS (>= {ratio}x, floor {floor}s):")
    for q, o, n, r in sorted(bad, key=lambda t: -t[3]):
        print(f"  {q}: {o:.2f}s -> {n:.2f}s ({r:.1f}x)")
    return 1


if __name__ == "__main__":
    rat = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], rat))
