#!/usr/bin/env python3
"""Per-query regression diff between two full bench JSONs
(bench_rNN_full.json — written by graft.Bench, archived per round).

Usage: bench_diff.py <old.json> <new.json> [ratio] [abs_sec]

Flags queries whose time grew by BOTH more than `ratio` (default 1.5x)
AND more than `abs_sec` (default 0.5 s) — the same
noise-tolerant criterion the round judges apply. Also reports the
aggregate on the common-query set, plus queries added/removed.
"""
import json
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    abs_sec = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    so, sn = sum(old[q] for q in common), sum(new[q] for q in common)
    print(f"common queries: {len(common)}  "
          f"old {so:.2f}s -> new {sn:.2f}s  ({sn / so:.2f}x)")
    if added:
        print(f"added ({len(added)}): "
              + ", ".join(f"{q}={new[q]:.2f}s" for q in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    regressions = [
        (q, old[q], new[q]) for q in common
        if new[q] > old[q] * ratio and new[q] - old[q] > abs_sec
    ]
    regressions.sort(key=lambda t: t[2] - t[1], reverse=True)
    if regressions:
        print(f"\nregressions (> {ratio}x and > +{abs_sec}s):")
        for q, a, b in regressions:
            print(f"  {q}: {a:.2f}s -> {b:.2f}s ({b / a:.2f}x, +{b - a:.2f}s)")
    else:
        print(f"\nno per-query regression past {ratio}x and +{abs_sec}s")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
