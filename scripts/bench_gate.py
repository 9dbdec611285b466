#!/usr/bin/env python3
"""Bench regression gate keyed on per-query TASK time.

Wall-clock on a shared host is dominated by co-tenant load (a 2.5x
"regression" in round 7 was pure noise); summed task time is stable
because it counts CPU actually spent in this process's tasks. This
gate diffs `task_time_queries` between two BENCH_DETAIL.json files
with a relative noise band plus an absolute floor, and reports wall
only as a secondary signal.

Usage:
  python3 scripts/bench_gate.py OLD_DETAIL.json NEW_DETAIL.json \
      [--band 0.40] [--min-sec 0.75]

Exit 0 = no task-time regression outside the band; 1 = regressions.
"""
import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--band", type=float, default=0.40,
                    help="relative tolerance (default 40%%)")
    ap.add_argument("--min-sec", type=float, default=0.75,
                    help="absolute delta floor in task-seconds")
    args = ap.parse_args()

    old = json.load(open(args.old))
    new = json.load(open(args.new))
    old_q = old.get("task_time_queries") or {}
    new_q = new.get("task_time_queries") or {}
    if not old_q or not new_q:
        print("bench_gate: missing task_time_queries; cannot gate "
              "(fall back to manual review)")
        return 0

    regressions, improved, added = [], [], []
    for name, t_new in sorted(new_q.items()):
        t_old = old_q.get(name)
        if t_old is None:
            added.append((name, t_new))
            continue
        if t_new > t_old * (1 + args.band) and t_new - t_old > args.min_sec:
            regressions.append((name, t_old, t_new))
        elif t_old > t_new * (1 + args.band) and t_old - t_new > args.min_sec:
            improved.append((name, t_old, t_new))

    removed = sorted(set(old_q) - set(new_q))

    def fmt(t):
        return f"{t:7.2f}s"

    print(f"task-time total: {sum(old_q.values()):.1f}s -> "
          f"{sum(new_q.values()):.1f}s  "
          f"(wall: {old.get('value', '?')} -> {new.get('value', '?')}, "
          f"secondary signal only)")
    for name, t in added:
        print(f"  NEW       {name}: {fmt(t)}")
    for name in removed:
        print(f"  REMOVED   {name}")
    for name, t0, t1 in improved:
        print(f"  improved  {name}: {fmt(t0)} -> {fmt(t1)}")
    for name, t0, t1 in regressions:
        print(f"  REGRESSED {name}: {fmt(t0)} -> {fmt(t1)}  "
              f"(+{(t1 / t0 - 1) * 100:.0f}%)")

    if regressions:
        print(f"bench_gate: {len(regressions)} task-time regression(s) "
              f"outside the {args.band:.0%}+{args.min_sec}s band")
        return 1
    print("bench_gate: no task-time regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
