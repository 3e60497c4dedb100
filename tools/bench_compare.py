#!/usr/bin/env python3
"""Compare two bench detail artifacts (BENCH_DETAIL_rNN.json or
bench_history.jsonl lines): per-query median deltas, sorted by regression.

Usage:
  python3 tools/bench_compare.py BENCH_DETAIL_r07.json BENCH_DETAIL_r08.json
  python3 tools/bench_compare.py --threshold 1.5 old.json new.json

Queries present in only one file are listed separately (added/removed).
Both files must carry the per-query `queries` map the round-7+ bench
writes; medians make a >threshold move meaningful rather than JIT noise
(see Bench.scala's 3-sweep rationale).
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        text = f.read().strip()
    # history files hold one JSON object per line; take the last
    line = text.splitlines()[-1]
    d = json.loads(line)
    return d.get("queries", {}), d.get("value"), d.get("runs")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag ratio (new/old) above this (default 1.5)")
    ap.add_argument("--min-sec", type=float, default=0.2,
                    help="ignore queries faster than this in BOTH runs "
                         "(default 0.2 s — fixed overhead dominates there)")
    args = ap.parse_args()

    old_q, old_total, old_runs = load(args.old)
    new_q, new_total, new_runs = load(args.new)
    shared = sorted(set(old_q) & set(new_q))
    rows = []
    for name in shared:
        o, n = old_q[name], new_q[name]
        if max(o, n) < args.min_sec:
            continue
        rows.append((n / o if o > 0 else float("inf"), name, o, n))
    rows.sort(reverse=True)

    print(f"total: {old_total} s ({old_runs} runs) -> "
          f"{new_total} s ({new_runs} runs) on "
          f"{len(shared)} shared queries")
    flagged = [r for r in rows if r[0] >= args.threshold]
    improved = [r for r in rows if r[0] <= 1 / args.threshold]
    if flagged:
        print(f"\nREGRESSIONS (>= {args.threshold}x, both runs "
              f">= {args.min_sec}s):")
        for ratio, name, o, n in flagged:
            print(f"  {name:34s} {o:7.3f} -> {n:7.3f}  ({ratio:.2f}x)")
    else:
        print(f"\nno regressions >= {args.threshold}x "
              f"(on queries >= {args.min_sec}s)")
    if improved:
        print("\nimprovements:")
        for ratio, name, o, n in improved:
            print(f"  {name:34s} {o:7.3f} -> {n:7.3f}  ({ratio:.2f}x)")
    added = sorted(set(new_q) - set(old_q))
    removed = sorted(set(old_q) - set(new_q))
    if added:
        print(f"\nadded ({len(added)}): " + ", ".join(
            f"{n}={new_q[n]}" for n in added))
    if removed:
        print(f"\nremoved ({len(removed)}): " + ", ".join(removed))
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
