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

When BOTH artifacts carry `calibration_sec` (round 12+: the warm median
of a fixed range-sum + lineitem-groupBy workload, i.e. machine speed),
ratios are NORMALIZED by the calibration ratio before thresholding —
cross-round totals have drifted ~30% on environment alone, and the
calibration divides that out. Raw ratios are always shown alongside.
"""
import argparse
import json
import re
import sys


STAB_BOUND = 1.3  # Bench.scala's contention-warn bound

# Cross-record I/O-pressure bound (round 17, VERDICT r16 #1): the
# in-run stability scalar cannot flag a record that was UNIFORMLY slow
# for its whole duration — r16's driver record passed the 1.3 gate
# with the round's fastest CPU calibration while running every query
# 1.02–3.8× (median 1.24×) slower than its quiet sibling, and its
# cold-sweep total (sweep1_total_sec 184.0) vs the sibling minimum
# (113.4) was the one signal that moved. Quiet records of the same
# surface cluster within ~1.14× of the sibling minimum (r15–r16:
# 120.6–129.2 vs 113.4); past 1.2× the record measured a machine under
# I/O/page-cache pressure and is demoted to flagged before the
# latest-stable pick.
SWEEP1_BOUND = 1.2


def _stab(d):
    # calibration_stability (round 15+): max/min over the warm
    # per-sweep calibration reps — in-run environment stability. -1 or
    # absent = not measured (older records / too few warm reps).
    s = d.get("calibration_stability")
    return None if s is None or s <= 0 else s


def load(path):
    """Load one bench record. `path` may carry an explicit line pick
    (`bench_history.jsonl@49`, 0-based). For a multi-line history file
    with no explicit pick, records are grouped into "rounds" by query
    surface (the set of query names — each round's board is fixed while
    rounds only grow it), and within the LAST surface the best-stability
    record wins: a record whose in-sweep calibration swung past
    STAB_BOUND measured a machine changing speed under it, so diffing it
    round-over-round inherits that ambiguity (three of round 15's five
    records were flagged; the quiet 1.098 one is the comparable record).
    Preference: LATEST stable record (a later record measures later
    code — a quieter-but-older record must not mask a fresh one) >
    latest unmeasured > least-bad flagged (labeled FLAGGED). Prints
    which line it chose and why."""
    # explicit pick = a TRAILING '@<digits>' suffix only (ADVICE r16:
    # '"@" in path' split a legitimate path like /home/user@host/x.jsonl
    # at the '@' and crashed on int())
    pick = None
    m = re.search(r"@(\d+)$", path)
    if m:
        pick = int(m.group(1))
        path = path[: m.start()]
    with open(path) as f:
        lines = [ln for ln in f.read().strip().splitlines() if ln.strip()]
    # index by ORIGINAL line number, tolerating corrupt/truncated lines
    # (a killed mid-append run must not poison every future comparison)
    recs = []
    for i, ln in enumerate(lines):
        try:
            recs.append((i, json.loads(ln)))
        except json.JSONDecodeError:
            print(f"{path}: skipping unparseable line {i}")
    if not recs:
        raise SystemExit(f"{path}: no parseable records")
    by_line = dict(recs)
    if pick is not None:
        if pick not in by_line:
            raise SystemExit(f"{path}: line {pick} missing or unparseable")
        d = by_line[pick]
        print(f"{path}: explicit pick line {pick} "
              f"(stability {_stab(d) or 'n/a'})")
    elif len(recs) == 1:
        d = recs[0][1]
    else:
        surface = frozenset(recs[-1][1].get("queries", {}))
        cand = [(i, r) for i, r in recs
                if frozenset(r.get("queries", {})) == surface]
        # Cross-record I/O check (round 17): a record whose cold-sweep
        # total sits > SWEEP1_BOUND above the sibling minimum at the
        # same surface measured a machine under I/O/page-cache pressure
        # for its WHOLE run — in-run stability can't see uniform
        # slowness (the r16 110.7 s record: stability 1.24, sweep1
        # 1.62x the sibling min, every query 1.02–3.8x its quiet
        # sibling). Needs >= 2 sibling sweep1 values to mean anything;
        # records predating the field are never demoted by it.
        def _sweep1(r):
            s = r.get("sweep1_total_sec")
            return s if isinstance(s, (int, float)) and s > 0 else None
        s1 = {j: _sweep1(r) for j, r in cand}
        with_s1 = [v for v in s1.values() if v is not None]
        s1_min = min(with_s1) if len(with_s1) >= 2 else None

        def s1_ratio(j):
            if s1_min is None or s1[j] is None:
                return None
            return s1[j] / s1_min

        def io_slow(j):
            r = s1_ratio(j)
            return r is not None and r > SWEEP1_BOUND

        stable = [(j, r) for j, r in cand
                  if _stab(r) is not None and _stab(r) <= STAB_BOUND
                  and not io_slow(j)]
        unmeasured = [(j, r) for j, r in cand
                      if _stab(r) is None and not io_slow(j)]
        flagged_pick = False
        if stable:
            i, d = stable[-1]
        elif unmeasured:
            i, d = unmeasured[-1]
        else:
            # least-bad among the flagged: smallest in-run swing first
            # (records with no stability sort last), then the smallest
            # sweep1 ratio
            def badness(t):
                j, r = t
                st = _stab(r)
                return (st if st is not None else float("inf"),
                        s1_ratio(j) or 1.0)
            i, d = min(cand, key=badness)
            flagged_pick = True

        def why_excluded(j, r):
            parts = []
            st = _stab(r)
            if st is not None and st > STAB_BOUND:
                parts.append(f"stability {st:.2f}x")
            if io_slow(j):
                parts.append(f"sweep1 {s1_ratio(j):.2f}x sibling min")
            return ", ".join(parts)

        excluded = [(j, why_excluded(j, r)) for j, r in cand
                    if j != i and why_excluded(j, r)]
        note = (f"; excluded flagged line(s) " +
                ", ".join(f"{j} ({w})" for j, w in excluded)
                ) if excluded else ""
        if flagged_pick:
            head = (f"least-bad flagged record ({why_excluded(i, d) or 'n/a'}"
                    f" — FLAGGED, every candidate trips stability "
                    f">{STAB_BOUND}x or sweep1 >{SWEEP1_BOUND}x) ")
        elif _stab(d):
            io_note = (f", sweep1 {s1_ratio(i):.2f}x sibling min"
                       if s1_ratio(i) is not None else "")
            head = f"latest stable record ({_stab(d):.2f}x{io_note}) "
        else:
            head = "latest record (unmeasured stability) "
        print(f"{path}: picked line {i} of {len(lines)} — {head}"
              f"among {len(cand)} record(s) at the {len(surface)}-query "
              f"surface{note}")
    return d.get("queries", {}), d.get("value"), d.get("runs"), \
        d.get("calibration_sec"), _stab(d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag ratio (new/old) above this (default 1.5)")
    ap.add_argument("--min-sec", type=float, default=0.2,
                    help="ignore queries faster than this in BOTH runs "
                         "(default 0.2 s — fixed overhead dominates there)")
    ap.add_argument("--no-normalize", action="store_true",
                    help="threshold on raw ratios even when both "
                         "artifacts carry calibration_sec")
    args = ap.parse_args()

    old_q, old_total, old_runs, old_cal, old_stab = load(args.old)
    new_q, new_total, new_runs, new_cal, new_stab = load(args.new)
    # in-run environment stability (round 15+): max/min over the warm
    # interleaved calibration reps. Far from 1 means the machine changed
    # speed DURING that record's sweeps — its per-query medians are
    # ambiguous by roughly that factor, whatever we normalize by.
    for side, stab in (("old", old_stab), ("new", new_stab)):
        if stab is not None and stab > STAB_BOUND:
            print(f"WARNING: {side} run's in-sweep calibration swung "
                  f"{stab:.2f}x warm-max/warm-min (unstable machine "
                  "during that record's sweeps); treat normalized "
                  f"deltas below +/-{stab - 1:.0%} as noise")
    # environment factor: >1 means the NEW machine ran the fixed
    # calibration workload slower, so raw new/old ratios overstate
    # regressions by this factor — divide it out
    # non-positive calibration marks a run whose calibration workload
    # failed (Bench emits -1 there) — treat as absent
    env = None
    if old_cal and new_cal and old_cal > 0 and new_cal > 0 \
            and not args.no_normalize:
        env = new_cal / old_cal
    shared = sorted(set(old_q) & set(new_q))
    rows = []
    for name in shared:
        o, n = old_q[name], new_q[name]
        if max(o, n) < args.min_sec:
            continue
        raw = n / o if o > 0 else float("inf")
        rows.append((raw / env if env else raw, raw, name, o, n))
    rows.sort(reverse=True)

    print(f"total: {old_total} s ({old_runs} runs) -> "
          f"{new_total} s ({new_runs} runs) on "
          f"{len(shared)} shared queries")
    if env:
        print(f"calibration: {old_cal} -> {new_cal} s (env factor "
              f"{env:.2f}x — ratios below are normalized by it; "
              f"raw in parens)")
    elif args.no_normalize and old_cal and new_cal \
            and old_cal > 0 and new_cal > 0:
        print(f"calibration: {old_cal} -> {new_cal} s (normalization "
              "disabled by --no-normalize — raw ratios)")
    elif (old_cal is not None and old_cal <= 0) or \
            (new_cal is not None and new_cal <= 0):
        bad = [s for s, c in (("old", old_cal), ("new", new_cal))
               if c is not None and c <= 0]
        print(f"calibration FAILED in the {'/'.join(bad)} run "
              f"(sentinel {old_cal if 'old' in bad else new_cal}) — "
              "raw ratios; treat cross-round totals as unnormalized")
    elif old_cal or new_cal:
        print("calibration present in only one artifact — raw ratios")

    def fmt(ratio, raw, name, o, n):
        tag = f"({raw:.2f}x raw)" if env else ""
        return f"  {name:34s} {o:7.3f} -> {n:7.3f}  ({ratio:.2f}x) {tag}"

    flagged = [r for r in rows if r[0] >= args.threshold]
    improved = [r for r in rows if r[0] <= 1 / args.threshold]
    if flagged:
        print(f"\nREGRESSIONS (>= {args.threshold}x"
              f"{' normalized' if env else ''}, both runs "
              f">= {args.min_sec}s):")
        for r in flagged:
            print(fmt(*r))
    else:
        print(f"\nno regressions >= {args.threshold}x"
              f"{' normalized' if env else ''} "
              f"(on queries >= {args.min_sec}s)")
    if improved:
        print("\nimprovements:")
        for r in improved:
            print(fmt(*r))
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
