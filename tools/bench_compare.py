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

Round 19 (VERDICT r18 #2): when BOTH records carry the interleaved
`calibration_sweeps` (round 15+), the env factor divides the IN-RUN
WARM MEDIANS instead of the one-shot pre-run scalars — the pre-run
block carries 40-60% JIT noise by design (healthy coupling band is
1.6-2.7x its own warm sweeps), so +/-20% one-shot wobble was inverting
the sign of small cross-round movements while passing the >4x
decoupling quarantine. The sources are never mixed: if either side
predates the sweeps field, BOTH sides use the pre-run scalar (warm
medians run ~2x faster than the scalar — a mixed ratio would be
off by that factor, worse than the wobble).
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
#
# Round-18 refinements (VERDICT r17 #1 + ADVICE r17 #2):
#  - the sibling min is computed WITHIN a record's own ERA (records
#    grouped by which calibration fields their Bench version emits),
#    so a faster box in a later round no longer retroactively demotes
#    an older round's quiet record (r17's 103.1 s sweep1 was demoting
#    r16's quiet 129.2 s anchor across eras);
#  - within an io-calibrated era the compared value is
#    sweep1_total_sec / io_calibration_sec (machine I/O speed divided
#    out); records whose io calibration failed (-1) are unmeasurable
#    and neither contribute a sibling value nor get demoted;
#  - sweep1 reflects CODE speed as much as machine pressure, so in an
#    io-calibrated era a trip only DEMOTES when the environment
#    corroborates it (in-run io/cpu stability > STAB_BOUND, or the
#    record's own io_calibration_sec > SWEEP1_BOUND x the era's
#    minimum); an uncorroborated trip is reported as a possible CODE
#    regression and the record stays eligible — demoting it would make
#    the picker fall back to an older fast record and silently mask
#    the very regression the gate exists to catch. Pre-io eras keep
#    the unconditional demotion (no corroboration fields exist there;
#    verified the r16 110.7 s phantom stays demoted).
SWEEP1_BOUND = 1.2

# Field-generation markers, in emission order: each Bench version only
# ADDS fields, so the frozenset of present markers identifies the era
# a record was measured in (io_calibration_sec arrived in round 17,
# splitting the 195-query surface into the r16 and r17+ eras).
# Round 19+: records carry an explicit `round` marker (derived from the
# driver's BENCH_r{N}.json artifacts), which supersedes era signatures
# for grouping — two field-identical rounds no longer collapse into one
# era (ADVICE r18 #1). Era signatures remain the fallback for every
# record written before the marker existed.
GEN_FIELDS = ("calibration_sec", "calibration_stability",
              "sweep1_total_sec", "io_calibration_sec", "rev")


def _stab(d):
    # calibration_stability (round 15+): max/min over the warm
    # per-sweep calibration reps — in-run environment stability. -1 or
    # absent = not measured (older records / too few warm reps).
    s = d.get("calibration_stability")
    return None if s is None or s <= 0 else s


def _era_sig(r):
    """Field-generation signature: which GEN_FIELDS this record's Bench
    version emitted. Bench only ever ADDS fields, so the signature
    identifies the measurement era (box + harness version window)."""
    return frozenset(k for k in GEN_FIELDS if k in r)


def _group_key(r):
    """Anchor-grouping key: the explicit `round` marker when present
    (monotone per round — two field-identical rounds stay distinct),
    else the era signature (pre-round-19 records). Groups are ordered
    by first appearance in the history, which is chronological for an
    append-only file."""
    rd = r.get("round")
    if isinstance(rd, int):
        return ("round", rd)
    return ("era", _era_sig(r))


def _warm_median(r, sweeps_key):
    """Median of the IN-RUN warm calibration reps (sweep 2+), or None
    when the record predates the sweeps field or has < 2 warm reps.
    This is the normalization scalar of choice (VERDICT r18 #2): the
    one-shot pre-run block carries 40-60% JIT noise by design, while
    the warm reps ran interleaved with the measured sweeps on the
    machine the queries actually saw."""
    sweeps = r.get(sweeps_key)
    if not isinstance(sweeps, list):
        return None
    warm = sorted(v for v in sweeps[1:]
                  if isinstance(v, (int, float)) and v > 0)
    if len(warm) < 2:
        return None
    n = len(warm)
    if n % 2 == 1:
        return warm[n // 2]
    return (warm[n // 2 - 1] + warm[n // 2]) / 2


# Pre-run/in-run decoupling bound (round 18): calibration_sec and
# io_calibration_sec come from a ONE-SHOT pre-run block, so a transient
# (a just-exited JVM's residue, a host blip) can make them measure a
# different machine than the run — observed: pre-run 2.253 s vs in-run
# warm sweeps 0.229 s (9.8x) on a record whose queries and stability
# were quiet. Quiet records sit at ~1.6-2.7x (the pre-run block carries
# leftover JIT); uniform contention tracks BOTH down to ~1.1x. Past 4x
# the scalar is treated exactly like Bench's -1 FAILED sentinel: absent
# for normalization, absent for the sweep1 check. Bench emits -1 itself
# from round 18 on; this check covers records written before that.
DECOUPLE_BOUND = 4.0


def _decoupled(r, sec_key, sweeps_key):
    sec = r.get(sec_key)
    sweeps = r.get(sweeps_key)
    if not (isinstance(sec, (int, float)) and sec > 0):
        return False
    if not isinstance(sweeps, list):
        return False
    warm = sorted(v for v in sweeps[1:] if isinstance(v, (int, float))
                  and v > 0)
    if not warm:
        return False
    return sec / warm[len(warm) // 2] > DECOUPLE_BOUND


def _cal(r):
    """Usable CPU calibration scalar, or None (failed or decoupled)."""
    v = r.get("calibration_sec")
    if not (isinstance(v, (int, float)) and v > 0):
        return None
    if _decoupled(r, "calibration_sec", "calibration_sweeps"):
        return None
    return v


def _iocal(r):
    v = r.get("io_calibration_sec")
    if not (isinstance(v, (int, float)) and v > 0):
        return None
    if _decoupled(r, "io_calibration_sec", "io_calibration_sweeps"):
        return None
    return v


def _pick_record(path, n_lines, cand, era_back=0, exclude_line=None):
    """Pick the comparable record among `cand` (line, record) pairs at
    one query surface. Preference: LATEST stable record (a later record
    measures later code — a quieter-but-older record must not mask a
    fresh one) > latest unmeasured > least-bad flagged (labeled
    FLAGGED). `era_back` > 0 steps back that many field-generation eras
    before picking (the old side of a same-file comparison);
    `exclude_line` removes the NEW side's pick from the old side's
    candidates so a single-group history degrades to a previous-vs-
    latest comparison instead of silently comparing a record against
    itself (round-18 review catch). Records are grouped by the
    explicit `round` marker when present, era signature otherwise
    (see _group_key). Prints which line it chose and why; returns
    (line, record, sibling_records)."""
    group_order = []
    for _, r in cand:
        key = _group_key(r)
        if key not in group_order:
            group_order.append(key)
    # era groups keep first-appearance order (chronological in an
    # append-only file; pre-r19 harnesses can't reappear), round
    # groups order NUMERICALLY after them — the round marker is the
    # monotone sequence ADVICE r18 asked for, so a record appended
    # late (a re-run of an older round's binary) can no longer
    # reorder recency
    group_order = ([k for k in group_order if k[0] == "era"] +
                   sorted((k for k in group_order if k[0] == "round"),
                          key=lambda k: k[1]))
    idx = len(group_order) - 1 - era_back
    if idx < 0:
        print(f"{path}: WARNING only {len(group_order)} round/era "
              f"group(s) at this surface — the old side falls back to "
              "the latest group minus the new side's pick "
              "(previous-vs-latest record, NOT cross-round anchors)")
        idx = len(group_order) - 1
    want = group_order[idx]
    era_note = ""
    if len(group_order) > 1:
        if want[0] == "round":
            era_note = f", round {want[1]} (group {idx + 1}/{len(group_order)})"
        else:
            kind = ("io-calibrated" if "io_calibration_sec" in want[1]
                    else "pre-io")
            era_note = f", era {idx + 1}/{len(group_order)} ({kind})"
    cand = [(j, r) for j, r in cand if _group_key(r) == want]
    siblings = [r for _, r in cand]
    if exclude_line is not None and len(cand) > 1:
        cand = [(j, r) for j, r in cand if j != exclude_line]
    elif exclude_line is not None and \
            any(j == exclude_line for j, _ in cand):
        print(f"{path}: WARNING the only candidate IS the new side's "
              "pick — the comparison below is a record against itself")

    # Cross-record I/O check (rounds 17–18): a record whose cold-sweep
    # total sits > SWEEP1_BOUND above the ERA sibling minimum measured
    # a machine under I/O/page-cache pressure for its WHOLE run —
    # in-run stability can't see uniform slowness. In an io-calibrated
    # era the compared value divides the record's own io_calibration_sec
    # out first, and a trip only demotes when the environment
    # corroborates (see SWEEP1_BOUND comment); pre-io eras keep the
    # unconditional round-17 demotion. Round-marked groups are uniform
    # Bench versions by construction, so all() == any() there; the
    # conservative all() keeps a hypothetical mixed group on the
    # unconditional path rather than dividing by a field half the
    # group lacks.
    io_era = all("io_calibration_sec" in r for _, r in cand)

    def _sweep1(r):
        s = r.get("sweep1_total_sec")
        if not (isinstance(s, (int, float)) and s > 0):
            return None
        if io_era:
            ic = _iocal(r)
            # failed io calibration (-1): unmeasurable — contributes
            # no sibling value and is never demoted by this check
            return s / ic if ic else None
        return s

    s1 = {j: _sweep1(r) for j, r in cand}
    with_s1 = {j: v for j, v in s1.items() if v is not None}
    s1_min = min(with_s1.values()) if len(with_s1) >= 2 else None
    min_j = (min(with_s1, key=with_s1.get)
             if s1_min is not None else None)
    io_vals = [v for v in (_iocal(r) for _, r in cand) if v is not None]
    io_min = min(io_vals) if len(io_vals) >= 2 else None
    by_line = dict(cand)

    def s1_ratio(j):
        if s1_min is None or s1.get(j) is None:
            return None
        return s1[j] / s1_min

    def _corroborated(r):
        for f in ("io_stability", "cpu_stability"):
            v = r.get(f)
            if isinstance(v, (int, float)) and v > STAB_BOUND:
                return f"{f} {v:.2f}x"
        ic = _iocal(r)
        if io_min and ic and ic / io_min > SWEEP1_BOUND:
            return f"io_calibration {ic / io_min:.2f}x era min"
        return None

    demoted = {}
    for j, r in cand:
        rt = s1_ratio(j)
        if rt is None or rt <= SWEEP1_BOUND:
            continue
        if not io_era:
            demoted[j] = f"sweep1 {rt:.2f}x era sibling min"
            continue
        c = _corroborated(r)
        if c:
            demoted[j] = (f"sweep1 {rt:.2f}x era sibling min "
                          f"(corroborated: {c})")
        else:
            # sweep1 moved but io/cpu calibrations stayed quiet: the
            # slowness is in the CODE, not the machine — demoting would
            # hand the pick to an older record and mask the regression
            def _rev(rec_):
                v = rec_.get("rev")
                return v if v and v != "unknown" else None
            rev, mrev = _rev(r), (_rev(by_line[min_j])
                                  if min_j is not None else None)
            rev_note = (f"; rev {rev} vs sibling-min rev {mrev}"
                        if rev and mrev and rev != mrev else "")
            print(f"{path}: WARNING line {j} sweep1 {rt:.2f}x era "
                  f"sibling min with quiet io/cpu calibrations — "
                  f"possible CODE regression, record kept "
                  f"eligible{rev_note}")

    stable = [(j, r) for j, r in cand
              if _stab(r) is not None and _stab(r) <= STAB_BOUND
              and j not in demoted]
    unmeasured = [(j, r) for j, r in cand
                  if _stab(r) is None and j not in demoted]
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
        if j in demoted:
            parts.append(demoted[j])
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
        io_note = (f", sweep1 {s1_ratio(i):.2f}x era sibling min"
                   if s1_ratio(i) is not None else "")
        head = f"latest stable record ({_stab(d):.2f}x{io_note}) "
    else:
        head = "latest record (unmeasured stability) "
    rev = d.get("rev")
    rev_note = f", rev {rev}" if rev and rev != "unknown" else ""
    print(f"{path}: picked line {i} of {n_lines} — {head}"
          f"among {len(cand)} record(s) at the "
          f"{len(frozenset(d.get('queries', {})))}-query "
          f"surface{era_note}{rev_note}{note}")
    return i, d, siblings


def load(path, era_back=0, exclude_line=None):
    """Load one bench record. `path` may carry an explicit line pick
    (`bench_history.jsonl@49`, 0-based). For a multi-line history file
    with no explicit pick, candidates are the records at the LAST
    record's query surface (the set of query names — each round's
    board is fixed while rounds only grow it) and the majority sf
    there, grouped by the explicit `round` marker (era signature for
    pre-marker records), and _pick_record chooses the comparable
    record of the group `era_back` steps behind the latest
    (0 = latest): a record whose
    in-sweep calibration swung past STAB_BOUND measured a machine
    changing speed under it, so diffing it round-over-round inherits
    that ambiguity (three of round 15's five records were flagged; the
    quiet 1.098 one is the comparable record)."""
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
    line_no = None
    siblings = []
    if pick is not None:
        if pick not in by_line:
            raise SystemExit(f"{path}: line {pick} missing or unparseable")
        d = by_line[pick]
        line_no = pick
        print(f"{path}: explicit pick line {pick} "
              f"(stability {_stab(d) or 'n/a'})")
    elif len(recs) == 1:
        d = recs[0][1]
        line_no = recs[0][0]
    else:
        # candidates must match the latest record's surface AND the
        # benchline sf: the live history carries sf0.001/sf0.01 smoke
        # records, and a small-sf record sharing a surface would post a
        # ~10x-faster sweep1 that poisons the sibling min and could
        # even be picked as the anchor (round-19 catch). The benchline
        # sf is the MAJORITY sf among same-surface records (ties ->
        # the later-appearing one), NOT the latest record's: a one-off
        # smoke run appended after the driver record must not hijack
        # the whole comparison onto its sf. An intentional sf
        # migration outvotes the old sf after enough records (or use
        # explicit @line picks meanwhile).
        surface = frozenset(recs[-1][1].get("queries", {}))
        at_surface = [(i, r) for i, r in recs
                      if frozenset(r.get("queries", {})) == surface]
        counts = {}
        for pos, (_, r) in enumerate(at_surface):
            s = r.get("sf")
            c, _ = counts.get(s, (0, -1))
            counts[s] = (c + 1, pos)
        sf = max(counts, key=counts.get)
        dropped = [i for i, r in at_surface if r.get("sf") != sf]
        if dropped:
            print(f"{path}: ignoring {len(dropped)} same-surface "
                  f"record(s) at a foreign sf (benchline sf is {sf}): "
                  f"line(s) {', '.join(map(str, dropped))}")
        cand = [(i, r) for i, r in at_surface if r.get("sf") == sf]
        line_no, d, siblings = _pick_record(path, len(lines), cand,
                                            era_back=era_back,
                                            exclude_line=exclude_line)
    raw_cal = d.get("calibration_sec")
    cal = _cal(d)
    if cal is None and isinstance(raw_cal, (int, float)) and raw_cal > 0:
        print(f"{path}: calibration_sec {raw_cal} is DECOUPLED from its "
              f"own in-run warm sweeps (> {DECOUPLE_BOUND}x their "
              "median) — the one-shot pre-run block measured a "
              "transient, not the run; treated as absent")
        raw_cal = None
    return {
        "queries": d.get("queries", {}),
        "total": d.get("value"),
        "runs": d.get("runs"),
        "cal": cal if cal is not None else raw_cal,
        "warm_median": _warm_median(d, "calibration_sweeps"),
        "stab": _stab(d),
        "line": line_no,
        # per-query (and total) sibling values across the picked
        # record's whole round/era group — the census a floor-noise
        # check needs (a "regression" whose new value the OLD group's
        # siblings already produced, and vice versa, is oscillation,
        # not code). Each sibling carries its rev: the NEW-side band
        # clause must only count same-rev-as-pick siblings, or a
        # mid-round regression would be masked by that round's own
        # PRE-regression records (round-19 review catch).
        "rev": d.get("rev"),
        "siblings": [{"queries": r.get("queries", {}),
                      "rev": r.get("rev")} for r in siblings],
        "sibling_totals": [r["value"] for r in siblings
                           if isinstance(r.get("value"), (int, float))],
        # "unknown" is Bench's can't-resolve-git sentinel, not an
        # identity — two unknown-rev records may be different code, so
        # they never satisfy the same-rev clause (the rev-pair warning
        # convention, applied here too)
        "sibling_totals_same_rev": [
            r["value"] for r in siblings
            if isinstance(r.get("value"), (int, float))
            and r.get("rev") not in (None, "unknown")
            and r.get("rev") == d.get("rev")],
    }


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

    # same history file on both sides (no explicit picks): a
    # round-over-round self-compare — old = the comparable record of
    # the PREVIOUS field-generation era, new = of the latest (VERDICT
    # r17 #1: round anchors auto-pick without @line overrides).
    # Compare REAL paths, not argv spellings ('./hist' vs 'hist' must
    # still engage the mode — round-18 review catch); the new side
    # picks first so the old side can exclude its line when a
    # single-era history would otherwise self-compare.
    import os.path
    same_file = (not re.search(r"@(\d+)$", args.old)
                 and not re.search(r"@(\d+)$", args.new)
                 and os.path.realpath(args.old)
                 == os.path.realpath(args.new))
    if same_file:
        print(f"{args.old} on both sides: old = previous round/era "
              "group's pick, new = latest group's pick")
    new = load(args.new)
    old = load(args.old, era_back=1 if same_file else 0,
               exclude_line=new["line"] if same_file else None)
    old_q, new_q = old["queries"], new["queries"]
    old_cal, new_cal = old["cal"], new["cal"]
    # in-run environment stability (round 15+): max/min over the warm
    # interleaved calibration reps. Far from 1 means the machine changed
    # speed DURING that record's sweeps — its per-query medians are
    # ambiguous by roughly that factor, whatever we normalize by.
    for side, stab in (("old", old["stab"]), ("new", new["stab"])):
        if stab is not None and stab > STAB_BOUND:
            print(f"WARNING: {side} run's in-sweep calibration swung "
                  f"{stab:.2f}x warm-max/warm-min (unstable machine "
                  "during that record's sweeps); treat normalized "
                  f"deltas below +/-{stab - 1:.0%} as noise")
    # environment factor: >1 means the NEW machine ran the fixed
    # calibration workload slower, so raw new/old ratios overstate
    # regressions by this factor — divide it out.
    # Source preference (VERDICT r18 #2): the IN-RUN WARM MEDIANS of
    # the interleaved calibration sweeps when BOTH sides carry them —
    # the one-shot pre-run scalar carries 40-60% JIT noise by design
    # and its sub-4x wobble was inverting the sign of flat rounds. The
    # scalar remains the fallback for pre-sweeps records, and the two
    # sources are NEVER mixed across sides (warm medians run ~2x
    # faster than the half-warm pre-run block — a mixed ratio would be
    # off by the coupling factor itself). Non-positive calibration
    # marks a run whose calibration workload failed (Bench emits -1
    # there) — treat as absent.
    env = None
    env_note = None
    if not args.no_normalize:
        if old["warm_median"] and new["warm_median"]:
            env = new["warm_median"] / old["warm_median"]
            env_note = (f"in-run warm calibration medians "
                        f"{old['warm_median']:.3f} -> "
                        f"{new['warm_median']:.3f} s")
        elif old_cal and new_cal and old_cal > 0 and new_cal > 0:
            env = new_cal / old_cal
            env_note = (f"pre-run scalars {old_cal} -> {new_cal} s — "
                        "a side predates calibration_sweeps; "
                        "sources never mixed across sides")
    shared = sorted(set(old_q) & set(new_q))
    rows = []
    for name in shared:
        o, n = old_q[name], new_q[name]
        if max(o, n) < args.min_sec:
            continue
        raw = n / o if o > 0 else float("inf")
        rows.append((raw / env if env else raw, raw, name, o, n))
    rows.sort(reverse=True)

    tot_note = ""
    if isinstance(old["total"], (int, float)) and \
            isinstance(new["total"], (int, float)) and old["total"] > 0:
        t = new["total"] / old["total"]
        tot_note = (f" ({t:.2f}x raw" +
                    (f", {t / env:.2f}x normalized)" if env else ")"))
        # the total is the sum of the same oscillating floors the
        # per-query census covers — apply the same one-sided checks
        # (new-side clause restricted to same-rev siblings, like the
        # per-query band)
        ot = old["sibling_totals"]
        nt = new["sibling_totals_same_rev"]
        if (len(ot) >= 2 and new["total"] <= max(ot)) or \
                (len(nt) >= 2 and old["total"] >= min(nt)):
            tot_note += (" [within sibling-census band: old totals " +
                         (f"{min(ot):.1f}-{max(ot):.1f}" if len(ot) >= 2
                          else "n/a") + ", new " +
                         (f"{min(nt):.1f}-{max(nt):.1f}" if len(nt) >= 2
                          else "n/a") + "]")
    print(f"total: {old['total']} s ({old['runs']} runs) -> "
          f"{new['total']} s ({new['runs']} runs){tot_note} on "
          f"{len(shared)} shared queries")
    if env:
        print(f"calibration: env factor {env:.2f}x from {env_note} — "
              "ratios below are normalized by it; raw in parens")
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

    # Sibling-census band (VERDICT r18 #2): a flagged query is
    # oscillating inside its own noise band — not regressing — when
    # EITHER census explains the movement:
    #  - the OLD group's sibling records already produced medians at
    #    least as slow as the new value. Sound unconditionally: every
    #    old-group record predates the new round's code, so the new
    #    median is a value the OLD code reached on its own;
    #  - the NEW group's SAME-REV-as-pick siblings produced medians at
    #    least as fast as the old value — i.e. the exact code being
    #    judged also reached the old floor. Restricting to the pick's
    #    rev matters (round-19 review catch): a whole-group clause
    #    would let a round's own PRE-regression records mask a
    #    mid-round regression. Revless records never satisfy it.
    # (The judge's q160 census: 0.49-1.35 s across 13 same-code
    # records — floor noise amplified by the env factor.) Demoted
    # movers are reported in their own section with both bands and
    # don't drive the exit code. Requires >= 2 sibling records on the
    # explaining side (explicit @line picks carry none).
    def band(side, name, same_rev=False):
        sibs = side["siblings"]
        if same_rev:
            # "unknown" is a sentinel, not an identity (see load())
            sibs = [s for s in sibs
                    if s.get("rev") not in (None, "unknown")
                    and s["rev"] == side["rev"]]
        vals = [s["queries"][name] for s in sibs
                if isinstance(s["queries"].get(name), (int, float))]
        return (min(vals), max(vals)) if len(vals) >= 2 else None

    flagged, noise = [], []
    for r in rows:
        if r[0] < args.threshold:
            continue
        _, _, name, o, n = r
        ob = band(old, name)
        nb = band(new, name, same_rev=True)
        if (ob and n <= ob[1]) or (nb and o >= nb[0]):
            noise.append((r, ob, nb))
        else:
            flagged.append(r)
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
    if noise:
        print("\nwithin sibling-census band (floor noise, not counted "
              "as regressions):")
        for r, ob, nb in noise:
            obs = f"old siblings {ob[0]:.3f}-{ob[1]:.3f}" if ob else \
                "old siblings n/a"
            nbs = f"new siblings {nb[0]:.3f}-{nb[1]:.3f}" if nb else \
                "new siblings n/a"
            print(fmt(*r) + f"  [{obs}, {nbs}]")
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
