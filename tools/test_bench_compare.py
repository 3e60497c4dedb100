#!/usr/bin/env python3
"""Regression tests for bench_compare's record-selection logic.

Run: python3 tools/test_bench_compare.py   (exit 0 = all pass)

The picker grew real semantics in rounds 17-18 (era-local sweep1
sibling min, environment-corroborated demotion, one-shot-calibration
decoupling quarantine, same-file round anchors) that were verified by
hand against the live history each round; these tests pin them on
SYNTHETIC histories so a future edit can't silently regress one while
fixing another. Each case builds a small jsonl in a temp dir and
asserts on the picker's stdout + the chosen record.
"""
import json
import os
import re
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
TOOL = os.path.join(HERE, "bench_compare.py")


def rec(value, queries=None, cal=0.5, cal_sweeps=None, stab=None,
        io_cal=0.4, io_sweeps=None, io_stab=None, cpu_stab=None,
        sweep1=None, rev=None, round_no=None, omit=()):
    """One synthetic history record. Field omission models eras:
    pass omit=('io_calibration_sec', ...) to write a pre-io record."""
    q = queries or {"q1": value * 0.6, "q2": value * 0.4}
    d = {"metric": "total", "value": value, "unit": "sec", "runs": 3,
         "queries": q, "sf": "synth", "ts": 0}
    d["calibration_sec"] = cal
    d["calibration_sweeps"] = cal_sweeps or [cal / 2, cal / 2.5,
                                             cal / 2.4, cal / 2.6]
    d["calibration_stability"] = stab if stab is not None else 1.1
    d["io_calibration_sec"] = io_cal
    d["io_calibration_sweeps"] = io_sweeps or [io_cal / 2, io_cal / 2.2,
                                               io_cal / 2.1, io_cal / 2.3]
    if io_stab is not None:
        d["io_stability"] = io_stab
    if cpu_stab is not None:
        d["cpu_stability"] = cpu_stab
    if sweep1 is not None:
        d["sweep1_total_sec"] = sweep1
    if rev is not None:
        d["rev"] = rev
    if round_no is not None:
        d["round"] = round_no
    for k in omit:
        d.pop(k, None)
    return d


def run(lines, args=None):
    """Write records to a temp history, run the tool on it (same file
    both sides unless args given), return (stdout, returncode)."""
    with tempfile.NamedTemporaryFile("w", suffix=".jsonl", dir="/tmp",
                                     delete=False) as f:
        for d in lines:
            f.write(json.dumps(d) + "\n")
        path = f.name
    alt = os.path.join(os.path.dirname(path), "..",
                       os.path.basename(os.path.dirname(path)),
                       ".", os.path.basename(path))
    argv = [sys.executable, TOOL] + (
        [a.replace("ALTHIST", alt).replace("HIST", path) for a in args]
        if args else [path, path])
    p = subprocess.run(argv, capture_output=True, text=True)
    os.unlink(path)
    return p.stdout, p.returncode


def picked_lines(out):
    return [int(m.group(1))
            for m in re.finditer(r"picked line (\d+)", out)]


FAILS = []


def check(name, cond, ctx=""):
    status = "ok" if cond else "FAIL"
    print(f"  {status}  {name}")
    if not cond:
        FAILS.append(name)
        if ctx:
            print("      --- output ---")
            print("      " + ctx.replace("\n", "\n      "))


def test_era_local_sibling_min():
    # pre-io era: quiet record (sweep1 1.14x its OWN era min) must NOT
    # be demoted by a later, faster era's sweep1 values
    pre = dict(omit=("io_calibration_sec", "io_calibration_sweeps",
                     "cpu_stability", "io_stability"))
    lines = [
        rec(80.0, stab=1.19, sweep1=129.0, **pre),   # 0: r16-ish quiet
        rec(110.0, stab=1.24, sweep1=184.0, **pre),  # 1: the phantom
        rec(71.0, stab=1.26, sweep1=103.0, io_stab=1.26, cpu_stab=1.24,
            rev="aaa"),                              # 2: faster-era quiet
        rec(72.0, stab=1.2, sweep1=105.0, io_stab=1.2, cpu_stab=1.1,
            rev="aaa"),                              # 3: sibling for min
    ]
    out, _ = run(lines)
    picks = picked_lines(out)
    # the NEW side now loads first (so the old side can exclude its
    # pick in single-era histories) -> print order is [new, old]
    check("same-file compare picks old from the PREVIOUS era, new from "
          "the latest", picks == [3, 0], out)
    # era-LOCAL min: the phantom's ratio must be computed against its
    # OWN era's 129 (-> 1.43x), not the faster era's 103 (-> 1.79x)
    check("the uniformly-slow pre-io phantom stays demoted, era-locally",
          "sweep1 1.43x era sibling min" in out
          and "1.79x" not in out, out)


def test_uncorroborated_trip_warns_but_keeps():
    # io era: latest record's sweep1 trips 1.3x with QUIET io/cpu and
    # era-min io_cal -> possible code regression: warn, still pick it
    lines = [
        rec(70.0, stab=1.1, io_stab=1.1, cpu_stab=1.1, sweep1=100.0,
            io_cal=0.4, rev="old"),
        rec(88.0, stab=1.1, io_stab=1.1, cpu_stab=1.1, sweep1=130.0,
            io_cal=0.4, rev="new"),
    ]
    out, _ = run(lines, args=["HIST@0", "HIST"])
    check("uncorroborated sweep1 trip warns 'possible CODE regression'",
          "possible CODE regression" in out, out)
    check("the tripping latest record is still picked",
          picked_lines(out) == [1], out)
    check("the rev pair is named in the warning",
          "rev new vs sibling-min rev old" in out, out)


def test_corroborated_trip_demotes():
    # same shape but the slow record's own io calibration is 1.5x the
    # era min -> environment corroborated -> demoted, older quiet wins
    lines = [
        rec(70.0, stab=1.1, io_stab=1.1, cpu_stab=1.1, sweep1=100.0,
            io_cal=0.4),
        rec(88.0, stab=1.1, io_stab=1.1, cpu_stab=1.1, sweep1=400.0,
            io_cal=0.6),
    ]
    out, _ = run(lines, args=["HIST@0", "HIST"])
    check("io_calibration-corroborated sweep1 trip demotes",
          "corroborated: io_calibration" in out
          and picked_lines(out) == [0], out)


def test_stability_corroboration():
    lines = [
        rec(70.0, stab=1.1, io_stab=1.1, cpu_stab=1.1, sweep1=100.0),
        rec(88.0, stab=1.5, io_stab=1.5, cpu_stab=1.1, sweep1=130.0),
    ]
    out, _ = run(lines, args=["HIST@0", "HIST"])
    check("io_stability past the gate corroborates the demotion",
          picked_lines(out) == [0]
          and "io_stability 1.50x" in out, out)


def test_decoupled_calibration_quarantined():
    # one-shot calibration 10x its own warm sweeps: treated as absent
    # for normalization AND the record contributes no sweep1 value
    lines = [
        rec(70.0, stab=1.1, io_stab=1.1, cpu_stab=1.1, sweep1=100.0,
            cal=0.5, io_cal=0.4),
        rec(84.0, stab=1.1, io_stab=1.1, cpu_stab=1.1, sweep1=120.0,
            cal=2.2, cal_sweeps=[0.3, 0.22, 0.23, 0.22, 0.24],
            io_cal=1.7, io_sweeps=[0.3, 0.26, 0.23, 0.25, 0.26]),
    ]
    out, _ = run(lines, args=["HIST@0", "HIST"])
    check("decoupled calibration is called out and treated as absent",
          "DECOUPLED" in out, out)
    # round 19: both records carry calibration_sweeps, so the env
    # factor now comes from the in-run warm medians — the decoupled
    # pre-run scalar stays quarantined, but normalization no longer
    # dies with it
    check("normalization survives a decoupled scalar via warm medians",
          "in-run warm calibration medians" in out
          and "pre-run scalars" not in out, out)
    check("the quiet-stability record is still pickable",
          picked_lines(out) == [1], out)
    # and its deflated sweep1/io_cal (120/1.7=71) must NOT become the
    # era min: with the decoupled record FIRST, the honest later
    # sibling (100/0.4=250, a fake 3.5x against the poisoned min) must
    # neither be excluded nor even warned about
    out2, _ = run(list(reversed(lines)), args=["HIST@0", "HIST"])
    check("a decoupled record's sweep1 does not poison the era min",
          "possible CODE regression" not in out2
          and "excluded" not in out2
          and picked_lines(out2) == [1], out2)


def test_explicit_pick_and_single_record():
    lines = [rec(70.0, sweep1=100.0), rec(80.0, sweep1=105.0)]
    out, _ = run(lines, args=["HIST@0", "HIST@1"])
    check("explicit @line picks bypass the picker",
          "explicit pick line 0" in out and "explicit pick line 1" in out,
          out)
    one, _ = run([rec(70.0)], args=["HIST", "HIST"])
    check("single-record file loads without picker output",
          "picked line" not in one, one)


def test_failed_io_cal_unmeasurable():
    # io_cal = -1 (Bench's FAILED sentinel): no sweep1 check either way
    lines = [
        rec(70.0, stab=1.1, io_stab=1.1, cpu_stab=1.1, sweep1=100.0,
            io_cal=0.4),
        rec(72.0, stab=1.1, io_stab=1.1, cpu_stab=1.1, sweep1=100.0,
            io_cal=0.41),
        rec(90.0, stab=1.1, io_stab=1.1, cpu_stab=1.1, sweep1=500.0,
            io_cal=-1.0),
    ]
    out, _ = run(lines, args=["HIST@0", "HIST"])
    check("a failed-io-cal record is never sweep1-demoted (unmeasurable)",
          picked_lines(out) == [2], out)


def test_single_era_same_file_does_not_self_compare():
    # one era only: the old side must fall back to previous-vs-latest
    # with a WARNING, never silently compare the pick against itself
    lines = [
        rec(70.0, stab=1.1, io_stab=1.1, cpu_stab=1.1, sweep1=100.0,
            rev="r1"),
        rec(75.0, stab=1.1, io_stab=1.1, cpu_stab=1.1, sweep1=104.0,
            rev="r2"),
    ]
    out, _ = run(lines)
    check("single-era same-file compare warns about the fallback",
          "WARNING only 1 round/era group" in out, out)
    check("old = previous stable record, new = latest (not self)",
          picked_lines(out) == [1, 0], out)
    one = [rec(70.0, stab=1.1, io_stab=1.1, cpu_stab=1.1, sweep1=100.0)]
    out1, _ = run(one + one[:0])  # single record
    check("a truly single-record self-compare loads without a picker",
          "picked line" not in out1, out1)


def test_realpath_same_file_detection():
    # './hist' and 'hist' (or any spelling of the same real path) must
    # still engage round-anchor mode
    pre = dict(omit=("io_calibration_sec", "io_calibration_sweeps",
                     "cpu_stability", "io_stability"))
    lines = [
        rec(80.0, stab=1.19, sweep1=129.0, **pre),
        rec(71.0, stab=1.2, sweep1=103.0, io_stab=1.2, cpu_stab=1.1,
            rev="aaa"),
        rec(72.0, stab=1.2, sweep1=105.0, io_stab=1.2, cpu_stab=1.1,
            rev="aaa"),
    ]
    out, _ = run(lines, args=["ALTHIST", "HIST"])
    check("differently-spelled identical paths engage anchor mode",
          "on both sides" in out and picked_lines(out) == [2, 0], out)


def test_unknown_rev_suppressed():
    # Bench stamps rev="unknown" when git is unresolvable; the warn
    # path and pick notes must not assert identity against it
    lines = [
        rec(70.0, stab=1.1, io_stab=1.1, cpu_stab=1.1, sweep1=100.0,
            io_cal=0.4, rev="unknown"),
        rec(88.0, stab=1.1, io_stab=1.1, cpu_stab=1.1, sweep1=130.0,
            io_cal=0.4, rev="unknown"),
    ]
    out, _ = run(lines, args=["HIST@0", "HIST"])
    check("rev 'unknown' never appears in warnings or pick notes",
          "possible CODE regression" in out and "unknown" not in out,
          out)


def test_foreign_sf_records_excluded():
    # a sf0.001 smoke record at the SAME query surface must not join
    # the candidate set — its ~10x-faster sweep1 would poison the
    # sibling min and its total could even win the anchor pick
    common = dict(stab=1.1, io_stab=1.1, cpu_stab=1.1)
    lines = [
        rec(70.0, sweep1=100.0, rev="a", round_no=18, **common),
        rec(7.0, sweep1=10.0, rev="b", round_no=19, **common),
        rec(72.0, sweep1=104.0, rev="b", round_no=19, **common),
    ]
    lines[1]["sf"] = "/root/testdata/sf0.001"
    out, _ = run(lines)
    check("a foreign-sf record is not a candidate (no poisoned sibling "
          "min, anchor picks skip it)",
          picked_lines(out) == [2, 0]
          and "possible CODE regression" not in out
          and "excluded" not in out, out)
    # the benchline sf is the MAJORITY sf, not the latest record's: a
    # smoke run appended AFTER the driver record must not hijack the
    # comparison onto its own sf
    lines2 = [
        rec(70.0, sweep1=100.0, rev="a", round_no=18, **common),
        rec(72.0, sweep1=104.0, rev="b", round_no=19, **common),
        rec(7.0, sweep1=10.0, rev="b", round_no=19, **common),
    ]
    lines2[2]["sf"] = "/root/testdata/sf0.001"
    out2, _ = run(lines2)
    check("a trailing foreign-sf smoke record does not hijack the "
          "benchline sf", picked_lines(out2) == [1, 0]
          and "ignoring 1 same-surface record(s) at a foreign sf" in out2,
          out2)


def test_round_markers_anchor_field_identical_rounds():
    # ADVICE r18 #1: two rounds whose Bench versions emit the SAME
    # field set must still anchor round-over-round, via the explicit
    # `round` marker — era signatures would collapse them into one
    # group and reach back a whole era (or hit the single-group
    # previous-vs-latest fallback)
    common = dict(stab=1.1, io_stab=1.1, cpu_stab=1.1, sweep1=100.0)
    lines = [
        rec(70.0, rev="a1", round_no=18, **common),
        rec(71.0, rev="a2", round_no=18, **common),
        rec(73.0, rev="b1", round_no=19, **common),
        rec(74.0, rev="b2", round_no=19, **common),
    ]
    out, _ = run(lines)
    check("field-identical rounds anchor by round marker (old=r18's "
          "latest stable, new=r19's)", picked_lines(out) == [3, 1], out)
    check("the pick note names the round",
          "round 19 (group 2/2)" in out and "round 18 (group 1/2)" in out,
          out)
    check("no single-group fallback warning fires",
          "WARNING only" not in out, out)
    # round groups order NUMERICALLY, not by file appearance: a record
    # from an older round's binary appended late must not become "the
    # latest round"
    lines2 = [
        rec(73.0, rev="b1", round_no=20, **common),
        rec(70.0, rev="a1", round_no=19, **common),
    ]
    out2, _ = run(lines2)
    check("a late-appended older-round record does not reorder round "
          "recency", picked_lines(out2) == [0, 1], out2)


def test_warm_median_normalization():
    # VERDICT r18 #2: a +/-20% one-shot pre-run wobble must not flip a
    # flat round into a normalized regression when both records carry
    # in-run warm sweeps. Identical queries + identical warm medians,
    # but the old one-shot scalar reads 0.6 vs the new 0.5 — scalar
    # normalization would inflate every ratio 1.2x.
    sweeps = [0.4, 0.2, 0.21, 0.2]
    q = {"q1": 2.0, "q2": 1.5}
    lines = [
        rec(3.5, queries=q, cal=0.6, cal_sweeps=sweeps, sweep1=5.0),
        rec(3.5, queries=q, cal=0.5, cal_sweeps=sweeps, sweep1=5.0),
    ]
    out, code = run(lines, args=["--threshold", "1.15", "HIST@0", "HIST@1"])
    check("warm medians drive the env factor when both sides have them",
          "in-run warm calibration medians" in out, out)
    check("a one-shot wobble no longer flips a flat round into a "
          "regression", code == 0 and "no regressions" in out, out)
    # control: with the scalar the same wobble DOES manufacture one
    no_sweeps = dict(omit=("calibration_sweeps",))
    lines2 = [
        rec(3.5, queries=q, cal=0.6, sweep1=5.0, **no_sweeps),
        rec(3.5, queries=q, cal=0.5, sweep1=5.0, **no_sweeps),
    ]
    out2, code2 = run(lines2,
                      args=["--threshold", "1.15", "HIST@0", "HIST@1"])
    check("control: scalar normalization still manufactures the 1.2x",
          code2 == 1 and "pre-run scalars" in out2, out2)


def test_normalization_sources_never_mixed():
    # one side predates calibration_sweeps: warm medians run ~2x
    # faster than the half-warm pre-run scalar, so mixing a warm
    # median against a scalar would fake a ~2x env shift — BOTH sides
    # must fall back to the scalar
    q = {"q1": 2.0, "q2": 1.5}
    lines = [
        rec(3.5, queries=q, cal=0.5, sweep1=5.0,
            omit=("calibration_sweeps",)),
        rec(3.5, queries=q, cal=0.5, sweep1=5.0),
    ]
    out, code = run(lines, args=["HIST@0", "HIST@1"])
    check("a sweeps-less side forces the scalar on BOTH sides",
          "pre-run scalars" in out
          and "in-run warm calibration medians" not in out, out)
    check("matched scalars on a flat round stay quiet",
          code == 0, out)


def test_sibling_band_demotes_floor_noise():
    # the q160 class: a >=1.5x mover whose new value the OLD round's
    # own siblings already produced (same code!) is oscillation, not
    # regression — reported in its own section, exit 0
    common = dict(stab=1.1, io_stab=1.1, cpu_stab=1.1, sweep1=100.0)
    lines = [
        rec(10.0, queries={"q1": 0.95, "q2": 5.0}, rev="a",
            round_no=18, **common),
        rec(10.0, queries={"q1": 0.50, "q2": 5.0}, rev="a",
            round_no=18, **common),
        rec(10.0, queries={"q1": 0.52, "q2": 5.0}, rev="b",
            round_no=19, **common),
        rec(10.0, queries={"q1": 0.85, "q2": 5.0}, rev="b",
            round_no=19, **common),
    ]
    out, code = run(lines)
    check("a mover inside the old group's sibling band is demoted to "
          "floor noise", code == 0
          and "within sibling-census band" in out
          and "q1" in out.split("within sibling-census band")[-1], out)
    # control: a true regression — the new value exceeds everything the
    # old code ever produced AND the new code never reaches the old
    # floor — stays a counted regression
    lines2 = [
        rec(10.0, queries={"q1": 0.55, "q2": 5.0}, rev="a",
            round_no=18, **common),
        rec(10.0, queries={"q1": 0.50, "q2": 5.0}, rev="a",
            round_no=18, **common),
        rec(10.0, queries={"q1": 1.90, "q2": 5.0}, rev="b",
            round_no=19, **common),
        rec(10.0, queries={"q1": 2.00, "q2": 5.0}, rev="b",
            round_no=19, **common),
    ]
    out2, code2 = run(lines2)
    check("a genuine regression outside both sibling bands still exits 1",
          code2 == 1 and "REGRESSIONS" in out2, out2)
    # the NEW-side clause only counts siblings at the PICK's rev: a
    # round's own pre-regression records (earlier rev, fast q1) must
    # not mask a mid-round regression the later rev introduced
    lines3 = [
        rec(10.0, queries={"q1": 0.52, "q2": 5.0}, rev="a",
            round_no=18, **common),
        rec(10.0, queries={"q1": 0.50, "q2": 5.0}, rev="a",
            round_no=18, **common),
        rec(10.0, queries={"q1": 0.51, "q2": 5.0}, rev="b1",
            round_no=19, **common),   # pre-regression commit
        rec(10.0, queries={"q1": 0.53, "q2": 5.0}, rev="b1",
            round_no=19, **common),
        rec(10.0, queries={"q1": 2.00, "q2": 5.0}, rev="b2",
            round_no=19, **common),   # the regressing commit's record
    ]
    out3, code3 = run(lines3)
    check("a round's own pre-regression records cannot mask a "
          "mid-round regression (same-rev new-side clause)",
          code3 == 1 and "REGRESSIONS" in out3
          and "q1" in out3.split("REGRESSIONS")[-1], out3)
    # rev="unknown" is a sentinel, not an identity: two unknown-rev
    # records must not satisfy the same-rev clause for each other
    lines4 = [rec(10.0, queries={"q1": 0.52, "q2": 5.0}, rev="a",
                  round_no=18, **common)] + [
        rec(10.0, queries={"q1": v, "q2": 5.0}, rev="unknown",
            round_no=19, **common) for v in (0.50, 0.51, 2.00)]
    out4, code4 = run(lines4)
    check("unknown revs never satisfy the same-rev clause",
          code4 == 1 and "REGRESSIONS" in out4, out4)


def main():
    for t in (test_era_local_sibling_min,
              test_uncorroborated_trip_warns_but_keeps,
              test_corroborated_trip_demotes,
              test_stability_corroboration,
              test_decoupled_calibration_quarantined,
              test_explicit_pick_and_single_record,
              test_failed_io_cal_unmeasurable,
              test_single_era_same_file_does_not_self_compare,
              test_realpath_same_file_detection,
              test_unknown_rev_suppressed,
              test_foreign_sf_records_excluded,
              test_round_markers_anchor_field_identical_rounds,
              test_warm_median_normalization,
              test_normalization_sources_never_mixed,
              test_sibling_band_demotes_floor_noise):
        print(t.__name__)
        t()
    if FAILS:
        print(f"\n{len(FAILS)} FAILED: {FAILS}")
        return 1
    print("\nall bench_compare picker tests pass")
    return 0


if __name__ == "__main__":
    sys.exit(main())
