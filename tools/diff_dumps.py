#!/usr/bin/env python3
"""Row-exact diff of two graft.Verify output dirs (e.g. local[8] vs
local[16] runs) — substantiates the parallelism-independence claim:
partial-aggregation order and partition layout must not move a value.

Usage: diff_dumps.py <dirA> <dirB>

For every query present in either dir: read both parquet results,
sort columns by name and rows by value (the check_oracle convention),
and compare exactly. Reports per-query OK/MISMATCH/MISSING.
"""
import sys

import duckdb


def main():
    a, b = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    qa = {d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d))}
    qb = {d for d in os.listdir(b) if os.path.isdir(os.path.join(b, d))}
    ok = bad = 0
    for q in sorted(qa | qb):
        if q not in qa or q not in qb:
            print(f"MISSING {q}: only in {'B' if q not in qa else 'A'}")
            bad += 1
            continue
        ra = con.execute(
            f"SELECT * FROM '{a}/{q}/*.parquet'").fetchdf()
        rb = con.execute(
            f"SELECT * FROM '{b}/{q}/*.parquet'").fetchdf()
        ra = ra[sorted(ra.columns)]
        rb = rb[sorted(rb.columns)]
        if list(ra.columns) != list(rb.columns):
            print(f"MISMATCH {q}: columns {list(ra.columns)} "
                  f"vs {list(rb.columns)}")
            bad += 1
            continue
        sa = sorted(map(repr, ra.itertuples(index=False, name=None)))
        sb = sorted(map(repr, rb.itertuples(index=False, name=None)))
        if sa != sb:
            diffs = [i for i, (x, y) in enumerate(zip(sa, sb)) if x != y]
            print(f"MISMATCH {q}: {len(sa)} vs {len(sb)} rows, first "
                  f"diff {sa[diffs[0]] if diffs else '(row count)'}")
            bad += 1
        else:
            ok += 1
    print(f"== {ok} identical, {bad} differ ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
