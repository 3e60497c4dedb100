#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB against the sf parquet tables,
and compares: columns sorted by name, rows sorted, exact values.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).df()
            oracle_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        sa = spark_df[sorted(spark_df.columns)]
        ob = oracle_df[sorted(oracle_df.columns)]
        if list(sa.columns) != list(ob.columns):
            print(f"FAIL {name}: columns {list(sa.columns)} vs {list(ob.columns)}")
            n_fail += 1
            continue
        # The driver's compare hashes value REPRESENTATIONS, so an
        # int-vs-float column skew is a FAIL there even when Python's
        # lenient == passes (123 == 123.0): e.g. DuckDB returns a bare
        # SUM(int) as HUGEINT -> pandas float64 while Spark emits int64
        # ("13298" vs "13298.0"). Width skews (int32 vs int64) hash the
        # same, so compare dtype KINDS, not exact dtypes. Skip the gate
        # for columns with no non-null value on either side (incl. both
        # frames empty): with nothing to infer from, pandas picks
        # object-vs-float64 arbitrarily, and the driver's hash agrees on
        # zero/None representations anyway.
        comparable = [c for c in sa.columns
                      if sa[c].notna().any() and ob[c].notna().any()]
        da = [sa[c].dtype.kind for c in comparable]
        db = [ob[c].dtype.kind for c in comparable]
        if da != db:
            print(f"FAIL {name}: dtype-kind skew "
                  f"{[c for c, x, y in zip(comparable, da, db) if x != y]}: "
                  f"{da} vs {db}")
            n_fail += 1
            continue
        ra = sorted([tuple(norm_cell(v) for v in row)
                     for row in sa.itertuples(index=False)],
                    key=lambda r: tuple(str(x) for x in r))
        rb = sorted([tuple(norm_cell(v) for v in row)
                     for row in ob.itertuples(index=False)],
                    key=lambda r: tuple(str(x) for x in r))
        if len(ra) != len(rb):
            print(f"FAIL {name}: rows {len(ra)} vs {len(rb)}")
            n_fail += 1
            continue
        bad = [(x, y) for x, y in zip(ra, rb) if x != y]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(ra)} mismatched rows; "
                  f"first: {bad[0][0]} vs {bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(ra)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(oracles)} oracles ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
