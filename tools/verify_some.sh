#!/bin/bash
# Targeted verify+oracle loop: verify_some.sh <sfDir> <substr> [substr...]
# Runs graft.Verify for each name substring into one out dir, filters the
# dumped oracle_sql.json to the dirs actually present (check_oracle.py
# iterates the full board otherwise — round-15 note), then compares.
set -e
SF="$1"; shift
OUT=/tmp/vsome
rm -rf "$OUT"
for q in "$@"; do
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify $SF $OUT $q" \
    2>&1 | grep -E '\[verify\].*failed' || true
  cp "$OUT/oracle_sql.json" "$OUT/oracle_sql.$q.json"
done
python3 - "$OUT" <<'EOF'
import json, os, sys, glob
out = sys.argv[1]
o = {}
for f in glob.glob(f"{out}/oracle_sql.*.json"):
    o.update(json.load(open(f)))
o = {k: v for k, v in o.items() if os.path.isdir(f"{out}/{k}")}
json.dump(o, open(f"{out}/oracle_sql.json", "w"))
print(f"merged oracle_sql.json to {len(o)} present queries")
EOF
python3 tools/check_oracle.py "$SF" "$OUT"
