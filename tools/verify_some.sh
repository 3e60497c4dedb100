#!/bin/bash
# Targeted verify+oracle loop: verify_some.sh <sfDir> <substr> [substr...]
# Runs graft.Verify for each name substring into one out dir, filters the
# dumped oracle_sql.json to the dirs actually present (check_oracle.py
# iterates the full board otherwise — round-15 note), then compares.
#
# pipefail + per-query exit check + oracle_sql.json removal (round 21,
# ADVICE r20): under plain `set -e` the `| grep || true` swallowed a
# nonzero sbt/Verify exit (compile error, crash), and a leftover
# oracle_sql.json from the PREVIOUS query made the cp below silently
# compare a failed run against stale SQL.
set -eo pipefail
SF="$1"; shift
OUT=/tmp/vsome
rm -rf "$OUT"
for q in "$@"; do
  rm -f "$OUT/oracle_sql.json"
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify $SF $OUT $q" \
    > "/tmp/vsome_$q.log" 2>&1 \
    || { echo "VERIFY FAILED for $q — tail of /tmp/vsome_$q.log:";
         tail -5 "/tmp/vsome_$q.log"; exit 1; }
  grep -E '\[verify\].*failed' "/tmp/vsome_$q.log" || true
  [ -f "$OUT/oracle_sql.json" ] \
    || { echo "no oracle_sql.json produced for $q"; exit 1; }
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
