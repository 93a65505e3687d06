#!/usr/bin/env bash
# One-command local replica of the driver's correctness gate:
#   1. graft.Verify at sf0.01 → parquet dumps + oracle_sql.json
#   2. tools/oracle_check.py → per-query rows/schema/hash vs DuckDB
#   3. summary + diff vs the latest committed CORRECTNESS_r*.json
# Usage: tools/verify_all.sh [sfDir] [outDir]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/verify_local}"

echo "== 1/3 graft.Verify $SF_DIR -> $OUT_DIR"
rm -rf "$OUT_DIR"
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR" >/tmp/verify_all_sbt.log 2>&1 || {
  echo "Verify FAILED; tail of /tmp/verify_all_sbt.log:"; tail -30 /tmp/verify_all_sbt.log; exit 1; }

echo "== 2/3 DuckDB oracle"
ORACLE_RC=0
python3 tools/oracle_check.py "$SF_DIR" "$OUT_DIR" | tee /tmp/verify_all_oracle.out || ORACLE_RC=$?

echo "== 3/3 summary vs committed driver artifact"
python3 - <<'EOF'
import json, sys, glob
res = json.load(open("/tmp/oracle_check_results.json"))
bad = {k: v for k, v in res.items() if not v.get("exact")}
print(f"{len(res) - len(bad)}/{len(res)} exact")
prior = sorted(glob.glob("CORRECTNESS_r*.json"))
if prior:
    drv = json.load(open(prior[-1]))
    gone = sorted(set(drv) - set(res)); new = sorted(set(res) - set(drv))
    if gone: print("queries missing vs", prior[-1], ":", gone)
    if new: print("queries new vs", prior[-1], ":", new)
for k, v in sorted(bad.items()):
    print("FAIL", k, json.dumps(v)[:300])
sys.exit(1 if bad else 0)
EOF
exit $ORACLE_RC
