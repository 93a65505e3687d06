#!/bin/bash
# Kill/resume at bench scale (round-4 task): run the full record-linkage
# pipeline on a multi-million-conversation corpus via spark-submit, kill -9
# the JVM mid-connected-components (after the first durable cc_iter
# checkpoint lands), rerun the identical command, and compare the resumed
# run's summary JSON with a clean run's. The resumed run must replay the
# committed stages (mentions..edges) and restart the CC fixpoint from the
# durable iterate, producing the identical cluster count and F1.
#
# Usage: tools/kill_resume_bench.sh [convs=3000000] [base=/dev/shm/pkel-kr]
#
# --cc-reliable-every 1: since the round-5 fixpoint work (window rounds +
# star-forest stop + inputCanonical) the fixpoint converges in 1-2 rounds
# and the DEFAULT cadence (3) never writes a durable iterate — a kill then
# resumes from the committed edges stage, which this script can't
# distinguish from a full CC recompute. Cadence 1 makes every round
# durable, so the kill lands strictly inside the fixpoint past a durable
# iterate — the long-fixpoint regime mid-fixpoint resume exists for.
set -u
cd "$(dirname "$0")/.."
JAR=target/scala-2.13/pk_parameter_entity_linkingspark_2.13-0.1.0.jar
CONVS=${1:-3000000}
BASE=${2:-/dev/shm/pkel-kr}
SUBMIT=(/opt/spark/bin/spark-submit --master "local[32]" --driver-memory 24g
  --conf spark.sql.shuffle.partitions=128
  --conf spark.local.dir=/dev/shm/spark-kr
  --class pkel.app.PipelineApp "$JAR")
SUBMIT+=(--cc-reliable-every 1)
rm -rf "$BASE" /dev/shm/spark-kr && mkdir -p "$BASE"

echo "== clean run ($CONVS convs) =="
"${SUBMIT[@]}" --convs "$CONVS" --out "$BASE/clean" 2>"$BASE/clean.err" \
  | tail -1 | tee "$BASE/clean.json"

echo "== kill run =="
"${SUBMIT[@]}" --convs "$CONVS" --out "$BASE/kr" \
  2>"$BASE/kill.err" >"$BASE/kill.out" &
PID=$!
while kill -0 "$PID" 2>/dev/null; do
  if ls "$BASE"/kr/_cc_checkpoints/*/cc_iter_*/_SUCCESS >/dev/null 2>&1; then
    sleep 2 # be INSIDE the fixpoint, strictly past the first durable write
    echo "killing pid $PID mid-CC"
    pkill -9 -P "$PID" 2>/dev/null
    kill -9 "$PID" 2>/dev/null
    break
  fi
  sleep 1
done
wait "$PID" 2>/dev/null
echo "stage dirs at kill: $(ls "$BASE/kr" | tr '\n' ' ')"
echo "durable CC iterates at kill:"
ls "$BASE"/kr/_cc_checkpoints/*/ 2>/dev/null || echo "  (none)"
COMPONENTS_COMMITTED=no
[ -f "$BASE/kr/components/_COMMIT" ] && COMPONENTS_COMMITTED=yes
echo "components stage committed at kill: $COMPONENTS_COMMITTED (must be no)"

echo "== resume run =="
"${SUBMIT[@]}" --convs "$CONVS" --out "$BASE/kr" 2>"$BASE/resume.err" \
  | tail -1 | tee "$BASE/resume.json"

echo "== compare =="
echo "clean : $(cat "$BASE/clean.json")"
echo "resume: $(cat "$BASE/resume.json")"
python3 - "$BASE/clean.json" "$BASE/resume.json" <<'EOF'
import json, sys
clean = json.load(open(sys.argv[1])); resumed = json.load(open(sys.argv[2]))
keys = ["mentions", "pairs", "edges", "clusters", "pairwise_f1", "pairwise_f1_at_key"]
diff = {k: (clean[k], resumed[k]) for k in keys if clean[k] != resumed[k]}
if diff:
    print(f"MISMATCH after resume: {diff}"); sys.exit(1)
print(f"RESUME OK: identical on {keys}; "
      f"clean wall {clean['wall_sec']}s vs resume wall {resumed['wall_sec']}s")
EOF
