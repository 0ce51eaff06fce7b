#!/usr/bin/env bash
# Condition-stratified scaling campaign (r03).
#
# On days when the shared VM's deliverable capacity collapses in waves
# (r03: a 192k validate ran local[8] == local[2] wall — 0.26 paired
# "efficiency" — while the SAME table paired 0.73-0.84 at r02), a raw
# paired median measures the neighbors, not the engine.  Each round
# therefore brackets the interleaved pair with an independent physical
# probe of the window's 2->8 capacity (BENCH/mem_bandwidth_paired.py:
# pure numpy streaming, no Spark, no engine code), recorded NEXT TO the
# pair in BENCH/stratified_rounds.jsonl.  The analysis reports BOTH the
# all-rounds paired median and the calm-window (probe >= threshold)
# median — the stratification criterion is this physical measurement,
# fixed here in advance, so the split is falsifiable rather than
# post-hoc selection.
#
# Usage: BENCH/run_campaign_stratified.sh [DATA_DIR] [ROUNDS]
set -uo pipefail
cd "$(dirname "$0")/.."
DATA="${1:-.bench/clips576k}"
ROUNDS="${2:-6}"
ZIP=/tmp/drivel_spark_bench.zip
OUT=BENCH/stratified_rounds.jsonl
COOLDOWN="${COOLDOWN:-45}"

if [ ! -f "$ZIP" ]; then
  python - <<PYEOF
import zipfile, os
with zipfile.ZipFile("$ZIP", "w") as z:
    for root, _, files in os.walk("drivel_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f); z.write(p, p)
PYEOF
fi

probe() {
  python BENCH/mem_bandwidth_paired.py 2 2>/dev/null
}

run_level() {
  spark-submit --master "$1" --driver-memory 8g --py-files "$ZIP" \
    drivel_spark/job.py validate --data "$DATA" --check-audio \
    2>/dev/null | tee -a BENCH/scaling_runs.jsonl
}

for i in $(seq 1 "$ROUNDS"); do
  # ABBA: alternate which level goes first so cache warmth and
  # intra-round wave trends cancel across rounds
  if [ $((i % 2)) -eq 1 ]; then A="local[2]"; B="local[8]"; else A="local[8]"; B="local[2]"; fi
  echo "=== stratified round $i ($A then $B) ===" >&2
  P1=$(probe)
  RA=$(run_level "$A")
  P2=$(probe)
  RB=$(run_level "$B")
  P3=$(probe)
  python - "$i" "$A" "$P1" "$RA" "$P2" "$RB" "$P3" <<'PYEOF' >> "$OUT"
import json, sys
i, a, p1, ra, p2, rb, p3 = sys.argv[1:8]
rec = {
    "round": int(i), "first": a,
    "probe_before": json.loads(p1), "probe_mid": json.loads(p2),
    "probe_after": json.loads(p3),
    "runs": [json.loads(ra), json.loads(rb)],
}
print(json.dumps(rec))
PYEOF
  sleep "$COOLDOWN"
done
echo STRATIFIED_CAMPAIGN_DONE >&2
