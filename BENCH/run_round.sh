#!/usr/bin/env bash
# ONE interleaved scaling round (local[2], local[8], local[32] on the
# same input), APPENDING to BENCH/scaling_runs.jsonl — lets a campaign
# be driven as k independent round invocations.  Summarize with
# BENCH/summarize_scaling.py.
set -euo pipefail
cd "$(dirname "$0")/.."
DATA="${1:-.bench/clips96k}"
ZIP=/tmp/drivel_spark_bench.zip
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
COOLDOWN="${COOLDOWN:-45}"
# LEVELS overrides the interleave set, e.g. LEVELS="local[2] local[8]"
# for a 2→8-only campaign on a large table (local[32] is hardware-capped
# context on this VM, not part of the N→4N pair — BENCH/BASELINE.md)
LEVELS="${LEVELS:-local[2] local[8] local[32]}"
for master in $LEVELS; do
  echo "== $master ==" >&2
  spark-submit --master "$master" --driver-memory 8g --py-files "$ZIP" \
    drivel_spark/job.py validate --data "$DATA" --check-audio \
    2>/dev/null | tee -a BENCH/scaling_runs.jsonl
  sleep "$COOLDOWN"
done
