#!/usr/bin/env bash
# N-vs-4N scaling protocol (BASELINE.md): the same spark-submit
# validate job on the SAME prepared input at local[8] and local[32].
# Usage: BENCH/run_scaling.sh [DATA_DIR] [RUNS]
set -euo pipefail
cd "$(dirname "$0")/.."

DATA="${1:-.bench/clips96k}"
RUNS="${2:-3}"
ZIP=/tmp/drivel_spark_bench.zip

python - <<EOF
import zipfile, os
with zipfile.ZipFile("$ZIP", "w") as z:
    for root, _, files in os.walk("drivel_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f); z.write(p, p)
EOF

if [ ! -f "$DATA/meta.json" ]; then
  spark-submit --master "local[16]" --driver-memory 8g --py-files "$ZIP" \
    drivel_spark/job.py prepare --n-rows 96000 --partitions 256 --out "$DATA" \
    2>/dev/null
fi

mkdir -p BENCH
OUT=BENCH/scaling_runs.jsonl
: > "$OUT"
# Primary pair N=2 → 4N=8 (BASELINE.md: sustained-load calibration puts
# the hardware ceiling for 2→8 at ~0.86; the box saturates near 8-16
# effective cores, so 8→32 cannot scale for ANY workload here).
# Levels run INTERLEAVED (2,8,32 per round) so noisy-neighbor windows —
# wall times vary up to 1.6× run-to-run on this VM — hit all levels
# roughly equally instead of biasing one level's batch.  The summary
# reports best-of-k (the machine's capability, robust to neighbor
# noise) alongside the median.
COOLDOWN="${COOLDOWN:-45}"   # sustained load slows this VM over time
for i in $(seq 1 "$RUNS"); do
  for master in "local[2]" "local[8]" "local[32]"; do
    echo "== $master run $i ==" >&2
    spark-submit --master "$master" --driver-memory 8g --py-files "$ZIP" \
      drivel_spark/job.py validate --data "$DATA" --check-audio \
      2>/dev/null | tee -a "$OUT"
    sleep "$COOLDOWN"
  done
done

python - <<'EOF'
import json, statistics
# stray runtime warnings can leak into stdout: keep only the job lines
rows = [json.loads(l) for l in open("BENCH/scaling_runs.jsonl") if l.startswith('{"job"')]
by = {}
for r in rows:
    by.setdefault(r["master"], []).append(r)
summary = {}
for m, rs in by.items():
    summary[m] = {"median_clips_per_sec": statistics.median(r["clips_per_sec"] for r in rs),
                  "best_clips_per_sec": max(r["clips_per_sec"] for r in rs),
                  "walls_s": [r["wall_s"] for r in rs],
                  "digest": sorted({r["passfail_digest"] for r in rs})}
for kind in ("median", "best"):
    t2 = summary["local[2]"][f"{kind}_clips_per_sec"]
    t8 = summary["local[8]"][f"{kind}_clips_per_sec"]
    t32 = summary["local[32]"][f"{kind}_clips_per_sec"]
    summary[f"scaling_efficiency_2_to_8_{kind}"] = round((t8 / t2) / 4.0, 3)
    summary[f"scaling_efficiency_8_to_32_{kind}"] = round((t32 / t8) / 4.0, 3)
# per-round PAIRED efficiencies (round i pairs the interleaved runs, so
# a noisy-neighbor window hits both levels of a pair) + a bootstrap CI
# over unpaired ratios — quantifies the spread behind the medians
import random
pairs = [
    round((b["clips_per_sec"] / a["clips_per_sec"]) / 4.0, 3)
    for a, b in zip(by["local[2]"], by["local[8]"])
]
summary["paired_eff_2_to_8"] = pairs
summary["paired_eff_2_to_8_median"] = round(statistics.median(pairs), 3)
rng = random.Random(42)
t2s = [r["clips_per_sec"] for r in by["local[2]"]]
t8s = [r["clips_per_sec"] for r in by["local[8]"]]
boots = sorted(
    (rng.choice(t8s) / rng.choice(t2s)) / 4.0 for _ in range(10000)
)
summary["eff_2_to_8_ci90"] = [round(boots[500], 3), round(boots[9499], 3)]
digests = [summary[m]["digest"] for m in ("local[2]", "local[8]", "local[32]")]
summary["digests_match"] = all(d == digests[0] for d in digests)
print(json.dumps(summary, indent=2))
with open("BENCH/scaling_summary.json", "w") as fh:
    json.dump(summary, fh, indent=2)
EOF
