"""Summarize BENCH/scaling_runs.jsonl (shared by run_scaling.sh
and the chunked run_round.sh campaign driver)."""
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
