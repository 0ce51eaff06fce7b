"""Summarize BENCH/stratified_rounds.jsonl (run_campaign_stratified.sh).

Per round: the interleaved pair's N->4N efficiency next to the round's
independent physical capacity probes.  Output: every round's numbers,
the all-rounds paired median, and the calm-window median under the
PRE-DECLARED criterion (min probe median >= 0.70 across the round's
three probes — collapsed windows measured <= 0.5, calm windows
0.78-1.0; the threshold separates the observed bimodality and is fixed
here, not fitted to the efficiency results).
"""

from __future__ import annotations

import json
import os
import statistics

HERE = os.path.dirname(os.path.abspath(__file__))
CALM_MIN_PROBE = 0.70

rounds = [
    json.loads(l)
    for l in open(os.path.join(HERE, "stratified_rounds.jsonl"))
    if l.strip()
]

out_rounds = []
for r in rounds:
    by = {run["master"]: run for run in r["runs"]}
    eff = round(
        (by["local[8]"]["clips_per_sec"] / by["local[2]"]["clips_per_sec"]) / 4, 3
    )
    probes = [
        r[k]["median"] for k in ("probe_before", "probe_mid", "probe_after")
    ]
    out_rounds.append(
        {
            "round": r["round"],
            "first": r["first"],
            "eff_2_to_8": eff,
            "probe_medians": probes,
            "min_probe": min(probes),
            "calm": min(probes) >= CALM_MIN_PROBE,
            "wall_2": by["local[2]"]["wall_s"],
            "wall_8": by["local[8]"]["wall_s"],
            "digests": sorted({run["passfail_digest"] for run in r["runs"]}),
        }
    )

effs = [r["eff_2_to_8"] for r in out_rounds]
calm = [r["eff_2_to_8"] for r in out_rounds if r["calm"]]
summary = {
    "rounds": out_rounds,
    "n_rounds": len(out_rounds),
    "paired_eff_median_all": round(statistics.median(effs), 3) if effs else None,
    "n_calm_rounds": len(calm),
    "calm_criterion": f"min probe median >= {CALM_MIN_PROBE}",
    "paired_eff_median_calm": round(statistics.median(calm), 3) if calm else None,
    "digest_consistent": all(len(r["digests"]) == 1 for r in out_rounds),
}
print(json.dumps(summary, indent=2))
