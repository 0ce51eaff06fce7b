"""Render BENCH/BASELINE.md from scaling_runs.jsonl + the calibration
numbers.  Run after appending rounds (BENCH/run_round.sh).

The log can contain campaigns on multiple prepared tables (n_rows
differ); the PROTOCOL table is the largest one (overhead amortization,
../BASELINE.md) — smaller tables are reported as the
overhead-sensitivity ablation."""

from __future__ import annotations

import json
import os
import random
import statistics

HERE = os.path.dirname(os.path.abspath(__file__))

rows = [
    json.loads(l)
    for l in open(os.path.join(HERE, "scaling_runs.jsonl"))
    if l.startswith('{"job"')
]
protocol_n = max(r["n_rows"] for r in rows)
prot = [r for r in rows if r["n_rows"] == protocol_n]
abl_ns = sorted({r["n_rows"] for r in rows} - {protocol_n})

seq: dict[str, list[dict]] = {}
for r in prot:
    seq.setdefault(r["master"], []).append(r)

digests = sorted({r["passfail_digest"] for r in prot})


def thr(m, kind):
    vals = [r["clips_per_sec"] for r in seq[m]]
    return max(vals) if kind == "best" else statistics.median(vals)


rounds = min(len(seq["local[2]"]), len(seq["local[8]"]))
paired = [
    (seq["local[8]"][i]["clips_per_sec"] / seq["local[2]"][i]["clips_per_sec"]) / 4
    for i in range(rounds)
]
paired_med = statistics.median(paired)

# the current-scheduler-config campaign (runs tagged since r03): the
# pairing + bootstrap live in ONE place — summarize_scaling.py — and
# this report reads its JSON (regenerating it if absent/stale) so the
# two outputs can never disagree
import subprocess
import sys

_summary = json.loads(
    subprocess.run(
        [sys.executable, os.path.join(HERE, "summarize_scaling.py")],
        check=True,
        capture_output=True,
        text=True,
    ).stdout
)
_cur = _summary.get(f"n_rows={protocol_n}", {}).get("current_config")
SCHED_CONFIG_TAG = _cur["tag"] if _cur else None
cur_paired = _cur["paired_eff_2_to_8"] if _cur else []
cur_med = _cur["paired_eff_2_to_8_median"] if _cur else None
cur_ci = tuple(_cur["paired_median_ci90"]) if _cur and len(cur_paired) >= 3 else None

lines = [
    "# BENCH/BASELINE.md — measured scaling results (protocol: ../BASELINE.md)",
    "",
    f"Input: deterministic seed-42 clip table, **{protocol_n:,} clips with WAV audio**",
    "(~80KB/clip), built once by `prepare`; identical input, identical Spark",
    "conf at every level except the master string.  Job: the full validation",
    "batch (pass-1 profile, all row constraints incl. decoded-PCM SNR>=30dB,",
    "uniqueness exact confirm, referential anti-joins, report materialization).",
    "",
    f"Pass/fail digest at every level and layout: `{digests[0]}` "
    f"({'MATCH' if len(digests) == 1 else 'MISMATCH: ' + str(digests)}) — the",
    "per-partition pass/fail rows are byte-identical across parallelism",
    "levels, file layouts, independent re-preparations of the table, and",
    "every scheduler config the campaign spans.",
    "",
    "| master | walls (s) | median clips/s | best clips/s |",
    "|---|---|---|---|",
]
for m in ("local[2]", "local[8]", "local[32]"):
    if m not in seq:
        continue  # large-table campaigns interleave only the N→4N pair
    walls = ", ".join(f"{r['wall_s']:.1f}" for r in seq[m])
    lines.append(f"| {m} | {walls} | {thr(m,'median'):.1f} | {thr(m,'best'):.1f} |")

best_eff = (thr("local[8]", "best") / thr("local[2]", "best")) / 4
med_eff = (thr("local[8]", "median") / thr("local[2]", "median")) / 4

_rng = random.Random(42)
_t2 = [r["clips_per_sec"] for r in seq["local[2]"]]
_t8 = [r["clips_per_sec"] for r in seq["local[8]"]]
_boots = sorted((_rng.choice(_t8) / _rng.choice(_t2)) / 4 for _ in range(10000))
ci_lo, ci_hi = _boots[500], _boots[9499]
lines += [
    "",
    "## N -> 4N scaling efficiency (primary pair local[2] -> local[8])",
    "",
    f"- full-log paired-round median: {paired_med:.3f} ("
    + ("meets" if paired_med >= 0.8 else "misses")
    + " the >=0.8 criterion, BASELINE.json north_rule).  This estimator",
    "  includes every protocol pair ever logged on this table — including",
    "  two early pairs measured inside a capacity-collapse window BEFORE",
    "  the probe harness existed (a simultaneous 192k control round",
    "  measured local[8] == local[2] wall, i.e. the VM was delivering ~2",
    "  effective cores; no job can evidence scaling there).  The",
    "  AUTHORITATIVE r03 reading is the condition-stratified campaign",
    "  below, whose every pair carries same-window physical evidence.",
    "  Estimator rationale: the box is shared and noise waves hit the two",
    "  levels at different times, so only same-round interleaved pairs are",
    "  apples-to-apples; unpaired estimators mix a quiet local[8] run with",
    "  a noisy local[2] run (or vice versa) and understate the ratio.",
    f"- median-of-levels: {med_eff:.3f} ("
    + ("meets" if med_eff >= 0.8 else "misses")
    + f" the gate); best-of-campaign: {best_eff:.3f} ("
    + ("meets" if best_eff >= 0.8 else "misses")
    + " the gate) —",
    "  every estimator is stated against the gate explicitly (ADVICE",
    "  r02) so the headline can never be the one cherry-picked reading.",
    f"- per-round paired values: "
    + ", ".join(f"{e:.3f}" for e in paired)
    + " (values >1 = the local[2] partner run was hit by neighbor noise;",
    "  the spread is environment, not engine, variance)",
    f"- bootstrap 90% CI over unpaired ratios: [{ci_lo:.3f}, {ci_hi:.3f}]"
    f" ({rounds} interleaved rounds)",
]
try:
    _strat = json.loads(
        subprocess.run(
            [sys.executable, os.path.join(HERE, "summarize_stratified.py")],
            check=True,
            capture_output=True,
            text=True,
        ).stdout
    )
except (FileNotFoundError, subprocess.CalledProcessError):
    _strat = None
if _strat and _strat["n_rounds"]:
    _sr = _strat["rounds"]
    lines += [
        "",
        "### Condition-stratified campaigns (r03 protocol; cumulative log)",
        "",
        "The r03 VM showed capacity-collapse waves an order worse than",
        "r02's (a 192k validate measured local[8] == local[2] wall — the",
        "machine delivered ~2 effective cores — while the same table",
        "paired 0.73-0.84 at r02).  Each r03 round therefore brackets the",
        "interleaved pair with an independent physical probe of the",
        "window's 2->8 capacity (BENCH/mem_bandwidth_paired.py — pure",
        "numpy streaming, no Spark, no engine code), and rounds are",
        "stratified by a PRE-DECLARED criterion.  One interrupted-campaign",
        "pair was QUARANTINED from the protocol log",
        "(BENCH/scaling_runs_quarantined.jsonl): its local[2] half ran",
        "concurrently with diagnostic jobs, producing a flattering-but-",
        "meaningless 1.54 'efficiency' that would have inflated the",
        "median.  Rounds are stratified"
        f" ({_strat['calm_criterion']}; collapsed windows probe <= 0.5,",
        "calm windows 0.78-1.0 — the threshold splits the observed",
        "bimodality and is fixed in summarize_stratified.py, not fitted",
        "to the efficiency results):",
        "",
        "| round | order | paired eff | probe medians (before/mid/after) | calm? |",
        "|---|---|---|---|---|",
    ]
    for r in _sr:
        lines.append(
            f"| {r['round']} | {r['first']} first | {r['eff_2_to_8']:.3f} | "
            + "/".join(f"{p:.2f}" for p in r["probe_medians"])
            + f" | {'yes' if r['calm'] else 'no'} |"
        )
    _all_m = _strat["paired_eff_median_all"]
    _calm_m = _strat["paired_eff_median_calm"]
    lines += [
        "",
        "(Historical note: one early-r05 round was excluded from the",
        "calm window by its OWN before-probe (0.37) — builder test runs",
        "overlapped the start of that pair, the bracketing protocol",
        "catching exactly the contamination it was designed for.  Its",
        "0.936 efficiency and matching digest are logged but carry no",
        "calm-window weight.  The r05 campaign ran 7 further calm rounds:",
        "0.932/0.970/0.866/0.885 then 0.847/0.709/0.969 — the 0.709 round's",
        "own probes were calm, so it stays in the window on its merits.)",
        "",
        f"- all-rounds paired median: {_all_m:.3f} ("
        + ("meets" if _all_m >= 0.8 else "misses")
        + " the >=0.8 gate) — this number includes windows where the",
        "  probe shows the HARDWARE itself cannot scale 2->8.",
    ]
    if _calm_m is not None:
        lines += [
            f"- calm-window paired median ({_strat['n_calm_rounds']} rounds): "
            f"**{_calm_m:.3f}** ("
            + ("meets" if _calm_m >= 0.8 else "misses")
            + " the >=0.8 gate) — the engine's scaling when the box can",
            "  physically deliver it; the stratification evidence is the",
            "  probe column above, not the efficiency outcomes.",
        ]
    else:
        lines += [
            "- no calm windows occurred during the campaign; the engine's",
            "  achievable ratio is bounded by the environment rows above.",
        ]
if cur_med is not None:
    lines += [
        "",
        f"### Current-config campaign ({SCHED_CONFIG_TAG})",
        "",
        "The append-only log spans scheduler-policy history; runs are",
        "tagged with their policy since r03.  The subset below is the",
        "cleanest apples-to-apples reading — one policy, one code",
        "version, every round interleaved:",
        "",
        f"- rounds: {len(cur_paired)}; paired efficiencies: "
        + ", ".join(f"{e:.3f}" for e in cur_paired),
        f"- **paired-round median: {cur_med:.3f}** ("
        + ("meets" if cur_med >= 0.8 else "misses")
        + " the >=0.8 gate)"
        + (
            f"; bootstrap 90% CI of the median (paired resamples): "
            f"[{cur_ci[0]:.3f}, {cur_ci[1]:.3f}]"
            if cur_ci
            else ""
        ),
    ]
try:
    _ceil = json.load(open(os.path.join(HERE, "cpu_ceiling_r03.json")))
    _ceil_line = (
        f"- same-day hardware context (BENCH/cpu_ceiling_paired.py, "
        f"{_ceil['rounds']} paired rounds): pure-CPU 2->8 per-core ratio "
        f"median {_ceil['median']:.2f}, spread "
        f"[{_ceil['min']:.2f}, {_ceil['max']:.2f}] — the box shows no"
    )
    lines_ceiling = [
        _ceil_line,
        "  per-core throttle penalty from 2->8 busy cores, but aggregate",
        "  noise waves swing even identical back-to-back probes by the",
        "  published spread; r02's sustained one-shot calibration read",
        "  ~0.86 under that day's load (BENCH/cpu_ceiling.py).",
    ]
except FileNotFoundError:
    lines_ceiling = [
        "- hardware ceiling for 2->8 on this VM (sustained-load calibration,",
        "  BENCH/cpu_ceiling.py): ~0.86 for pure-CPU work.",
    ]
lines += lines_ceiling + [
    "",
    "The box is shared: wall times vary in waves — up to 1.6x run-to-run",
    "during the r02 campaign, up to 2.7x between back-to-back identical",
    "runs during r03.  Mitigations, in order of leverage: (1) the",
    "protocol table is sized so every run is long enough to integrate",
    "over multiple waves (the r02 10-round campaign's weakness was",
    "~55s local[8] walls sitting inside single waves); (2) levels run",
    "interleaved per round, alternating which level goes first (ABBA)",
    "so cache warmth and intra-round wave trends cancel; (3) the",
    "per-round paired values are the apples-to-apples reading and the",
    "median over rounds is the headline.",
]
if abl_ns:
    lines += [
        "",
        "## Smaller-table ablation",
        "",
        f"Campaign(s) on {', '.join(f'{n:,}' for n in abl_ns)}-clip tables are",
        "retained in the log: an Amdahl fit to the best-of walls shows a",
        "fixed per-job cost of ~15-18s (planning + python-worker spin-up +",
        "first-scan warmup) that a 4N-core run cannot parallelize — at 96k",
        "clips it is ~12% of the local[2] wall, at 192k ~9% of the",
        "local[8] wall (capping 2->8 efficiency at ~0.77 even with perfect",
        "parallel scaling), and at the protocol size it shrinks enough to",
        "lift the cap above 0.9 — the quantified reason the protocol",
        "table is the large one.",
    ]
lines += [
    "",
    "## local[32] (context, not a pair)",
    "",
    "Sustained calibration shows the VM saturates near 8-16 effective",
    "cores (16 phys x 2 HT or an aggregate quota), and one local JVM's",
    "Arrow JVM->Python streaming collapses above ~8 concurrent streams",
    "(2GB in ~17s at 8 streams vs ~57s at 32).  local[32] numbers are",
    "hardware-capped, not engine behavior; the job caps byte-heavy UDF",
    "stages at 8 streams per local JVM (a real executor JVM has 4-8",
    "cores, so a real cluster never sees this shape).",
    "",
    "Raw runs: BENCH/scaling_runs.jsonl; summary: BENCH/scaling_summary.json.",
]
# preserve hand-maintained trailing sections of the existing file: the
# r03 bench-variance note (historical prose) and the marker-delimited
# per-query baseline table (regenerated by write_perquery_md.py)
_path = os.path.join(HERE, "BASELINE.md")
_tail = []
try:
    _old = open(_path).read()
    for anchor in ("## r03 bench.py variance note", "<!-- PERQUERY:BEGIN -->"):
        if anchor in _old:
            _old = _old[_old.index(anchor):]
            _tail = ["", _old.rstrip()]
            break
except FileNotFoundError:
    pass
with open(_path, "w") as fh:
    fh.write("\n".join(lines + _tail) + "\n")
print("\n".join(lines[:30]))
