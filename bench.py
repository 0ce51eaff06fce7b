"""Per-round benchmark harness (driver contract).

Runs every query from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, then the headline end-to-end audio-table
validation job (profile pass 1 + full constraint pass 2, audio SNR
invariant included) on a cached deterministic clips table.

Prints exactly ONE JSON line on stdout:
    {"metric": "...", "value": N, "unit": "...",
     "queries": {name: sec, ...}, "sf": ...}

The headline value is end-to-end validation throughput in clips/sec
(BASELINE.json metric).  The N-vs-4N scaling protocol (spark-submit at
local[8] / local[32]) lives in BENCH/run_scaling.sh; this harness is
the fast per-round feedback loop.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# bench times ENGINE paths only: oracle side-table exports (and the
# extra scans that feed them) are correctness-driver work and no-op
# under this flag (VERDICT r02 #1) — the correctness gate runs the
# same queries WITHOUT the flag and still gets every export
os.environ["DRIVEL_ENGINE_ONLY"] = "1"

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# 48k clips (~2GB audio): large enough that throughput reflects the
# engine rather than fixed per-job overhead, small enough to prepare
# in ~2 min when the cache is cold (the table is reused across runs)
BENCH_CLIPS_N = int(os.environ.get("DRIVEL_BENCH_CLIPS", "48000"))
BENCH_CLIPS_DIR = os.path.join(REPO, ".bench", f"clips{BENCH_CLIPS_N}")


def _ensure_clips_table(spark) -> dict:
    """Build the deterministic clips table once; reuse across rounds."""
    meta_path = os.path.join(BENCH_CLIPS_DIR, "meta.json")
    if not os.path.exists(meta_path):
        from drivel_spark.job import cmd_prepare

        class A:  # argparse-shaped
            n_rows = BENCH_CLIPS_N
            partitions = 64
            seed = 42
            variant = "default"
            no_audio = False
            out = BENCH_CLIPS_DIR
            # mirror every cmd_prepare CLI default (job.py argparse);
            # a missing attribute here crashes the whole bench run the
            # first time the cached table is rebuilt
            shared_seg_every = 0

        cmd_prepare(A)
    with open(meta_path) as fh:
        return json.load(fh)


def _warm_page_cache(*dirs: str) -> None:
    """Read every file once so the timed runs measure ENGINE throughput,
    not the VM's cold-disk read speed.  r01's numbers were implicitly
    cache-warm (the bench built the clips table in the same round, so
    its pages were resident); once the table persists across rounds the
    first read hits cold virtio disk and the headline conflates the two.
    The scaling campaign (BENCH/run_round.sh) keeps cold spark-submit
    runs; this per-round harness pins the cache-warm protocol."""
    buf = bytearray(1 << 20)
    for d in dirs:
        for root, _, files in os.walk(d):
            for f in files:
                try:
                    with open(os.path.join(root, f), "rb", buffering=0) as fh:
                        while fh.readinto(buf):
                            pass
                except OSError:
                    pass


def _run_validation(spark, sf_dir: str) -> tuple[float, dict]:
    """The headline job: returns (clips_per_sec, detail)."""
    import argparse

    from drivel_spark.job import cmd_validate

    args = argparse.Namespace(
        data=BENCH_CLIPS_DIR,
        baseline=None,
        checkpoint=None,
        run_id="bench",
        check_audio=True,
        n_scopes=64,
        report=None,
    )
    out = cmd_validate(args)
    return out["clips_per_sec"], out


def main() -> None:
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    sf = 0.1
    for tok in os.path.basename(sf_dir.rstrip("/")).split("sf")[-1:]:
        try:
            sf = float(tok)
        except ValueError:
            pass

    from drivel_spark.config import build_session

    spark = build_session("drivel-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    timings: dict[str, float] = {}

    # headline FIRST, on a clean session: residual caches from the
    # query sweep (e.g. persisted shingle tables) cost ~3× on the
    # validation wall clock
    _ensure_clips_table(spark)
    _warm_page_cache(BENCH_CLIPS_DIR, sf_dir)
    try:
        thr, detail = _run_validation(spark, sf_dir)
        timings["clips_validate_e2e"] = detail["wall_s"]
        headline = thr
    except Exception:
        traceback.print_exc(file=sys.stderr)
        headline, detail = -1.0, {}
    spark.catalog.clearCache()

    # median-of-3 per query (VERDICT r03 #3): this VM shows 2.7× noise
    # waves, and a single sample can't distinguish a scheduler-wave
    # artifact from a real regression.  min/max go to the side file.
    # clamp: reps < 1 would leave `samples` empty and crash the median
    # indexing below with an opaque IndexError (ADVICE r04)
    reps = max(1, int(os.environ.get("DRIVEL_BENCH_REPS", "3")))
    spread: dict[str, dict] = {}
    for name, fn in entry.queries().items():
        samples = []
        for _ in range(reps):
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.collect()
                samples.append(round(time.time() - t0, 3))
            except Exception:
                traceback.print_exc(file=sys.stderr)
                samples.append(-1.0)
                break
            finally:
                spark.catalog.clearCache()
        samples.sort()
        # a failed rep must dominate: reporting the median of the
        # successful reps would ship a breakage as a healthy baseline row
        timings[name] = -1.0 if -1.0 in samples else samples[len(samples) // 2]
        spread[name] = {"min": samples[0], "max": samples[-1], "n": len(samples)}

    # stdout line: keep it SHORT so the driver's capture window parses it
    # (VERDICT r04 #2 — even with headline fields last, the 74-entry
    # queries dict overflowed the front of the window and "parsed" stayed
    # null).  The per-query timings + spread live ONLY in the side file.
    result = {
        "passfail_digest": detail.get("passfail_digest"),
        "master": detail.get("master"),
        "n_clips": BENCH_CLIPS_N,
        "sf": sf,
        "queries": timings,
        "metric": "e2e_validation_throughput",
        "unit": "clips/sec",
        "value": headline,
    }
    # full detail (incl. per-query min/max spread) to a side file that
    # can't be truncated
    os.makedirs(os.path.join(REPO, ".bench"), exist_ok=True)
    with open(os.path.join(REPO, ".bench", "bench_latest.json"), "w") as fh:
        json.dump({**result, "spread": spread, "reps": reps}, fh, indent=2)
    stdout_line = {k: v for k, v in result.items() if k != "queries"}
    sys.stdout.write(json.dumps(stdout_line) + "\n")
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
