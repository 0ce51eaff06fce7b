"""SparkSession construction with the engine's scale-oriented defaults.

One place owns the conf so local tests, bench runs, and spark-submit
jobs agree: AQE on (runtime coalesce + skew-join split), Arrow on
(every UDF in this engine is pandas/Arrow-vectorized), shuffle
partitions scaled with cores, Arrow batches capped so wide binary
(audio) columns don't blow executor memory (SURVEY.md §7.4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Batch sizing for Python-boundary Arrow streams.  r01–r05 capped
# maxRecordsPerBatch at 256 rows so ~130KB/clip binary audio rows
# couldn't blow worker memory — but that row cap applied to EVERY
# mapInPandas/pandas_udf in the engine, so narrow tables (600k-row
# lineitem, documents) crossed in thousands of tiny batches whose
# per-batch JVM framing + Python dispatch dominated (measured r06:
# grouped_profile 2.0s → 0.7s, schema_diff 3.3s → 2.6s at 8192).
# Spark 4's BYTE cap (`spark.sql.execution.arrow.maxBytesPerBatch`,
# verified live: 8MB cap → ~47×100KB rows per batch) bounds wide-row
# batches directly, so the row cap can be raised to 8192 while audio
# payload batches stay ≈32MB (~250 clips) — the same protection the
# old row cap gave, without taxing narrow rows.
DEFAULT_ARROW_BATCH = int(os.environ.get("DRIVEL_ARROW_BATCH", "8192"))
DEFAULT_ARROW_BATCH_BYTES = int(
    os.environ.get("DRIVEL_ARROW_BATCH_BYTES", str(32 << 20))
)
# Parquet vectorized-reader batch: 1024 rows ≈ 4× the old 256 (less
# per-batch overhead on narrow scans) while a worst-case 130KB-row
# binary scan still bounds at ~130MB per in-flight task batch — safe
# under the 8-stream cap on byte-heavy stages.  (Spark has no byte cap
# for this reader, so the row count stays conservative; 4096 would be
# ~0.5GB/task on audio tables.)
DEFAULT_PARQUET_BATCH = int(os.environ.get("DRIVEL_PARQUET_BATCH", "1024"))

# Scan-split sizing: with per-row pandas-UDF work (SNR decode) the cost
# of a partition is driven by ROW COUNT, not bytes; the 128MB default
# packs a GB-scale audio table into ~a dozen partitions and caps
# parallelism below the core count.  32MB keeps ≳2 waves of tasks per
# core on local[32] for multi-GB inputs while still giving ~full-size
# splits to 100TB tables on a 1000-executor cluster (tune per deploy).
DEFAULT_MAX_PARTITION_BYTES = os.environ.get("DRIVEL_MAX_PARTITION_BYTES", "33554432")


# Job-scheduling policy, MEASURED on the validation workload
# (48k-clip table, local[32], back-to-back A/B via spark-submit):
#
#   default pool FIFO:  29.4s wall  (1,631 clips/s)
#   default pool FAIR:  38.1s wall  (1,261 clips/s)
#
# Strict fair-share within the pool timeshares cores ACROSS jobs, which
# stretches the critical path: the audio-decode scan (the job that sets
# the batch wall clock) gets a fraction of the cores whenever the small
# concurrent jobs (uniqueness shuffle, referential anti-joins, profile)
# have runnable tasks.  Within-pool FIFO already gives the concurrency
# the engine needs — Spark's FIFO scheduler backfills idle slots with
# later jobs' tasks once the head job's pending tasks are placed (the
# byte-heavy stage is capped at 8 streams, so 24 of 32 cores are
# backfillable) — while letting the critical job run unthrottled.  So:
# scheduler mode stays FAIR (callers can still isolate work in weighted
# pools via spark.scheduler.pool), but the default pool is explicitly
# FIFO.  Written driver-local at session build time (a packaged file
# inside a --py-files zip has no filesystem path).
# The "critical" pool exists for the one job per batch that sets the
# wall clock (the audio-decode flag materialization): weight 8 keeps it
# core-rich whenever it has runnable tasks, while its 8-stream cap
# leaves the remaining cores to the default pool's concurrent jobs —
# overlap WITHOUT stretching the critical path.  validate() assigns the
# pool via sc.setLocalProperty("spark.scheduler.pool", ...) on the
# materializing thread (thread-local, so only that job is promoted).
# identifies the scheduler policy in benchmark run records, so scaling
# campaigns across config changes stay separable in the append-only log
SCHED_CONFIG_TAG = "fifo-default+critical-w8"

_FAIR_XML = """<?xml version="1.0"?>
<allocations>
  <pool name="default">
    <schedulingMode>FIFO</schedulingMode>
    <weight>1</weight>
    <minShare>0</minShare>
  </pool>
  <pool name="critical">
    <schedulingMode>FIFO</schedulingMode>
    <weight>8</weight>
    <minShare>8</minShare>
  </pool>
</allocations>
"""


def _fair_allocation_file() -> str:
    import tempfile

    # per-uid filename: a fixed world-shared /tmp name would belong to
    # whichever user wrote it first, and os.replace over another user's
    # file fails in a sticky /tmp once the XML content changes
    path = os.path.join(
        tempfile.gettempdir(), f"drivel_fairscheduler_{os.getuid()}.xml"
    )
    try:
        with open(path) as fh:
            if fh.read() == _FAIR_XML:
                return path
    except OSError:
        pass
    tmp = f"{path}.{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write(_FAIR_XML)
    os.replace(tmp, path)
    return path


def build_session(
    app_name: str = "drivel-spark",
    master: str | None = None,
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    under_submit = (
        "PYSPARK_GATEWAY_PORT" in os.environ  # spark-submit's PythonRunner gateway
        or "PYSPARK_SUBMIT_ARGS" in os.environ
    )
    if master is None and not under_submit:
        # under spark-submit the master comes from the submit args; only
        # default to local[] when building a session programmatically
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        # 2× cores: enough parallelism for local mode without tiny-task
        # overhead; cluster deployments override per data volume
        shuffle_partitions = max(2 * cores, 8)
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(DEFAULT_ARROW_BATCH))
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(DEFAULT_ARROW_BATCH_BYTES))
        .config("spark.sql.parquet.columnarReaderBatchSize", str(DEFAULT_PARQUET_BATCH))
        .config("spark.sql.files.maxPartitionBytes", DEFAULT_MAX_PARTITION_BYTES)
        .config("spark.sql.session.timeZone", "UTC")
        # FAIR job scheduling: the validate pass runs its independent
        # actions (row-flag materialization, uniqueness shuffle,
        # referential anti-join) from concurrent driver threads; FAIR
        # keeps the small jobs from queueing behind the heavy decode
        # scan, which is what makes the wall clock scale with cores
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.scheduler.allocation.file", _fair_allocation_file())
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
