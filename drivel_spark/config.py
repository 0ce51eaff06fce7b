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

# ~100KB audio clips × 2048 rows ≈ 200MB per Arrow batch worst case;
# keep batches moderate so pandas UDFs over binary columns stay in RAM
DEFAULT_ARROW_BATCH = 2048


def build_session(
    app_name: str = "drivel-spark",
    master: str | None = None,
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        # 2× cores: enough parallelism for local mode without tiny-task
        # overhead; cluster deployments override per data volume
        shuffle_partitions = max(2 * cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(DEFAULT_ARROW_BATCH))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
