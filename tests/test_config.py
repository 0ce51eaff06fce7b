"""Session conf: the scale-oriented defaults must actually take effect."""

import os


def test_scheduling_policy_effective(spark):
    """Scheduler mode FAIR (weighted pools available via
    spark.scheduler.pool) with an explicit FIFO default pool: strict
    fair-share within the pool was MEASURED 30% slower on the
    validation batch (38.1s vs 29.4s at local[32]) because it
    timeshares cores away from the critical audio-decode job, while
    within-pool FIFO still backfills idle cores with the small
    concurrent jobs' tasks (rationale + numbers in config.py)."""
    assert spark.conf.get("spark.scheduler.mode") == "FAIR"
    alloc = spark.conf.get("spark.scheduler.allocation.file")
    assert alloc and os.path.exists(alloc)
    with open(alloc) as fh:
        xml = fh.read()
    assert '<pool name="default">' in xml
    assert "<schedulingMode>FIFO</schedulingMode>" in xml


def test_arrow_and_aqe_defaults(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
