"""Session conf: the scale-oriented defaults must actually take effect."""

import os


def test_fair_scheduling_effective(spark):
    """FAIR mode needs BOTH the scheduler mode and an allocation file
    making the default pool internally FAIR — without the file, all
    jobs share one FIFO pool and concurrent validate jobs queue behind
    the heavy decode scan (ADVICE r01)."""
    assert spark.conf.get("spark.scheduler.mode") == "FAIR"
    alloc = spark.conf.get("spark.scheduler.allocation.file")
    assert alloc and os.path.exists(alloc)
    with open(alloc) as fh:
        xml = fh.read()
    assert '<pool name="default">' in xml
    assert "<schedulingMode>FAIR</schedulingMode>" in xml


def test_arrow_and_aqe_defaults(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
