"""Incremental constraint validation via Structured Streaming.

The batch engine (constraints/validate.py) validates a snapshot; at
10^12-clip scale new clips arrive continuously and re-validating the
whole table per arrival is O(history).  This module runs the SAME
compiled row-level constraint predicates over a stream of clip files:

* ``readStream`` file source (parquet here; an Iceberg streaming source
  is the same one-line conf swap as the batch reader) — each
  micro-batch sees only NEW files;
* the identical one-scan aggregation shape as the batch pass-2
  (every predicate a JVM boolean column, one hash agg per scope,
  driver-side unpivot) applied per micro-batch inside ``foreachBatch``;
* per-batch pass/fail DELTA rows appended to the report table with the
  micro-batch id — cumulative state is a trivial SUM over the report,
  so the streaming state itself stays empty (no watermark, no state
  store growth at 10^12 rows);
* Spark's ``checkpointLocation`` gives exactly-once file tracking: a
  restarted stream resumes after the last committed batch without
  reprocessing — the streaming analog of the engine's batch
  checkpoint store (checkpoint/runner.py).

Dataset-level constraints (uniqueness, referential) are intentionally
NOT streamed: exact global uniqueness over an unbounded stream needs
unbounded state.  The production pattern is per-batch row checks here
plus periodic batch reconciliation with the exact engine — the
``reconcile`` job verb (job.py cmd_reconcile) runs that batch half and
commits its GLOBAL_SCOPE rows into this stream's report dir (reserved
partition ``batch_id=-1``), so the cumulative report equals the full
batch validate on the same data (pinned by tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constraints.spec import Constraint

# batch_id lives in the directory name (report_dir/batch_id=N/), not
# the rows: each micro-batch OVERWRITES its own partition directory, so
# an at-least-once foreachBatch replay rewrites the same delta instead
# of appending a duplicate — cumulative totals stay exactly-once.
REPORT_SCHEMA = (
    "partition_id long, constraint string, "
    "n_rows long, n_violations long, passed boolean"
)


def _flag_columns(row_cs: list[Constraint]) -> list[Column]:
    return [c.predicate().alias(f"__p_{i}") for i, c in enumerate(row_cs)]


def _batch_report(pdf_agg, names: list[str]):
    """Unpivot the per-scope wide aggregate to report rows (pandas,
    driver-side — O(scopes × constraints), same as the batch engine)."""
    import pandas as pd

    frames = []
    for i, name in enumerate([*names, "_rows_any_violation"]):
        col = f"__v_{i}" if name != "_rows_any_violation" else "__v_any"
        frames.append(
            pd.DataFrame(
                {
                    "partition_id": pdf_agg["__scope"].astype("int64"),
                    "constraint": name,
                    "n_rows": pdf_agg["n_rows"].astype("int64"),
                    "n_violations": pdf_agg[col].astype("int64"),
                    "passed": pdf_agg[col] == 0,
                }
            )
        )
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(["constraint", "partition_id"]).reset_index(drop=True)


def validate_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    constraints: list[Constraint],
    scope: Column,
    report_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
    quarantine_dir: Optional[str] = None,
    keep_columns: Optional[list[str]] = None,
):
    """Start (and with ``available_now`` run to completion) the
    incremental validation stream.  Returns the StreamingQuery.

    ``scope`` must be a STABLE expression of the data (e.g.
    ``pmod(xxhash64(clip_id), n)``) so per-batch delta rows aggregate
    consistently across restarts and file layouts.

    ``quarantine_dir`` turns the stream into a GATE: each micro-batch
    additionally writes its violating rows (``keep_columns`` — default
    all source columns — plus the ``failed`` constraint list) to
    ``quarantine_dir/batch_id=N``, the enforcement analog of batch
    ``validate --quarantine-out``.  The per-batch partition overwrite
    gives the same exactly-once discipline as the report deltas: an
    at-least-once foreachBatch replay rewrites the same rows instead
    of appending duplicates.
    """
    row_cs = [c for c in constraints if c.is_row_level]
    if len(row_cs) != len(constraints):
        raise ValueError(
            "validate_stream handles row-level constraints only; run "
            "dataset-level checks (unique/referential/drift) via the "
            "batch engine's periodic reconciliation"
        )
    if not row_cs:
        raise ValueError("need at least one row-level constraint")

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    keep = list(keep_columns or stream.columns) if quarantine_dir else []
    flagged = stream.select(
        *keep, scope.alias("__scope"), *_flag_columns(row_cs)
    )
    any_fail = ~F.col("__p_0")
    for i in range(1, len(row_cs)):
        any_fail = any_fail | ~F.col(f"__p_{i}")
    names = [c.name for c in row_cs]
    failed_arr = F.array_compact(
        F.array(
            *[
                F.when(~F.col(f"__p_{i}"), F.lit(c.name)).otherwise(F.lit(None))
                for i, c in enumerate(row_cs)
            ]
        )
    ).alias("failed")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if quarantine_dir is not None:
            # the flags are evaluated once and feed both sinks: persist
            # the micro-batch so the quarantine filter doesn't re-run
            # expensive predicates (audio decode) a second time
            from pyspark import StorageLevel

            batch_df = batch_df.persist(StorageLevel.MEMORY_AND_DISK)
            batch_df.filter(any_fail).select(*keep, failed_arr).write.mode(
                "overwrite"
            ).parquet(f"{quarantine_dir}/batch_id={int(batch_id)}")
        agg = batch_df.groupBy("__scope").agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum((~F.col(f"__p_{i}")).cast("long")).alias(f"__v_{i}")
                for i in range(len(row_cs))
            ],
            F.sum(any_fail.cast("long")).alias("__v_any"),
        )
        pdf = agg.toPandas()
        if quarantine_dir is not None:
            batch_df.unpersist()
        if pdf.empty:
            return
        report = _batch_report(pdf, names)
        # idempotent per-batch commit: overwrite THIS batch's partition
        spark.createDataFrame(report, REPORT_SCHEMA).write.mode("overwrite").parquet(
            f"{report_dir}/batch_id={int(batch_id)}"
        )

    writer = flagged.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def cumulative_passfail(spark: SparkSession, report_dir: str) -> DataFrame:
    """Fold the per-batch delta rows into the batch engine's pass/fail
    shape: totals per (scope, constraint) over everything streamed so
    far — a tiny aggregation over the report table, NOT a rescan of
    the data."""
    rep = spark.read.parquet(report_dir)
    return (
        rep.groupBy("partition_id", "constraint")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_violations").alias("n_violations"),
        )
        .select(
            "partition_id",
            "constraint",
            "n_rows",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
    )
