"""Incremental schema/stats inference via Structured Streaming.

The batch profiler (profiling/profiler.py) folds the whole table once;
at 10^12-clip scale new files land continuously and re-profiling the
history per arrival is O(history).  Because every accumulator in the
engine is a MERGEABLE monoid (the same property that makes the batch
treeAggregate correct), an incremental profile is just:

    running_state  ⊔  profile(new_files_only)

* ``readStream`` file source — each micro-batch sees only NEW files
  (Spark's file-source log is the dedup ledger);
* inside ``foreachBatch`` the micro-batch runs the IDENTICAL
  distributed path as the batch engine — ``partition_accumulators``
  (vectorized mapInPandas seqOp) + ``tree_combine`` — so per-batch
  cost is O(new data) with the same plan shape at any history size;
* the merged running :class:`TableAccumulator` is persisted per batch
  as ``state_<batch_id>.bin`` (KBs — sketches, not data).  The write
  is keyed by batch id, which makes the fold IDEMPOTENT: if a batch
  is replayed after a crash (foreachBatch is at-least-once), the
  existing state file for that id is detected and the merge is
  skipped — exactly-once semantics for the profile itself;
* streaming state store stays EMPTY (no watermark, no per-key state):
  all state is the O(columns × sketch) accumulator file.

The reference's analog is the stdin fold loop (main.rs:91-117 —
read → infer → merge); this is that loop lifted to an unbounded,
resumable, distributed setting.
"""

from __future__ import annotations

import os
import re
from typing import Optional

from pyspark.sql import SparkSession

from ..profiling.accumulator import ProfilerOptions, TableAccumulator
from ..profiling.profiler import TableProfile, partition_accumulators, tree_combine

_STATE_RE = re.compile(r"^state_(\d+)\.bin$")


def _latest_state(state_dir: str, below: Optional[int] = None):
    """(batch_id, path) of the newest committed state, optionally only
    those with batch_id < ``below`` (for replay detection)."""
    best = None
    if os.path.isdir(state_dir):
        for f in os.listdir(state_dir):
            m = _STATE_RE.match(f)
            if m:
                bid = int(m.group(1))
                if below is not None and bid >= below:
                    continue
                if best is None or bid > best[0]:
                    best = (bid, os.path.join(state_dir, f))
    return best


def profile_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    state_dir: str,
    checkpoint_dir: str,
    columns: Optional[list[str]] = None,
    opts: ProfilerOptions = ProfilerOptions(),
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
):
    """Run (with ``available_now``, to completion) the incremental
    profile stream over a growing parquet directory.  Returns the
    StreamingQuery; read the result with :func:`load_stream_profile`.
    """
    os.makedirs(state_dir, exist_ok=True)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    if columns is not None:
        stream = stream.select(*columns)

    def process_batch(batch_df, batch_id: int) -> None:
        final = os.path.join(state_dir, f"state_{batch_id}.bin")
        if os.path.exists(final):
            return  # replayed batch — already folded, skip (idempotent)
        acc_df = tree_combine(partition_accumulators(batch_df, columns, opts))
        rows = acc_df.collect()
        prev = _latest_state(state_dir, below=batch_id)
        if prev is not None:
            with open(prev[1], "rb") as fh:
                merged = TableAccumulator.from_bytes(fh.read())
        elif rows:
            merged = TableAccumulator.from_bytes(rows[0]["acc"])
            rows = rows[1:]
        else:
            return
        for r in rows:
            merged = merged.merge(TableAccumulator.from_bytes(r["acc"]))
        tmp = final + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(merged.to_bytes())
        os.replace(tmp, final)  # atomic commit keyed by batch id

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def load_stream_profile(
    state_dir: str, opts: ProfilerOptions = ProfilerOptions()
) -> TableProfile:
    """The profile of everything streamed so far (latest committed
    state) — same :class:`TableProfile` API as the batch engine."""
    best = _latest_state(state_dir)
    if best is None:
        raise FileNotFoundError(f"no committed profile state under {state_dir}")
    with open(best[1], "rb") as fh:
        return TableProfile(TableAccumulator.from_bytes(fh.read()), opts)
