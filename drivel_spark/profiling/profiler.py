"""Distributed partition-parallel profiling.

Lifecycle (SURVEY.md §3.1 Spark mapping): scan → Catalyst-pruned columns
→ ``mapInPandas`` partition profiler emitting ONE pickled accumulator
row per partition (vectorized seqOp, no per-row Python) → optional
executor-side tree combine (``groupBy(bucket).applyInPandas`` — the
treeAggregate/rayon-reduce analog, SURVEY.md §2.9) → driver merge →
:class:`TableProfile`.

Scale notes:

* the scan reads each column once; column pruning reaches the parquet
  reader because ``df.select(cols)`` precedes the UDF;
* accumulators are O(KB) per column independent of row count, so the
  shuffle moving them is negligible;
* with tens of thousands of partitions, ``tree_fanin`` bounds both the
  driver's merge work and the single-task combine fan-in.
"""

from __future__ import annotations

import json
import math
import pickle
import threading
from typing import Any, Iterable, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import (
    EnumInference,
    InferenceOptions,
    SchemaNode,
    describe as core_describe,
    infer_many,
    to_json_schema as core_to_json_schema,
)
from ..core.node import STR_ENUM, STR_UNKNOWN
from .accumulator import ProfilerOptions, StringAcc, TableAccumulator

# serializes profile() calls that override the session-global Arrow
# batch-size conf (ADVICE r02: concurrent set/restore races)
_ARROW_BATCH_LOCK = threading.Lock()

_ACC_SCHEMA = "partition_id long, acc binary"


class TableProfile:
    """Driver-side result of :func:`profile`: per-column stats + the
    schema-summary tree, with describe / JSON-Schema emitters."""

    def __init__(self, acc: TableAccumulator, opts: ProfilerOptions):
        self.acc = acc
        self.opts = opts

    # ------------------------------------------------------------------
    @property
    def n_rows(self) -> int:
        return self.acc.n_rows

    @property
    def n_partitions(self) -> int:
        return self.acc.n_partitions

    def column(self, name: str):
        return self.acc.cols[name]

    def columns(self) -> list[str]:
        return list(self.acc.cols)

    def merge(self, other: "TableProfile") -> "TableProfile":
        """Union two profiles WITHOUT rescanning either table — the
        accumulators are a commutative monoid (sketches merge, stats
        fold), so ``profile(A).merge(profile(B)) ≡ profile(A ∪ B)``.
        This is how a 10^12-row corpus profiles incrementally: each
        ingest batch pays one scan, the corpus profile is the running
        fold (the same property checkpoint/resume and the streaming
        profiler already rely on, exposed for cross-run/cross-table
        composition).  Mutates and returns self; column sets must
        match (profiles of the same contract)."""
        mine, theirs = set(self.acc.cols), set(other.acc.cols)
        if mine != theirs:
            raise ValueError(
                f"profiles cover different columns: {sorted(mine ^ theirs)}"
            )
        self.acc.merge(other.acc)
        return self

    def summary(self) -> list[dict[str, Any]]:
        return [acc.summary() for acc in self.acc.cols.values()]

    def summary_df(self, spark: SparkSession) -> DataFrame:
        rows = [json.dumps(s, default=str) for s in self.summary()]
        return spark.read.json(spark.sparkContext.parallelize(rows, 1))

    # ------------------------------------------------------------------
    def to_schema_node(self) -> SchemaNode:
        """Project the columnar profile into the core schema tree
        (object with every column required; nullable ⇔ nulls seen),
        applying the enum post-pass gates on string columns."""
        fields: dict[str, SchemaNode] = {}
        for name, acc in self.acc.cols.items():
            fields[name] = self._column_node(acc)
        return SchemaNode.object(required=fields)

    def _column_node(self, acc) -> SchemaNode:
        nullable = acc.n_null > 0
        k = acc.kind
        if k == "numeric":
            node = (
                SchemaNode.floating(acc.min_v, acc.max_v)
                if acc.is_float
                else SchemaNode.integer(
                    int(acc.min_v) if acc.min_v is not None else None,
                    int(acc.max_v) if acc.max_v is not None else None,
                )
            )
        elif k == "string":
            node = self._string_node(acc)
        elif k == "boolean":
            node = SchemaNode.boolean()
        elif k == "array":
            node = SchemaNode.array(acc.min_items, acc.max_items, SchemaNode.initial())
        elif k == "timestamp":
            node = SchemaNode.string(str_type="datetime-iso8601")
        else:
            node = SchemaNode.string(
                min_len=getattr(acc, "min_size", None), max_len=getattr(acc, "max_size", None)
            ) if k == "binary" else SchemaNode.initial()
        if acc.n > 0 and acc.n == acc.n_null:
            return SchemaNode.null()
        return node.with_nullable(nullable)

    def _string_node(self, acc: StringAcc) -> SchemaNode:
        fmt = acc.resolved_format
        if fmt != STR_UNKNOWN:
            return SchemaNode.string(str_type=fmt)
        # enum gate (reference semantics, infer.rs:257-278, applied once
        # post-merge): distinct/count ratio from the sketches, variants
        # from the exact-when-small frequency map
        n_vals = acc.n - acc.n_null
        if (
            self.opts.infer_enum
            and n_vals >= self.opts.enum_min_sample_size
            and n_vals > 0
            and acc.freq.is_exact
            and len(acc.freq.counts) / n_vals <= self.opts.enum_max_unique_ratio
        ):
            return SchemaNode.enum(acc.freq.counts.keys())
        chars: list[str] = []
        for ch, cnt in acc.char_hist.most_common():
            chars.extend([ch] * min(cnt, 8))
        return SchemaNode.string(
            strings_seen=list(acc.sample.sample())[: self.opts.sample_k],
            chars_seen=chars[: self.opts.max_chars],
            min_len=acc.min_len,
            max_len=acc.max_len,
        )

    def describe(self) -> str:
        return core_describe(self.to_schema_node())

    def to_json_schema(self, extended: bool = False):
        return core_to_json_schema(self.to_schema_node(), extended)

    # ------------------------------------------------------------------
    def to_bytes(self) -> bytes:
        return pickle.dumps({"acc": self.acc, "opts": self.opts}, protocol=4)

    @staticmethod
    def from_bytes(b: bytes) -> "TableProfile":
        d = pickle.loads(b)
        return TableProfile(d["acc"], d["opts"])

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.to_bytes())

    @staticmethod
    def load(path: str) -> "TableProfile":
        with open(path, "rb") as f:
            return TableProfile.from_bytes(f.read())


# ---------------------------------------------------------------------------
# the distributed pass
# ---------------------------------------------------------------------------


def _partition_profiler(columns: list[tuple[str, str]], opts: ProfilerOptions):
    def fn(batches: Iterable[pd.DataFrame]):
        from pyspark import TaskContext

        acc = TableAccumulator(columns, opts)
        # The session Arrow batch cap is sized for ~100KB binary audio
        # rows (config.py); narrow tables then arrive in tiny batches
        # and per-batch Python overhead dominates.  Re-buffer to ~8k
        # rows before updating — unless rows are wide (first batch
        # probes the bytes/row), in which case update per batch.
        buf: list[pd.DataFrame] = []
        buffered = 0
        target = None  # rows per update, decided on the first batch
        for pdf in batches:
            if target is None:
                row_b = (
                    int(pdf.memory_usage(deep=True).sum() / max(len(pdf), 1))
                    if len(pdf)
                    else 0
                )
                target = 1 if row_b > 4096 else 8192
            if target == 1:
                acc.update(pdf)
                continue
            buf.append(pdf)
            buffered += len(pdf)
            if buffered >= target:
                acc.update(pd.concat(buf, ignore_index=True))
                buf, buffered = [], 0
        if buf:
            acc.update(pd.concat(buf, ignore_index=True))
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        yield pd.DataFrame({"partition_id": [pid], "acc": [acc.to_bytes()]})

    return fn


def _pairwise_merger():
    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        accs = [TableAccumulator.from_bytes(b) for b in pdf["acc"]]
        merged = accs[0]
        for a in accs[1:]:
            merged = merged.merge(a)
        return pd.DataFrame({"partition_id": [int(key[0])], "acc": [merged.to_bytes()]})

    return fn


def partition_accumulators(
    df: DataFrame,
    columns: Optional[list[str]] = None,
    opts: ProfilerOptions = ProfilerOptions(),
    min_parallelism: bool = False,
) -> DataFrame:
    """One pickled :class:`TableAccumulator` row per input partition.

    ``min_parallelism=True`` round-robin repartitions the (pruned,
    narrow) input up to the core count when the scan gives fewer
    partitions — a single-row-group parquet file is UNSPLITTABLE, so
    without it the whole accumulator pass runs on one task (guide
    §2.5).  Off by default: streaming micro-batch profiling calls this
    per tiny batch, where an extra exchange costs more than it buys.
    The profile's exact fields (counts, min/max, sums, HLL registers)
    are partitioning-independent mergeable monoids (pinned by
    test_profiler); the BOUNDED sketches (SpaceSaving freq, KLL) are
    merge-order-sensitive above capacity by design and only promise
    their error contracts, so repartitioning here may legitimately
    change their internals."""
    if columns is not None:
        df = df.select(*columns)
    if min_parallelism:
        from ..io import ensure_map_parallelism

        df = ensure_map_parallelism(df)
    col_types = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    return df.mapInPandas(_partition_profiler(col_types, opts), _ACC_SCHEMA)


def tree_combine(acc_df: DataFrame, fanin: int = 64, collect_threshold: int = 256) -> DataFrame:
    """Executor-side combine levels until few enough rows to collect —
    the treeAggregate combOp tree across executors.

    The accumulator DataFrame has exactly one row per input partition,
    so the partition count (known from the plan, no job) bounds the row
    count — sizing the combine tree without running the profiler scan
    an extra time for a ``count()``."""
    n = acc_df.rdd.getNumPartitions()
    level = 0
    while n > collect_threshold:
        buckets = max(1, math.ceil(n / fanin))
        acc_df = (
            acc_df.withColumn("bucket", F.pmod(F.col("partition_id"), F.lit(buckets)))
            .groupBy("bucket")
            .applyInPandas(_pairwise_merger(), _ACC_SCHEMA)
        )
        n = buckets
        level += 1
    return acc_df


def profile(
    df: DataFrame,
    columns: Optional[list[str]] = None,
    opts: ProfilerOptions = ProfilerOptions(),
    tree_fanin: int = 64,
    arrow_batch: Optional[int] = None,
) -> TableProfile:
    """Profile a DataFrame in one distributed scan.

    ``arrow_batch``: temporarily raise the session's
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` for this scan.
    The session default (config.py) is 256 rows — sized for ~100KB
    binary audio rows — which makes NARROW tables arrive in thousands
    of tiny Arrow batches whose JVM-side framing dominates the scan
    (measured 7.1s → 4.4s on 600k×3 lineitem at 8192).  Only use when
    no concurrently-planned job carries wide binary rows: the conf is
    session-global at planning time, so a wide-row job planned inside
    this window would inherit the large batch (cmd_validate therefore
    does NOT set it — its profile overlaps the audio SNR stage).
    Concurrent ``profile(arrow_batch=...)`` calls serialize on a module
    lock so set/restore can't interleave, and the override is skipped
    when the session value already meets the request."""
    spark = df.sparkSession
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"

    def _run():
        acc_df = tree_combine(
            partition_accumulators(df, columns, opts, min_parallelism=True),
            fanin=tree_fanin,
        )
        return acc_df.collect()

    # the conf is session-global at planning time: serialize overriders
    # so two concurrent profile() calls can't interleave set/restore
    # (ADVICE r02).  BOTH the already-big check and the set/restore
    # happen under the lock — reading outside it could observe another
    # caller's temporary override, decide "already satisfied", and then
    # plan after that caller's restore.
    if arrow_batch is not None:
        with _ARROW_BATCH_LOCK:
            old = spark.conf.get(key)
            try:
                need = int(old) < int(arrow_batch)
            except (TypeError, ValueError):
                need = True
            if need:
                spark.conf.set(key, str(arrow_batch))
            try:
                rows = _run()
            finally:
                if need:
                    spark.conf.set(key, old)
    else:
        rows = _run()
    if not rows:
        cols = columns or [f.name for f in df.schema.fields]
        col_types = [(f.name, f.dataType.simpleString()) for f in df.schema.fields if f.name in set(cols)]
        return TableProfile(TableAccumulator(col_types, opts), opts)
    accs = [TableAccumulator.from_bytes(r["acc"]) for r in rows]
    merged = accs[0]
    for a in accs[1:]:
        merged = merged.merge(a)
    return TableProfile(merged, opts)


# ---------------------------------------------------------------------------
# nested-JSON column inference (the reference's JSONL mode, distributed)
# ---------------------------------------------------------------------------


def profile_json_column(
    df: DataFrame,
    column: str,
    infer_opts: Optional[InferenceOptions] = None,
    enum: Optional[EnumInference] = None,
    with_stats: bool = False,
):
    """Infer the schema tree of a JSON-string column.

    Each partition folds its documents into one SchemaNode (the
    reference's ``infer_schema_from_iter``, infer.rs:441-449, running
    per-partition); pickled partial trees merge on the driver.  The
    enum post-pass runs ONCE after the global merge (sane-semantics
    deviation, SURVEY.md §2.4 E4).  ``json.loads`` is per-document by
    nature; evidence stays bounded via ``InferenceOptions`` caps.

    Malformed documents are COUNTED, not fatal (SURVEY S3's mandated
    improvement over the reference's hard exit, main.rs:104-109): a bad
    line on one of 10^9 partitions must not kill the job.  Pass
    ``with_stats=True`` to get ``(node, {"n_docs", "n_null",
    "n_corrupt"})`` instead of the bare node.
    """
    opts = infer_opts or InferenceOptions(
        max_strings_seen=64, max_chars_seen=1024
    )

    def fn(batches: Iterable[pd.DataFrame]):
        acc = SchemaNode.initial()
        from ..core.infer import merge as node_merge, _infer_inner

        n_docs = n_null = n_corrupt = 0
        for pdf in batches:
            col = pdf[column]
            n_null += int(col.isna().sum())
            for doc_s in col.dropna():
                try:
                    doc = json.loads(doc_s)
                except (ValueError, TypeError):
                    n_corrupt += 1
                    continue
                n_docs += 1
                acc = node_merge(acc, _infer_inner(doc, opts), opts)
        yield pd.DataFrame(
            {
                "node": [pickle.dumps(acc)],
                "n_docs": [n_docs],
                "n_null": [n_null],
                "n_corrupt": [n_corrupt],
            }
        )

    parts = df.select(column).mapInPandas(
        fn, "node binary, n_docs long, n_null long, n_corrupt long"
    ).collect()
    from ..core.infer import apply_enum, merge as node_merge

    out = SchemaNode.initial()
    stats = {"n_docs": 0, "n_null": 0, "n_corrupt": 0}
    for r in parts:
        out = node_merge(out, pickle.loads(r["node"]), opts)
        for k in stats:
            stats[k] += int(r[k])
    if enum is not None:
        out = apply_enum(out, enum)
    return (out, stats) if with_stats else out
