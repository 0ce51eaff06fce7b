"""Resumable profiling: per-file accumulators + commit table.

Protocol (north_rule: "resumable from checkpoint with per-partition
lineage + metrics"):

1. enumerate the table's input files (the lineage units);
2. anti-set against the commit table → only *uncommitted* files are
   ever scheduled for scan (skipped files are pruned at plan time by
   reading only the remaining paths — no wasted IO on restart);
3. scan remaining files once; the profiler keys accumulators by
   ``input_file_name()`` so one mapInPandas pass yields per-file
   partials even when Spark packs several files into one partition or
   splits one file across partitions;
4. executor-side ``groupBy(unit)`` merge → one accumulator per file →
   commit rows (digest + metrics + blob) appended to the store;
5. final profile = merge of ALL units' stored accumulators (previous
   runs' blobs + this run's).
"""

from __future__ import annotations

import pickle
from typing import Iterable, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..profiling.accumulator import ProfilerOptions, TableAccumulator
from ..profiling.profiler import TableProfile
from .store import CheckpointStore, make_commit_row

_UNIT_ACC_SCHEMA = "unit string, acc binary"


def _per_file_profiler(columns: list[tuple[str, str]], opts: ProfilerOptions):
    def fn(batches: Iterable[pd.DataFrame]):
        accs: dict[str, TableAccumulator] = {}
        for pdf in batches:
            for unit, grp in pdf.groupby("__unit", sort=False):
                acc = accs.get(unit)
                if acc is None:
                    acc = accs[unit] = TableAccumulator(columns, opts)
                acc.update(grp.drop(columns="__unit"))
        yield pd.DataFrame(
            {"unit": list(accs), "acc": [a.to_bytes() for a in accs.values()]}
        )

    return fn


def _unit_merger():
    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        accs = [TableAccumulator.from_bytes(b) for b in pdf["acc"]]
        merged = accs[0]
        for a in accs[1:]:
            merged = merged.merge(a)
        merged.n_partitions = 1  # one lineage unit
        return pd.DataFrame({"unit": [key[0]], "acc": [merged.to_bytes()]})

    return fn


def resumable_profile(
    spark: SparkSession,
    table_path: str,
    store: CheckpointStore,
    run_id: str,
    input_snapshot: Optional[str] = None,
    columns: Optional[list[str]] = None,
    opts: ProfilerOptions = ProfilerOptions(),
) -> tuple[TableProfile, dict]:
    """Profile a parquet table resumably.  Returns (profile, stats) where
    stats reports how many units were recomputed vs restored."""
    full = spark.read.parquet(table_path)
    units = sorted(full.inputFiles())
    snapshot = input_snapshot or _snapshot_id(units)

    done = store.committed(run_id, snapshot)
    done_units = set(done["unit"]) if not done.empty else set()
    todo = [u for u in units if u not in done_units]

    new_rows: list[dict] = []
    if todo:
        df = spark.read.schema(full.schema).parquet(*todo)
        if columns is not None:
            df = df.select(*columns)
        col_types = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        acc_df = (
            df.withColumn("__unit", F.input_file_name())
            .mapInPandas(_per_file_profiler(col_types, opts), _UNIT_ACC_SCHEMA)
            .groupBy("unit")
            .applyInPandas(_unit_merger(), _UNIT_ACC_SCHEMA)
        )
        for row in acc_df.collect():
            acc = TableAccumulator.from_bytes(row["acc"])
            metrics = {
                "n_rows": acc.n_rows,
                "n_null": {c: a.n_null for c, a in acc.cols.items()},
            }
            new_rows.append(make_commit_row(run_id, row["unit"], snapshot, row["acc"], metrics))
        store.append(new_rows)

    committed = store.committed(run_id, snapshot)
    blobs = {r.unit: r.acc for r in committed.itertuples()}
    missing = [u for u in units if u not in blobs]
    if missing:
        raise RuntimeError(f"units missing after commit: {missing}")
    accs = [TableAccumulator.from_bytes(blobs[u]) for u in units]
    merged = accs[0]
    for a in accs[1:]:
        merged = merged.merge(a)
    stats = {
        "n_units": len(units),
        "n_recomputed": len(todo),
        "n_restored": len(units) - len(todo),
        "snapshot": snapshot,
    }
    return TableProfile(merged, opts), stats


def _snapshot_id(units: list[str]) -> str:
    import hashlib

    return hashlib.sha256("\n".join(units).encode()).hexdigest()[:16]
