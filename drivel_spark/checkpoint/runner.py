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



def resumable_row_validation(
    spark: SparkSession,
    table_path: str,
    store: CheckpointStore,
    run_id: str,
    constraints: list,
    scope,
    input_snapshot: Optional[str] = None,
) -> tuple[pd.DataFrame, dict]:
    """Pass-2 row constraints, resumable with the same per-file unit
    model as :func:`resumable_profile` (north_rule: "each partition's
    result commits with lineage + metrics ... so interrupted runs
    resume without recomputation").

    Per uncommitted file: evaluate every row-level predicate once and
    reduce to a per-(file, scope) count table — (n_rows, one violation
    counter per constraint, rows failing ≥1) — committed to the store
    as that file's blob.  Per-scope pass/fail totals are sums over
    file partials, so the merged report is IDENTICAL to the one-pass
    batch engine's row-level rows (pinned by tests), and a restart
    reads only the files the commit table hasn't seen — skipped files
    are pruned at plan time, no wasted IO.

    ``scope`` must be a layout-stable Column (e.g. pmod(xxhash64(id),
    n_scopes)); physical partition ids would not survive the per-file
    re-scan.  Returns (passfail pandas frame in the batch engine's
    row-level shape, stats dict).
    """
    row_cs = [c for c in constraints if c.is_row_level]
    if not row_cs:
        raise ValueError("need at least one row-level constraint")
    full = spark.read.parquet(table_path)
    units = sorted(full.inputFiles())
    snapshot = input_snapshot or _snapshot_id(units)
    pf_run = f"{run_id}:rowpf"

    done = store.committed(pf_run, snapshot)
    done_units = set(done["unit"]) if not done.empty else set()
    todo = [u for u in units if u not in done_units]

    names = [c.name for c in row_cs]
    if todo:
        df = spark.read.schema(full.schema).parquet(*todo)
        from ..constraints.validate import row_flag_columns, row_violation_aggs

        flagged = df.select(
            F.input_file_name().alias("__unit"), scope.alias("__scope"),
            *row_flag_columns(row_cs),
        )
        agg = (
            flagged.groupBy("__unit", "__scope")
            .agg(*row_violation_aggs(row_cs))
            .toPandas()
        )
        new_rows = []
        for unit, grp in agg.groupby("__unit", sort=False):
            blob = pickle.dumps(
                grp.drop(columns="__unit").reset_index(drop=True), protocol=4
            )
            metrics = {
                "n_rows": int(grp["n_rows"].sum()),
                "n_any_violation": int(grp["__v_any"].sum()),
            }
            new_rows.append(make_commit_row(pf_run, unit, snapshot, blob, metrics))
        # files with ZERO rows produce no agg groups but must still
        # commit (else every restart rescans them)
        seen = {r["unit"] for r in new_rows}
        for unit in todo:
            if unit not in seen:
                empty = pickle.dumps(
                    agg.drop(columns="__unit").iloc[0:0].reset_index(drop=True),
                    protocol=4,
                )
                new_rows.append(
                    make_commit_row(
                        pf_run, unit, snapshot, empty,
                        {"n_rows": 0, "n_any_violation": 0},
                    )
                )
        store.append(new_rows)

    committed = store.committed(pf_run, snapshot)
    blobs = {r.unit: r.acc for r in committed.itertuples()}
    missing = [u for u in units if u not in blobs]
    if missing:
        raise RuntimeError(f"units missing after commit: {missing}")
    parts = [pickle.loads(blobs[u]) for u in units]
    merged = pd.concat(parts, ignore_index=True)
    if merged["__scope"].isna().any():
        # pandas groupby would silently drop NaN groups, undercounting
        # the report — fail loudly like the batch engine does
        raise ValueError(
            "scope expression produced NULL for some rows; use a "
            "null-safe, layout-stable scope (e.g. pmod(xxhash64(id), n))"
        )
    per_scope = merged.groupby("__scope", as_index=False).sum()

    rows = []
    # iterrows, not itertuples: namedtuple fields can't start with "_",
    # so itertuples would silently rename __scope/__v_i positionally
    for _, rec in per_scope.iterrows():
        for i, name in enumerate(names):
            v = int(rec[f"__v_{i}"])
            rows.append((int(rec["__scope"]), name, int(rec["n_rows"]), v, v == 0))
        v_any = int(rec["__v_any"])
        rows.append(
            (int(rec["__scope"]), "_rows_any_violation", int(rec["n_rows"]),
             v_any, v_any == 0)
        )
    passfail = pd.DataFrame(
        rows,
        columns=["partition_id", "constraint", "n_rows", "n_violations",
                 "passed"],
    ).sort_values(["partition_id", "constraint"]).reset_index(drop=True)
    stats = {
        "n_units": len(units),
        "n_recomputed": len(todo),
        "n_restored": len(units) - len(todo),
        "snapshot": snapshot,
    }
    return passfail, stats


def resumable_screen(
    spark: SparkSession,
    table_path: str,
    store: CheckpointStore,
    run_id: str,
    kinds: Optional[list[str]] = None,
    input_snapshot: Optional[str] = None,
) -> tuple[pd.DataFrame, dict]:
    """Fused audio-QA screening (ops/multimodal.py screen_report),
    resumable with the same per-file unit model as
    :func:`resumable_profile` — the operational mode for content-level
    QA at 10^12 clips, where a decode pass over the corpus takes long
    enough that interruption is the norm, not the exception
    (north_rule: "each partition's result commits with lineage +
    metrics ... so interrupted runs resume without recomputation").

    Per uncommitted file: ONE fused decode pass keyed by
    ``input_file_name()`` reduces to per-(file, kind) counts
    (n_clips, n_flagged under the kind's published policy,
    n_undecodable under FUSED_SCREEN_BAD semantics), committed to the
    store as that file's blob.  Corpus totals are sums over file
    partials, identical to a one-shot fused run (pinned by tests); a
    restart reads only the files the commit table hasn't seen —
    skipped files are pruned at plan time, no wasted decode.

    The kind SET is part of the run key (sorted, so caller order does
    not matter — per-kind counts in each blob are order-independent);
    resuming with a DIFFERENT set recomputes from scratch instead of
    mixing incompatible blobs.  Returns (per-kind totals frame in the
    screen-stream report shape, stats dict).
    """
    from ..ops.multimodal import (
        AUDIO_SCREENS,
        FUSED_SCREEN_BAD,
        FUSED_SCREEN_FIELDS,
        screen_report,
    )

    kinds = list(kinds or FUSED_SCREEN_FIELDS)
    full = spark.read.parquet(table_path)
    units = sorted(full.inputFiles())
    snapshot = input_snapshot or _snapshot_id(units)
    run = f"{run_id}:screen[{','.join(sorted(kinds))}]"

    done = store.committed(run, snapshot)
    done_units = set(done["unit"]) if not done.empty else set()
    todo = [u for u in units if u not in done_units]

    if todo:
        df = spark.read.schema(full.schema).parquet(*todo).withColumn(
            "__unit", F.input_file_name()
        )
        rep = screen_report(df, kinds, id_cols=["__unit"])
        aggs = [
            F.count(F.lit(1)).alias("n_clips"),
            F.count(F.when(F.expr("n_samples IS NULL"), 1)).alias("n_undec"),
        ]
        for kind in kinds:
            flag = AUDIO_SCREENS[kind][1]
            bad = FUSED_SCREEN_BAD.get(kind, "n_samples IS NULL")
            aggs.append(F.count(F.when(F.expr(flag), 1)).alias(f"f_{kind}"))
            aggs.append(F.count(F.when(F.expr(bad), 1)).alias(f"b_{kind}"))
        agg = rep.groupBy("__unit").agg(*aggs).toPandas()
        new_rows = []
        for _, rec in agg.iterrows():
            counts = {"n_clips": int(rec["n_clips"]),
                      "n_undec": int(rec["n_undec"])}
            for kind in kinds:
                counts[f"f_{kind}"] = int(rec[f"f_{kind}"])
                counts[f"b_{kind}"] = int(rec[f"b_{kind}"])
            metrics = {
                "n_clips": counts["n_clips"],
                "n_flagged_total": sum(counts[f"f_{k}"] for k in kinds),
            }
            new_rows.append(
                make_commit_row(run, rec["__unit"], snapshot,
                                pickle.dumps(counts, protocol=4), metrics)
            )
        # files with ZERO rows produce no agg groups but must still
        # commit (else every restart rescans them)
        seen = {r["unit"] for r in new_rows}
        for unit in todo:
            if unit not in seen:
                zero = {"n_clips": 0, "n_undec": 0}
                for kind in kinds:
                    zero[f"f_{kind}"] = zero[f"b_{kind}"] = 0
                new_rows.append(
                    make_commit_row(run, unit, snapshot,
                                    pickle.dumps(zero, protocol=4),
                                    {"n_clips": 0, "n_flagged_total": 0})
                )
        store.append(new_rows)

    committed = store.committed(run, snapshot)
    blobs = {r.unit: r.acc for r in committed.itertuples()}
    missing = [u for u in units if u not in blobs]
    if missing:
        raise RuntimeError(f"units missing after commit: {missing}")
    parts = [pickle.loads(blobs[u]) for u in units]
    totals = pd.DataFrame(
        [
            (
                kind,
                sum(p["n_clips"] for p in parts),
                sum(p[f"f_{kind}"] for p in parts),
                sum(p[f"b_{kind}"] for p in parts),
            )
            for kind in kinds
        ],
        columns=["kind", "n_clips", "n_flagged", "n_undecodable"],
    )
    todo_set = set(todo)
    by_unit = dict(zip(units, parts))
    undecs = [p.get("n_undec") for p in parts]
    stats = {
        "n_units": len(units),
        "n_recomputed": len(todo),
        "n_restored": len(units) - len(todo),
        # clips actually decoded THIS call (restored blobs cost no
        # decode) — the honest base for a throughput rate on resume
        "n_clips_recomputed": sum(
            by_unit[u]["n_clips"] for u in units if u in todo_set
        ),
        # corpus-wide undecodable count (fused-run output parity);
        # None when a pre-upgrade store blob lacks the field
        "n_undecodable": (
            int(sum(undecs)) if all(u is not None for u in undecs) else None
        ),
        "snapshot": snapshot,
    }
    return totals, stats
