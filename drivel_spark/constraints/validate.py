"""Pass 2: constraint evaluation → per-partition pass/fail rows +
violation DataFrames (BASELINE.json north_star).

Physical shape, designed for 10^12 rows:

* ALL row-level constraints evaluate in ONE scan: each compiles to a
  JVM boolean column, a single ``groupBy(partition_scope)`` computes
  every violation count map-side-partially (Catalyst partial+final
  hash agg), then ``stack`` unpivots to (partition, constraint) rows.
  No Python touches row data.
* Violation rows come from the same predicate columns
  (``filter(size(failed) > 0)``) — Catalyst reuses the scan via
  whole-stage codegen; filters/pruning still push down to parquet.
* Uniqueness = HLL sketch pre-estimate (from the profile pass, free)
  + exact confirm via hash-shuffle ``groupBy(key).count().filter(>1)``;
  AQE splits skewed keys.
* Referential completeness = ``left_anti`` join per direction (small
  dimension sides should be broadcast by AQE automatically).
* Drift = driver-side sketch-vs-sketch math (drift.py), no data pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .drift import drift_column
from .spec import (
    Constraint,
    CorrelationBound,
    DistinctRatio,
    Drift,
    EntropyBound,
    FunctionalDependency,
    GroupBound,
    Monotonic,
    MutualInformationBound,
    QuantileBound,
    Referential,
    Unique,
)

GLOBAL_SCOPE = -1  # partition_id for dataset-level constraint rows

PASSFAIL_COLS = ["partition_id", "constraint", "n_rows", "n_violations", "passed"]


@dataclass
class ValidationResult:
    passfail: DataFrame
    violations: DataFrame  # input rows + failed: array<string>
    dataset: list[dict[str, Any]] = dc_field(default_factory=list)
    violation_tables: dict[str, DataFrame] = dc_field(default_factory=dict)
    # fast driver-side report path: the pre-unpivot per-scope agg DF and
    # the constraint names, so passfail_pdf needs ONE Spark action (a
    # collect of ≤ n_scopes wide rows from the warm cache) instead of
    # the stack/union/orderBy plan behind `passfail`
    _agg: Any = None
    _agg_pdf_fut: Any = None  # Future[pandas] collected during validate()
    _row_names: list[str] = dc_field(default_factory=list)
    _extra_rows: list[tuple] = dc_field(default_factory=list)

    def all_passed(self) -> bool:
        pdf = self.passfail_pdf()
        ds_ok = all(d.get("passed", True) for d in self.dataset)
        return bool(pdf["passed"].all()) and ds_ok

    def passfail_pdf(self):
        """Deterministically-ordered pandas view (for byte-comparisons).

        The per-scope aggregation collects wide (one row per scope,
        one column per constraint) and unpivots driver-side: the
        report is O(scopes×constraints) rows, so Spark-side stack /
        union / orderBy stages would be pure scheduling overhead.
        Memoized — repeated calls cost no Spark actions."""
        import pandas as pd

        if getattr(self, "_pdf_cache", None) is not None:
            return self._pdf_cache
        if self._agg is None:
            pdf = self.passfail.toPandas()
            pdf = pdf.sort_values(["constraint", "partition_id"]).reset_index(drop=True)
            object.__setattr__(self, "_pdf_cache", pdf)
            return pdf
        wide = (
            self._agg_pdf_fut.result()
            if self._agg_pdf_fut is not None
            else self._agg.toPandas()
        )
        names = [*self._row_names, "_rows_any_violation"]
        frames = []
        for i, name in enumerate(names):
            col = f"__v_{i}" if name != "_rows_any_violation" else "__v_any"
            frames.append(
                pd.DataFrame(
                    {
                        "partition_id": wide["__scope"].astype("int64"),
                        "constraint": name,
                        "n_rows": wide["n_rows"].astype("int64"),
                        "n_violations": wide[col].astype("int64"),
                        "passed": wide[col] == 0,
                    }
                )
            )
        for row in self._extra_rows:
            frames.append(
                pd.DataFrame(
                    [dict(zip(PASSFAIL_COLS, row))]
                )
            )
        out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            columns=PASSFAIL_COLS
        )
        out = out[PASSFAIL_COLS].astype(
            {"partition_id": "int64", "n_rows": "int64", "n_violations": "int64", "passed": "bool"}
        )
        out = out.sort_values(["constraint", "partition_id"]).reset_index(drop=True)
        object.__setattr__(self, "_pdf_cache", out)
        return out

    def n_violation_rows(self) -> int:
        """Rows failing ≥1 row-level constraint, from the pass/fail
        aggregation (no extra scan)."""
        pdf = self.passfail_pdf()
        return int(pdf.loc[pdf.constraint == "_rows_any_violation", "n_violations"].sum())


class RowPredicate(Constraint):
    """Escape hatch: any boolean Column as a row-level constraint (used
    for the audio-integrity checks built in constraints/audio.py)."""

    def __init__(self, name: str, column: str, expr: Column):
        object.__setattr__(self, "name", name)
        object.__setattr__(self, "column", column)
        object.__setattr__(self, "_expr", expr)

    def predicate(self) -> Column:
        return self._expr


def row_flag_columns(row_cs: list) -> list[Column]:
    """One boolean flag column per row constraint (``__p_i``) — the
    SHARED naming/shape contract between the one-pass batch engine and
    the resumable per-file engine (checkpoint/runner.py); change
    violation-counting semantics here and both stay in sync."""
    return [c.predicate().alias(f"__p_{i}") for i, c in enumerate(row_cs)]


def row_any_fail(row_cs: list) -> Column:
    any_fail = ~F.col("__p_0")
    for i in range(1, len(row_cs)):
        any_fail = any_fail | ~F.col(f"__p_{i}")
    return any_fail


def row_violation_aggs(row_cs: list) -> list[Column]:
    """The per-scope aggregation list over the flag columns: row count,
    one violation counter per constraint (``__v_i``), and the
    any-violation counter (``__v_any``)."""
    return [
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum((~F.col(f"__p_{i}")).cast("long")).alias(f"__v_{i}")
            for i in range(len(row_cs))
        ],
        F.sum(row_any_fail(row_cs).cast("long")).alias("__v_any"),
    ]


def validate(
    df: DataFrame,
    constraints: list[Constraint],
    scope: Optional[Column] = None,
    ref_tables: Optional[dict[str, DataFrame]] = None,
    profile=None,
    baseline_profile=None,
    keep_columns: Optional[list[str]] = None,
    cache_flags: bool = True,
    ds_df: Optional[DataFrame] = None,
) -> ValidationResult:
    """Evaluate constraints; return pass/fail rows + violation rows.

    ``scope`` partitions the pass/fail report (default: physical
    partition via ``spark_partition_id()``; pass a stable column
    expression for layout-independent reports).
    ``ref_tables`` supplies the right side of Referential constraints.
    ``profile``/``baseline_profile`` are TableProfiles of this batch /
    of the baseline, used by Unique (HLL pre-gate) and Drift;
    ``profile`` may also be a zero-arg callable returning the
    TableProfile, letting the caller run the profile scan concurrently
    with this pass (it is resolved only when reports are assembled).
    ``ds_df``: evaluate DATASET-level constraints (uniqueness,
    referential, group bounds, …) against this frame instead of ``df``.
    They are column-pruned scans; when ``df``'s row-level source is
    opaque to Catalyst (e.g. a mapInArrow decode pass), pass the cheap
    narrow source here so each dataset job scans only the columns it
    needs instead of re-running the opaque pass.  Must hold the same
    rows (same table) as ``df``.
    """
    row_cs = [c for c in constraints if c.is_row_level]
    ds_cs = [c for c in constraints if not c.is_row_level]
    ds_src = ds_df if ds_df is not None else df

    scope_col = scope if scope is not None else F.spark_partition_id()

    # ---- one-scan row-level evaluation ----------------------------------
    # Every predicate (including expensive pandas-UDF ones like the
    # audio-SNR check) is evaluated EXACTLY ONCE: the narrow flagged
    # projection (kept columns + scope + one boolean per constraint) is
    # persisted, and both the pass/fail aggregation and the violations
    # filter read it.  At cluster scale this intermediate would be a
    # written table; MEMORY_AND_DISK is the local analog.
    if row_cs:
        keep = keep_columns or df.columns
        flagged = df.select(
            *keep,
            scope_col.alias("__scope"),
            *row_flag_columns(row_cs),
        )
        if cache_flags:
            from pyspark import StorageLevel

            flagged = flagged.persist(StorageLevel.MEMORY_AND_DISK)
        # rows failing ≥1 constraint fold into the same single
        # aggregation — callers get the violation-row count without
        # a second job over the (cached) flags
        agg = flagged.groupBy("__scope").agg(*row_violation_aggs(row_cs))
        stack_args = ", ".join(f"'{c.name}', __v_{i}" for i, c in enumerate(row_cs))
        stack_args += ", '_rows_any_violation', __v_any"
        passfail = agg.select(
            F.col("__scope").cast("long").alias("partition_id"),
            F.expr(f"stack({len(row_cs) + 1}, {stack_args}) as (constraint, n_violations)"),
            F.col("n_rows"),
        ).select(
            "partition_id",
            "constraint",
            "n_rows",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )

        failed_arr = F.array_compact(
            F.array(
                *[
                    F.when(~F.col(f"__p_{i}"), F.lit(c.name)).otherwise(F.lit(None))
                    for i, c in enumerate(row_cs)
                ]
            )
        ).alias("failed")
        violations = (
            flagged.select(*keep, failed_arr)
            .filter(F.size("failed") > 0)
        )
    else:
        spark = df.sparkSession
        from ..io import local_df

        passfail = local_df(
            spark, [], "partition_id long, constraint string, n_rows long, n_violations long, passed boolean"
        )
        violations = df.limit(0).withColumn("failed", F.array().cast("array<string>"))

    # ---- dataset-level constraints --------------------------------------
    # All independent Spark actions run CONCURRENTLY from driver
    # threads (FAIR scheduler, config.py): the heavy row-flag
    # materialization (decode UDFs), the uniqueness shuffle, and each
    # referential anti-join overlap instead of queueing — this is what
    # keeps the serial fraction near zero as executor count grows.
    from concurrent.futures import ThreadPoolExecutor

    dataset: list[dict[str, Any]] = []
    violation_tables: dict[str, DataFrame] = {}
    extra_passfail_rows: list[tuple] = []

    lazy_cs: list[tuple] = []  # (constraint, future(s) ...)
    with ThreadPoolExecutor(max_workers=8) as pool:
        # run the per-scope aggregation first — it is the heaviest job
        # (the audio-decode scan when present), it materializes the
        # persisted flags cache as a side effect, and its per-scope
        # n_rows sum IS the exact row count, so no separate count()
        # pass over the flags is needed (r06: the old
        # count-then-aggregate shape paid a second full 64-task pass
        # over the cached flags in the serial tail).  It runs in the
        # high-weight "critical" scheduler pool (config.py): FAIR
        # between pools keeps its 8-stream scan core-rich for its
        # whole span while the default pool's concurrent jobs backfill
        # the remaining cores — plain FIFO instead serializes it
        # behind whichever job got submitted first (measured 35.3s →
        # 26.1s batch wall at local[32])
        def _in_critical_pool(fn):
            sc = df.sparkSession.sparkContext
            sc.setLocalProperty("spark.scheduler.pool", "critical")
            try:
                return fn()
            finally:
                sc.setLocalProperty("spark.scheduler.pool", None)

        fut_agg_pdf = None
        if row_cs:
            fut_agg_pdf = pool.submit(_in_critical_pool, agg.toPandas)
            fut_n_total = None
        elif ds_cs:
            fut_n_total = pool.submit(_in_critical_pool, ds_src.count)
        else:
            fut_n_total = None
        for c in ds_cs:
            if isinstance(c, Unique):
                dup_keys = (
                    ds_src.groupBy(c.column)
                    .agg(F.count(F.lit(1)).alias("cnt"))
                    .filter(F.col("cnt") > 1)
                )
                fut = pool.submit(
                    lambda dk=dup_keys: dk.agg(
                        F.count(F.lit(1)).alias("k"),
                        F.coalesce(F.sum("cnt"), F.lit(0)).alias("r"),
                    ).collect()[0]
                )
                lazy_cs.append((c, fut, dup_keys))
            elif isinstance(c, Referential):
                if not ref_tables or c.ref_table not in ref_tables:
                    raise ValueError(
                        f"Referential constraint {c.name} needs ref_tables[{c.ref_table!r}]"
                    )
                if c.strategy == "bloom":
                    from .bloom import referential_bloom

                    orphans = referential_bloom(
                        ds_src,
                        c.column,
                        ref_tables[c.ref_table],
                        c.ref_column,
                        fpp=c.bloom_fpp,
                    ).drop("bloom_definite")
                else:
                    orphans = ds_src.join(
                        ref_tables[c.ref_table]
                        .select(F.col(c.ref_column).alias(c.column))
                        .dropDuplicates([c.column]),
                        on=c.column,
                        how="left_anti",
                    )
                lazy_cs.append((c, pool.submit(orphans.count), orphans))
            elif isinstance(c, GroupBound):
                gtab = group_bound_table(ds_src, c)
                fut = pool.submit(
                    lambda g=gtab: g.agg(
                        F.count(F.lit(1)).alias("n_groups"),
                        F.coalesce(
                            F.sum((~F.col("passed")).cast("long")), F.lit(0)
                        ).alias("n_fail"),
                    ).collect()[0]
                )
                lazy_cs.append((c, fut, gtab))
            elif isinstance(c, FunctionalDependency):
                bad_keys = (
                    ds_src.select(
                        F.col(c.column).alias("key"),
                        F.col(c.determines).alias("dep"),
                    )
                    .distinct()
                    .groupBy("key")
                    .agg(F.count(F.lit(1)).alias("n_bindings"))
                    .filter(F.col("n_bindings") > 1)
                )
                fut = pool.submit(
                    lambda b=bad_keys: b.agg(
                        F.count(F.lit(1)).alias("k"),
                        F.coalesce(F.sum("n_bindings"), F.lit(0)).alias("b"),
                    ).collect()[0]
                )
                lazy_cs.append((c, fut, bad_keys))
            elif isinstance(c, DistinctRatio):
                if c.method == "exact":
                    fut = pool.submit(
                        lambda col=c.column: ds_src.agg(
                            F.countDistinct(F.col(col)).alias("d"),
                            F.sum(
                                F.col(col).isNotNull().cast("long")
                            ).alias("nn"),
                        ).collect()[0]
                    )
                    lazy_cs.append((c, fut, None))
                else:
                    if profile is None:
                        raise ValueError(
                            f"DistinctRatio {c.name} (sketch) needs profile"
                        )
                    lazy_cs.append((c, None, None))
            elif isinstance(c, Monotonic):
                from ..ops.timeseries import monotonic_violations

                pairs = monotonic_violations(
                    ds_src,
                    c.column,
                    list(c.order_by),
                    group_col=c.group_col,
                    strict=c.strict,
                )
                lazy_cs.append((c, pool.submit(pairs.count), pairs))
            elif isinstance(c, EntropyBound):
                from ..ops.infostats import column_entropy

                fut = pool.submit(
                    lambda col=c.column: column_entropy(ds_src, [col]).collect()[0]
                )
                lazy_cs.append((c, fut, None))
            elif isinstance(c, CorrelationBound):
                from ..ops.infostats import _pearson

                fut = pool.submit(
                    lambda a=c.column, b=c.other: ds_src.agg(
                        _pearson(a, b).alias("corr"),
                        F.count(
                            F.when(
                                F.col(a).isNotNull() & F.col(b).isNotNull(),
                                1,
                            )
                        ).alias("n"),
                    ).collect()[0]
                )
                lazy_cs.append((c, fut, None))
            elif isinstance(c, MutualInformationBound):
                from ..ops.infostats import mutual_information

                fut = pool.submit(
                    lambda a=c.column, b=c.other: mutual_information(
                        ds_src, a, b
                    ).collect()[0]
                )
                lazy_cs.append((c, fut, None))
            elif isinstance(c, QuantileBound):
                if c.method == "exact":
                    from ..ops.selection import exact_quantile

                    def _exq(col=c.column, q=c.q):
                        try:
                            return exact_quantile(ds_src, col, q)
                        except ValueError:  # no non-null values → fail
                            return None

                    lazy_cs.append((c, pool.submit(_exq), None))
                else:  # sketch: free from the pass-1 profile, no job
                    if profile is None:
                        raise ValueError(
                            f"QuantileBound {c.name} (sketch) needs profile"
                        )
                    lazy_cs.append((c, None, None))
            elif isinstance(c, Drift):
                if profile is None or baseline_profile is None:
                    raise ValueError(
                        f"Drift constraint {c.name} needs profile + baseline_profile"
                    )
                lazy_cs.append((c, None, None))
            else:
                raise ValueError(f"unknown dataset constraint {type(c)}")

        # exact row count: from the aggregation's per-scope n_rows when
        # row constraints ran (one pass gives cache + count + report),
        # else from the dedicated count
        if fut_agg_pdf is not None:
            n_total = int(fut_agg_pdf.result()["n_rows"].sum())
        elif fut_n_total is not None:
            n_total = fut_n_total.result()
        else:
            n_total = 0

    # `profile` may be a zero-arg callable (e.g. a Future's .result) so
    # the pass-1 profile scan can run CONCURRENTLY with the pass-2 jobs
    # above; it is only needed here, at report-assembly time
    if callable(profile):
        profile = profile()

    for c, fut, aux in lazy_cs:
        if isinstance(c, Unique):
            res, vtab = _unique_result(c, fut.result(), aux, profile, n_total)
        elif isinstance(c, Referential):
            res, vtab = _referential_result(c, fut.result(), aux, n_total)
        elif isinstance(c, GroupBound):
            res, vtab = _group_bound_result(c, fut.result(), aux)
        elif isinstance(c, FunctionalDependency):
            res, vtab = _functional_dependency_result(c, fut.result(), aux)
        elif isinstance(c, DistinctRatio):
            res, vtab = (
                _distinct_ratio_result(
                    c, fut.result() if fut is not None else None, profile
                ),
                None,
            )
        elif isinstance(c, Monotonic):
            res, vtab = _monotonic_result(c, fut.result()), aux
        elif isinstance(c, EntropyBound):
            res, vtab = _entropy_bound_result(c, fut.result()), None
        elif isinstance(c, CorrelationBound):
            res, vtab = _correlation_bound_result(c, fut.result()), None
        elif isinstance(c, MutualInformationBound):
            res, vtab = _mutual_information_result(c, fut.result()), None
        elif isinstance(c, QuantileBound):
            res, vtab = (
                _quantile_bound_result(
                    c, fut.result() if fut is not None else None, profile
                ),
                None,
            )
        else:
            res, vtab = _check_drift(c, profile, baseline_profile), None
        dataset.append(res)
        if vtab is not None:
            violation_tables[c.name] = vtab
        extra_passfail_rows.append(
            (GLOBAL_SCOPE, c.name, res.get("n_rows", n_total or 0), res["n_violations"], res["passed"])
        )

    if extra_passfail_rows:
        spark = df.sparkSession
        from ..io import local_df

        extra = local_df(
            spark,
            extra_passfail_rows,
            "partition_id long, constraint string, n_rows long, n_violations long, passed boolean",
        )
        passfail = passfail.unionByName(extra)

    return ValidationResult(
        passfail,
        violations,
        dataset,
        violation_tables,
        _agg=agg if row_cs else None,
        _agg_pdf_fut=fut_agg_pdf,
        _row_names=[c.name for c in row_cs],
        _extra_rows=extra_passfail_rows,
    )


def _unique_result(c: Unique, agg_row, dup_keys: DataFrame, profile, n_total: int):
    """HLL pre-estimate (free, from the profile scan) + exact confirm
    (hash repartition groupBy — the only correct answer at enforce
    level; the sketch only contextualizes the report)."""
    hll_est = None
    if profile is not None and c.column in profile.acc.cols:
        acc = profile.column(c.column)
        if hasattr(acc, "hll"):
            hll_est = round(acc.hll.estimate())
    n_dup_keys, n_dup_rows = int(agg_row["k"]), int(agg_row["r"])
    n_violations = n_dup_rows - n_dup_keys  # rows beyond the first per key
    return (
        {
            "constraint": c.name,
            "type": "unique",
            "column": c.column,
            "n_rows": n_total,
            "hll_estimate": hll_est,
            "n_duplicate_keys": n_dup_keys,
            "n_violations": n_violations,
            "passed": n_violations == 0,
        },
        dup_keys,
    )


def _referential_result(c: Referential, n_orphans: int, orphans: DataFrame, n_total: int):
    return (
        {
            "constraint": c.name,
            "type": "referential",
            "column": c.column,
            "ref": f"{c.ref_table}.{c.ref_column}",
            "n_rows": n_total,
            "n_violations": n_orphans,
            "passed": n_orphans == 0,
        },
        orphans,
    )


_GROUP_AGG_FNS = {
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "count": lambda col: F.count(F.lit(1)),
}


def group_bound_table(df: DataFrame, c: GroupBound) -> DataFrame:
    """Per-group aggregate + bound verdict for a GroupBound constraint:
    one partial+final groupBy shuffle on ``group_col`` (map-side
    combine bounds shuffle volume at the group cardinality, not the
    row count), returning (group_key, value, n_rows, passed)."""
    val = _GROUP_AGG_FNS[c.agg](F.col(c.column)).cast("double").alias("value")
    ok = F.lit(True)
    if c.lo is not None:
        ok = ok & (F.col("value") >= F.lit(float(c.lo)))
    if c.hi is not None:
        ok = ok & (F.col("value") <= F.lit(float(c.hi)))
    return (
        df.groupBy(F.col(c.group_col).alias("group_key"))
        .agg(val, F.count(F.lit(1)).alias("n_rows"))
        .withColumn("passed", ok)
    )


def _group_bound_result(c: GroupBound, agg_row, gtab: DataFrame):
    n_groups, n_fail = int(agg_row["n_groups"]), int(agg_row["n_fail"])
    return (
        {
            "constraint": c.name,
            "type": "group_bound",
            "column": c.column,
            "group_col": c.group_col,
            "agg": c.agg,
            "lo": c.lo,
            "hi": c.hi,
            "n_rows": n_groups,
            "n_violations": n_fail,
            "passed": n_fail == 0,
        },
        gtab.filter(~F.col("passed")),
    )


def _functional_dependency_result(c: FunctionalDependency, agg_row, bad_keys):
    """Verdict for an FD check: n_violations = keys bound to more than
    one dependent value; the violation table lists those keys with
    their binding counts."""
    n_bad_keys = int(agg_row["k"])
    n_bindings = int(agg_row["b"])
    return (
        {
            "constraint": c.name,
            "type": "functional_dependency",
            "column": c.column,
            "determines": c.determines,
            "n_violating_keys": n_bad_keys,
            "n_bindings": n_bindings,
            "n_violations": n_bad_keys,
            "passed": n_bad_keys == 0,
        },
        bad_keys,
    )


def _distinct_ratio_result(c: DistinctRatio, agg_row, profile) -> dict[str, Any]:
    """Verdict for a distinct-ratio check: ratio = distinct non-null
    values / non-null rows (NULLs neither count as values nor depress
    an id-column's ratio).  Empty input (no non-null rows) fails."""
    if c.method == "exact":
        d = int(agg_row["d"])
        nn = int(agg_row["nn"] or 0)
    else:
        acc = profile.column(c.column) if c.column in profile.acc.cols else None
        hll = getattr(acc, "hll", None)
        d = int(round(hll.estimate())) if hll is not None else 0
        nn = (acc.n - acc.n_null) if acc is not None else 0
    ratio = (d / nn) if nn else None
    failed = (
        ratio is None
        or (c.lo is not None and ratio < float(c.lo))
        or (c.hi is not None and ratio > float(c.hi))
    )
    return {
        "constraint": c.name,
        "type": "distinct_ratio",
        "column": c.column,
        "method": c.method,
        "n_distinct": d if nn else None,
        "n_nonnull": nn,
        "ratio": ratio,
        "lo": c.lo,
        "hi": c.hi,
        "n_violations": int(failed),
        "passed": not failed,
    }


def _monotonic_result(c: Monotonic, n_bad: int) -> dict[str, Any]:
    """Verdict for an ordering check: n_violations = violating
    adjacent pairs; the violation table lists them."""
    return {
        "constraint": c.name,
        "type": "monotonic",
        "column": c.column,
        "order_by": list(c.order_by),
        "group_col": c.group_col,
        "strict": c.strict,
        "n_violations": int(n_bad),
        "passed": n_bad == 0,
    }


def _entropy_bound_result(c: EntropyBound, row) -> dict[str, Any]:
    """Verdict for an entropy gate: the gated statistic is
    entropy_bits, or normalized_entropy when c.normalized.  A column
    with no non-null values fails loudly (entropy of nothing is a
    broken contract, not a pass)."""
    value = row["normalized_entropy"] if c.normalized else row["entropy_bits"]
    failed = (
        value is None
        or (c.lo is not None and value < float(c.lo))
        or (c.hi is not None and value > float(c.hi))
    )
    return {
        "constraint": c.name,
        "type": "entropy_bound",
        "column": c.column,
        "normalized": c.normalized,
        "n_nonnull": int(row["n_nonnull"]),
        "n_distinct": int(row["n_distinct"]),
        "entropy_bits": row["entropy_bits"],
        "value": value,
        "lo": c.lo,
        "hi": c.hi,
        "n_violations": int(failed),
        "passed": not failed,
    }


def _correlation_bound_result(c: CorrelationBound, row) -> dict[str, Any]:
    """Verdict for a correlation gate: undefined corr (constant column
    or <2 complete pairs) fails loudly."""
    value = row["corr"]
    failed = (
        value is None
        or (c.lo is not None and value < float(c.lo))
        or (c.hi is not None and value > float(c.hi))
    )
    return {
        "constraint": c.name,
        "type": "correlation_bound",
        "column": c.column,
        "other": c.other,
        "n": int(row["n"]),
        "corr": value,
        "lo": c.lo,
        "hi": c.hi,
        "n_violations": int(failed),
        "passed": not failed,
    }


def _mutual_information_result(
    c: MutualInformationBound, row
) -> dict[str, Any]:
    """Verdict for a mutual-information gate: gated statistic is
    mi_bits, or nmi when c.normalized.  No observed (non-null, non-null)
    pairs fails loudly."""
    n = int(row["n"])
    value = None if n == 0 else (row["nmi"] if c.normalized else row["mi_bits"])
    failed = (
        value is None
        or (c.lo is not None and value < float(c.lo))
        or (c.hi is not None and value > float(c.hi))
    )
    return {
        "constraint": c.name,
        "type": "mutual_information_bound",
        "column": c.column,
        "other": c.other,
        "normalized": c.normalized,
        "n": n,
        "n_pairs": int(row["n_pairs"]),
        "mi_bits": row["mi_bits"] if n else None,
        "nmi": row["nmi"] if n else None,
        "value": value,
        "lo": c.lo,
        "hi": c.hi,
        "n_violations": int(failed),
        "passed": not failed,
    }


def _quantile_bound_result(
    c: QuantileBound, exact_value, profile
) -> dict[str, Any]:
    """Verdict for a QuantileBound: exact path carries the refinement
    search's value (None = empty column), sketch path reads the pass-1
    profile's KLL.  A value of None FAILS — a quantile bound over no
    data is a broken contract, never a silent pass."""
    if c.method == "exact":
        value = None if exact_value is None else float(exact_value)
    else:
        acc = profile.column(c.column) if c.column in profile.acc.cols else None
        kll = getattr(acc, "kll", None)
        value = float(kll.quantile(c.q)) if kll is not None and kll.n else None
    failed = (
        value is None
        or (c.lo is not None and value < float(c.lo))
        or (c.hi is not None and value > float(c.hi))
    )
    return {
        "constraint": c.name,
        "type": "quantile_bound",
        "column": c.column,
        "q": c.q,
        "method": c.method,
        "value": value,
        "lo": c.lo,
        "hi": c.hi,
        "n_violations": int(failed),
        "passed": not failed,
    }


def _check_drift(c: Drift, profile, baseline_profile) -> dict[str, Any]:
    metrics = drift_column(baseline_profile.column(c.column), profile.column(c.column))
    ks, psi = metrics.get("ks"), metrics.get("psi")
    w1, chi2 = metrics.get("w1"), metrics.get("chi2")
    failed = (
        (ks is not None and ks > c.max_ks)
        or (psi is not None and psi > c.max_psi)
        or (c.max_w1 is not None and w1 is not None and w1 > c.max_w1)
        or (c.max_chi2 is not None and chi2 is not None and chi2 > c.max_chi2)
    )
    return {
        "constraint": c.name,
        "type": "drift",
        "column": c.column,
        "ks": ks,
        "psi": psi,
        "w1": w1,
        "chi2": chi2,
        "max_ks": c.max_ks,
        "max_psi": c.max_psi,
        "max_w1": c.max_w1,
        "max_chi2": c.max_chi2,
        "n_violations": int(failed),
        "passed": not failed,
    }
