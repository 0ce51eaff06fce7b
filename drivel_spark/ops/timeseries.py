"""Time-series quality screens: CUSUM changepoint detection per key.

A validation engine over a continuously-ingested table wants to know
WHEN a column's level shifted, not just that the aggregate drifted:
CUSUM (Page 1954) accumulates standardized deviations and alarms when
the running excursion exceeds ``h`` sigma, detecting small persistent
shifts far earlier than per-batch KS/PSI.

Spark-first trick: the CUSUM recursion ``s_i = max(0, s_{i-1} + a_i)``
looks sequential, but it has the closed form

    s_i = C_i − min(0, min_{j≤i} C_j),   C_i = Σ_{j≤i} a_j

(and symmetrically for the negative side with a running max), so the
whole detector is two cumulative-window expressions — pure Catalyst,
whole-stage codegen, no UDF, no per-row Python, and bit-reproducible
given a deterministic ordering.

Scale contract: one shuffle on ``key_col`` + an in-partition sort
(the same bounded-key contract as streaming session windows — key
cardinality × per-key rows must fit a task; for unbounded keys,
range-bucket the time axis and carry prefix offsets, as
constraints/drift.wasserstein_exact does for the value axis).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..io import local_df

__all__ = [
    "cusum_scores",
    "cusum_alarms",
    "coverage_gaps",
    "monotonic_violations",
    "interval_overlap_violations",
]


def cusum_scores(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    k_drift: float = 0.5,
    order_cols: Optional[Sequence[str]] = None,
    baseline: Optional[DataFrame] = None,
) -> DataFrame:
    """Append two-sided CUSUM scores per key, ordered by (ts_col,
    *order_cols) — pass tie-breaker columns so the ordering (and thus
    the scores) is total and deterministic.

    Standardization uses each key's own mean/stddev from one
    partial+final agg (or a ``baseline`` DataFrame with columns
    (key_col, mean, sd) — the profile-vs-batch mode, so a poisoned
    batch can't normalize its own shift away; keys absent from the
    baseline are dropped by the inner join — score only what the
    profile vouches for).  Rows with NULL value are dropped; keys
    with zero variance score 0.
    """
    clean = df.where(F.col(value_col).isNotNull())
    if baseline is None:
        baseline = clean.groupBy(key_col).agg(
            F.avg(value_col).alias("mean"), F.stddev_pop(value_col).alias("sd")
        )
    # internal names so a caller's own mean/sd columns survive the join
    base = baseline.select(
        key_col, F.col("mean").alias("__mean"), F.col("sd").alias("__sd")
    )
    j = clean.join(base, key_col)
    dev = F.when(
        F.col("__sd") > 0, (F.col(value_col) - F.col("__mean")) / F.col("__sd")
    ).otherwise(F.lit(0.0))
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c_pos = F.sum(dev - F.lit(float(k_drift))).over(w)
    c_neg = F.sum(dev + F.lit(float(k_drift))).over(w)
    return (
        j.withColumn("__cp", c_pos)
        .withColumn("__cn", c_neg)
        .withColumn(
            "s_pos", F.col("__cp") - F.min(F.least(F.lit(0.0), F.col("__cp"))).over(w)
        )
        .withColumn(
            "s_neg",
            F.max(F.greatest(F.lit(0.0), F.col("__cn"))).over(w) - F.col("__cn"),
        )
        .drop("__cp", "__cn", "__mean", "__sd")
    )


def cusum_alarms(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    k_drift: float = 0.5,
    h_threshold: float = 5.0,
    order_cols: Optional[Sequence[str]] = None,
    baseline: Optional[DataFrame] = None,
) -> DataFrame:
    """Per-key alarm summary: rows where either CUSUM side exceeds
    ``h_threshold`` sigma, reduced to (key, n_alarms, first_alarm_ts,
    max_s) by one partial+final agg.  Keys that never alarm still get
    a row (n_alarms=0) so the report covers the whole key universe."""
    scored = cusum_scores(
        df,
        key_col,
        ts_col,
        value_col,
        k_drift=k_drift,
        order_cols=order_cols,
        baseline=baseline,
    )
    alarmed = (F.col("s_pos") > F.lit(float(h_threshold))) | (
        F.col("s_neg") > F.lit(float(h_threshold))
    )
    return scored.groupBy(key_col).agg(
        F.sum(alarmed.cast("long")).alias("n_alarms"),
        F.min(F.when(alarmed, F.col(ts_col))).alias("first_alarm_ts"),
        F.greatest(F.max("s_pos"), F.max("s_neg")).alias("max_s"),
    )


_TRUNC_STEP = {
    "minute": "interval 1 minute",
    "hour": "interval 1 hour",
    "day": "interval 1 day",
    "week": "interval 1 week",
    "month": "interval 1 month",
}


def coverage_gaps(
    df: DataFrame, ts_col: str, interval: str = "hour"
) -> DataFrame:
    """Missing time buckets as contiguous gap islands — the ingest-SLA
    check ("which hours have NO data?") that row- and aggregate-level
    constraints cannot see: an absent bucket produces no row to fail.

    One distinct on the truncated bucket (partial+final, O(present
    buckets) after combine), an O(1) min/max agg, a generated expected
    spine (``sequence()`` between the observed ends — O(span/interval)
    rows, never data-sized), an anti-join for the missing set, and the
    classic rn-difference islands trick to fold runs of consecutive
    missing buckets into (gap_start, gap_end, n_missing) rows.

    The islands window sorts only MISSING buckets (bounded by the
    spine, not the table).  Leading/trailing silence is invisible by
    construction — the spine spans observed data only; pin the
    expected ends with an explicit WHERE or a sentinel row if the SLA
    covers them.  ``interval``: minute|hour|day|week|month.
    """
    if interval not in _TRUNC_STEP:
        raise ValueError(
            f"interval must be one of {sorted(_TRUNC_STEP)}: {interval!r}"
        )
    ts = F.col(ts_col)
    buckets = (
        df.where(ts.isNotNull())
        .select(F.date_trunc(interval, ts).alias("bucket"))
        .distinct()
    )
    lo, hi = buckets.agg(F.min("bucket"), F.max("bucket")).first()
    spark = df.sparkSession
    if lo is None:
        return local_df(
            spark, [], "gap_start timestamp, gap_end timestamp, n_missing long"
        )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(lo), F.lit(hi), F.expr(_TRUNC_STEP[interval])
            )
        ).alias("bucket")
    )
    missing = spine.join(buckets, "bucket", "left_anti")
    # islands: consecutive buckets share (position - row_number)
    w = Window.orderBy("bucket")
    # month steps are not fixed-width seconds; use months_between for
    # the position index so the rn-difference stays integral
    if interval == "month":
        pos = F.round(
            F.months_between(F.col("bucket"), F.lit(lo))
        ).cast("long")
    else:
        step_s = {
            "minute": 60,
            "hour": 3600,
            "day": 86400,
            "week": 604800,
        }[interval]
        pos = (
            (F.unix_timestamp("bucket") - F.unix_timestamp(F.lit(lo)))
            / F.lit(step_s)
        ).cast("long")
    grouped = missing.withColumn(
        "__gap_id", pos - F.row_number().over(w)
    )
    return (
        grouped.groupBy("__gap_id")
        .agg(
            F.min("bucket").alias("gap_start"),
            F.max("bucket").alias("gap_end"),
            F.count(F.lit(1)).alias("n_missing"),
        )
        .drop("__gap_id")
        .orderBy("gap_start")
    )


def monotonic_violations(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    group_col: Optional[str] = None,
    strict: bool = False,
) -> DataFrame:
    """Ordering-invariant check: ``value_col`` must be non-decreasing
    (``strict=True``: strictly increasing) along ``order_by`` — per
    group when ``group_col`` is given, globally otherwise.  The gate
    for "sequence numbers never go backwards per shard", "event time
    non-decreasing per session", "offsets strictly increase per file":
    a violated ordering is how replayed ingests, clock skew, and
    merge-order bugs announce themselves while every row individually
    stays in range.

    Returns the violating ADJACENT pairs: ``([group_col], <order_by
    cols>, prev_value, value)`` — empty means monotonic.  NULL values
    never violate (no order defined against NULL); ties in ``order_by``
    must be broken by including a unique column (e.g. the row id) so
    the adjacency relation — and therefore the verdict — is
    deterministic on every engine and partitioning.

    Scale: with a group, ONE hash shuffle + per-group in-partition
    sort (``lag`` window; the usual bounded-group contract).  Without
    a group, the naive ``Window.orderBy`` would funnel the table
    through a single task, so the global path instead assigns
    positions with :func:`~drivel_spark.ops.selection.assign_row_ids`
    (value-bucketed two-level row_number, bounded shuffle) and joins
    pos ↔ pos+1 — two bounded shuffles, no single-partition stage,
    holds at any row count.
    """
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    if not order_cols:
        raise ValueError("monotonic_violations needs order_by")
    for c in order_cols + [value_col] + ([group_col] if group_col else []):
        if c not in df.columns:
            raise ValueError(f"monotonic_violations: unknown column {c!r}")
    bad = (
        F.col("prev_value") > F.col(value_col)
        if not strict
        else F.col("prev_value") >= F.col(value_col)
    )
    keep = ([group_col] if group_col else []) + order_cols
    if group_col is not None:
        w = Window.partitionBy(group_col).orderBy(
            *[F.col(c).asc() for c in order_cols]
        )
        return (
            df.withColumn("prev_value", F.lag(value_col).over(w))
            .filter(F.col("prev_value").isNotNull() & bad)
            .select(*keep, "prev_value", value_col)
        )
    from .selection import assign_row_ids

    pos = assign_row_ids(
        df.select(*order_cols, value_col), order_by=order_cols, out_col="__pos"
    )
    prev = pos.select(
        (F.col("__pos") + 1).alias("__pos"),
        F.col(value_col).alias("prev_value"),
    )
    return (
        pos.join(prev, "__pos")
        .filter(F.col("prev_value").isNotNull() & bad)
        .select(*keep, "prev_value", value_col)
    )


def interval_overlap_violations(
    df: DataFrame,
    group_col: str,
    start_col: str,
    end_col: str,
    tiebreak: Sequence[str] = (),
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group interval disjointness check: within each ``group_col``
    the ``[start_col, end_col)`` intervals must not overlap — THE
    structural invariant of a segment table (segments of one clip must
    tile it, never double-cover: an overlap means the same audio lands
    in the corpus twice under different segment ids, a dedup-invisible
    duplication) and of any per-key bookings/validity/session layout.

    Returns the violating rows: ``(group_col, *keep_cols, start_col,
    end_col, prev_end)`` where ``prev_end`` is the running maximum of
    the ends of the intervals ordered BEFORE this row — a row is
    emitted iff ``start < prev_end`` (half-open semantics: touching
    endpoints are legal).  Empty result = disjoint everywhere.
    ``prev_end`` is emitted rather than a subtraction so the op stays
    type-generic (dates, timestamps, ints, doubles); the caller
    differences in its own unit.

    Ordering is ``(start, end, *tiebreak)``; pass a unique column
    (seg_idx, line number) as ``tiebreak`` so the adjacency relation —
    and therefore the verdict — is deterministic on any partitioning.
    Rows with NULL start or end are excluded (no order against NULL);
    an inverted interval (end < start) is a Range/Conditional check's
    job, but it cannot corrupt this detector — the running max simply
    ignores it.

    Scale: ONE hash shuffle on ``group_col`` + an in-partition sort
    (``max(...).over(rowsBetween(unboundedPreceding, -1))`` — the
    bounded-group contract shared with session windows and CUSUM); no
    joins, no self-pairing, pure whole-stage codegen.
    """
    for c in [group_col, start_col, end_col, *tiebreak, *keep_cols]:
        if c not in df.columns:
            raise ValueError(f"interval_overlap_violations: unknown column {c!r}")
    order = [F.col(start_col).asc(), F.col(end_col).asc()] + [
        F.col(c).asc() for c in tiebreak
    ]
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.filter(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
        .withColumn("prev_end", F.max(end_col).over(w))
        .filter(F.col(start_col) < F.col("prev_end"))
        .select(group_col, *keep_cols, start_col, end_col, "prev_end")
    )
