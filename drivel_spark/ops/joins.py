"""Temporal joins Spark lacks as built-ins, composed from shuffle-safe
primitives (SURVEY.md §2.10 joins row: as-of / range).

* :func:`asof_join` — backward as-of join (each left row picks the
  latest right row with ``right_ts <= left_ts`` per key) via the
  union + ordered-window ``last(ignorenulls)`` trick: ONE shuffle on
  the key, no inequality join, no per-key driver work.  The standard
  formulation used by time-series engines; at 10^12 rows the shuffle
  is the same hash partitioning any equi-join pays, and AQE handles
  hot keys.
* :func:`range_join` — point-in-interval join via bucketed overlap:
  intervals explode to the fixed-width buckets they cover, points join
  their own bucket equi-wise, then the exact containment predicate
  filters.  Turns the O(n·m) inequality join (Spark would plan a
  broadcast-nested-loop) into an equi-join whose fan-out is bounded by
  interval_length / bucket_width per interval; pick ``bucket_width``
  near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _contains_map(dt) -> bool:
    """True when the data type (recursively) contains a MapType —
    Spark's hash/xxhash64 reject those."""
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of LEFT join: every left row, plus ``right_cols``
    from the latest right row at-or-before its timestamp (per ``on``
    key); nulls when no prior right row exists.

    Ordering puts right rows BEFORE left rows at equal timestamps, so
    the match is inclusive (``right_ts <= left_ts``) — the same
    convention as DuckDB's ``ASOF JOIN`` (which the contract oracle
    uses to verify this operator).

    The matched right row's payload travels as ONE struct (non-null for
    every right row, even when individual payload fields are NULL), so
    ``last(ignorenulls)`` picks whole rows atomically: a NULL field in
    the matched row stays NULL (merge_asof semantics) instead of being
    back-filled from an older row, and multi-column payloads can never
    mix fields from different right rows.

    Duplicate-timestamp determinism (ADVICE r02): when multiple right
    rows share the same ``(key, right_ts)``, the window ordering adds
    ``xxhash64(payload)`` as a final tiebreaker, so the SAME right row
    (the max-hash one — an arbitrary but stable choice) wins on every
    run and partitioning.  Exception: Spark forbids hashing MapType, so
    a payload containing a map column falls back to the (ts, side)
    ordering — ties then resolve arbitrarily (pre-aggregate the right
    side to one row per (key, ts) if that matters).  Callers needing a
    semantic tiebreak should pre-aggregate either way.
    """
    lt = (
        left.withColumn("__t", F.col(left_ts))
        .withColumn("__side", F.lit(1))
        .withColumn(
            "__payload",
            F.lit(None).cast(
                "struct<" + ", ".join(
                    f"{c}: {right.schema[c].dataType.simpleString()}"
                    for c in right_cols
                ) + ">"
            ),
        )
    )
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__payload"),
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    # xxhash64 over the payload struct: plan-independent total order
    # among right rows tied on (key, ts); left rows' NULL payload hashes
    # to a constant and left payloads are ignorenulls-skipped anyway.
    # MapType is not hashable in Spark — fall back to the non-total
    # ordering for map payloads (documented above).
    order_cols = [F.col("__t"), F.col("__side")]
    if not any(_contains_map(right.schema[c].dataType) for c in right_cols):
        order_cols.append(F.xxhash64(F.col("__payload")))
    w = (
        Window.partitionBy(on)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*", F.last("__payload", ignorenulls=True).over(w).alias("__match")
    )
    out = filled.filter(F.col("__side") == 1)
    for c in right_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(f"__match.{c}"))
    return out.drop("__t", "__side", "__payload", "__match")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner join of point rows to every interval row with
    ``start <= point <= end`` (inclusive), as a bucketed equi-join.

    Each interval is exploded to the bucket range it covers (a
    ``sequence`` — JVM-side, no Python); each point carries its single
    bucket; the equi-join on bucket co-locates only plausibly-matching
    rows and the exact predicate filters.  A point meets an interval in
    exactly one bucket (its own), so no post-join dedup is needed.
    Output: all point columns + all interval columns.
    """
    bw = float(bucket_width)
    p = points.withColumn("__bucket", F.floor(F.col(point_col) / F.lit(bw)))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bw)),
                F.floor(F.col(end_col) / F.lit(bw)),
            )
        ),
    )
    return (
        p.join(iv, on="__bucket")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__bucket")
    )
