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


def edit_distance_join(
    a: DataFrame,
    b: DataFrame | None = None,
    string_col: str = "s",
    id_col: str = "id",
    max_dist: int = 1,
    keep_strings: bool = False,
) -> DataFrame:
    """Similarity join under edit (Levenshtein) distance: all pairs
    with ``levenshtein(a.s, b.s) <= max_dist``.  ``b=None`` is the
    self-join (``id_a < id_b``).  Output: ``(id_a, id_b, dist)`` plus
    ``(s_a, s_b)`` when ``keep_strings``.

    Three-stage shape, every stage an equi-join in whole-stage codegen
    (no Python, no cross join, no similarity UDF):

    1. **Distinct-value prejoin.**  Real string columns are heavily
       duplicated (transcripts, product names, normalized titles), so
       candidates are generated over DISTINCT strings only and the
       verified string-pairs are multiplied back to id-pairs by two
       equi-joins at the end.  A column with v distinct values costs
       candidate work O(f(v)), not O(f(rows)).
    2. **PassJoin-style pigeonhole candidates** (Li/Deng/Feng 2011,
       public literature): partition each right string v (length n)
       into ``max_dist+1`` contiguous segments; if ``ed(u, v) <=
       max_dist`` then u must contain at least one segment verbatim,
       within ``max_dist`` of its home position.  Candidates are the
       equi-join of v's (n, seg_idx, seg_str) against u's enumerated
       (n, seg_idx, substring) probes — substrings of length ~n/(d+1),
       far more selective than q-grams and with no stop-gram hot key.
       Fan-out per distinct string is (d+1)(2d+1) segments x (2d+1)
       length bands — constant, ~45 rows at d=2.
    3. **Exact verify** with Spark's built-in ``levenshtein(l, r,
       threshold)`` (JVM codegen, early-exit DP).

    Strings shorter than ``max_dist + 1`` cannot be segmented; they are
    routed through a broadcast band-cross arm against strings of length
    <= 2·max_dist — an alphabet-bounded set, so the cross stays O(1)
    relative to corpus size.

    NULL strings never match (SQL join semantics drop them).
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0: {max_dist}")
    d = int(max_dist)
    self_join = b is None
    if self_join:
        b = a

    ua = a.select(F.col(string_col).alias("u")).filter(
        F.col("u").isNotNull()
    ).distinct()
    vb = b.select(F.col(string_col).alias("v")).filter(
        F.col("v").isNotNull()
    ).distinct()

    if d == 0:
        matched = ua.join(vb, ua["u"] == vb["v"]).select(
            "u", "v", F.lit(0).alias("dist")
        )
    else:
        # segments of v: i-th of d+1 even parts, start floor(i*n/(d+1))
        nv = F.length("v")
        segs = (
            vb.withColumn("n", nv)
            .filter(F.col("n") >= d + 1)
            .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(d))))
            .withColumn("st", F.floor(F.col("i") * F.col("n") / F.lit(d + 1)))
            .withColumn(
                "ln",
                F.floor((F.col("i") + 1) * F.col("n") / F.lit(d + 1))
                - F.col("st"),
            )
            .withColumn(
                "key", F.expr("substring(v, cast(st + 1 as int), cast(ln as int))")
            )
            .select("n", "i", "key", "v")
        )
        # probes of u: for each candidate right-length n in [m-d, m+d]
        # and segment i, every substring of the segment's length within
        # +-d of the segment's home position (guarded sequence: Spark's
        # sequence(lo, hi) DESCENDS when lo > hi instead of yielding
        # empty, so clamp via when())
        m = F.length("u")
        lo = F.greatest(F.lit(0), F.col("st") - F.lit(d))
        hi = F.least(F.col("m") - F.col("ln"), F.col("st") + F.lit(d))
        probes = (
            ua.withColumn("m", m)
            .withColumn(
                "n",
                F.explode(F.sequence(F.col("m") - F.lit(d), F.col("m") + F.lit(d))),
            )
            .filter(F.col("n") >= d + 1)
            .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(d))))
            .withColumn("st", F.floor(F.col("i") * F.col("n") / F.lit(d + 1)))
            .withColumn(
                "ln",
                F.floor((F.col("i") + 1) * F.col("n") / F.lit(d + 1))
                - F.col("st"),
            )
            .withColumn(
                "p",
                F.explode(
                    F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
                        F.array().cast("array<bigint>")
                    )
                ),
            )
            .withColumn(
                "key", F.expr("substring(u, cast(p + 1 as int), cast(ln as int))")
            )
            .select("n", "i", "key", "u")
        )
        # no distinct here: the union below is distinct'd once, and the
        # aggregate's map-side partial pass already collapses same-
        # partition duplicates — an inner distinct would only add a
        # full extra Exchange for the cross-partition ones
        cands = probes.join(segs, ["n", "i", "key"]).select("u", "v")

        # short-string arm: v with n < d+1 against u with m <= 2d
        shorts_v = vb.filter(F.length("v") < d + 1)
        shorts_u = ua.filter(F.length("u") <= 2 * d)
        short_cands = shorts_u.crossJoin(F.broadcast(shorts_v)).select("u", "v")

        matched = (
            cands.union(short_cands)
            .distinct()
            .withColumn("dist", F.levenshtein("u", "v", d))
            .filter(F.col("dist") >= 0)
        )

    ids_a = a.select(F.col(id_col).alias("id_a"), F.col(string_col).alias("u"))
    ids_b = b.select(F.col(id_col).alias("id_b"), F.col(string_col).alias("v"))
    out = matched.join(ids_a, "u").join(ids_b, "v")
    if self_join:
        out = out.filter(F.col("id_a") < F.col("id_b"))
    cols = ["id_a", "id_b", "dist"]
    if keep_strings:
        cols += [F.col("u").alias("s_a"), F.col("v").alias("s_b")]
    return out.select(*cols)
