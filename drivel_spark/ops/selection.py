"""Exact top-fraction selection without a global sort.

The training-data stage "keep the top 30% of documents by quality
score" needs the EXACT k-th largest score as a threshold.  A global
orderBy is a single-machine sort at 10^12 rows and approxQuantile
changes the kept set between runs; instead this is the classic
distributed selection algorithm: iterative histogram refinement.

Each round is one scan with a tiny agg (rank-above count + an
O(n_buckets) in-range histogram); the candidate value range shrinks
by ~n_buckets× per round, so a handful of passes (typically 2-3)
pins the threshold down to ≤ ``leaf_limit`` values, which are
collected and order-selected exactly in numpy.  Mass ties collapse
the range to a point and terminate via the min==max probe.

Float-edge discipline: bucket membership (floor arithmetic) and range
membership (comparisons) can disagree by 1 ulp at bucket edges, so the
refined interval is widened by one ulp on each side and the rank above
the interval is RECOUNTED by comparison at the start of every round —
bucket counts only ever steer the search, never the final rank.

Every pass is scan + tiny agg: no data-row shuffle, no sort, driver
state O(n_buckets + leaf_limit).  Ties at the threshold keep ALL tied
rows (``score >= T``), so the kept set is deterministic and
layout-independent — re-runs and resumes reproduce it exactly.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import local_df

__all__ = [
    "top_fraction_threshold",
    "top_fraction_filter",
    "exact_percent_rank",
    "assign_row_ids",
    "exact_quantile",
    "iqr_bounds",
    "value_histogram",
    "dsir_importance_weights",
    "dsir_select",
]


def top_fraction_threshold(
    df: DataFrame,
    col: str,
    frac: float,
    n_buckets: int = 256,
    leaf_limit: int = 65536,
    max_rounds: int = 24,
    k: int = None,
) -> float:
    """The exact k-th largest value of ``col`` where k = ceil(frac·n),
    NULL/NaN excluded.  frac=1.0 returns the minimum.  An explicit
    ``k`` overrides the frac-derived rank (exact_quantile uses this —
    ceil((k/n)·n) can land on k+1 under float slop)."""
    if not (0.0 < frac <= 1.0):
        raise ValueError(f"frac must be in (0, 1]: {frac}")
    vals = df.select(F.col(col).cast("double").alias("v")).where(
        F.col(col).isNotNull() & ~F.isnan(F.col(col).cast("double"))
    )
    lo, hi, n = vals.agg(F.min("v"), F.max("v"), F.count("v")).first()
    if not n:
        raise ValueError(f"no non-null values in {col!r}")
    k = int(math.ceil(frac * n)) if k is None else min(max(int(k), 1), int(n))
    gmax = float(hi)

    def _leaf(in_range: DataFrame, need: int) -> float:
        arr = np.sort(np.array([r["v"] for r in in_range.select("v").collect()]))[::-1]
        return float(arr[min(max(need, 1), arr.size) - 1])

    for _ in range(max_rounds):
        if lo == hi:
            return float(lo)
        in_range = vals.where((F.col("v") >= F.lit(lo)) & (F.col("v") <= F.lit(hi)))
        # rank of T inside the interval, recounted by COMPARISON so
        # bucket-edge float slop can never shift it
        stats = vals.agg(
            F.sum((F.col("v") > F.lit(hi)).cast("long")).alias("n_gt"),
            F.sum(
                ((F.col("v") >= F.lit(lo)) & (F.col("v") <= F.lit(hi))).cast("long")
            ).alias("n_in"),
            F.min(F.when(F.col("v") >= F.lit(lo), F.col("v"))).alias("rmin"),
            F.max(F.when(F.col("v") <= F.lit(hi), F.col("v"))).alias("rmax"),
        ).first()
        need = k - int(stats["n_gt"])
        n_in = int(stats["n_in"])
        if need <= 0:
            # defensive: float slop pushed T above the interval —
            # restore the invariant by re-opening the top; the rank
            # recount next round re-localizes it
            hi = gmax
            continue
        if n_in <= leaf_limit:
            return _leaf(in_range, need)
        width = (hi - lo) / n_buckets
        bucket = F.least(
            F.floor((F.col("v") - F.lit(lo)) / F.lit(width)), F.lit(n_buckets - 1)
        ).cast("int")
        hist = {
            int(r["b"]): int(r["c"])
            for r in in_range.groupBy(bucket.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        cum = 0
        new_lo = new_hi = None
        for b in range(n_buckets - 1, -1, -1):
            c = hist.get(b, 0)
            if cum + c >= need:
                new_lo = lo + b * width
                new_hi = hi if b == n_buckets - 1 else lo + (b + 1) * width
                break
            cum += c
        if new_lo is None:  # histogram/comparison edge disagreement
            return _leaf(in_range, need)
        # generous edges (relative slop ≫ accumulated float error)
        # restore T ∈ interval despite floor/comparison disagreement
        eps = width * 1e-9
        new_lo = float(np.nextafter(new_lo - eps, -np.inf))
        new_hi = float(np.nextafter(new_hi + eps, np.inf))
        new_lo, new_hi = max(new_lo, lo), min(new_hi, hi)
        if (new_lo, new_hi) == (lo, hi):
            # no progress: mass ties or denormal-tight range
            if stats["rmin"] == stats["rmax"]:
                return float(stats["rmin"])
            return _leaf(in_range, need)
        lo, hi = new_lo, new_hi
    in_range = vals.where((F.col("v") >= F.lit(lo)) & (F.col("v") <= F.lit(hi)))
    n_gt = int(vals.agg(F.sum((F.col("v") > F.lit(hi)).cast("long"))).first()[0] or 0)
    return _leaf(in_range, k - n_gt)


def top_fraction_filter(
    df: DataFrame,
    col: str,
    frac: float,
    n_buckets: int = 256,
    leaf_limit: int = 65536,
) -> tuple[DataFrame, float]:
    """Rows whose ``col`` ≥ the exact top-``frac`` threshold (ties at
    the threshold all kept), plus the threshold itself.  The filter is
    a pure codegen predicate over the scan — the selection never
    shuffles data rows, only O(n_buckets) histogram rows per round."""
    t = top_fraction_threshold(
        df, col, frac, n_buckets=n_buckets, leaf_limit=leaf_limit
    )
    v = F.col(col).cast("double")
    # Spark sorts NaN ABOVE everything, so a bare v >= t would smuggle
    # NaN scores (excluded from the threshold computation) into the cut
    return df.where(~F.isnan(v) & (v >= F.lit(t))), t


def exact_percent_rank(
    df: DataFrame,
    col: str,
    out_col: str = "pct_rank",
    n_buckets: int = 256,
) -> DataFrame:
    """Append each row's EXACT ``percent_rank`` of ``col`` (SQL
    semantics: ``(rank − 1)/(n − 1)`` with rank = 1 + count of strictly
    smaller values) — the corpus-percentile normalization stage — with
    NO global sort and NO single-partition window.

    Same two-level shape as the selection above: one agg for
    (min, max, n), one fixed-width bucket histogram (O(n_buckets) rows
    to the driver) whose prefix sums become per-bucket rank offsets,
    broadcast back; then ``rank()`` inside each bucket's bounded window
    completes the global rank as ``offset + rank_in_bucket``.  Bucket
    membership and the window partition use the SAME floor expression,
    so float-edge bucket assignment can never disagree with itself.

    NULL/NaN rows pass through with NULL rank (they don't compete).
    A single-value column ranks everything 0.0, matching RANK ties.

    Skew bound: equal values share a bucket by construction, so a
    mass-tied value concentrates its rows into ONE window partition —
    the per-bucket window is bounded by the largest tie group plus its
    bucket neighbours, not by n/n_buckets.  Acceptable for score-like
    continuous columns; for heavily tied discrete columns prefer a
    groupBy-count rank (the tie group's rank is a single constant).
    """
    from pyspark.sql import Window

    v = F.col(col).cast("double")
    valid = v.isNotNull() & ~F.isnan(v)
    stats = df.where(valid).agg(F.min(v), F.max(v), F.count(F.lit(1))).first()
    lo, hi, n = stats[0], stats[1], int(stats[2])
    if n == 0:
        return df.withColumn(out_col, F.lit(None).cast("double"))
    if n == 1 or lo == hi:
        return df.withColumn(
            out_col, F.when(valid, F.lit(0.0)).otherwise(F.lit(None))
        )
    width = (hi - lo) / n_buckets
    bucket = F.when(
        valid,
        F.least(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(n_buckets - 1)).cast(
            "int"
        ),
    ).otherwise(F.lit(-1))
    tagged = df.withColumn("__pr_bkt", bucket)
    hist = sorted(
        (int(r["__pr_bkt"]), int(r["c"]))
        for r in tagged.where(F.col("__pr_bkt") >= 0)
        .groupBy("__pr_bkt")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    offsets, cum = [], 0
    for b, c in hist:
        offsets.append((b, cum))
        cum += c
    spark = df.sparkSession
    off_df = local_df(spark, offsets, "__pr_bkt int, __pr_off long")
    w = Window.partitionBy("__pr_bkt").orderBy(v)
    ranked = (
        tagged.join(F.broadcast(off_df), "__pr_bkt", "left")
        .withColumn(
            out_col,
            F.when(
                F.col("__pr_bkt") >= 0,
                (F.col("__pr_off") + F.rank().over(w) - F.lit(1))
                / F.lit(float(n - 1)),
            ).otherwise(F.lit(None).cast("double")),
        )
        .drop("__pr_bkt", "__pr_off")
    )
    return ranked


def assign_row_ids(
    df: DataFrame,
    order_by=None,
    out_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append global contiguous 0..n−1 row ids WITHOUT the classic
    single-partition trap (``row_number().over(Window.orderBy(...))``
    funnels the whole table through one task — the most common
    accidental scale-killer in id assignment).

    With ``order_by`` (column name or list): ids follow the global
    order of those columns.  Range bounds on the FIRST order column
    are computed once on the driver from a seeded bounded sample and
    embedded as LITERALS, so every pass buckets rows identically by
    VALUE — never by ``spark_partition_id``, whose physical layout is
    not stable across the separate count and window query executions
    (range-sampling and AQE re-plan independently per query).  Rows
    bucket via an O(n_buckets) codegen fold over the bounds array,
    per-bucket counts (O(n_buckets) rows to the driver) become
    prefix-sum offsets broadcast back, and a bounded per-bucket
    ``row_number`` window completes ``id = offset + row_number − 1``.
    Rows equal on the first column always share a bucket, so the
    within-bucket ordering by the FULL column list is globally
    consistent.  Give a TOTAL order (unique tiebreaker column) for
    fully deterministic ids.  NULLs in the first column land in
    bucket 0 (Spark's ascending NULLS FIRST).  Bound quality only
    affects balance, never correctness; a mass-tied first column
    concentrates its ties into one bucket (same caveat as
    exact_percent_rank — prefer a higher-cardinality leading column).

    With ``order_by=None``: ids follow the current partition layout
    (partition-major, file order within) with ZERO data shuffle —
    ``monotonically_increasing_id`` supplies the within-partition
    order and a per-partition-count offset rejoin makes it
    contiguous.  Stable only for a fixed file-scan layout (the two
    passes must see identical splits); a different split renumbers.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    if order_by:
        cols = [order_by] if isinstance(order_by, str) else list(order_by)
        n_buckets = int(
            num_partitions
            or spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
        lead = F.col(cols[0])
        n = df.count()
        if n == 0:
            return df.withColumn(out_col, F.lit(None).cast("long"))
        # seeded bounded sample -> evenly spaced order statistics as
        # bucket bounds (literals: identical in every pass)
        frac = min(1.0, (100.0 * n_buckets) / n)
        sample = sorted(
            r[0]
            for r in df.sample(fraction=frac, seed=42)
            .select(lead)
            .where(lead.isNotNull())
            .collect()
        )
        bounds = []
        for i in range(1, n_buckets):
            if not sample:
                break
            b = sample[min(i * len(sample) // n_buckets, len(sample) - 1)]
            if not bounds or b > bounds[-1]:
                bounds.append(b)
        if bounds:
            # plain expression-tree sum rather than an F.aggregate
            # lambda: a higher-order function whose lambda captures an
            # OUTER column breaks Catalyst resolution when that column
            # is itself a derived expression (INTERNAL_ERROR
            # ATTRIBUTE_NOT_FOUND under the broadcast join) — and the
            # unrolled comparisons codegen at least as well
            bucket = F.lit(0)
            for b in bounds:
                bucket = bucket + F.when(lead > F.lit(b), 1).otherwise(0)
        else:  # empty sample or single distinct value: one bucket
            bucket = F.lit(0)
        tagged = df.withColumn("__rid_bkt", bucket)
        order_exprs = [F.col(c) for c in cols]
        part_col = "__rid_bkt"
    else:
        tagged = df.withColumn("__rid_bkt", F.spark_partition_id())
        order_exprs = [F.monotonically_increasing_id()]
        part_col = "__rid_bkt"
    counts = sorted(
        (int(r[part_col]), int(r["c"]))
        for r in tagged.groupBy(part_col).agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offsets, cum = [], 0
    for p, c in counts:
        offsets.append((p, cum))
        cum += c
    off_df = local_df(
        spark, offsets or [(0, 0)], f"{part_col} int, __rid_off long"
    )
    w = Window.partitionBy(part_col).orderBy(*order_exprs)
    return (
        tagged.join(F.broadcast(off_df), part_col, "left")
        .withColumn(
            out_col, F.col("__rid_off") + F.row_number().over(w) - F.lit(1)
        )
        .drop(part_col, "__rid_off")
    )


def exact_quantile(df: DataFrame, col: str, q: float, **kw) -> float:
    """The EXACT upper-rounding empirical q-quantile: the smallest
    value v with at least ceil(q·n) values ≤ v (the ORDER BY … LIMIT 1
    OFFSET ceil(q·n)−1 order statistic).  One count + the same
    histogram-refinement search as top_fraction_threshold — no sort.
    q=0 returns the minimum, q=1 the maximum."""
    if not (0.0 <= q <= 1.0):
        raise ValueError(f"q must be in [0, 1]: {q}")
    v = F.col(col).cast("double")
    n = int(
        df.where(v.isNotNull() & ~F.isnan(v)).agg(F.count(F.lit(1))).first()[0]
    )
    if n == 0:
        raise ValueError(f"no non-null values in {col!r}")
    k_from_bottom = max(int(math.ceil(q * n)), 1)
    k_from_top = n - k_from_bottom + 1
    return top_fraction_threshold(df, col, k_from_top / n, k=k_from_top, **kw)


def iqr_bounds(
    df: DataFrame, col: str, whisker: float = 1.5, **kw
) -> tuple[float, float]:
    """Tukey outlier fences from EXACT quartiles: (q1 − w·IQR,
    q3 + w·IQR).  Two refinement searches, no sort — the robust
    complement of from_profile's min/max envelope (a single wild value
    poisons min/max; it cannot move a quartile)."""
    # the two refinement searches are independent Spark-job chains:
    # run them on driver threads so their jobs interleave (guide §2.6)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(exact_quantile, df, col, 0.25, **kw)
        f3 = pool.submit(exact_quantile, df, col, 0.75, **kw)
        q1, q3 = f1.result(), f3.result()
    iqr = q3 - q1
    return q1 - whisker * iqr, q3 + whisker * iqr


def robust_outlier_report(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    z_thresh: float = 3.5,
    approx_accuracy: int | None = None,
) -> DataFrame:
    """Per-ROW robust outliers within each group: robust z =
    |x − median(group)| / (1.4826 · MAD(group)), flagged beyond
    ``z_thresh`` (3.5 = the Iglewicz–Hoaglin cut).  The row-level
    complement of :func:`~drivel_spark.ops.skew.group_anomaly_report`
    (which asks "which GROUP is broken?"): this asks "which ROWS are
    broken within their group?", with median/MAD instead of mean/std
    so the outliers themselves cannot drag the fences open — the
    failure mode that makes 3-sigma checks miss exactly the corruption
    they exist for.

    Appends ``grp_median``, ``grp_mad``, ``robust_z``, ``is_outlier``
    to the input rows.  NULL values get NULL z / flag and are ignored
    by the statistics.  MAD = 0 (over half the group identical) flags
    every differing row — the strictest honest reading, matching
    group_anomaly_report's degenerate-spread semantics.

    Scale shape: two exact-median aggregations keyed on the group
    (Spark's sort-based exact ``median`` within hash-partitioned
    groups) and two key-co-partitioned joins of group-sized stats
    tables back onto the rows; no global sort, no driver collect.
    For extreme-cardinality values per group, pass
    ``approx_accuracy`` to switch both passes to
    ``percentile_approx`` (sketch-based, no per-group sort) — the
    flags then carry sketch error and an exact-replay oracle no
    longer applies (documented trade: exact by default, sketch as the
    explicit 10^12-row escape hatch).
    """
    grp = list(group_cols or [])
    x = F.col(value_col).cast("double")

    def _med(c):
        if approx_accuracy is not None:
            return F.percentile_approx(c, 0.5, approx_accuracy)
        return F.median(c)

    med_t = df.groupBy(*grp).agg(_med(x).alias("grp_median"))
    if grp:
        j = df.join(med_t, grp)
    else:  # one-row stats table: broadcast literal, not a data join
        j = df.crossJoin(F.broadcast(med_t))
    dev = F.abs(x - F.col("grp_median"))
    mad_t = j.groupBy(*grp).agg(_med(dev).alias("grp_mad"))
    if grp:
        rep = j.join(mad_t, grp)
    else:
        rep = j.crossJoin(F.broadcast(mad_t))
    scale = 1.4826 * F.col("grp_mad")
    z = (
        F.when(x.isNull(), F.lit(None))
        .when(scale > 0, F.abs(x - F.col("grp_median")) / scale)
        .when(x == F.col("grp_median"), F.lit(0.0))
        .otherwise(F.lit(float("inf")))
    )
    return rep.withColumn("robust_z", z).withColumn(
        "is_outlier",
        F.when(x.isNull(), F.lit(None)).otherwise(
            F.col("robust_z") > F.lit(float(z_thresh))
        ),
    )


def value_histogram(
    df: DataFrame, col: str, n_buckets: int = 32
) -> DataFrame:
    """Equi-width value histogram: (bucket, lo, hi, n) rows — the
    describe-level distribution primitive behind the drift/selection
    machinery, exposed as a report.  One O(1) agg for the range + one
    partial+final bucket count; the top bucket's hi edge is inclusive
    (same floor-clamp convention as the selection ops).  Buckets with
    zero rows are OMITTED (the output is the groupBy support, not a
    dense 0..n_buckets-1 spine) — densify downstream if needed."""
    v = F.col(col).cast("double")
    stats = df.where(v.isNotNull() & ~F.isnan(v)).agg(
        F.min(v), F.max(v), F.count(F.lit(1))
    ).first()
    lo, hi, n = stats[0], stats[1], int(stats[2])
    spark = df.sparkSession
    if n == 0:
        return local_df(spark, [], "bucket int, lo double, hi double, n long")
    if lo == hi:
        return local_df(
            spark, [(0, float(lo), float(hi), n)], "bucket int, lo double, hi double, n long"
        )
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(n_buckets - 1)
    ).cast("int")
    counts = (
        df.where(v.isNotNull() & ~F.isnan(v))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts.select(
        "bucket",
        (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("lo"),
        (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("hi"),
        "n",
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# DSIR: importance-weighted data selection toward a target distribution
# ---------------------------------------------------------------------------


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 2000,
    add_k: float = 0.5,
) -> DataFrame:
    """Per-document log importance weight toward a TARGET corpus — the
    DSIR recipe (Data Selection via Importance Resampling, Xie et al.
    2023, arXiv:2302.03169) instantiated with the engine's smoothed
    unigram LM (the same model/tokenization as
    :func:`~drivel_spark.ops.text.lm_quality_scores`, so the whole
    decision is ANSI-replayable):

        log w(doc) = Σ_tokens [ log p_target(t) − log p_raw(t) ]

    with both LMs add-``add_k``-smoothed over the RAW corpus's exact
    top-``top_k`` vocabulary ((n desc, token asc) tiebreak; OOV carries
    count 0 in both, contributing the constant log(denom_raw /
    denom_tgt) per token).  Documents that look like the target score
    high; raw-typical boilerplate scores ≈ n_tokens·log-ratio of the
    background.  Weights are length-coupled (a sum, not a mean) —
    exactly the paper's product-of-feature-probs form.

    Returns (id, n_tokens, log_weight); documents with zero tokens
    after normalization are absent (they have no features to weight).

    Scale shape: one explode per corpus → partial+final token counts
    (hot stop-tokens collapse map-side), TakeOrdered top-k vocab, ONE
    broadcast of the O(top_k) two-LM lookup into the raw token stream
    (which therefore never shuffles for the lookup), one groupBy(id)
    sum.  Nothing data-sized crosses the driver.
    """
    from .text import normalize_text, tokens

    t_raw = raw.select(
        F.col(id_col),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("token"),
    )
    t_tgt = target.select(
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("token")
    )
    c_raw = t_raw.groupBy("token").agg(F.count(F.lit(1)).alias("n_raw"))
    c_tgt = t_tgt.groupBy("token").agg(F.count(F.lit(1)).alias("n_tgt"))
    n_raw_total = c_raw.agg(F.sum("n_raw")).first()[0] or 0
    n_tgt_total = c_tgt.agg(F.sum("n_tgt")).first()[0] or 0
    if n_raw_total == 0 or n_tgt_total == 0:
        raise ValueError("raw/target corpus has no tokens")
    vocab = (
        c_raw.orderBy(F.desc("n_raw"), F.asc("token"))
        .limit(top_k)
        .join(c_tgt, "token", "left")
        .select(
            "token", "n_raw",
            F.coalesce("n_tgt", F.lit(0)).alias("n_tgt"),
        )
    )
    d_raw = float(n_raw_total) + add_k * (top_k + 1)
    d_tgt = float(n_tgt_total) + add_k * (top_k + 1)
    logratio = F.log(
        (F.coalesce(F.col("n_tgt"), F.lit(0)) + F.lit(add_k)) / F.lit(d_tgt)
    ) - F.log(
        (F.coalesce(F.col("n_raw"), F.lit(0)) + F.lit(add_k)) / F.lit(d_raw)
    )
    return (
        t_raw.join(F.broadcast(vocab), "token", "left")
        .groupBy(F.col(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(logratio).alias("log_weight"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 2000,
    add_k: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """DSIR selection: Gumbel-top-k resampling of ``n`` documents by
    importance weight — sampling WITHOUT replacement from the softmax
    of :func:`dsir_importance_weights` (the Gumbel-max trick: adding
    i.i.d. Gumbel noise to log-weights and taking the top n draws the
    weighted sample exactly), with the noise DETERMINISTIC per id so
    any engine replays the draw bit-for-bit:

        u(id) = (int(md5(id ':' seed)[:8 hex]) + 0.5) / 2^32   ∈ (0,1)
        key   = log_weight + (−log(−log u))

    (the +0.5 keeps u strictly inside (0,1): Spark's ln(0) is NULL
    while DuckDB's is −inf, so an exact-0 bucket would diverge between
    engines).  Returns the selected rows as (id, n_tokens, log_weight,
    gumbel_key) — TakeOrdered n by (key desc, id), no global sort.
    """
    if n <= 0:
        raise ValueError(f"n must be positive: {n}")
    w = dsir_importance_weights(raw, target, text_col, id_col, top_k, add_k)
    keyed = F.concat(
        F.col(id_col).cast("string"), F.lit(f":{seed}")
    )
    u = (
        (F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("double")
         + F.lit(0.5))
        / F.lit(4294967296.0)
    )
    key = F.col("log_weight") - F.log(-F.log(u))
    return (
        w.withColumn("gumbel_key", key)
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(n)
    )
