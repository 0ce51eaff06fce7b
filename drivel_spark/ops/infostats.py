"""Information-theoretic column statistics: entropy and mutual
information.

The validation angle (same spirit as the reference's infer-then-check
loop, drivel's infer.rs stats fold generalized): every row of a
collapsed or decoupled column can be individually VALID — codec still
in the enum, sr_hz still in range — while the distribution is
catastrophically wrong (an ingest bug pinning every row to one codec,
or a join bug shuffling codec against sr_hz so their association
disappears).  Enum/range/null checks cannot see either failure;
entropy and mutual information are the canonical detectors:

- entropy collapse  → a category column lost diversity (H → 0) or an
  id-ish column exploded into a category (H → log2 n).
- mutual-information collapse → two columns that co-move in healthy
  data (codec↔container, codec↔sr_hz) became independent (MI → 0),
  the signature of a row-misaligned join or a column-wise backfill.

Scale design: both statistics reduce to ONE map-side-combined groupBy
over the value (pair) space — shuffle volume is bounded by the
distinct-value (pair) cardinality, never the row count, so the same
plan holds at 10^12 rows provided the columns are category-like
(bounded distinct), which is exactly when these statistics are
meaningful.  All arithmetic is JVM-side (whole-stage codegen); the
only driver traffic is the final O(columns)- or O(1)-row report.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..io import local_df

__all__ = ["column_entropy", "mutual_information", "correlation_matrix", "benford_report"]


def _plog2p(cnt: Column, total: Column) -> Column:
    """-p·log2(p) term, zero-safe (cnt > 0 always holds here)."""
    p = cnt.cast("double") / total.cast("double")
    return -p * F.log2(p)


def column_entropy(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Shannon entropy (bits) of each column's non-null value
    distribution, in ONE scan for any number of columns.

    Returns one row per column: ``(column, n_nonnull, n_distinct,
    entropy_bits, normalized_entropy)`` where ``normalized_entropy``
    is H / log2(n_distinct) in [0, 1] (defined as 0.0 for a
    single-valued column — log2(1) = 0 would divide by zero; a
    constant column has zero disorder by any convention).  Columns
    with no non-null values emit n_nonnull = 0 and NULL entropies —
    the caller decides whether empty is a failure (EntropyBound does).

    Plan: the columns are melted with ``stack`` (values cast to
    string so one schema carries any input type) → one
    partial+final groupBy on (column, value) → per-column totals via
    a window PARTITIONED BY column over the O(distinct) count rows —
    no second scan, no driver loop.  Shuffle volume =
    Σ distinct(col), independent of row count.
    """
    cols = list(columns)
    if not cols:
        raise ValueError("column_entropy needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"column_entropy: unknown column(s) {missing}")
    stack_expr = "stack({}, {}) as (column, value)".format(
        len(cols),
        ", ".join(f"'{c}', cast(`{c}` as string)" for c in cols),
    )
    counts = (
        df.selectExpr(stack_expr)
        .filter(F.col("value").isNotNull())
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("column")
    per_value = counts.withColumn("total", F.sum("cnt").over(w)).withColumn(
        "h_term", _plog2p(F.col("cnt"), F.col("total"))
    )
    observed = per_value.groupBy("column").agg(
        F.sum("cnt").alias("n_nonnull"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("h_term").alias("entropy_bits"),
    )
    # all-null / empty columns produce no count rows; reinstate them so
    # the report's row set is exactly the requested columns
    spine = local_df(
        df.sparkSession, [(c,) for c in cols], "column string"
    )
    return (
        spine.join(F.broadcast(observed), "column", "left")
        .select(
            "column",
            F.coalesce("n_nonnull", F.lit(0)).alias("n_nonnull"),
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
            F.col("entropy_bits"),
            F.when(F.col("n_distinct") <= 1, F.lit(0.0))
            .otherwise(F.col("entropy_bits") / F.log2(F.col("n_distinct")))
            .alias("normalized_entropy"),
        )
        .orderBy("column")
    )


def mutual_information(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Mutual information I(X;Y) in bits between two category-like
    columns, plus the normalized variant NMI = I / min(H(X), H(Y))
    in [0, 1] (0.0 when either marginal entropy is 0 — a constant
    column shares no information by convention).

    Returns ONE row: ``(col_x, col_y, n, n_pairs, mi_bits, nmi)``.
    Rows where either side is NULL are excluded (MI is defined over
    the joint distribution of observed pairs); ``n`` is the pair
    count that entered, ``n_pairs`` the distinct (x, y) support size.

    Plan: one partial+final groupBy on (x, y) → the O(pairs) joint
    table; marginal totals via two windows over that table (PARTITION
    BY x / BY y) and the grand total via a sum window — three window
    passes over O(pairs) rows, zero extra scans of the data, zero
    driver traffic until the 1-row result.  I(X;Y) =
    Σ p(x,y)·log2(p(x,y)/(p(x)p(y))); H via the marginal terms of the
    same table.
    """
    for c in (col_x, col_y):
        if c not in df.columns:
            raise ValueError(f"mutual_information: unknown column {c!r}")
    joint = (
        df.select(
            F.col(col_x).cast("string").alias("x"),
            F.col(col_y).cast("string").alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cxy"))
    )
    wx, wy = Window.partitionBy("x"), Window.partitionBy("y")
    wall = Window.partitionBy()
    t = (
        joint.withColumn("cx", F.sum("cxy").over(wx))
        .withColumn("cy", F.sum("cxy").over(wy))
        .withColumn("n", F.sum("cxy").over(wall))
    )
    nd, cxy = F.col("n").cast("double"), F.col("cxy").cast("double")
    mi_term = (cxy / nd) * F.log2(cxy * nd / (F.col("cx") * F.col("cy")))
    # marginal-entropy terms: each (x,y) row carries cxy/cx of x's mass,
    # so summing -(cxy/n)·log2(cx/n) over the joint table IS H(X)
    hx_term = -(cxy / nd) * F.log2(F.col("cx") / nd)
    hy_term = -(cxy / nd) * F.log2(F.col("cy") / nd)
    agg = t.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(mi_term).alias("mi_bits"),
        F.sum(hx_term).alias("hx"),
        F.sum(hy_term).alias("hy"),
    )
    return agg.select(
        F.lit(col_x).alias("col_x"),
        F.lit(col_y).alias("col_y"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.col("n_pairs"),
        # clamp the tiny negative float residue a zero-MI sum can leave
        F.greatest(F.col("mi_bits"), F.lit(0.0)).alias("mi_bits"),
        F.when(
            (F.col("hx") <= 0) | (F.col("hy") <= 0), F.lit(0.0)
        )
        .otherwise(
            F.greatest(F.col("mi_bits"), F.lit(0.0))
            / F.least(F.col("hx"), F.col("hy"))
        )
        .alias("nmi"),
    )


def _pearson(a: str, b: str) -> Column:
    """Pearson r as try_divide(covar_samp, sx·sy): identical algebra to
    F.corr but NULL — not an ANSI DIVIDE_BY_ZERO error — on a
    zero-variance column (Spark 4 ANSI mode makes bare corr() throw
    there; a constant column must read as "undefined", not crash the
    whole report).  Pairwise-complete: restrict every moment to rows
    where BOTH sides are non-null, matching corr()/DuckDB semantics —
    covar_samp alone skips null pairs but stddev_samp would not."""
    both = F.col(a).isNotNull() & F.col(b).isNotNull()
    xa = F.when(both, F.col(a))
    xb = F.when(both, F.col(b))
    return F.try_divide(
        F.covar_samp(xa, xb), F.stddev_samp(xa) * F.stddev_samp(xb)
    )


def correlation_matrix(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlation of numeric columns, ALL pairs in
    ONE scan (a single aggregate projection of F.corr terms — Catalyst
    computes every co-moment map-side-partially in the same pass; no
    per-pair jobs, no driver loop over the data).

    Returns one row per unordered pair: ``(col_x, col_y, corr)`` with
    col_x < col_y lexically.  NULL-containing pairs are excluded per
    pair (standard pairwise-complete semantics); a constant column
    yields NULL corr (undefined), which CorrelationBound treats as a
    loud failure.

    The validation angle: two columns that co-move in healthy data
    (duration↔byte-size, price↔quantity) suddenly decorrelating is the
    numeric twin of the mutual-information gate — a row-misaligned
    join or a unit change (ms→s) shows up here while every row stays
    in range."""
    cols = list(columns)
    if len(cols) < 2:
        raise ValueError("correlation_matrix needs >=2 columns")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"correlation_matrix: unknown column(s) {missing}")
    pairs = [
        (a, b) for i, a in enumerate(cols) for b in cols[i + 1:]
    ]

    agg = df.agg(
        *[_pearson(a, b).alias(f"__c_{i}") for i, (a, b) in enumerate(pairs)]
    )
    stacked = agg.selectExpr(
        "stack({}, {}) as (col_x, col_y, corr)".format(
            len(pairs),
            ", ".join(
                f"'{a}', '{b}', __c_{i}" for i, (a, b) in enumerate(pairs)
            ),
        )
    )
    return stacked.orderBy("col_x", "col_y")


BENFORD_P = [0.0] + [
    # log10(1 + 1/d), d = 1..9 — Benford's law first-digit mass
    0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
]


def benford_report(df: DataFrame, column: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic screen for fabricated, truncated, or unit-mangled numeric
    data (naturally-occurring multi-order-of-magnitude quantities
    follow P(d) = log10(1 + 1/d); synthetic or clipped data doesn't).

    Returns 9 rows: ``(digit, n, observed_p, expected_p,
    chi2_contrib)`` — the chi-square contribution per digit, so
    ``sum(chi2_contrib)`` is the test statistic against the Benford
    null.  Zero and NULL values are excluded (they have no first
    significant digit); negatives contribute their magnitude.

    One scan: the first digit is a pure codegen expression
    (floor(|x| / 10^floor(log10 |x|))), then a 9-bucket partial+final
    groupBy — shuffle volume is 9 rows per task regardless of table
    size.  Digits absent from the data still emit a row (n = 0) via
    the digit spine, so the chi2 sum is always over all 9 terms."""
    if column not in df.columns:
        raise ValueError(f"benford_report: unknown column {column!r}")
    x = F.abs(F.col(column).cast("double"))
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("int")
    counts = (
        df.filter(F.col(column).isNotNull() & (x > 0))
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = df.sparkSession
    spine = local_df(
        spark, [(d, BENFORD_P[d]) for d in range(1, 10)], "digit int, expected_p double"
    )
    w = Window.partitionBy()
    joined = (
        spine.join(F.broadcast(counts), "digit", "left")
        .withColumn("n", F.coalesce("n", F.lit(0)))
        .withColumn("total", F.sum("n").over(w))
    )
    obs = F.col("n") / F.col("total")
    exp_n = F.col("expected_p") * F.col("total")
    return joined.select(
        "digit",
        "n",
        F.round(obs, 6).alias("observed_p"),
        F.round("expected_p", 6).alias("expected_p"),
        F.round(
            F.pow(F.col("n") - exp_n, 2) / exp_n, 6
        ).alias("chi2_contrib"),
    ).orderBy("digit")
