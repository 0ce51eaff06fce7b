"""Completeness-structure and re-identification-risk reports.

Validation angle (the reference's infer-then-check loop widened to
row STRUCTURE, drivel infer.rs's per-field null tracking generalized):
per-column null ratios — which the profiler already folds — cannot
see which nulls co-occur.  "2% of transcripts are null and 2% of
bytes are null" is healthy if they are the same rows (a known-bad
ingest batch) and catastrophic if they are disjoint (4% of the corpus
unusable, two independent failures).  The null-PATTERN distribution
is the sufficient statistic for that question, and its support is
bounded by 2^k for k audited columns — a groupBy whose shuffle volume
never depends on row count.

The k-anonymity report answers the release-safety twin: how many rows
are re-identifiable through a quasi-identifier combination (speaker
metadata: codec × sr_hz × upload-day, or user_id × device)?  A group
of size 1 on the QI columns is a fingerprint; rows in groups smaller
than k are publishable risk.  One groupBy on the QI columns (map-side
combined) followed by an O(groups)→1 aggregate over the group-size
distribution — the same two-level shape as the skew reports, so it
holds at 10^12 rows whenever the QI space itself is bounded (which is
exactly when k-anonymity is the right question).

All arithmetic JVM-side; the only driver traffic is the O(patterns)-
or O(1)-row report.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "null_pattern_report",
    "k_anonymity_report",
    "k_anonymity_risky_groups",
]


def null_pattern_report(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Distribution of row-level null PATTERNS over ``columns``.

    One row per observed pattern: ``(pattern, null_cols, n_null_cols,
    n_rows, ratio)`` where ``pattern`` is a '0'/'1' bit string in the
    given column order ('1' = null), ``null_cols`` the comma-joined
    names of the null columns ('' for the all-present pattern), and
    ``ratio`` the pattern's share of all rows (round 6).

    Plan: the k null flags are codegen expressions; ONE map-side-
    combined groupBy on the pattern string (≤ 2^k groups — shuffle
    bounded by the pattern support, never rows); the total for
    ``ratio`` comes from an unpartitioned window over the ≤ 2^k
    result rows, not a second scan.
    """
    cols = list(columns)
    if not cols:
        raise ValueError("null_pattern_report needs at least one column")
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"null_pattern_report: unknown column {c!r}")
    flags = [F.col(c).isNull() for c in cols]
    pattern = F.concat(*[F.when(f, F.lit("1")).otherwise("0") for f in flags])
    null_cols = F.concat_ws(",", *[F.when(f, F.lit(c)) for f, c in zip(flags, cols)])
    n_null_cols = sum(f.cast("int") for f in flags)
    counted = (
        df.select(
            pattern.alias("pattern"),
            null_cols.alias("null_cols"),
            n_null_cols.alias("n_null_cols"),
        )
        # null_cols / n_null_cols are functions of pattern, so grouping
        # on all three keeps cardinality = |patterns|
        .groupBy("pattern", "null_cols", "n_null_cols")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    total = F.sum("n_rows").over(Window.partitionBy())
    return counted.withColumn(
        "ratio", F.round(F.col("n_rows") / total, 6)
    )


def _qi_group_sizes(
    df: DataFrame, qi_cols: Sequence[str], sensitive_col: Optional[str]
) -> DataFrame:
    cols = list(qi_cols)
    if not cols:
        raise ValueError("k-anonymity needs at least one quasi-identifier column")
    for c in cols + ([sensitive_col] if sensitive_col else []):
        if c not in df.columns:
            raise ValueError(f"k-anonymity: unknown column {c!r}")
    aggs = [F.count(F.lit(1)).alias("group_size")]
    if sensitive_col:
        aggs.append(F.countDistinct(F.col(sensitive_col)).alias("l_diversity"))
    # NULL is grouped as a value on purpose: a NULL QI combination is
    # still a (highly identifying) fingerprint, so it must count
    return df.groupBy(*cols).agg(*aggs)


def k_anonymity_report(
    df: DataFrame,
    qi_cols: Sequence[str],
    k: int = 5,
    sensitive_col: Optional[str] = None,
) -> DataFrame:
    """Re-identification-risk summary over the quasi-identifier
    columns ``qi_cols``: ONE row ``(k, n_rows, n_groups,
    min_group_size, max_group_size, singleton_groups, groups_below_k,
    rows_below_k, risk_ratio)`` — ``risk_ratio`` = share of rows
    living in QI groups smaller than ``k`` (round 6), the number a
    release gate thresholds on.  With ``sensitive_col`` the row also
    carries ``min_l_diversity`` and ``groups_l1`` (groups where every
    row shares ONE sensitive value — k-anonymous yet fully disclosed,
    the homogeneity attack l-diversity exists to catch).

    Plan: groupBy(QI) with map-side combine (shuffle = |QI support|),
    then one O(groups)→1 aggregate over the size distribution — the
    two-level discipline of the skew reports; no windows, no joins.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    sizes = _qi_group_sizes(df, qi_cols, sensitive_col)
    g = F.col("group_size")
    aggs = [
        F.coalesce(F.sum(g), F.lit(0)).alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min(g).alias("min_group_size"),
        F.max(g).alias("max_group_size"),
        F.coalesce(F.sum((g == 1).cast("long")), F.lit(0)).alias("singleton_groups"),
        F.coalesce(F.sum((g < k).cast("long")), F.lit(0)).alias("groups_below_k"),
        F.coalesce(F.sum(F.when(g < k, g)), F.lit(0)).alias("rows_below_k"),
    ]
    if sensitive_col:
        ld = F.col("l_diversity")
        aggs += [
            F.min(ld).alias("min_l_diversity"),
            F.coalesce(F.sum((ld == 1).cast("long")), F.lit(0)).alias("groups_l1"),
        ]
    return (
        sizes.agg(*aggs)
        .withColumn("k", F.lit(k))
        .withColumn(
            "risk_ratio",
            F.round(
                F.col("rows_below_k") / F.greatest(F.col("n_rows"), F.lit(1)), 6
            ),
        )
    )


def k_anonymity_risky_groups(
    df: DataFrame,
    qi_cols: Sequence[str],
    k: int = 5,
    limit: int = 100,
) -> DataFrame:
    """The actual risky QI combinations: groups with fewer than ``k``
    rows, smallest (most identifying) first, QI-lexicographic
    tie-break, capped at ``limit`` — columns ``(*qi_cols,
    group_size)``.  The triage view behind
    :func:`k_anonymity_report`'s numbers.

    Plan: the same bounded groupBy, then filter + orderBy + limit —
    Spark plans TakeOrdered(limit), so only ``limit`` rows per
    partition survive the final exchange; no full sort.
    """
    sizes = _qi_group_sizes(df, qi_cols, None)
    return (
        sizes.filter(F.col("group_size") < k)
        .orderBy(F.col("group_size").asc(), *[F.col(c).asc() for c in qi_cols])
        .limit(limit)
    )
