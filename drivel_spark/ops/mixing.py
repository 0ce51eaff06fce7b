"""Data-mixture composition: sample a multi-source corpus down to
target mixture proportions under a row or token budget.

The training-data "data mixing" stage: given per-source target shares
(e.g. 50% English, 20% code, ...) and a total budget, derive a
per-source keep rate and apply it as a DETERMINISTIC hash filter
(splits.py split_bucket: md5-based, nested, zero-shuffle, identical in
any ANSI engine).  The reference has no mixing stage; this is part of
the beyond-reference scale surface mandated by the build brief.

Scale shape at 10^12 rows:
  1. one partial+final groupBy on the source column → per-source
     availability (rows or token sums); O(sources) rows to the driver;
  2. rate derivation is pure driver arithmetic on that tiny table;
  3. the sample itself is a per-row codegen filter (no RNG state, no
     shuffle, no join) — the same expression at any cluster size, so
     reruns and resumes keep the exact same rows;
  4. the achieved-mixture report is one more partial+final agg over
     the filtered scan.

Nested like stratified_sample: raising the budget strictly grows every
source's kept set, which keeps ablation ladders comparable.
"""

from __future__ import annotations

from typing import Mapping, NamedTuple, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import local_df

from .splits import split_bucket

__all__ = ["MixturePlan", "mixture_plan", "mix_corpora", "mixture_report"]


class MixturePlan(NamedTuple):
    """Per-source sampling decisions, derived before any row is read
    twice: ``available`` is rows (or token sum) per source, ``rate``
    the deterministic keep probability ``min(1, budget·share /
    available)``."""

    budget: float
    shares: dict[str, float]  # normalized target share per source
    available: dict[str, float]
    rates: dict[str, float]


def mixture_plan(
    df: DataFrame,
    source_col: str,
    weights: Mapping[str, float],
    budget: Optional[float] = None,
    size_col: Optional[str] = None,
) -> MixturePlan:
    """Derive per-source keep rates for the target mixture.

    ``weights`` are relative target proportions (normalized here, in
    iteration order — the same order the oracle replays).  ``budget``
    is the total kept rows (or kept ``size_col`` units); when omitted,
    the plan uses the LARGEST budget at which every source can still
    meet its share without upsampling: ``min_s available_s / share_s``.
    Sources absent from ``weights`` get rate 0 (dropped).
    """
    if not weights:
        raise ValueError("weights must be a non-empty mapping")
    vals = list(weights.values())
    if any(w < 0 for w in vals) or sum(vals) <= 0:
        raise ValueError(f"weights must be non-negative with a positive sum: {weights}")
    wsum = float(sum(vals))
    shares = {s: float(w) / wsum for s, w in weights.items()}

    measure = (
        F.count(F.lit(1)) if size_col is None else F.sum(F.col(size_col))
    ).cast("double")
    avail_rows = (
        df.where(F.col(source_col).isin(list(weights)))
        .groupBy(source_col)
        .agg(measure.alias("available"))
        .collect()
    )
    available = {r[source_col]: float(r["available"]) for r in avail_rows}
    for s in shares:
        available.setdefault(s, 0.0)

    if budget is None:
        feasible = [
            available[s] / shares[s] for s in shares if shares[s] > 0 and available[s] > 0
        ]
        if not feasible:
            raise ValueError("no source has both a positive share and rows")
        budget = min(feasible)
    budget = float(budget)

    rates = {
        s: (min(1.0, (budget * shares[s]) / available[s]) if available[s] > 0 else 0.0)
        for s in shares
    }
    return MixturePlan(budget=budget, shares=shares, available=available, rates=rates)


def mix_corpora(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: Mapping[str, float],
    budget: Optional[float] = None,
    size_col: Optional[str] = None,
    seed: int = 42,
    plan: Optional[MixturePlan] = None,
) -> DataFrame:
    """Apply a mixture plan as a deterministic zero-shuffle filter: a
    row of source s survives iff ``split_bucket(id, seed) < rate_s``.
    Pass a precomputed ``plan`` to skip the availability scan (e.g.
    when the report and the sample share one plan)."""
    if plan is None:
        plan = mixture_plan(df, source_col, weights, budget=budget, size_col=size_col)
    bucket = split_bucket(F.col(id_col), seed)
    rate = None
    for s, r in plan.rates.items():
        cond = F.col(source_col) == F.lit(s)
        rate = F.when(cond, float(r)) if rate is None else rate.when(cond, float(r))
    rate = rate.otherwise(F.lit(0.0))
    return df.where(bucket < rate)


def mixture_report(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: Mapping[str, float],
    budget: Optional[float] = None,
    size_col: Optional[str] = None,
    seed: int = 42,
) -> DataFrame:
    """Plan + sample + achieved-mixture accounting in one call: a
    per-source DataFrame (source, available, target_share, rate, kept,
    achieved_share).  ``kept``/``achieved_share`` come from one
    partial+final agg over the sampled scan; the totals rejoin through
    a broadcast one-row crossJoin, so nothing wide ever shuffles."""
    plan = mixture_plan(df, source_col, weights, budget=budget, size_col=size_col)
    sampled = mix_corpora(
        df, source_col, id_col, weights, seed=seed, plan=plan
    )
    measure = (
        F.count(F.lit(1)) if size_col is None else F.sum(F.col(size_col))
    ).cast("double")
    kept = sampled.groupBy(F.col(source_col).alias("source")).agg(
        measure.alias("kept")
    )
    spark = df.sparkSession
    plan_df = local_df(
        spark,
        [
            (s, plan.available[s], plan.shares[s], plan.rates[s])
            for s in plan.shares
        ],
        "source string, available double, target_share double, rate double",
    )
    tot = kept.agg(F.sum("kept").alias("tot_kept"))
    return (
        plan_df.join(kept, "source", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "available",
            "target_share",
            "rate",
            F.coalesce(F.col("kept"), F.lit(0.0)).alias("kept"),
            (F.coalesce(F.col("kept"), F.lit(0.0)) / F.col("tot_kept")).alias(
                "achieved_share"
            ),
        )
    )
