"""Skew-handling operators: salted repartitioning + two-level
aggregation (BASELINE.json north_star: "Skew in codec and sr_hz hot
keys is handled with salted repartitioning and AQE skew-join hints").

Why salting, when Spark already does partial (map-side) aggregation:
partial agg collapses simple counters per partition, so a plain
``groupBy(hot_key).count()`` survives skew.  What does NOT survive is
any aggregation whose per-key state grows with the data — exact
distinct counts, collect_set/freq maps, percentile buffers — because
every record of the hot key still converges on ONE reducer.  With a
70%-hot ``codec`` key at 10^12 rows, that reducer gets ~7·10^11
records.  The fix is the classic two-level plan:

  stage 1: groupBy(key, salt)   — salt = pmod(xxhash64(row-unique), B)
           spreads the hot key over B reducers, each aggregating a
           1/B slice to a small mergeable state;
  stage 2: groupBy(key)         — merges B partial states per key.

Both stages are plain Catalyst hash aggregations (partial+final each),
so the whole plan stays JVM-side and AQE can still coalesce/split.

``salted_distinct_count`` needs no stage-1 state at all: the
(key, value) de-dup IS stage 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 64


def with_salt(df: DataFrame, unique_col: str | Column, buckets: int = DEFAULT_SALT_BUCKETS,
              salt_col: str = "__salt") -> DataFrame:
    """Add a deterministic salt column derived from a row-unique column
    (NOT a random one — determinism keeps retries/resume idempotent)."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return df.withColumn(salt_col, F.pmod(F.xxhash64(c), F.lit(buckets)).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    salt_source: str | Column,
    partial_aggs: list[Column],
    final_aggs: list[Column],
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Generic two-level salted aggregation.

    ``partial_aggs`` aggregate within (keys, salt); ``final_aggs``
    merge the per-salt partials within keys.  Column names must line
    up (stage-2 expressions reference stage-1 aliases).

    Example — sum/count over a hot key::

        salted_agg(df, ["codec"], "clip_id",
                   [F.count(F.lit(1)).alias("n"), F.sum("dur_ms").alias("s")],
                   [F.sum("n").alias("n"), F.sum("s").alias("s")])
    """
    salted = with_salt(df, salt_source, buckets)
    stage1 = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return stage1.groupBy(*keys).agg(*final_aggs)


def salted_distinct_count(
    df: DataFrame,
    key: str,
    value: str,
    buckets: int = DEFAULT_SALT_BUCKETS,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per (possibly hot) key without
    funnelling the hot key through one reducer.

    Stage 1 groups by (key, value) — the salt is implicit because the
    value itself spreads the hot key across reducers; a residual hot
    (key, value) PAIR (one value dominating inside one key) is further
    spread by an explicit salt, counted once via max(1).  Stage 2
    counts surviving distinct values per key.
    """
    pairs = (
        with_salt(df.select(key, value), value, buckets)
        .groupBy(key, value, "__salt")
        .agg(F.lit(1).alias("__one"))
        .groupBy(key, value)
        .agg(F.max("__one").alias("__one"))
    )
    return pairs.groupBy(key).agg(F.count(F.lit(1)).alias(out_col))


def salted_freq_map(
    df: DataFrame,
    key: str,
    value: str,
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Per-key value frequency map (key, value, cnt) via two-level
    counting — the skew-safe form of the profiler's codec/sr_hz
    frequency maps when computed relationally at full scale."""
    stage1 = (
        with_salt(df.select(key, value), value, buckets)
        .groupBy(key, value, "__salt")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return stage1.groupBy(key, value).agg(F.sum("__c").cast("long").alias("cnt"))
