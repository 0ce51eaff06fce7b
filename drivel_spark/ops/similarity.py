"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — brute-force scan: cosine per row as a pure
  Catalyst expression, global top-k via orderBy+limit (Spark plans this
  as per-partition TakeOrdered + driver merge — no full sort/shuffle).
  The exact baseline, linear in table size; fine at 10^12 only with
  heavy pruning, hence:
* :func:`build_lsh_index` / :func:`ann_topk` — random-hyperplane LSH
  (IVF-style bucketing): sign-bit bucket key per row; a query probes
  its own bucket plus Hamming-≤probes neighbors and reranks exactly.
  Sub-linear candidate sets, tunable recall.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import cosine_expr


def _vec_lit(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine to the literal query vector."""
    q = _vec_lit(query_vec)
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_expr(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).normal(size=(n_planes, dim))


def _bucket_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """Integer bucket id from the sign bits of plane projections."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(vec_col, _vec_lit(p), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for p in planes
    ]
    out = F.lit(0)
    for b in bits:
        out = out * 2 + b
    return out


def build_lsh_index(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """Attach the LSH bucket column; at scale, persist/bucket-by this key
    so queries prune to matching buckets (partition pruning analog)."""
    planes = hyperplanes(dim, n_planes, seed)
    return df.withColumn("lsh_bucket", _bucket_expr(F.col(vec_col), planes)), planes


def _probe_buckets(qbits: list[int], probes: int) -> list[int]:
    """Query bucket + all buckets within Hamming distance ≤ probes."""
    n = len(qbits)

    def to_int(bits):
        v = 0
        for b in bits:
            v = v * 2 + b
        return v

    out = {to_int(qbits)}
    for d in range(1, probes + 1):
        for flip in combinations(range(n), d):
            bits = list(qbits)
            for i in flip:
                bits[i] ^= 1
            out.add(to_int(bits))
    return sorted(out)


def ann_topk(
    indexed: DataFrame,
    planes: np.ndarray,
    query_vec,
    k: int = 10,
    probes: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: filter to the query's probe buckets (filter on
    the precomputed bucket column → prunes at the scan when the table
    is partitioned/bucketed by it), exact cosine rerank inside."""
    q = np.asarray(query_vec, dtype=np.float64)
    qbits = [1 if float(p @ q) >= 0 else 0 for p in planes]
    buckets = _probe_buckets(qbits, probes)
    return (
        indexed.filter(F.col("lsh_bucket").isin(buckets))
        .select(
            F.col(id_col),
            F.round(cosine_expr(F.col(vec_col), _vec_lit(q)), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )
