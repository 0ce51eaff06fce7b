"""Sequence packing: greedy first-fit-decreasing bin-packing of
documents into fixed token-budget training sequences — the step between
chunking/tokenization and batching in an LLM data pipeline (padding
waste at 10^12 docs is real money; FFD recovers most of it).

Scale design: a global optimal packing is not distributed-friendly, so
documents are hashed into ``n_buckets`` independent packing groups (one
shuffle on the bucket key) and each group runs first-fit-decreasing in
one Arrow batch — the standard practice.  Bin ids are globally unique
as (bucket, bin_idx).  Per-bucket memory is O(docs/bucket); size
``n_buckets`` so a bucket fits an executor (same discipline as any
groupBy).  Determinism: FFD sorts by (tokens desc, id), and the bucket
hash keys on the id — layout-independent, re-runs byte-identical.

FFD quality is verifiable without knowing OPT: within one bucket,
first-fit leaves AT MOST ONE bin at most half full (else the second
such bin's first item would have fit in the first) — the contract
query's oracle checks exactly this plus the capacity and
count-conservation invariants in SQL.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    tokenizer=None,
    text_col: str = "text",
) -> DataFrame:
    """Pack rows (documents with a precomputed ``tokens_col``) into
    bins of at most ``budget`` tokens.  Rows with ``tokens_col`` NULL,
    non-positive, or > budget are EXCLUDED (oversize docs belong to the
    chunking stage, ops/text.py chunk_documents).

    ``tokenizer`` (optional, VERDICT r04 #6): a ``list[str] ->
    list[int]`` batch callable (e.g. ops.text.bpe_token_counter) — when
    given, ``tokens_col`` is COMPUTED from ``text_col`` with one
    Arrow-vectorized pass (ops.text.with_token_counts) so budgets
    reflect the real training tokenizer instead of a precomputed proxy
    count.  Default None keeps the caller's ``tokens_col`` untouched.

    Returns one row per packed document: id, ``n_tokens``, ``bucket``,
    ``bin_idx`` (bin key = (bucket, bin_idx)).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive: {n_buckets}")
    if tokenizer is not None:
        from .text import with_token_counts

        df = with_token_counts(df, text_col=text_col, out_col=tokens_col,
                               tokenizer=tokenizer)

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, n_tokens long, bucket int, bin_idx int"
    )

    eligible = (
        df.select(
            F.col(id_col),
            F.col(tokens_col).cast("long").alias("n_tokens"),
        )
        .filter(
            F.col("n_tokens").isNotNull()
            & (F.col("n_tokens") > 0)
            & (F.col("n_tokens") <= budget)
        )
        .withColumn(
            "bucket",
            F.pmod(
                F.xxhash64(F.col(id_col).cast("string")), F.lit(n_buckets)
            ).cast("int"),
        )
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        remaining: list[int] = []  # capacity left per open bin
        assign = []
        for t in pdf["n_tokens"]:
            t = int(t)
            for b, cap in enumerate(remaining):
                if t <= cap:
                    remaining[b] = cap - t
                    assign.append(b)
                    break
            else:
                remaining.append(budget - t)
                assign.append(len(remaining) - 1)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "n_tokens": pdf["n_tokens"],
                "bucket": pdf["bucket"],
                "bin_idx": assign,
            }
        )

    return eligible.groupBy("bucket").applyInPandas(pack, out_schema)


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """One-row packing summary: document/bin counts, token totals, mean
    fill ratio, and the FFD sanity counters (max bin load must be
    <= budget; per-bucket count of at-most-half-full bins must be <= 1).
    Two small hash aggregations — O(bins) intermediate, scale-free."""
    bins = packed.groupBy("bucket", "bin_idx").agg(
        F.sum("n_tokens").alias("bin_tokens"),
        F.count(F.lit(1)).alias("bin_docs"),
    )
    half = bins.groupBy("bucket").agg(
        F.sum((F.col("bin_tokens") * 2 <= F.lit(budget)).cast("long")).alias(
            "n_half_empty"
        )
    )
    return (
        bins.agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("bin_docs").alias("n_docs"),
            F.sum("bin_tokens").alias("total_tokens"),
            F.max("bin_tokens").alias("max_bin_tokens"),
            F.round(F.avg(F.col("bin_tokens") / F.lit(float(budget))), 6).alias(
                "avg_fill"
            ),
        )
        .crossJoin(
            half.agg(F.max("n_half_empty").alias("max_half_empty_per_bucket"))
        )
    )
