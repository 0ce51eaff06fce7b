"""Distributed synthetic-data production: ``spark.range(n)`` + seeded
per-row generators (the Spark mapping of the reference's ``produce``,
SURVEY.md §2.7 G1-G11: parallelism = partitions instead of rayon).

Flat object schemas (one column per field) generate fully vectorized:
every column is a numpy function of the row id via stable hashing —
embarrassingly parallel, deterministic regardless of partitioning.
Nested fields (arrays/objects below the first level) fall back to the
scalar interpreter (:mod:`drivel_spark.core.produce`) with a per-row
seeded Generator inside the Arrow batch.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..core.node import (
    ARRAY,
    BOOLEAN,
    INDEFINITE,
    INITIAL,
    NUMBER,
    OBJECT,
    STRING,
    STR_ENUM,
    STR_UNKNOWN,
    SchemaNode,
)
from ..core.produce import _FLOAT_INF_CLAMP, _FLOAT_RANGE_FALLBACK, produce_value
from ..sketches.hashing import hash64


def _u(ids: np.ndarray, salt: int) -> np.ndarray:
    return hash64(ids, salt=salt).astype(np.float64) / 2.0**64


def _gen_column(node: SchemaNode, ids: np.ndarray, salt: int, seed: int) -> pd.Series:
    """Vectorized generator for one scalar-typed field; nested/format
    fields use the scalar interpreter per row (seeded by id)."""
    n = len(ids)
    if node.is_null_only or node.kind in (INITIAL, INDEFINITE):
        return pd.Series([None] * n, dtype=object)

    null_mask = None
    if node.nullable:
        null_mask = _u(ids, salt * 31 + 1) < 0.5  # reference 50% coin-flip

    if node.kind == BOOLEAN:
        out = pd.Series(_u(ids, salt * 31 + 2) < 0.5)
    elif node.kind == NUMBER and not node.is_float:
        lo = int(node.min_n) if node.min_n is not None else 0
        hi = int(node.max_n) if node.max_n is not None else 1000
        out = pd.Series((lo + np.floor(_u(ids, salt * 31 + 3) * (hi - lo + 1))).astype(np.int64))
    elif node.kind == NUMBER:
        lo = float(node.min_n) if node.min_n is not None else 0.0
        hi = float(node.max_n) if node.max_n is not None else 1000.0
        lo = max(lo, -_FLOAT_INF_CLAMP)
        hi = min(hi, _FLOAT_INF_CLAMP)
        if hi - lo > _FLOAT_RANGE_FALLBACK:
            lo, hi = 0.0, 1000.0
        out = pd.Series(lo + _u(ids, salt * 31 + 4) * (hi - lo))
    elif node.kind == STRING and node.str_type == STR_ENUM:
        variants = np.array(sorted(node.variants), dtype=object)
        idx = (hash64(ids, salt=salt * 31 + 5) % len(variants)).astype(np.int64)
        out = pd.Series(variants[idx])
    elif node.kind == STRING and node.str_type == "uuid":
        h1 = hash64(ids, salt=salt * 31 + 6)
        h2 = hash64(ids, salt=salt * 31 + 7)
        vals = np.empty(n, dtype=object)
        for k in range(n):
            a, b = f"{int(h1[k]):016x}", f"{int(h2[k]):016x}"
            vals[k] = f"{a[:8]}-{a[8:12]}-4{a[13:16]}-a{b[1:4]}-{b[4:16]}"
        out = pd.Series(vals)
    else:
        # formats / unknown strings / nested: scalar interpreter, seeded
        # per row id so output is partition-invariant
        bare = node.with_nullable(False)
        vals = np.empty(n, dtype=object)
        for k in range(n):
            rng = np.random.default_rng((seed << 20) ^ (int(ids[k]) * 2654435761 % 2**63) ^ salt)
            vals[k] = produce_value(bare, rng)
        out = pd.Series(vals)

    if null_mask is not None:
        out = out.astype(object)
        out[null_mask] = None
    return out


_SPARK_TYPE = {
    BOOLEAN: "boolean",
    NUMBER: "double",  # overridden to long for ints below
}


def _field_spark_type(node: SchemaNode) -> str:
    if node.kind == BOOLEAN:
        return "boolean"
    if node.kind == NUMBER:
        return "double" if node.is_float else "long"
    if node.kind == STRING:
        return "string"
    if node.kind == ARRAY or node.kind == OBJECT:
        return "string"  # nested values serialized as JSON text
    return "string"


def produce_df(
    spark: SparkSession,
    node: SchemaNode,
    n: int,
    seed: int = 42,
    n_partitions: Optional[int] = None,
) -> DataFrame:
    """Generate ``n`` rows conforming to an OBJECT-kind schema node.

    Columns = the node's required+optional fields (optional fields get
    the reference's 50% presence coin-flip realized as null).  Nested
    array/object fields are emitted as JSON strings.
    """
    if node.kind != OBJECT:
        raise ValueError("produce_df needs an object schema; wrap scalars in a field")
    if n_partitions is None:
        n_partitions = max(spark.sparkContext.defaultParallelism, 1)

    fields = dict(sorted({**node.required, **node.optional}.items()))
    optional = set(node.optional)
    schema = ", ".join(f"`{name}` {_field_spark_type(f)}" for name, f in fields.items())

    def gen(batches):
        import json as _json

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = {}
            for salt_i, (name, fnode) in enumerate(fields.items()):
                eff = fnode.with_nullable(fnode.nullable or name in optional)
                col = _gen_column(eff, ids, salt_i + 1, seed)
                if fnode.kind in (ARRAY, OBJECT):
                    col = col.map(lambda v: None if v is None else _json.dumps(v))
                out[name] = col
            yield pd.DataFrame(out)

    return spark.range(0, n, numPartitions=n_partitions).mapInPandas(gen, schema)


def produce_from_profile(
    spark: SparkSession, profile, n: int, seed: int = 42,
    n_partitions: Optional[int] = None,
) -> DataFrame:
    """Generate rows matching a TableProfile (its schema tree)."""
    return produce_df(spark, profile.to_schema_node(), n, seed, n_partitions)
