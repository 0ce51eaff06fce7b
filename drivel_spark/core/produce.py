"""Seeded synthetic-value generator interpreting a SchemaNode tree.

Structural re-expression of /root/reference/src/produce.rs:16-175 with a
deliberate improvement: the reference uses unseeded ``thread_rng``
everywhere (produce.rs:10-165) so its output is irreproducible; here
every generator takes a ``numpy.random.Generator`` so output is
deterministic per seed.  Parity is therefore *structural*: generated
values re-infer to a schema subsumed by the source profile, respect
bounds / enums / formats (SURVEY.md §2.7, §5).

This module is the driver-side scalar interpreter; the distributed
column-generator path lives in :mod:`drivel_spark.produce.generator`.
"""

from __future__ import annotations

import string as _string
from datetime import datetime, timedelta, timezone
from email.utils import format_datetime
from typing import Any, Optional

import numpy as np

from .node import (
    ARRAY,
    BOOLEAN,
    INDEFINITE,
    INITIAL,
    NUMBER,
    OBJECT,
    STRING,
    STR_DATETIME_ISO8601,
    STR_DATETIME_RFC2822,
    STR_ENUM,
    STR_EMAIL,
    STR_HOSTNAME,
    STR_ISO_DATE,
    STR_UNKNOWN,
    STR_URL,
    STR_UUID,
    SchemaNode,
)

# deterministic faker-style word pools (public dictionary words)
_WORDS = [
    "alpha", "bravo", "delta", "echo", "falcon", "gamma", "harbor", "indigo",
    "jasper", "karma", "lunar", "mango", "nebula", "ocean", "prism", "quartz",
    "raven", "sierra", "tango", "umbra", "vector", "willow", "xenon", "yonder",
    "zephyr", "amber", "basil", "cedar", "dune", "ember", "fjord", "grove",
]
_TLDS = ["com", "org", "net", "io", "dev"]
_ALNUM = _string.ascii_letters + _string.digits

# float-range guards (produce.rs:113-120)
_FLOAT_INF_CLAMP = 1e10
_FLOAT_RANGE_FALLBACK = 1e15


def _rand_len(rng: np.random.Generator, lo: Optional[int], hi: Optional[int],
              default_lo: int = 0, default_hi: int = 16) -> int:
    lo = default_lo if lo is None else lo
    hi = default_hi if hi is None else hi
    if hi < lo:
        hi = lo
    return int(rng.integers(lo, hi + 1))


def _rand_dt(rng: np.random.Generator) -> datetime:
    # uniform over 1970-01-01 .. 2038-01-01 UTC
    secs = int(rng.integers(0, 2**31))
    return datetime(1970, 1, 1, tzinfo=timezone.utc) + timedelta(seconds=secs)


def _gen_string(node: SchemaNode, rng: np.random.Generator) -> str:
    st = node.str_type
    if st == STR_UUID:
        b = rng.bytes(16)
        b = bytearray(b)
        b[6] = (b[6] & 0x0F) | 0x40  # version 4
        b[8] = (b[8] & 0x3F) | 0x80  # variant
        h = bytes(b).hex()
        return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"
    if st == STR_EMAIL:
        u = _WORDS[int(rng.integers(len(_WORDS)))]
        d = _WORDS[int(rng.integers(len(_WORDS)))]
        t = _TLDS[int(rng.integers(len(_TLDS)))]
        return f"{u}{int(rng.integers(100))}@{d}.{t}"
    if st == STR_HOSTNAME:
        d = _WORDS[int(rng.integers(len(_WORDS)))]
        t = _TLDS[int(rng.integers(len(_TLDS)))]
        return f"{d}.{t}"
    if st == STR_URL:
        d = _WORDS[int(rng.integers(len(_WORDS)))]
        t = _TLDS[int(rng.integers(len(_TLDS)))]
        p = _WORDS[int(rng.integers(len(_WORDS)))]
        return f"https://{d}.{t}/{p}"
    if st == STR_ISO_DATE:
        return _rand_dt(rng).date().isoformat()
    if st == STR_DATETIME_ISO8601:
        # 3-digit subsecond, matching the reference's rounding
        # (produce.rs:33-37)
        dt = _rand_dt(rng) + timedelta(milliseconds=int(rng.integers(1000)))
        return dt.isoformat(timespec="milliseconds").replace("+00:00", "Z")
    if st == STR_DATETIME_RFC2822:
        return format_datetime(_rand_dt(rng))
    if st == STR_ENUM:
        variants = sorted(node.variants)
        return variants[int(rng.integers(len(variants)))]
    # unknown: random length in observed bounds; chars drawn from the
    # observed char distribution when evidence exists (produce.rs:64-92)
    n = _rand_len(rng, node.min_len, node.max_len)
    if node.chars_seen:
        pool = node.chars_seen
        idx = rng.integers(0, len(pool), size=n)
        return "".join(pool[i] for i in idx)
    idx = rng.integers(0, len(_ALNUM), size=n)
    return "".join(_ALNUM[i] for i in idx)


def _gen_number(node: SchemaNode, rng: np.random.Generator):
    if not node.is_float:
        lo = node.min_n if node.min_n is not None else 0
        hi = node.max_n if node.max_n is not None else 1000
        if lo == hi:
            return int(lo)
        return int(rng.integers(int(lo), int(hi) + 1))
    lo = node.min_n if node.min_n is not None else 0.0
    hi = node.max_n if node.max_n is not None else 1000.0
    # guards from produce.rs:113-120: clamp infinities, huge ranges fall
    # back to 0..1000
    if lo == -np.inf:
        lo = -_FLOAT_INF_CLAMP
    if hi == np.inf:
        hi = _FLOAT_INF_CLAMP
    if hi - lo > _FLOAT_RANGE_FALLBACK:
        lo, hi = 0.0, 1000.0
    if lo == hi:
        return float(lo)
    return float(rng.uniform(lo, hi))


def produce_value(node: SchemaNode, rng: np.random.Generator) -> Any:
    """Generate one value conforming to ``node``."""
    if node.nullable and not node.is_null_only:
        if rng.random() < 0.5:  # 50% coin-flip (produce.rs:19-26)
            return None
    if node.is_null_only or node.kind in (INITIAL, INDEFINITE):
        return None
    if node.kind == BOOLEAN:
        return bool(rng.random() < 0.5)
    if node.kind == NUMBER:
        return _gen_number(node, rng)
    if node.kind == STRING:
        return _gen_string(node, rng)
    if node.kind == ARRAY:
        elem = node.elem
        # empty array when element schema is unknowable (produce.rs:136-140)
        if elem is None or elem.kind in (INITIAL, INDEFINITE):
            return []
        n = _rand_len(rng, node.min_items, node.max_items, 0, 4)
        return [produce_value(elem, rng) for _ in range(n)]
    if node.kind == OBJECT:
        out = {}
        for k in sorted(node.required):
            out[k] = produce_value(node.required[k], rng)
        for k in sorted(node.optional):
            if rng.random() < 0.5:  # optional 50% coin-flip (produce.rs:164-170)
                out[k] = produce_value(node.optional[k], rng)
        return out
    raise AssertionError(node.kind)


def produce_many(node: SchemaNode, n: int, seed: int = 42) -> list[Any]:
    """Generate ``n`` independent values, deterministic per seed."""
    rng = np.random.default_rng(seed)
    return [produce_value(node, rng) for _ in range(n)]
