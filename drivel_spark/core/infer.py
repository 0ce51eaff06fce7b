"""Inference fold + associative merge lattice.

Re-expression of the reference's heart (/root/reference/src/infer.rs:
16-255 ``merge``, 353-388 ``infer_schema``, 441-449
``infer_schema_from_iter``) with one deliberate, documented deviation:

**Associativity (SURVEY.md §2.2 I4).**  The reference treats
``Indefinite`` both as a merge identity (infer.rs:18-21) and as the
conflict result (infer.rs:253), which makes its parallel reduce
grouping-dependent.  Here ``INITIAL`` is the only identity and
``INDEFINITE`` is *absorbing* (except that nullability, an OR-flag,
still propagates), so ``merge`` is associative and commutative and any
partition/tree-reduce grouping yields the same profile.  Property tests
pin this (tests/test_core_infer.py).

Evidence rules preserved exactly from the reference:

* unknown ⊔ unknown: min/max of lengths, concatenated evidence
  (infer.rs:24-65);
* unknown ⊔ typed-format: unknown wins, typed side's evidence dropped
  (infer.rs:67-68; test infer.rs:821-840);
* typed ⊔ different-typed: unknown with EMPTY evidence (infer.rs:70-81);
* numeric widening int ⊔ float → float with unioned bounds
  (infer.rs:84-138);
* object merge: required = present-in-both, everything else optional
  (infer.rs:167-230);
* null lattice via the nullable OR-flag (infer.rs:233-250).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterable, Optional

from .detect import detect
from .node import (
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


@dataclass(frozen=True)
class EnumInference:
    """Enum post-pass gates (reference defaults: main.rs:50-51)."""

    max_unique_ratio: float = 0.1
    min_sample_size: int = 1


@dataclass(frozen=True)
class InferenceOptions:
    enum_inference: Optional[EnumInference] = None
    # bounded-evidence caps for the distributed profiler; None = unbounded
    # (exact parity mode used by the ported reference tests)
    max_strings_seen: Optional[int] = None
    max_chars_seen: Optional[int] = None


def _opt_min(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return min(a, b)


def _opt_max(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return max(a, b)


def _cap(lst: list, cap: Optional[int]) -> list:
    return lst if cap is None or len(lst) <= cap else lst[:cap]


def merge(a: SchemaNode, b: SchemaNode, opts: InferenceOptions = InferenceOptions()) -> SchemaNode:
    """Associative least-upper-bound of two schema nodes."""
    nullable = a.nullable or b.nullable

    # identity / absorbing elements
    if a.kind == INITIAL:
        return b.with_nullable(nullable)
    if b.kind == INITIAL:
        return a.with_nullable(nullable)
    if a.kind == INDEFINITE or b.kind == INDEFINITE:
        return SchemaNode(kind=INDEFINITE, nullable=nullable)

    if a.kind != b.kind:
        return SchemaNode(kind=INDEFINITE, nullable=nullable)

    if a.kind == BOOLEAN:
        return SchemaNode(kind=BOOLEAN, nullable=nullable)

    if a.kind == NUMBER:
        is_float = a.is_float or b.is_float
        return SchemaNode(
            kind=NUMBER,
            nullable=nullable,
            is_float=is_float,
            min_n=_opt_min(a.min_n, b.min_n),
            max_n=_opt_max(a.max_n, b.max_n),
        )

    if a.kind == STRING:
        return _merge_string(a, b, nullable, opts)

    if a.kind == ARRAY:
        elem_a = a.elem if a.elem is not None else SchemaNode.initial()
        elem_b = b.elem if b.elem is not None else SchemaNode.initial()
        return SchemaNode(
            kind=ARRAY,
            nullable=nullable,
            min_items=_opt_min(a.min_items, b.min_items),
            max_items=_opt_max(a.max_items, b.max_items),
            elem=merge(elem_a, elem_b, opts),
        )

    if a.kind == OBJECT:
        return _merge_object(a, b, nullable, opts)

    raise AssertionError(f"unreachable kind {a.kind}")


def _merge_string(
    a: SchemaNode, b: SchemaNode, nullable: bool, opts: InferenceOptions
) -> SchemaNode:
    ta, tb = a.str_type, b.str_type
    if ta == STR_UNKNOWN and tb == STR_UNKNOWN:
        node = SchemaNode.string(
            str_type=STR_UNKNOWN,
            strings_seen=_cap(a.strings_seen + b.strings_seen, opts.max_strings_seen),
            chars_seen=_cap(a.chars_seen + b.chars_seen, opts.max_chars_seen),
            min_len=_opt_min(a.min_len, b.min_len),
            max_len=_opt_max(a.max_len, b.max_len),
        )
        node.nullable = nullable
        return node
    # unknown absorbs any typed string; typed side's evidence is DROPPED
    # (infer.rs:67-68) — preserved for describe parity
    if ta == STR_UNKNOWN:
        return a.with_nullable(nullable)
    if tb == STR_UNKNOWN:
        return b.with_nullable(nullable)
    # equal typed strings keep the type (enum requires equal variant sets)
    if ta == tb and (ta != STR_ENUM or a.variants == b.variants):
        return a.with_nullable(nullable)
    # unequal typed strings → unknown with EMPTY evidence (infer.rs:70-81)
    node = SchemaNode.string(str_type=STR_UNKNOWN)
    node.nullable = nullable
    return node


def _merge_object(
    a: SchemaNode, b: SchemaNode, nullable: bool, opts: InferenceOptions
) -> SchemaNode:
    required: dict[str, SchemaNode] = {}
    optional: dict[str, SchemaNode] = {}
    keys = set(a.required) | set(a.optional) | set(b.required) | set(b.optional)
    for k in keys:
        in_a_req, in_b_req = k in a.required, k in b.required
        va = a.required.get(k, a.optional.get(k))
        vb = b.required.get(k, b.optional.get(k))
        if va is not None and vb is not None:
            merged = merge(va, vb, opts)
        else:
            merged = va if va is not None else vb
        # required iff required on BOTH sides (key-intersection,
        # infer.rs:177-193); a key merely optional on either side, or
        # absent from one object sample, demotes to optional
        if in_a_req and in_b_req:
            required[k] = merged
        else:
            optional[k] = merged
    return SchemaNode(kind=OBJECT, nullable=nullable, required=required, optional=optional)


def infer_value(value: Any, opts: InferenceOptions = InferenceOptions()) -> SchemaNode:
    """Schema+stats of ONE parsed-JSON value (infer.rs:353-388).

    The enum post-pass, when enabled, is applied here to mirror the
    reference's ``infer_schema`` (infer.rs:383-387); :func:`infer_many`
    applies it once after the global merge instead (sane-semantics
    deviation from the reference's per-line JSONL quirk, SURVEY.md §2.4
    E4).
    """
    node = _infer_inner(value, opts)
    if opts.enum_inference is not None:
        node = apply_enum(node, opts.enum_inference)
    return node


def _infer_inner(value: Any, opts: InferenceOptions) -> SchemaNode:
    if value is None:
        return SchemaNode.null()
    if isinstance(value, bool):  # bool before int: bool is an int subclass
        return SchemaNode.boolean()
    if isinstance(value, int):
        return SchemaNode.integer(value, value)
    if isinstance(value, float):
        return SchemaNode.floating(value, value)
    if isinstance(value, str):
        fmt = detect(value)
        if fmt == STR_UNKNOWN:
            return SchemaNode.string(
                str_type=STR_UNKNOWN,
                strings_seen=_cap([value], opts.max_strings_seen),
                chars_seen=_cap(list(value), opts.max_chars_seen),
                min_len=len(value),
                max_len=len(value),
            )
        return SchemaNode.string(str_type=fmt)
    if isinstance(value, (list, tuple)):
        elem = SchemaNode.initial()
        for v in value:
            elem = merge(elem, _infer_inner(v, opts), opts)
        return SchemaNode.array(len(value), len(value), elem)
    if isinstance(value, dict):
        # every key present on a single sample is required (infer.rs:374-380)
        return SchemaNode.object(
            required={str(k): _infer_inner(v, opts) for k, v in value.items()}
        )
    raise TypeError(f"not a JSON value: {type(value)!r}")


def infer_many(values: Iterable[Any], opts: InferenceOptions = InferenceOptions()) -> SchemaNode:
    """map(infer) + reduce(merge) with INITIAL identity (infer.rs:441-449).

    Enum inference (if enabled) runs ONCE after the global merge —
    deviation from the reference, which never applies it in iter mode
    (SURVEY.md §2.4 E4); pinned by tests.
    """
    acc = SchemaNode.initial()
    for v in values:
        acc = merge(acc, _infer_inner(v, opts), opts)
    if opts.enum_inference is not None:
        acc = apply_enum(acc, opts.enum_inference)
    return acc


def apply_enum(node: SchemaNode, gates: EnumInference) -> SchemaNode:
    """Recursive Unknown→Enum rewrite (infer.rs:257-307).

    ``unknown`` strings become enums iff enough samples were seen and
    the unique ratio is at or below the gate.
    """
    if node.kind == STRING and node.str_type == STR_UNKNOWN:
        seen = node.strings_seen
        if len(seen) >= gates.min_sample_size and seen:
            uniq = set(seen)
            if len(uniq) / len(seen) <= gates.max_unique_ratio:
                out = SchemaNode.enum(uniq)
                out.nullable = node.nullable
                return out
        return node
    if node.kind == ARRAY and node.elem is not None:
        out = node.copy()
        out.elem = apply_enum(node.elem, gates)
        return out
    if node.kind == OBJECT:
        out = node.copy()
        out.required = {k: apply_enum(v, gates) for k, v in node.required.items()}
        out.optional = {k: apply_enum(v, gates) for k, v in node.optional.items()}
        return out
    return node
