"""JSON Schema → SchemaNode parser (the fixed-schema front-end).

Re-implements the semantics of /root/reference/src/parse_schema.rs
(dispatch 31-70, nullable patterns 91-180, string 182-251, enum 262-280,
number 282-345, object 375-439, array 441-469) with one documented
deviation: ``exclusiveMinimum``/``exclusiveMaximum`` are honored with
proper strict semantics (integers shifted by 1, floats nudged by one
ulp) instead of the reference's treat-as-inclusive-with-warning
(parse_schema.rs:311-345); specifying both the inclusive and exclusive
form of the same bound is an error, as in the reference.
"""

from __future__ import annotations

import math
import warnings
from typing import Any

from .node import (
    STR_DATETIME_ISO8601,
    STR_EMAIL,
    STR_HOSTNAME,
    STR_ISO_DATE,
    STR_URL,
    STR_UUID,
    SchemaNode,
)

I64_MIN = -(2**63)
I64_MAX = 2**63 - 1

# JSON Schema array bounds defaults (parse_schema.rs:462-469)
DEFAULT_MIN_ITEMS = 0
DEFAULT_MAX_ITEMS = 16

_FORMAT_MAP = {
    "email": STR_EMAIL,
    "uuid": STR_UUID,
    "date": STR_ISO_DATE,
    "date-time": STR_DATETIME_ISO8601,
    "uri": STR_URL,
    "hostname": STR_HOSTNAME,
}


class SchemaError(ValueError):
    """Base for schema-parse failures (parse_schema.rs:10-29)."""


class InvalidSchema(SchemaError):
    pass


class UnsupportedFeature(SchemaError):
    pass


class SchemaWarning(UserWarning):
    """Lossy-parse warnings (unknown format, additionalProperties, ...)."""


def _warn(msg: str) -> None:
    warnings.warn(msg, SchemaWarning, stacklevel=3)


def parse_json_schema(doc: Any) -> SchemaNode:
    """Parse a JSON Schema document into a SchemaNode."""
    if not isinstance(doc, dict):
        raise InvalidSchema("JSON Schema document must be an object")

    # anyOf / oneOf two-arm nullable pattern (parse_schema.rs:138-180)
    for key in ("anyOf", "oneOf"):
        if key in doc:
            arms = doc[key]
            if not isinstance(arms, list) or len(arms) != 2:
                raise UnsupportedFeature(f"{key} is only supported as a 2-arm nullable pattern")
            nulls = [a for a in arms if isinstance(a, dict) and a.get("type") == "null"]
            others = [a for a in arms if not (isinstance(a, dict) and a.get("type") == "null")]
            if len(nulls) != 1 or len(others) != 1:
                raise UnsupportedFeature(
                    f"{key} must pair exactly one {{'type':'null'}} arm with one typed arm"
                )
            return parse_json_schema(others[0]).with_nullable(True)

    if "type" not in doc:
        raise InvalidSchema("schema object missing 'type'")

    t = doc["type"]
    # type: [T, "null"] nullable pattern (parse_schema.rs:91-136)
    if isinstance(t, list):
        if len(t) != 2:
            raise UnsupportedFeature("type arrays are only supported as [T, 'null'] pairs")
        if "null" not in t:
            raise UnsupportedFeature("type arrays must contain 'null'")
        other = [x for x in t if x != "null"]
        if not other:  # ["null", "null"]
            return SchemaNode.null()
        return _parse_single_type(doc, other[0]).with_nullable(True)

    if not isinstance(t, str):
        raise InvalidSchema("'type' must be a string or an array of strings")
    return _parse_single_type(doc, t)


def _parse_single_type(doc: dict, t: str) -> SchemaNode:
    if t == "string":
        return _parse_string(doc)
    if t in ("number", "integer"):
        return _parse_number(doc, t)
    if t == "boolean":
        return SchemaNode.boolean()
    if t == "null":
        return SchemaNode.null()
    if t == "object":
        return _parse_object(doc)
    if t == "array":
        return _parse_array(doc)
    raise UnsupportedFeature(f"unsupported type: {t!r}")


def _parse_string(doc: dict) -> SchemaNode:
    # precedence: enum > format > plain (parse_schema.rs:182-194)
    if "enum" in doc:
        variants = doc["enum"]
        if not isinstance(variants, list) or not variants:
            raise InvalidSchema("'enum' must be a non-empty array")
        if not all(isinstance(v, str) for v in variants):
            raise InvalidSchema("'enum' variants must all be strings")
        return SchemaNode.enum(variants)
    if "format" in doc:
        fmt = doc["format"]
        mapped = _FORMAT_MAP.get(fmt)
        if mapped is None:
            # unknown format: warn + fall through to plain string
            # (parse_schema.rs:240-250)
            _warn(f"unknown string format {fmt!r}; treating as plain string")
        else:
            return SchemaNode.string(str_type=mapped)
    min_len = _opt_usize(doc, "minLength")
    max_len = _opt_usize(doc, "maxLength")
    if min_len is not None and max_len is not None and min_len > max_len:
        raise InvalidSchema("minLength greater than maxLength")
    return SchemaNode.string(min_len=min_len, max_len=max_len)


def _parse_number(doc: dict, t: str) -> SchemaNode:
    is_int = t == "integer"
    lo_inc, lo_exc = doc.get("minimum"), doc.get("exclusiveMinimum")
    hi_inc, hi_exc = doc.get("maximum"), doc.get("exclusiveMaximum")
    if lo_inc is not None and lo_exc is not None:
        raise InvalidSchema("both minimum and exclusiveMinimum specified")
    if hi_inc is not None and hi_exc is not None:
        raise InvalidSchema("both maximum and exclusiveMaximum specified")
    for v in (lo_inc, lo_exc, hi_inc, hi_exc):
        if v is not None and not isinstance(v, (int, float)):
            raise InvalidSchema("numeric bounds must be numbers")

    if is_int:
        lo = I64_MIN if lo_inc is None and lo_exc is None else (
            int(lo_inc) if lo_inc is not None else int(lo_exc) + 1
        )
        hi = I64_MAX if hi_inc is None and hi_exc is None else (
            int(hi_inc) if hi_inc is not None else int(hi_exc) - 1
        )
        if lo > hi:
            raise InvalidSchema("minimum greater than maximum")
        return SchemaNode.integer(lo, hi)

    lo = -math.inf if lo_inc is None and lo_exc is None else (
        float(lo_inc) if lo_inc is not None else math.nextafter(float(lo_exc), math.inf)
    )
    hi = math.inf if hi_inc is None and hi_exc is None else (
        float(hi_inc) if hi_inc is not None else math.nextafter(float(hi_exc), -math.inf)
    )
    if lo > hi:
        raise InvalidSchema("minimum greater than maximum")
    return SchemaNode.floating(lo, hi)


def _parse_object(doc: dict) -> SchemaNode:
    for lossy in ("additionalProperties", "patternProperties"):
        if lossy in doc:
            _warn(f"{lossy} is not enforced; ignoring")
    props = doc.get("properties", {})
    if not isinstance(props, dict):
        raise InvalidSchema("'properties' must be an object")
    req_names = doc.get("required", [])
    if not isinstance(req_names, list) or not all(isinstance(r, str) for r in req_names):
        raise InvalidSchema("'required' must be an array of strings")
    required: dict[str, SchemaNode] = {}
    optional: dict[str, SchemaNode] = {}
    req_set = set(req_names)
    for name, sub in props.items():
        parsed = parse_json_schema(sub)
        (required if name in req_set else optional)[name] = parsed
    return SchemaNode.object(required=required, optional=optional)


def _parse_array(doc: dict) -> SchemaNode:
    if "items" not in doc:
        raise InvalidSchema("array schema requires 'items'")
    elem = parse_json_schema(doc["items"])
    min_items = _opt_usize(doc, "minItems")
    max_items = _opt_usize(doc, "maxItems")
    if min_items is not None and max_items is not None and min_items > max_items:
        raise InvalidSchema("minItems greater than maxItems")
    return SchemaNode.array(
        DEFAULT_MIN_ITEMS if min_items is None else min_items,
        DEFAULT_MAX_ITEMS if max_items is None else max_items,
        elem,
    )


def _opt_usize(doc: dict, key: str):
    v = doc.get(key)
    if v is None:
        return None
    if not isinstance(v, int) or isinstance(v, bool) or v < 0:
        raise InvalidSchema(f"{key} must be a non-negative integer")
    return v
