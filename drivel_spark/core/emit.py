"""Schema emitters: human-readable describe + JSON Schema draft 2020-12.

Parity targets: ``to_string_pretty`` (/root/reference/src/schema.rs:
535-595, 639-641) and ``to_json_schema`` (schema.rs:644-754), with two
documented deviations:

* **Deterministic ordering** — the reference iterates HashMaps, so its
  object-key order, ``required`` arrays and enum lists are
  nondeterministic (SURVEY.md §7.4); we sort everything.
* **Extended mode** — the reference drops min/max for numbers
  (schema.rs:743-754) and minLength/maxLength for strings
  (schema.rs:699-701); ``extended=True`` emits them losslessly
  (``minimum``/``maximum``, ``minLength``/``maxLength``,
  ``minItems``/``maxItems``) for use as validation constraints.
"""

from __future__ import annotations

from typing import Any

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
    STR_EMAIL,
    STR_ENUM,
    STR_HOSTNAME,
    STR_ISO_DATE,
    STR_UNKNOWN,
    STR_URL,
    STR_UUID,
    SchemaNode,
)


def _fmt_num(v) -> str:
    """Rust-style f64 Display: 100.0 → "100", 104.5 → "104.5"."""
    if isinstance(v, float) and v.is_integer() and abs(v) < 1e16:
        return str(int(v))
    return str(v)


def _range_str(lo, hi, fmt=str) -> str:
    if lo is None and hi is None:
        return "(length unknown)"
    if lo is None:
        return f"(?-{fmt(hi)})"
    if hi is None:
        return f"({fmt(lo)}-?)"
    if lo == hi:
        return f"({fmt(lo)})"
    return f"({fmt(lo)}-{fmt(hi)})"


_STRING_LABELS = {
    STR_ISO_DATE: "string (date - ISO 8601)",
    STR_DATETIME_RFC2822: "string (datetime - RFC 2822)",
    STR_DATETIME_ISO8601: "string (datetime - ISO 8601)",
    STR_UUID: "string (uuid)",
    STR_EMAIL: "string (email)",
    STR_HOSTNAME: "string (hostname)",
    STR_URL: "string (url)",
}


def describe(node: SchemaNode) -> str:
    """Human-readable schema text (schema.rs:535-595 parity, sorted keys)."""
    return _describe(node, 0)


def _describe(node: SchemaNode, depth: int) -> str:
    prefix = "nullable " if node.nullable and not node.is_null_only else ""
    return prefix + _describe_bare(node, depth)


def _describe_bare(node: SchemaNode, depth: int) -> str:
    if node.is_null_only:
        return "null"
    if node.kind in (INITIAL, INDEFINITE):
        return "unknown"
    if node.kind == BOOLEAN:
        return "boolean"
    if node.kind == NUMBER:
        label = "float" if node.is_float else "int"
        return f"{label} {_range_str(node.min_n, node.max_n, _fmt_num)}"
    if node.kind == STRING:
        if node.str_type == STR_UNKNOWN:
            return f"string {_range_str(node.min_len, node.max_len)}"
        if node.str_type == STR_ENUM:
            return f"string (enum: {', '.join(sorted(node.variants))})"
        return _STRING_LABELS[node.str_type]
    if node.kind == ARRAY:
        indent = " " * (2 + 2 * depth)
        close = " " * (2 * depth)
        elem = node.elem if node.elem is not None else SchemaNode.initial()
        length = _range_str(node.min_items, node.max_items)
        return f"[\n{indent}{_describe(elem, depth + 1)}\n{close}] {length}"
    if node.kind == OBJECT:
        indent = " " * (2 + 2 * depth)
        close = " " * (2 * depth)
        lines = [
            f'{indent}"{k}": {_describe(v, depth + 1)}' for k, v in sorted(node.required.items())
        ] + [
            f'{indent}"{k}": optional {_describe(v, depth + 1)}'
            for k, v in sorted(node.optional.items())
        ]
        return "{\n" + ",\n".join(lines) + f"\n{close}}}"
    raise AssertionError(node.kind)


def to_json_schema(node: SchemaNode, extended: bool = False) -> Any:
    """SchemaNode → JSON Schema value (schema.rs:644-754 parity)."""
    inner = _to_json_schema_bare(node, extended)
    if node.nullable and not node.is_null_only:
        t = inner.get("type")
        if isinstance(t, str):
            inner = dict(inner)
            inner["type"] = [t, "null"]
    return inner


def _to_json_schema_bare(node: SchemaNode, ext: bool) -> dict[str, Any]:
    if node.is_null_only:
        return {"type": "null"}
    if node.kind in (INITIAL, INDEFINITE):
        return {}
    if node.kind == BOOLEAN:
        return {"type": "boolean"}
    if node.kind == NUMBER:
        out: dict[str, Any] = {"type": "number" if node.is_float else "integer"}
        # reference drops numeric bounds (schema.rs:743-754); extended keeps
        if ext:
            if node.min_n is not None:
                out["minimum"] = node.min_n
            if node.max_n is not None:
                out["maximum"] = node.max_n
        return out
    if node.kind == STRING:
        return _string_json_schema(node, ext)
    if node.kind == ARRAY:
        elem = node.elem if node.elem is not None else SchemaNode.initial()
        out = {"type": "array", "items": to_json_schema(elem, ext)}
        if ext:
            if node.min_items is not None:
                out["minItems"] = node.min_items
            if node.max_items is not None:
                out["maxItems"] = node.max_items
        return out
    if node.kind == OBJECT:
        props: dict[str, Any] = {}
        for k, v in sorted(node.required.items()):
            props[k] = to_json_schema(v, ext)
        for k, v in sorted(node.optional.items()):
            props[k] = to_json_schema(v, ext)
        return {
            "type": "object",
            "properties": props,
            "required": sorted(node.required),
            "additionalProperties": False,
        }
    raise AssertionError(node.kind)


def _string_json_schema(node: SchemaNode, ext: bool) -> dict[str, Any]:
    st = node.str_type
    if st == STR_UNKNOWN:
        out: dict[str, Any] = {"type": "string"}
        # reference drops length bounds (schema.rs:699-701); extended keeps
        if ext:
            if node.min_len is not None:
                out["minLength"] = node.min_len
            if node.max_len is not None:
                out["maxLength"] = node.max_len
        return out
    if st == STR_ENUM:
        return {"type": "string", "enum": sorted(node.variants)}
    if st == STR_UUID:
        return {"type": "string", "format": "uuid"}
    if st == STR_EMAIL:
        return {"type": "string", "format": "email"}
    if st == STR_URL:
        return {"type": "string", "format": "uri"}
    if st == STR_ISO_DATE:
        return {"type": "string", "format": "date"}
    if st == STR_DATETIME_ISO8601:
        return {"type": "string", "format": "date-time"}
    if st == STR_HOSTNAME:
        return {"type": "string", "format": "hostname", "x-drivel-type": "hostname"}
    if st == STR_DATETIME_RFC2822:
        return {
            "type": "string",
            "x-drivel-type": "datetime-rfc2822",
            "description": "RFC 2822 datetime format",
        }
    raise AssertionError(st)


def to_json_schema_document(
    node: SchemaNode,
    title: str = "Inferred Schema",
    description: str = "Schema inferred by drivel-spark",
    extended: bool = False,
) -> dict[str, Any]:
    """Wrap with ``$schema``/title/description (schema.rs:149-163)."""
    doc = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "title": title,
        "description": description,
    }
    doc.update(to_json_schema(node, extended))
    return doc
