"""Ported semantics of the reference's emitter + parser tests
(/root/reference/src/schema.rs:756-1337, parse_schema.rs:535-1284)."""

import math

import pytest

from drivel_spark.core import (
    InvalidSchema,
    SchemaNode,
    SchemaWarning,
    UnsupportedFeature,
    describe,
    infer_many,
    infer_value,
    parse_json_schema,
    to_json_schema,
    to_json_schema_document,
)
from drivel_spark.core.node import STR_EMAIL, STR_ENUM, STR_UUID, STR_UNKNOWN
from drivel_spark.core.parse_schema import I64_MAX, I64_MIN


# --- describe (schema.rs:535-595) --------------------------------------

def test_describe_scalars():
    assert describe(infer_value(5)) == "int (5)"
    assert describe(infer_many([5, 9])) == "int (5-9)"
    assert describe(infer_many([1.5, 2.5])) == "float (1.5-2.5)"
    # Rust f64 Display renders 100.0 as "100"
    assert describe(infer_many([100.0, 104.5])) == "float (100-104.5)"
    assert describe(infer_value(True)) == "boolean"
    assert describe(infer_value(None)) == "null"
    assert describe(infer_value("abc")) == "string (3)"
    assert describe(infer_many(["abc", "abcdef"])) == "string (3-6)"
    assert describe(infer_value("a@b.com")) == "string (email)"
    assert describe(infer_value("2023-12-25")) == "string (date - ISO 8601)"
    assert describe(infer_many([None, 5])) == "nullable int (5)"


def test_describe_object_nested():
    n = infer_many([{"a": 1, "b": [True]}, {"a": 2}])
    expected = (
        "{\n"
        '  "a": int (1-2),\n'
        '  "b": optional [\n'
        "    boolean\n"
        "  ] (1)\n"
        "}"
    )
    assert describe(n) == expected


def test_describe_array_range():
    n = infer_many([[1], [1, 2, 3]])
    assert describe(n) == "[\n  int (1-3)\n] (1-3)"


def test_describe_enum_sorted():
    n = SchemaNode.enum({"red", "blue"})
    assert describe(n) == "string (enum: blue, red)"


# --- to_json_schema (schema.rs:838-1336) -------------------------------

def test_json_schema_scalars():
    assert to_json_schema(infer_value(True)) == {"type": "boolean"}
    assert to_json_schema(infer_value(None)) == {"type": "null"}
    assert to_json_schema(SchemaNode.initial()) == {}
    assert to_json_schema(SchemaNode.indefinite()) == {}
    # numbers drop bounds in parity mode (schema.rs:743-754)
    assert to_json_schema(infer_many([1, 9])) == {"type": "integer"}
    assert to_json_schema(infer_many([1.5, 2.0])) == {"type": "number"}
    # strings drop length bounds (schema.rs:699-701)
    assert to_json_schema(infer_value("abc")) == {"type": "string"}


def test_json_schema_formats():
    assert to_json_schema(infer_value("a@b.com")) == {"type": "string", "format": "email"}
    assert to_json_schema(infer_value("550e8400-e29b-41d4-a716-446655440000")) == {
        "type": "string",
        "format": "uuid",
    }
    assert to_json_schema(infer_value("example.com")) == {
        "type": "string",
        "format": "hostname",
        "x-drivel-type": "hostname",
    }
    assert to_json_schema(infer_value("Mon, 25 Dec 2023 10:30:00 +0000")) == {
        "type": "string",
        "x-drivel-type": "datetime-rfc2822",
        "description": "RFC 2822 datetime format",
    }


def test_json_schema_nullable_type_array():
    # Nullable → type array with null (schema.rs:652-663)
    assert to_json_schema(infer_many([None, 5])) == {"type": ["integer", "null"]}
    assert to_json_schema(infer_many([None, "a@b.com"])) == {
        "type": ["string", "null"],
        "format": "email",
    }


def test_json_schema_object():
    n = infer_many([{"a": 1, "b": "x"}, {"a": 2}])
    js = to_json_schema(n)
    assert js["type"] == "object"
    assert js["required"] == ["a"]
    assert js["additionalProperties"] is False
    assert js["properties"]["a"] == {"type": "integer"}
    assert js["properties"]["b"] == {"type": "string"}


def test_json_schema_array():
    assert to_json_schema(infer_value([1, 2])) == {
        "type": "array",
        "items": {"type": "integer"},
    }


def test_json_schema_document_wrapper():
    doc = to_json_schema_document(infer_value(5))
    assert doc["$schema"] == "https://json-schema.org/draft/2020-12/schema"
    assert doc["title"] == "Inferred Schema"
    assert doc["type"] == "integer"


def test_extended_mode_lossless():
    js = to_json_schema(infer_many([1, 9]), extended=True)
    assert js == {"type": "integer", "minimum": 1, "maximum": 9}
    js = to_json_schema(infer_many(["abc", "abcdef"]), extended=True)
    assert js == {"type": "string", "minLength": 3, "maxLength": 6}
    js = to_json_schema(infer_many([[1], [1, 2]]), extended=True)
    assert js["minItems"] == 1 and js["maxItems"] == 2


# --- parse_json_schema (parse_schema.rs:535-1284) ----------------------

def test_parse_scalars():
    assert parse_json_schema({"type": "boolean"}).kind == "boolean"
    assert parse_json_schema({"type": "null"}).is_null_only
    n = parse_json_schema({"type": "integer", "minimum": 1, "maximum": 5})
    assert n.kind == "number" and not n.is_float and n.min_n == 1 and n.max_n == 5
    f = parse_json_schema({"type": "number"})
    assert f.is_float and f.min_n == -math.inf and f.max_n == math.inf


def test_parse_integer_defaults_i64():
    # parse_schema.rs:290-291
    n = parse_json_schema({"type": "integer"})
    assert n.min_n == I64_MIN and n.max_n == I64_MAX


def test_parse_string_precedence_enum_over_format():
    n = parse_json_schema({"type": "string", "enum": ["a", "b"], "format": "email"})
    assert n.str_type == STR_ENUM and n.variants == frozenset({"a", "b"})


def test_parse_string_formats():
    assert parse_json_schema({"type": "string", "format": "uuid"}).str_type == STR_UUID
    assert parse_json_schema({"type": "string", "format": "email"}).str_type == STR_EMAIL


def test_parse_unknown_format_warns_plain():
    with pytest.warns(SchemaWarning):
        n = parse_json_schema({"type": "string", "format": "ipv6"})
    assert n.str_type == STR_UNKNOWN


def test_parse_string_lengths():
    n = parse_json_schema({"type": "string", "minLength": 2, "maxLength": 8})
    assert n.min_len == 2 and n.max_len == 8
    with pytest.raises(InvalidSchema):
        parse_json_schema({"type": "string", "minLength": 9, "maxLength": 2})


def test_parse_empty_enum_invalid():
    with pytest.raises(InvalidSchema):
        parse_json_schema({"type": "string", "enum": []})


def test_parse_min_gt_max_invalid():
    with pytest.raises(InvalidSchema):
        parse_json_schema({"type": "integer", "minimum": 10, "maximum": 1})


def test_parse_nullable_type_array():
    n = parse_json_schema({"type": ["string", "null"]})
    assert n.kind == "string" and n.nullable
    with pytest.raises(UnsupportedFeature):
        parse_json_schema({"type": ["string", "integer"]})
    with pytest.raises(UnsupportedFeature):
        parse_json_schema({"type": ["string", "integer", "null"]})


def test_parse_nullable_anyof():
    n = parse_json_schema({"anyOf": [{"type": "null"}, {"type": "integer"}]})
    assert n.kind == "number" and n.nullable
    n = parse_json_schema({"oneOf": [{"type": "boolean"}, {"type": "null"}]})
    assert n.kind == "boolean" and n.nullable
    with pytest.raises(UnsupportedFeature):
        parse_json_schema({"anyOf": [{"type": "integer"}, {"type": "string"}]})


def test_parse_object_required_split():
    n = parse_json_schema(
        {
            "type": "object",
            "properties": {"a": {"type": "integer"}, "b": {"type": "string"}},
            "required": ["a"],
        }
    )
    assert set(n.required) == {"a"} and set(n.optional) == {"b"}


def test_parse_object_additional_properties_warns():
    with pytest.warns(SchemaWarning):
        parse_json_schema(
            {"type": "object", "properties": {}, "additionalProperties": True}
        )


def test_parse_array_defaults():
    # minItems default 0, maxItems default 16 (parse_schema.rs:462-469)
    n = parse_json_schema({"type": "array", "items": {"type": "integer"}})
    assert n.min_items == 0 and n.max_items == 16
    with pytest.raises(InvalidSchema):
        parse_json_schema({"type": "array"})


def test_parse_exclusive_bounds_strict():
    # documented deviation from parse_schema.rs:311-345: proper strictness
    n = parse_json_schema({"type": "integer", "exclusiveMinimum": 0, "exclusiveMaximum": 10})
    assert n.min_n == 1 and n.max_n == 9
    with pytest.raises(InvalidSchema):
        parse_json_schema({"type": "integer", "minimum": 0, "exclusiveMinimum": 0})


def test_parse_unsupported_type():
    with pytest.raises(UnsupportedFeature):
        parse_json_schema({"type": "binary"})
    with pytest.raises(InvalidSchema):
        parse_json_schema([1, 2])
    with pytest.raises(InvalidSchema):
        parse_json_schema({"properties": {}})


def test_roundtrip_infer_emit_parse():
    n = infer_many([{"id": "550e8400-e29b-41d4-a716-446655440000", "age": 7}])
    doc = to_json_schema(n)
    back = parse_json_schema(doc)
    assert back.kind == "object"
    assert back.required["id"].str_type == STR_UUID
    assert back.required["age"].kind == "number"
