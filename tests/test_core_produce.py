"""Generator property tests (the reference has ZERO produce tests —
SURVEY.md §5 'notable gap' — because its RNG is unseeded; ours is seeded
so we can pin determinism + structural round-trips)."""

import numpy as np

from drivel_spark.core import (
    EnumInference,
    InferenceOptions,
    SchemaNode,
    infer_many,
    infer_value,
    merge,
    produce_many,
    produce_value,
)
from drivel_spark.core.detect import detect
from drivel_spark.core.node import (
    STR_DATETIME_ISO8601,
    STR_DATETIME_RFC2822,
    STR_EMAIL,
    STR_HOSTNAME,
    STR_ISO_DATE,
    STR_URL,
    STR_UUID,
)


def test_deterministic_per_seed():
    node = infer_many([{"a": 1, "b": "xyz"}, {"a": 9}])
    assert produce_many(node, 20, seed=7) == produce_many(node, 20, seed=7)
    assert produce_many(node, 20, seed=7) != produce_many(node, 20, seed=8)


def test_int_bounds_respected():
    node = infer_many([3, 17])
    vals = produce_many(node, 200, seed=1)
    assert all(isinstance(v, int) and 3 <= v <= 17 for v in vals)


def test_degenerate_range_constant():
    node = infer_value(5)
    assert set(produce_many(node, 10, seed=1)) == {5}


def test_float_guards():
    node = SchemaNode.floating(-np.inf, np.inf)
    vals = produce_many(node, 100, seed=2)
    assert all(-1e10 <= v <= 1e10 for v in vals)


def test_enum_variants_only():
    node = SchemaNode.enum({"a", "b", "c"})
    vals = set(produce_many(node, 100, seed=3))
    assert vals <= {"a", "b", "c"}
    assert len(vals) == 3  # all variants eventually hit


def test_formats_reinfer_to_same_format():
    for fmt in [
        STR_UUID,
        STR_EMAIL,
        STR_URL,
        STR_HOSTNAME,
        STR_ISO_DATE,
        STR_DATETIME_ISO8601,
        STR_DATETIME_RFC2822,
    ]:
        node = SchemaNode.string(str_type=fmt)
        for v in produce_many(node, 30, seed=4):
            assert detect(v) == fmt, (fmt, v)


def test_unknown_string_uses_char_evidence():
    node = infer_many(["aab", "abba"])
    vals = produce_many(node, 50, seed=5)
    assert all(set(v) <= {"a", "b"} for v in vals)
    assert all(3 <= len(v) <= 4 for v in vals)


def test_nullable_coinflip():
    node = infer_many([None, 5])
    vals = produce_many(node, 200, seed=6)
    assert any(v is None for v in vals)
    assert any(v is not None for v in vals)


def test_object_required_always_optional_sometimes():
    node = infer_many([{"a": 1, "b": 2}, {"a": 3}])
    vals = produce_many(node, 100, seed=7)
    assert all("a" in v for v in vals)
    with_b = sum("b" in v for v in vals)
    assert 0 < with_b < 100


def test_array_empty_when_elem_unknowable():
    node = infer_value([])
    assert produce_many(node, 5, seed=8) == [[], [], [], [], []]


def test_roundtrip_reinfer_subsumed():
    """profile(produce(p, n)) must be subsumed by p: same kinds, bounds
    within p's bounds, enum variants within p's variants."""
    source = infer_many(
        [
            {"id": "550e8400-e29b-41d4-a716-446655440000", "n": 4, "f": 1.5, "tags": ["x", "y"]},
            {"id": "650e8400-e29b-41d4-a716-446655440000", "n": 9, "f": 2.5, "tags": []},
        ],
        InferenceOptions(enum_inference=EnumInference(max_unique_ratio=1.0, min_sample_size=1)),
    )
    produced = produce_many(source, 100, seed=9)
    reinferred = infer_many(produced)
    assert reinferred.kind == "object"
    assert set(reinferred.required) <= set(source.required) | set(source.optional)
    n = reinferred.required["n"]
    assert n.min_n >= source.required["n"].min_n
    assert n.max_n <= source.required["n"].max_n
    # merging the re-inferred schema into the source must not change kinds
    m = merge(source.copy(), reinferred)
    assert m.kind == "object"
    assert m.required["id"].str_type == source.required["id"].str_type
