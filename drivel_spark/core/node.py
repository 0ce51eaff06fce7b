"""Schema-summary tree: the engine's single logical IR.

A from-scratch re-expression of the reference's ``SchemaState``
(/root/reference/src/schema.rs:501-533) as a flat dataclass with a
``nullable`` flag instead of a wrapper variant.  The flag form makes the
merge lattice associative (nullability is an OR, kinds form a lattice
with ``INITIAL`` as identity and ``INDEFINITE`` absorbing), which the
reference's ``Nullable(Box<...>)`` + identity-``Indefinite`` encoding is
not (see SURVEY.md §2.2 I4).

One tree node plays three roles, mirroring the reference:
schema, statistics accumulator (min/max, lengths, evidence), and
generator program (interpreted by :mod:`drivel_spark.core.produce`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

# ---------------------------------------------------------------------------
# node kinds
# ---------------------------------------------------------------------------

INITIAL = "initial"  # identity element; nothing seen (schema.rs:504)
BOOLEAN = "boolean"
NUMBER = "number"
STRING = "string"
ARRAY = "array"
OBJECT = "object"
INDEFINITE = "indefinite"  # irreconcilable type conflict (schema.rs:532)

KINDS = {INITIAL, BOOLEAN, NUMBER, STRING, ARRAY, OBJECT, INDEFINITE}

# string subtypes (schema.rs:211-333); STR_UNKNOWN is the evidence-carrying
# fallback, the rest are semantic formats from the detector cascade.
STR_UNKNOWN = "unknown"
STR_UUID = "uuid"
STR_EMAIL = "email"
STR_URL = "url"
STR_HOSTNAME = "hostname"
STR_ISO_DATE = "iso-date"
STR_DATETIME_ISO8601 = "datetime-iso8601"
STR_DATETIME_RFC2822 = "datetime-rfc2822"
STR_ENUM = "enum"

STR_TYPES = {
    STR_UNKNOWN,
    STR_UUID,
    STR_EMAIL,
    STR_URL,
    STR_HOSTNAME,
    STR_ISO_DATE,
    STR_DATETIME_ISO8601,
    STR_DATETIME_RFC2822,
    STR_ENUM,
}

# caps for bounded-evidence mode (used by the distributed profiler so
# accumulators stay O(1) per column at 10^12 rows; the reference's
# unbounded Vec<String>/Vec<char> evidence — infer.rs:56-57 — is fatal at
# scale, see SURVEY.md §7.4)
DEFAULT_MAX_STRINGS = 64
DEFAULT_MAX_CHARS = 1024


@dataclass
class SchemaNode:
    """One node of the schema-summary tree.

    ``kind`` selects which payload fields are meaningful:

    * ``number``: ``is_float``, ``min_n``, ``max_n``
    * ``string``: ``str_type``; for ``unknown``: ``strings_seen``,
      ``chars_seen``, ``min_len``, ``max_len``; for ``enum``: ``variants``
    * ``array``: ``min_items``, ``max_items``, ``elem``
    * ``object``: ``required``, ``optional`` (name -> SchemaNode)

    ``nullable`` means "nulls AND values of this kind were both seen";
    ``kind == INITIAL and nullable`` means "only nulls seen" (the
    reference's ``Null`` variant, schema.rs:506).
    """

    kind: str = INITIAL
    nullable: bool = False

    # number payload
    is_float: bool = False
    min_n: Optional[float] = None
    max_n: Optional[float] = None

    # string payload
    str_type: str = STR_UNKNOWN
    strings_seen: list[str] = field(default_factory=list)
    chars_seen: list[str] = field(default_factory=list)
    min_len: Optional[int] = None
    max_len: Optional[int] = None
    variants: frozenset[str] = frozenset()

    # array payload
    min_items: Optional[int] = None
    max_items: Optional[int] = None
    elem: Optional["SchemaNode"] = None

    # object payload
    required: dict[str, "SchemaNode"] = field(default_factory=dict)
    optional: dict[str, "SchemaNode"] = field(default_factory=dict)

    # ------------------------------------------------------------------
    # constructors
    # ------------------------------------------------------------------

    @staticmethod
    def initial() -> "SchemaNode":
        return SchemaNode()

    @staticmethod
    def null() -> "SchemaNode":
        """Only nulls seen (reference ``SchemaState::Null``)."""
        return SchemaNode(kind=INITIAL, nullable=True)

    @staticmethod
    def indefinite() -> "SchemaNode":
        return SchemaNode(kind=INDEFINITE)

    @staticmethod
    def boolean() -> "SchemaNode":
        return SchemaNode(kind=BOOLEAN)

    @staticmethod
    def integer(min_n: int, max_n: int) -> "SchemaNode":
        return SchemaNode(kind=NUMBER, is_float=False, min_n=min_n, max_n=max_n)

    @staticmethod
    def floating(min_n: float, max_n: float) -> "SchemaNode":
        return SchemaNode(kind=NUMBER, is_float=True, min_n=min_n, max_n=max_n)

    @staticmethod
    def string(
        str_type: str = STR_UNKNOWN,
        strings_seen: Optional[list[str]] = None,
        chars_seen: Optional[list[str]] = None,
        min_len: Optional[int] = None,
        max_len: Optional[int] = None,
        variants: Optional[frozenset[str]] = None,
    ) -> "SchemaNode":
        return SchemaNode(
            kind=STRING,
            str_type=str_type,
            strings_seen=strings_seen or [],
            chars_seen=chars_seen or [],
            min_len=min_len,
            max_len=max_len,
            variants=frozenset(variants or ()),
        )

    @staticmethod
    def enum(variants) -> "SchemaNode":
        return SchemaNode.string(str_type=STR_ENUM, variants=frozenset(variants))

    @staticmethod
    def array(min_items: int, max_items: int, elem: "SchemaNode") -> "SchemaNode":
        return SchemaNode(kind=ARRAY, min_items=min_items, max_items=max_items, elem=elem)

    @staticmethod
    def object(
        required: Optional[dict[str, "SchemaNode"]] = None,
        optional: Optional[dict[str, "SchemaNode"]] = None,
    ) -> "SchemaNode":
        return SchemaNode(kind=OBJECT, required=dict(required or {}), optional=dict(optional or {}))

    # ------------------------------------------------------------------
    # predicates / helpers
    # ------------------------------------------------------------------

    @property
    def is_null_only(self) -> bool:
        return self.kind == INITIAL and self.nullable

    def with_nullable(self, nullable: bool = True) -> "SchemaNode":
        if self.nullable == nullable:
            return self
        clone = self.copy()
        clone.nullable = nullable
        return clone

    def copy(self) -> "SchemaNode":
        return SchemaNode(
            kind=self.kind,
            nullable=self.nullable,
            is_float=self.is_float,
            min_n=self.min_n,
            max_n=self.max_n,
            str_type=self.str_type,
            strings_seen=list(self.strings_seen),
            chars_seen=list(self.chars_seen),
            min_len=self.min_len,
            max_len=self.max_len,
            variants=self.variants,
            min_items=self.min_items,
            max_items=self.max_items,
            elem=self.elem.copy() if self.elem is not None else None,
            required={k: v.copy() for k, v in self.required.items()},
            optional={k: v.copy() for k, v in self.optional.items()},
        )

    # ------------------------------------------------------------------
    # serialization (used to ship partition-local trees through Arrow)
    # ------------------------------------------------------------------

    def to_dict(self) -> dict[str, Any]:
        d: dict[str, Any] = {"kind": self.kind}
        if self.nullable:
            d["nullable"] = True
        if self.kind == NUMBER:
            d["is_float"] = self.is_float
            d["min_n"] = self.min_n
            d["max_n"] = self.max_n
        elif self.kind == STRING:
            d["str_type"] = self.str_type
            if self.str_type == STR_UNKNOWN:
                d["strings_seen"] = list(self.strings_seen)
                d["chars_seen"] = list(self.chars_seen)
                d["min_len"] = self.min_len
                d["max_len"] = self.max_len
            elif self.str_type == STR_ENUM:
                d["variants"] = sorted(self.variants)
        elif self.kind == ARRAY:
            d["min_items"] = self.min_items
            d["max_items"] = self.max_items
            d["elem"] = self.elem.to_dict() if self.elem is not None else None
        elif self.kind == OBJECT:
            d["required"] = {k: v.to_dict() for k, v in sorted(self.required.items())}
            d["optional"] = {k: v.to_dict() for k, v in sorted(self.optional.items())}
        return d

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "SchemaNode":
        kind = d["kind"]
        node = SchemaNode(kind=kind, nullable=bool(d.get("nullable", False)))
        if kind == NUMBER:
            node.is_float = bool(d.get("is_float", False))
            node.min_n = d.get("min_n")
            node.max_n = d.get("max_n")
        elif kind == STRING:
            node.str_type = d.get("str_type", STR_UNKNOWN)
            if node.str_type == STR_UNKNOWN:
                node.strings_seen = list(d.get("strings_seen", []))
                node.chars_seen = list(d.get("chars_seen", []))
                node.min_len = d.get("min_len")
                node.max_len = d.get("max_len")
            elif node.str_type == STR_ENUM:
                node.variants = frozenset(d.get("variants", ()))
        elif kind == ARRAY:
            node.min_items = d.get("min_items")
            node.max_items = d.get("max_items")
            elem = d.get("elem")
            node.elem = SchemaNode.from_dict(elem) if elem is not None else None
        elif kind == OBJECT:
            node.required = {k: SchemaNode.from_dict(v) for k, v in d.get("required", {}).items()}
            node.optional = {k: SchemaNode.from_dict(v) for k, v in d.get("optional", {}).items()}
        return node

    # structural equality that ignores evidence-list ordering
    def semantically_equal(self, other: "SchemaNode") -> bool:
        if (self.kind, self.nullable) != (other.kind, other.nullable):
            return False
        if self.kind == NUMBER:
            return (
                self.is_float == other.is_float
                and self.min_n == other.min_n
                and self.max_n == other.max_n
            )
        if self.kind == STRING:
            if self.str_type != other.str_type:
                return False
            if self.str_type == STR_UNKNOWN:
                return (
                    sorted(self.strings_seen) == sorted(other.strings_seen)
                    and sorted(self.chars_seen) == sorted(other.chars_seen)
                    and self.min_len == other.min_len
                    and self.max_len == other.max_len
                )
            if self.str_type == STR_ENUM:
                return self.variants == other.variants
            return True
        if self.kind == ARRAY:
            if (self.min_items, self.max_items) != (other.min_items, other.max_items):
                return False
            if (self.elem is None) != (other.elem is None):
                return False
            return self.elem is None or self.elem.semantically_equal(other.elem)
        if self.kind == OBJECT:
            if set(self.required) != set(other.required) or set(self.optional) != set(other.optional):
                return False
            return all(
                self.required[k].semantically_equal(other.required[k]) for k in self.required
            ) and all(
                self.optional[k].semantically_equal(other.optional[k]) for k in self.optional
            )
        return True
