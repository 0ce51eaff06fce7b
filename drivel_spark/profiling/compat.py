"""Schema-evolution compatibility verdict — the CI gate on top of the
structural diff.

:func:`diff_profiles` answers *what moved* between an ingest batch and
the baseline contract; the operational question a 10^12-row pipeline
asks next is *may this batch land* — the Avro/Iceberg-style
backward-compatibility decision, re-expressed for this engine's
observed-profile lattice (the reference's loop is infer → emit →
re-check, reference src/infer.rs + src/schema.rs; the compat verdict is
the gate a user of that loop applies between two of its runs).

Each diff change kind carries a fixed severity under the default
BACKWARD policy — "may a consumer pinned to the baseline contract still
read the new batch":

- ``block`` — structural breaks for such a consumer:
  ``column_removed`` (a projected column vanished), ``type_changed``
  (the lattice kind moved, downstream casts break), ``nulls_appeared``
  (the inferred required-∩ contract said NOT NULL; reference
  drivel's required-field semantics), ``format_changed`` (key shape
  moved, e.g. uuid -> free text).
- ``warn`` — value-contract drift that needs eyes but breaks no reader:
  ``enum_variants_added`` (total string handling keeps working),
  ``range_widened_lo`` / ``range_widened_hi`` / ``length_widened_hi``
  (the historical envelope grew).
- ``ok`` — additive evolution: ``column_added`` (readers project).

``severity_overrides`` re-pins any kind per deployment ("enum growth is
a block for us"); unknown kinds in the override map fail loudly so a
typo cannot silently weaken the gate.

Like the diff itself this is a pure driver-side walk over two already-
reduced O(columns) profiles — NO data pass, free at any scale; both
profiles were paid for by their own single scans (or by the zero-scan
profile-merge fold for incremental corpora).
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

from .diff import diff_profiles
from .profiler import TableProfile

__all__ = [
    "COMPAT_SCHEMA",
    "SEVERITY_BACKWARD",
    "compat_report",
    "compat_verdict",
]

COMPAT_SCHEMA = (
    "column string, change string, before double, after double, "
    "detail string, severity string"
)

# default policy: BACKWARD — may a consumer pinned to the baseline
# contract read the new batch (rationale per kind in the module doc)
SEVERITY_BACKWARD: dict[str, str] = {
    "column_removed": "block",
    "type_changed": "block",
    "nulls_appeared": "block",
    "format_changed": "block",
    "enum_variants_added": "warn",
    "range_widened_lo": "warn",
    "range_widened_hi": "warn",
    "length_widened_hi": "warn",
    "column_added": "ok",
}

_SEVERITIES = ("ok", "warn", "block")


def compat_report(
    current: TableProfile,
    baseline: TableProfile,
    *,
    severity_overrides: Optional[Mapping[str, str]] = None,
) -> list[dict[str, Any]]:
    """:func:`diff_profiles` rows, each classified with a ``severity``
    under the BACKWARD policy (module doc) as re-pinned by
    ``severity_overrides``.  Output order matches the diff's
    (column, change) sort; an empty list means the batch is identical
    to the contract envelope."""
    rules = dict(SEVERITY_BACKWARD)
    for kind, sev in (severity_overrides or {}).items():
        if kind not in rules:
            raise ValueError(
                f"severity_overrides: unknown change kind {kind!r} "
                f"(known: {sorted(rules)})"
            )
        if sev not in _SEVERITIES:
            raise ValueError(
                f"severity_overrides[{kind!r}]: severity must be one of "
                f"{_SEVERITIES}, got {sev!r}"
            )
        rules[kind] = sev
    rows = diff_profiles(current, baseline)
    for r in rows:
        r["severity"] = rules[r["change"]]
    return rows


def compat_verdict(report: list[dict[str, Any]]) -> dict[str, Any]:
    """Fold a :func:`compat_report` to the table-level gate decision:
    counts per severity plus ``verdict`` = the worst severity present
    (``ok`` for an empty report) and ``gate_passed`` = no blocks."""
    counts = {sev: 0 for sev in _SEVERITIES}
    for r in report:
        counts[r["severity"]] += 1
    verdict = (
        "block" if counts["block"] else "warn" if counts["warn"] else "ok"
    )
    return {
        "n_ok": counts["ok"],
        "n_warn": counts["warn"],
        "n_block": counts["block"],
        "verdict": verdict,
        "gate_passed": counts["block"] == 0,
    }
