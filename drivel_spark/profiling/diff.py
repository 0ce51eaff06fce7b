"""Profile-to-profile schema diff — the validation engine's answer to
"what changed since the baseline batch?".

The reference's loop is infer → emit → (re-)check; operationally the
question users hit between two runs of that loop is *which columns
moved*: a column disappeared from the feed, nulls appeared where there
were none, a numeric range broke out of its historical envelope, an
enum grew a variant, a string column changed detected format.  Drift
(constraints/drift.py) answers the distributional version of that
question with KS/PSI over sketches; :func:`diff_profiles` answers the
structural version, and like drift it runs entirely over two O(columns)
driver-side profiles — NO data pass, which is exactly what makes it
free at 10^12 rows: both profiles were already paid for by their own
single scans.

Change kinds emitted (sorted by (column, change); every rule is
deterministic and threshold-free so two engines re-deriving the diff
from the same raw tables agree exactly):

- ``column_added`` / ``column_removed``   (after / before = row count)
- ``type_changed``                        (detail = "base_kind->cur_kind")
- ``nulls_appeared``                      (baseline had 0 nulls; after =
                                          current null ratio, round 6)
- ``range_widened_lo`` / ``range_widened_hi``  (numeric bounds escaped
                                          the baseline envelope; before/
                                          after = the bound)
- ``length_widened_hi``                   (string max length grew)
- ``format_changed``                      (detected string format moved,
                                          e.g. uuid -> unknown; enum
                                          transitions are reported as
                                          enum changes, not format)
- ``enum_variants_added``                 (after = count of new
                                          variants; detail = sorted
                                          comma-joined new variants)
"""

from __future__ import annotations

from typing import Any, Optional

from ..core.node import STR_ENUM
from .profiler import TableProfile

__all__ = ["diff_profiles", "DIFF_SCHEMA"]

DIFF_SCHEMA = (
    "column string, change string, before double, after double, detail string"
)


def _row(column: str, change: str, before: Optional[float] = None,
         after: Optional[float] = None, detail: Optional[str] = None) -> dict:
    return {
        "column": column,
        "change": change,
        "before": float(before) if before is not None else None,
        "after": float(after) if after is not None else None,
        "detail": detail,
    }


def diff_profiles(current: TableProfile, baseline: TableProfile) -> list[dict[str, Any]]:
    """Structural diff of ``current`` against ``baseline``; see module
    docstring for the emitted change kinds.  Pure driver-side metadata
    walk — both inputs are already-reduced profiles."""
    out: list[dict[str, Any]] = []
    cur_cols = set(current.columns())
    base_cols = set(baseline.columns())

    for name in sorted(cur_cols - base_cols):
        out.append(_row(name, "column_added", after=current.column(name).n))
    for name in sorted(base_cols - cur_cols):
        out.append(_row(name, "column_removed", before=baseline.column(name).n))

    for name in sorted(cur_cols & base_cols):
        cur, base = current.column(name), baseline.column(name)
        if cur.kind != base.kind:
            out.append(
                _row(name, "type_changed", detail=f"{base.kind}->{cur.kind}")
            )
            continue  # further comparisons are kind-specific
        if base.n_null == 0 and cur.n_null > 0:
            out.append(
                _row(name, "nulls_appeared", before=0.0,
                     after=round(cur.n_null / cur.n, 6) if cur.n else None)
            )
        if cur.kind == "numeric" and cur.min_v is not None and base.min_v is not None:
            if cur.min_v < base.min_v:
                out.append(
                    _row(name, "range_widened_lo", before=base.min_v,
                         after=cur.min_v)
                )
            if cur.max_v > base.max_v:
                out.append(
                    _row(name, "range_widened_hi", before=base.max_v,
                         after=cur.max_v)
                )
        elif cur.kind == "string":
            if (
                cur.max_len is not None
                and base.max_len is not None
                and cur.max_len > base.max_len
            ):
                out.append(
                    _row(name, "length_widened_hi", before=base.max_len,
                         after=cur.max_len)
                )
            cur_node = current._column_node(cur)
            base_node = baseline._column_node(base)
            cur_enum = cur_node.str_type == STR_ENUM
            base_enum = base_node.str_type == STR_ENUM
            if cur_enum and base_enum:
                new = sorted(cur_node.variants - base_node.variants)
                if new:
                    out.append(
                        _row(name, "enum_variants_added", after=len(new),
                             detail=",".join(new))
                    )
            elif cur_node.str_type != base_node.str_type:
                out.append(
                    _row(name, "format_changed",
                         detail=f"{base_node.str_type}->{cur_node.str_type}")
                )
    return sorted(out, key=lambda r: (r["column"], r["change"]))
