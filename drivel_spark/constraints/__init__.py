"""Constraint specs, Catalyst compilation, the validation pass, drift
statistics, and audio row-level checks."""

from .audio import PcmSizeConsistency, attach_clip_idx, make_snr_udf, with_decoded_meta
from .drift import (
    chi_square_categorical,
    drift_report,
    ks_statistic,
    psi_categorical,
    psi_numeric,
    wasserstein_1,
    wasserstein_exact,
)
from .spec import (
    Conditional,
    Constraint,
    Drift,
    Enum,
    GroupBound,
    QuantileBound,
    Format,
    Length,
    NotNull,
    Range,
    Referential,
    SpeechRate,
    Unique,
    from_json_schema,
    from_profile,
)
from .specfile import from_spec_json, load_spec_file
from .validate import (
    GLOBAL_SCOPE,
    RowPredicate,
    ValidationResult,
    group_bound_table,
    validate,
)

__all__ = [
    "Constraint",
    "Conditional",
    "GroupBound",
    "QuantileBound",
    "group_bound_table",
    "from_spec_json",
    "load_spec_file",
    "NotNull",
    "Range",
    "Enum",
    "Length",
    "Format",
    "Unique",
    "Referential",
    "SpeechRate",
    "Drift",
    "from_profile",
    "from_json_schema",
    "validate",
    "ValidationResult",
    "RowPredicate",
    "GLOBAL_SCOPE",
    "drift_report",
    "ks_statistic",
    "psi_categorical",
    "psi_numeric",
    "wasserstein_1",
    "wasserstein_exact",
    "chi_square_categorical",
    "with_decoded_meta",
    "make_snr_udf",
    "attach_clip_idx",
    "PcmSizeConsistency",
]
