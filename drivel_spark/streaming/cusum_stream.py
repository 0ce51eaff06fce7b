"""Streaming CUSUM changepoint monitor via ``applyInPandasWithState``.

The batch detector (ops/timeseries.py) answers "did this column's
level shift anywhere in the table"; the streaming monitor answers
"has it shifted AS OF NOW" — per key, updated the micro-batch the
shift arrives, with O(1) state (two excursion scalars + two counters).

Standardization comes from a FIXED baseline profile (key → mean/sd),
never from the stream itself: a drifting stream must not be allowed to
normalize its own shift away, and a streaming mean would make scores
depend on micro-batch boundaries.  Keys absent from the baseline are
ignored (score only what the profile vouches for — same contract as
the batch op's baseline mode).

Ordering contract: rows are CUSUM-folded in (ts, arrival) order within
each micro-batch; across batches the fold follows stream arrival, as
any stateful streaming op does.  With an in-order source (file queues,
kafka per-partition order) the streamed scores equal the batch
detector's exactly — pinned by the tests.

Same bounded-key-cardinality contract as running_stats (stateful.py):
codec/event-type-shaped keys, not clip ids.
"""

from __future__ import annotations

from typing import Iterable, Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_cusum", "CUSUM_STATE_FIELDS"]

CUSUM_STATE_FIELDS = "s_pos double, s_neg double, n_seen long, n_alarms long"


def streaming_cusum(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    baseline: Mapping[str, tuple[float, float]],
    k_drift: float = 0.5,
    h_threshold: float = 5.0,
) -> DataFrame:
    """Per-key streaming CUSUM over ``value_col``: one update row per
    (touched key, micro-batch) carrying the running excursions and the
    cumulative alarm count.  ``baseline`` maps key → (mean, sd); it is
    closed over (bounded keys ⇒ KB-sized) and shipped with the task.
    """
    if not baseline:
        raise ValueError("baseline must map key -> (mean, sd); got empty")
    base = {k: (float(m), float(s)) for k, (m, s) in baseline.items()}
    kd, h = float(k_drift), float(h_threshold)

    key_type = stream_df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, s_pos double, s_neg double, "
        "n_seen long, n_alarms long, batch_alarms long"
    )

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        k = key[0]
        mean_sd = base.get(k)
        if mean_sd is None:
            return  # not in the baseline: emit nothing, keep no state
        mean, sd = mean_sd
        if state.exists:
            s_pos, s_neg, n_seen, n_alarms = state.get
        else:
            s_pos, s_neg, n_seen, n_alarms = 0.0, 0.0, 0, 0
        batch_alarms = 0
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="stable")
            vals = pdf[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
            vals = vals[~np.isnan(vals)]
            if sd > 0:
                devs = (vals - mean) / sd
            else:
                devs = np.zeros_like(vals)
            # the sequential fold — already inside an Arrow batch, so a
            # numpy-python loop over the batch's rows for THIS key is
            # the honest cost, not a per-row UDF
            for d in devs:
                s_pos = max(0.0, s_pos + d - kd)
                s_neg = max(0.0, s_neg - d - kd)
                if s_pos > h or s_neg > h:
                    batch_alarms += 1
            n_seen += int(len(vals))
        n_alarms += batch_alarms
        state.update((float(s_pos), float(s_neg), int(n_seen), int(n_alarms)))
        yield pd.DataFrame(
            [
                {
                    key_col: k,
                    "s_pos": float(s_pos),
                    "s_neg": float(s_neg),
                    "n_seen": int(n_seen),
                    "n_alarms": int(n_alarms),
                    "batch_alarms": int(batch_alarms),
                }
            ]
        )

    return (
        stream_df.select(
            key_col, ts_col, F.col(value_col).cast("double").alias(value_col)
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, CUSUM_STATE_FIELDS, "update", GroupStateTimeout.NoTimeout
        )
    )
