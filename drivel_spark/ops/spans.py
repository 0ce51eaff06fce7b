"""Span-level exact deduplication: find (and strip) substrings that
occur more than once across the corpus.

The document-level dedup tiers (ops/dedup.py) drop whole rows; the
span tier instead locates the duplicated REGIONS inside each document
— the ExactSubstr setting of Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better" (public literature), where any
substring of length >= L that appears more than once in the corpus is
marked for removal.  The reference engine (hgrsd/drivel) has no span
operator; this is a beyond-reference training-data tier, same family
as ops/dedup.py.

Distributed shape (NOT the paper's suffix array — that is a
single-machine construction):

1. ``lgram_series``     — one narrow scan; every length-L character
   window of every doc is rolling-hashed in numpy inside an Arrow
   batch (``mapInPandas``, vectorized, no Python per char).  Rows out
   = total corpus characters, the inherent cost of exact span dedup.
2. duplicated hashes    — partial+final count on the 63-bit hash
   (uniform key, skew-free), filtered at ``min_count``.
3. flagged positions    — left-semi join of the series against the
   duplicated-hash set (AQE-planned shuffle join; the dup set is not
   assumed broadcastable at corpus scale).
4. ``duplicate_spans``  — per-doc maximal-span merge as a PURE
   Catalyst gaps-and-islands: lag window over (doc, pos) marks breaks
   where the gap exceeds L, a running sum labels islands, one group-by
   closes [min(pos), max(pos)+L) spans.  Whole-stage codegen, no
   Python; per-doc state is bounded by doc length.
5. ``strip_duplicate_spans`` — rebuilds each doc's text with the
   flagged spans cut out, as a Catalyst ``aggregate`` fold over the
   doc's sorted span list (struct accumulator: bytes consumed so far +
   string built so far).  Zero Python.

Deviation from Lee et al. (documented): the paper keeps ONE occurrence
of each duplicated substring; picking a canonical survivor per maximal
span requires a global arbitrary choice that breaks span maximality
(two overlapping duplicate families can share a span).  This
implementation removes EVERY flagged span — the common practical
variant — and callers who need keep-one semantics should dedup at the
document tier first (ops/dedup.py survivors) and strip spans second.

63-bit hashes (``_MASK63``) so values survive BIGINT round-trips into
the DuckDB oracle, same convention as the winnowing fingerprints
(ops/text.py).  Collisions: at 2^63 a corpus of 10^12 positions has
~3e-6 expected colliding pairs — the false-flag probability is
documented, not hidden, and ``verify=True`` is unnecessary at L >= 15.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import _MASK63, _WINNOW_BASE

__all__ = [
    "lgram_series",
    "duplicate_spans",
    "duplicate_spans_from_series",
    "strip_duplicate_spans",
]


def _raw_lgram_hashes(text: str, L: int) -> np.ndarray:
    """63-bit rolling hash of every L-gram of the RAW text (no
    normalization — span offsets must index the original string so
    ``strip_duplicate_spans`` cuts the right bytes).  Same vectorized
    kernel as ops/text.py ``_kgram_hashes``: codepoint array × base
    powers under uint64 wraparound, masked to 63 bits."""
    s = str(text)
    if len(s) < L:
        return np.empty(0, dtype=np.uint64)
    c = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    powers = np.empty(L, dtype=np.uint64)
    powers[L - 1] = np.uint64(1)
    for j in range(L - 2, -1, -1):
        powers[j] = np.uint64((int(powers[j + 1]) * int(_WINNOW_BASE)) % (1 << 64))
    win = np.lib.stride_tricks.sliding_window_view(c, L)
    return (win * powers[None, :]).sum(axis=1, dtype=np.uint64) & _MASK63


def lgram_series(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    L: int = 20,
) -> DataFrame:
    """(id, pos, h) for every length-L character window of every doc:
    the position table that span dedup (and its independent oracle)
    consumes.  One narrow scan, vectorized per Arrow batch, no
    shuffle.  NULL texts contribute no rows; docs shorter than L
    contribute no rows (nothing to window)."""
    import pandas as pd

    if L < 2:
        raise ValueError(f"L must be >= 2: {L}")

    def gen(batches):
        for pdf in batches:
            # per-doc numpy kernels, per-batch numpy assembly — no
            # per-row Python objects in the (potentially millions-row)
            # lgram stream (guide §4.2)
            doc_ids = pdf[id_col].to_numpy()
            kept_ids, h_arrays, counts = [], [], []
            for did, text in zip(doc_ids, pdf[text_col]):
                if text is None:
                    continue
                h = _raw_lgram_hashes(text, L)
                if len(h):
                    kept_ids.append(did)
                    h_arrays.append(h)
                    counts.append(len(h))
            if not counts:
                yield pd.DataFrame(
                    {
                        id_col: pd.Series([], dtype=pdf[id_col].dtype),
                        "pos": pd.Series([], dtype="int64"),
                        "h": pd.Series([], dtype="int64"),
                    }
                )
                continue
            counts_arr = np.asarray(counts, dtype=np.int64)
            ids_out = np.repeat(np.asarray(kept_ids, dtype=object), counts_arr)
            poss = np.concatenate([np.arange(c, dtype=np.int64) for c in counts])
            hs = np.concatenate(h_arrays).view(np.int64)
            yield pd.DataFrame({id_col: ids_out, "pos": poss, "h": hs})

    id_type = df.schema[id_col].dataType.simpleString()
    from ..io import ensure_map_parallelism

    # unsplittable single-file inputs otherwise run the whole lgram
    # kernel on one task (guide §2.5); no-op when already parallel
    src = ensure_map_parallelism(df.select(id_col, text_col))
    return src.mapInPandas(gen, f"{id_col} {id_type}, pos long, h long")


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    L: int = 20,
    min_count: int = 2,
    cross_doc_only: bool = False,
    series: DataFrame | None = None,
) -> DataFrame:
    """Maximal duplicated spans per document: every position whose
    L-gram occurs >= ``min_count`` times corpus-wide is flagged, and
    runs of flagged positions closer than L merge into one span
    ``[span_start, span_end)`` (character offsets into the raw text).
    Output: (id, span_start, span_end, span_len).

    ``cross_doc_only=True`` counts distinct DOCUMENTS per hash instead
    of occurrences, so within-doc repetition (choruses, boilerplate
    headers repeated inside one file) is not flagged — only text shared
    between documents.

    ``series`` lets a caller reuse an existing :func:`lgram_series`
    result (e.g. one that was also exported for an oracle) instead of
    re-scanning.

    Plan: scan → hash count (partial+final) → left-semi join →
    per-doc lag/sum window → group-by.  The window and the final
    group-by share the (id) shuffle; everything after the Arrow scan
    is whole-stage codegen.
    """
    s = series if series is not None else lgram_series(df, text_col, id_col, L)
    return duplicate_spans_from_series(
        s, id_col=id_col, L=L, min_count=min_count, cross_doc_only=cross_doc_only
    )


def duplicate_spans_from_series(
    series: DataFrame,
    id_col: str = "doc_id",
    L: int = 20,
    min_count: int = 2,
    cross_doc_only: bool = False,
) -> DataFrame:
    """The payload-agnostic half of :func:`duplicate_spans`: given any
    (id, pos, h) window series where each window covers ``[pos,
    pos + L)`` in SOME unit (characters for text, milliseconds for
    audio — ops/multimodal.py ``audio_dup_segments``), flag windows
    whose hash repeats and merge flagged runs closer than L into
    maximal spans.  Count → left-semi flag → gaps-and-islands window →
    span closing, all whole-stage codegen after the series."""
    s = series
    if cross_doc_only:
        dup = (
            s.groupBy("h")
            .agg(F.countDistinct(id_col).alias("n_docs"))
            .filter(F.col("n_docs") >= 2)
            .select("h")
        )
        flagged = s.join(dup, "h", "left_semi")
    else:
        # occurrence-count flag as count-over-window: ONE exchange of
        # the (large) lgram stream on h instead of a groupBy + semi-join
        # that shuffles it twice (r06, guide §2.4); row-identical flags
        flagged = (
            s.withColumn(
                "__occ", F.count(F.lit(1)).over(Window.partitionBy("h"))
            )
            .filter(F.col("__occ") >= min_count)
            .drop("__occ")
        )

    w = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) <= L, F.lit(0)).otherwise(
        F.lit(1)
    )
    run = Window.partitionBy(id_col).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    islands = flagged.withColumn("brk", brk).withColumn(
        "grp", F.sum("brk").over(run)
    )
    return (
        islands.groupBy(id_col, "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(L)).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_len"),
        )
    )


def strip_duplicate_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str | None = None,
) -> DataFrame:
    """Cut every span out of each document's text.  ``spans`` is the
    (id, span_start, span_end) output of :func:`duplicate_spans` —
    disjoint, per-doc.  Docs with no spans pass through unchanged.

    The rebuild is a pure-Catalyst ``aggregate`` fold over the doc's
    sorted span array with a (consumed_upto, built_string) struct
    accumulator: for each span append ``text[upto:start)``, advance
    ``upto`` to ``end``; finish by appending the tail.  ``substring``
    is 1-indexed.  Zero Python; one (id) shuffle for the span
    collect_list, then a left join back to the docs (AQE broadcasts
    the span side when it is small).
    """
    out_col = out_col or text_col
    per_doc = spans.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("_spans")
    )
    joined = df.join(per_doc, id_col, "left")
    fold = F.aggregate(
        F.col("_spans"),
        F.struct(
            F.lit(0).cast("int").alias("upto"),
            F.lit("").alias("acc"),
        ),
        lambda st, sp: F.struct(
            sp["span_end"].cast("int").alias("upto"),
            F.concat(
                st["acc"],
                F.col(text_col).substr(
                    st["upto"] + F.lit(1),
                    sp["span_start"].cast("int") - st["upto"],
                ),
            ).alias("acc"),
        ),
        lambda st: F.concat(
            st["acc"],
            F.col(text_col).substr(
                st["upto"] + 1, F.length(text_col) - st["upto"]
            ),
        ),
    )
    stripped = F.when(F.col("_spans").isNull(), F.col(text_col)).otherwise(fold)
    return joined.withColumn(out_col, stripped).drop("_spans")
