"""Table-level audit operators: join preflight, snapshot churn, and
file-layout health.

These are the checks a validation engine runs BEFORE and BETWEEN the
row-level passes (reference scope: hgrsd/drivel src/infer.rs runs
per-value; these extend the same infer-then-check loop to properties
of whole tables and table *pairs*):

* ``join_cardinality_report`` — exact join-output cardinality and
  explosion risk computed from per-key multiplicities, WITHOUT
  running the join.  At 10^12 rows an unnoticed many-to-many key
  turns a "join two tables" step into 10^15 output rows; the
  preflight costs two count aggregations over keys (map-side partial
  combine, key-sized shuffle) instead.
* ``snapshot_diff`` / ``snapshot_diff_summary`` — added / removed /
  changed / unchanged row accounting between two snapshots of the
  same logical table, shuffling only ``(key, 8-byte content hash)``
  so the compare is narrow regardless of row width.
* ``file_layout_report`` / ``file_layout_summary`` — the small-files
  audit: rows and bytes per physical parquet file plus a recommended
  compaction partition count.  A 100 TB table that is physically
  1e7 × 10 MB files spends its runtime in task scheduling and footer
  reads, not in the query.

Everything is pure Catalyst (whole-stage codegen, partial+final
aggregation); nothing here collects data rows to the driver — the
file listing in ``file_layout_report`` is driver-side *metadata*, the
same listing the planner itself performs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import local_df

# --------------------------------------------------------------------------
# join preflight
# --------------------------------------------------------------------------


def join_key_multiplicity(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Per-key multiplicity table for a prospective equi-join: one row
    per key value present on EITHER side with columns ``n_left``,
    ``n_right`` (0 when absent) and ``n_out = n_left * n_right`` (the
    key's exact inner-join contribution).

    Keys with NULLs are excluded, matching equi-join semantics (a
    NULL key never matches anything, so it contributes 0 output
    rows).  Plan shape: two hash aggregations (partial+final, so a
    hot key is collapsed map-side before the shuffle) and one join of
    two *key-sized* count tables — the data rows themselves are never
    joined or widened.
    """
    keys = [on] if isinstance(on, str) else list(on)
    not_null = None
    for k in keys:
        cond = F.col(k).isNotNull()
        not_null = cond if not_null is None else (not_null & cond)
    lc = left.filter(not_null).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_left")
    )
    rc = right.filter(not_null).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_right")
    )
    m = lc.join(rc, keys, "full_outer").select(
        *keys,
        F.coalesce("n_left", F.lit(0)).alias("n_left"),
        F.coalesce("n_right", F.lit(0)).alias("n_right"),
    )
    return m.withColumn("n_out", F.col("n_left") * F.col("n_right"))


def join_cardinality_report(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    explosion_factor: float = 4.0,
) -> DataFrame:
    """One-row preflight report for an equi-join: exact inner-join
    output cardinality, match coverage on both sides, the worst
    single-key fan-out, and an ``explodes`` flag (output rows >
    ``explosion_factor`` × the larger input).

    Columns: ``n_left_rows, n_right_rows, n_left_keys, n_right_keys,
    n_common_keys, inner_rows, max_key_out, left_matched_rows,
    right_matched_rows, amplification, explodes``.

    ``inner_rows`` is Σ over common keys of (left count × right
    count) — exact, not an estimate, and obtained without
    materialising a single joined row.  ``amplification`` is
    inner_rows / max(input rows); a many-to-many key inflates it
    immediately.  Deciding broadcast-vs-shuffle, pre-aggregation, or
    key-dedup from this one row is the difference between a plan that
    finishes and one that writes 10^15 shuffle rows at corpus scale.
    """
    m = join_key_multiplicity(left, right, on)
    common = (F.col("n_left") > 0) & (F.col("n_right") > 0)
    rep = m.agg(
        F.sum("n_left").cast("long").alias("n_left_rows"),
        F.sum("n_right").cast("long").alias("n_right_rows"),
        F.sum((F.col("n_left") > 0).cast("long")).alias("n_left_keys"),
        F.sum((F.col("n_right") > 0).cast("long")).alias("n_right_keys"),
        F.sum(common.cast("long")).alias("n_common_keys"),
        F.coalesce(F.sum(F.when(common, F.col("n_out"))), F.lit(0))
        .cast("long")
        .alias("inner_rows"),
        F.coalesce(F.max(F.when(common, F.col("n_out"))), F.lit(0))
        .cast("long")
        .alias("max_key_out"),
        F.coalesce(F.sum(F.when(common, F.col("n_left"))), F.lit(0))
        .cast("long")
        .alias("left_matched_rows"),
        F.coalesce(F.sum(F.when(common, F.col("n_right"))), F.lit(0))
        .cast("long")
        .alias("right_matched_rows"),
    )
    bigger = F.greatest("n_left_rows", "n_right_rows")
    return rep.select(
        "*",
        F.round(
            F.when(bigger > 0, F.col("inner_rows") / bigger).otherwise(0.0), 6
        ).alias("amplification"),
        (
            F.col("inner_rows")
            > F.lit(float(explosion_factor)) * bigger
        ).alias("explodes"),
    )


def join_explosion_keys(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    top_k: int = 20,
) -> DataFrame:
    """The ``top_k`` keys by inner-join output contribution — the
    concrete keys to dedup, salt, or drop when
    :func:`join_cardinality_report` flags an explosion.  TakeOrdered
    shape: per-partition top-k then driver merge, never a full sort.
    """
    m = join_key_multiplicity(left, right, on).filter(
        (F.col("n_left") > 0) & (F.col("n_right") > 0)
    )
    keys = [on] if isinstance(on, str) else list(on)
    return m.orderBy(F.col("n_out").desc(), *keys).limit(top_k)


# --------------------------------------------------------------------------
# cross-table aggregate reconciliation
# --------------------------------------------------------------------------


def aggregate_reconcile(
    parent: DataFrame,
    child: DataFrame,
    on: list[str] | str,
    parent_col: str,
    child_expr: Column,
    tol_abs: float = 0.0,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key parent↔child aggregate reconciliation — the classic
    "header total equals sum of line items" check (reference scope:
    drivel validates per-value; this extends the same pass-2 loop to a
    cross-table INVARIANT).  For every key on either side, compares the
    parent's stored aggregate (``parent_col``) against the sum of
    ``child_expr`` over the child's rows for that key:

    * ``ok``            — both present, |parent − child| ≤ ``tol_abs``
    * ``mismatch``      — both present, difference beyond tolerance
    * ``missing_child`` — parent row with NO child rows (sum undefined)
    * ``orphan_child``  — child rows whose key has no parent row

    Returns one row per key: keys, ``carry_cols`` (parent passthrough
    columns for slicing the report), ``parent_value``, ``child_value``,
    ``abs_diff`` (NULL when a side is missing), ``recon_status``.

    Plan shape at 10^12 rows: the child side collapses to one row per
    key BEFORE the join (partial+final sum, map-side combine absorbs
    hot keys), then a key-co-partitioned sort-merge full-outer join of
    two key-sized tables — the wide child rows are never joined, and
    AQE converts to broadcast when either aggregate side is small.
    Parent keys are assumed unique (validate with
    ``candidate_key_report`` first); duplicate parent keys each emit
    their own row against the same child sum.
    """
    keys = [on] if isinstance(on, str) else list(on)
    carry = list(carry_cols or [])
    not_null = None
    for k in keys:
        cond = F.col(k).isNotNull()
        not_null = cond if not_null is None else (not_null & cond)
    # NULL child keys never equi-join a parent: drop them instead of
    # letting the NULL group surface as a spurious orphan_child row
    agg = child.filter(not_null).groupBy(*keys).agg(
        child_expr.alias("child_value")
    )
    p = parent.select(
        *keys, *carry, F.col(parent_col).alias("parent_value"),
        F.lit(True).alias("_has_parent"),
    )
    j = p.join(agg.withColumn("_has_child", F.lit(True)), keys, "full_outer")
    diff = F.abs(F.col("parent_value") - F.col("child_value"))
    status = (
        F.when(F.col("_has_parent").isNull(), F.lit("orphan_child"))
        .when(F.col("_has_child").isNull(), F.lit("missing_child"))
        .when(diff <= F.lit(float(tol_abs)), F.lit("ok"))
        .otherwise(F.lit("mismatch"))
    )
    return j.select(
        *keys, *carry, "parent_value", "child_value",
        F.when(
            F.col("_has_parent").isNotNull() & F.col("_has_child").isNotNull(),
            diff,
        ).alias("abs_diff"),
        status.alias("recon_status"),
    )


def reconcile_summary(
    report: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Status counts over an :func:`aggregate_reconcile` report,
    optionally sliced by ``group_cols`` (carry columns), with an
    integer decade histogram of the mismatch magnitudes
    (``n_diff_lt_1`` / ``1–1e3`` / ``≥1e3``) — boundary-safe integer
    outputs only, so two engines computing float sums in different
    orders still agree exactly."""
    grp = list(group_cols or [])
    mism = F.col("recon_status") == "mismatch"
    return (
        report.groupBy(*grp, "recon_status")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum((mism & (F.col("abs_diff") < 1.0)).cast("long"))
            .alias("n_diff_lt_1"),
            F.sum(
                (mism & (F.col("abs_diff") >= 1.0) & (F.col("abs_diff") < 1e3))
                .cast("long")
            ).alias("n_diff_1_to_1e3"),
            F.sum((mism & (F.col("abs_diff") >= 1e3)).cast("long"))
            .alias("n_diff_ge_1e3"),
        )
    )


# --------------------------------------------------------------------------
# cross-modal consistency (audio payload ↔ transcript)
# --------------------------------------------------------------------------


def cross_modal_consistency(
    df: DataFrame,
    bytes_col: str = "bytes",
    text_col: str = "transcript",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Per-clip audio↔transcript consistency report — the labeling-error
    check for paired-modality corpora: if two rows carry byte-identical
    audio but different transcripts, at most one label can be right
    (``conflicting_transcript``); rows sharing a transcript across
    different audio payloads are flagged softer
    (``recycled_transcript`` — legitimate for common phrases, but a
    spike means transcript recycling upstream).

    Emits one row per input row: ``audio_key`` (md5 of the payload),
    ``text_key`` (md5 of the transcript, NULL for NULL transcripts),
    ``n_same_audio`` (rows sharing this payload), ``n_texts_in_group``
    (distinct non-NULL transcripts among them), ``n_audios_for_text``
    (distinct payloads sharing this transcript; NULL for NULL
    transcripts), and the two boolean flags.

    Scale shape: everything is pure Catalyst — md5 in codegen, two
    partial+final aggregations keyed on the 16-byte digests (payload
    bytes are hashed in the scan projection and never shuffle), and
    two key-co-partitioned joins of digest-sized tables back onto the
    digest rows.  No decode, no Python, no wide shuffle at any scale.
    """
    ids = id_cols or ["clip_id"]
    audio_key = F.md5(F.col(bytes_col)).alias("audio_key")
    text_key = F.when(
        F.col(text_col).isNotNull(), F.md5(F.encode(F.col(text_col), "UTF-8"))
    ).alias("text_key")
    base = df.select(*ids, audio_key, text_key)
    ag = base.groupBy("audio_key").agg(
        F.count(F.lit(1)).alias("n_same_audio"),
        F.countDistinct("text_key").alias("n_texts_in_group"),
    )
    tg = (
        base.filter(F.col("text_key").isNotNull())
        .groupBy("text_key")
        .agg(F.countDistinct("audio_key").alias("n_audios_for_text"))
    )
    rep = base.join(ag, "audio_key").join(tg, "text_key", "left")
    return rep.select(
        *ids, "audio_key", "text_key", "n_same_audio", "n_texts_in_group",
        "n_audios_for_text",
        ((F.col("n_same_audio") > 1) & (F.col("n_texts_in_group") > 1))
        .alias("conflicting_transcript"),
        F.when(
            F.col("text_key").isNotNull(), F.col("n_audios_for_text") > 1
        ).alias("recycled_transcript"),
    )


def cross_modal_summary(report: DataFrame) -> DataFrame:
    """One-row rollup of :func:`cross_modal_consistency`: clip and
    audio-group totals, duplicate-audio and conflicting-group counts,
    and the clip-level flag tallies."""
    return report.agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.countDistinct("audio_key").alias("n_audio_groups"),
        F.countDistinct(
            F.when(F.col("n_same_audio") > 1, F.col("audio_key"))
        ).alias("n_dup_audio_groups"),
        F.countDistinct(
            F.when(F.col("conflicting_transcript"), F.col("audio_key"))
        ).alias("n_conflicting_groups"),
        F.sum(F.col("conflicting_transcript").cast("long"))
        .alias("n_conflicting_clips"),
        F.sum(F.coalesce(F.col("recycled_transcript"), F.lit(False))
              .cast("long")).alias("n_recycled_clips"),
        F.sum(F.col("text_key").isNull().cast("long"))
        .alias("n_missing_transcript"),
    )


# --------------------------------------------------------------------------
# snapshot churn
# --------------------------------------------------------------------------

_STATUSES = ("added", "removed", "changed", "unchanged")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str] | str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level churn between two snapshots of the same logical
    table: one output row per key present in either snapshot, with
    ``status`` ∈ {added, removed, changed, unchanged}.

    ``compare_cols`` defaults to every shared non-key column.  Each
    side is first projected to ``(key, content_hash)`` where the hash
    is ``xxhash64(to_json(struct(compare_cols)))`` with null fields
    KEPT in the JSON — so the full-outer compare shuffles ~16 bytes
    per row no matter how wide the table is, and ``(NULL, 'a')``
    never collides with ``('a', NULL)`` the way bare multi-arg
    ``xxhash64`` would (it skips null arguments).  Change detection
    is hash equality: an undetected change requires a 64-bit
    collision.

    Duplicate keys within a snapshot are collapsed by hash-of-multiset
    (sum of per-row hashes per key), so re-ordered duplicates compare
    equal and the op never explodes on a many-to-many self-pairing.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    if not compare_cols:
        raise ValueError("snapshot_diff: no columns to compare")

    def side(df: DataFrame, tag: str) -> DataFrame:
        h = F.xxhash64(
            F.to_json(
                F.struct(*[F.col(c) for c in compare_cols]),
                {"ignoreNullFields": "false"},
            )
        )
        # multiset hash = SUM of per-row hashes, accumulated in
        # decimal(38,0): order-insensitive, duplicate-sensitive (unlike
        # XOR, where a duplicated row cancels itself out), and immune
        # to ANSI long-overflow up to ~1e19 rows per key
        return df.groupBy(*keys).agg(
            F.sum(h.cast("decimal(38,0)")).alias(f"{tag}_hash"),
            F.count(F.lit(1)).alias(f"{tag}_rows"),
        )

    o = side(old, "old")
    n = side(new, "new")
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(
            (F.col("old_hash") == F.col("new_hash"))
            & (F.col("old_rows") == F.col("new_rows")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, status.alias("status"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str] | str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """One-row churn summary: ``n_added, n_removed, n_changed,
    n_unchanged, churn_ratio`` where churn_ratio = (added + removed +
    changed) / keys-in-new-snapshot (0.0 when the new snapshot is
    empty).  The number an incremental-ingest validation gates on:
    a corpus refresh that silently rewrites 40% of its rows is a
    pipeline bug long before any per-row check fires."""
    d = snapshot_diff(old, new, key_cols, compare_cols)
    agg = d.agg(
        *[
            F.sum((F.col("status") == s).cast("long")).alias(f"n_{s}")
            for s in _STATUSES
        ]
    )
    n_new = F.col("n_added") + F.col("n_changed") + F.col("n_unchanged")
    churned = F.col("n_added") + F.col("n_removed") + F.col("n_changed")
    return agg.select(
        "*",
        F.round(
            F.when(n_new > 0, churned / n_new).otherwise(0.0), 6
        ).alias("churn_ratio"),
    )


# --------------------------------------------------------------------------
# file-layout health
# --------------------------------------------------------------------------


def file_layout_report(spark: SparkSession, path: str) -> DataFrame:
    """Per-physical-file layout table for a parquet dataset: one row
    per file with ``file`` (basename), ``n_rows``, and ``bytes``.

    Row counts come from one narrow scan grouped by
    ``input_file_name()`` (metadata-only column, no data read beyond
    what the count needs); byte sizes come from the same recursive
    Hadoop FileSystem listing the planner performs — driver-side
    metadata, O(#files), never row data.  Works against any Hadoop
    filesystem (local, HDFS, s3a) because it goes through the
    FileSystem API rather than ``os``.
    """
    rows = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file_uri"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.element_at(F.split("file_uri", "/"), -1).alias("file"), "n_rows"
        )
    )
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    sizes = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            sizes.append((name, int(st.getLen())))
    size_df = local_df(spark, sizes, "file string, bytes long")
    return rows.join(F.broadcast(size_df), "file", "left")


def file_layout_summary(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 512,
    small_file_mb: int = 32,
) -> DataFrame:
    """One-row small-files audit: ``n_files, n_rows, total_bytes,
    min_file_bytes, max_file_bytes, avg_file_bytes, n_small_files,
    small_file_ratio, recommended_files``.

    ``recommended_files = ceil(total_bytes / target_file_mb)`` is the
    ``repartition(n)`` / ``coalesce(n)`` argument that compacts the
    dataset to the target file size — the standard remedy once
    ``small_file_ratio`` crosses ~0.5.  At 100 TB the difference
    between 10 MB and 512 MB files is ~10^7 extra tasks and footer
    reads per full scan."""
    rep = file_layout_report(spark, path)
    small = F.lit(int(small_file_mb) * 1024 * 1024)
    agg = rep.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum("bytes").cast("long").alias("total_bytes"),
        F.min("bytes").cast("long").alias("min_file_bytes"),
        F.max("bytes").cast("long").alias("max_file_bytes"),
        F.round(F.avg("bytes"), 1).alias("avg_file_bytes"),
        F.sum((F.col("bytes") < small).cast("long")).alias("n_small_files"),
    )
    return agg.select(
        "*",
        F.round(
            F.when(
                F.col("n_files") > 0, F.col("n_small_files") / F.col("n_files")
            ).otherwise(0.0),
            6,
        ).alias("small_file_ratio"),
        F.greatest(
            F.lit(1),
            F.ceil(
                F.col("total_bytes") / F.lit(int(target_file_mb) * 1024 * 1024)
            ),
        )
        .cast("long")
        .alias("recommended_files"),
    )

# --------------------------------------------------------------------------
# functional-dependency / candidate-key discovery
# --------------------------------------------------------------------------


def fd_report(
    df: DataFrame,
    dependencies: list[tuple],
) -> DataFrame:
    """Approximate-functional-dependency audit: for each ``(lhs, rhs)``
    in ``dependencies`` (lhs a column name or list of names, rhs one
    column), does lhs → rhs hold, and how badly is it violated?

    One output row per dependency: ``lhs, rhs, n_groups,
    n_violating_groups, n_violating_rows, violation_ratio, holds``.
    A group (= one distinct lhs value, NULL-lhs rows excluded) violates
    when it maps to more than one rhs value; a NULL rhs counts as its
    own value, so a group that is sometimes labeled and sometimes not
    IS a violation — the same convention the reference's enum/null
    tracking uses for "required" (reference scope: hgrsd/drivel
    src/infer.rs tracks seen-null per key; this lifts the idea to
    cross-column invariants).  ``violation_ratio`` is violating rows /
    rows with non-NULL lhs.

    Why it matters at corpus scale: "codec determines container
    sample layout", "clip_id determines transcript" are the invariants
    a training pipeline silently assumes; an FD audit turns each
    assumption into one number per ingest.  Plan shape per dependency:
    one hash aggregation on lhs (partial+final; ``count(distinct)``
    inside ``groupBy`` is Spark's two-phase expand, map-side combined)
    then an O(groups)→1 rollup; the dependencies are independent
    single-shuffle jobs unioned at the end — no data row is ever
    joined or widened.
    """
    reports = []
    for lhs, rhs in dependencies:
        lhs_cols = [lhs] if isinstance(lhs, str) else list(lhs)
        not_null = None
        for k in lhs_cols:
            cond = F.col(k).isNotNull()
            not_null = cond if not_null is None else (not_null & cond)
        # NULL-distinguishing distinct count: countDistinct ignores
        # NULLs, so add 1 when the group contains any NULL rhs
        per_group = (
            df.filter(not_null)
            .groupBy(*lhs_cols)
            .agg(
                (
                    F.countDistinct(rhs)
                    + F.max(F.col(rhs).isNull().cast("int"))
                ).alias("n_rhs"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )
        viol = F.col("n_rhs") > 1
        rep = per_group.agg(
            F.lit("+".join(lhs_cols)).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.coalesce(F.sum(viol.cast("long")), F.lit(0))
            .cast("long")
            .alias("n_violating_groups"),
            F.coalesce(F.sum(F.when(viol, F.col("n_rows"))), F.lit(0))
            .cast("long")
            .alias("n_violating_rows"),
            F.sum("n_rows").cast("long").alias("_n_total"),
        )
        reports.append(rep)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "lhs",
        "rhs",
        "n_groups",
        "n_violating_groups",
        "n_violating_rows",
        F.round(
            F.when(
                F.col("_n_total") > 0,
                F.col("n_violating_rows") / F.col("_n_total"),
            ).otherwise(0.0),
            6,
        ).alias("violation_ratio"),
        (F.col("n_violating_groups") == 0).alias("holds"),
    )


def candidate_key_report(
    df: DataFrame,
    candidates: list,
    confirm_threshold: float = 0.9,
) -> DataFrame:
    """Candidate-key discovery with the sketch-then-exact-confirm
    discipline (the same two-pass shape the engine's clip_id
    uniqueness check uses: HLL screen, exact hash-repartition confirm
    only when the screen says "maybe").

    ``candidates`` is a list of column names or column-name lists.
    Pass 1 computes ``approx_count_distinct`` for EVERY candidate in a
    single scan (one partial+final aggregation, no data shuffle — the
    sketches merge map-side).  Pass 2 runs the exact groupBy count
    ONLY for candidates whose approx distinct ratio ≥
    ``confirm_threshold``; hopeless candidates never pay a shuffle.
    ``confirm_threshold=0.0`` forces exact confirmation of every
    candidate (deterministic mode, used by the contract query so the
    oracle needn't replicate Spark's HLL).

    One row per candidate: ``key, n_rows, approx_distinct, n_distinct,
    n_dup_keys, n_dup_rows, is_key``.  ``n_distinct`` and the dup
    columns are NULL for unconfirmed candidates; ``is_key`` is FALSE
    for them (an unconfirmed candidate is not a key claim).  Rows with
    any NULL in the candidate columns are excluded from that
    candidate's accounting (SQL keys are non-NULL).
    """
    cand_cols = [[c] if isinstance(c, str) else list(c) for c in candidates]
    names = ["+".join(c) for c in cand_cols]
    approx_aggs = [F.count(F.lit(1)).alias("_n_all")]
    for name, cols in zip(names, cand_cols):
        nn = None
        for k in cols:
            cond = F.col(k).isNotNull()
            nn = cond if nn is None else (nn & cond)
        tup = F.when(nn, F.struct(*[F.col(k) for k in cols]))
        approx_aggs.append(F.approx_count_distinct(tup).alias(f"_ad_{name}"))
        approx_aggs.append(F.sum(nn.cast("long")).alias(f"_nn_{name}"))
    screen = df.agg(*approx_aggs).first()

    spark = df.sparkSession
    rows = []
    for name, cols in zip(names, cand_cols):
        n_rows = int(screen[f"_nn_{name}"] or 0)
        approx = int(screen[f"_ad_{name}"] or 0)
        ratio = (approx / n_rows) if n_rows else 0.0
        rows.append((name, cols, n_rows, approx, ratio))

    exact_parts = []
    for name, cols, n_rows, approx, ratio in rows:
        base = local_df(
            spark,
            [(name, n_rows, approx)],
            "key string, n_rows long, approx_distinct long",
        )
        if n_rows and ratio >= confirm_threshold:
            nn = None
            for k in cols:
                cond = F.col(k).isNotNull()
                nn = cond if nn is None else (nn & cond)
            per_key = df.filter(nn).groupBy(*cols).agg(
                F.count(F.lit(1)).alias("_n")
            )
            dup = F.col("_n") > 1
            ex = per_key.agg(
                F.lit(name).alias("key"),
                F.count(F.lit(1)).cast("long").alias("n_distinct"),
                F.sum(dup.cast("long")).cast("long").alias("n_dup_keys"),
                F.coalesce(F.sum(F.when(dup, F.col("_n"))), F.lit(0))
                .cast("long")
                .alias("n_dup_rows"),
            )
            part = base.join(F.broadcast(ex), "key", "left").withColumn(
                "is_key",
                (F.col("n_dup_keys") == 0) & (F.col("n_rows") > 0),
            )
        else:
            part = base.select(
                "*",
                F.lit(None).cast("long").alias("n_distinct"),
                F.lit(None).cast("long").alias("n_dup_keys"),
                F.lit(None).cast("long").alias("n_dup_rows"),
                F.lit(False).alias("is_key"),
            )
        exact_parts.append(
            part.select(
                "key", "n_rows", "approx_distinct", "n_distinct",
                "n_dup_keys", "n_dup_rows", "is_key",
            )
        )
    out = exact_parts[0]
    for p in exact_parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# file clustering (zone-map / data-skipping effectiveness)
# --------------------------------------------------------------------------


def file_clustering_report(
    spark: SparkSession, path: str, col: str
) -> DataFrame:
    """Per-physical-file zone map for ``col``: one row per parquet
    file with ``file, min_v, max_v, n_rows`` (values cast to double).
    This is exactly the min/max statistic Iceberg/parquet footers
    carry per file — the input to every data-skipping decision — so
    auditing it tells you whether a point/range predicate on ``col``
    can prune files at all.  One narrow scan grouped by
    ``input_file_name()``; NULLs in ``col`` don't contribute to the
    zone (a file of all-NULL ``col`` reports NULL min/max).
    """
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file_uri"))
        .agg(
            F.min(F.col(col).cast("double")).alias("min_v"),
            F.max(F.col(col).cast("double")).alias("max_v"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.element_at(F.split("file_uri", "/"), -1).alias("file"),
            "min_v",
            "max_v",
            "n_rows",
        )
    )


def file_clustering_summary(
    spark: SparkSession, path: str, col: str
) -> DataFrame:
    """One-row clustering-health summary for ``col`` over a parquet
    dataset: ``n_files, n_rows, max_point_depth, overlapping_pairs,
    perfectly_clustered``.

    ``max_point_depth`` = the most files any single value of ``col``
    can live in = the number of files a point-lookup predicate must
    read after zone-map pruning (1 ⇔ perfect clustering, n_files ⇔
    the column is useless for skipping).  ``overlapping_pairs`` = how
    many file pairs have intersecting [min, max] ranges (0 ⇔ totally
    ordered zones).  At 100 TB this single row is the difference
    between a point query that opens 1 file and one that opens 10^5:
    it is the metric an OPTIMIZE/cluster-by maintenance job gates on.

    Both numbers come from one boundary sweep: each file contributes a
    (+1 at min_v) and a (−1 just after max_v) event; a running sum
    over the 2·n_files events (ordered by value, starts before ends at
    ties — ranges are inclusive) gives the depth at every boundary.
    ``overlapping_pairs`` = Σ over start events of (depth_incl − 1),
    which is tie-order-invariant within equal values.  The sweep is a
    window over *metadata-sized* input (2 rows per file), so the
    single-partition sort is O(#files log #files), never row data.
    """
    rep = file_clustering_report(spark, path, col).filter(
        F.col("min_v").isNotNull()
    )
    starts = rep.select(
        F.col("min_v").alias("v"), F.lit(0).alias("tb"), F.lit(1).alias("delta")
    )
    ends = rep.select(
        F.col("max_v").alias("v"), F.lit(1).alias("tb"), F.lit(-1).alias("delta")
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy("v", "tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = (
        starts.unionByName(ends)
        .withColumn("depth_incl", F.sum("delta").over(w))
    )
    sweep_agg = swept.agg(
        F.coalesce(
            F.max(F.when(F.col("tb") == 0, F.col("depth_incl"))), F.lit(0)
        )
        .cast("long")
        .alias("max_point_depth"),
        F.coalesce(
            F.sum(F.when(F.col("tb") == 0, F.col("depth_incl") - 1)),
            F.lit(0),
        )
        .cast("long")
        .alias("overlapping_pairs"),
    )
    totals = rep.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("n_rows").cast("long").alias("n_rows"),
    )
    return totals.crossJoin(F.broadcast(sweep_agg)).select(
        "*",
        (F.col("overlapping_pairs") == 0).alias("perfectly_clustered"),
    )


# --------------------------------------------------------------------------
# violation slice attribution
# --------------------------------------------------------------------------


def violation_slice_report(
    df: DataFrame,
    flag,
    dims,
    max_order: int = 2,
    min_rows: int = 1,
) -> DataFrame:
    """Which SLICE of the table concentrates the violations?  The step
    after a validation pass (reference scope: hgrsd/drivel's check loop
    reports pass/fail per value, src/infer.rs; this attributes the
    failures): given a per-row violation predicate ``flag`` (Column or
    SQL string) and candidate ``dims`` (e.g. codec, sr_hz bucket,
    ingest day), score every dimension combination of order
    1..``max_order`` by how much MORE it violates than the table does
    overall — the SliceFinder-style triage that turns "6,335 violation
    rows" into "codec='amr' x sr_hz=8000 carries 92% of them".

    Output: one row per slice — the ``dims`` columns (NULL where the
    slice aggregates a dim away), a ``g_<dim>`` 0/1 flag per dim (1 =
    aggregated out, disambiguating a genuine NULL dim value from
    "any"), ``slice_order`` (how many dims the slice binds),
    ``n_rows``, ``n_viol``, ``viol_rate``, the table-wide
    ``base_rate``, ``lift`` (rate/base, NULL when base is 0) and
    ``excess`` (n_viol − n_rows·base_rate — the count of violations
    this slice contributes beyond its fair share; additive, so it
    ranks big-and-bad above tiny-but-perfectly-bad, which pure lift
    inverts).

    Scale shape: ONE pass — explicit GROUPING SETS of exactly the
    orders 1..``max_order`` plus the grand total (a naive ``cube``
    would expand all 2^d sets and, because the order filters push
    below the partial aggregation, Catalyst would plan the total and
    the slices as TWO scans of the source; measured on the plan).
    The expand multiplies rows by the number of kept sets only,
    feeding a partial+final COUNT aggregation that is skew-immune
    because hot slices collapse map-side.  The aggregated result —
    O(#slices), report-sized — is persisted; the grand-total row that
    anchors ``base_rate`` is read from it with a single-row ``first()``
    (driver-bounded O(1), the same bounded-collect discipline as
    selection.exact_quantile — a broadcast self-join was tried and
    rejected: DeduplicateRelations re-IDs the join's right side, the
    cache lookup misses, and the total recomputes from a SECOND file
    scan) and injected as a literal, so the slice arithmetic is pure
    codegen over the cached table.  The op is therefore eager: the one
    aggregation pass runs at call time.
    """
    import itertools

    dims = list(dims)
    flag_col = F.expr(flag) if isinstance(flag, str) else flag
    src = df.select(
        *dims, flag_col.cast("boolean").alias("__viol")
    )
    sets = [[]] + [
        list(combo)
        for k in range(1, min(int(max_order), len(dims)) + 1)
        for combo in itertools.combinations(dims, k)
    ]
    grouped = (
        src.groupingSets(sets, *dims)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(
                F.sum(F.col("__viol").cast("long")), F.lit(0)
            ).alias("n_viol"),
            *[F.grouping(c).cast("int").alias(f"g_{c}") for c in dims],
        )
    )
    order_expr = F.lit(len(dims))
    for c in dims:
        order_expr = order_expr - F.col(f"g_{c}")
    grouped = grouped.withColumn(
        "slice_order", order_expr.cast("int")
    ).persist()
    total = grouped.where(F.col("slice_order") == 0).first()
    t_rows = int(total["n_rows"]) if total is not None else 0
    t_viol = int(total["n_viol"]) if total is not None else 0
    # float(int)/float(int) is the same IEEE-754 division both Spark
    # and any ANSI oracle perform on CAST(viol AS DOUBLE)/rows
    base = float(t_viol) / float(t_rows) if t_rows else 0.0
    slices = grouped.where(
        (F.col("slice_order") >= 1)
        & (F.col("slice_order") <= int(max_order))
        & (F.col("n_rows") >= int(min_rows))
    )
    viol_rate = F.col("n_viol").cast("double") / F.col("n_rows")
    return (
        slices.withColumn("viol_rate", viol_rate)
        .withColumn("base_rate", F.lit(base))
        .withColumn(
            "lift",
            F.when(
                F.col("base_rate") > 0, F.col("viol_rate") / F.col("base_rate")
            ),
        )
        .withColumn(
            "excess",
            F.col("n_viol").cast("double")
            - F.col("n_rows") * F.col("base_rate"),
        )
    )


def top_violation_slices(report: DataFrame, k: int = 20) -> DataFrame:
    """Deterministic top-``k`` of a :func:`violation_slice_report` (or
    :func:`constraint_slice_report`) by contributed excess violations
    (desc), tie-broken by the constraint name when present, then the
    grouping flags, then the dim values (NULLS FIRST, matching the
    flags).  Plans as TakeOrdered — no global sort."""
    dims = [c[2:] for c in report.columns if c.startswith("g_")]
    ties = ["constraint"] if "constraint" in report.columns else []
    return report.orderBy(
        F.desc("excess"),
        *ties,
        *[F.col(f"g_{c}") for c in dims],
        *[F.col(c).asc_nulls_first() for c in dims],
    ).limit(k)


def _slice_counts(df: DataFrame, dims, max_order: int) -> DataFrame:
    """Grouping-sets count table shared by the slice-attribution ops:
    one row per slice of order 0..max_order with ``n, g_<dim>...,
    slice_order``.  Persisted (O(#slices), report-sized)."""
    import itertools

    sets = [[]] + [
        list(combo)
        for k in range(1, min(int(max_order), len(dims)) + 1)
        for combo in itertools.combinations(dims, k)
    ]
    out = (
        df.groupingSets(sets, *dims)
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[F.grouping(c).cast("int").alias(f"g_{c}") for c in dims],
        )
    )
    order_expr = F.lit(len(dims))
    for c in dims:
        order_expr = order_expr - F.col(f"g_{c}")
    return out.withColumn("slice_order", order_expr.cast("int")).persist()


def violation_slice_report_from_tables(
    full_df: DataFrame,
    viol_df: DataFrame,
    dims,
    max_order: int = 2,
    min_rows: int = 1,
) -> DataFrame:
    """:func:`violation_slice_report` when the violating rows already
    exist as their own table (the shape a validation pass hands you —
    ``validate().violations`` carries the keep-columns, so the dims
    ride along for free) and re-evaluating the row predicate on the
    full table would repeat expensive work (the audio-SNR decode
    tier).  Row-for-row identical to
    ``violation_slice_report(full_df, flag, dims)`` when ``viol_df ==
    full_df.where(flag)`` (pinned by test).

    Scale shape: TWO grouping-sets COUNT aggregations — one over a
    dims-only projection of the full table (narrow scan; the payload
    column is never read), one over the violation table — each
    persisted at O(#slices), then a null-safe equi-join of the two
    slice tables at slice granularity.  Nothing data-sized shuffles
    beyond the two counting exchanges; base rates come from the two
    grand-total rows via single-row ``first()`` (driver-bounded).
    """
    dims = list(dims)
    den = _slice_counts(full_df.select(*dims), dims, max_order)
    num = _slice_counts(viol_df.select(*dims), dims, max_order)
    t_den = den.where(F.col("slice_order") == 0).first()
    t_num = num.where(F.col("slice_order") == 0).first()
    t_rows = int(t_den["n"]) if t_den is not None else 0
    t_viol = int(t_num["n"]) if t_num is not None else 0
    base = float(t_viol) / float(t_rows) if t_rows else 0.0
    den_s = den.where(
        (F.col("slice_order") >= 1) & (F.col("n") >= int(min_rows))
    )
    num_s = num.where(F.col("slice_order") >= 1).select(
        *dims,
        *[F.col(f"g_{c}").alias(f"__ng_{c}") for c in dims],
        F.col("n").alias("__n_viol"),
    )
    cond = None
    for c in dims:
        clause = F.col(f"den.{c}").eqNullSafe(F.col(f"num.{c}")) & (
            F.col(f"den.g_{c}") == F.col(f"num.__ng_{c}")
        )
        cond = clause if cond is None else (cond & clause)
    joined = (
        den_s.alias("den")
        .join(num_s.alias("num"), cond, "left")
        .select(
            *[F.col(f"den.{c}").alias(c) for c in dims],
            *[F.col(f"den.g_{c}").alias(f"g_{c}") for c in dims],
            F.col("den.slice_order").alias("slice_order"),
            F.col("den.n").alias("n_rows"),
            F.coalesce(F.col("num.__n_viol"), F.lit(0)).alias("n_viol"),
        )
    )
    viol_rate = F.col("n_viol").cast("double") / F.col("n_rows")
    return (
        joined.withColumn("viol_rate", viol_rate)
        .withColumn("base_rate", F.lit(base))
        .withColumn(
            "lift",
            F.when(
                F.col("base_rate") > 0, F.col("viol_rate") / F.col("base_rate")
            ),
        )
        .withColumn(
            "excess",
            F.col("n_viol").cast("double")
            - F.col("n_rows") * F.col("base_rate"),
        )
    )


def constraint_slice_report(
    full_df: DataFrame,
    viol_df: DataFrame,
    dims,
    failed_col: str = "failed",
    max_order: int = 2,
    min_rows: int = 1,
) -> DataFrame:
    """Per-CONSTRAINT slice attribution: the violations table that
    ``validate()`` emits carries the list of failed constraints per
    row (``failed_col``, array<string>), so one report can answer
    "codec='amr' concentrates the SNR failures while shard 7
    concentrates the uniqueness ones" — lift/excess computed per
    (constraint, slice) against that CONSTRAINT's own table-wide base
    rate, not the pooled any-violation rate (a rare constraint's hot
    slice would drown in the pooled base).

    Output adds a leading ``constraint`` column to the
    :func:`violation_slice_report` schema.

    Scale shape: denominators are the same persisted grouping-sets
    count table (dims-only narrow scan of the full table).
    Numerators explode ``failed_col`` (bounded fan-out: ≤ #constraints
    per violating row, and violating rows are the rare ones) into
    grouping sets that ALWAYS bind the constraint name — so per-set
    cardinality stays #constraints × slices.  Per-constraint totals
    are the numerator's order-0 rows, driver-bounded O(#constraints),
    folded back in as a broadcast-joined literal table; everything
    else is the null-safe slice-granularity join of two report-sized
    tables.
    """
    import itertools

    dims = list(dims)
    den = _slice_counts(full_df.select(*dims), dims, max_order)
    t_den = den.where(F.col("slice_order") == 0).first()
    t_rows = int(t_den["n"]) if t_den is not None else 0

    exploded = viol_df.select(
        F.explode(F.col(failed_col)).alias("constraint"), *dims
    )
    sets = [["constraint"]] + [
        ["constraint"] + list(combo)
        for k in range(1, min(int(max_order), len(dims)) + 1)
        for combo in itertools.combinations(dims, k)
    ]
    num = (
        exploded.groupingSets(sets, "constraint", *dims)
        .agg(
            F.count(F.lit(1)).alias("__n_viol"),
            *[F.grouping(c).cast("int").alias(f"__ng_{c}") for c in dims],
        )
    )
    order_expr = F.lit(len(dims))
    for c in dims:
        order_expr = order_expr - F.col(f"__ng_{c}")
    num = num.withColumn("__order", order_expr.cast("int")).persist()

    # per-constraint table-wide violation totals: O(#constraints) rows
    totals = {
        r["constraint"]: int(r["__n_viol"])
        for r in num.where(F.col("__order") == 0).collect()
    }
    base_map = F.create_map(
        *[
            x
            for c, v in sorted(totals.items())
            for x in (
                F.lit(c),
                F.lit(float(v) / float(t_rows) if t_rows else 0.0),
            )
        ]
    )

    den_s = den.where(
        (F.col("slice_order") >= 1) & (F.col("n") >= int(min_rows))
    )
    num_s = num.where(F.col("__order") >= 1)
    cond = None
    for c in dims:
        clause = F.col(f"den.{c}").eqNullSafe(F.col(f"num.{c}")) & (
            F.col(f"den.g_{c}") == F.col(f"num.__ng_{c}")
        )
        cond = clause if cond is None else (cond & clause)
    joined = (
        num_s.alias("num")
        .join(den_s.alias("den"), cond, "inner")
        .select(
            F.col("num.constraint").alias("constraint"),
            *[F.col(f"den.{c}").alias(c) for c in dims],
            *[F.col(f"den.g_{c}").alias(f"g_{c}") for c in dims],
            F.col("den.slice_order").alias("slice_order"),
            F.col("den.n").alias("n_rows"),
            F.col("num.__n_viol").alias("n_viol"),
        )
    )
    viol_rate = F.col("n_viol").cast("double") / F.col("n_rows")
    return (
        joined.withColumn("viol_rate", viol_rate)
        .withColumn("base_rate", base_map[F.col("constraint")])
        .withColumn(
            "lift",
            F.when(
                F.col("base_rate") > 0, F.col("viol_rate") / F.col("base_rate")
            ),
        )
        .withColumn(
            "excess",
            F.col("n_viol").cast("double")
            - F.col("n_rows") * F.col("base_rate"),
        )
    )
