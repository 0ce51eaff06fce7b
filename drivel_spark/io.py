"""Table access: Iceberg-first, parquet fallback.

The north_rule targets Iceberg tables of audio clips.  This sandbox
ships no iceberg-spark-runtime jar, so the engine keeps all table
access behind :func:`read_table` / :func:`write_table`: catalog table
references (``iceberg:db.clips`` or any dotted ``catalog.db.tbl``) use
the Spark catalog — which is Iceberg when the runtime jar + catalog
conf are present — and plain paths read parquet with an identical
schema.  Engine code (profiler, constraints, checkpoint) never touches
the format directly, so an Iceberg deployment is a conf change, not a
code change.

Iceberg-specific scale features the engine relies on when present:

* snapshot ids — the checkpoint store keys resume lineage on an input
  snapshot fingerprint; with Iceberg this is the table's
  ``snapshot_id()`` instead of the file-listing digest used for
  parquet (drivel_spark/checkpoint/store.py);
* partition pruning + column pruning via DSv2 pushdown (identical to
  the parquet path — Catalyst handles both);
* time travel (``VERSION AS OF``) for drift baselines pinned to a
  snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_table_ref(ref: str) -> bool:
    """Catalog table reference (vs filesystem path)."""
    if ref.startswith("iceberg:"):
        return True
    return "/" not in ref and "." in ref and not ref.endswith(".parquet")


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """``iceberg:db.tbl`` / ``catalog.db.tbl`` → catalog read (Iceberg
    when configured); anything else → parquet path."""
    if ref.startswith("iceberg:"):
        return spark.read.table(ref[len("iceberg:"):])
    if is_table_ref(ref):
        return spark.read.table(ref)
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "overwrite") -> None:
    if ref.startswith("iceberg:"):
        writer = df.writeTo(ref[len("iceberg:"):]).using("iceberg")
        # honor the mode — silently replacing on an append call is data
        # loss; DataFrameWriterV2 has distinct verbs per mode
        if mode == "append":
            writer.append()
        elif mode == "overwrite":
            writer.createOrReplace()
        else:
            raise ValueError(f"unsupported write mode for iceberg ref: {mode!r}")
        return
    if is_table_ref(ref):
        df.write.mode(mode).saveAsTable(ref)
        return
    df.write.mode(mode).parquet(ref)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog write: pay the shuffle ONCE at write time so
    every later equi-join / aggregation on the bucket key is co-located
    and runs with NO exchange on the bucketed side — the standard
    layout for a 100TB fact table that is repeatedly joined on the same
    key (e.g. clips ⋈ transcripts on clip_id, lineitem ⋈ orders on
    orderkey).  ``sort_cols`` additionally pre-sorts within buckets so
    sort-merge joins skip their sort.

    Two tables bucketed by the same key into the SAME ``n_buckets``
    join shuffle-free end to end.  The Iceberg analog is the
    ``bucket(n, col)`` partition transform plus storage-partitioned
    joins; this helper uses the builtin catalog's bucketBy, which is
    the same physical contract (hash(key) % n file groups)."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unsupported write mode for bucketed table: {mode!r}")
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    ref: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style directory partitioning: THE layout lever for
    low-cardinality filter columns (codec, language, ingest date) — a
    filter on the partition column prunes whole directories at the file
    index (plan shows it under ``PartitionFilters``), so a one-codec
    scan of a 100TB table never lists, opens, or reads any other
    codec's files.  Complements :func:`write_bucketed` (join
    co-location): partition on what you FILTER, bucket on what you
    JOIN.

    Iceberg refs use the identity partition transform via
    DataFrameWriterV2.partitionedBy — the same pruning contract,
    plus hidden-partitioning metadata."""
    if ref.startswith("iceberg:"):
        from pyspark.sql import functions as F

        writer = df.writeTo(ref[len("iceberg:"):]).using("iceberg").partitionedBy(
            *[F.col(c) for c in partition_cols]
        )
        if mode == "append":
            writer.append()
        elif mode == "overwrite":
            writer.createOrReplace()
        else:
            raise ValueError(f"unsupported write mode for iceberg ref: {mode!r}")
        return
    if is_table_ref(ref):
        df.write.mode(mode).partitionBy(*partition_cols).saveAsTable(ref)
        return
    df.write.mode(mode).partitionBy(*partition_cols).parquet(ref)


def snapshot_fingerprint(spark: SparkSession, ref: str) -> str:
    """Stable input-lineage fingerprint for checkpoint/resume.

    Iceberg: the current snapshot id (exact, transaction-consistent).
    Parquet path: a digest of the sorted (file, size, mtime) listing —
    same contract, weaker guarantee (documented in checkpoint/store).
    """
    import hashlib

    if is_table_ref(ref):
        tbl = ref[len("iceberg:"):] if ref.startswith("iceberg:") else ref
        row = spark.sql(
            f"SELECT snapshot_id FROM {tbl}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return str(row[0][0]) if row else "empty"
    sc = spark.sparkContext
    conf = sc._jsc.hadoopConfiguration()
    path = sc._jvm.org.apache.hadoop.fs.Path(ref)
    fs = path.getFileSystem(conf)
    entries = []
    it = fs.listFiles(path, True)
    while it.hasNext():
        st = it.next()
        entries.append(f"{st.getPath()}|{st.getLen()}|{st.getModificationTime()}")
    h = hashlib.sha256("\n".join(sorted(entries)).encode()).hexdigest()
    return h[:16]


def write_sorted(
    df,
    path: str,
    sort_cols: list[str],
    n_files: int = None,
    mode: str = "overwrite",
) -> None:
    """Range-sorted parquet layout: repartitionByRange on ``sort_cols``
    then sortWithinPartitions before writing, so every output file owns
    a disjoint slice of the sort-key space and rows inside it are
    ordered.  Parquet then stores tight per-row-group min/max for the
    sort columns, and any later range/point predicate on them prunes at
    BOTH levels — whole files via the footer stats, row groups via the
    page index — without a shuffle at read time.  This is
    write_bucketed's sibling: bucket on what you JOIN, range-sort on
    what you RANGE-FILTER (timestamps, scores, ids).

    The write itself costs the one range shuffle — paid once, like the
    bucketed layout.  ``n_files`` overrides the partition count (file
    sizing); range boundaries come from Spark's reservoir sampling, so
    file sizes stay balanced even on skewed keys.
    """
    from pyspark.sql import functions as F

    if not sort_cols:
        raise ValueError("sort_cols must be non-empty")
    cols = [F.col(c) for c in sort_cols]
    part = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    part.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def write_zorder(
    df,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = None,
    mode: str = "overwrite",
    rel_err: float = 0.01,
) -> None:
    """Z-order (Morton-curve) clustered parquet layout over 2+ numeric
    columns: the multi-column sibling of :func:`write_sorted`.  A
    linear sort clusters only its leading column — a range predicate on
    the second key still touches every file.  Bit-interleaving the
    columns' quantile-bucket ranks instead gives every listed column
    locality in the SAME layout, so parquet footer min/max stats prune
    files (and row groups) for predicates on ANY of them — the layout
    Delta/Iceberg expose as OPTIMIZE ZORDER BY, built here from
    primitives so it works on plain parquet.

    Mechanics (one pass + one shuffle, same cost shape as
    :func:`write_sorted`):

    1. Per column, ``approxQuantile`` computes ``2^bits - 1`` boundary
       values (one driver-side O(KB) sketch pass; no shuffle).
    2. Each row's column value maps to its quantile bucket via a
       literal-array binary-search-free rank — ``size(filter(bounds,
       b -> b <= v))`` — pure whole-stage codegen.  Quantile (not
       equi-width) buckets make the curve skew-immune: each bucket
       holds ~1/2^bits of the rows regardless of value distribution.
    3. Bucket ranks interleave bit-by-bit into the Morton key
       (``bits × len(cols)`` shift/or terms, still codegen).
    4. ``repartitionByRange`` on the key (reservoir-sampled balanced
       ranges) + ``sortWithinPartitions`` + write.

    NULLs rank into bucket 0 (filter over the bounds array yields 0
    matches), i.e. they cluster together at the curve origin.  Columns
    must be numeric/date/timestamp (dates and timestamps are ranked
    through a long cast).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if len(cols) < 2:
        raise ValueError("z-order needs >= 2 columns; use write_sorted for 1")
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16]: {bits}")
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]

    work = df
    rank_cols = []
    for c in cols:
        dt = df.schema[c].dataType
        num_c = f"__zn_{c}"
        if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
            work = work.withColumn(num_c, F.col(c).cast("long").cast("double"))
        elif isinstance(dt, T.NumericType):
            work = work.withColumn(num_c, F.col(c).cast("double"))
        else:
            raise ValueError(f"z-order column {c!r} has non-orderable-numeric type {dt}")
        rank_cols.append(num_c)

    # one approxQuantile call sketches every column together
    bounds = dict(zip(rank_cols, work.approxQuantile(rank_cols, probs, rel_err)))
    for num_c in rank_cols:
        arr = F.array(*[F.lit(float(b)) for b in bounds[num_c]])
        work = work.withColumn(
            num_c,
            F.size(F.filter(arr, lambda b: b <= F.col(num_c))).cast("long"),
        )

    z = F.lit(0).cast("long")
    for bit in range(bits):
        for j, num_c in enumerate(rank_cols):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(F.col(num_c), bit).bitwiseAND(F.lit(1)),
                    bit * len(rank_cols) + j,
                )
            )
    keyed = work.withColumn("__zkey", z)
    part = (
        keyed.repartitionByRange(n_files, "__zkey")
        if n_files
        else keyed.repartitionByRange("__zkey")
    )
    (
        part.sortWithinPartitions("__zkey")
        .drop("__zkey", *rank_cols)
        .write.mode(mode)
        .parquet(path)
    )


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Tiny driver-side row list → DataFrame as an ARROW LOCAL RELATION
    (via pandas), instead of ``createDataFrame(list)``'s parallelized
    pickle slices.

    Why it matters (measured r06, local[32]): a plain
    ``createDataFrame([one_row])`` becomes defaultParallelism
    pickled RDD slices, so every action pays ~32 tiny Python-worker
    tasks — and a downstream ``coalesce(1)`` evaluates those slices
    SEQUENTIALLY through one Python runner each: ~3.2s to write ONE
    report row.  The pandas/Arrow path converts on the driver into an
    Arrow-backed local relation: collect costs ~0.01s, a single-file
    write ~0.13s, zero Python-worker jobs.

    Values are staged in dtype=object pandas columns so large ints /
    None never round-trip through float64.  Falls back to the classic
    path when the Arrow conversion cannot represent the rows.
    """
    import pandas as pd
    from pyspark.sql.types import StructType

    if isinstance(schema, StructType):
        names = [f.name for f in schema.fields]
    else:
        from pyspark.sql.types import _parse_datatype_string

        names = [f.name for f in _parse_datatype_string(schema).fields]
    rows = list(rows)
    try:
        pdf = pd.DataFrame(
            {
                name: pd.Series([r[i] for r in rows], dtype=object)
                for i, name in enumerate(names)
            },
            columns=names,
        )
        return spark.createDataFrame(pdf, schema)
    except Exception:
        return spark.createDataFrame(rows, schema)


def ensure_map_parallelism(df: DataFrame, min_rows: int = 0) -> DataFrame:
    """Round-robin repartition a NARROW frame up to the session's core
    count when its physical partitioning is below it — the guide-§2.5
    fix for unsplittable inputs (a single-row-group parquet file scans
    as ONE task no matter how many byte-splits Spark makes, so any
    heavy per-row work downstream runs single-core).  Call AFTER
    column pruning, immediately before an expensive Arrow-map /
    expression stage.  No-op whenever the input already has enough
    partitions (a table at cluster scale always does), so the added
    exchange exists exactly when it buys parallelism."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
