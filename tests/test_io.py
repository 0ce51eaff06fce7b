"""Table-access abstraction: ref dispatch + lineage fingerprints."""

import os

from pyspark.sql import functions as F

from drivel_spark.io import is_table_ref, read_table, snapshot_fingerprint


def test_ref_dispatch():
    assert is_table_ref("iceberg:db.clips")
    assert is_table_ref("catalog.db.clips")
    assert not is_table_ref("/data/clips")
    assert not is_table_ref("s3://bucket/clips.parquet")
    assert not is_table_ref("clips")


def test_read_parquet_path(spark, sf_small_dir):
    df = read_table(spark, os.path.join(sf_small_dir, "nation.parquet"))
    assert df.count() == 25


def test_snapshot_fingerprint_stable_and_sensitive(spark, sf_small_dir, tmp_path):
    p = os.path.join(sf_small_dir, "nation.parquet")
    a = snapshot_fingerprint(spark, p)
    b = snapshot_fingerprint(spark, p)
    assert a == b and len(a) == 16
    # different content → different fingerprint
    other = snapshot_fingerprint(spark, os.path.join(sf_small_dir, "region.parquet"))
    assert other != a


def test_read_table_catalog_routing():
    """Ref-routing into the Spark catalog (the Iceberg path when the
    runtime jar + catalog conf are present) — exercised with a fake
    session so the branch runs without an Iceberg deployment."""
    log = []

    class FakeReader:
        def table(self, name):
            log.append(("table", name))
            return "DF"

        def parquet(self, path):
            log.append(("parquet", path))
            return "DF"

    class FakeSpark:
        @property
        def read(self):
            return FakeReader()

    read_table(FakeSpark(), "iceberg:db.clips")
    read_table(FakeSpark(), "cat.db.clips")
    read_table(FakeSpark(), "/data/clips")
    assert log == [
        ("table", "db.clips"),
        ("table", "cat.db.clips"),
        ("parquet", "/data/clips"),
    ]


def test_write_table_iceberg_mode_dispatch():
    """append must APPEND (DataFrameWriterV2.append), overwrite must
    createOrReplace, anything else must raise (ADVICE r01: mode was
    silently ignored → data loss on the intended-append path)."""
    import pytest

    from drivel_spark.io import write_table

    calls = []

    class FakeWriter:
        def using(self, fmt):
            calls.append(("using", fmt))
            return self

        def append(self):
            calls.append(("append",))

        def createOrReplace(self):
            calls.append(("createOrReplace",))

    class FakeDF:
        def writeTo(self, name):
            calls.append(("writeTo", name))
            return FakeWriter()

    write_table(FakeDF(), "iceberg:db.clips", mode="append")
    assert calls[-1] == ("append",)
    write_table(FakeDF(), "iceberg:db.clips", mode="overwrite")
    assert calls[-1] == ("createOrReplace",)
    with pytest.raises(ValueError):
        write_table(FakeDF(), "iceberg:db.clips", mode="ignore")


def test_catalog_table_round_trip(spark, sf_small_dir):
    """End-to-end catalog branch with the session's built-in catalog:
    write_table → saveAsTable, read_table → spark.read.table.  Same
    code path an Iceberg catalog takes (conf swap, not code swap)."""
    from drivel_spark.io import write_table

    df = read_table(spark, os.path.join(sf_small_dir, "region.parquet"))
    spark.sql("DROP TABLE IF EXISTS default.drivel_smoke")
    write_table(df, "default.drivel_smoke", mode="overwrite")
    back = read_table(spark, "default.drivel_smoke")
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)
    spark.sql("DROP TABLE IF EXISTS default.drivel_smoke")


def test_bucketed_join_has_no_shuffle(spark, sf_small_dir):
    """Both sides bucketed by the join key into the same bucket count ⇒
    the sort-merge join plans WITHOUT an Exchange on either side — the
    pay-shuffle-once-at-write contract that makes repeated joins on a
    100TB fact table affordable."""
    import io as _io
    from contextlib import redirect_stdout

    from drivel_spark.io import write_bucketed

    li = read_table(spark, os.path.join(sf_small_dir, "lineitem.parquet"))
    o = read_table(spark, os.path.join(sf_small_dir, "orders.parquet"))
    for t in ("drivel_li_b", "drivel_o_b"):
        spark.sql(f"DROP TABLE IF EXISTS default.{t}")
    write_bucketed(
        li.select("l_orderkey", "l_quantity"), "default.drivel_li_b",
        ["l_orderkey"], 4, sort_cols=["l_orderkey"],
    )
    write_bucketed(
        o.select("o_orderkey", "o_totalprice"), "default.drivel_o_b",
        ["o_orderkey"], 4, sort_cols=["o_orderkey"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("default.drivel_li_b").join(
            spark.table("default.drivel_o_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        buf = _io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and the result is still correct
        n = joined.count()
        want = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert n == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("drivel_li_b", "drivel_o_b"):
            spark.sql(f"DROP TABLE IF EXISTS default.{t}")


def test_write_partitioned_prunes_directories(spark, tmp_path):
    """A filter on the partition column appears as a PartitionFilter in
    the scan (directory-level pruning — the other codecs' files never
    get listed into the scan), values round-trip, and an iceberg: ref
    dispatches to DataFrameWriterV2.partitionedBy."""
    import io as _io
    from contextlib import redirect_stdout
    from unittest.mock import MagicMock

    from drivel_spark.fixtures import ClipFixtureSpec, build_clips
    from drivel_spark.io import write_partitioned

    out = str(tmp_path / "clips_by_codec")
    clips = build_clips(spark, 400, 4, ClipFixtureSpec(with_audio=False))
    write_partitioned(clips, out, ["codec"])

    back = spark.read.parquet(out)
    flac = back.filter(F.col("codec") == "flac")
    buf = _io.StringIO()
    with redirect_stdout(buf):
        flac.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "codec" in plan.split("PartitionFilters")[1].split("]")[0]
    want = clips.filter(F.col("codec") == "flac").count()
    assert flac.count() == want and want > 0

    # iceberg ref → DataFrameWriterV2 partitionedBy + mode dispatch
    mock_df = MagicMock()
    write_partitioned(mock_df, "iceberg:db.clips", ["codec"], mode="append")
    mock_df.writeTo.assert_called_once_with("db.clips")
    chain = mock_df.writeTo.return_value.using.return_value.partitionedBy.return_value
    chain.append.assert_called_once()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_partitioned(mock_df, "iceberg:db.clips", ["codec"], mode="replace")


def test_write_sorted_layout_and_pruning(spark, tmp_path):
    """write_sorted files own disjoint sort-key ranges (footer min/max
    don't overlap) and a range predicate skips non-matching files'
    row groups entirely."""
    import pandas as pd
    import pyarrow.parquet as pq
    import pytest as _pytest

    from drivel_spark.io import write_sorted

    import numpy as np

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({"score": rng.permutation(100_000).astype("int64"),
                        "payload": np.arange(100_000)})
    out = str(tmp_path / "sorted")
    write_sorted(spark.createDataFrame(pdf, schema="score long, payload long"), out, ["score"], n_files=8)

    import glob
    files = sorted(glob.glob(f"{out}/*.parquet"))
    assert len(files) == 8
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "score"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint slices of the key space
    # rows survive intact
    back = spark.read.parquet(out)
    assert back.count() == 100_000
    got = back.filter("score >= 99990").count()
    assert got == 10
    with _pytest.raises(ValueError, match="non-empty"):
        write_sorted(back, out, [])


def test_write_zorder_clusters_both_columns(spark, tmp_path):
    """Z-order layout gives BOTH interleaved columns per-file locality:
    the average normalized footer min/max span per file must shrink far
    below 1.0 for both keys, where a linear sort on the first key
    leaves the second key's spans at ~full range."""
    import glob

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import pytest as _pytest

    from drivel_spark.io import write_sorted, write_zorder

    rng = np.random.default_rng(7)
    n = 200_000
    # independent keys, one heavily skewed (zipf-ish) to exercise the
    # quantile (not equi-width) bucketing
    pdf = pd.DataFrame({
        "x": rng.permutation(n).astype("int64"),
        "y": np.floor(rng.pareto(1.5, n) * 1000).astype("int64"),
        "payload": np.arange(n),
    })
    df = spark.createDataFrame(pdf, schema="x long, y long, payload long")

    # clustering measured in RANK space (empirical CDF of the column):
    # heavy-tailed values make value-space normalization meaningless —
    # one pareto outlier stretches the global range so even an
    # unclustered file shows a tiny normalized span
    sorted_vals = {c: np.sort(pdf[c].to_numpy()) for c in ("x", "y")}

    def spans(path, col_idx, col_name):
        sv, out = sorted_vals[col_name], []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            fmin, fmax = None, None
            for rg in range(md.num_row_groups):
                c = md.row_group(rg).column(col_idx)
                assert c.path_in_schema == col_name
                st = c.statistics
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
            r_lo = np.searchsorted(sv, fmin, "left") / len(sv)
            r_hi = np.searchsorted(sv, fmax, "right") / len(sv)
            out.append(r_hi - r_lo)
        return float(np.mean(out))

    zpath, spath = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zorder(df, zpath, ["x", "y"], bits=8, n_files=16)
    write_sorted(df, spath, ["x"], n_files=16)

    zx = spans(zpath, 0, "x")
    zy = spans(zpath, 1, "y")
    lx = spans(spath, 0, "x")
    ly = spans(spath, 1, "y")

    # linear sort: x perfectly clustered, y not clustered at all
    assert lx < 0.15
    assert ly > 0.8
    # z-order: BOTH columns clustered well below full rank range
    assert zx < 0.5, (zx, zy, lx, ly)
    assert zy < 0.5, (zx, zy, lx, ly)

    # rows survive intact, helper columns dropped
    back = spark.read.parquet(zpath)
    assert back.count() == n
    assert sorted(back.columns) == ["payload", "x", "y"]

    with _pytest.raises(ValueError, match=">= 2 columns"):
        write_zorder(df, zpath, ["x"])
    with _pytest.raises(ValueError, match="non-orderable-numeric"):
        write_zorder(
            df.withColumn("s", df.x.cast("string")), zpath, ["x", "s"]
        )
