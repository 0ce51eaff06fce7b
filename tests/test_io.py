"""Table-access abstraction: ref dispatch + lineage fingerprints."""

import os

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
