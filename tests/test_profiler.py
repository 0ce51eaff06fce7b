"""Distributed profiler vs pandas oracle on the driver testdata, plus
partitioning-invariance (the merge-monoid property at the Spark level)."""

import json

import numpy as np
import pandas as pd
import pytest

from drivel_spark.core import EnumInference
from drivel_spark.profiling import ProfilerOptions, profile, profile_json_column


@pytest.fixture(scope="module")
def lineitem(spark, sf_small_dir):
    return spark.read.parquet(f"{sf_small_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def lineitem_pd(sf_small_dir):
    return pd.read_parquet(f"{sf_small_dir}/lineitem.parquet")


def test_numeric_profile_matches_pandas(lineitem, lineitem_pd):
    prof = profile(lineitem)
    assert prof.n_rows == len(lineitem_pd)
    for col in ["l_quantity", "l_extendedprice", "l_discount"]:
        acc = prof.column(col)
        assert acc.n == len(lineitem_pd)
        assert acc.n_null == int(lineitem_pd[col].isna().sum())
        assert acc.min_v == pytest.approx(lineitem_pd[col].min())
        assert acc.max_v == pytest.approx(lineitem_pd[col].max())
        assert acc.sum_v == pytest.approx(lineitem_pd[col].sum(), rel=1e-9)
        # HLL within 5% of exact distinct
        exact = lineitem_pd[col].nunique()
        assert abs(acc.hll.estimate() - exact) / max(exact, 1) < 0.05
        # KLL median within ~2.5% rank error; discrete columns put mass
        # on single values, so test against the [P(X<m), P(X<=m)] interval
        med = acc.kll.quantile(0.5)
        rank_lo = (lineitem_pd[col] < med).mean()
        rank_hi = (lineitem_pd[col] <= med).mean()
        assert rank_lo - 0.025 <= 0.5 <= rank_hi + 0.025


def test_string_profile_matches_pandas(lineitem, lineitem_pd):
    prof = profile(lineitem)
    acc = prof.column("l_returnflag")
    lens = lineitem_pd["l_returnflag"].str.len()
    assert acc.min_len == lens.min() and acc.max_len == lens.max()
    # small-cardinality column: frequency map is exact
    assert acc.freq.is_exact
    assert acc.freq.counts == lineitem_pd["l_returnflag"].value_counts().to_dict()


def test_partitioning_invariance(lineitem):
    p1 = profile(lineitem.coalesce(1))
    p8 = profile(lineitem.repartition(8))
    p17 = profile(lineitem.repartition(17, "l_partkey"))
    for prof in (p8, p17):
        for col in prof.columns():
            a, b = p1.column(col), prof.column(col)
            assert a.n == b.n and a.n_null == b.n_null
            if a.kind == "numeric":
                assert a.min_v == b.min_v and a.max_v == b.max_v
                assert a.sum_v == pytest.approx(b.sum_v, rel=1e-9)
                # HLL registers are merge-exact: identical regardless of split
                assert np.array_equal(a.hll.registers, b.hll.registers)
            if a.kind == "string":
                assert a.min_len == b.min_len and a.max_len == b.max_len
                assert a.freq.counts == b.freq.counts
                assert sorted(map(str, a.sample.sample())) == sorted(map(str, b.sample.sample()))


def test_enum_detection_on_low_cardinality(lineitem):
    prof = profile(lineitem, opts=ProfilerOptions(enum_max_unique_ratio=0.01))
    node = prof.to_schema_node()
    rf = node.required["l_returnflag"]
    assert rf.str_type == "enum"
    assert rf.variants == frozenset({"A", "N", "R"})


def test_describe_and_json_schema_render(lineitem):
    prof = profile(lineitem)
    text = prof.describe()
    assert '"l_orderkey"' in text and "int (" in text
    js = prof.to_json_schema(extended=True)
    assert js["type"] == "object"
    assert js["properties"]["l_quantity"]["type"] == "number"
    assert "minimum" in js["properties"]["l_quantity"]


def test_profile_binary_and_array(spark):
    pdf = pd.DataFrame(
        {
            "b": [b"abc", b"defgh", None, b""],
            "arr": [[1.0, 2.0], [], [3.0], None],
        }
    )
    df = spark.createDataFrame(pdf)
    prof = profile(df)
    b = prof.column("b")
    assert (b.min_size, b.max_size, b.n_null, b.total_bytes) == (0, 5, 1, 8)
    a = prof.column("arr")
    assert (a.min_items, a.max_items, a.n_null) == (0, 2, 1)


def test_profile_uuid_format_column(spark):
    import uuid

    rng = np.random.default_rng(5)
    ids = [str(uuid.UUID(bytes=rng.bytes(16))) for _ in range(500)]
    df = spark.createDataFrame(pd.DataFrame({"id": ids})).repartition(4)
    prof = profile(df)
    assert prof.column("id").resolved_format == "uuid"
    node = prof.to_schema_node()
    assert node.required["id"].str_type == "uuid"


def test_profile_json_column(spark, sf_small_dir):
    events = spark.read.parquet(f"{sf_small_dir}/events.parquet")
    node = profile_json_column(events, "props", enum=EnumInference(0.5, 1))
    assert node.kind == "object"
    # cross-check against a driver-side fold over the same documents
    props = pd.read_parquet(f"{sf_small_dir}/events.parquet")["props"].dropna()
    from drivel_spark.core import InferenceOptions, infer_many

    oracle = infer_many(
        [json.loads(p) for p in props],
        InferenceOptions(max_strings_seen=64, max_chars_seen=1024),
    )
    assert set(node.required) == set(oracle.required)
    assert set(node.optional) == set(oracle.optional)
    for k in node.required:
        assert node.required[k].kind == oracle.required[k].kind


def test_profile_json_column_tolerates_corrupt_docs(spark):
    """A malformed document must be counted, never a task failure —
    the reference hard-exits on a bad JSONL line (main.rs:104-109);
    SURVEY S3 mandates corrupt-record tolerance at scale."""
    import pandas as pd

    from drivel_spark.profiling import profile_json_column

    pdf = pd.DataFrame(
        {
            "j": [
                '{"a": 1}',
                '{"a": 2, "b": "x"}',
                "{not json",          # corrupt
                None,                 # null row (not corrupt)
                '{"a": null}',
                "[1,",                # corrupt
            ]
        }
    )
    df = spark.createDataFrame(pdf).repartition(3)
    node, stats = profile_json_column(df, "j", with_stats=True)
    assert stats == {"n_docs": 3, "n_null": 1, "n_corrupt": 2}
    fields = {**node.required, **node.optional}
    assert set(fields) == {"a", "b"}
    assert fields["a"].kind == "number" and fields["a"].nullable
    # bare-node call keeps the old signature
    node2 = profile_json_column(df, "j")
    assert {**node2.required, **node2.optional}.keys() == fields.keys()


def test_diff_profiles_change_kinds(spark):
    """Every structural change kind fires exactly when constructed:
    add/remove, type change, nulls appearing, numeric range escape,
    string length growth, enum variant growth, format change."""
    from pyspark.sql import functions as F

    from drivel_spark.profiling import diff_profiles, profile

    base_df = spark.range(0, 200).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("s"),
        F.when(F.col("id") % 2 == 0, "red").otherwise("blue").alias("e"),
        F.lit("2024-01-02").alias("d"),
        F.col("id").alias("gone"),
    )
    cur_df = spark.range(0, 200).select(
        F.col("id").cast("string").alias("k"),                   # type change
        F.when(F.col("id") % 4 == 0, (F.col("id") % 100) * 3.0 - 50.0)
        .otherwise((F.col("id") % 100).cast("double")).alias("v"),  # range escape
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.concat(F.lit("user"), F.col("id").cast("string")))
        .alias("s"),                                             # nulls + longer
        F.when(F.col("id") % 3 == 0, "green")
        .when(F.col("id") % 2 == 0, "red").otherwise("blue").alias("e"),
        F.lit("not a date at all").alias("d"),                   # format change
        F.lit("web").alias("added"),
    )
    d = diff_profiles(profile(cur_df), profile(base_df))
    by = {(r["column"], r["change"]): r for r in d}

    assert ("added", "column_added") in by and by[("added", "column_added")]["after"] == 200.0
    assert ("gone", "column_removed") in by and by[("gone", "column_removed")]["before"] == 200.0
    assert by[("k", "type_changed")]["detail"] == "numeric->string"
    assert by[("v", "range_widened_hi")]["before"] == 99.0
    assert by[("v", "range_widened_hi")]["after"] == 238.0  # 96*3-50
    assert by[("v", "range_widened_lo")]["after"] == -50.0
    assert by[("s", "nulls_appeared")]["after"] == round(20 / 200, 6)
    assert ("s", "length_widened_hi") in by  # "userNNN" > "uNNN"
    got_e = by[("e", "enum_variants_added")]
    assert got_e["after"] == 1.0 and got_e["detail"] == "green"
    assert by[("d", "format_changed")]["detail"].startswith("iso-date->")
    # untouched columns emit nothing; identical profiles diff to []
    assert not any(r["column"] == "v" and r["change"] == "nulls_appeared" for r in d)
    assert diff_profiles(profile(base_df), profile(base_df)) == []


def test_compat_report_and_verdict(spark):
    """Compat gate over the same change construction: every diff row
    gets its documented BACKWARD severity, the verdict is the worst
    severity present, overrides re-pin kinds, and bad overrides fail
    loudly (profiling/compat.py)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from drivel_spark.profiling import (
        SEVERITY_BACKWARD,
        compat_report,
        compat_verdict,
        diff_profiles,
        profile,
    )

    base_df = spark.range(0, 200).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("s"),
        F.when(F.col("id") % 2 == 0, "red").otherwise("blue").alias("e"),
        F.col("id").alias("gone"),
    )
    cur_df = spark.range(0, 200).select(
        F.col("id").cast("string").alias("k"),                    # block
        F.when(F.col("id") % 4 == 0, (F.col("id") % 100) * 3.0 - 50.0)
        .otherwise((F.col("id") % 100).cast("double")).alias("v"),  # warn
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.concat(F.lit("user"), F.col("id").cast("string")))
        .alias("s"),                                              # block+warn
        F.when(F.col("id") % 3 == 0, "green")
        .when(F.col("id") % 2 == 0, "red").otherwise("blue").alias("e"),  # warn
        F.lit("web").alias("added"),                              # ok
    )
    cur_p, base_p = profile(cur_df), profile(base_df)
    rep = compat_report(cur_p, base_p)

    # report = diff rows + severity, nothing else reordered or dropped
    plain = diff_profiles(cur_p, base_p)
    assert [{k: v for k, v in r.items() if k != "severity"} for r in rep] == plain
    for r in rep:
        assert r["severity"] == SEVERITY_BACKWARD[r["change"]]
    by = {(r["column"], r["change"]): r["severity"] for r in rep}
    assert by[("k", "type_changed")] == "block"
    assert by[("s", "nulls_appeared")] == "block"
    assert by[("gone", "column_removed")] == "block"
    assert by[("added", "column_added")] == "ok"
    assert by[("v", "range_widened_hi")] == "warn"
    assert by[("e", "enum_variants_added")] == "warn"

    v = compat_verdict(rep)
    assert v["verdict"] == "block" and v["gate_passed"] is False
    assert v["n_ok"] + v["n_warn"] + v["n_block"] == len(rep)
    assert v["n_block"] >= 3 and v["n_ok"] >= 1

    # overrides re-pin a kind; the verdict follows the worst present
    only_warn = [r for r in rep if r["column"] in ("v", "e")]
    assert compat_verdict(only_warn)["verdict"] == "warn"
    repinned = compat_report(
        cur_p, base_p, severity_overrides={"enum_variants_added": "block"}
    )
    assert {r["severity"] for r in repinned if r["change"] == "enum_variants_added"} == {"block"}

    # identical profiles: empty report, ok verdict, gate passes
    empty = compat_report(base_p, base_p)
    assert empty == []
    v0 = compat_verdict(empty)
    assert v0 == {
        "n_ok": 0, "n_warn": 0, "n_block": 0,
        "verdict": "ok", "gate_passed": True,
    }

    # typos cannot silently weaken the gate
    with _pytest.raises(ValueError, match="unknown change kind"):
        compat_report(cur_p, base_p, severity_overrides={"nope": "ok"})
    with _pytest.raises(ValueError, match="severity must be one of"):
        compat_report(cur_p, base_p, severity_overrides={"type_changed": "meh"})


def test_table_profile_merge_equals_union_profile(spark):
    """profile(A).merge(profile(B)) ≡ profile(A ∪ B) on every scalar
    stat and within sketch tolerance on quantiles/distincts — the
    monoid property that makes incremental corpus profiling exact."""
    import pytest

    from drivel_spark.fixtures import ClipFixtureSpec, build_clips
    from drivel_spark.profiling import profile

    a = build_clips(spark, 1500, 4, ClipFixtureSpec(with_audio=False))
    b = build_clips(spark, 1500, 4, ClipFixtureSpec(seed=43, with_audio=False))
    cols = ["sr_hz", "dur_ms", "codec", "transcript"]
    merged = profile(a, columns=cols).merge(profile(b, columns=cols))
    union = profile(a.unionByName(b), columns=cols)
    assert merged.n_rows == union.n_rows == 3000
    for c in ("sr_hz", "dur_ms"):
        ma, ua = merged.column(c), union.column(c)
        assert (ma.n, ma.n_null, ma.min_v, ma.max_v) == (ua.n, ua.n_null, ua.min_v, ua.max_v)
        assert ma.sum_v == pytest.approx(ua.sum_v)
        assert ma.kll.quantile(0.5) == pytest.approx(ua.kll.quantile(0.5), rel=0.05)
    mc, uc = merged.column("codec"), union.column("codec")
    assert mc.freq.counts == uc.freq.counts
    # mismatched column sets refuse to merge
    with pytest.raises(ValueError, match="different columns"):
        profile(a, columns=["sr_hz"]).merge(profile(b, columns=["dur_ms"]))


def test_grouped_profile_and_drift(spark):
    """Per-group pass-1 fold: group row counts and exact stats match a
    plain groupBy; merging all group accs reproduces the global
    profile (monoid invariant); NULL keys profile under None; drift
    report flags the drifted group column and added/removed groups."""
    import numpy as np
    import pandas as pd

    from drivel_spark.profiling import grouped_drift, grouped_profile, profile

    pdf = pd.DataFrame(
        {
            "codec": (["wav"] * 60 + ["flac"] * 30 + [None] * 10),
            "dur": np.concatenate(
                [np.arange(60) * 10.0, np.arange(30) * 100.0, np.full(10, 7.0)]
            ),
        }
    )
    df = spark.createDataFrame(pdf).repartition(6)
    gp = grouped_profile(df, "codec", columns=["dur"])
    assert set(gp) == {"wav", "flac", None}
    assert gp["wav"].n_rows == 60 and gp["flac"].n_rows == 30
    assert gp[None].n_rows == 10
    wav = gp["wav"].column("dur")
    assert wav.min_v == 0.0 and wav.max_v == 590.0
    assert gp[None].column("dur").min_v == 7.0
    # monoid invariant: merged group accs == global profile
    from drivel_spark.profiling import TableAccumulator

    accs = [p.acc for p in gp.values()]
    merged = accs[0]
    for a in accs[1:]:
        merged = merged.merge(a)
    full = profile(df, columns=["dur"])
    assert merged.n_rows == full.n_rows == 100
    assert merged.cols["dur"].min_v == full.column("dur").min_v
    assert merged.cols["dur"].max_v == full.column("dur").max_v
    assert merged.cols["dur"].sum_v == full.column("dur").sum_v

    # drift: shift only the flac group; wav must stay calm
    pdf2 = pdf.copy()
    pdf2.loc[pdf2.codec == "flac", "dur"] += 5000.0
    gp2 = grouped_profile(
        spark.createDataFrame(pdf2).repartition(6), "codec", columns=["dur"]
    )
    rep = grouped_drift(gp, gp2)
    by_g = {(r.group, r.column): r for r in rep.itertuples()}
    assert by_g[("flac", "dur")].ks > 0.9
    assert by_g[("wav", "dur")].ks < 0.05
    # added / removed groups
    del gp2["flac"]
    gp2["opus"] = gp["wav"]
    rep2 = grouped_drift(gp, gp2)
    status = {r.group: r.status for r in rep2.itertuples() if r.status != "both"}
    assert status == {"flac": "removed", "opus": "added"}
