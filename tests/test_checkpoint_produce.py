"""Resume-from-checkpoint protocol + distributed producer round-trips."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from drivel_spark.checkpoint import CheckpointStore, resumable_profile
from drivel_spark.core import SchemaNode, parse_json_schema
from drivel_spark.fixtures import ClipFixtureSpec, build_clips
from drivel_spark.produce.generator import produce_df, produce_from_profile
from drivel_spark.profiling import profile


@pytest.fixture()
def clip_table(spark, tmp_path):
    path = str(tmp_path / "clips_pq")
    build_clips(spark, 2000, 8, ClipFixtureSpec(with_audio=False)).write.parquet(path)
    return path


def test_resume_skips_committed_units(spark, clip_table, tmp_path):
    store = CheckpointStore(str(tmp_path / "ckpt"))
    full = spark.read.parquet(clip_table)
    units = sorted(full.inputFiles())
    n_units = len(units)
    assert n_units >= 4

    # simulate a run killed after k units: profile only k files, commit
    k = n_units // 2
    import hashlib

    snapshot = hashlib.sha256("\n".join(units).encode()).hexdigest()[:16]
    sub_path_profile, stats1 = resumable_profile(
        spark, clip_table, store, run_id="r1", input_snapshot=snapshot
    )
    assert stats1["n_recomputed"] == n_units  # fresh run computes all

    # restart: nothing to recompute, identical profile restored from blobs
    prof2, stats2 = resumable_profile(
        spark, clip_table, store, run_id="r1", input_snapshot=snapshot
    )
    assert stats2["n_recomputed"] == 0
    assert stats2["n_restored"] == n_units
    a, b = sub_path_profile.column("dur_ms"), prof2.column("dur_ms")
    assert (a.n, a.n_null, a.min_v, a.max_v, a.sum_v) == (b.n, b.n_null, b.min_v, b.max_v, b.sum_v)


def test_partial_commit_then_resume(spark, clip_table, tmp_path):
    """Kill-after-k simulation: pre-commit k units from a first pass, then
    resume must recompute exactly n-k and match the full profile."""
    store_full = CheckpointStore(str(tmp_path / "ckpt_full"))
    prof_full, _ = resumable_profile(spark, clip_table, store_full, run_id="full")

    store = CheckpointStore(str(tmp_path / "ckpt_partial"))
    committed_all = store_full.committed("full", _snapshot(spark, clip_table))
    k = len(committed_all) // 2
    partial = committed_all.head(k).copy()
    partial["run_id"] = "resumed"
    store.append(partial.to_dict("records"))

    prof, stats = resumable_profile(spark, clip_table, store, run_id="resumed")
    assert stats["n_recomputed"] == stats["n_units"] - k
    assert stats["n_restored"] == k
    for col in ("dur_ms", "sr_hz"):
        a, b = prof.column(col), prof_full.column(col)
        assert (a.n, a.n_null, a.min_v, a.max_v, a.sum_v) == (b.n, b.n_null, b.min_v, b.max_v, b.sum_v)
        assert np.array_equal(a.hll.registers, b.hll.registers)


def _snapshot(spark, path):
    import hashlib

    units = sorted(spark.read.parquet(path).inputFiles())
    return hashlib.sha256("\n".join(units).encode()).hexdigest()[:16]


def test_snapshot_mismatch_recomputes(spark, clip_table, tmp_path):
    store = CheckpointStore(str(tmp_path / "ckpt"))
    resumable_profile(spark, clip_table, store, run_id="r1", input_snapshot="snapA")
    _, stats = resumable_profile(spark, clip_table, store, run_id="r1", input_snapshot="snapB")
    assert stats["n_recomputed"] == stats["n_units"]  # new snapshot → full recompute


# ---------------------------------------------------------------------------
# producer
# ---------------------------------------------------------------------------


def test_produce_df_deterministic_and_partition_invariant(spark):
    doc = {
        "type": "object",
        "properties": {
            "n": {"type": "integer", "minimum": 5, "maximum": 20},
            "f": {"type": "number", "minimum": 0.0, "maximum": 1.0},
            "flag": {"type": "boolean"},
            "codec": {"type": "string", "enum": ["a", "b", "c"]},
            "id": {"type": "string", "format": "uuid"},
        },
        "required": ["n", "f", "flag", "codec", "id"],
    }
    node = parse_json_schema(doc)
    a = produce_df(spark, node, 500, seed=1, n_partitions=3).toPandas().sort_values("id")
    b = produce_df(spark, node, 500, seed=1, n_partitions=7).toPandas().sort_values("id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert a["n"].between(5, 20).all()
    assert a["f"].between(0.0, 1.0).all()
    assert set(a["codec"].unique()) <= {"a", "b", "c"}
    assert a["id"].str.match(r"^[0-9a-f-]{36}$").all()


def test_produce_optional_fields_nullable(spark):
    doc = {
        "type": "object",
        "properties": {"req": {"type": "integer", "minimum": 0, "maximum": 9},
                       "opt": {"type": "integer", "minimum": 0, "maximum": 9}},
        "required": ["req"],
    }
    pdf = produce_df(spark, parse_json_schema(doc), 400, seed=2).toPandas()
    assert pdf["req"].notna().all()
    assert 0 < pdf["opt"].isna().sum() < 400


def test_produce_roundtrip_from_profile(spark):
    """profile → produce → re-profile: schema kinds and bounds subsumed."""
    src = build_clips(spark, 1000, 4, ClipFixtureSpec(variant="clean", with_audio=False))
    prof = profile(src, columns=["sr_hz", "dur_ms", "codec"])
    gen = produce_from_profile(spark, prof, 2000, seed=3)
    prof2 = profile(gen)
    assert prof2.column("sr_hz").min_v >= prof.column("sr_hz").min_v
    assert prof2.column("sr_hz").max_v <= prof.column("sr_hz").max_v
    assert prof2.column("dur_ms").min_v >= prof.column("dur_ms").min_v
    assert prof2.column("dur_ms").max_v <= prof.column("dur_ms").max_v
    node, node2 = prof.to_schema_node(), prof2.to_schema_node()
    assert node2.required["codec"].str_type == "enum"
    assert node2.required["codec"].variants <= node.required["codec"].variants


def test_resumable_row_validation_matches_batch(spark, clip_table, tmp_path):
    """Pass-2 resume protocol: per-file pass/fail partials commit with
    lineage; the merged report is identical to the one-pass batch
    engine; a restart recomputes nothing; a kill-after-k resume
    recomputes exactly the missing files and still matches."""
    from drivel_spark.checkpoint import resumable_row_validation
    from drivel_spark.constraints import NotNull, Range, validate

    cs = [
        Range("dur_range", "dur_ms", 200, 30000),
        NotNull("transcript_not_null", "transcript"),
    ]
    scope = F.pmod(F.xxhash64(F.col("clip_id")), F.lit(8))

    store = CheckpointStore(str(tmp_path / "pfck"))
    pf, stats = resumable_row_validation(
        spark, clip_table, store, "r1", cs, scope
    )
    assert stats["n_recomputed"] == stats["n_units"] >= 4

    batch = (
        validate(spark.read.parquet(clip_table), cs, scope=scope)
        .passfail_pdf()
        .sort_values(["partition_id", "constraint"])
        .reset_index(drop=True)
    )
    batch = batch[pf.columns]  # same column order
    assert pf.equals(batch)

    # restart: zero recompute, identical report
    pf2, stats2 = resumable_row_validation(
        spark, clip_table, store, "r1", cs, scope
    )
    assert stats2["n_recomputed"] == 0 and pf2.equals(pf)

    # kill-after-k: seed a fresh store with only k commits, resume
    snap = _snapshot(spark, clip_table)
    committed = store.committed("r1:rowpf", snap)
    k = len(committed) // 2
    store2 = CheckpointStore(str(tmp_path / "pfck2"))
    partial = committed.head(k).copy()
    store2.append(partial.to_dict("records"))
    pf3, stats3 = resumable_row_validation(
        spark, clip_table, store2, "r1", cs, scope
    )
    assert stats3["n_recomputed"] == stats3["n_units"] - k
    assert pf3.equals(pf)


@pytest.fixture()
def audio_clip_table(spark, tmp_path):
    path = str(tmp_path / "clips_audio_pq")
    build_clips(
        spark, 240, 6,
        ClipFixtureSpec(with_audio=True, distort_every=5, dropout_every=7),
    ).write.parquet(path)
    return path


def test_resumable_screen_matches_oneshot_and_resumes(
    spark, audio_clip_table, tmp_path
):
    """Fused-screen resume protocol: per-file screen counts commit with
    lineage; totals equal a one-shot fused run; a restart decodes
    nothing; a kill-after-k resume decodes exactly the missing files
    and still matches; a different kind set recomputes from scratch."""
    from drivel_spark.checkpoint import resumable_screen
    from drivel_spark.ops import screen_report
    from drivel_spark.ops.multimodal import AUDIO_SCREENS, FUSED_SCREEN_BAD

    kinds = ["quality", "dropout"]
    store = CheckpointStore(str(tmp_path / "sck"))
    totals, stats = resumable_screen(
        spark, audio_clip_table, store, "s1", kinds=kinds
    )
    assert stats["n_recomputed"] == stats["n_units"] >= 4

    # one-shot fused truth over the same table
    rep = screen_report(spark.read.parquet(audio_clip_table), kinds)
    want = {}
    for kind in kinds:
        flag = AUDIO_SCREENS[kind][1]
        bad = FUSED_SCREEN_BAD.get(kind, "n_samples IS NULL")
        row = rep.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.expr(flag), 1)).alias("f"),
            F.count(F.when(F.expr(bad), 1)).alias("b"),
        ).collect()[0]
        want[kind] = (int(row["n"]), int(row["f"]), int(row["b"]))
    got = {
        r["kind"]: (int(r["n_clips"]), int(r["n_flagged"]),
                    int(r["n_undecodable"]))
        for _, r in totals.iterrows()
    }
    assert got == want
    assert any(v[1] >= 1 for v in want.values())  # planted defects fire

    # stats carry the decode-throughput base and corpus undecodables
    assert stats["n_clips_recomputed"] == int(totals["n_clips"].max())
    assert stats["n_undecodable"] is not None

    # restart: zero recompute, identical totals
    totals2, stats2 = resumable_screen(
        spark, audio_clip_table, store, "s1", kinds=kinds
    )
    assert stats2["n_recomputed"] == 0 and totals2.equals(totals)
    assert stats2["n_clips_recomputed"] == 0

    # same SET in a different caller order: still the same run key,
    # zero recompute (run key is built from sorted(kinds))
    totals2b, stats2b = resumable_screen(
        spark, audio_clip_table, store, "s1", kinds=list(reversed(kinds))
    )
    assert stats2b["n_recomputed"] == 0
    assert sorted(totals2b["kind"]) == sorted(totals["kind"])

    # kill-after-k: seed a fresh store with half the commits, resume
    full = spark.read.parquet(audio_clip_table)
    snap_units = sorted(full.inputFiles())
    run = f"s1:screen[{','.join(sorted(kinds))}]"
    committed = store._read_all()
    committed = committed[committed.run_id == run]
    k = len(committed) // 2
    store2 = CheckpointStore(str(tmp_path / "sck2"))
    store2.append(committed.iloc[:k].to_dict("records"))
    totals3, stats3 = resumable_screen(
        spark, audio_clip_table, store2, "s1", kinds=kinds
    )
    assert stats3["n_recomputed"] == len(snap_units) - k
    assert totals3.equals(totals)

    # a different kind set is a different run: full recompute
    totals4, stats4 = resumable_screen(
        spark, audio_clip_table, store, "s1", kinds=["quality"]
    )
    assert stats4["n_recomputed"] == stats4["n_units"]
    assert got["quality"] == (
        int(totals4.iloc[0]["n_clips"]),
        int(totals4.iloc[0]["n_flagged"]),
        int(totals4.iloc[0]["n_undecodable"]),
    )
