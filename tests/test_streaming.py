"""Incremental (Structured Streaming) validation: per-batch delta
reports must fold to exactly the batch engine's pass/fail table, and
the checkpoint must make restarts exactly-once (no reprocessing)."""

import os

import pytest
from pyspark.sql import functions as F

from drivel_spark.constraints import Enum as EnumC
from drivel_spark.constraints import NotNull, Range, validate
from drivel_spark.fixtures import CLIPS_SCHEMA, CODEC_ENUM, ClipFixtureSpec, clips_pdf
from drivel_spark.streaming import cumulative_passfail, validate_stream

SPEC = ClipFixtureSpec(with_audio=False)


def _constraints():
    return [
        EnumC("sr_enum", "sr_hz", (8000, 16000, 22050, 44100, 48000)),
        Range("dur_range", "dur_ms", 200, 30000),
        EnumC("codec_enum", "codec", tuple(sorted(CODEC_ENUM))),
        NotNull("transcript_not_null", "transcript"),
    ]


def _scope():
    return F.pmod(F.xxhash64(F.col("clip_id")), F.lit(8)).cast("long")


def _write_wave(spark, source, lo, hi):
    pdf = clips_pdf(range(lo, hi), SPEC)
    spark.createDataFrame(pdf, CLIPS_SCHEMA).coalesce(2).write.mode("append").parquet(
        source
    )


def _batch_passfail_pdf(spark, source):
    df = spark.read.parquet(source)
    res = validate(df, _constraints(), scope=_scope(), cache_flags=False)
    pdf = res.passfail_pdf()
    return pdf.sort_values(["constraint", "partition_id"]).reset_index(drop=True)


def _stream_totals_pdf(spark, report):
    pdf = (
        cumulative_passfail(spark, report)
        .toPandas()
        .sort_values(["constraint", "partition_id"])
        .reset_index(drop=True)
    )
    return pdf


def test_stream_matches_batch_and_resumes_exactly_once(spark, tmp_path):
    source = str(tmp_path / "clips_stream")
    report = str(tmp_path / "report")
    ckpt = str(tmp_path / "ckpt")

    # wave 1: 500 clips → one availableNow run
    _write_wave(spark, source, 0, 500)
    validate_stream(
        spark, source, CLIPS_SCHEMA, _constraints(), _scope(), report, ckpt
    )
    got = _stream_totals_pdf(spark, report)
    want = _batch_passfail_pdf(spark, source)
    assert got.to_dict("records") == want.to_dict("records")

    # wave 2 appended: a resumed stream processes ONLY the new files
    _write_wave(spark, source, 500, 1000)
    validate_stream(
        spark, source, CLIPS_SCHEMA, _constraints(), _scope(), report, ckpt
    )
    rep = spark.read.parquet(report)
    batch_ids = {r["batch_id"] for r in rep.select("batch_id").distinct().collect()}
    assert len(batch_ids) == 2  # one micro-batch per wave, no reprocessing
    got2 = _stream_totals_pdf(spark, report)
    want2 = _batch_passfail_pdf(spark, source)
    assert got2.to_dict("records") == want2.to_dict("records")
    # violations actually present in the fixture (injected modular rows)
    assert (got2[got2.constraint == "_rows_any_violation"]["n_violations"] > 0).any()

    # restart with NO new data: exactly-once ⇒ report unchanged
    validate_stream(
        spark, source, CLIPS_SCHEMA, _constraints(), _scope(), report, ckpt
    )
    rep2 = spark.read.parquet(report)
    assert rep2.count() == rep.count()


def test_stream_plus_reconcile_equals_batch_validate(spark, tmp_path):
    """The documented split — row checks streamed, dataset checks via
    periodic batch reconciliation (validate_stream.py:23-27) — now has
    a CLI surface: after `reconcile` commits its batch_id=-1 partition,
    the cumulative report equals the full batch engine's pass/fail
    table (row + GLOBAL_SCOPE dataset rows) on the same data
    (VERDICT r02 next #6)."""
    import argparse

    from drivel_spark.constraints import Referential, Unique
    from drivel_spark.job import cmd_reconcile

    source = str(tmp_path / "rsrc")
    report = str(tmp_path / "rreport")
    ckpt = str(tmp_path / "rckpt")
    _write_wave(spark, source, 0, 400)
    _write_wave(spark, source, 400, 900)
    validate_stream(
        spark, source, CLIPS_SCHEMA, _constraints(), _scope(), report, ckpt
    )

    # transcripts for all but 5 clips → referential violations exist
    clips = spark.read.parquet(source)
    transcripts_path = str(tmp_path / "rtranscripts")
    clips.filter(F.col("clip_id").isNotNull()).select("clip_id").distinct().limit(
        890
    ).withColumn("text", F.lit("t")).write.parquet(transcripts_path)

    out = cmd_reconcile(
        argparse.Namespace(
            source=source, report=report, transcripts=transcripts_path
        )
    )
    assert {d["constraint"] for d in out["dataset_checks"]} == {
        "clip_id_unique",
        "clip_has_transcript",
    }

    got = _stream_totals_pdf(spark, report)
    full = validate(
        clips,
        _constraints()
        + [
            Unique("clip_id_unique", "clip_id"),
            Referential("clip_has_transcript", "clip_id", "transcripts", "clip_id"),
        ],
        scope=_scope(),
        ref_tables={"transcripts": spark.read.parquet(transcripts_path)},
        cache_flags=False,
    )
    want = (
        full.passfail_pdf()
        .sort_values(["constraint", "partition_id"])
        .reset_index(drop=True)
    )
    assert got.to_dict("records") == want.to_dict("records")
    # re-running reconcile is idempotent (snapshot partition overwrite)
    cmd_reconcile(
        argparse.Namespace(source=source, report=report, transcripts=transcripts_path)
    )
    got2 = _stream_totals_pdf(spark, report)
    assert got2.to_dict("records") == want.to_dict("records")


def test_stream_rejects_dataset_constraints(spark, tmp_path):
    from drivel_spark.constraints import Unique

    with pytest.raises(ValueError, match="row-level"):
        validate_stream(
            spark,
            str(tmp_path / "x"),
            CLIPS_SCHEMA,
            [Unique("u", "clip_id")],
            _scope(),
            str(tmp_path / "r"),
            str(tmp_path / "c"),
        )


# ---------------------------------------------------------------------------
# incremental profile stream
# ---------------------------------------------------------------------------


def _assert_profiles_equal(a, b):
    """Field-level equality between two TableProfiles (same contract as
    test_partitioning_invariance: counts/min-max/HLL exact; KLL is
    merge-order-sensitive internally so quantiles compare by band).

    The SpaceSaving freq map is compared by ITS contract, not blanket
    equality: counts are byte-equal only while both sides stayed in
    the exact regime (distinct ≤ capacity, no eviction anywhere).
    Above capacity the sketch is merge-order-sensitive by design —
    the stream folds state file-by-file while the batch profiler
    repartitions the scan to the core count (guide §2.5), so their
    eviction histories legitimately differ; what both must still
    satisfy is the structural contract (bounded size, mass ≤ column
    non-null count).  The pre-r06 exact equality here only ever held
    by coincidence of identical fold order."""
    import numpy as np

    assert a.n_rows == b.n_rows
    assert sorted(a.columns()) == sorted(b.columns())
    for col in a.columns():
        x, y = a.column(col), b.column(col)
        assert x.n == y.n and x.n_null == y.n_null, col
        if x.kind == "numeric":
            assert x.min_v == y.min_v and x.max_v == y.max_v, col
            assert np.array_equal(x.hll.registers, y.hll.registers), col
        if x.kind == "string":
            assert x.min_len == y.min_len and x.max_len == y.max_len, col
            if x.freq.is_exact and y.freq.is_exact:
                assert x.freq.counts == y.freq.counts, col
            for s in (x.freq, y.freq):
                assert len(s.counts) <= s.capacity, col
                n_non_null = x.n - x.n_null
                assert sum(s.counts.values()) <= n_non_null, col


def test_profile_stream_matches_batch_and_resumes(spark, tmp_path):
    import os

    from drivel_spark.profiling import profile
    from drivel_spark.streaming import load_stream_profile, profile_stream

    source = str(tmp_path / "clips_psrc")
    state = str(tmp_path / "pstate")
    ckpt = str(tmp_path / "pckpt")
    cols = ["clip_id", "sr_hz", "dur_ms", "codec", "transcript"]

    # wave 1 (2 files) → 2 micro-batches via maxFilesPerTrigger=1:
    # exercises the running-state ⊔ new-batch fold, not just one fold
    _write_wave(spark, source, 0, 400)
    profile_stream(
        spark, source, CLIPS_SCHEMA, state, ckpt,
        columns=cols, max_files_per_trigger=1,
    )
    states = sorted(f for f in os.listdir(state) if f.endswith(".bin"))
    assert len(states) >= 2  # one committed state per micro-batch
    got = load_stream_profile(state)
    want = profile(spark.read.parquet(source).select(*cols))
    _assert_profiles_equal(got, want)

    # wave 2: resumed stream folds ONLY the new files onto the state
    _write_wave(spark, source, 400, 900)
    profile_stream(
        spark, source, CLIPS_SCHEMA, state, ckpt,
        columns=cols, max_files_per_trigger=1,
    )
    got2 = load_stream_profile(state)
    want2 = profile(spark.read.parquet(source).select(*cols))
    _assert_profiles_equal(got2, want2)
    assert got2.n_rows == 900

    # restart with no new data: no new state commits (exactly-once)
    n_states = len(os.listdir(state))
    profile_stream(
        spark, source, CLIPS_SCHEMA, state, ckpt,
        columns=cols, max_files_per_trigger=1,
    )
    assert len(os.listdir(state)) == n_states

    # replay idempotency: re-folding an already-committed batch id is
    # a no-op (the state file for that id wins)
    newest = max(
        int(f.split("_")[1].split(".")[0])
        for f in os.listdir(state)
        if f.endswith(".bin")
    )
    before = open(os.path.join(state, f"state_{newest}.bin"), "rb").read()
    # simulate the at-least-once replay path directly
    from drivel_spark.streaming.profile_stream import _latest_state

    assert _latest_state(state)[0] == newest
    profile_stream(  # stream restart — file-source log skips everything
        spark, source, CLIPS_SCHEMA, state, ckpt,
        columns=cols, max_files_per_trigger=1,
    )
    after = open(os.path.join(state, f"state_{newest}.bin"), "rb").read()
    assert before == after


def test_profile_stream_guards_checkpoint_state_divergence(spark, tmp_path):
    """state_dir and checkpoint_dir must live and die together (ADVICE
    r02): a mismatched pairing fails fast instead of silently skipping
    or dropping batches."""
    import os
    import shutil

    import pytest

    from drivel_spark.streaming import profile_stream

    source = str(tmp_path / "gsrc")
    state = str(tmp_path / "gstate")
    ckpt = str(tmp_path / "gckpt")
    cols = ["clip_id", "sr_hz", "dur_ms", "codec", "transcript"]
    _write_wave(spark, source, 0, 200)
    profile_stream(spark, source, CLIPS_SCHEMA, state, ckpt, columns=cols)
    assert os.path.exists(os.path.join(state, "checkpoint_identity"))

    # kept state + reset (different) checkpoint → stale state_N would
    # silently win; must raise instead
    with pytest.raises(RuntimeError, match="different checkpoint|reset"):
        profile_stream(
            spark, source, CLIPS_SCHEMA, state, str(tmp_path / "gckpt2"),
            columns=cols,
        )

    # wiped state + kept checkpoint → prev=None would fold only new
    # batches, dropping history; must raise instead
    shutil.rmtree(state)
    with pytest.raises(RuntimeError, match="state dir .* is empty"):
        profile_stream(spark, source, CLIPS_SCHEMA, state, ckpt, columns=cols)


def test_stateful_running_stats_resumes(spark, tmp_path):
    """applyInPandasWithState keyed state: per-key running stats over
    a growing source; the state store (not a report scan) carries the
    counters, so a later invocation with the same checkpoint resumes
    them exactly and the final per-key rows equal a batch groupBy over
    everything ever seen."""
    import pandas as pd
    from pyspark.sql import functions as F

    from drivel_spark.streaming import latest_stats, running_stats_stream

    src = str(tmp_path / "src")
    schema = "k string, v double"

    def wave(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    wave([("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", None),
          ("b", float("nan"))])  # NaN folds into null (profiler convention)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    running_stats_stream(spark, src, schema, "k", "v", ckpt, out)
    first = {
        r["k"]: r for r in latest_stats(spark, out, "k").collect()
    }
    assert first["a"]["n"] == 2 and first["a"]["mean"] == 2.0
    assert first["b"]["n"] == 3 and first["b"]["n_null"] == 2
    assert first["b"]["vmin"] == first["b"]["vmax"] == 10.0

    # second wave touches only 'a' (plus a brand-new key) — resume
    wave([("a", 11.0), ("c", 7.0)])
    running_stats_stream(spark, src, schema, "k", "v", ckpt, out)
    final = {r["k"]: r for r in latest_stats(spark, out, "k").collect()}
    assert final["a"]["n"] == 3 and final["a"]["vmax"] == 11.0
    assert final["a"]["mean"] == (1.0 + 3.0 + 11.0) / 3
    assert final["b"]["n"] == 3  # untouched key keeps its last emit
    assert final["c"]["n"] == 1 and final["c"]["mean"] == 7.0

    # a non-numeric value column is rejected, not silently coerced
    import pytest as _pytest

    from drivel_spark.streaming import running_stats

    sdf = spark.readStream.schema(schema).parquet(src)
    with _pytest.raises(ValueError):
        running_stats(sdf, "v", "k")

    # cross-check against the batch engine over everything seen; the
    # operator's documented contract folds NaN into null, so the batch
    # side states the same fold
    vclean = F.when(F.isnan("v"), None).otherwise(F.col("v"))
    batch = (
        spark.read.parquet(src)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("v").isNull() | F.isnan("v")).cast("long")
            ).alias("n_null"),
            F.min(vclean).alias("vmin"),
            F.max(vclean).alias("vmax"),
            F.avg(vclean).alias("mean"),
        )
    )
    for r in batch.collect():
        f = final[r["k"]]
        assert (f["n"], f["n_null"], f["vmin"], f["vmax"], f["mean"]) == (
            r["n"], r["n_null"], r["vmin"], r["vmax"], r["mean"]
        )


def test_windowed_stats_stream_equals_batch_and_drops_late(spark, tmp_path):
    """Event-time windowed aggregation with watermark (stock Spark
    window + withWatermark, append mode): the streamed finalized
    windows must equal a batch groupBy(F.window(...)) over the SAME
    on-time rows, and a row arriving in a later micro-batch behind the
    watermark must be dropped — the two halves of the late-data
    contract.  A resumed run (same checkpoint) must not re-emit
    already-finalized windows."""
    from datetime import datetime

    from drivel_spark.streaming import (
        load_windowed_stats,
        windowed_stats,
        windowed_stats_stream,
    )

    src = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    schema = "k string, ts timestamp, v double"

    def t(minute, second=0):
        return datetime(2024, 1, 1, 0, minute, second)

    def wave(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # wave 1: windows [0,10) and [10,20) plus a far-future sentinel that
    # pushes the watermark (max event time - 5 min) past both
    on_time = [
        ("a", t(1), 1.0),
        ("a", t(4), 3.0),
        ("b", t(7), 10.0),
        ("a", t(12), 5.0),
        ("b", t(14), None),
    ]
    wave(on_time + [("z", t(59), 0.0)])
    windowed_stats_stream(
        spark, src, schema, "ts", "v", ckpt, out,
        window="10 minutes", watermark="5 minutes", key_col="k",
        max_files_per_trigger=1,
    )
    # wave 2: a LATE row for the long-closed [0,10) window — watermark
    # is already at 00:54, so it must be dropped, not re-opened
    wave([("a", t(2), 100.0)])
    windowed_stats_stream(
        spark, src, schema, "ts", "v", ckpt, out,
        window="10 minutes", watermark="5 minutes", key_col="k",
        max_files_per_trigger=1,
    )

    got = {
        (str(r["window_start"]), r["k"]): (
            r["n"], r["n_null"], r["vmin"], r["vmax"], r["mean"]
        )
        for r in load_windowed_stats(spark, out).collect()
    }
    # batch oracle: the SAME windowed_stats plan over only the on-time
    # rows (late row excluded; sentinel window never closes, so exclude
    # it from the comparison too)
    batch = windowed_stats(
        spark.createDataFrame(on_time, schema),
        "ts", "v", window="10 minutes", key_col="k",
    )
    want = {
        (str(r["window_start"]), r["k"]): (
            r["n"], r["n_null"], r["vmin"], r["vmax"], r["mean"]
        )
        for r in batch.collect()
    }
    assert got == want
    # (w0,a) (w0,b) (w1,a) (w1,b); the sentinel's window never closes
    # (nothing advances the watermark past it) and must NOT appear
    assert len(got) == 4
    assert not any("00:50:00" in ws for ws, _ in got)
    # the late 100.0 must not have re-opened or inflated (w0, a)
    w0a = got[("2024-01-01 00:00:00", "a")]
    assert w0a == (2, 0, 1.0, 3.0, 2.0)


def test_load_windowed_stats_empty_out_dir(spark, tmp_path):
    """A pre-created output dir with no finalized batch_id=* commits yet
    (checkpoint resume before the first window closed) must yield an
    empty stats-schema DataFrame, not PATH_NOT_FOUND (ADVICE r04)."""
    from drivel_spark.streaming import load_windowed_stats
    from drivel_spark.streaming.windows import WINDOWED_STATS_FIELDS

    out = tmp_path / "out"
    out.mkdir()
    got = load_windowed_stats(spark, str(out))
    assert got.count() == 0
    want_cols = [f.split()[0] for f in WINDOWED_STATS_FIELDS.split(", ")]
    assert got.columns == want_cols


def test_session_stats_stream_equals_batch(spark, tmp_path):
    """Session windows (gap-merged dynamic windows) streamed in append
    mode must equal the batch session_window aggregation over the same
    on-time rows once the watermark closes the sessions."""
    from datetime import datetime

    from drivel_spark.streaming import session_stats

    src = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    schema = "k string, ts timestamp, v double"

    def t(minute, second=0):
        return datetime(2024, 1, 1, 0, minute, second)

    # key a: two sessions (0-2min burst, then 20-21min burst, gap 5min);
    # key b: one session; z: far-future sentinel advances the watermark
    rows = [
        ("a", t(0), 1.0), ("a", t(1), 2.0), ("a", t(2), 3.0),
        ("a", t(20), 4.0), ("a", t(21), 5.0),
        ("b", t(10), 7.0),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [("z", datetime(2024, 1, 1, 2, 0), 0.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    sess = session_stats(stream, "ts", gap="5 minutes", watermark="5 minutes",
                         key_col="k", value_col="v")

    def commit(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        batch_df.write.mode("overwrite").parquet(f"{out}/batch_id={int(batch_id)}")

    q = (
        sess.writeStream.outputMode("append")
        .foreachBatch(commit)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # one more empty-ish trigger is NOT needed: the sentinel file is a
    # second micro-batch, whose watermark closes every real session
    import os

    assert os.path.isdir(out)
    got_df = spark.read.option("basePath", out).parquet(f"{out}/batch_id=*")
    got = {
        (str(r["session_start"]), r["k"]): (
            r["duration_s"], r["n"], r["vmin"], r["vmax"], r["mean"]
        )
        for r in got_df.collect()
        if r["k"] != "z"
    }
    batch = session_stats(
        spark.createDataFrame(rows, schema), "ts",
        gap="5 minutes", key_col="k", value_col="v",
    )
    want = {
        (str(r["session_start"]), r["k"]): (
            r["duration_s"], r["n"], r["vmin"], r["vmax"], r["mean"]
        )
        for r in batch.collect()
    }
    assert got == want
    assert len(got) == 3  # a×2 sessions + b×1
    # gap merge: a's first session spans 0:00 → 2:00+gap, duration 7 min
    a1 = got[("2024-01-01 00:00:00", "a")]
    assert a1 == (420, 3, 1.0, 3.0, 2.0)


def test_dedup_stream_drops_redelivery_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark-based ingest dedup: the first
    arrival of each clip_id is emitted once; a re-delivery in a LATER
    micro-batch (within the watermark horizon) is dropped; a genuinely
    new id still flows through."""
    from datetime import datetime

    from drivel_spark.streaming import dedup_stream

    src = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    schema = "clip_id string, ts timestamp, v double"

    def t(minute):
        return datetime(2024, 1, 1, 0, minute)

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            dedup_stream(stream, ["clip_id"], "ts", watermark="30 minutes")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # wave 1: c1 twice IN the same batch + c2 once
    spark.createDataFrame(
        [("c1", t(1), 1.0), ("c1", t(1), 1.0), ("c2", t(2), 2.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    # wave 2: c1 re-delivered (same event time, well within the 30-min
    # horizon) + new id c3
    spark.createDataFrame(
        [("c1", t(1), 1.0), ("c3", t(3), 3.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run()

    got = sorted(r["clip_id"] for r in spark.read.parquet(out).collect())
    assert got == ["c1", "c2", "c3"]  # each id exactly once


# ---------------------------------------------------------------------------
# streaming CUSUM monitor (r05)
# ---------------------------------------------------------------------------


def test_streaming_cusum_matches_batch(spark, tmp_path):
    """Two in-order micro-batches through streaming_cusum end at exactly
    the batch detector's final excursions, with the state carrying the
    fold across the batch boundary; a key missing from the baseline
    emits nothing."""
    from datetime import datetime, timedelta

    import numpy as np

    from drivel_spark.ops import cusum_scores
    from drivel_spark.streaming import streaming_cusum

    rng = np.random.default_rng(6)
    t0 = datetime(2024, 1, 1)
    rows = []
    # key "s": calm then +2 sigma shift; key "f": calm; key "x": not in baseline
    for i in range(200):
        rows.append(("s", t0 + timedelta(seconds=i), float(rng.normal(0, 1))))
    for i in range(200, 260):
        rows.append(("s", t0 + timedelta(seconds=i), float(rng.normal(2.0, 1))))
    for i in range(260):
        rows.append(("f", t0 + timedelta(seconds=i), float(rng.normal(0, 1))))
        rows.append(("x", t0 + timedelta(seconds=i), float(rng.normal(0, 1))))
    rows.sort(key=lambda r: r[1])
    schema = "k string, ts timestamp, v double"
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ck"), str(tmp_path / "out")
    half = len(rows) // 2
    # two files, split in ts order -> the stream folds in event order
    spark.createDataFrame(rows[:half], schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows[half:], schema).coalesce(1).write.mode("append").parquet(src)

    baseline = {"s": (0.0, 1.0), "f": (0.0, 1.0)}
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    mon = streaming_cusum(stream, "k", "ts", "v", baseline, h_threshold=8.0)

    def commit(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        batch_df.write.mode("overwrite").parquet(f"{out}/batch_id={int(batch_id)}")

    q = (
        mon.writeStream.outputMode("update")
        .foreachBatch(commit)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got_df = spark.read.option("basePath", out).parquet(f"{out}/batch_id=*")
    # last emission per key = final state
    final = {
        r["k"]: r
        for r in got_df.orderBy("batch_id").collect()
    }
    assert set(final) == {"s", "f"}  # x never emitted

    base_df = spark.createDataFrame(
        [("s", 0.0, 1.0), ("f", 0.0, 1.0)], "k string, mean double, sd double"
    )
    batch = cusum_scores(
        spark.createDataFrame(rows, schema), "k", "ts", "v", baseline=base_df
    )
    from pyspark.sql import Window as W

    last = (
        batch.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("k").orderBy(F.desc("ts"))),
        )
        .where(F.col("rn") == 1)
        .collect()
    )
    want = {r["k"]: (r["s_pos"], r["s_neg"]) for r in last}
    for k in ("s", "f"):
        assert final[k]["s_pos"] == pytest.approx(want[k][0], abs=1e-9), k
        assert final[k]["s_neg"] == pytest.approx(want[k][1], abs=1e-9), k
    assert final["s"]["n_alarms"] > 0 and final["f"]["n_alarms"] == 0
    assert final["s"]["n_seen"] == 260 and final["f"]["n_seen"] == 260


def test_streaming_cusum_empty_baseline():
    from drivel_spark.streaming import streaming_cusum

    with pytest.raises(ValueError, match="baseline"):
        streaming_cusum(None, "k", "ts", "v", {})


# ---------------------------------------------------------------- screens


SCREEN_SPEC = ClipFixtureSpec(
    with_audio=True, distort_every=5, dropout_every=7, hum_every=9
)
SCREEN_KINDS = ["quality", "dropout", "hum"]


def _screen_batch_counts(spark, source, kinds):
    """Batch-side truth: each screen run over the full source snapshot
    (same ops, same published flag policies the stream uses)."""
    from drivel_spark.ops.multimodal import AUDIO_SCREENS, screen_undecodable_col

    df = spark.read.parquet(source)
    out = {}
    for kind in kinds:
        op, flag = AUDIO_SCREENS[kind]
        rep = op(df)
        row = rep.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.expr(flag), 1)).alias("fl"),
            F.count(
                F.when(F.col(screen_undecodable_col(rep)).isNull(), 1)
            ).alias("bad"),
        ).collect()[0]
        out[kind] = (int(row["n"]), int(row["fl"]), int(row["bad"]))
    return out


def _screen_stream_totals(spark, report):
    from drivel_spark.streaming import cumulative_screen

    return {
        r["kind"]: (int(r["n_clips"]), int(r["n_flagged"]), int(r["n_undecodable"]))
        for r in cumulative_screen(spark, report).collect()
    }


def test_screen_stream_matches_batch_and_resumes(spark, tmp_path):
    from drivel_spark.streaming import screen_stream

    source = str(tmp_path / "clips_scr")
    report = str(tmp_path / "scr_report")
    ckpt = str(tmp_path / "scr_ckpt")
    quar = str(tmp_path / "scr_quar")

    # wave 1: 140 clips with planted clipping / dropout / hum defects,
    # maxFilesPerTrigger=1 forces multiple micro-batches
    pdf = clips_pdf(range(0, 140), SCREEN_SPEC)
    spark.createDataFrame(pdf, CLIPS_SCHEMA).coalesce(2).write.mode(
        "append"
    ).parquet(source)
    screen_stream(
        spark,
        source,
        CLIPS_SCHEMA,
        SCREEN_KINDS,
        report,
        ckpt,
        max_files_per_trigger=1,
        quarantine_dir=quar,
    )
    batch1 = _screen_batch_counts(spark, source, SCREEN_KINDS)
    assert _screen_stream_totals(spark, report) == batch1
    # non-vacuous: every planted defect family flags at least one clip
    for kind in SCREEN_KINDS:
        assert batch1[kind][1] >= 1, f"{kind} planted defects not flagged"

    # wave 2 appends; the checkpoint must process ONLY the new files —
    # if old files were redecoded, per-kind n_clips would exceed 220
    pdf2 = clips_pdf(range(140, 220), SCREEN_SPEC)
    spark.createDataFrame(pdf2, CLIPS_SCHEMA).coalesce(2).write.mode(
        "append"
    ).parquet(source)
    screen_stream(
        spark,
        source,
        CLIPS_SCHEMA,
        SCREEN_KINDS,
        report,
        ckpt,
        max_files_per_trigger=1,
        quarantine_dir=quar,
    )
    batch2 = _screen_batch_counts(spark, source, SCREEN_KINDS)
    totals2 = _screen_stream_totals(spark, report)
    assert totals2 == batch2
    assert all(v[0] == 220 for v in totals2.values())

    # quarantine rows = exactly the batch-flagged (clip_id, kind) pairs
    from drivel_spark.ops.multimodal import AUDIO_SCREENS

    got = {
        (r["clip_id"], r["kind"])
        for r in spark.read.option("basePath", quar)
        .parquet(f"{quar}/batch_id=*")
        .collect()
    }
    want = set()
    full = spark.read.parquet(source)
    for kind in SCREEN_KINDS:
        op, flag = AUDIO_SCREENS[kind]
        for r in op(full).filter(F.expr(flag)).select("clip_id").collect():
            want.add((r["clip_id"], kind))
    assert got == want


def test_screen_stream_rejects_unknown_kind(spark, tmp_path):
    from drivel_spark.streaming import screen_stream

    with pytest.raises(ValueError, match="unknown screen"):
        screen_stream(
            spark,
            str(tmp_path / "nosrc"),
            CLIPS_SCHEMA,
            ["quality", "nope"],
            str(tmp_path / "r"),
            str(tmp_path / "c"),
        )
    with pytest.raises(ValueError, match="at least one"):
        screen_stream(
            spark,
            str(tmp_path / "nosrc"),
            CLIPS_SCHEMA,
            [],
            str(tmp_path / "r"),
            str(tmp_path / "c"),
        )


def test_cumulative_screen_empty_report_dir(spark, tmp_path):
    from drivel_spark.streaming import cumulative_screen

    empty = tmp_path / "empty_report"
    empty.mkdir()
    out = cumulative_screen(spark, str(empty))
    assert out.count() == 0
    assert set(out.columns) == {"kind", "n_clips", "n_flagged", "n_undecodable"}


def test_screen_stream_nonfused_fallback_matches_batch(spark, tmp_path):
    """A kind outside FUSED_SCREEN_FIELDS ('loudness') forces the
    per-screen fallback path; totals and quarantine must still equal
    the batch ops."""
    from drivel_spark.ops.multimodal import AUDIO_SCREENS, FUSED_SCREEN_FIELDS
    from drivel_spark.streaming import screen_stream

    kinds = ["quality", "loudness"]
    assert "loudness" not in FUSED_SCREEN_FIELDS
    source = str(tmp_path / "clips_nf")
    report = str(tmp_path / "nf_report")
    quar = str(tmp_path / "nf_quar")
    pdf = clips_pdf(range(0, 100), SCREEN_SPEC)
    spark.createDataFrame(pdf, CLIPS_SCHEMA).coalesce(2).write.mode(
        "append"
    ).parquet(source)
    screen_stream(
        spark,
        source,
        CLIPS_SCHEMA,
        kinds,
        report,
        str(tmp_path / "nf_ckpt"),
        quarantine_dir=quar,
    )
    assert _screen_stream_totals(spark, report) == _screen_batch_counts(
        spark, source, kinds
    )
    got = {
        (r["clip_id"], r["kind"])
        for r in spark.read.option("basePath", quar)
        .parquet(f"{quar}/batch_id=*")
        .collect()
    }
    want = set()
    full = spark.read.parquet(source)
    for kind in kinds:
        op, flag = AUDIO_SCREENS[kind]
        for r in op(full).filter(F.expr(flag)).select("clip_id").collect():
            want.add((r["clip_id"], kind))
    assert got == want


def test_screen_stream_mixed_kinds_matches_batch(spark, tmp_path):
    """A mix of fused-capable and non-fused kinds splits the micro-batch
    work (one fused pass + one per non-fused op); totals and quarantine
    must still equal the batch ops, in the requested kind order."""
    from drivel_spark.ops.multimodal import AUDIO_SCREENS, FUSED_SCREEN_FIELDS
    from drivel_spark.streaming import screen_stream

    kinds = ["quality", "loudness", "dropout", "snr"]
    assert [k for k in kinds if k in FUSED_SCREEN_FIELDS] == [
        "quality", "dropout"
    ]
    source = str(tmp_path / "clips_mx")
    report = str(tmp_path / "mx_report")
    quar = str(tmp_path / "mx_quar")
    pdf = clips_pdf(range(0, 100), SCREEN_SPEC)
    spark.createDataFrame(pdf, CLIPS_SCHEMA).coalesce(2).write.mode(
        "append"
    ).parquet(source)
    screen_stream(
        spark,
        source,
        CLIPS_SCHEMA,
        kinds,
        report,
        str(tmp_path / "mx_ckpt"),
        quarantine_dir=quar,
    )
    assert _screen_stream_totals(spark, report) == _screen_batch_counts(
        spark, source, kinds
    )
    got = {
        (r["clip_id"], r["kind"])
        for r in spark.read.option("basePath", quar)
        .parquet(f"{quar}/batch_id=*")
        .collect()
    }
    want = set()
    full = spark.read.parquet(source)
    for kind in kinds:
        op, flag = AUDIO_SCREENS[kind]
        for r in op(full).filter(F.expr(flag)).select("clip_id").collect():
            want.add((r["clip_id"], kind))
    assert got == want
