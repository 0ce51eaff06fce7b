"""Audio codec round-trip + fixture determinism + the per-row invariant
(decoded-PCM SNR ≥ 30 dB vs oracle re-synthesis; BASELINE.json)."""

import numpy as np
import pandas as pd
import pytest

from drivel_spark.fixtures import (
    CODEC_ENUM,
    ClipFixtureSpec,
    build_clips,
    build_transcripts,
    clip_id_for,
    clips_pdf,
    expected_audio_params,
    transcripts_pdf,
)
from drivel_spark.produce.audio import snr_db, synth_pcm, synth_wav, wav_decode, wav_encode


def test_wav_roundtrip_snr():
    pcm = synth_pcm(7, 16000, 500)
    decoded, sr = wav_decode(wav_encode(pcm, 16000))
    assert sr == 16000
    assert len(decoded) == len(pcm)
    assert snr_db(pcm, decoded) > 80  # 16-bit quantization ≈ 90 dB


def test_wav_decode_rejects_garbage():
    with pytest.raises(ValueError):
        wav_decode(b"not audio at all")


def test_synth_deterministic():
    a = synth_wav(123, 16000, 300)
    b = synth_wav(123, 16000, 300)
    assert a == b
    assert synth_wav(124, 16000, 300) != a


def test_clips_pdf_deterministic_and_slice_consistent():
    whole = clips_pdf(range(2000))
    part = clips_pdf(range(700, 900))
    merged = whole.iloc[700:900].reset_index(drop=True)
    pd.testing.assert_frame_equal(part, merged)


def test_violation_rows_at_known_positions():
    n = 4000
    pdf = clips_pdf(range(n), ClipFixtureSpec(with_audio=False))
    ids = np.arange(n)
    # duplicates: i%1000==500, i>=1000 reuse clip_id(i-999)
    dups = ids[(ids % 1000 == 500) & (ids >= 1000)]
    for i in dups:
        assert pdf["clip_id"][i] == pdf["clip_id"][i - 999]
    assert pdf["clip_id"].duplicated().sum() == len(dups)
    # sr violations
    assert (pdf["sr_hz"] == 12345).sum() == len(ids[ids % 500 == 3])
    # dur violations
    bad_dur = (pdf["dur_ms"] < 200) | (pdf["dur_ms"] > 30000)
    assert bad_dur.sum() == len(ids[ids % 500 == 7])
    # codec violations
    assert (~pdf["codec"].isin(list(CODEC_ENUM))).sum() == len(ids[ids % 1000 == 11])
    # transcript nulls
    assert pdf["transcript"].isna().sum() == len(ids[ids % 200 == 13])


def test_clean_variant_no_violations():
    pdf = clips_pdf(range(3000), ClipFixtureSpec(variant="clean", with_audio=False))
    assert pdf["clip_id"].duplicated().sum() == 0
    assert (pdf["sr_hz"] == 12345).sum() == 0
    assert ((pdf["dur_ms"] < 200) | (pdf["dur_ms"] > 30000)).sum() == 0
    assert (~pdf["codec"].isin(list(CODEC_ENUM))).sum() == 0
    assert pdf["transcript"].isna().sum() == 0


def test_drifted_variant_shifts_duration():
    base = clips_pdf(range(5000), ClipFixtureSpec(variant="clean", with_audio=False))
    drift = clips_pdf(range(5000), ClipFixtureSpec(variant="drifted", with_audio=False))
    assert drift["dur_ms"].median() > 1.3 * base["dur_ms"].median()


def test_per_row_pcm_invariant():
    """Decode each payload and compare against oracle re-synthesis:
    allclose + SNR ≥ 30 dB (input_hint)."""
    spec = ClipFixtureSpec()
    ids = np.arange(0, 50)
    pdf = clips_pdf(ids, spec)
    sr_c, dur_c = expected_audio_params(ids, spec)
    for k in range(len(ids)):
        decoded, sr = wav_decode(pdf["bytes"][k])
        assert sr == sr_c[k]
        ref = synth_pcm(int(ids[k]), int(sr_c[k]), int(dur_c[k]), spec.seed)
        assert len(decoded) == len(ref)
        assert snr_db(ref, decoded) >= 30.0
        assert np.allclose(ref, decoded, atol=2.5 / 32767.0)


def test_chunked_snr_equals_whole_array_snr():
    """snr_vs_synth (cache-resident chunked accumulation, the scan's
    hot path) must be numerically identical to snr_db(synth_pcm(...))
    — including across chunk boundaries and length mismatches."""
    from drivel_spark.produce.audio import _SNR_CHUNK, snr_vs_synth

    for idx, sr, dur in [(0, 8000, 137), (7, 48000, 2000), (1234, 22050, 654),
                         (40, 16000, 1000 * _SNR_CHUNK // 16000 + 1)]:
        decoded, _ = wav_decode(synth_wav(idx, sr, dur, 42))
        ref = synth_pcm(idx, sr, dur, 42)
        assert abs(snr_db(ref, decoded) - snr_vs_synth(decoded, idx, sr, dur, 42)) < 1e-9
    # corrupted payload (wrong clip index) and truncation both fail
    decoded, _ = wav_decode(synth_wav(5, 16000, 500, 42))
    assert snr_vs_synth(decoded, 6, 16000, 500, 42) < 30.0
    assert snr_vs_synth(decoded, 5, 16000, 400, 42) == -np.inf


def test_transcripts_fixture_referential_holes():
    n = 4000
    ids = np.arange(n)
    clips = clips_pdf(ids, ClipFixtureSpec(with_audio=False))
    tr = transcripts_pdf(ids)
    # clips with no transcript row: i%333==17 (minus any dup-overridden ids)
    missing = set(clip_id_for(ids[ids % 333 == 17], 42))
    assert missing.isdisjoint(set(tr["clip_id"]))
    # ghost transcript rows reference nonexistent clips
    ghosts = set(tr["clip_id"]) - set(clips["clip_id"])
    assert len(ghosts) == len(ids[ids % 500 == 29])


def test_spark_build_matches_pandas_oracle(spark):
    spec = ClipFixtureSpec(with_audio=False)
    df = build_clips(spark, 1000, n_partitions=7, spec=spec)
    got = df.toPandas().sort_values("clip_id").reset_index(drop=True)
    want = clips_pdf(range(1000), spec).sort_values("clip_id").reset_index(drop=True)
    got["bytes"] = None
    want["bytes"] = None
    want["sr_hz"] = want["sr_hz"].astype("int32")
    want["dur_ms"] = want["dur_ms"].astype("int32")
    pd.testing.assert_frame_equal(got, want)


def test_spark_transcripts_build(spark):
    df = build_transcripts(spark, 1000, n_partitions=5)
    got = df.toPandas().sort_values(["clip_id", "transcript"]).reset_index(drop=True)
    want = transcripts_pdf(range(1000)).sort_values(["clip_id", "transcript"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
