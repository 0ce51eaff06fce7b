"""Audio row-level checks as Arrow-vectorized pandas UDFs.

The per-row invariant (BASELINE.json input_hint): decoded PCM must
match the oracle's re-synthesis with SNR ≥ 30 dB, plus transcript
equality.  Decoding runs per Arrow batch (numpy per clip, no per-sample
Python); the clip-index needed for re-synthesis is recovered by a
distributed join against the deterministic (clip_id, idx) mapping —
never a driver-side lookup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..produce.audio import snr_db, snr_vs_synth, synth_pcm, wav_decode

_DECODE_SCHEMA = StructType(
    [
        StructField("wav_ok", BooleanType()),
        StructField("wav_sr", IntegerType()),
        StructField("wav_n_samples", LongType()),
    ]
)


@F.pandas_udf(_DECODE_SCHEMA)
def _decode_meta_udf(payload: pd.Series) -> pd.DataFrame:
    ok, srs, ns = [], [], []
    for b in payload:
        if b is None:
            ok.append(False), srs.append(None), ns.append(None)
            continue
        try:
            pcm, sr = wav_decode(bytes(b))
            ok.append(True), srs.append(sr), ns.append(len(pcm))
        except ValueError:
            ok.append(False), srs.append(None), ns.append(None)
    return pd.DataFrame({"wav_ok": ok, "wav_sr": srs, "wav_n_samples": ns})


def with_decoded_meta(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Adds wav_ok / wav_sr / wav_n_samples columns (batch-vectorized)."""
    return df.withColumn("__wav", _decode_meta_udf(F.col(bytes_col))).select(
        "*", "__wav.wav_ok", "__wav.wav_sr", "__wav.wav_n_samples"
    ).drop("__wav")


def make_snr_udf(seed: int = 42, audio_cap_ms: int = 2000,
                 sr_range: tuple[int, int] = (4000, 48000)):
    """SNR of decoded payload vs deterministic re-synthesis keyed by the
    clip index (fixture oracle).  Returns a pandas UDF
    (bytes, idx, sr_hz, dur_ms) → double."""

    @F.pandas_udf(DoubleType())
    def snr_udf(payload: pd.Series, idx: pd.Series, sr: pd.Series, dur: pd.Series) -> pd.Series:
        out = np.full(len(payload), -np.inf)
        for k in range(len(payload)):
            b = payload.iloc[k]
            if b is None or pd.isna(idx.iloc[k]):
                continue
            try:
                decoded, _ = wav_decode(bytes(b))
            except ValueError:
                continue
            sr_c = int(np.clip(sr.iloc[k], sr_range[0], sr_range[1]))
            dur_c = int(np.clip(dur.iloc[k], 50, audio_cap_ms))
            # chunked accumulation — cache-resident, never materializes
            # the full reference (scales with cores, not DRAM bandwidth)
            out[k] = snr_vs_synth(decoded, int(idx.iloc[k]), sr_c, dur_c, seed)
        return pd.Series(out)

    return snr_udf


def attach_clip_idx(
    df: DataFrame, spark: SparkSession, n_rows: int, seed: int = 42,
    clip_id_col: str = "clip_id", n_partitions: int = 8,
) -> DataFrame:
    """Join the deterministic (clip_id, clip_idx) mapping back onto the
    table — a distributed equi-join (no driver lookup), so the SNR
    invariant check scales with the cluster."""
    from ..fixtures import clip_id_for

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame({clip_id_col: clip_id_for(ids, seed), "clip_idx": ids})

    mapping = spark.range(0, n_rows, numPartitions=n_partitions).mapInPandas(
        gen, f"{clip_id_col} string, clip_idx long"
    )
    # duplicate-injected ids map to one canonical idx (min) so the join
    # stays 1:1 even when uniqueness violations exist
    mapping = mapping.groupBy(clip_id_col).agg(F.min("clip_idx").alias("clip_idx"))
    # broadcast below the threshold so the binary payload column never
    # shuffles; beyond it, fall back to a hash join (AQE may still pick
    # broadcast from runtime stats) — a 10^12-row mapping cannot be
    # driver-resident, and the SNR oracle join must stay distributed
    if n_rows * 64 < 64 << 20:
        mapping = F.broadcast(mapping)
    return df.join(mapping, on=clip_id_col, how="left")


from dataclasses import dataclass
from typing import Optional

from .spec import Constraint


@dataclass(frozen=True)
class PcmSizeConsistency(Constraint):
    """Metadata↔payload byte-size consistency for PCM WAV clips: a
    mono 16-bit RIFF payload of a clip with (sr_hz, dur_ms) metadata
    must be exactly ``header_bytes + bytes_per_sample ·
    rint(sr_hz·dur_ms/1000)`` bytes (``tolerance_bytes`` slack for
    padding chunks).  Catches transcoded-but-unupdated metadata,
    truncated uploads, and duration drift WITHOUT decoding a byte —
    pure Catalyst length arithmetic in the scan, the cheap tier below
    the SNR decode check.  ``rint`` (round-half-even) matches the
    encoder's numpy rounding exactly.  NULL bytes/sr/dur pass
    (nullability is NotNull's job); rows whose ``codec_col`` isn't
    ``codec_value`` pass vacuously (other codecs compress)."""

    bytes_col: str = "bytes"
    sr_col: str = "sr_hz"
    dur_col: str = "dur_ms"
    codec_col: Optional[str] = "codec"
    codec_value: str = "pcm_s16le"
    header_bytes: int = 44
    bytes_per_sample: int = 2
    tolerance_bytes: int = 0

    def predicate(self):
        b, sr, dur = F.col(self.bytes_col), F.col(self.sr_col), F.col(self.dur_col)
        n = F.greatest(
            F.expr(
                f"CAST(rint({self.sr_col} * {self.dur_col} / 1000.0) AS BIGINT)"
            ),
            F.lit(1),
        )
        expected = F.lit(self.header_bytes) + F.lit(self.bytes_per_sample) * n
        ok = F.abs(F.length(b) - expected) <= F.lit(self.tolerance_bytes)
        vacuous = b.isNull() | sr.isNull() | dur.isNull()
        if self.codec_col is not None:
            vacuous = vacuous | (F.col(self.codec_col) != F.lit(self.codec_value))
        return F.when(vacuous, F.lit(True)).otherwise(ok)


def _le_uint(bytes_col: str, pos: int, nbytes: int):
    """Little-endian unsigned int parsed from ``nbytes`` bytes of a
    binary column at 1-indexed ``pos`` — pure Catalyst: hex() the
    slice, reverse its BYTE pairs (hex is big-endian per byte), then
    conv(16→10).  Whole-stage codegen, no UDF, no decode."""
    h = F.hex(F.expr(f"substring({bytes_col}, {pos}, {nbytes})"))
    swapped = F.concat(
        *[F.substring(h, 2 * i + 1, 2) for i in reversed(range(nbytes))]
    )
    return F.conv(swapped, 16, 10).cast("long")


@dataclass(frozen=True)
class WavHeaderCheck(Constraint):
    """Structural WAV header validation WITHOUT decoding a sample —
    the tier below PcmSizeConsistency: all four RIFF magics in place,
    canonical fmt chunk (PCM, mono, 16-bit), the header's OWN declared
    sample rate equal to the ``sr_col`` metadata, and both declared
    sizes (RIFF = len−8, data = len−44) consistent with the actual
    payload length.  Catches corrupted uploads, stereo/float payloads
    mislabeled as pcm_s16le, sr metadata drift, and truncation — each
    as a per-row verdict from pure Catalyst byte arithmetic
    (substring/hex/conv in scan codegen; the only bytes touched are
    the 44-byte header slice Parquet already materialized).

    NULL bytes/sr pass (nullability is NotNull's job); rows whose
    ``codec_col`` isn't ``codec_value`` pass vacuously (other codecs
    have other containers).  Reference parity: the reference validates
    payloads only by re-inference (SURVEY.md §2.10 Filter row); this
    is target-design audio hardening per BASELINE.json's north rule."""

    bytes_col: str = "bytes"
    sr_col: str = "sr_hz"
    codec_col: Optional[str] = "codec"
    codec_value: str = "pcm_s16le"

    def predicate(self):
        b = F.col(self.bytes_col)
        blen = F.length(b)
        tag = lambda pos, lit: F.expr(  # noqa: E731
            f"substring({self.bytes_col}, {pos}, {len(lit)})"
        ) == F.lit(lit)
        le = lambda pos, n: _le_uint(self.bytes_col, pos, n)  # noqa: E731
        ok = (
            (blen >= 44)
            & tag(1, b"RIFF")
            & tag(9, b"WAVE")
            & tag(13, b"fmt ")
            & tag(37, b"data")
            & (le(17, 4) == 16)            # fmt chunk size
            & (le(21, 2) == 1)             # audio format = PCM
            & (le(23, 2) == 1)             # channels = mono
            & (le(25, 4) == F.col(self.sr_col).cast("long"))
            & (le(35, 2) == 16)            # bits per sample
            & (le(5, 4) == (blen - 8).cast("long"))    # RIFF size
            & (le(41, 4) == (blen - 44).cast("long"))  # data size
        )
        vacuous = b.isNull() | F.col(self.sr_col).isNull()
        if self.codec_col is not None:
            vacuous = vacuous | (F.col(self.codec_col) != F.lit(self.codec_value))
        return F.when(vacuous, F.lit(True)).otherwise(ok)
