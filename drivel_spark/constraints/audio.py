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


# per-process cache of the clip_id → canonical clip_idx mapping so a
# reused Python worker (spark.python.worker.reuse) builds it once per
# (n_rows, seed), not once per task; PID-keyed for forked workers
_IDX_CACHE: dict = {}


def _clip_idx_map(n_rows: int, seed: int) -> dict:
    import os

    key = (n_rows, seed, os.getpid())
    m = _IDX_CACHE.get(key)
    if m is None:
        from ..fixtures import clip_id_for

        ids = clip_id_for(np.arange(n_rows, dtype=np.int64), seed)
        m = {}
        for i in range(len(ids)):
            cid = ids[i]
            if cid not in m:  # duplicates canonicalize to the MIN idx
                m[cid] = i
        _IDX_CACHE.clear()  # one live mapping per worker is plenty
        _IDX_CACHE[key] = m
    return m


# narrow clips columns + the computed SNR; the binary payload is
# consumed inside the worker and never crosses back to the JVM
SNR_SOURCE_SCHEMA = (
    "clip_id string, sr_hz int, dur_ms int, codec string, "
    "transcript string, __snr double"
)


def snr_row_source(
    spark: SparkSession,
    clips_dir: str,
    n_rows: int,
    seed: int = 42,
    audio_cap_ms: int = 2000,
    sr_range: tuple[int, int] = (4000, 48000),
) -> DataFrame:
    """Row-level source for the audio-SNR check that never ships the
    payload through the JVM: one task per parquet file reads its file
    directly in the Python worker (pyarrow), decodes + scores every
    clip, and emits only the narrow columns plus ``__snr`` (guide-§8
    shape: heavy opaque bytes move zero times; decisions travel as a
    few bytes per row).  Compared with streaming ``bytes`` into a
    pandas UDF this removes both the JVM parquet materialization of
    the payload column and the JVM→Python Arrow stream — and with it
    the local-mode >8-streams-per-JVM collapse that forced the decode
    stage down to 8 concurrent tasks (BENCH/BASELINE.md): the SNR scan
    now runs at full core count.  On a cluster the same pattern holds
    (workers read their own splits from shared storage).

    Row-identical to the pandas-UDF path: same wav_decode, same
    ``snr_vs_synth`` float64 accumulation, same clamps, same
    missing-idx / decode-failure → −inf policy, one output row per
    input row in file order.
    """
    import glob as _glob
    import os

    files = sorted(_glob.glob(os.path.join(clips_dir, "*.parquet")))
    if not files:
        raise ValueError(f"snr_row_source: no parquet files under {clips_dir}")

    def gen(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        idx_map = _clip_idx_map(n_rows, seed)
        out_type = pa.float64()
        for batch in batches:
            for fid in batch.column("id").to_pylist():
                tbl = pq.read_table(files[fid])
                payloads = tbl.column("bytes").to_pylist()
                srs = tbl.column("sr_hz").to_numpy(zero_copy_only=False)
                durs = tbl.column("dur_ms").to_numpy(zero_copy_only=False)
                cids = tbl.column("clip_id").to_pylist()
                snr = np.full(len(payloads), -np.inf)
                for k in range(len(payloads)):
                    b = payloads[k]
                    idx = idx_map.get(cids[k])
                    if b is None or idx is None:
                        continue
                    try:
                        decoded, _ = wav_decode(b)
                    except ValueError:
                        continue
                    sr_c = int(np.clip(srs[k], sr_range[0], sr_range[1]))
                    dur_c = int(np.clip(durs[k], 50, audio_cap_ms))
                    snr[k] = snr_vs_synth(decoded, idx, sr_c, dur_c, seed)
                out = pa.table(
                    {
                        "clip_id": tbl.column("clip_id"),
                        "sr_hz": tbl.column("sr_hz"),
                        "dur_ms": tbl.column("dur_ms"),
                        "codec": tbl.column("codec"),
                        "transcript": tbl.column("transcript"),
                        "__snr": pa.array(snr, type=out_type),
                    }
                )
                yield from out.to_batches()

    # exactly one file per partition: spark.range splits [0, n) evenly
    manifest = spark.range(0, len(files), numPartitions=len(files))
    return manifest.mapInArrow(gen, SNR_SOURCE_SCHEMA)


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
