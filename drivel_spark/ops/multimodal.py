"""Multimodal payload plumbing: opaque binary columns + typed metadata.

The Spark-side architecture is real and tested — schemas, Arrow batch
shapes, mapInPandas signatures, partition sizing for ~100KB payloads —
while media decoding beyond WAV is STUBBED (this container has no
image/audio/video libraries; task constraint).  Stubs either raise
``NotImplementedError`` (strict mode) or produce a deterministic fake
feature vector derived from the payload hash (plumbing-test mode).

Audio WAV decode is REAL (drivel_spark.produce.audio) — it is the
graft's payload type.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..produce.audio import wav_decode
from ..sketches.hashing import hash64

AUDIO_FEATURES_SCHEMA = (
    "n_samples long, sr_hz int, duration_ms double, rms double, peak double, "
    "zero_crossings long, dominant_band int"
)

FAKE_EMBED_DIM = 16


def extract_audio_features(df: DataFrame, bytes_col: str = "bytes",
                           id_cols: Optional[list[str]] = None) -> DataFrame:
    """Real audio feature extraction (WAV): RMS / peak / zero-crossings /
    crude dominant band, numpy per clip inside Arrow batches."""
    id_cols = id_cols or ["clip_id"]

    def fn(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = {c: pdf[c] for c in id_cols}
            feats = {k: [] for k in ("n_samples", "sr_hz", "duration_ms", "rms",
                                     "peak", "zero_crossings", "dominant_band")}
            for b in pdf[bytes_col]:
                if b is None:
                    for k in feats:
                        feats[k].append(None)
                    continue
                try:
                    pcm, sr = wav_decode(bytes(b))
                except ValueError:
                    for k in feats:
                        feats[k].append(None)
                    continue
                n = len(pcm)
                feats["n_samples"].append(n)
                feats["sr_hz"].append(sr)
                feats["duration_ms"].append(1000.0 * n / sr)
                feats["rms"].append(float(np.sqrt(np.mean(pcm**2))) if n else 0.0)
                feats["peak"].append(float(np.max(np.abs(pcm))) if n else 0.0)
                feats["zero_crossings"].append(int(np.sum(np.abs(np.diff(np.signbit(pcm)))))if n > 1 else 0)
                # dominant band index via 8-bin |FFT| argmax (crude)
                if n >= 16:
                    spec = np.abs(np.fft.rfft(pcm))
                    bins = np.array_split(spec, 8)
                    feats["dominant_band"].append(int(np.argmax([float(x.sum()) for x in bins])))
                else:
                    feats["dominant_band"].append(0)
            out = pd.DataFrame({**rows, **feats})
            yield out

    schema = ", ".join(
        f"{c} string" for c in id_cols
    ) + ", " + AUDIO_FEATURES_SCHEMA
    return df.select(*id_cols, bytes_col).mapInPandas(fn, schema)


# ---------------------------------------------------------------------------
# stubbed modalities — real plumbing, fake/raising decode
# ---------------------------------------------------------------------------


def _fake_embedding_batch(payload: pd.Series, dim: int) -> list:
    """Deterministic stand-in feature vector: dim uniforms seeded by the
    payload's stable hash (keeps the pipeline testable end-to-end)."""
    out = []
    for b in payload:
        if b is None:
            out.append(None)
            continue
        h = int(hash64(np.array([bytes(b)], dtype=object))[0])
        rng = np.random.default_rng(h % 2**63)
        out.append(rng.random(dim).astype(np.float32).tolist())
    return out


def decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB: no image codec in this environment.

    The real implementation would PIL/cv2-decode to HxWxC uint8; the
    Spark plumbing around it (schema, batching) is what's tested.
    """
    raise NotImplementedError("image decoding unavailable in this environment")


def sample_video_frames_stub(payload: bytes, every_ms: int = 1000) -> list[np.ndarray]:
    """STUB: no video codec in this environment."""
    raise NotImplementedError("video decoding unavailable in this environment")


def embed_binary_column(
    df: DataFrame,
    bytes_col: str = "bytes",
    id_cols: Optional[list[str]] = None,
    dim: int = FAKE_EMBED_DIM,
    strict: bool = False,
) -> DataFrame:
    """binary → array<float> feature column via mapInPandas.

    strict=True raises (honest stub); strict=False emits the
    deterministic fake embedding so downstream similarity / dedup
    pipelines exercise the exact production plumbing: schema
    ``id..., embedding array<float>``, Arrow-batched, partition-sized
    for large payloads.
    """
    id_cols = id_cols or ["clip_id"]

    def fn(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "non-WAV media decoding unavailable; use strict=False for plumbing tests"
                )
            yield pd.DataFrame(
                {
                    **{c: pdf[c] for c in id_cols},
                    "embedding": _fake_embedding_batch(pdf[bytes_col], dim),
                }
            )

    schema = ", ".join(f"{c} string" for c in id_cols) + ", embedding array<float>"
    return df.select(*id_cols, bytes_col).mapInPandas(fn, schema)
