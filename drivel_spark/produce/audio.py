"""Audio payload synthesis / decoding (the graft's audio axis).

Everything is numpy-vectorized per clip and driven by a deterministic
per-row seed, so the oracle can re-synthesize any clip bit-identically
from its row index alone — which is what makes the per-row invariant
(decoded-PCM allclose, SNR ≥ 30 dB; BASELINE.json input_hint) testable.

WAV (RIFF/PCM16) is encoded/decoded with struct + numpy directly — no
audio libraries exist in this container (task constraint); non-WAV
codecs are stubbed in :mod:`drivel_spark.ops.multimodal`.
"""

from __future__ import annotations

import struct

import numpy as np

# FIXTURES.md F1: tone at f = 110 * (1 + idx mod 40) Hz + gaussian noise
# at −40 dB relative to the tone
TONE_BASE_HZ = 110.0
TONE_STEPS = 40
TONE_AMP = 0.8
NOISE_DB = -40.0


def synth_pcm(clip_idx: int, sr_hz: int, dur_ms: int, seed: int = 42) -> np.ndarray:
    """Deterministic float32 PCM in [-1, 1] for one clip.

    Pure function of (clip_idx, sr_hz, dur_ms, seed): a seeded sine plus
    gaussian noise.  Oracles re-synthesize with the same call.
    """
    n = max(int(round(sr_hz * dur_ms / 1000.0)), 1)
    freq = TONE_BASE_HZ * (1 + (clip_idx % TONE_STEPS))
    t = np.arange(n, dtype=np.float64) / float(sr_hz)
    tone = TONE_AMP * np.sin(2.0 * np.pi * freq * t)
    rng = np.random.default_rng((seed << 32) ^ (clip_idx * 0x9E3779B1 & 0xFFFFFFFF))
    noise_amp = TONE_AMP * (10.0 ** (NOISE_DB / 20.0))
    pcm = tone + rng.normal(0.0, noise_amp, size=n)
    return np.clip(pcm, -1.0, 1.0).astype(np.float32)


def wav_encode(pcm: np.ndarray, sr_hz: int) -> bytes:
    """float PCM [-1,1] → mono 16-bit RIFF/WAVE bytes."""
    data = (np.clip(pcm, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
    n = len(data)
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + n,
        b"WAVE",
        b"fmt ",
        16,  # fmt chunk size
        1,  # PCM
        1,  # mono
        sr_hz,
        sr_hz * 2,  # byte rate
        2,  # block align
        16,  # bits/sample
        b"data",
        n,
    )
    return header + data


def wav_decode(b: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (float32 PCM in [-1,1], sample rate).

    Walks the chunk list (tolerates extra chunks), mono PCM16 only.
    """
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sr = None
    data = None
    while pos + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, pos)
        pos += 8
        if cid == b"fmt ":
            fmt, ch, sr, _, _, bits = struct.unpack_from("<HHIIHH", b, pos)
            if fmt != 1 or ch != 1 or bits != 16:
                raise ValueError(f"unsupported WAV format: fmt={fmt} ch={ch} bits={bits}")
        elif cid == b"data":
            data = b[pos : pos + size]
        pos += size + (size & 1)
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    pcm = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32767.0
    return pcm, sr


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """Signal-to-noise ratio of decoded vs reference PCM, in dB."""
    n = min(len(reference), len(decoded))
    if n == 0 or len(reference) != len(decoded):
        return -np.inf
    ref = reference[:n].astype(np.float64)
    err = ref - decoded[:n].astype(np.float64)
    p_sig = float(np.sum(ref**2))
    p_err = float(np.sum(err**2))
    if p_err == 0.0:
        return np.inf
    if p_sig == 0.0:
        return -np.inf
    return 10.0 * np.log10(p_sig / p_err)


def synth_wav(clip_idx: int, sr_hz: int, dur_ms: int, seed: int = 42) -> bytes:
    return wav_encode(synth_pcm(clip_idx, sr_hz, dur_ms, seed), sr_hz)


# chunk sized so the working set (~6 f64 arrays × 16k × 8B ≈ 0.8MB)
# stays in L2 cache — the SNR scan is then compute-bound and scales
# with cores instead of saturating DRAM bandwidth re-materializing
# full-length f64 reference signals (measured: flat 8→32-core scaling
# with whole-array synthesis, near-linear with chunked accumulation)
_SNR_CHUNK = 16384


def snr_vs_synth(decoded: np.ndarray, clip_idx: int, sr_hz: int, dur_ms: int,
                 seed: int = 42) -> float:
    """SNR (dB) of decoded PCM vs the re-synthesized reference, computed
    chunk-wise without materializing the reference.

    Numerically identical to ``snr_db(synth_pcm(...), decoded)``: the
    per-element math is the same (elementwise ops are chunk-invariant,
    and numpy's Generator produces the same stream drawn in chunks),
    and the power sums accumulate in f64.
    """
    n = max(int(round(sr_hz * dur_ms / 1000.0)), 1)
    if len(decoded) != n:
        return -np.inf
    freq = TONE_BASE_HZ * (1 + (clip_idx % TONE_STEPS))
    rng = np.random.default_rng((seed << 32) ^ (clip_idx * 0x9E3779B1 & 0xFFFFFFFF))
    noise_amp = TONE_AMP * (10.0 ** (NOISE_DB / 20.0))
    p_sig = 0.0
    p_err = 0.0
    for start in range(0, n, _SNR_CHUNK):
        stop = min(start + _SNR_CHUNK, n)
        t = np.arange(start, stop, dtype=np.float64) / float(sr_hz)
        ref = TONE_AMP * np.sin(2.0 * np.pi * freq * t)
        ref += rng.normal(0.0, noise_amp, size=stop - start)
        np.clip(ref, -1.0, 1.0, out=ref)
        # generation quantizes through float32 before PCM16; mirror it
        ref = ref.astype(np.float32).astype(np.float64)
        p_sig += float(np.dot(ref, ref))
        err = ref - decoded[start:stop].astype(np.float64)
        p_err += float(np.dot(err, err))
    if p_err == 0.0:
        return np.inf
    if p_sig == 0.0:
        return -np.inf
    return 10.0 * np.log10(p_sig / p_err)
