"""Synthetic-data production: audio payload synthesis/decoding and the
distributed column-generator path (spark.range → seeded generators)."""

from .audio import snr_db, synth_pcm, synth_wav, wav_decode, wav_encode

__all__ = ["snr_db", "synth_pcm", "synth_wav", "wav_decode", "wav_encode"]
