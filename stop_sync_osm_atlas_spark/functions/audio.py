"""Audio feature extraction over opaque binary columns (multimodal plumbing).

Same seam design as functions/image.py and functions/video.py: audio is
an opaque ``binary`` cell; the decoder is the swap point for a real
codec (soundfile/librosa are not in this container). The deterministic
container is raw little-endian int16 PCM behind a tiny header, so the
Spark-side plumbing — schema, Arrow batch shape, windowed feature
aggregation — is real and tested.

Container layout: MAGIC | sample_rate:u32 | n_samples:u32 | pcm:i16[n]
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_MAGIC = b"SGA1"
_HDR = struct.Struct("<4sII")

AUDIO_FEATURES_SCHEMA = (
    "audio_id string, sample_rate int, duration_s double, rms double, "
    "zero_cross_rate double, n_windows int, ok boolean"
)


def encode_audio(seed: int, sample_rate: int, n_samples: int) -> bytes:
    """Deterministic fake: seeded int16 noise-with-tone PCM."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples, dtype=np.float64) / sample_rate
    wave = 0.5 * np.sin(2 * np.pi * (220 + seed % 440) * t)
    wave += 0.1 * rng.standard_normal(n_samples)
    pcm = np.clip(wave * 32767, -32768, 32767).astype("<i2")
    return _HDR.pack(AUDIO_MAGIC, sample_rate, n_samples) + pcm.tobytes()


def decode_audio(b: bytes) -> tuple[int, np.ndarray] | None:
    """(sample_rate, float64 waveform in [-1,1]) or None. The codec seam."""
    if b is None or len(b) < _HDR.size:
        return None
    magic, sr, n = _HDR.unpack_from(b)
    if magic != AUDIO_MAGIC or sr <= 0 or len(b) != _HDR.size + 2 * n:
        return None
    pcm = np.frombuffer(b, dtype="<i2", offset=_HDR.size)
    return sr, pcm.astype(np.float64) / 32768.0


def audio_features(audios: DataFrame, window_s: float = 0.5) -> DataFrame:
    """(audio_id, bytes) -> per-clip features, Arrow-batched.

    RMS and zero-crossing rate over the whole clip plus the count of
    ``window_s`` analysis windows — the standard cheap quality signals a
    corpus pipeline gates on (silence / clipping / truncation) before
    expensive transcription. Corrupt cells yield ok=false rows; bytes
    never reach the driver.
    """

    def _op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            sr = np.zeros(n, dtype=np.int64)
            dur = np.zeros(n)
            rms = np.full(n, np.nan)
            zcr = np.full(n, np.nan)
            nw = np.zeros(n, dtype=np.int64)
            ok = np.zeros(n, dtype=bool)
            for i, b in enumerate(pdf["bytes"]):
                dec = decode_audio(b)
                if dec is None:
                    continue
                rate, wave = dec
                ok[i] = True
                sr[i] = rate
                dur[i] = len(wave) / rate
                if len(wave):
                    rms[i] = float(np.sqrt((wave * wave).mean()))
                    # a 1-sample clip has no crossings, not NaN-many:
                    # mean() of the empty slice would emit a numpy
                    # RuntimeWarning per row and a NaN on an ok=True row
                    zcr[i] = (
                        float(
                            (
                                np.signbit(wave[1:]) != np.signbit(wave[:-1])
                            ).mean()
                        )
                        if len(wave) > 1
                        else 0.0
                    )
                nw[i] = int(len(wave) // max(1, int(window_s * rate)))
            yield pd.DataFrame(
                {
                    "audio_id": pdf["audio_id"],
                    "sample_rate": sr,
                    "duration_s": dur,
                    "rms": rms,
                    "zero_cross_rate": zcr,
                    "n_windows": nw,
                    "ok": ok,
                }
            )

    return audios.select("audio_id", "bytes").mapInPandas(
        _op, schema=AUDIO_FEATURES_SCHEMA
    )
