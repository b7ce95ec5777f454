"""Pure-stdlib WAV codec: the audio twin of ``functions/png.py``.

Real RIFF/WAVE PCM bytes in and out via the stdlib ``wave`` module +
numpy — no soundfile/librosa dependency — so the engine's audio seam
(``operators/multimodal.py``) can decode ACTUAL audio in any
environment, the same upgrade the round-2 PNG codec gave images.
Supports 16-bit PCM mono/stereo, the format that covers the
overwhelming majority of speech-corpus WAVs; anything else raises
loudly (a real pipeline plugs soundfile into the same seam).
"""

from __future__ import annotations

import io
import wave

import numpy as np


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, n_channels: int = 1
) -> bytes:
    """16-bit PCM WAV bytes from an int16 (or float in [-1,1]) array.
    Shape (n,) for mono or (n, channels) interleaved on write."""
    arr = np.asarray(samples)
    if arr.dtype != np.int16:
        arr = np.clip(arr, -1.0, 1.0)
        arr = (arr * 32767.0).astype(np.int16)
    if arr.ndim == 1 and n_channels > 1:
        arr = np.repeat(arr[:, None], n_channels, axis=1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """(samples float64 in [-1,1] shaped (n,) or (n, ch), sample_rate).
    16-bit PCM only — raises ValueError otherwise."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"only 16-bit PCM supported, got {8 * w.getsampwidth()}-bit"
            )
        n, ch, sr = w.getnframes(), w.getnchannels(), w.getframerate()
        raw = np.frombuffer(w.readframes(n), dtype=np.int16)
    arr = raw.astype(np.float64) / 32768.0
    if ch > 1:
        arr = arr.reshape(-1, ch)
    return arr, sr


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Deterministic clip-level features of a mono waveform: duration,
    RMS energy, peak amplitude, zero-crossing rate, and spectral
    centroid (rFFT magnitude-weighted mean frequency) — the
    quality/VAD-ish signals an audio-corpus pipeline filters on."""
    x = samples if samples.ndim == 1 else samples.mean(axis=1)
    n = len(x)
    if n == 0:
        return dict(
            duration_s=0.0, rms=0.0, peak=0.0, zcr=0.0, centroid_hz=0.0
        )
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.max(np.abs(x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    tot = mag.sum()
    centroid = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
    return dict(
        duration_s=n / sample_rate,
        rms=rms,
        peak=peak,
        zcr=zcr,
        centroid_hz=centroid,
    )
