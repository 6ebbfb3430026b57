"""Host-side audio reading, channel policy, and resampling.

Reference: dataset/dataset_utils.py:63-86 (``read_multichannel_audio``):
soundfile.read -> force (samples, channels) -> channel policy (mono-ize by
mean / repeat mean / truncate) -> per-channel librosa.resample to 48 kHz.

Neither soundfile nor librosa exists in this environment, so this module owns
the WAV decode itself.  Decode order of preference:
  1. the native C++ decoder (sed_tpu.io.native) when its shared library is
     built — PCM 16/24/32 and float32/64, fully vectorized;
  2. scipy.io.wavfile with soundfile-compatible float normalization
     (int16/2^15, int32/2^31, uint8 offset-binary).

Resampling uses a polyphase windowed-sinc filter (scipy.signal.resample_poly
with a Kaiser window), the same family of resampler as librosa's default
backend; exact sample parity with librosa's soxr is not required because the
TAU dataset is already at the 48 kHz working rate (SURVEY.md §2 C4).
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np

from sed_tpu.configs import AudioConfig, DEFAULT_AUDIO


def _normalize_to_float(data: np.ndarray) -> np.ndarray:
    """Integer PCM -> float64 in [-1, 1), like soundfile.read defaults."""
    if data.dtype == np.int16:
        return data.astype(np.float64) / 2.0**15
    if data.dtype == np.int32:
        return data.astype(np.float64) / 2.0**31
    if data.dtype == np.uint8:
        return (data.astype(np.float64) - 128.0) / 128.0
    return data.astype(np.float64)


def read_wav(path: str):
    """Decode a WAV file -> (float64 (samples, channels), sample_rate)."""
    try:
        from sed_tpu.io.native import native_available, read_wav_native

        if native_available():
            return read_wav_native(path)
    except ImportError:
        pass
    from scipy.io import wavfile

    sample_rate, data = wavfile.read(path)
    data = _normalize_to_float(np.asarray(data))
    if data.ndim == 1:
        data = data[:, None]
    return data, sample_rate


def write_wav(path: str, data: np.ndarray, sample_rate: int) -> None:
    """Write float audio as 16-bit PCM (used by analysis scripts)."""
    from scipy.io import wavfile

    clipped = np.clip(np.asarray(data, dtype=np.float64), -1.0, 1.0)
    wavfile.write(path, sample_rate, (clipped * 32767.0).astype(np.int16))


KAISER_BEST_BETA = 14.769656459379492
KAISER_BEST_ZERO_CROSSINGS = 64


def _kaiser_sinc_fir(up: int, down: int,
                     beta: float = KAISER_BEST_BETA,
                     half_zero_crossings: int = KAISER_BEST_ZERO_CROSSINGS) -> np.ndarray:
    """Windowed-sinc FIR at the up-rate grid: cutoff pi/max(up, down), Kaiser
    window, half-width ``half_zero_crossings`` input-rate zero crossings, gain
    ``up`` — the same design as native/sed_native.cpp:178-195 (the
    resampy-kaiser_best filter class).

    Passing an explicit FIR matters: scipy's ``resample_poly(window=("kaiser",
    beta))`` sizes the filter at only 10 half-crossings — far too short for
    beta=14.77's 150 dB design, which widens the transition band into the
    audible range (measured -11.8 dBFS error on a 19 kHz tone at 44.1->48 kHz;
    benchmarks/resampler_parity.py).  With this 64-crossing design the scipy
    path measures <= -140 dBFS against a float64 ideal oracle on tones and
    band-limited noise, matching the native resampler.
    """
    g = max(up, down)
    half = half_zero_crossings * g
    t = np.arange(-half, half + 1, dtype=np.float64)
    cutoff = 1.0 / g
    # Unit passband gain here; scipy's resample_poly scales array windows by
    # ``up`` itself (the native kernel bakes the gain in instead).
    h = np.sinc(t * cutoff) * cutoff
    w = t / half
    h *= np.i0(beta * np.sqrt(np.maximum(1.0 - w * w, 0.0))) / np.i0(beta)
    return h


def resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample of a 1-D signal (windowed-sinc, Kaiser beta=14.77,
    64 zero crossings — the kaiser_best design).

    Matches the quality class of librosa's high-quality resampler: measured
    <= -140 dBFS max error vs a float64 ideal band-limited oracle at
    44.1->48 kHz (benchmarks/RESAMPLER_PARITY.json).
    """
    from scipy.signal import resample_poly

    frac = Fraction(target_sr, orig_sr)
    up, down = frac.numerator, frac.denominator
    return resample_poly(x, up, down, window=_kaiser_sinc_fir(up, down))


def read_multichannel_audio(
    audio_path: str,
    target_fs: int | None = None,
    cfg: AudioConfig = DEFAULT_AUDIO,
) -> np.ndarray:
    """Read + channel policy + resample; returns float64 (samples, channels).

    Channel policy parity (dataset_utils.py:68-76): with fewer channels than
    requested, repeat the mean channel; with ``audio_channels == 1``, mono-ize
    by mean; with more channels, truncate.
    """
    audio, sample_rate = read_wav(audio_path)
    if audio.shape[1] < cfg.audio_channels:
        audio = np.repeat(audio.mean(axis=1, keepdims=True), cfg.audio_channels, axis=1)
    elif cfg.audio_channels == 1:
        audio = audio.mean(axis=1, keepdims=True)
    elif audio.shape[1] > cfg.audio_channels:
        audio = audio[:, : cfg.audio_channels]

    if target_fs is not None and sample_rate != target_fs:
        audio = np.stack(
            [resample(audio[:, i], sample_rate, target_fs) for i in range(audio.shape[1])],
            axis=1,
        )
    return audio


def read_multichannel_audio_batch(
    audio_paths,
    target_fs: int | None = None,
    cfg: AudioConfig = DEFAULT_AUDIO,
    workers: int = 0,
) -> list:
    """Batch acquisition: many files -> list of float32 (samples, channels).

    ``workers <= 1`` loads sequentially through
    :func:`read_multichannel_audio` (identical math to the per-file path).
    ``workers > 1`` runs decode+policy+resample concurrently — on the native
    C++ thread pool when the shared library is built (fully GIL-free;
    native/sed_native.cpp sed_load_multichannel_batch), otherwise a
    ThreadPoolExecutor over the Python path.  The native resampler is the
    same Kaiser design as the scipy path, both measured <= -140 dBFS vs a
    float64 oracle (benchmarks/RESAMPLER_PARITY.json; divergence #4 in
    PARITY.md), so mixing paths never crosses the parity budget; at equal
    rates (TAU is already 48 kHz) native and Python agree to float32
    rounding.  Output is float32 — what every downstream featurizer
    consumes (the per-file reader returns float64 only to mirror
    soundfile.read defaults).
    """
    audio_paths = list(audio_paths)
    if workers > 1 and len(audio_paths) > 1:
        try:
            from sed_tpu.io.native import (load_multichannel_batch_native,
                                           native_available)

            if native_available():
                return load_multichannel_batch_native(
                    audio_paths, cfg.audio_channels, target_fs,
                    threads=workers)
        except ImportError:
            pass
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as ex:
            return [w.astype(np.float32) for w in ex.map(
                lambda p: read_multichannel_audio(p, target_fs, cfg),
                audio_paths)]
    return [read_multichannel_audio(p, target_fs, cfg).astype(np.float32)
            for p in audio_paths]
