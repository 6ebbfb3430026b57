"""Mel filterbank and dB conversion with librosa-compatible math.

The reference builds its filterbank at import time via
``librosa.filters.mel(sr, NFFT, 64, fmin=20, fmax=24000).T``
(reference: dataset/spectogram/preprocess.py:13-18) and converts mel power to
dB via ``librosa.core.power_to_db(x, ref=1.0, amin=1e-10, top_db=None)``
(preprocess.py:42-44).  librosa is not a dependency of this framework, so we
re-derive the identical Slaney-style filterbank (librosa defaults:
``htk=False``, ``norm='slaney'``) in float64 numpy and expose it as a
precomputed constant for the TPU featurizer.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from sed_tpu.configs import SpectrogramConfig, DEFAULT_SPECTROGRAM

# Slaney auditory-toolbox mel scale constants (librosa hz_to_mel/mel_to_hz,
# htk=False).
_F_SP = 200.0 / 3.0
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(frequencies) -> np.ndarray:
    """Slaney-scale Hz -> mel (float64)."""
    f = np.asarray(frequencies, dtype=np.float64)
    mels = f / _F_SP
    log_region = f >= _MIN_LOG_HZ
    mels = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(f, 1e-30) / _MIN_LOG_HZ) / _LOGSTEP,
        mels,
    )
    return mels


def mel_to_hz(mels) -> np.ndarray:
    """Slaney-scale mel -> Hz (float64)."""
    m = np.asarray(mels, dtype=np.float64)
    freqs = m * _F_SP
    log_region = m >= _MIN_LOG_MEL
    freqs = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), freqs)
    return freqs


def mel_frequencies(n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """n_mels frequencies spaced uniformly on the Slaney mel scale."""
    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels)
    return mel_to_hz(mels)


def fft_frequencies(sr: float, n_fft: int) -> np.ndarray:
    return np.linspace(0.0, sr / 2.0, 1 + n_fft // 2, dtype=np.float64)


@functools.lru_cache(maxsize=8)
def _mel_filterbank_cached(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float):
    weights = np.zeros((n_mels, 1 + n_fft // 2), dtype=np.float64)
    fftfreqs = fft_frequencies(sr, n_fft)
    mel_f = mel_frequencies(n_mels + 2, fmin, fmax)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney-style area normalization.
    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights


def mel_filterbank(cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM, dtype=np.float32) -> np.ndarray:
    """(freq_bins, mel_bins) filterbank, transposed like the reference constant.

    Equals ``librosa.filters.mel(sr, NFFT, n_mels, fmin, fmax).T`` bit-for-bit
    in float64 before the final cast (reference: preprocess.py:13-18).
    """
    w = _mel_filterbank_cached(
        cfg.working_sample_rate, cfg.nfft, cfg.mel_bins,
        float(cfg.mel_min_freq), float(cfg.mel_max_freq),
    )
    return w.T.astype(dtype)


def log10_precise(x: jnp.ndarray) -> jnp.ndarray:
    """float32 log10 accurate to ~1 ulp, for TPU.

    The TPU VPU's hardware log approximation carries ~3e-5 relative error —
    measured to dominate the featurizer's dB parity budget (every other stage
    is <1e-7).  This software implementation extracts the exponent exactly by
    bit manipulation and evaluates the mantissa log with an atanh series after
    sqrt(2) range reduction (|s| <= 0.1716, five terms reach <1e-9):
        x = m * 2^e, m in [sqrt(2)/2, sqrt(2)),  s = (m-1)/(m+1)
        ln m = 2s(1 + s^2/3 + s^4/5 + s^6/7 + s^8/9)
        ln x = e*ln2_hi + (ln m + e*ln2_lo)      (split constant keeps e*ln2 exact)
    Requires positive normal inputs (callers clamp at amin=1e-10 >> FLT_MIN).
    """
    x = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    m = jax.lax.bitcast_convert_type(
        (bits & 0x007FFFFF) | (127 << 23), jnp.float32
    )  # [1, 2)
    big = m > 1.4142135
    m = jnp.where(big, m * 0.5, m)
    e = (e + big.astype(jnp.int32)).astype(jnp.float32)

    s = (m - 1.0) / (m + 1.0)
    s2 = s * s
    p = jnp.float32(1.0 / 9.0)
    p = p * s2 + jnp.float32(1.0 / 7.0)
    p = p * s2 + jnp.float32(1.0 / 5.0)
    p = p * s2 + jnp.float32(1.0 / 3.0)
    p = p * s2 + jnp.float32(1.0)
    ln_m = 2.0 * s * p

    ln2_hi = jnp.float32(0.693359375)        # exact in 12 mantissa bits
    ln2_lo = jnp.float32(-2.12194440e-4)
    ln_x = e * ln2_hi + (ln_m + e * ln2_lo)
    return ln_x * jnp.float32(0.4342944819032518)  # 1/ln(10)


def power_to_db(power, amin: float = 1e-10, ref: float = 1.0):
    """10*log10(max(amin, x)) - 10*log10(max(amin, ref)), top_db=None.

    Matches ``librosa.core.power_to_db(x, ref=1.0, amin=1e-10, top_db=None)``
    (reference: preprocess.py:42-44).  Works on jax or numpy arrays; the jax
    path uses :func:`log10_precise` (the hardware log approximation is the
    dominant parity error on TPU).
    """
    if isinstance(power, jnp.ndarray):
        log_spec = 10.0 * log10_precise(jnp.maximum(amin, power))
        log_spec = log_spec - 10.0 * float(np.log10(max(amin, ref)))
        return log_spec
    log_spec = 10.0 * np.log10(np.maximum(amin, power))
    return log_spec - 10.0 * np.log10(np.maximum(amin, ref))
