"""Waveform -> log-mel featurizer (public API mirroring the reference).

Reference pipeline (dataset/spectogram/preprocess.py:21-45):
  ``multichannel_stft``                (samples, channels) -> (channels, frames, nfft//2+1)
  ``multichannel_complex_to_log_mel``  |X|^2 -> @ mel filterbank -> power_to_db

Here the same two functions are jit-compiled XLA programs; ``logmel_features``
fuses the whole chain in one jit so XLA can fuse window/power/log elementwise
work into the FFT/matmul pipeline, and an optional Pallas kernel
(sed_tpu.ops.pallas_featurizer) implements the power->mel->log stage as a
single fused MXU kernel.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp

from sed_tpu.configs import SpectrogramConfig, DEFAULT_SPECTROGRAM
from sed_tpu.ops import mel as mel_ops
from sed_tpu.ops import stft as stft_ops

FftImpl = Literal["fft", "matmul"]


def multichannel_stft(
    waveform: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    fft_impl: FftImpl = "fft",
) -> jnp.ndarray:
    """(samples, channels) -> (channels, frames, nfft//2+1) complex64.

    Matches reference multichannel_stft (preprocess.py:21-36): per-channel
    centered STFT with a symmetric Hann window, transposed frames-major.
    """
    chans_first = jnp.swapaxes(waveform, 0, 1)  # (channels, samples)
    return jax.vmap(lambda y: stft_ops.stft(y, cfg, fft_impl))(chans_first)


def multichannel_complex_to_log_mel(
    spec: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """|X|^2 -> mel projection -> 10*log10(max(1e-10, .)), float32.

    Matches reference multichannel_complex_to_log_mel (preprocess.py:39-45).
    Accepts any (..., freq_bins) array: complex spectrograms, or the
    already-normalized complex features of the 'Complex' dataset mode
    (spectograms_dataset.py:104-110), or raw rfft rows as used by the SVM
    baseline (Classical_methods/train_svm_detector.py:66-68).
    """
    power = jnp.abs(spec).astype(jnp.float32) ** 2
    if use_pallas:
        from sed_tpu.ops.pallas_featurizer import power_to_logmel_pallas

        return power_to_logmel_pallas(power, cfg)
    fb = jnp.asarray(mel_ops.mel_filterbank(cfg))
    mel = jnp.matmul(power, fb, precision=jax.lax.Precision.HIGHEST)
    return mel_ops.power_to_db(mel).astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def logmel_features(
    waveform: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    fft_impl: FftImpl = "fft",
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Fused featurizer: (samples, channels) -> (channels, frames, mel_bins)."""
    spec = multichannel_stft(waveform, cfg, fft_impl)
    return multichannel_complex_to_log_mel(spec, cfg, use_pallas)


def logmel_features_batch(
    waveforms: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    fft_impl: FftImpl = "fft",
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Batched featurizer: (batch, samples, channels) -> (batch, channels, frames, mel)."""
    return jax.vmap(lambda w: logmel_features(w, cfg, fft_impl, use_pallas))(waveforms)
