"""Waveform -> log-mel featurizer (public API mirroring the reference).

Reference pipeline (dataset/spectogram/preprocess.py:21-45):
  ``multichannel_stft``                (samples, channels) -> (channels, frames, nfft//2+1)
  ``multichannel_complex_to_log_mel``  |X|^2 -> @ mel filterbank -> power_to_db

Here the same two functions are jit-compiled XLA programs, and
``logmel_features`` fuses the whole chain in one jit.  On TPU the pipeline is
complex-free end to end (this environment's TPU backend has no complex-dtype
support): the matmul rFFT produces (real, imag) float32 pairs and the power
spectrum |X|^2 = re^2 + im^2 feeds the mel matmul directly.  An optional
Pallas kernel (sed_tpu.ops.pallas_featurizer) fuses power -> mel matmul ->
log10 into a single MXU pass.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp

from sed_tpu.configs import SpectrogramConfig, DEFAULT_SPECTROGRAM
from sed_tpu.ops import mel as mel_ops
from sed_tpu.ops import stft as stft_ops

FftImpl = Literal["fft", "matmul", "auto"]

# Serving precision tiers for the fused Pallas featurizer's FFT matmuls
# (the mel stage is always bf16x4 — hardware-measured safe for its
# all-positive accumulation; see ops/pallas_featurizer.py:_make_dot).
# Hardware ladder (v5e, 16x60 s pipeline; benchmarks/FAST_FEATURIZER.json):
#
#   'parity' — Precision.HIGHEST FFT: the golden-tested default,
#              <=1e-5 dB vs the float64 oracle on TPU.  NEVER change this
#              default (CLAUDE.md pins the FFT precision tier).
#   'fast'   — bf16x3 split-operand: 1.27x end-to-end (99.7k vs 78.6k
#              audio-s/s); feature error <=2.3e-5 dB on broadband noise,
#              up to ~0.5 dB only in near-floor bins of dense tonal
#              content; score-level: 0 measured sigmoid deviation, AP
#              unchanged on the synthetic corpus.  (bf16x4 measured
#              STRICTLY WORSE: slower with the same fidelity class.)
#   'turbo'  — single-pass bf16 matmuls: 1.71x (134.0k audio-s/s); noise
#              error 0.016 dB, floor bins of tonal content off by tens of
#              dB, max sigmoid deviation 6.2e-4 (10x inside the 0.006 int8
#              serving budget), AP unchanged.
FEATURIZER_PRECISION_TIERS = {
    "parity": None,
    "fast": "bf16x3",
    "turbo": "bf16x1",
}


def resolve_featurizer_precision(tier):
    """Map a user-facing tier name to a ``pallas_precision`` value.

    Accepts None (parity), a tier name from FEATURIZER_PRECISION_TIERS, or a
    raw precision string ('bf16x1'/'bf16x3'/'bf16x4'/'bf16x6') for
    benchmarking.  The XLA (non-Pallas) featurizer path ignores the value.
    """
    if tier is None:
        return None
    if tier in FEATURIZER_PRECISION_TIERS:
        return FEATURIZER_PRECISION_TIERS[tier]
    if tier in ("bf16x1", "bf16x3", "bf16x4", "bf16x6"):
        return tier
    raise ValueError(
        f"unknown featurizer precision tier {tier!r}: expected one of "
        f"{sorted(FEATURIZER_PRECISION_TIERS)} or a raw bf16xN string")


def ingest_to_f32(waveform: jnp.ndarray) -> jnp.ndarray:
    """Repo-wide featurizer ingest conventions -> float32 waveform.

    ``int16`` means PCM16 (de-quantized by 1/32768 — CLAUDE.md invariant);
    ``uint8`` means µ-law companded bytes (the 1-byte/sample serving wire
    format, ops/mulaw.py); floating inputs pass through as float32.
    """
    if waveform.dtype == jnp.int16:
        return waveform.astype(jnp.float32) / 32768.0
    if waveform.dtype == jnp.uint8:
        from sed_tpu.ops.mulaw import mulaw_decode

        return mulaw_decode(waveform)
    return waveform.astype(jnp.float32)


def resolve_pallas(use_pallas, cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM):
    """'auto' -> the fully fused Pallas path on TPU, plain XLA elsewhere.

    The fused kernel's two-stage matmul FFT needs both stage sizes >= 128
    lanes (nfft >= 32768, i.e. the production config) — Mosaic rejects the
    smaller reshapes ("unsupported shape cast", observed for nfft=1024 on
    hardware), so small configs fall back to the XLA path even on TPU.
    """
    if use_pallas == "auto":
        if jax.default_backend() != "tpu":
            return False
        return "full" if cfg.nfft >= 32768 else False
    return use_pallas


def power_to_logmel(
    power: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """(..., freq_bins) power spectrum -> (..., mel_bins) log-mel (float32)."""
    if use_pallas:
        from sed_tpu.ops.pallas_featurizer import power_to_logmel_pallas

        return power_to_logmel_pallas(power, cfg)
    fb = jnp.asarray(mel_ops.mel_filterbank(cfg))
    melp = jnp.matmul(power, fb, precision=jax.lax.Precision.HIGHEST)
    return mel_ops.power_to_db(melp).astype(jnp.float32)


def multichannel_stft(
    waveform: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    fft_impl: FftImpl = "fft",
) -> jnp.ndarray:
    """(samples, channels) -> (channels, frames, nfft//2+1) complex64.

    Matches reference multichannel_stft (preprocess.py:21-36): per-channel
    centered STFT with a symmetric Hann window, transposed frames-major.
    Complex output: for the TPU-side pipeline use :func:`logmel_features`,
    which never materializes complex values.
    """
    chans_first = jnp.swapaxes(waveform, 0, 1)  # (channels, samples)
    return jax.vmap(lambda y: stft_ops.stft(y, cfg, fft_impl))(chans_first)


def multichannel_stft_host(
    waveform,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    fft_impl: FftImpl = "auto",
):
    """TPU-safe variant of :func:`multichannel_stft` returning *numpy* complex64.

    Runs the complex-free (real, imag) pipeline on the accelerator and
    assembles the complex array on the host — usable on backends without
    complex-dtype support.  Output matches ``multichannel_stft`` exactly.
    """
    import numpy as np

    chans_first = jnp.swapaxes(jnp.asarray(waveform), 0, 1)
    re, im = jax.vmap(lambda y: stft_ops.stft_realimag(y, cfg, fft_impl))(chans_first)
    return np.asarray(re) + 1j * np.asarray(im).astype(np.float32)


def multichannel_complex_to_log_mel(
    spec: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """|X|^2 -> mel projection -> 10*log10(max(1e-10, .)), float32.

    Matches reference multichannel_complex_to_log_mel (preprocess.py:39-45).
    Accepts any (..., freq_bins) array: complex spectrograms, the
    already-normalized complex features of the 'Complex' dataset mode
    (spectograms_dataset.py:104-110), or raw rfft rows as used by the SVM
    baseline (Classical_methods/train_svm_detector.py:66-68).
    """
    if jnp.iscomplexobj(spec):
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    else:
        power = spec.astype(jnp.float32) ** 2
    return power_to_logmel(power.astype(jnp.float32), cfg, use_pallas)


def realimag_to_log_mel(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Complex-free equivalent of :func:`multichannel_complex_to_log_mel`."""
    power = real.astype(jnp.float32) ** 2 + imag.astype(jnp.float32) ** 2
    return power_to_logmel(power, cfg, use_pallas)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def logmel_features(
    waveform: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    fft_impl: FftImpl = "auto",
    use_pallas="auto",
    pallas_precision=None,
) -> jnp.ndarray:
    """Fused featurizer: (samples, channels) -> (channels, frames, mel_bins).

    Complex-free: frame -> window -> rFFT(real, imag) -> power -> mel -> dB.

    int16 input means PCM16 on EVERY path: it is de-quantized by 1/32768
    (exactly — in-kernel via the pre-scaled window on the 'full' path, which
    also keeps framing traffic at half width).  uint8 input means µ-law
    companded bytes (the lossy 1-byte/sample wire format, ops/mulaw.py),
    decoded on-device before featurization.

    ``use_pallas``: False = XLA ops throughout; True = Pallas kernel for the
    power->mel->log stage; 'full' = the fully fused Pallas featurizer
    (window+rFFT+power in one VMEM-resident kernel + folded-filterbank mel
    kernel) — measured ~1.4x faster end to end than the XLA path on TPU v5e
    at <1e-4 dB parity.  ``pallas_precision``: None = parity mode;
    'bf16x3'/'bf16x1' = the fast/turbo serving tiers (measured record:
    benchmarks/FAST_FEATURIZER.json; tier names resolve via
    :func:`resolve_featurizer_precision`).
    """
    chans_first = jnp.swapaxes(waveform, 0, 1)

    use_pallas = resolve_pallas(use_pallas, cfg)
    if use_pallas == "full":
        from sed_tpu.ops.pallas_featurizer import logmel_waveform_pallas

        # Framing happens INSIDE the kernel (row-granular HBM DMA + rolls) —
        # no (frames, n_fft) array ever exists in HBM.  1.18x the XLA-framing
        # path on v5e (benchmarks/README.md, round 2).
        return logmel_waveform_pallas(ingest_to_f32(chans_first), cfg,
                                      precision=pallas_precision)

    if chans_first.dtype in (jnp.int16, jnp.uint8):
        chans_first = ingest_to_f32(chans_first)

    def one_channel(y):
        re, im = stft_ops.stft_realimag(y, cfg, fft_impl)
        return realimag_to_log_mel(re, im, cfg, use_pallas)

    return jax.vmap(one_channel)(chans_first)


def logmel_features_batch(
    waveforms: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    fft_impl: FftImpl = "auto",
    use_pallas="auto",
    pallas_precision=None,
) -> jnp.ndarray:
    """Batched featurizer: (batch, samples, channels) -> (batch, channels, frames, mel).

    int16 input means PCM16 (de-quantized by 1/32768) and uint8 means µ-law
    bytes on every path; see :func:`logmel_features`.
    """
    use_pallas = resolve_pallas(use_pallas, cfg)
    if use_pallas == "full":
        # Flatten (batch, channels) into kernel signals — one grid covers the
        # whole batch; framing happens inside the kernel (see logmel_features).
        from sed_tpu.ops.pallas_featurizer import logmel_waveform_pallas

        b, samples, c = waveforms.shape
        chans_first = ingest_to_f32(jnp.transpose(waveforms, (0, 2, 1)))
        mel = logmel_waveform_pallas(chans_first.reshape(b * c, samples), cfg,
                                     precision=pallas_precision)
        return mel.reshape(b, c, -1, cfg.mel_bins)
    return jax.vmap(
        lambda w: logmel_features(w, cfg, fft_impl, use_pallas, pallas_precision)
    )(waveforms)
