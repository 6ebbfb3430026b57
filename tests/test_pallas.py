"""Pallas fused mel kernel: interpreter-mode parity vs the XLA path (on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sed_tpu.configs import SpectrogramConfig
from sed_tpu.ops.featurizer import power_to_logmel
from sed_tpu.ops.pallas_featurizer import power_to_logmel_pallas

CFG = SpectrogramConfig()


@pytest.mark.parametrize("shape", [(182, 16385), (1, 37, 16385), (3, 16385)])
def test_pallas_matches_xla_path(shape):
    rng = np.random.default_rng(0)
    power = (rng.random(shape) * 1e3).astype(np.float32)
    ref = np.asarray(power_to_logmel(jnp.asarray(power), CFG))
    got = np.asarray(power_to_logmel_pallas(jnp.asarray(power), CFG, interpret=True))
    assert got.shape == ref.shape == shape[:-1] + (CFG.mel_bins,)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_pallas_amin_floor():
    power = np.zeros((8, 16385), dtype=np.float32)
    got = np.asarray(power_to_logmel_pallas(jnp.asarray(power), CFG, interpret=True))
    np.testing.assert_allclose(got, -100.0)  # 10*log10(1e-10)


def test_fused_fft_power_kernel_matches_oracle():
    """Window+rFFT+power kernel vs numpy float64, via the folded-filterbank
    log-mel (interpret mode)."""
    import numpy as np

    from sed_tpu.configs import SpectrogramConfig
    from sed_tpu.ops import mel as mel_ops
    from sed_tpu.ops.pallas_featurizer import logmel_frames_pallas, stft_power_pallas
    from sed_tpu.ops.stft import padded_window

    cfg = SpectrogramConfig(working_sample_rate=8000, time_margin=0.33)
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((5, cfg.nfft)).astype(np.float32)

    # Oracle: float64 window + rfft + power + mel + dB.
    wp = padded_window(cfg.frame_size, cfg.nfft).astype(np.float64)
    spec = np.fft.rfft(frames.astype(np.float64) * wp, axis=-1)
    power = np.abs(spec) ** 2
    fb = mel_ops.mel_filterbank(cfg, dtype=np.float64)
    ref = 10 * np.log10(np.maximum(1e-10, power @ fb))

    got = np.asarray(logmel_frames_pallas(jnp.asarray(frames), cfg, interpret=True))
    assert got.shape == (5, cfg.mel_bins)
    assert np.max(np.abs(got - ref)) < 1e-4

    # Power kernel alone: total energy must match (layout-independent check).
    p = np.asarray(stft_power_pallas(jnp.asarray(frames), cfg, interpret=True))
    full_power = np.abs(np.fft.fft(frames.astype(np.float64) * wp, axis=-1)) ** 2
    np.testing.assert_allclose(p.sum(axis=1), full_power.sum(axis=1), rtol=1e-5)


def test_dma_framing_fused_kernel_matches_xla_path():
    """In-kernel DMA framing (aligned span + phase-switch extract) vs the XLA
    featurizer (interpret mode)."""
    import numpy as np

    from sed_tpu.configs import SpectrogramConfig
    from sed_tpu.ops.featurizer import logmel_features
    from sed_tpu.ops.pallas_featurizer import logmel_waveform_pallas

    cfg = SpectrogramConfig(working_sample_rate=8000, time_margin=0.33)
    rng = np.random.default_rng(0)
    sigs = (0.3 * rng.standard_normal((3, 23 * cfg.working_sample_rate))).astype(np.float32)

    ref = np.stack([
        np.asarray(logmel_features(sigs[i][:, None], cfg, "fft", use_pallas=False))[0]
        for i in range(3)
    ])
    for impl in ("roll", "slice", "eo", "pack", "fuse"):
        got = np.asarray(logmel_waveform_pallas(jnp.asarray(sigs), cfg,
                                                interpret=True, impl=impl))
        assert got.shape == ref.shape, impl
        np.testing.assert_allclose(got, ref, atol=1e-4, err_msg=impl)


def test_fused_mel_epilogue_matches_roll_exactly():
    """impl='fuse' (mel+log fused into the FFT kernel as a grouped epilogue)
    must be numerically IDENTICAL to the production two-kernel path: same
    dots, same TILE_K accumulation order — only the power spectrum's HBM
    round-trip is removed.  Geometries cover a single partial group
    (tiles < MEL_GROUP), a partial final group, and an exact group multiple."""
    import numpy as np

    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.ops.pallas_featurizer import (MEL_GROUP,
                                               logmel_waveform_pallas)

    rng = np.random.default_rng(1)
    fs = cfg.working_sample_rate
    for n_sig, secs in [(1, 10), (3, 20), (2, 61)]:
        sigs = (0.3 * rng.standard_normal((n_sig, secs * fs))).astype(np.float32)
        ref = np.asarray(logmel_waveform_pallas(jnp.asarray(sigs), cfg,
                                                interpret=True, impl="roll"))
        got = np.asarray(logmel_waveform_pallas(jnp.asarray(sigs), cfg,
                                                interpret=True, impl="fuse"))
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref, err_msg=f"{n_sig}x{secs}s")
    assert MEL_GROUP == 16  # grouped epilogue geometry the above relies on


def test_rollraw_kernel_matches_xla_path():
    """Raw-read roll kernel (impl='rollraw'): interior tiles DMA from the
    unpadded waveform, edges from small reflect buffers.  Production-shape
    config (the only eligible one), 10 s signal -> exercises the left,
    interior, and right tile classes (t_lo=1, t_hi=2, n_tiles=4)."""
    import numpy as np

    from sed_tpu.configs import SpectrogramConfig
    from sed_tpu.ops.featurizer import logmel_features
    from sed_tpu.ops.pallas_featurizer import _rollraw_layout, logmel_waveform_pallas

    cfg = SpectrogramConfig()
    n = cfg.working_sample_rate * 10
    geo = _rollraw_layout(cfg, 1, n)
    assert geo is not None and geo["t_lo"] <= geo["t_hi"] < geo["n_tiles"] - 1
    rng = np.random.default_rng(0)
    sig = (0.2 * rng.standard_normal(n)).astype(np.float32)
    ref = np.asarray(logmel_features(jnp.asarray(sig)[:, None], cfg,
                                     use_pallas=False))[0]
    got = np.asarray(logmel_waveform_pallas(jnp.asarray(sig)[None, :], cfg,
                                            interpret=True, impl="rollraw"))[0]
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_rolledge_kernel_matches_xla_path():
    """Edge-specialized framing (impl='rolledge'): interior tiles run the
    branch-free raw-read kernel, edge tiles the roll kernel over small
    strips, merged after the mel stage.  Must match the XLA oracle path on a
    shape exercising all three tile classes, and be bit-identical to 'roll'
    (same kernels, different framing route)."""
    import numpy as np

    from sed_tpu.configs import SpectrogramConfig
    from sed_tpu.ops.featurizer import logmel_features
    from sed_tpu.ops.pallas_featurizer import _rollraw_layout, logmel_waveform_pallas

    cfg = SpectrogramConfig()
    n = cfg.working_sample_rate * 10
    geo = _rollraw_layout(cfg, 1, n)
    assert geo is not None and geo["t_lo"] <= geo["t_hi"] < geo["n_tiles"] - 1
    rng = np.random.default_rng(0)
    sig = (0.2 * rng.standard_normal(n)).astype(np.float32)
    ref = np.asarray(logmel_features(jnp.asarray(sig)[:, None], cfg,
                                     use_pallas=False))[0]
    got = np.asarray(logmel_waveform_pallas(jnp.asarray(sig)[None, :], cfg,
                                            interpret=True, impl="rolledge"))[0]
    np.testing.assert_allclose(got, ref, atol=1e-4)
    roll = np.asarray(logmel_waveform_pallas(jnp.asarray(sig)[None, :], cfg,
                                             interpret=True, impl="roll"))[0]
    np.testing.assert_array_equal(got, roll)


def test_int16_frames_path_exact():
    """int16 PCM frames with the in-kernel pre-scaled window must equal the
    f32/32768 path exactly (PCM16 de-quantization is lossless)."""
    import numpy as np

    from sed_tpu.configs import SpectrogramConfig
    from sed_tpu.ops.pallas_featurizer import logmel_frames_pallas

    cfg = SpectrogramConfig(working_sample_rate=8000, time_margin=0.33)
    rng = np.random.default_rng(0)
    pcm = rng.integers(-20000, 20000, size=(4, cfg.nfft), dtype=np.int16)
    a = np.asarray(logmel_frames_pallas(jnp.asarray(pcm), cfg, interpret=True))
    b = np.asarray(logmel_frames_pallas(
        jnp.asarray(pcm.astype(np.float32) / 32768.0), cfg, interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_featurizer_precision_tiers():
    """Serving precision tiers ('fast'/'turbo') run through the fused
    featurizer and stay close to parity.

    CPU interpret mode executes DEFAULT-precision dots in f32, so the loose
    tolerance here pins the tier plumbing + split-operand algebra only; the
    hardware speed/fidelity record is benchmarks/FAST_FEATURIZER.json."""
    import numpy as np

    from sed_tpu.configs import SpectrogramConfig
    from sed_tpu.ops.featurizer import (FEATURIZER_PRECISION_TIERS,
                                        resolve_featurizer_precision)
    from sed_tpu.ops.pallas_featurizer import logmel_waveform_pallas

    assert resolve_featurizer_precision(None) is None
    assert resolve_featurizer_precision("parity") is None
    assert resolve_featurizer_precision("fast") == "bf16x3"
    assert resolve_featurizer_precision("bf16x3") == "bf16x3"
    with pytest.raises(ValueError):
        resolve_featurizer_precision("warp9")

    cfg = SpectrogramConfig(working_sample_rate=8000, time_margin=0.33)
    rng = np.random.default_rng(0)
    sig = (0.3 * rng.standard_normal((1, 10 * cfg.working_sample_rate))).astype(np.float32)
    ref = np.asarray(logmel_waveform_pallas(jnp.asarray(sig), cfg, interpret=True))
    for tier in ("fast", "turbo"):
        prec = FEATURIZER_PRECISION_TIERS[tier]
        got = np.asarray(logmel_waveform_pallas(jnp.asarray(sig), cfg,
                                                interpret=True, precision=prec))
        assert got.shape == ref.shape, tier
        # bf16 operand splits round through bfloat16 even on CPU; the FFT's
        # cancellation-heavy sums amplify that, so the bound is loose.
        assert np.max(np.abs(got - ref)) < 0.3, tier


def test_mel_precision_plumbing():
    """The mel stage's matmul precision is parametrizable (measurement
    record: dropping mel to bf16x1 under the turbo tier bought only ~2.8%
    with overlapping spreads on hardware — see ROADMAP.md — so every tier
    ships mel at bf16x4; this pins the kept plumbing and its error bound).
    """
    import numpy as np

    from sed_tpu.configs import SpectrogramConfig
    from sed_tpu.ops.pallas_featurizer import logmel_waveform_pallas

    cfg = SpectrogramConfig(working_sample_rate=8000, time_margin=0.33)
    rng = np.random.default_rng(1)
    sig = (0.3 * rng.standard_normal(
        (1, 10 * cfg.working_sample_rate))).astype(np.float32)
    ref = np.asarray(logmel_waveform_pallas(jnp.asarray(sig), cfg,
                                            interpret=True))
    got = np.asarray(logmel_waveform_pallas(jnp.asarray(sig), cfg,
                                            interpret=True,
                                            mel_precision="bf16x1"))
    assert got.shape == ref.shape
    d = np.max(np.abs(got - ref))
    # mel is all-positive accumulation: single-pass bf16 is ~0.4% relative
    # ~= 0.02 dB (hardware measured 7.4e-3 dB added at the production tile).
    assert 0.0 < d < 0.05
