"""Featurizer stage profile on hardware (slope-timed).

Decomposes the fused featurize+infer headline (bench.py) into device-timed
stages so optimization effort goes where the time is:

  full        production path: in-kernel DMA framing + rFFT + power + mel
  fftk        window+rFFT+power kernel alone, pre-framed input in HBM
  mel         folded mel+log kernel alone, power resident in HBM
  frame_xla   XLA framing (blocks+slices) alone
  cnn         Cnn_AvgPooling forward alone

plus FFT precision variants of `fftk` (HIGHEST parity mode, bf16x4 fast mode,
and the per-stage mixed tiers) to locate the cheapest tier that would still
hold the 1e-4 dB budget — any promising mixed tier must then be re-probed for
tonal parity before becoming a default (CLAUDE.md invariant).

All timings are two-point slopes over jitted fori_loops (cancels this
harness's ~30 ms relay RPC floor; ROADMAP.md "Environment notes").

Run: python benchmarks/profile_featurizer.py   (TPU)
Writes benchmarks/FEATURIZER_PROFILE.json and prints one JSON summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = 16
CLIP_SECONDS = 60
ITERS = (4, 12)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
    from sed_tpu.ops import stft as stft_ops
    from sed_tpu.ops.pallas_featurizer import (
        _folded_mel_from_power,
        logmel_waveform_pallas,
        stft_power_pallas,
    )

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind})")

    samples = cfg.working_sample_rate * CLIP_SECONDS
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((BATCH, samples)).astype(np.float32) * 0.1)

    frames_np = None  # built below, device-side
    n_frames = 1 + samples // cfg.hop_size

    def batch_frames(w):
        return jax.vmap(
            lambda y: stft_ops.frame_signal(y, cfg.nfft, cfg.hop_size)
        )(w).reshape(-1, cfg.nfft)

    frames = jax.jit(batch_frames)(wave)
    frames.block_until_ready()
    power = jax.jit(lambda f: stft_power_pallas(f, cfg))(frames)
    power.block_until_ready()
    feats = jax.jit(lambda w: logmel_waveform_pallas(w, cfg))(wave)
    feats.block_until_ready()
    log(f"frames {frames.shape}, power {power.shape}, feats {feats.shape}")

    model = CnnAvgPooling(classes_num=cfg.classes_num,
                          model_config=TRAIN_CHANNEL_AND_POOL)
    x0 = jnp.transpose(feats.reshape(BATCH, 1, n_frames, cfg.mel_bins), (0, 2, 3, 1))
    variables = model.init(jax.random.key(0), x0, train=False)

    # --- bodies: resident input -> cheap scalar (consume without a full
    # reduce pass where the output is big) ----------------------------------
    bodies = {
        "full (roll framing + fft + mel)": (
            wave, lambda w: logmel_waveform_pallas(w, cfg).sum()),
        "full fast (bf16x4)": (
            wave, lambda w: logmel_waveform_pallas(w, cfg, precision="bf16x4").sum()),
        "fftk HIGHEST": (
            frames, lambda f: stft_power_pallas(f, cfg)[:, :128].sum()),
        "fftk bf16x4": (
            frames, lambda f: stft_power_pallas(f, cfg, precision="bf16x4")[:, :128].sum()),
        "fftk mixed hi-inner/bf16x4-outer": (
            frames, lambda f: stft_power_pallas(
                f, cfg, precision=(None, "bf16x4"))[:, :128].sum()),
        "fftk mixed bf16x4-inner/hi-outer": (
            frames, lambda f: stft_power_pallas(
                f, cfg, precision=("bf16x4", None))[:, :128].sum()),
        "mel (folded fb)": (
            power, lambda p: _folded_mel_from_power(p, cfg, False).sum()),
        "frame_xla": (wave, lambda w: batch_frames(w)[:, :128].sum()),
        "cnn forward": (x0, lambda x: model.apply(variables, x, train=False).sum()),
    }

    def slope_time(inp, body_fn):
        def make_loop(iters):
            @jax.jit
            def loop(w):
                def body(i, carry):
                    w, acc = carry
                    w = w.at[(0,) * w.ndim].add(jnp.asarray(1e-6, w.dtype))
                    return (w, acc + body_fn(w).astype(jnp.float32))
                return jax.lax.fori_loop(0, iters, body, (w, jnp.float32(0.0)))[1]
            return loop

        times = []
        for iters in ITERS:
            loop = make_loop(iters)
            float(loop(inp))  # compile + fetch
            best = float("inf")
            for rep in range(3):
                xr = inp + jnp.asarray(1e-5 * (rep + 1), inp.dtype)
                xr.block_until_ready()
                t0 = time.perf_counter()
                float(loop(xr))
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        return (times[1] - times[0]) / (ITERS[1] - ITERS[0])

    results = {}
    for name, (inp, fn) in bodies.items():
        log(f"compiling: {name} ...")
        t = slope_time(inp, fn)
        results[name] = t
        log(f"  {name}: {1e3 * t:.3f} ms/batch "
            f"({BATCH * CLIP_SECONDS / t:.0f} audio-s/s)")

    out = {
        "batch": BATCH,
        "clip_seconds": CLIP_SECONDS,
        "device_kind": dev.device_kind,
        "method": f"two-point slope over fori_loop of {ITERS} iters, best of 3",
        "ms_per_batch": {k: round(1e3 * v, 3) for k, v in results.items()},
        "audio_s_per_s": {k: round(BATCH * CLIP_SECONDS / v, 0)
                          for k, v in results.items()},
    }
    with open(os.path.join(REPO, "benchmarks", "FEATURIZER_PROFILE.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({
        "metric": "featurizer full-path time (16x60s batch)",
        "value": round(1e3 * results["full (roll framing + fft + mel)"], 3),
        "unit": "ms/batch",
        "stages_ms": out["ms_per_batch"],
    }))


if __name__ == "__main__":
    main()
