"""Featurizer parity sweep on hardware: device paths vs the float64 oracle
across a family of signals (tones across the band, chirp, noise, impulses,
AM speech-like, clipping-level PCM).

Every device path (XLA reference, fused Pallas parity mode, bf16x4 fast mode)
is compared against a float64 numpy re-derivation of the exact librosa math
(the same oracle as tests/test_features.py), ON bins the oracle places above
-95 dB.  Bins at the -100 dB amin clamp are TRUE SILENCE — e.g. a pure
sinusoid's mel bins 130+ dB below its peak — where any f32 pipeline (XLA's
native FFT included) just emits its own rounding-noise floor; dB differences
there compare one representation of zero against another and are excluded by
construction, not to hide error.  (First version of this sweep compared the
two f32 paths bin-for-bin with no floor and "failed" on exactly those bins:
XLA's noise floor sits at ~-99 dB, the matmul FFT's at ~-88 dB, both below
any signal content.)

Run: python benchmarks/parity_sweep.py     (TPU)
Writes benchmarks/PARITY_SWEEP.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SECONDS = 20


def build_signals(sr: int):
    rng = np.random.default_rng(0)
    t = np.arange(SECONDS * sr) / sr
    n = len(t)
    sigs = {}
    for f in (100, 440, 1000, 5000, 19000):
        sigs[f"tone_{f}Hz"] = 0.5 * np.sin(2 * np.pi * f * t)
    sigs["chirp_20_20k"] = 0.5 * np.sin(
        2 * np.pi * (20 * t + (20000 - 20) / (2 * SECONDS) * t * t))
    sigs["white_noise"] = 0.3 * rng.standard_normal(n)
    pink = np.cumsum(rng.standard_normal(n))
    sigs["brown_noise"] = 0.3 * pink / np.max(np.abs(pink))
    imp = np.zeros(n)
    imp[:: sr // 3] = 0.9
    sigs["impulse_train"] = imp
    am = (0.4 + 0.3 * np.sin(2 * np.pi * 3 * t)) * np.sin(2 * np.pi * 220 * t)
    sigs["am_speechlike"] = am + 0.05 * rng.standard_normal(n)
    sigs["near_fullscale"] = np.clip(
        0.99 * np.sin(2 * np.pi * 440 * t) + 0.2 * rng.standard_normal(n),
        -0.999, 0.999)
    return {k: v.astype(np.float32) for k, v in sigs.items()}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.ops.featurizer import logmel_features_batch
    from sed_tpu.ops.pallas_featurizer import logmel_waveform_pallas

    from sed_tpu.ops import mel as mel_ops
    from sed_tpu.ops.stft import padded_window

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev}")

    sigs = build_signals(cfg.working_sample_rate)
    names = sorted(sigs)
    batch = jnp.asarray(np.stack([sigs[k] for k in names]))

    # float64 oracle (exact librosa math) per signal, host-side.
    log("building float64 oracle...")
    pad = cfg.nfft // 2
    win64 = padded_window(cfg.frame_size, cfg.nfft).astype(np.float64)
    fb64 = mel_ops.mel_filterbank(cfg, dtype=np.float64)
    oracle = {}
    for k in names:
        y = np.pad(sigs[k].astype(np.float64), (pad, pad), mode="reflect")
        n_frames = 1 + len(sigs[k]) // cfg.hop_size
        fr = np.stack([y[i * cfg.hop_size: i * cfg.hop_size + cfg.nfft]
                       for i in range(n_frames)]) * win64
        spec = np.abs(np.fft.rfft(fr, axis=-1)) ** 2
        oracle[k] = 10 * np.log10(np.maximum(1e-10, spec @ fb64))

    ref_fn = jax.jit(lambda w: logmel_features_batch(w[:, :, None], cfg,
                                                     use_pallas=False))
    parity_fn = jax.jit(lambda w: logmel_waveform_pallas(w, cfg, impl="roll"))
    fast_fn = jax.jit(lambda w: logmel_waveform_pallas(w, cfg, impl="roll",
                                                       precision="bf16x4"))
    fuse_fn = jax.jit(lambda w: logmel_waveform_pallas(w, cfg, impl="fuse"))
    log("compiling...")
    ref = np.asarray(ref_fn(batch))
    got = np.asarray(parity_fn(batch))
    fast = np.asarray(fast_fn(batch))
    fuse = np.asarray(fuse_fn(batch))

    FLOOR = -95.0  # oracle bins at/below this are true silence (amin clamp)
    # Additionally mask bins more than 100 dB below the signal's peak mel
    # level: f32 FFT roundoff (XLA's native FFT included) injects ~1e-7-
    # relative leakage, so bins 100+ dB down carry only rounding noise in ANY
    # f32 pipeline — e.g. a pure tone's -90 dB bins sit 130 dB below its
    # +42 dB peak and wobble by ~0.1 dB between implementations.
    DYN_RANGE = 100.0
    res = {}
    for i, k in enumerate(names):
        mask = oracle[k] > max(FLOOR, float(oracle[k].max()) - DYN_RANGE)
        res[k] = {
            "active_bins_pct": round(100.0 * mask.mean(), 1),
            "xla_vs_oracle_db": float(np.max(np.abs(ref[i, 0] - oracle[k])[mask])),
            "pallas_vs_oracle_db": float(np.max(np.abs(got[i] - oracle[k])[mask])),
            "fast_vs_oracle_db": float(np.max(np.abs(fast[i] - oracle[k])[mask])),
            "fuse_vs_oracle_db": float(np.max(np.abs(fuse[i] - oracle[k])[mask])),
        }
        log(f"{k:18s} active {res[k]['active_bins_pct']:5.1f}%  "
            f"xla {res[k]['xla_vs_oracle_db']:.2e}  "
            f"pallas {res[k]['pallas_vs_oracle_db']:.2e}  "
            f"fast {res[k]['fast_vs_oracle_db']:.2e}  "
            f"fuse {res[k]['fuse_vs_oracle_db']:.2e} dB")

    worst = max(v["pallas_vs_oracle_db"] for v in res.values())
    worst_xla = max(v["xla_vs_oracle_db"] for v in res.values())
    worst_fast = max(v["fast_vs_oracle_db"] for v in res.values())
    worst_fuse = max(v["fuse_vs_oracle_db"] for v in res.values())
    # 'fuse' claims numerically-identical math to 'roll' (same dots, same
    # accumulation order) — also check kernel-vs-kernel across the sweep,
    # the composition-miscompile probe bench_fuse.py runs at one geometry.
    fuse_vs_roll = float(np.max(np.abs(fuse - got)))
    # Pass criteria: the 1e-4 budget applies to broadband content (the class
    # the golden oracle tests use).  On pure tones/chirps, bins 90-100 dB
    # below peak drift to several 1e-4 in EVERY f32 pipeline — the XLA
    # reference itself reaches 4.2e-4 — and the matmul FFT's rounding-noise
    # profile is slightly wider than the native FFT's, so there the kernel
    # must stay within 3x of the XLA reference's own deviation and under an
    # absolute 1e-3 cap (measured: <=5.7e-4 vs XLA's 4.2e-4).
    per_sig_pass = all(
        v["pallas_vs_oracle_db"] <= min(1e-3, max(1e-4, 3.0 * v["xla_vs_oracle_db"]))
        and v["fuse_vs_oracle_db"] <= min(
            1e-3, max(1e-4, 3.0 * v["xla_vs_oracle_db"]))
        for v in res.values())
    # Identical-math claim is BIT-exact: any fuse-vs-roll divergence (e.g. in
    # silence bins, which the oracle mask excludes) is a composition
    # miscompile and must fail the sweep (ADVICE r3).
    per_sig_pass = per_sig_pass and fuse_vs_roll == 0.0
    out = {
        "device_kind": dev.device_kind,
        "seconds_per_signal": SECONDS,
        "oracle": "float64 numpy librosa-math (tests/test_features.py)",
        "floor_db": FLOOR,
        "dynamic_range_db": DYN_RANGE,
        "pass_criteria": {
            "parity": "per signal: pallas_vs_oracle <= min(1e-3, "
                      "max(1e-4, 3 * xla_vs_oracle)) — the 1e-4 budget "
                      "applies where the XLA f32 reference itself meets it",
            "fast": "reported only, not gated (see note)",
            "fuse": "fuse_vs_roll == 0.0 (bit-exact identical-math claim; "
                    "gated in pass_parity)",
        },
        "per_signal": res,
        "worst_pallas_db": worst,
        "worst_xla_db": worst_xla,
        "worst_fast_db": worst_fast,
        "worst_fuse_db": worst_fuse,
        "fuse_vs_roll_db": fuse_vs_roll,
        "pass_parity": bool(per_sig_pass),
        "note": "fast mode (bf16x4) meets its 2e-4 claim on broadband "
                "content; on pure tones its cancellation error reaches "
                "~0.07 dB in bins 90-100 dB below peak — use parity mode "
                "when deep-notch spectral fidelity matters",
    }
    with open(os.path.join(REPO, "benchmarks", "PARITY_SWEEP.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({
        "metric": "featurizer parity sweep worst-case vs float64 oracle",
        "value": worst,
        "unit": "dB",
        "xla_path_worst": worst_xla,
        "fast_mode_worst": worst_fast,
        "pass": out["pass_parity"],
    }))


if __name__ == "__main__":
    main()
