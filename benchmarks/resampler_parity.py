"""Resampler parity quantification (PARITY.md divergence #4).

The reference resamples with ``librosa.resample`` (soxr_hq-class;
dataset/dataset_utils.py:78-84).  This framework substitutes a polyphase
windowed-sinc resampler (scipy resample_poly / the native C++ twin, Kaiser
beta=14.77 — the kaiser_best design).  Round 1 asserted quality equivalence;
this measures it against a float64 *ideal* oracle:

  * band-limited periodic signals are exactly representable as finite Fourier
    sums, so the mathematically perfect resample at any rate is the Fourier
    sum evaluated on the target grid in float64 — no reference library needed;
  * we score tones (worst case for sinc ripple) and band-limited noise
    (broadband case) at 44.1 kHz -> 48 kHz, the only upsampling path the
    datasets can hit, reporting max error in dB relative to full scale and
    SNR over the central region (edge transients excluded, as both librosa
    and scipy pad edges with zeros).

Run: python benchmarks/resampler_parity.py
Writes benchmarks/RESAMPLER_PARITY.json and prints one summary JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ORIG_SR = 44100
TARGET_SR = 48000


def ideal_periodic_resample(coeffs: dict, n_orig: int, n_target: int):
    """Evaluate sum_k a_k * sin(2*pi*f_k*t + p_k) (f_k in cycles/period) on
    both grids in float64."""
    t_orig = np.arange(n_orig, dtype=np.float64) / n_orig
    t_tgt = np.arange(n_target, dtype=np.float64) / n_target
    x = np.zeros(n_orig)
    y = np.zeros(n_target)
    for f_cycles, (amp, phase) in coeffs.items():
        x += amp * np.sin(2 * np.pi * f_cycles * t_orig + phase)
        y += amp * np.sin(2 * np.pi * f_cycles * t_tgt + phase)
    return x, y


def score(resampler, coeffs, periods: int = 4):
    """Resample `periods` periods, score the central ones vs the oracle."""
    n_orig, n_tgt = ORIG_SR, TARGET_SR  # one period = 1 s
    x1, y1 = ideal_periodic_resample(coeffs, n_orig, n_tgt)
    x = np.tile(x1, periods)
    ideal = np.tile(y1, periods)
    got = np.asarray(resampler(x), np.float64)
    assert got.shape == ideal.shape, (got.shape, ideal.shape)
    sl = slice(n_tgt, (periods - 1) * n_tgt)  # drop edge periods
    err = got[sl] - ideal[sl]
    scale = np.abs(ideal[sl]).max()
    max_err_db = 20 * np.log10(np.abs(err).max() / scale)
    snr_db = 10 * np.log10((ideal[sl] ** 2).sum() / max((err ** 2).sum(), 1e-300))
    return float(max_err_db), float(snr_db)


def main():
    from sed_tpu.io.audio import resample
    from sed_tpu.io.native import native_available, resample_native

    g = math.gcd(TARGET_SR, ORIG_SR)
    up, down = TARGET_SR // g, ORIG_SR // g

    rng = np.random.default_rng(0)
    cases = {
        "tone_440hz": {440: (0.8, 0.3)},
        "tone_10khz": {10000: (0.8, 1.1)},
        "tone_19khz": {19000: (0.8, 2.0)},  # near the 20.05 kHz transition band
        "multitone": {440: (0.3, 0.1), 1873: (0.3, 0.7), 9000: (0.2, 1.9)},
        "bl_noise_18k": {
            int(f): (float(a), float(p))
            for f, a, p in zip(rng.integers(5, 18000, 300),
                               0.05 * rng.random(300) + 0.005,
                               2 * np.pi * rng.random(300))
        },
    }

    backends = {"scipy": lambda x: resample(x, ORIG_SR, TARGET_SR)}
    if native_available():
        backends["native_cpp"] = lambda x: resample_native(x, up, down)

    results = {}
    for bname, fn in backends.items():
        results[bname] = {}
        for cname, coeffs in cases.items():
            max_err_db, snr_db = score(fn, coeffs)
            results[bname][cname] = {"max_err_dbfs": round(max_err_db, 2),
                                     "snr_db": round(snr_db, 2)}
            print(f"{bname:10s} {cname:14s} max_err {max_err_db:7.2f} dBFS  "
                  f"snr {snr_db:7.2f} dB", file=sys.stderr)

    worst = max(v["max_err_dbfs"] for b in results.values() for v in b.values())
    out = {
        "path": "44.1 kHz -> 48 kHz (the datasets' only resample direction)",
        "oracle": "float64 ideal band-limited (finite Fourier sum), central periods",
        "filter": "polyphase windowed-sinc, Kaiser beta=14.7697 (kaiser_best design)",
        "results": results,
        "worst_max_err_dbfs": worst,
        "pass": bool(worst < -80.0),
    }
    with open(os.path.join(REPO, "benchmarks", "RESAMPLER_PARITY.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({"metric": "resampler_worst_max_err",
                      "value": worst, "unit": "dBFS", "pass": out["pass"]}))


if __name__ == "__main__":
    main()
