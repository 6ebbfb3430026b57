"""int8 mel-stage quantization: a measured NEGATIVE result (round-3 ask #5).

The round-2 verdict proposed quantizing the mel matmul ("all-positive
accumulation — the safest int8 candidate").  This study shows the blocker is
not the accumulation but the OUTPUT DOMAIN: log-mel needs the projected
power to be accurate over >80 dB of dynamic range, while int8 gives
20*log10(127) ≈ 42 dB of SNR per scale group.  Quantizing the power operand
(the only way to reach the MXU int8 path — the f32 power tiles are what
stream from HBM) floors every quiet mel bin at the quantization noise of the
loudest bin sharing its scale group:

    per-(row, K-tile) absmax scales, signed-shift full-range trick, float64
    reference on a 440 Hz tone + noise (the parity probe signal class):

      TILE_K=2048 (production tile): max 126.8 dB err, mean 36.6 dB
      TILE_K=512:                    max 126.8 dB err, mean 10.3 dB
      TILE_K=128:                    max  18.5 dB err, mean  0.2 dB

    (this script recomputes the table; numbers land in INT8_MEL.json)

Even the finest granularity — whose 128-wide dots would forfeit the MXU
efficiency that motivated int8 in the first place — is 5 orders of magnitude
outside the 1e-4 dB parity budget and far beyond any defensible serving
tier (the shipped fast mode is <=2e-4 dB).  Quantizing only the filterbank
operand keeps fidelity (~0.017 dB) but leaves the matmul on the f32 path —
no speedup.  Conclusion: the featurizer's int8 opportunity is NOT in the mel
stage; the serving-density lever that does work is the int8 CNN behind the
f32 featurizer, shipped as the audio->scores AOT artifact
(export.aot_export_pipeline + quantized_serving; fidelity pinned in
SERVING_AOT.json).

Pure numerics — runs anywhere: python benchmarks/int8_mel_study.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run():
    from sed_tpu.configs import SpectrogramConfig
    from sed_tpu.ops import mel as mel_ops
    from sed_tpu.ops.stft import padded_window

    cfg = SpectrogramConfig()
    rng = np.random.default_rng(0)
    sr, nf, hop, win = (cfg.working_sample_rate, cfg.nfft, cfg.hop_size,
                        cfg.frame_size)
    n = sr * 10
    t = np.arange(n) / sr
    sig = (0.3 * np.sin(2 * np.pi * 440 * t)
           + 0.001 * rng.standard_normal(n)).astype(np.float64)
    pad = np.pad(sig, (nf // 2, nf // 2), mode="reflect")
    frames = np.stack([pad[i * hop:i * hop + nf] for i in range(20)])
    wp = padded_window(win, nf)
    power = np.abs(np.fft.rfft(frames * wp, nf)) ** 2          # (20, 16385)
    fb = mel_ops.mel_filterbank(cfg, dtype=np.float64)          # (freq, mel)
    ref_mel = 10 * np.log10(np.maximum(power @ fb, 1e-10))

    col_scale = np.maximum(fb.max(axis=0), 1e-30) / 127.0
    fbq = np.round(fb / col_scale).astype(np.int8)

    rows = {}
    for tile_k in (2048, 512, 128):
        acc = np.zeros((power.shape[0], fb.shape[1]))
        for k0 in range(0, power.shape[1], tile_k):
            p = power[:, k0:k0 + tile_k]
            s = np.maximum(p.max(axis=1, keepdims=True), 1e-30) / 255.0
            q = (np.round(p / s) - 128).astype(np.int8)        # full-range
            f = fbq[k0:k0 + tile_k].astype(np.int64)
            acc += ((q.astype(np.int32) @ f.astype(np.int32))
                    + 128.0 * f.sum(axis=0)) * s * col_scale
        got = 10 * np.log10(np.maximum(acc, 1e-10))
        d = np.abs(got - ref_mel)
        rows[tile_k] = {"max_db_err": round(float(d.max()), 2),
                        "mean_db_err": round(float(d.mean()), 3),
                        "frac_bins_over_1db": round(float((d > 1).mean()), 3)}
        print(f"TILE_K={tile_k}: {rows[tile_k]}", file=sys.stderr)

    # fb-only int8 (keeps f32 power): fidelity fine, but no int8 MXU path.
    d_fb = np.abs(10 * np.log10(np.maximum(
        power @ (fbq * col_scale), 1e-10)) - ref_mel)
    fb_only = {"max_db_err": round(float(d_fb.max()), 4)}
    print(f"fb-only int8 (no speedup): {fb_only}", file=sys.stderr)

    return {
        "verdict": "NEGATIVE: int8 power quantization cannot hold dB-domain "
                   "fidelity (42 dB int8 SNR vs >80 dB log-mel range); "
                   "shipped int8 serving quantizes the CNN, not the mel "
                   "stage (SERVING_AOT.json)",
        "per_tile_scaled_power_int8": rows,
        "fb_only_int8": fb_only,
        "parity_budget_db": 1e-4,
        "fast_mode_tier_db": 2e-4,
    }


def main():
    result = run()
    with open(os.path.join(REPO, "benchmarks", "INT8_MEL.json"), "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps({
        "metric": "int8 mel-stage study (production tile mean dB error)",
        "value": result["per_tile_scaled_power_int8"][2048]["mean_db_err"],
        "unit": "dB",
        "verdict": "negative result, kept as measurement record",
    }))


if __name__ == "__main__":
    main()
