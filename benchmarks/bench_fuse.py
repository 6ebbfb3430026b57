"""Fused FFT->mel single-kernel featurizer (impl='fuse') hardware A/B.

The production path runs TWO pallas kernels (roll-framed FFT+power, then the
resident-fb mel+log kernel), round-tripping the (rows, 32768) f32 power
spectrum through HBM — ~380 MB written + 380 MB read per 16x60 s batch.
'fuse' buffers MEL_GROUP=16 tiles of power rows in a VMEM scratch inside the
FFT kernel and projects them through the VMEM-resident folded filterbank as
a grouped in-kernel epilogue (M=128 mel matmuls), so the power spectrum
never exists in HBM and the second kernel launch disappears.

Measures, in ONE process under the pinned protocol (benchmarks/protocol.py):

  * hardware parity: fuse vs production 'roll' at 16x60 s AND the 11x20 s
    round-2 miscompile-probe geometry (interpret mode is bit-exact; this
    checks Mosaic lowering);
  * per-batch featurize time 'roll' vs 'fuse' at the headline shape, for
    the parity tier and the bf16x1 'turbo' serving tier.

Accepted either way per house style; writes benchmarks/FUSE_BENCH.json.
Run: python benchmarks/bench_fuse.py          (TPU)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

BATCH = 16
CLIP_SECONDS = 60


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from protocol import slope_stats
    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.ops.pallas_featurizer import logmel_waveform_pallas

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind})")
    interpret = jax.default_backend() != "tpu"

    sr = cfg.working_sample_rate
    n = sr * CLIP_SECONDS
    rng = np.random.default_rng(0)
    t = np.arange(n) / sr
    w = (0.2 * np.sin(2 * np.pi * 440 * t)[None]
         + 0.01 * rng.standard_normal((BATCH, n))).astype(np.float32)
    wj = jnp.asarray(w)

    # (impl, fft precision tier) variants: parity tier and the turbo
    # serving tier (the tier where the mel stage is proportionally largest).
    variants = {
        "roll": ("roll", None),
        "fuse": ("fuse", None),
        "roll_turbo": ("roll", "bf16x1"),
        "fuse_turbo": ("fuse", "bf16x1"),
    }
    fns = {}
    for name, (impl, prec) in variants.items():
        fns[name] = jax.jit(
            lambda x, impl=impl, prec=prec: logmel_waveform_pallas(
                x, cfg, interpret=interpret, impl=impl, precision=prec))

    # Hardware parity first (also the Mosaic lowering check — interpret-mode
    # passing does NOT imply the kernels lower, CLAUDE.md).
    log("compiling roll ...")
    ref = np.asarray(fns["roll"](wj))
    log("compiling fuse ...")
    got = np.asarray(fns["fuse"](wj))
    parity = float(np.abs(got - ref).max())
    log(f"fuse vs roll on hardware: max |dB diff| = {parity:.2e}")

    # Round-2 miscompile-probe geometry (11x20 s): partial final mel group.
    w2 = (0.01 * rng.standard_normal((11, sr * 20))).astype(np.float32)
    ref2 = np.asarray(fns["roll"](jnp.asarray(w2)))
    got2 = np.asarray(fns["fuse"](jnp.asarray(w2)))
    parity2 = float(np.abs(got2 - ref2).max())
    log(f"fuse vs roll @ 11x20 s (miscompile probe): {parity2:.2e}")

    results = {"device_kind": dev.device_kind, "batch": BATCH,
               "clip_seconds": CLIP_SECONDS,
               "parity_16x60_db": parity, "parity_11x20_db": parity2}

    if parity > 1e-4 or parity2 > 1e-4:
        results["verdict"] = "PARITY FAILURE — not timed"
    else:
        def make_factory(name):
            def make_loop(iters):
                @jax.jit
                def loop(x):
                    def body(i, carry):
                        x, acc = carry
                        return (x + jnp.float32(1e-7),
                                acc + fns[name](x).sum())
                    return jax.lax.fori_loop(
                        0, iters, body, (x, jnp.float32(0.0)))[1]
                return loop
            return make_loop

        def perturb(x, k):
            xr = x + jnp.float32(1e-6 * (k + 1))
            xr.block_until_ready()
            return xr

        for name in variants:
            log(f"timing {name} ...")
            s = slope_stats(make_factory(name), wj, perturb,
                            iters_pair=(8, 30), n=5)
            results[name] = {
                "ms_per_batch": round(1e3 * s["median"], 3),
                "spread_ms": [round(1e3 * s["min"], 3),
                              round(1e3 * s["max"], 3)],
                "n": s["n"],
            }
            log(f"  {name}: {results[name]}")
        for tier, a, b in (("parity", "roll", "fuse"),
                           ("turbo", "roll_turbo", "fuse_turbo")):
            r = results[a]["ms_per_batch"] / results[b]["ms_per_batch"]
            results[f"speedup_fuse_vs_roll_{tier}"] = round(r, 3)
        r = results["speedup_fuse_vs_roll_parity"]
        results["verdict"] = ("POSITIVE" if r > 1.02 else
                              "NEGATIVE" if r < 0.98 else "NEUTRAL")

    with open(os.path.join(REPO, "benchmarks", "FUSE_BENCH.json"), "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print(json.dumps({
        "metric": "fused single-kernel featurizer vs two-kernel roll (featurize-only)",
        "value": results.get("speedup_fuse_vs_roll_parity"),
        "unit": "x",
        "verdict": results["verdict"],
    }))


if __name__ == "__main__":
    main()
