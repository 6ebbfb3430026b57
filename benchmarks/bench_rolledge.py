"""Edge-specialized framing (impl='rolledge') same-process hardware A/B.

Round-2 left the featurizer's ~1.6 ms XLA pre-pass (reflect pad + repack) as
the last measured overhead, with 'rollraw' as a tested NEGATIVE (its 3-way
predicated DMA on every tile cost more in-kernel than the pre-pass).
'rolledge' splits the grid instead of branching the kernel: interior tiles
(~87%) DMA straight from the raw waveform in a branch-free kernel; edge
tiles run the proven roll kernel over two small strips; pieces merge after
the mel stage.  This bench measures, in ONE process under the pinned
protocol (benchmarks/protocol.py):

  * hardware parity: rolledge vs the float64-oracle-golden 'roll' path;
  * per-batch time for 'roll' vs 'rolledge' on the 16x60 s headline shape.

Accepted either way per house style; writes benchmarks/ROLLEDGE_BENCH.json.
Run: python benchmarks/bench_rolledge.py          (TPU)
"""

from __future__ import annotations

import json
import os
import sys
import time

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

    fns = {}
    for impl in ("roll", "rolledge"):
        fns[impl] = jax.jit(
            lambda x, impl=impl: logmel_waveform_pallas(
                x, cfg, interpret=interpret, impl=impl))

    # Hardware parity first (also the Mosaic lowering check — interpret-mode
    # passing does NOT imply the kernels lower, CLAUDE.md).
    log("compiling roll ...")
    ref = np.asarray(fns["roll"](wj))
    log("compiling rolledge ...")
    got = np.asarray(fns["rolledge"](wj))
    parity = float(np.abs(got - ref).max())
    log(f"rolledge vs roll on hardware: max |dB diff| = {parity:.2e}")

    # Also probe the round-2 miscompile geometry (11x20 s) for the new
    # kernel composition before trusting any timing.
    w2 = (0.01 * rng.standard_normal((11, sr * 20))).astype(np.float32)
    ref2 = np.asarray(fns["roll"](jnp.asarray(w2)))
    got2 = np.asarray(fns["rolledge"](jnp.asarray(w2)))
    parity2 = float(np.abs(got2 - ref2).max())
    log(f"rolledge vs roll @ 11x20 s (miscompile probe): {parity2:.2e}")

    results = {"device_kind": dev.device_kind, "batch": BATCH,
               "clip_seconds": CLIP_SECONDS,
               "parity_16x60_db": parity, "parity_11x20_db": parity2}

    if parity > 1e-4 or parity2 > 1e-4:
        results["verdict"] = "PARITY FAILURE — not timed"
    else:
        def make_factory(impl):
            def make_loop(iters):
                @jax.jit
                def loop(x):
                    def body(i, carry):
                        x, acc = carry
                        return (x + jnp.float32(1e-7),
                                acc + fns[impl](x).sum())
                    return jax.lax.fori_loop(
                        0, iters, body, (x, jnp.float32(0.0)))[1]
                return loop
            return make_loop

        def perturb(x, k):
            xr = x + jnp.float32(1e-6 * (k + 1))
            xr.block_until_ready()
            return xr

        for impl in ("roll", "rolledge"):
            log(f"timing {impl} ...")
            s = slope_stats(make_factory(impl), wj, perturb,
                            iters_pair=(8, 30), n=5)
            results[impl] = {
                "ms_per_batch": round(1e3 * s["median"], 3),
                "spread_ms": [round(1e3 * s["min"], 3),
                              round(1e3 * s["max"], 3)],
                "n": s["n"],
            }
            log(f"  {impl}: {results[impl]}")
        r = results["roll"]["ms_per_batch"] / results["rolledge"]["ms_per_batch"]
        results["speedup_rolledge_vs_roll"] = round(r, 3)
        results["verdict"] = ("POSITIVE" if r > 1.02 else
                              "NEGATIVE" if r < 0.98 else "NEUTRAL")

    with open(os.path.join(REPO, "benchmarks", "ROLLEDGE_BENCH.json"), "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print(json.dumps({
        "metric": "edge-specialized framing vs production roll (featurize-only)",
        "value": results.get("speedup_rolledge_vs_roll"),
        "unit": "x",
        "verdict": results["verdict"],
    }))


if __name__ == "__main__":
    main()
