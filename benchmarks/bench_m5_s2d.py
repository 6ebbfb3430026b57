"""Hardware A/B: M5 space-to-depth stem (models/m5.py conv1_s2d) vs direct.

M5_ROOFLINE.json: the k=79 s=4 1-channel stem is 80% of M5 wall time at
~20% MFU (79-deep contraction fills 62% of the MXU lanes at best).  The
space-to-depth re-tiling re-expresses it as a k=7 16-channel conv
(contraction 112, both reshapes free) — this measures whether XLA turns
that into wall-clock, per tier:

  f32   direct vs s2d   (+ max |Δsigmoid| — f32 reassociation only)
  bf16  direct vs s2d   (the 1.66x serving tier; same fidelity check)
  int8  direct vs s2d   (BIT-EXACT by construction; asserted)

Pinned protocol (benchmarks/protocol.py): median-of-5 two-point slopes,
fori_loop K=20/60, perturbed inputs, value fetches.  Writes
benchmarks/M5_S2D_BENCH.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main(batch: int = 256) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp

    from protocol import slope_stats
    from sed_tpu.configs import DEFAULT_WAVEFORM as cfg
    from sed_tpu.models.m5 import M5
    from sed_tpu.models.quantize import quantize_m5, quantized_m5_forward

    log(f"device: {jax.devices()[0].device_kind}; batch={batch}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch, cfg.frame_size, cfg.audio_channels)).astype(np.float32) * 0.1)
    base = M5(classes_num=cfg.classes_num)
    variables = base.init(jax.random.key(0), x, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    def perturb(x0, k):
        xr = x0 + jnp.float32(1e-5 * (k + 1))
        xr.block_until_ready()
        return xr

    def measure(fwd, tag):
        def make_loop(k_iters):
            @jax.jit
            def loop(x0):
                def body(i, carry):
                    xv, acc = carry
                    return (xv + 1e-6, acc + fwd(xv).sum())
                return jax.lax.fori_loop(0, k_iters, body,
                                         (x0, jnp.float32(0)))[1]
            return loop

        log(f"compiling {tag}...")
        st = slope_stats(make_loop, x, perturb, iters_pair=(20, 60), n=5)
        ms = st["median"] * 1e3
        log(f"  {tag}: {ms:.4f} ms/call ({batch / st['median']:.0f} frames/s;"
            f" spread [{st['min']*1e3:.4f}, {st['max']*1e3:.4f}])")
        return {"ms": ms, "ms_spread": [st["min"] * 1e3, st["max"] * 1e3],
                "frames_per_sec": batch / st["median"]}

    results = {"batch": batch,
               "device_kind": jax.devices()[0].device_kind,
               "method": "median-of-5 two-point slopes, fori_loop K=20/60",
               "tiers": {}}

    def model_fwd(m):
        return lambda xv: m.apply({"params": params,
                                   "batch_stats": batch_stats},
                                  xv, train=False)

    # --- f32 ---------------------------------------------------------------
    d = measure(model_fwd(M5(classes_num=cfg.classes_num)), "f32 direct")
    s = measure(model_fwd(M5(classes_num=cfg.classes_num, conv1_s2d=True)),
                "f32 s2d")
    dev = float(jnp.max(jnp.abs(
        jax.nn.sigmoid(model_fwd(M5(classes_num=cfg.classes_num))(x))
        - jax.nn.sigmoid(model_fwd(M5(classes_num=cfg.classes_num,
                                      conv1_s2d=True))(x)))))
    results["tiers"]["f32"] = {"direct": d, "s2d": s,
                               "speedup": d["ms"] / s["ms"],
                               "max_sigmoid_dev": dev}

    # --- bf16 ---------------------------------------------------------------
    d16 = measure(model_fwd(M5(classes_num=cfg.classes_num,
                               dtype=jnp.bfloat16)), "bf16 direct")
    s16 = measure(model_fwd(M5(classes_num=cfg.classes_num,
                               dtype=jnp.bfloat16, conv1_s2d=True)),
                  "bf16 s2d")
    dev16 = float(jnp.max(jnp.abs(
        jax.nn.sigmoid(model_fwd(M5(classes_num=cfg.classes_num,
                                    dtype=jnp.bfloat16))(x))
        - jax.nn.sigmoid(model_fwd(M5(classes_num=cfg.classes_num,
                                      dtype=jnp.bfloat16,
                                      conv1_s2d=True))(x)))))
    results["tiers"]["bf16"] = {"direct": d16, "s2d": s16,
                                "speedup": d16["ms"] / s16["ms"],
                                "max_sigmoid_dev_s2d_vs_direct_bf16": dev16}

    # --- int8 ---------------------------------------------------------------
    q = quantize_m5(base, params, batch_stats,
                    [np.asarray(x[:8])])
    di = measure(lambda xv: quantized_m5_forward(q, xv), "int8 direct")
    si = measure(lambda xv: quantized_m5_forward(q, xv, conv1_impl="s2d"),
                 "int8 s2d")
    a = quantized_m5_forward(q, x)
    b = quantized_m5_forward(q, x, conv1_impl="s2d")
    bit_exact = bool(jnp.array_equal(a, b))
    results["tiers"]["int8"] = {"direct": di, "s2d": si,
                                "speedup": di["ms"] / si["ms"],
                                "bit_exact": bit_exact}
    assert bit_exact, "int8 s2d must be bit-exact vs direct"

    out = os.path.join(HERE, "M5_S2D_BENCH.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    best = max(results["tiers"].values(), key=lambda t: t["speedup"])
    print(json.dumps({"metric": "m5_s2d_speedup_f32", "unit": "x",
                      "value": round(results["tiers"]["f32"]["speedup"], 3),
                      "bf16_speedup":
                          round(results["tiers"]["bf16"]["speedup"], 3),
                      "int8_speedup":
                          round(results["tiers"]["int8"]["speedup"], 3)}))


if __name__ == "__main__":
    main(batch=int(os.environ.get("SED_M5_BATCH", "256")))
