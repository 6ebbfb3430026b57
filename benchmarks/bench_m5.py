"""Waveform-model benchmark (BASELINE config #2 analog).

M5 inference over raw 31680-sample frames: frames/sec and audio-sec/sec for
hop-strided coverage of a 60 s clip.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch: int = 256, iters: int = 20) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    import jax.numpy as jnp

    from sed_tpu.configs import DEFAULT_WAVEFORM as cfg
    from sed_tpu.models.m5 import M5

    model = M5(classes_num=cfg.classes_num)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, cfg.frame_size, cfg.audio_channels)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    def make_loop(k_iters):
        @jax.jit
        def loop(x0):
            def body(i, carry):
                xv, acc = carry
                out = model.apply({"params": params, "batch_stats": batch_stats},
                                  xv, train=False)
                return (xv + 1e-6, acc + out.sum())

            return jax.lax.fori_loop(0, k_iters, body, (x0, jnp.float32(0)))[1]

        return loop

    print("compiling M5...", file=sys.stderr, flush=True)
    # Pinned protocol (benchmarks/protocol.py): median-of-5 two-point slopes.
    from protocol import slope_stats

    def perturb(x0, k):
        xr = x0 + jnp.float32(1e-5 * (k + 1))
        xr.block_until_ready()
        return xr

    stats = slope_stats(make_loop, x, perturb,
                        iters_pair=(iters, 3 * iters), n=5)
    per_call = stats["median"]
    frames_sec = batch / per_call
    # hop-strided frames: one frame per hop => audio-sec/sec = frames/sec * hop / sr.
    audio_sec = frames_sec * cfg.hop_size / cfg.working_sample_rate

    print(f"{frames_sec:.0f} frames/sec -> {audio_sec:.0f} audio-sec/sec "
          f"(hop-strided; median of {stats['n']}, spread "
          f"[{batch / stats['max']:.0f}, {batch / stats['min']:.0f}] frames/s)",
          file=sys.stderr)

    # bf16 compute tier (library surface: M5(dtype=jnp.bfloat16), params stay
    # f32) — M5 is dtype-sensitive (M5_ROOFLINE.json: the k=79 conv1
    # dominates), unlike the 2-D CNN.  Same protocol, same weights, plus the
    # score deviation vs the f32 forward on one batch.
    bf16_model = M5(classes_num=cfg.classes_num, dtype=jnp.bfloat16)

    def make_bf16_loop(k_iters):
        @jax.jit
        def loop(x0):
            def body(i, carry):
                xv, acc = carry
                out = bf16_model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    xv, train=False)
                return (xv + 1e-6, acc + out.sum())

            return jax.lax.fori_loop(0, k_iters, body, (x0, jnp.float32(0)))[1]

        return loop

    print("compiling M5 bf16...", file=sys.stderr, flush=True)
    bf16_stats = slope_stats(make_bf16_loop, x, perturb,
                             iters_pair=(iters, 3 * iters), n=5)
    f32_scores = jax.nn.sigmoid(model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False))
    bf16_scores = jax.nn.sigmoid(bf16_model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False))
    bf16_dev = float(np.abs(np.asarray(bf16_scores)
                            - np.asarray(f32_scores)).max())
    bf16_audio = (batch / bf16_stats["median"]) * cfg.hop_size / cfg.working_sample_rate
    print(f"bf16 tier: {batch / bf16_stats['median']:.0f} frames/sec "
          f"({per_call / bf16_stats['median']:.2f}x f32), max sigmoid dev "
          f"{bf16_dev:.2e}", file=sys.stderr)

    result = {
        "metric": "M5 waveform inference (31680-sample frames)",
        "value": round(audio_sec, 1),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(audio_sec / 100.0, 2),
        "protocol": {
            "n": stats["n"],
            "discarded": stats["discarded"],
            "frames_per_sec_spread": [round(batch / stats["max"], 1),
                                      round(batch / stats["min"], 1)],
        },
        "bf16_tier": {
            "audio_s_per_s": round(bf16_audio, 1),
            "speedup_vs_f32": round(per_call / bf16_stats["median"], 3),
            "frames_per_sec_spread": [round(batch / bf16_stats["max"], 1),
                                      round(batch / bf16_stats["min"], 1)],
            "max_sigmoid_dev_vs_f32": bf16_dev,
            "note": "library surface M5(dtype=jnp.bfloat16); int8 PTQ "
                    "(1.9x) remains the shipped fast path",
        },
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "M5_BENCH.json"), "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
