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
    # Two-point slope over device loops cancels the ~30 ms relay RPC floor.
    times = []
    for k_iters in (iters, 3 * iters):
        loop = make_loop(k_iters)
        float(loop(x))  # compile + fetch
        best = float("inf")
        for rep in range(3):
            xr = x + jnp.float32(1e-5 * (rep + 1))
            xr.block_until_ready()
            t0 = time.time()
            float(loop(xr))  # forced value fetch (see bench.py note)
            best = min(best, time.time() - t0)
        times.append(best)
    per_call = (times[1] - times[0]) / (2 * iters)
    frames_sec = batch / per_call
    # hop-strided frames: one frame per hop => audio-sec/sec = frames/sec * hop / sr.
    audio_sec = frames_sec * cfg.hop_size / cfg.working_sample_rate

    print(f"{frames_sec:.0f} frames/sec -> {audio_sec:.0f} audio-sec/sec (hop-strided)",
          file=sys.stderr)
    result = {
        "metric": "M5 waveform inference (31680-sample frames)",
        "value": round(audio_sec, 1),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(audio_sec / 100.0, 2),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "M5_BENCH.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
