"""int8 PTQ serving bench: quantized vs float CnnAvgPooling forward (ROADMAP #4).

Measures score-only throughput (the model-serving density axis, independent of
the featurizer) for the float32 forward, the bfloat16 fast mode, and the int8
PTQ path (models/quantize.py) on long-form input — batch 16 x 60 s of frames —
plus the int8/f32 sigmoid fidelity on the same input.

Slope-timed like every bench here (ROADMAP.md "Environment notes").

Run: python benchmarks/bench_int8.py     (TPU)
Writes benchmarks/INT8_BENCH.json and prints one JSON line.
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


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
    from sed_tpu.models.quantize import quantize_cnn, quantized_scores

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind})")

    frames = 1 + cfg.working_sample_rate * CLIP_SECONDS // cfg.hop_size
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (BATCH, frames, cfg.mel_bins, 1)).astype(np.float32))

    model = CnnAvgPooling(classes_num=cfg.classes_num,
                          model_config=TRAIN_CHANNEL_AND_POOL)
    model16 = CnnAvgPooling(classes_num=cfg.classes_num,
                            model_config=TRAIN_CHANNEL_AND_POOL,
                            dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), x, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    q = quantize_cnn(model, params, batch_stats, [np.asarray(x[:4])])

    def f32_scores(inp):
        return jax.nn.sigmoid(model.apply(
            {"params": params, "batch_stats": batch_stats}, inp, train=False))

    def bf16_scores(inp):
        return jax.nn.sigmoid(model16.apply(
            {"params": params, "batch_stats": batch_stats}, inp, train=False))

    ref = jax.jit(f32_scores)(x)
    ref.block_until_ready()
    got = jax.jit(lambda inp: quantized_scores(q, inp))(x)
    got.block_until_ready()
    fid = float(jnp.max(jnp.abs(ref - got)))
    log(f"int8 vs f32 sigmoid max |diff|: {fid:.4f}")

    def make_slope(inp, perturb, consume):
        """Robust two-point slope: best-of-5 per length, re-measured (up to
        3 tries) if relay jitter produces a non-positive slope."""
        def timer(fn):
            def make(it):
                @jax.jit
                def loop(w):
                    def body(i, c):
                        w, acc = c
                        return (perturb(w), acc + consume(fn(w)))
                    return jax.lax.fori_loop(0, it, body, (w, jnp.float32(0)))[1]
                return loop

            its = (8, 40)
            lps = {it: make(it) for it in its}
            for lp in lps.values():
                float(lp(inp))  # compile
            for _ in range(3):
                ts = []
                for it in its:
                    best = float("inf")
                    for r in range(5):
                        xr = inp + jnp.asarray(1e-5 * (r + 1), inp.dtype)
                        xr.block_until_ready()
                        t0 = time.perf_counter()
                        float(lps[it](xr))
                        best = min(best, time.perf_counter() - t0)
                    ts.append(best)
                s = (ts[1] - ts[0]) / (its[1] - its[0])
                if s > 0:
                    return s
            # No positive slope after 3 tries: the relay is too jittery for
            # this measurement — record a failure instead of a nonsense ratio.
            log(f"  WARNING: no positive slope after 3 tries (last {s:.2e}); "
                "recording null")
            return None
        return timer

    slope = make_slope(x, lambda w: w.at[0, 0, 0, 0].add(1e-6),
                       lambda out: out[0, 0, 0])

    res = {}
    for name, fn in [("f32", f32_scores), ("bf16", bf16_scores),
                     ("int8", lambda inp: quantized_scores(q, inp))]:
        log(f"compiling {name} ...")
        t = slope(fn)
        res[name] = t
        if t is None:
            log(f"  {name}: MEASUREMENT FAILED (relay jitter)")
        else:
            log(f"  {name}: {1e3 * t:.3f} ms/batch "
                f"({BATCH * CLIP_SECONDS / t:.0f} audio-s/s scoring-only)")

    # --- M5 waveform model, hop-strided frame batches --------------------
    from sed_tpu.configs import DEFAULT_WAVEFORM as wcfg
    from sed_tpu.models.m5 import M5
    from sed_tpu.models.quantize import quantize_m5, quantized_m5_forward

    m5_batch = 256
    m5 = M5(classes_num=wcfg.classes_num)
    xw = jnp.asarray(rng.standard_normal(
        (m5_batch, wcfg.frame_size, 1)).astype(np.float32) * 0.1)
    mv = m5.init(jax.random.key(1), xw, train=False)
    qm5 = quantize_m5(m5, mv["params"], mv["batch_stats"], [np.asarray(xw[:32])])

    def m5_f32(inp):
        return m5.apply({"params": mv["params"], "batch_stats": mv["batch_stats"]},
                        inp, train=False)

    m5_ref = jax.jit(m5_f32)(xw)
    m5_ref.block_until_ready()
    m5_got = jax.jit(lambda inp: quantized_m5_forward(qm5, inp))(xw)
    m5_got.block_until_ready()
    m5_fid = float(jnp.max(jnp.abs(jax.nn.sigmoid(m5_ref) - jax.nn.sigmoid(m5_got))))
    log(f"M5 int8 vs f32 sigmoid max |diff|: {m5_fid:.4f}")

    slope_m5 = make_slope(xw, lambda w: w.at[0, 0, 0].add(1e-6),
                          lambda out: out[0, 0])

    for name, fn in [("m5_f32", m5_f32),
                     ("m5_int8", lambda inp: quantized_m5_forward(qm5, inp))]:
        log(f"compiling {name} ...")
        t = slope_m5(fn)
        res[name] = t
        if t is None:
            log(f"  {name}: MEASUREMENT FAILED (relay jitter)")
        else:
            log(f"  {name}: {1e3 * t:.3f} ms/batch-256 "
                f"({m5_batch / t:.0f} frames/s)")

    # --- MobileNetV1 (pointwise-int8; depthwise stays f32) ----------------
    # Closes round-2 Weak #7: the end-to-end MobileNet int8 speedup was the
    # one unmeasured claim in the quantization family.
    from sed_tpu.models.cnn import MobileNetV1
    from sed_tpu.models.quantize import (quantize_mobilenet,
                                         quantized_mobilenet_forward)

    mn_frames = 1024  # stride-2 stages need a /8 frame count
    mn = MobileNetV1(classes_num=cfg.classes_num)
    xm = jnp.asarray(rng.standard_normal(
        (BATCH, mn_frames, cfg.mel_bins, 1)).astype(np.float32))
    mv = mn.init(jax.random.key(2), xm[:1], train=False)
    qmn = quantize_mobilenet(mn, mv["params"], mv["batch_stats"],
                             [np.asarray(xm[:4])])

    def mn_f32(inp):  # forward already emits sigmoid (reference semantics)
        return mn.apply({"params": mv["params"],
                         "batch_stats": mv["batch_stats"]}, inp, train=False)

    mn_ref = jax.jit(mn_f32)(xm)
    mn_ref.block_until_ready()
    mn_got = jax.jit(lambda inp: quantized_mobilenet_forward(qmn, inp))(xm)
    mn_got.block_until_ready()
    mn_fid = float(jnp.max(jnp.abs(mn_ref - mn_got)))
    log(f"MobileNet int8 vs f32 sigmoid max |diff|: {mn_fid:.4f}")

    slope_mn = make_slope(xm, lambda w: w.at[0, 0, 0, 0].add(1e-6),
                          lambda out: out[0, 0, 0])
    for name, fn in [("mobilenet_f32", mn_f32),
                     ("mobilenet_int8",
                      lambda inp: quantized_mobilenet_forward(qmn, inp))]:
        log(f"compiling {name} ...")
        t = slope_mn(fn)
        res[name] = t
        if t is None:
            log(f"  {name}: MEASUREMENT FAILED (relay jitter)")
        else:
            log(f"  {name}: {1e3 * t:.3f} ms/batch-16x{mn_frames}f")

    out = {
        "batch": BATCH,
        "clip_seconds": CLIP_SECONDS,
        "m5_batch_frames": m5_batch,
        "mobilenet_frames": mn_frames,
        "mobilenet_int8_vs_f32_sigmoid_maxdiff": round(mn_fid, 5),
        "mobilenet_speedup_int8_vs_f32": (
            round(res["mobilenet_f32"] / res["mobilenet_int8"], 3)
            if res.get("mobilenet_f32") and res.get("mobilenet_int8")
            else None),
        "device_kind": dev.device_kind,
        "int8_vs_f32_sigmoid_maxdiff": round(fid, 5),
        "m5_int8_vs_f32_sigmoid_maxdiff": round(m5_fid, 5),
        "ms_per_batch": {k: (None if v is None else round(1e3 * v, 4))
                         for k, v in res.items()},
        "speedup_int8_vs_f32": (
            round(res["f32"] / res["int8"], 3)
            if res["f32"] and res["int8"] else None),
        "m5_speedup_int8_vs_f32": (
            round(res["m5_f32"] / res["m5_int8"], 3)
            if res["m5_f32"] and res["m5_int8"] else None),
    }
    with open(os.path.join(REPO, "benchmarks", "INT8_BENCH.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({
        "metric": "int8 PTQ scoring speedup vs f32 (CnnAvgPooling, 16x60s)",
        "value": out["speedup_int8_vs_f32"],
        "unit": "x",
        "detail": out["ms_per_batch"],
        "fidelity_sigmoid_maxdiff": out["int8_vs_f32_sigmoid_maxdiff"],
    }))


if __name__ == "__main__":
    main()
