"""Train-step profile + MFU (VERDICT r1 #5).

Decomposes the fused spectrogram train step (batch 128, crop 30x64,
Cnn_AvgPooling TRAIN config, Adam/AMSGrad) into device-timed components, each
measured as a jitted lax.scan of K iterations (one dispatch per measurement,
so this harness's ~30 ms relay RPC floor is amortized away):

  data      gather crops + mix/noise augment + normalize
  fwd       forward + loss (train-mode BatchNorm)
  fwd+bwd   value_and_grad
  step      full fused step (data + fwd + bwd + AMSGrad update)

MFU is reported for the conv stack: analytic conv FLOPs (fwd 2*MACs, bwd
~3x fwd) over measured step time, against the chip's dense peak.  The
reference's comparable counter is train.py:113-115 (im/sec only; it has no
profile story at all — SURVEY.md §5).

Run: python benchmarks/profile_train.py   (TPU)
Writes benchmarks/TRAIN_PROFILE.json and prints one summary JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = 128
# Two-point slope timing: time scans of K1 and K2 iterations and divide the
# difference — cancels this harness's ~30 ms relay-RPC floor exactly
# (ROADMAP.md "Environment notes"; a single-K measurement at K=50 inflates a
# 0.9 ms step to 1.5 ms).
K1, K2 = 50, 250

# Dense bf16 peak FLOP/s per chip by TPU generation (public numbers).
# device_kind strings: "TPU v4", "TPU v5 lite" (v5e), "TPU v5p", "TPU v6 lite".
PEAK_FLOPS = {"v4": 275e12, "v5e": 197e12, "v5 lite": 197e12,
              "v5p": 459e12, "v6e": 918e12, "v6 lite": 918e12}


def conv_stack_flops(model_config, t, f, cin=1):
    """Analytic forward MACs for the ConvBlock stack on a (t, f, cin) input."""
    macs = 0
    for cout, pool in model_config:
        macs += t * f * 9 * cin * cout      # conv1 3x3
        macs += t * f * 9 * cout * cout     # conv2 3x3
        t, f, cin = t // pool, f // pool, cout
    return macs


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.data.device_pipeline import (
        SpectrogramBuffers,
        make_augment_batch,
        make_gather_crops,
        make_spectrogram_train_step,
        make_transform,
    )
    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
    from sed_tpu.train.loss import weighted_bce_with_logits
    from sed_tpu.train.optim import make_optimizer
    from sed_tpu.train.state import init_state

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind})")

    rng = np.random.default_rng(0)
    crop, mel = cfg.train_crop_size, cfg.mel_bins
    total = 200 * crop
    buffers = SpectrogramBuffers(
        features=jnp.asarray(rng.standard_normal((1, total, mel)).astype(np.float32)),
        events=jnp.asarray((rng.random((total, 1)) > 0.9).astype(np.float32)),
        start_indices=jnp.arange(total - crop, dtype=jnp.int32),
        mean=jnp.zeros((mel,), jnp.float32),
        std=jnp.ones((mel,), jnp.float32),
    )
    model = CnnAvgPooling(classes_num=cfg.classes_num,
                          model_config=TRAIN_CHANNEL_AND_POOL)
    tx = make_optimizer(1e-6)
    state0 = init_state(model, jax.random.key(0), jnp.zeros((BATCH, crop, mel, 1)), tx)
    starts = jnp.asarray(rng.integers(0, total - crop, size=(K2, BATCH), dtype=np.int32))
    key0 = jax.random.key(1)

    gather = make_gather_crops(cfg)
    transform = make_transform(cfg, "logMel")
    augment = make_augment_batch(cfg, "logMel")

    def data_body(buffers, st, k):
        feats, events = gather(buffers, st)
        feats, events = augment(k, buffers, feats, events)
        x = transform(buffers, feats)
        return jnp.transpose(x, (0, 2, 3, 1)), events

    def loss_of(params, batch_stats, x, events):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, train=True, mutable=["batch_stats"])
        return weighted_bce_with_logits(out, events, 5.0, True), updates["batch_stats"]

    # --- component programs (each one jitted scan) --------------------------
    def prog_data(k_iters):
        def body(carry, st):
            key = carry
            key, k = jax.random.split(key)
            x, ev = data_body(buffers, st, k)
            return key, x.sum() + ev.sum()
        return jax.jit(lambda key: jax.lax.scan(body, key, starts[:k_iters])[1].sum())

    def prog_fwd(k_iters):
        def body(carry, st):
            key = carry
            key, k = jax.random.split(key)
            x, ev = data_body(buffers, st, k)
            loss, _ = loss_of(state0.params, state0.batch_stats, x, ev)
            return key, loss
        return jax.jit(lambda key: jax.lax.scan(body, key, starts[:k_iters])[1].sum())

    def prog_fwdbwd(k_iters):
        def body(carry, st):
            key = carry
            key, k = jax.random.split(key)
            x, ev = data_body(buffers, st, k)
            (loss, _), grads = jax.value_and_grad(
                lambda p: loss_of(p, state0.batch_stats, x, ev), has_aux=True
            )(state0.params)
            return key, loss + sum(jnp.sum(g) for g in jax.tree.leaves(grads))
        return jax.jit(lambda key: jax.lax.scan(body, key, starts[:k_iters])[1].sum())

    def prog_step(augment_on):
        raw = make_spectrogram_train_step(model, tx, cfg, 5.0, "logMel",
                                          augment_on, jit=False)

        def make(k_iters):
            def body(carry, st):
                state, key = carry
                key, k = jax.random.split(key)
                state, loss = raw(state, buffers, st, k)
                return (state, key), loss
            return jax.jit(lambda state, key: jax.lax.scan(
                body, (state, key), starts[:k_iters])[1].sum())
        return make

    programs = {
        "data (gather+augment+normalize)": (prog_data, (key0,)),
        "data + fwd": (prog_fwd, (key0,)),
        "data + fwd + bwd": (prog_fwdbwd, (key0,)),
        "full step (augment on)": (prog_step(True), (state0, key0)),
        "full step (augment off)": (prog_step(False), (state0, key0)),
    }

    def best_of(fn, args, n=3):
        float(fn(*args))  # compile + fetch
        best = float("inf")
        for rep in range(n):
            # Fresh rng per rep + forced value fetch: the relay can serve
            # repeated identical executions from a cache, and
            # block_until_ready() can return optimistically.
            import jax.numpy as _jnp

            args_r = tuple(
                jax.random.fold_in(a, rep)
                if hasattr(a, "dtype") and _jnp.issubdtype(a.dtype, jax.dtypes.prng_key)
                else a
                for a in args)
            t0 = time.perf_counter()
            float(fn(*args_r))
            best = min(best, time.perf_counter() - t0)
        return best

    times = {}
    for name, (make, args) in programs.items():
        log(f"compiling: {name} ...")
        t_k1 = best_of(make(K1), args)
        t_k2 = best_of(make(K2), args)
        times[name] = (t_k2 - t_k1) / (K2 - K1)
        log(f"  {name}: {1e3 * times[name]:.3f} ms/step "
            f"(floor {1e3 * (t_k1 - K1 * times[name]):.1f} ms)")

    step_t = times["full step (augment on)"]
    fwd_macs = BATCH * conv_stack_flops(TRAIN_CHANNEL_AND_POOL, crop, mel)
    fwd_flops = 2 * fwd_macs
    train_flops = 3 * fwd_flops  # fwd + dgrad + wgrad
    kind = dev.device_kind.lower()
    peak = next((v for k, v in PEAK_FLOPS.items() if k in kind), None)
    mfu = train_flops / step_t / peak if peak else None
    # f32 convolutions lower to 3 bf16 MXU passes on this hardware, so the
    # honest utilization figure for the parity-mode (f32) step is against
    # peak/3 — BWD_PROBE.json shows the conv stack is at ~100% of that.
    mfu_f32_effective = 3 * mfu if mfu else None

    breakdown = {
        "data_ms": 1e3 * times["data (gather+augment+normalize)"],
        "fwd_ms": 1e3 * (times["data + fwd"] - times["data (gather+augment+normalize)"]),
        "bwd_ms": 1e3 * (times["data + fwd + bwd"] - times["data + fwd"]),
        "optimizer_ms": 1e3 * (times["full step (augment on)"] - times["data + fwd + bwd"]),
        "step_ms": 1e3 * step_t,
        "step_no_augment_ms": 1e3 * times["full step (augment off)"],
    }
    for k, v in breakdown.items():
        log(f"{k:22s} {v:8.3f}")
    log(f"conv-stack train FLOPs/step: {train_flops / 1e9:.2f} GF; "
        f"peak {peak / 1e12 if peak else '?'} TF -> MFU {mfu and f'{100 * mfu:.1f}%'}")

    out = {
        "batch": BATCH,
        "device_kind": dev.device_kind,
        "method": f"two-point slope over lax.scan of K={K1}/{K2} steps (cancels the relay RPC floor), best of 3",
        "times_ms_per_step": {k: round(1e3 * v, 4) for k, v in times.items()},
        "breakdown_ms": {k: round(v, 4) for k, v in breakdown.items()},
        "conv_train_gflops_per_step": round(train_flops / 1e9, 2),
        "assumed_peak_tflops": peak and peak / 1e12,
        "conv_mfu_pct_vs_bf16_peak": mfu and round(100 * mfu, 2),
        "conv_mfu_pct_vs_effective_f32_peak": mfu_f32_effective
        and round(100 * mfu_f32_effective, 2),
        "im_per_sec": round(BATCH / step_t, 1),
    }
    with open(os.path.join(REPO, "benchmarks", "TRAIN_PROFILE.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({
        "metric": "fused train step (batch 128, augment on)",
        "value": round(1e3 * step_t, 3),
        "unit": "ms/step",
        "im_per_sec": out["im_per_sec"],
        "conv_mfu_pct_vs_effective_f32_peak": out["conv_mfu_pct_vs_effective_f32_peak"],
    }))


if __name__ == "__main__":
    main()
