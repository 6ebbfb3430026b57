"""M5 fused-train-step throughput, direct vs space-to-depth stem.

The spectrogram train step has a pinned record (profile_train.py, 0.890
ms/step post round-4); this gives the WAVEFORM family the same treatment
and A/Bs the s2d stem (models/m5.py conv1_s2d) in training — the k=79 stem
dominates the forward (M5_ROOFLINE.json) and its bwd (grad-to-input is a
transposed conv with the same thin contraction) is expected to dominate the
step.

Pinned protocol: median-of-5 two-point slopes over fori_loop'd train steps
(K=10/30), perturbed batches, value fetches.  Writes
benchmarks/M5_TRAIN_BENCH.json and prints one JSON line.
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


def main(batch: int = 64) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp
    import optax

    from protocol import slope_stats
    from sed_tpu.configs import DEFAULT_WAVEFORM as cfg
    from sed_tpu.models.m5 import M5
    from sed_tpu.train.loss import weighted_bce_with_logits
    from sed_tpu.train.optim import make_optimizer
    from sed_tpu.train.state import init_state

    log(f"device: {jax.devices()[0].device_kind}; batch={batch}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch, cfg.frame_size, cfg.audio_channels)).astype(np.float32) * 0.1)
    y = jnp.asarray((rng.random((batch, cfg.classes_num)) > 0.8)
                    .astype(np.float32))
    tx = make_optimizer(1e-4)

    def measure(model, tag):
        state0 = init_state(model, jax.random.key(0), x, tx)

        def make_loop(k_iters):
            @jax.jit
            def loop(x0):
                def body(i, carry):
                    st, xv = carry
                    def loss_fn(params):
                        out, upd = model.apply(
                            {"params": params,
                             "batch_stats": st.batch_stats},
                            xv, train=True, mutable=["batch_stats"])
                        # Waveform labels are per-frame scalars
                        # (data/waveform_dataset.py start-index rule).
                        return (weighted_bce_with_logits(
                            out, y, 5.0, multi_frame=False),
                            upd["batch_stats"])
                    (loss, bs), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(st.params)
                    updates, opt = tx.update(grads, st.opt_state, st.params)
                    st = st.replace(step=st.step + 1,
                                    params=optax.apply_updates(
                                        st.params, updates),
                                    batch_stats=bs, opt_state=opt)
                    return (st, xv + 1e-7)
                st, _ = jax.lax.fori_loop(0, k_iters, body, (state0, x0))
                return jnp.sum(st.params["Dense_0"]["kernel"])
            return loop

        def perturb(x0, k):
            xr = x0 + jnp.float32(1e-5 * (k + 1))
            xr.block_until_ready()
            return xr

        log(f"compiling {tag}...")
        st = slope_stats(make_loop, x, perturb, iters_pair=(10, 30), n=5)
        ms = st["median"] * 1e3
        log(f"  {tag}: {ms:.4f} ms/step ({batch / st['median']:.0f} frames/s;"
            f" spread [{st['min']*1e3:.4f}, {st['max']*1e3:.4f}])")
        return {"ms_per_step": ms,
                "ms_spread": [st["min"] * 1e3, st["max"] * 1e3],
                "frames_per_sec": batch / st["median"]}

    d = measure(M5(classes_num=cfg.classes_num), "direct")
    s = measure(M5(classes_num=cfg.classes_num, conv1_s2d=True), "s2d")
    results = {"batch": batch,
               "device_kind": jax.devices()[0].device_kind,
               "method": "median-of-5 two-point slopes, fori_loop K=10/30, "
                         "full fused train step (AMSGrad + BN updates)",
               "direct": d, "s2d": s,
               "s2d_speedup": d["ms_per_step"] / s["ms_per_step"]}
    with open(os.path.join(HERE, "M5_TRAIN_BENCH.json"), "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print(json.dumps({"metric": "m5_train_step", "unit": "ms",
                      "value": round(d["ms_per_step"], 4),
                      "s2d_ms": round(s["ms_per_step"], 4),
                      "s2d_speedup": round(results["s2d_speedup"], 3)}))


if __name__ == "__main__":
    main(batch=int(os.environ.get("SED_M5_TRAIN_BATCH", "64")))
