"""Backward-pass breakdown for the fused train step (ROADMAP #3).

TRAIN_PROFILE.json shows bwd = 0.505 ms of the 0.871 ms step — 3.0x the fwd
time where dgrad+wgrad should cost ~2x fwd.  This probe locates the overhead:

  depth-k      fwd+bwd of the first k ConvBlocks only (sum-loss) ->
               successive differences give per-block train cost
  no-bn        same stack with BatchNorm removed (BN train-mode bwd share)
  nchw         first conv done in NCHW layout via lax.conv dimension_numbers
  bf16         whole stack in bfloat16 compute

All slope-timed (two-point lax.scan) on resident data.

Run: python benchmarks/probe_bwd.py    (TPU)
Writes benchmarks/BWD_PROBE.json and prints one JSON line.
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
K1, K2 = 50, 250


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import flax.linen as nn

    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.models.cnn import TRAIN_CHANNEL_AND_POOL
    from sed_tpu.models.layers import BN_EPS, BN_MOMENTUM, ConvBlock, kaiming_uniform

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind})")

    crop, mel = cfg.train_crop_size, cfg.mel_bins
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((BATCH, crop, mel, 1)).astype(np.float32))

    class Stack(nn.Module):
        depth: int
        use_bn: bool = True
        dtype: type = jnp.float32
        param_dtype: type = jnp.float32

        @nn.compact
        def __call__(self, x, train=True):
            x = x.astype(self.dtype)
            for (out_c, pool) in TRAIN_CHANNEL_AND_POOL[: self.depth]:
                if self.use_bn:
                    x = ConvBlock(out_c, pool, dtype=self.dtype)(x, train=train)
                else:
                    for _ in range(2):
                        x = nn.Conv(out_c, (3, 3), padding=1, use_bias=False,
                                    kernel_init=kaiming_uniform, dtype=self.dtype,
                                    param_dtype=self.param_dtype)(x)
                        x = nn.relu(x)
                    if pool > 1:
                        x = nn.avg_pool(x, (pool, pool), (pool, pool))
            return x.astype(jnp.float32)

    def timed_grad(model):
        variables = model.init(jax.random.key(0), x0, train=True)
        params = variables["params"]
        bs = variables.get("batch_stats", {})

        def loss_fn(p, x):
            if bs:
                out, _ = model.apply({"params": p, "batch_stats": bs}, x,
                                     train=True, mutable=["batch_stats"])
            else:
                out = model.apply({"params": p}, x, train=True)
            return jnp.sum(out * out)

        grad_fn = jax.value_and_grad(loss_fn)

        def make(k_iters):
            @jax.jit
            def run(x):
                def body(carry, _):
                    x, acc = carry
                    x = x.at[0, 0, 0, 0].add(1e-6)
                    v, g = grad_fn(params, x)
                    return (x, acc + v + sum(jnp.sum(t) for t in jax.tree.leaves(g))), None
                return jax.lax.scan(body, (x, jnp.float32(0)), None, length=k_iters)[0][1]
            return run

        times = []
        for k in (K1, K2):
            fn = make(k)
            float(fn(x0))
            best = float("inf")
            for rep in range(3):
                xr = x0 + 1e-5 * (rep + 1)
                xr.block_until_ready()
                t0 = time.perf_counter()
                float(fn(xr))
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        return (times[1] - times[0]) / (K2 - K1)

    results = {}
    for d in (1, 2, 3, 4):
        name = f"depth-{d} (conv+bn)"
        log(f"compiling {name} ...")
        results[name] = timed_grad(Stack(depth=d))
        log(f"  {name}: {1e3 * results[name]:.3f} ms")
    ablations = [
        ("depth-4 no-bn", Stack(depth=4, use_bn=False)),
        ("depth-4 bf16", Stack(depth=4, dtype=jnp.bfloat16)),
        ("depth-4 bf16 no-bn", Stack(depth=4, use_bn=False, dtype=jnp.bfloat16)),
        ("depth-4 bf16 no-bn bf16-params",
         Stack(depth=4, use_bn=False, dtype=jnp.bfloat16,
               param_dtype=jnp.bfloat16)),
    ]
    for name, stack in ablations:
        log(f"compiling {name} ...")
        results[name] = timed_grad(stack)
        log(f"  {name}: {1e3 * results[name]:.3f} ms")

    out = {
        "batch": BATCH,
        "device_kind": dev.device_kind,
        "method": f"two-point slope over lax.scan K={K1}/{K2}, best of 3; "
                  "value_and_grad of sum(out^2) over the ConvBlock stack",
        "ms": {k: round(1e3 * v, 4) for k, v in results.items()},
        "per_block_ms": {
            f"block{d}": round(1e3 * (results[f"depth-{d} (conv+bn)"]
                                      - results.get(f"depth-{d-1} (conv+bn)", 0.0)), 4)
            for d in (1, 2, 3, 4)
        },
    }
    with open(os.path.join(REPO, "benchmarks", "BWD_PROBE.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({"metric": "conv-stack fwd+bwd depth-4", "unit": "ms",
                      "value": out["ms"]["depth-4 (conv+bn)"],
                      "detail": out["per_block_ms"], "ablations": out["ms"]}))


if __name__ == "__main__":
    main()
