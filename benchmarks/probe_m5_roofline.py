"""Per-stage roofline breakdown for M5 waveform inference.

BWD_PROBE.json established the 2-D CNN's train step sits at ~100% of the
effective 3-pass-f32 MXU peak; the M5 family (reference
models/waveform_models.py:9-75) has no such record — M5_BENCH.json gives one
end-to-end number (~124k frames/s) with no statement about how far from the
hardware ceiling that is.  This probe:

  depth-k     inference forward of the first k stages only -> successive
              differences give per-stage cost
  MACs        computed analytically per stage, so every stage gets an MFU
              against the effective f32 conv peak (f32 convs lower to 3
              bf16 MXU passes, same convention as BWD_PROBE)
  bf16        whole stack in bfloat16 compute (is M5 dtype-bound?)
  patches     conv1 (k=79, s=4, C_in=1 — contraction depth 79, poorly
              shaped for the 128-lane MXU) re-expressed as XLA im2col
              (conv_general_dilated_patches) + a single (79 x 64) matmul

All slope-timed (two-point fori_loop, best of 3) on resident data.

Run: python benchmarks/probe_m5_roofline.py    (TPU)
Writes benchmarks/M5_ROOFLINE.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("SED_PROBE_BATCH", "256"))
K1 = int(os.environ.get("SED_PROBE_K1", "20"))
K2 = int(os.environ.get("SED_PROBE_K2", "60"))
# f32 convs lower to 3 bf16 MXU passes (BWD_PROBE convention).
PEAK_BF16 = {"v4": 275e12, "v5e": 197e12, "v5 lite": 197e12}


def stage_macs(batch: int, frame: int) -> dict:
    """Analytic MAC counts per stage (inference, shapes from m5.py)."""
    n1 = frame // 4                      # conv1 stride 4, 'SAME'-style pad 39
    macs = {"stage1_conv79": batch * n1 * 79 * 1 * 64}
    n = n1 // 4                          # pool 4
    chans = 64
    for i, feats in enumerate((64, 64, 128), start=2):
        m = batch * n * 3 * chans * feats + batch * n * 3 * feats * feats
        macs[f"stage{i}_block{feats}"] = m
        chans = feats
        n //= 4
    macs["stage5_block256"] = batch * n * 3 * chans * 256 + batch * n * 3 * 256 * 256
    return macs


def main():
    import jax

    if os.environ.get("SED_BENCH_DEVICE") == "cpu":
        # plumbing smoke only — redirect must precede any backend query
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import flax.linen as nn

    from sed_tpu.configs import DEFAULT_WAVEFORM as cfg
    from sed_tpu.models.layers import BN_EPS, BN_MOMENTUM, kaiming_uniform

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind})")

    frame = cfg.frame_size
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((BATCH, frame, 1)).astype(np.float32))

    class Stack(nn.Module):
        """First ``depth`` M5 stages (m5.py geometry), inference mode."""

        depth: int
        dtype: type = jnp.float32
        conv1_impl: str = "conv"  # 'conv' | 'patches' | 's2d'

        def _cbr(self, x, feats, k, s, p):
            x = nn.Conv(feats, (k,), strides=(s,), padding=p,
                        kernel_init=kaiming_uniform, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=True, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS, dtype=self.dtype)(x)
            return nn.relu(x)

        @nn.compact
        def __call__(self, x):
            x = x.astype(self.dtype)
            if self.conv1_impl == "patches":
                # im2col: (B, n1, 79) patches, then one MXU matmul.
                patches = jax.lax.conv_general_dilated_patches(
                    jnp.transpose(x, (0, 2, 1)), (79,), (4,), [(39, 39)])
                patches = jnp.transpose(patches, (0, 2, 1))  # (B, n1, 79)
                w = self.param("conv1_w", kaiming_uniform, (79, 64), jnp.float32)
                b = self.param("conv1_b", nn.initializers.zeros, (64,), jnp.float32)
                x = patches.astype(self.dtype) @ w.astype(self.dtype) + b.astype(self.dtype)
                x = nn.BatchNorm(use_running_average=True, momentum=BN_MOMENTUM,
                                 epsilon=BN_EPS, dtype=self.dtype)(x)
                x = nn.relu(x)
            elif self.conv1_impl == "s2d":
                # The production space-to-depth stem (models/m5.py): free
                # reshapes re-express k=79 s=4 as k=7 over 16-sample blocks
                # (contraction 112 = 87.5% MXU lane fill, 1.42x MACs).
                from sed_tpu.models.m5 import s2d_conv1

                w = self.param("conv1_w", kaiming_uniform, (79, 1, 64),
                               jnp.float32)
                b = self.param("conv1_b", nn.initializers.zeros, (64,),
                               jnp.float32)
                x = s2d_conv1(x.astype(self.dtype), w.astype(self.dtype),
                              b.astype(self.dtype))
                x = nn.BatchNorm(use_running_average=True,
                                 momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                 dtype=self.dtype)(x)
                x = nn.relu(x)
            else:
                x = self._cbr(x, 64, 79, 4, 39)
            x = nn.max_pool(x, (4,), (4,))
            stages = [(64,), (64,), (128,)]
            for i, (feats,) in enumerate(stages[: max(0, self.depth - 1)]):
                x = self._cbr(x, feats, 3, 1, 1)
                x = self._cbr(x, feats, 3, 1, 1)
                x = nn.max_pool(x, (4,), (4,))
            if self.depth >= 5:
                x = self._cbr(x, 256, 3, 1, 1)
                x = self._cbr(x, 256, 3, 1, 1)
            return x.astype(jnp.float32)

    def timed(model):
        variables = model.init(jax.random.key(0), x0)

        def make(k_iters):
            @jax.jit
            def run(x):
                def body(i, carry):
                    xv, acc = carry
                    out = model.apply(variables, xv)
                    return (xv + 1e-6, acc + out.sum())
                return jax.lax.fori_loop(0, k_iters, body, (x, jnp.float32(0)))[1]
            return run

        times = []
        for k in (K1, K2):
            fn = make(k)
            float(fn(x0))  # compile + warm
            best = float("inf")
            for rep in range(3):
                xr = x0 + jnp.float32(1e-5 * (rep + 1))
                xr.block_until_ready()
                t0 = time.perf_counter()
                float(fn(xr))
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        return (times[1] - times[0]) / (K2 - K1)

    macs = stage_macs(BATCH, frame)
    peak = next((v for k, v in PEAK_BF16.items() if k in dev.device_kind), 197e12)
    eff_peak_f32 = peak / 3.0

    results = {}
    for d in (1, 2, 3, 4, 5):
        name = f"depth-{d}"
        log(f"compiling {name} ...")
        results[name] = timed(Stack(depth=d))
        log(f"  {name}: {1e3 * results[name]:.3f} ms")
    variants = {
        "depth-5 bf16": Stack(depth=5, dtype=jnp.bfloat16),
        "depth-1 patches": Stack(depth=1, conv1_impl="patches"),
        # Round-5 refresh: the shipped space-to-depth stem (f32 default
        # since M5_S2D_BENCH) and the bf16-composition question in all
        # four depth-1 combos.
        "depth-1 s2d": Stack(depth=1, conv1_impl="s2d"),
        "depth-5 s2d": Stack(depth=5, conv1_impl="s2d"),
        "depth-1 bf16": Stack(depth=1, dtype=jnp.bfloat16),
        "depth-1 s2d bf16": Stack(depth=1, conv1_impl="s2d",
                                  dtype=jnp.bfloat16),
        "depth-5 s2d bf16": Stack(depth=5, conv1_impl="s2d",
                                  dtype=jnp.bfloat16),
    }
    for name, mod in variants.items():
        log(f"compiling {name} ...")
        results[name] = timed(mod)
        log(f"  {name}: {1e3 * results[name]:.3f} ms")

    per_stage = {}
    stage_names = list(macs)
    for i, sn in enumerate(stage_names, start=1):
        dt = results[f"depth-{i}"] - (results[f"depth-{i-1}"] if i > 1 else 0.0)
        per_stage[sn] = {
            "ms": round(1e3 * dt, 4),
            "gmacs": round(macs[sn] / 1e9, 3),
            "mfu_vs_3pass_f32_peak": round(2 * macs[sn] / max(dt, 1e-9) / eff_peak_f32, 4),
        }

    total_macs = sum(macs.values())
    full = results["depth-5"]
    # Stage-1 HBM floor: conv1 writes (B, frame/4, 64) activations + reads
    # the (B, frame) waveform — dtype-dependent, compute-independent.  This
    # is the term the s2d lane-fill fix CANNOT remove, and the candidate
    # mechanism for bf16 non-composition (at bf16 the conv is cheap enough
    # that the stage rides this floor either way).
    hbm_gbps = 819e9
    s1_bytes_f32 = BATCH * (frame // 4) * 64 * 4 + BATCH * frame * 4
    s1_bytes_bf16 = BATCH * (frame // 4) * 64 * 2 + BATCH * frame * 4
    s2d_macs1 = macs["stage1_conv79"] * 112 / 79  # zero-padded taps
    out = {
        "batch": BATCH,
        "frame_samples": frame,
        "device_kind": dev.device_kind,
        "method": f"two-point slope over fori_loop K={K1}/{K2}, best of 3; "
                  "inference forward (eval-mode BN) of truncated M5 stacks",
        "assumed_peak_bf16_tflops": peak / 1e12,
        "ms": {k: round(1e3 * v, 4) for k, v in results.items()},
        "per_stage": per_stage,
        "full_model": {
            "ms": round(1e3 * full, 4),
            "frames_per_sec": round(BATCH / full, 1),
            "gmacs": round(total_macs / 1e9, 3),
            "mfu_vs_3pass_f32_peak": round(2 * total_macs / full / eff_peak_f32, 4),
            "mfu_vs_bf16_peak": round(2 * total_macs / full / peak, 4),
        },
        "bf16_speedup": round(full / results["depth-5 bf16"], 3),
        "conv1_patches_vs_conv": round(results["depth-1"] / results["depth-1 patches"], 3),
        "s2d": {  # round-5 refresh: the SHIPPED f32 stem is s2d
            "full_model_s2d_f32_ms": round(1e3 * results["depth-5 s2d"], 4),
            "frames_per_sec_s2d_f32": round(BATCH / results["depth-5 s2d"], 1),
            "s2d_speedup_f32": round(full / results["depth-5 s2d"], 3),
            "s2d_speedup_bf16": round(
                results["depth-5 bf16"] / results["depth-5 s2d bf16"], 3),
            "stage1_f32": {
                "direct_ms": round(1e3 * results["depth-1"], 4),
                "s2d_ms": round(1e3 * results["depth-1 s2d"], 4),
                "s2d_mfu_vs_3pass_f32_peak": round(
                    2 * s2d_macs1 / results["depth-1 s2d"] / eff_peak_f32, 4),
                "hbm_floor_ms": round(1e3 * s1_bytes_f32 / hbm_gbps, 4),
            },
            "stage1_bf16": {
                "direct_ms": round(1e3 * results["depth-1 bf16"], 4),
                "s2d_ms": round(1e3 * results["depth-1 s2d bf16"], 4),
                "hbm_floor_ms": round(1e3 * s1_bytes_bf16 / hbm_gbps, 4),
            },
        },
        "caveat": "per-stage attribution by truncated-stack differencing is "
                  "SUB-ADDITIVE: XLA pipelines work across fori_loop "
                  "iterations and each truncated stack materializes a "
                  "different-size HBM output, so stage deltas can exceed "
                  "the per-stage roofline (or go slightly negative in the "
                  "cheap tail stages).  depth-1 vs depth-5 wall time and "
                  "the full-model MFU are the load-bearing numbers.",
    }
    with open(os.path.join(REPO, "benchmarks", "M5_ROOFLINE.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({"metric": "M5 inference full-stack", "unit": "ms/batch256",
                      "value": out["full_model"]["ms"],
                      "mfu_vs_3pass_f32_peak": out["full_model"]["mfu_vs_3pass_f32_peak"],
                      "per_stage": {k: v["ms"] for k, v in per_stage.items()},
                      "bf16_speedup": out["bf16_speedup"],
                      "s2d": out["s2d"],
                      "conv1_patches_vs_conv": out["conv1_patches_vs_conv"]}))


if __name__ == "__main__":
    main()
