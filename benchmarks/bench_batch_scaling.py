"""Batch scaling of the headline featurize+infer pipeline (BASELINE config #5).

The pinned headline (bench.py) measures batch=16 x 60 s clips.  BASELINE
config #5 asks for batched long-form inference at 128 concurrent clips; this
bench sweeps the batch axis on ONE chip to measure how throughput/chip scales
as the per-dispatch batch grows (larger batches amortize the XLA framing
pre-pass and kernel launch overheads and feed the MXU bigger matmuls).

Reference behavior being scaled: /root/reference/infer.py:27-37 scores one
recording at a time; this pipeline scores B recordings per dispatch.

Protocol: benchmarks/protocol.py (median-of-N two-point slopes; spread kept).
Run: python benchmarks/bench_batch_scaling.py          (TPU)
Env: SED_SCALE_BATCHES="16,32,64,128" to override the sweep.
     SED_SCALE_TIER=parity (default) | turbo_int8 — the latter sweeps the
     max-throughput serving mode (bf16x1 FFT featurizer + int8 PTQ CNN,
     benchmarks/FAST_FEATURIZER.json `turbo_int8_combined`) instead of the
     golden parity pipeline.
Writes benchmarks/BATCH_SCALING.json (parity) or
BATCH_SCALING_TURBO_INT8.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CLIP_SECONDS = 60


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from protocol import slope_stats
    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
    from sed_tpu.ops.featurizer import logmel_features_batch

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind})")

    batches = [int(b) for b in os.environ.get(
        "SED_SCALE_BATCHES", "16,32,64,128").split(",")]
    samples = cfg.working_sample_rate * CLIP_SECONDS
    frames = 1 + samples // cfg.hop_size

    model = CnnAvgPooling(classes_num=cfg.classes_num,
                          model_config=TRAIN_CHANNEL_AND_POOL)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, frames, cfg.mel_bins, 1)),
                           train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    use_pallas = "full" if jax.default_backend() == "tpu" else False

    tier = os.environ.get("SED_SCALE_TIER", "parity")
    if tier not in ("parity", "turbo_int8"):
        raise SystemExit(f"SED_SCALE_TIER must be parity|turbo_int8, got {tier}")

    if tier == "turbo_int8":
        # Max-throughput serving mode: bf16x1 FFT tier + int8 PTQ CNN
        # (same construction as bench_fast_featurizer.py's combined mode).
        from sed_tpu.models.quantize import quantize_cnn, quantized_scores

        calib_w = jnp.asarray(
            (np.random.default_rng(7).standard_normal(
                (4, samples, 1)) * 8000).astype(np.int16))
        calib_f = logmel_features_batch(calib_w, cfg, use_pallas=use_pallas)
        q = quantize_cnn(model, params, batch_stats,
                         [jnp.transpose(calib_f, (0, 2, 3, 1))])

        def pipeline_body(w):
            feats = logmel_features_batch(w, cfg, use_pallas=use_pallas,
                                          pallas_precision="bf16x1")
            return quantized_scores(q, jnp.transpose(feats, (0, 2, 3, 1)))
    else:
        def pipeline_body(w):
            feats = logmel_features_batch(w, cfg, use_pallas=use_pallas)
            x = jnp.transpose(feats, (0, 2, 3, 1))
            logits = model.apply({"params": params, "batch_stats": batch_stats},
                                 x, train=False)
            return jax.nn.sigmoid(logits)

    def make_loop(iters):
        @jax.jit
        def loop(w):
            def body(i, carry):
                w, acc = carry
                return (w + jnp.int16(1), acc + pipeline_body(w).sum())
            return jax.lax.fori_loop(0, iters, body, (w, jnp.float32(0.0)))[1]
        return loop

    def perturb(x, k):
        xr = x + jnp.int16(101 + 7 * k)
        xr.block_until_ready()
        return xr

    rng = np.random.default_rng(0)
    results = {}
    errors = {}
    for B in batches:
        w = (rng.standard_normal((B, samples, 1)) * 8000).astype(np.int16)
        t0 = time.time()
        staged = jax.device_put(w)
        staged.block_until_ready()
        log(f"B={B}: staged {w.nbytes / 1e6:.0f} MB in {time.time() - t0:.1f}s")
        # Smaller loop lengths at large B keep run time bounded; the slope
        # still cancels the RPC floor.
        iters_pair = (10, 30) if B <= 32 else (4, 12)
        t0 = time.time()
        try:
            stats = slope_stats(make_loop, staged, perturb,
                                iters_pair=iters_pair, n=5)
        except Exception as e:  # e.g. HBM OOM at the largest batch
            errors[B] = f"{type(e).__name__}: {str(e)[:300]}"
            log(f"B={B}: FAILED — {errors[B]}")
            del staged
            continue
        per_call = stats["median"]
        rate = B * CLIP_SECONDS / per_call
        results[B] = {
            "ms_per_batch": round(1e3 * per_call, 3),
            "audio_s_per_s": round(rate, 0),
            "audio_s_per_s_spread": [
                round(B * CLIP_SECONDS / stats["max"], 0),
                round(B * CLIP_SECONDS / stats["min"], 0)],
            "n": stats["n"],
            "discarded": stats["discarded"],
        }
        log(f"B={B}: {1e3 * per_call:.2f} ms/batch -> {rate:.0f} audio-s/s "
            f"(spread {results[B]['audio_s_per_s_spread']}; "
            f"measured in {time.time() - t0:.0f}s)")

    if not results:
        raise SystemExit("every batch size failed: " + json.dumps(errors))
    best_b = max(results, key=lambda b: results[b]["audio_s_per_s"])
    out = {
        "device_kind": dev.device_kind,
        "clip_seconds": CLIP_SECONDS,
        "tier": tier,
        "protocol": "median-of-5 two-point slopes (benchmarks/protocol.py)",
        "per_batch": {str(b): results[b] for b in results},
        "errors": {str(b): errors[b] for b in errors},
        "best_batch": best_b,
        "best_audio_s_per_s": results[best_b]["audio_s_per_s"],
        "vs_pinned_b16": round(results[best_b]["audio_s_per_s"]
                               / results[batches[0]]["audio_s_per_s"], 3)
        if batches[0] == 16 and batches[0] in results else None,
    }
    fname = ("BATCH_SCALING.json" if tier == "parity"
             else "BATCH_SCALING_TURBO_INT8.json")
    with open(os.path.join(REPO, "benchmarks", fname), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({
        "metric": f"featurize+infer batch scaling ({tier}), 60s clips, "
                  "HBM-resident",
        "value": out["best_audio_s_per_s"],
        "unit": "audio-sec/sec/chip",
        "best_batch": best_b,
    }))


if __name__ == "__main__":
    main()
