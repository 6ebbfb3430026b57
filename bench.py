"""Headline benchmark: featurize + CNN inference throughput on 60 s clips.

Measures audio-seconds processed per wall-second per chip for the full
pipeline: waveform -> fused log-mel featurizer (framing, Hann, matmul rFFT,
mel projection, dB) -> Cnn_AvgPooling forward -> sigmoid scores.

Headline metric = steady-state rate with waveforms resident in HBM, which is
this framework's operating mode (the device pipeline keeps packed data in HBM
and streams only indices).  The end-to-end rate including host->device copies
of int16 PCM is also measured and logged to stderr; in this harness the TPU is
reached through a network relay (~30 MB/s), so that number reflects the
tunnel, not the design.

North star (BASELINE.json): >= 100x real-time per chip; vs_baseline = value/100.
Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
    from sed_tpu.ops.featurizer import logmel_features_batch

    device = jax.devices()[0]
    log(f"device: {device}")

    batch = 16
    clip_seconds = 60
    samples = cfg.working_sample_rate * clip_seconds

    model = CnnAvgPooling(classes_num=cfg.classes_num, model_config=TRAIN_CHANNEL_AND_POOL)
    frames = 1 + samples // cfg.hop_size
    init_x = jnp.zeros((batch, frames, cfg.mel_bins, 1), jnp.float32)
    variables = model.init(jax.random.key(0), init_x, train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    def make_pipeline_body(use_pallas):
        def pipeline_body(waveforms_i16):  # (B, samples, 1) int16 -> (B, frames', classes)
            # int16 means PCM16 on every featurizer path (de-quantized exactly).
            feats = logmel_features_batch(waveforms_i16, cfg, use_pallas=use_pallas)
            x = jnp.transpose(feats, (0, 2, 3, 1))               # NHWC
            logits = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
            return jax.nn.sigmoid(logits)

        return pipeline_body

    # 'full' = the fused Pallas featurizer (window+rFFT+power kernel + folded
    # mel kernel) — the fast path on TPU; False = pure-XLA reference path.
    pipeline_body = make_pipeline_body("full" if jax.default_backend() == "tpu" else False)
    pipeline = jax.jit(pipeline_body)
    xla_pipeline_body = make_pipeline_body(False)

    rng = np.random.default_rng(0)
    host_batches = [
        (rng.standard_normal((batch, samples, 1)) * 8000).astype(np.int16) for _ in range(2)
    ]

    log("compiling pipeline...")
    t0 = time.time()
    staged = jax.device_put(host_batches[0])
    out = pipeline(staged)
    out.block_until_ready()
    log(f"compile+first run: {time.time() - t0:.1f}s, output {out.shape}")

    # Headline: HBM-resident steady state, measured as two device-side loops
    # of different lengths; the per-step time is the SLOPE between them, which
    # cancels this harness's ~30 ms relay RPC floor exactly (a tiny input
    # perturbation per iteration defeats CSE).
    iters1, iters2 = 10, 30

    def make_loop(body_fn, iters):
        @jax.jit
        def loop(w):
            def body(i, carry):
                w, acc = carry
                return (w + jnp.int16(1), acc + body_fn(w).sum())

            return jax.lax.fori_loop(0, iters, body, (w, jnp.float32(0.0)))[1]

        return loop

    def slope_time(body_fn):
        """Seconds per pipeline application, relay floor cancelled."""
        times = []
        for iters in (iters1, iters2):
            loop = make_loop(body_fn, iters)
            float(loop(staged))  # compile + fetch
            best = float("inf")
            for rep in range(3):
                # Fresh input per rep + forced value fetch: on this relay,
                # block_until_ready() can return optimistically and repeated
                # identical executions can be served from a cache.
                xr = staged + jnp.int16(101 + 7 * rep)
                xr.block_until_ready()
                t0 = time.time()
                float(loop(xr))
                best = min(best, time.time() - t0)
            times.append(best)
        return (times[1] - times[0]) / (iters2 - iters1)

    per_call = slope_time(pipeline_body)
    compute_rate = batch * clip_seconds / per_call

    full_ab = os.environ.get("SED_BENCH_FULL", "") == "1"

    # Fast mode (FFT at bf16x4, <=2e-4 dB) via the public featurizer API.
    def fast_body(waveforms_i16):
        feats = logmel_features_batch(waveforms_i16, cfg, use_pallas="full",
                                      pallas_precision="bf16x4")
        x = jnp.transpose(feats, (0, 2, 3, 1))
        logits = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
        return jax.nn.sigmoid(logits)

    if full_ab:
        fast_rate = batch * clip_seconds / slope_time(fast_body)
        log(f"fast mode (FFT bf16x4, <=2e-4 dB): {fast_rate:.0f} audio-sec/sec")
        # A/B: the pure-XLA featurizer path, same slope methodology.
        xla_rate = batch * clip_seconds / slope_time(xla_pipeline_body)
        log(f"XLA-featurizer path: {xla_rate:.0f} audio-sec/sec")

    # End-to-end including int16 H2D: threaded double-buffer (a worker thread
    # streams the next batch while the device computes on the current one) —
    # hardware-measured best of {serial, async-pipelined, threaded} in this
    # harness.  The asymptote is the relay link itself: raw device_put of one
    # batch is measured alongside, and e2e is reported with its link
    # utilization (e2e is 100% transfer-bound here; compute is ~18 ms/batch
    # against ~2.7 s/batch of transfer at ~34 MB/s).
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.time()
    for i in range(3):
        jax.device_put(host_batches[i % 2]).block_until_ready()
    put_floor = (time.time() - t0) / 3
    floor_rate = batch * clip_seconds / put_floor

    ex = ThreadPoolExecutor(1)
    n_e2e = 4
    t0 = time.time()
    fut = ex.submit(jax.device_put, host_batches[0])
    pending = []
    for i in range(n_e2e):
        staged = fut.result()
        fut = ex.submit(jax.device_put, host_batches[(i + 1) % 2])
        pending.append(pipeline(staged))
    for pnd in pending:
        pnd.block_until_ready()
    e2e_rate = batch * clip_seconds * n_e2e / (time.time() - t0)
    ex.shutdown(wait=False)

    log(f"HBM-resident: {compute_rate:.0f} audio-sec/sec "
        f"({compute_rate / clip_seconds:.1f} clips/s)")
    log(f"relay H2D floor: {floor_rate:.0f} audio-sec/sec "
        f"({host_batches[0].nbytes / put_floor / 1e6:.1f} MB/s)")
    log(f"end-to-end (int16 H2D, threaded double-buffer): {e2e_rate:.0f} "
        f"audio-sec/sec = {100 * e2e_rate / floor_rate:.0f}% of the link floor")

    print(json.dumps({
        "metric": "featurize+infer throughput, 60s clips, HBM-resident",
        "value": round(compute_rate, 1),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(compute_rate / 100.0, 2),
    }))


if __name__ == "__main__":
    main()
