"""Headline benchmark: featurize + CNN inference throughput on 60 s clips.

Measures audio-seconds processed per wall-second per chip for the full
pipeline (waveform -> fused log-mel featurizer -> Cnn_AvgPooling forward ->
sigmoid scores) in steady state, with host->device transfer overlapped via
async dispatch.  This is BASELINE.json's headline metric; the north star is
>= 100x real-time per TPU v4 chip (vs_baseline = value / 100).

Prints ONE JSON line on stdout; all diagnostics go to stderr.
"""

from __future__ import annotations

import json
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

    @jax.jit
    def pipeline(waveforms):  # (batch, samples, 1) -> (batch, frames', classes)
        feats = logmel_features_batch(waveforms, cfg)            # (B, C, T, M)
        x = jnp.transpose(feats, (0, 2, 3, 1))                   # NHWC
        logits = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
        return jax.nn.sigmoid(logits)

    rng = np.random.default_rng(0)
    host_batches = [
        rng.standard_normal((batch, samples, 1)).astype(np.float32) for _ in range(2)
    ]

    log("compiling pipeline...")
    t0 = time.time()
    out = pipeline(jnp.asarray(host_batches[0]))
    out.block_until_ready()
    log(f"compile+first run: {time.time() - t0:.1f}s, output {out.shape}")

    # Steady state: device_put the next batch while the current one computes
    # (async dispatch overlaps the copy with compute).
    iters = 8
    staged = jax.device_put(host_batches[0])
    t0 = time.time()
    pending = []
    for i in range(iters):
        nxt = jax.device_put(host_batches[(i + 1) % 2])
        pending.append(pipeline(staged))
        staged = nxt
    for p in pending:
        p.block_until_ready()
    elapsed = time.time() - t0
    audio_sec_per_sec = batch * clip_seconds * iters / elapsed

    # Compute-only (input resident in HBM): the pure TPU featurize+infer rate.
    t0 = time.time()
    for _ in range(iters):
        out = pipeline(staged)
    out.block_until_ready()
    compute_elapsed = time.time() - t0
    compute_rate = batch * clip_seconds * iters / compute_elapsed

    log(f"end-to-end: {audio_sec_per_sec:.0f} audio-sec/sec "
        f"({audio_sec_per_sec / (batch * clip_seconds):.2f} batches/s)")
    log(f"compute-only: {compute_rate:.0f} audio-sec/sec")

    print(json.dumps({
        "metric": "featurize+infer throughput (60s clips, end-to-end incl. H2D)",
        "value": round(audio_sec_per_sec, 1),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(audio_sec_per_sec / 100.0, 2),
    }))


if __name__ == "__main__":
    main()
