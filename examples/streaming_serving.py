"""Streaming serving example: N live audio streams scored online on one chip.

Demonstrates the three streaming tiers (sed_tpu.streaming /
sed_tpu.device_streaming) on a synthetic pool of live 48 kHz streams with
clap-like events, and checks they agree with offline inference:

  1. StreamingDetector        — one stream, arbitrary chunk sizes
  2. BatchedStreamingDetector — N lockstep streams, shared dispatches
  3. DeviceStreamingDetector  — N lockstep streams with ALL state on-device
                                (int16 chunks in, scores out; the production
                                serving shape)

Runs on CPU or TPU:  python examples/streaming_serving.py [--device cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--seconds", type=int, default=30)
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.device_streaming import DeviceStreamingDetector
    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
    from sed_tpu.ops.featurizer import logmel_features
    from sed_tpu.streaming import BatchedStreamingDetector

    sr = cfg.working_sample_rate
    rng = np.random.default_rng(0)

    # Synthetic "live" streams: noise + exponential clap bursts.
    B, sec = args.streams, args.seconds
    streams = 0.01 * rng.standard_normal((B, sec * sr)).astype(np.float32)
    for b in range(B):
        for t_ev in rng.uniform(2, sec - 2, size=3):
            i = int(t_ev * sr)
            n = int(0.05 * sr)
            streams[b, i:i + n] += (0.6 * np.exp(-np.arange(n) / (0.01 * sr))
                                    * rng.standard_normal(n)).astype(np.float32)

    model = CnnAvgPooling(classes_num=cfg.classes_num,
                          model_config=TRAIN_CHANNEL_AND_POOL)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 128, cfg.mel_bins, 1)), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    # --- device-resident detector: int16 chunks in, scores out -------------
    chunk = sr  # 1 s ticks
    det = DeviceStreamingDetector(model, params, batch_stats, cfg, batch=B,
                                  chunk_samples=chunk, halo=32)
    pcm = (streams * 32767).astype(np.int16)
    emitted = []
    t0 = time.time()
    for i in range(sec):
        block = det.push(pcm[:, i * chunk:(i + 1) * chunk])
        if block.shape[1]:
            print(f"t={i + 1:3d}s  emitted {block.shape[1]} frames/stream, "
                  f"max score {block.max():.3f}")
        emitted.append(block)
    emitted.append(det.flush())
    online = np.concatenate([e for e in emitted if e.shape[1]], axis=1)
    wall = time.time() - t0
    print(f"\nonline: {online.shape[1]} frames/stream x {B} streams in "
          f"{wall:.1f}s wall ({B * sec / wall:.1f} audio-s/s)")

    # --- agreement with offline whole-recording inference ------------------
    f32 = pcm.astype(np.float32) / 32768.0
    lm = np.stack([np.asarray(logmel_features(jnp.asarray(s)[:, None], cfg))[0]
                   for s in f32])
    x = jnp.asarray(lm)[:, :, :, None]
    offline = np.asarray(jax.nn.sigmoid(model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False)))
    n = online.shape[1]
    err = np.max(np.abs(online - offline[:, :n]))
    print(f"online vs offline max |diff| over {n} frames: {err:.2e}")
    assert err < 1e-4, "online scores must match offline inference"

    # --- the host-side batched tier gives the same stream ------------------
    det2 = BatchedStreamingDetector(model, params, batch_stats, cfg, batch=B,
                                    halo=32)
    out2 = []
    for i in range(sec):
        out2.append(det2.push(f32[:, i * chunk:(i + 1) * chunk]))
    out2.append(det2.flush())
    host = np.concatenate([e for e in out2 if e.shape[1]], axis=1)
    err2 = np.max(np.abs(host - online))
    print(f"device-resident vs host-batched max |diff|: {err2:.2e}")
    assert err2 < 1e-5
    print("OK")


if __name__ == "__main__":
    main()
