"""Streaming (online) detection bench: sustained real-time factor per chip.

Feeds a live 48 kHz stream to :class:`sed_tpu.streaming.StreamingDetector`
in 1 s chunks (the latency-relevant serving shape) and reports the sustained
processing rate = audio-seconds consumed per wall-second, plus the per-chunk
wall cost.  The detector's score-emission latency itself is structural
(halo/fps seconds of right context, documented in streaming.py) — this bench
measures the COMPUTE cost added on top.

Note on this harness: every push makes 1-2 synchronous relay dispatches
(~30 ms RPC floor each), so the absolute per-chunk number here is
relay-dominated; the JSON records the steady-state rate with that caveat.
On a direct-attached TPU host the same path is sub-ms per chunk.

Run: python benchmarks/bench_streaming.py   (TPU; also runs on CPU)
Writes benchmarks/STREAMING_BENCH.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STREAM_SECONDS = 120
CHUNK_SECONDS = 1.0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
    from sed_tpu.streaming import StreamingDetector

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind})")

    model = CnnAvgPooling(classes_num=cfg.classes_num,
                          model_config=TRAIN_CHANNEL_AND_POOL)
    x0 = jnp.zeros((1, 128, cfg.mel_bins, 1))
    variables = model.init(jax.random.key(0), x0, train=False)

    sr = cfg.working_sample_rate
    chunk = int(sr * CHUNK_SECONDS)
    rng = np.random.default_rng(0)
    stream = (rng.standard_normal(STREAM_SECONDS * sr) * 0.1).astype(np.float32)

    def run(n_seconds):
        det = StreamingDetector(model, variables["params"],
                                variables["batch_stats"], cfg, halo=32)
        out = []
        for i in range(n_seconds):
            out.append(det.push(stream[i * chunk:(i + 1) * chunk]))
        out.append(det.flush())
        return np.concatenate([o for o in out if o.size], axis=0)

    log("warmup (compiles the bucketed shapes) ...")
    t0 = time.perf_counter()
    scores = run(10)
    log(f"warmup: {time.perf_counter() - t0:.1f}s, {scores.shape} frames")

    # Steady state: time a long run, subtract a short run (amortizes compile
    # and the fixed flush cost).
    t0 = time.perf_counter()
    run(20)
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(STREAM_SECONDS)
    t_long = time.perf_counter() - t0
    per_second = (t_long - t_short) / (STREAM_SECONDS - 20)
    rtf = CHUNK_SECONDS / per_second

    log(f"steady-state: {1e3 * per_second:.1f} ms wall per 1 s chunk "
        f"-> {rtf:.1f}x real-time single-stream")

    # Batched serving density: N lockstep streams share every device dispatch
    # (sed_tpu.streaming.BatchedStreamingDetector), so the per-push RPC cost
    # amortizes across streams.
    from sed_tpu.streaming import BatchedStreamingDetector

    n_streams = 32
    streams = (rng.standard_normal((n_streams, 40 * sr)) * 0.1).astype(np.float32)

    def run_batched(n_seconds):
        det = BatchedStreamingDetector(model, variables["params"],
                                       variables["batch_stats"], cfg,
                                       batch=n_streams, halo=32)
        for i in range(n_seconds):
            det.push(streams[:, i * chunk:(i + 1) * chunk])
        det.flush()

    log("warmup batched ...")
    run_batched(8)
    t0 = time.perf_counter()
    run_batched(12)
    t_b_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_batched(40)
    t_b_long = time.perf_counter() - t0
    per_second_b = (t_b_long - t_b_short) / (40 - 12)
    density = n_streams * CHUNK_SECONDS / per_second_b
    log(f"batched x{n_streams}: {1e3 * per_second_b:.1f} ms wall per 1 s tick "
        f"-> {density:.0f} audio-s/s streaming density")

    # Device-resident streaming (sed_tpu.device_streaming): rings live in HBM,
    # each tick uploads only raw int16 chunks and runs one jitted step.
    from sed_tpu.device_streaming import DeviceStreamingDetector

    streams_i16 = (streams * 32768).astype(np.int16)

    def run_device(n_seconds):
        det = DeviceStreamingDetector(model, variables["params"],
                                      variables["batch_stats"], cfg,
                                      batch=n_streams, chunk_samples=chunk,
                                      halo=32)
        for i in range(n_seconds):
            det.push(streams_i16[:, i * chunk:(i + 1) * chunk])
        det.flush()

    log("warmup device-resident ...")
    run_device(8)
    t0 = time.perf_counter()
    run_device(12)
    t_d_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_device(40)
    t_d_long = time.perf_counter() - t0
    per_second_d = (t_d_long - t_d_short) / (40 - 12)
    density_d = n_streams * CHUNK_SECONDS / per_second_d
    log(f"device-resident x{n_streams}: {1e3 * per_second_d:.1f} ms wall per "
        f"1 s tick -> {density_d:.0f} audio-s/s streaming density")

    out = {
        "device_kind": dev.device_kind,
        "chunk_seconds": CHUNK_SECONDS,
        "ms_per_chunk_steady": round(1e3 * per_second, 2),
        "single_stream_real_time_factor": round(rtf, 2),
        "batched_streams": n_streams,
        "batched_ms_per_tick": round(1e3 * per_second_b, 2),
        "batched_streaming_density_audio_s_per_s": round(density, 1),
        "device_resident_ms_per_tick": round(1e3 * per_second_d, 2),
        "device_resident_density_audio_s_per_s": round(density_d, 1),
        "note": "per-push cost is relay-RPC-dominated in this harness "
                "(~30 ms/dispatch); structural emission latency is halo/fps s",
    }
    with open(os.path.join(REPO, "benchmarks", "STREAMING_BENCH.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({
        "metric": "streaming per-1s-chunk wall cost (single stream)",
        "value": out["ms_per_chunk_steady"],
        "unit": "ms",
        "real_time_factor": out["single_stream_real_time_factor"],
        "batched_density_audio_s_per_s":
            out["batched_streaming_density_audio_s_per_s"],
        "device_resident_density_audio_s_per_s":
            out["device_resident_density_audio_s_per_s"],
    }))


if __name__ == "__main__":
    main()
