"""End-to-end LIVE serving throughput through the TCP socket path.

STREAMING_TICK.json measures the bare device tick; this measures the whole
wire: N loopback clients stream int16 PCM through sed_tpu/serve_socket.py
(framing, staging, batched ticks, score delivery) as fast as the server
accepts it.  The aggregate real-time factor (audio-seconds scored per
wall-second) IS the number of concurrent real-time streams this serving
process sustains end to end — socket overhead, host staging, and dispatch
included, unlike the tick-only projection.

Reference context: the reference serves nothing (its infer.py:9-37 is
batch-offline); this extends the serving story.

Run: python benchmarks/bench_serve_socket.py          (TPU; CPU works)
Env: SED_SOCK_STREAMS (default 16), SED_SOCK_SECONDS per stream (default 60),
     SED_SOCK_ARCH cnn|m5 (default cnn), SED_SOCK_WIRE pcm16|mulaw
     (default pcm16; mulaw halves the socket bytes per client),
     SED_SOCK_FRAME_BUCKET (m5 only, default 64: rows per batched tick
     dispatch across the pool).
Writes benchmarks/SERVE_SOCKET_BENCH.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from sed_tpu.configs import SpectrogramConfig, WaveformConfig
    from sed_tpu.serve_socket import StreamClient, StreamServer
    from sed_tpu.train.optim import make_optimizer
    from sed_tpu.train.state import init_state

    n_streams = int(os.environ.get("SED_SOCK_STREAMS", "16"))
    seconds = float(os.environ.get("SED_SOCK_SECONDS", "60"))
    arch = os.environ.get("SED_SOCK_ARCH", "cnn")
    wire = os.environ.get("SED_SOCK_WIRE", "pcm16")
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind}); {n_streams} streams x "
        f"{seconds:.0f}s, arch={arch}, wire={wire}")

    if arch in ("m5", "m5dev"):
        from sed_tpu.models.m5 import M5
        from sed_tpu.waveform_streaming import (DeviceWaveformStreamPool,
                                                WaveformStreamPool)

        cfg = WaveformConfig()
        model = M5(classes_num=cfg.classes_num)
        state = init_state(model, jax.random.key(0),
                           jnp.zeros((1, cfg.frame_size, 1)),
                           make_optimizer(1e-4))
        if arch == "m5dev":
            # Device-resident rings + raw sparse wire: ~1/8th the H2D of
            # the host pool's f32 overlapping frames.
            pool = DeviceWaveformStreamPool(
                model, state.params, state.batch_stats, cfg,
                slots=n_streams, chunk_samples=cfg.working_sample_rate)
        else:
            fb = int(os.environ.get("SED_SOCK_FRAME_BUCKET", "64"))
            pool = WaveformStreamPool(model, state.params, state.batch_stats,
                                      cfg, slots=n_streams, frame_bucket=fb)
    else:
        from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
        from sed_tpu.stream_pool import StreamPool

        cfg = SpectrogramConfig()
        model = CnnAvgPooling(classes_num=cfg.classes_num,
                              model_config=TRAIN_CHANNEL_AND_POOL)
        state = init_state(
            model, jax.random.key(0),
            jnp.zeros((1, cfg.train_crop_size, cfg.mel_bins, 1)),
            make_optimizer(1e-4))
        pool = StreamPool(model, state.params, state.batch_stats, cfg,
                          slots=n_streams,
                          chunk_samples=cfg.working_sample_rate)

    sr = cfg.working_sample_rate
    piece = sr  # 1 s pieces
    n_pieces = int(seconds)
    rng = np.random.default_rng(0)
    # One shared second of noise, per-stream offset — content doesn't affect
    # throughput, and the relay result-cache can't collapse distinct streams
    # anyway (different slots/phases).
    base = (3000 * rng.standard_normal(piece + n_streams)).astype(np.int16)

    # Warmup BEFORE the server starts: drive the pool directly with
    # wire-typed chunks so the startup push AND the admitted device tick
    # (whose input dtype follows the wire: int16 or uint8 µ-law) compile
    # now, not mid-measurement.  A socket warmup can't guarantee this: a
    # flooding client finishes during the first (compiling) tick and
    # leave() then drains it host-side without ever compiling the tick.
    if wire == "mulaw":
        from sed_tpu.ops.mulaw import mulaw_encode

        warm_piece = mulaw_encode(base[:piece])
    else:
        warm_piece = base[:piece]
    t_warm = time.perf_counter()
    ws = pool.join()
    for _ in range(4):
        pool.feed(ws, warm_piece)
        pool.tick()
    if hasattr(pool, "ROUNDS_PER_CALL"):
        # Compile every program the measured run will hit: the single-round
        # tick, the scanned block at each sparse-wire bucket (16/64/256
        # cells — 1, 4, and all slots active for a full block), and the
        # batched-drain programs (shared featurize + stacked forward).
        K = pool.ROUNDS_PER_CALL
        others = [pool.join() for _ in range(n_streams - 1)]
        slots_all = [ws] + others
        for _ in range(2):  # admit everyone (past the startup switch)
            for s in slots_all:
                pool.feed(s, warm_piece)
            pool.tick()
        for n_active in (1, 4, len(slots_all)):
            for s in slots_all[:n_active]:
                pool.feed(s, np.tile(warm_piece, K + 1))
            pool.tick()
        pool.leave_many(slots_all)
    else:
        pool.leave(ws)
    log(f"warmup (direct pool, wire={wire}): "
        f"{time.perf_counter() - t_warm:.1f}s")

    server = StreamServer(pool, tick_interval=0.005, wire=wire)
    server.start()

    frames_got = [0] * n_streams
    errors = []

    def run(i):
        try:
            c = StreamClient(*server.address, classes_num=cfg.classes_num,
                             wire=wire)
            for _ in range(n_pieces):
                c.send(base[i: i + piece])
            tail = c.finish()
            frames_got[i] = tail.shape[0]
        except Exception as e:  # noqa: BLE001 — report, don't hang the bench
            errors.append((i, repr(e)))

    # SED_SOCK_PROFILE=1: time where the wall goes (tick rounds vs joins vs
    # drains) — accumulators around the pool methods the server drives.
    prof = os.environ.get("SED_SOCK_PROFILE") == "1"
    prof_acc = {"tick_s": 0.0, "ticks": 0, "ticks_scoring": 0,
                "leave_s": 0.0, "leaves": 0, "feed_s": 0.0, "feeds": 0}
    if prof and hasattr(pool, "profile"):
        pool.profile = {}  # per-phase breakdown inside the pool tick path
    if prof:
        _t, _l, _f = pool.tick, pool.leave, pool.feed
        _lm = pool.leave_many

        def leave_many_timed(slots):
            t = time.perf_counter()
            o = _lm(slots)
            prof_acc["leave_s"] += time.perf_counter() - t
            prof_acc["leaves"] += len(list(slots))
            return o

        pool.leave_many = leave_many_timed

        def tick_timed():
            t = time.perf_counter()
            o = _t()
            prof_acc["tick_s"] += time.perf_counter() - t
            prof_acc["ticks"] += 1
            prof_acc["ticks_scoring"] += bool(o)
            return o

        def leave_timed(b):
            t = time.perf_counter()
            o = _l(b)
            prof_acc["leave_s"] += time.perf_counter() - t
            prof_acc["leaves"] += 1
            return o

        def feed_timed(b, s):
            t = time.perf_counter()
            o = _f(b, s)
            prof_acc["feed_s"] += time.perf_counter() - t
            prof_acc["feeds"] += 1
            return o

        pool.tick, pool.leave, pool.feed = tick_timed, leave_timed, feed_timed

    # One short socket round-trip exercises the framing path end to end.
    w = StreamClient(*server.address, classes_num=cfg.classes_num, wire=wire)
    for _ in range(2):
        w.send(base[:piece])
    w.finish()
    log("socket warmup done")
    if prof:  # count only the measured run, not the socket warmup
        for k in prof_acc:
            prof_acc[k] = 0.0 if isinstance(prof_acc[k], float) else 0
        if hasattr(pool, "profile"):
            pool.profile = {}

    t0 = time.perf_counter()
    threads = [threading.Thread(target=run, args=(i,))
               for i in range(n_streams)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=1200)
    wall = time.perf_counter() - t0
    server.stop()
    if errors:
        log(f"client errors: {errors[:4]}")
    audio_total = n_streams * n_pieces  # seconds of audio pushed
    rtf = audio_total / wall

    if prof:
        if getattr(pool, "profile", None):
            prof_acc["pool_phases"] = {
                k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in pool.profile.items()}
        log(f"profile: {json.dumps({k: round(v, 2) if isinstance(v, float) else v for k, v in prof_acc.items()})}")

    out = {
        "bench": "serve_socket_end_to_end",
        "device_kind": dev.device_kind,
        "arch": arch,
        "wire": wire,
        "streams": n_streams,
        "seconds_per_stream": n_pieces,
        "wall_seconds": round(wall, 2),
        "aggregate_realtime_factor": round(rtf, 1),
        "min_frames_per_stream": int(min(frames_got)),
        "client_errors": len(errors),
    }
    if prof:
        out["profile"] = {k: (round(v, 2) if isinstance(v, float) else v)
                          for k, v in prof_acc.items()}
    suffix = ("" if arch == "cnn" else f"_{arch.upper()}") + \
             ("" if wire == "pcm16" else f"_{wire.upper()}")
    with open(os.path.join(HERE, f"SERVE_SOCKET_BENCH{suffix}.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({
        "metric": "live socket serving, end-to-end",
        "value": round(rtf, 1),
        "unit": "concurrent real-time streams sustained (audio-s/s)",
        "streams": n_streams,
        "errors": len(errors),
    }))


if __name__ == "__main__":
    main()
