"""Serving with stream churn + AOT artifacts — the round-3 serving stack.

Part 1 (StreamPool, sed_tpu/stream_pool.py): a slot pool where live streams
JOIN and LEAVE mid-run without restarting the fleet — stream B joins three
ticks after A, A hangs up, C reuses A's slot — and every stream's scores
still match a fresh detector on the same audio.

Part 2 (AOT, sed_tpu/export.py): compile the whole int16-PCM -> featurize ->
CNN -> sigmoid graph ONCE, serialize the compiled executable with the
weights, and reload it with no compilation — the cold-start story for batch
serving (fresh-process load->first-result is seconds; see
benchmarks/SERVING_AOT.json for the measured number).

Part 3 (DeviceWaveformStreamPool, sed_tpu/waveform_streaming.py): the M5
serving default — per-slot HBM sample rings, raw int16 chunks on the wire,
frames extracted and scored in one jitted step (165.7x aggregate real-time
over live sockets, benchmarks/SERVE_SOCKET_BENCH_M5DEV.json).

Runs on CPU or TPU:  python examples/lifecycle_serving.py [--device cpu]
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
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sed_tpu.configs import SpectrogramConfig
    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
    from sed_tpu.stream_pool import StreamPool
    from sed_tpu.streaming import BatchedStreamingDetector

    # Small config so the example runs in seconds on CPU.
    cfg = SpectrogramConfig(working_sample_rate=8000, time_margin=0.33)
    chunk = cfg.working_sample_rate  # 1 s ticks
    model = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 128, cfg.mel_bins, 1)), train=False)
    params, stats = variables["params"], variables["batch_stats"]

    rng = np.random.default_rng(0)
    audio = {k: (0.1 * rng.standard_normal((n, chunk))).astype(np.float32)
             for k, n in (("A", 12), ("B", 14), ("C", 8))}
    joins = {"A": 0, "B": 3, "C": 13}  # C joins after A leaves at tick 11

    print("== Part 1: StreamPool join/leave ==")
    pool = StreamPool(model, params, stats, cfg, slots=2,
                      chunk_samples=chunk, halo=64, total_stride=8, bucket=64)
    slot, fed, got, tails = {}, dict.fromkeys(audio, 0), \
        {k: [] for k in audio}, {}
    for tick in range(25):
        for k, j in joins.items():
            if tick == j:
                slot[k] = pool.join()
                print(f"tick {tick:2d}: {k} joined slot {slot[k]}")
        live = {k for k in audio
                if joins[k] <= tick < joins[k] + len(audio[k])}
        if live:
            out = pool.push({slot[k]: audio[k][fed[k]] for k in live})
            for k in live:
                got[k].append(out[slot[k]])
                fed[k] += 1
        for k in audio:
            if tick == joins[k] + len(audio[k]) - 1:
                tails[k] = pool.leave(slot.pop(k))
                print(f"tick {tick:2d}: {k} left")

    for k in audio:  # verify against fresh single-stream detectors
        ref = BatchedStreamingDetector(model, params, stats, cfg, batch=1,
                                       halo=64, total_stride=8, bucket=64)
        r = [ref.push(c[None])[0] for c in audio[k]] + [ref.flush()[0]]
        mine = np.concatenate([x for x in got[k] + [tails[k]] if x.shape[0]])
        theirs = np.concatenate([x for x in r if x.shape[0]])
        d = float(np.abs(mine - theirs).max())
        print(f"  {k}: {mine.shape[0]} frames, max diff vs fresh detector "
              f"{d:.2e}")
        assert d < 1e-5

    print("== Part 1b: variable-rate input (feed/tick staging) ==")
    # Real producers are uneven: stage ANY piece sizes with feed(), score
    # full chunks in batched ticks, and leave() drains the partial tail
    # exactly.  Slots absent from a round simply idle (sparse ticks).
    pool = StreamPool(model, params, stats, cfg, slots=2,
                      chunk_samples=chunk, halo=64, total_stride=8, bucket=64)
    wav = (0.1 * rng.standard_normal(5 * chunk + 1234)).astype(np.float32)
    s = pool.join()
    outs, pos = [], 0
    while pos < len(wav):
        n = int(rng.integers(chunk // 3, 2 * chunk))  # uneven producer
        pool.feed(s, wav[pos:pos + n])
        pos += n
        outs += list(pool.tick().values())
    outs.append(pool.leave(s))
    ref = BatchedStreamingDetector(model, params, stats, cfg, batch=1,
                                   halo=64, total_stride=8, bucket=64)
    theirs = np.concatenate([x for x in (ref.push(wav[None])[0],
                                         ref.flush()[0]) if x.shape[0]])
    mine = np.concatenate([x for x in outs if x.shape[0]])
    d = float(np.abs(mine - theirs).max())
    print(f"  uneven feeds -> {mine.shape[0]} frames, max diff {d:.2e}")
    assert d < 1e-5

    print("== Part 2: AOT serving artifact ==")
    from sed_tpu.export import (aot_export_pipeline, cnn_serving,
                                load_aot_pipeline)

    B, sec = 2, 4
    samples = cfg.working_sample_rate * sec
    score_fn, weights = cnn_serving(model, params, stats)
    t0 = time.time()
    blob = aot_export_pipeline(
        score_fn, weights, B, samples, cfg,
        use_pallas="full" if args.device == "tpu" else False)
    print(f"  built {len(blob) / 1e6:.1f} MB artifact in "
          f"{time.time() - t0:.1f}s (compile paid once)")
    t0 = time.time()
    call = load_aot_pipeline(blob)
    pcm = (rng.standard_normal((B, samples, 1)) * 4000).astype(np.int16)
    scores = call(pcm)
    print(f"  load->first-result {time.time() - t0:.2f}s "
          f"(no compilation), scores {scores.shape}")

    print("== Part 3: M5 device-resident stream pool ==")
    from sed_tpu.configs import WaveformConfig
    from sed_tpu.data.events import frame_coverage_labels
    from sed_tpu.models.m5 import M5
    from sed_tpu.train.state import make_eval_forward
    from sed_tpu.waveform_streaming import DeviceWaveformStreamPool

    wcfg = WaveformConfig(working_sample_rate=8000, time_margin=0.33)
    m5 = M5(classes_num=1)
    wv = m5.init(jax.random.key(1), jnp.zeros((1, wcfg.frame_size, 1)),
                 train=False)
    wpool = DeviceWaveformStreamPool(m5, wv["params"], wv["batch_stats"],
                                     wcfg, slots=2)
    wav16 = (3000 * rng.standard_normal(4 * wcfg.frame_size + 777)
             ).astype(np.int16)
    ws = wpool.join()
    wouts, pos = [], 0
    while pos < len(wav16):
        n = int(rng.integers(2000, 20000))
        wpool.feed(ws, wav16[pos:pos + n])  # raw int16 rides the wire
        pos += n
        o = wpool.tick()
        if ws in o:
            wouts.append(o[ws])
    wouts.append(wpool.leave(ws))
    frames, _ = frame_coverage_labels(
        (wav16.astype(np.float32) / 32768.0)[None], [], [], wcfg)
    fwd = make_eval_forward(m5)
    wref = np.asarray(jax.nn.sigmoid(fwd(
        wv["params"], wv["batch_stats"],
        jnp.asarray(np.transpose(frames, (0, 2, 1))))))
    wmine = np.concatenate([x for x in wouts if x.shape[0]])
    wd = float(np.abs(wmine - wref).max())
    print(f"  device-ring M5 stream -> {wmine.shape[0]} frames, "
          f"max diff vs offline split {wd:.2e}")
    assert wd < 1e-5


if __name__ == "__main__":
    main()
