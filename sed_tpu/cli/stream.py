"""Streaming serving CLI: score wav files through the StreamPool lifecycle.

The reference has no streaming at all (its infer.py:9-37 is batch-offline
only); this CLI puts the device-resident streaming stack (sed_tpu/
stream_pool.py — HBM rings, one jitted tick for the whole fleet, join/leave
mid-run) on the user surface.  Each wav file becomes one stream: files join
as slots free up (optionally staggered to exercise churn), feed() one
chunk's worth of audio per tick (the final piece is partial — no padding),
tick() scores the fleet in one batched dispatch, and leave() drains the
remainder exactly when a file's audio ends.  Scores per file equal the
offline pipeline on the same audio (the streaming invariant pinned by
tests/test_stream_pool.py and test_cli.py).

    python -m sed_tpu.cli.stream a.wav b.wav c.wav --ckpt <ckpt> \
        [--chunk_seconds 1.0] [--slots 8] [--stagger_ticks 2] \
        [--event_threshold 0.5]

Writes <name>_scores.npy (+ optional <name>_events.csv) per file and prints
one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Streaming (lifecycle) sound-event scoring")
    p.add_argument("audio_files", type=str, nargs="+")
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--outputs_dir", type=str, default="streaming_outputs")
    p.add_argument("--chunk_seconds", type=float, default=1.0,
                   help="chunk every stream pushes per tick")
    p.add_argument("--slots", type=int, default=0,
                   help="pool slots (0 = min(#files, 32)); files beyond the "
                        "slot count join as earlier streams leave")
    p.add_argument("--stagger_ticks", type=int, default=0,
                   help="file i may join no earlier than tick i*stagger "
                        "(0 = all join as soon as a slot is free)")
    p.add_argument("--halo", type=int, default=64,
                   help="receptive-field halo (frames, stride-aligned)")
    p.add_argument("--featurizer", type=str, default="auto",
                   help="auto|pallas|xla tick featurizer")
    p.add_argument("--featurizer_precision", type=str, default="parity",
                   choices=["parity", "fast", "turbo"],
                   help="FFT precision tier on the pallas tick path: parity "
                        "= golden-tested (default); fast/turbo = reduced-"
                        "precision serving (benchmarks/FAST_FEATURIZER.json)")
    p.add_argument("--num_devices", type=int, default=1,
                   help="shard the pool's slots over a data mesh of this "
                        "many devices (slots must divide evenly)")
    p.add_argument("--quantize", choices=["int8"], default=None,
                   help="score with the int8 PTQ forward (lossy serving "
                        "mode, models/quantize.py; calibrated on the first "
                        "file's features)")
    p.add_argument("--mean_std_file", type=str, default="")
    p.add_argument("--device", default="tpu", type=str)
    p.add_argument("--event_threshold", type=float, default=None)
    p.add_argument("--event_min_duration", type=float, default=0.0)
    p.add_argument("--event_merge_gap", type=float, default=0.0)
    p.add_argument("--tau_labels", type=str, default="doorslam",
                   help="comma-separated event classes — must match the "
                        "checkpoint's training config")
    p.add_argument("--arch", type=str, default="CnnAvgPooling",
                   choices=["CnnAvgPooling", "MobileNetV1", "M5"],
                   help="model family: the spectrogram families "
                        "(CnnAvgPooling, MobileNetV1) stream over the "
                        "HBM-ring pool; M5 streams hop-strided waveform "
                        "frames")
    p.add_argument("--m5_pool", choices=["device", "host"], default="device",
                   help="M5 pool: 'device' (default — HBM rings + raw "
                        "sparse wire; hardware A/B "
                        "SERVE_SOCKET_BENCH_M5DEV.json) or 'host' "
                        "(rolling host buffers; per-frame latency)")
    p.add_argument("--bf16", action="store_true", default=False,
                   help="bfloat16 model forward (params stay f32) — lossy "
                        "serving tier, measured 1.66x for M5 at <=6.4e-3 "
                        "sigmoid deviation (benchmarks/M5_BENCH.json); "
                        "CnnAvgPooling/M5 only")
    return p


def main(argv=None):
    args = build_arg_parser().parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sed_tpu.configs import SpectrogramConfig, WaveformConfig
    from sed_tpu.cli.infer import load_model_and_state
    from sed_tpu.io.audio import read_multichannel_audio

    labels = tuple(args.tau_labels.split(","))
    cfg = (WaveformConfig(tau_sed_labels=labels) if args.arch == "M5"
           else SpectrogramConfig(tau_sed_labels=labels))

    chunk = int(round(args.chunk_seconds * cfg.working_sample_rate))
    mean = std = None
    if args.mean_std_file:
        import pickle

        with open(args.mean_std_file, "rb") as f:
            d = pickle.load(f)
        mean, std = d["mean"], d["std"]

    if args.bf16 and args.quantize:
        raise SystemExit("--bf16 and --quantize are mutually exclusive "
                         "serving tiers (int8 replaces the float forward)")
    model, state = load_model_and_state(args.ckpt, cfg, arch=args.arch,
                                        bf16=args.bf16)
    if args.arch == "MobileNetV1":
        # The streaming stack applies the serving sigmoid itself — use the
        # logits-emitting view of the same params (models/cnn.py).  int8
        # streaming dispatches through quantized_serving_scores (the
        # MobileNet artifact already emits sigmoid).
        from sed_tpu.models.cnn import (MobileNetV1,
                                        mobilenet_receptive_field)

        model = MobileNetV1(classes_num=cfg.classes_num, emit="logits",
                            dtype=jnp.bfloat16 if args.bf16
                            else jnp.float32)
        rf_halo = 8 * (-(-((mobilenet_receptive_field() + 1) // 2) // 8))
        if args.halo < rf_halo:
            log(f"halo {args.halo} < MobileNetV1 receptive-field requirement "
                f"{rf_halo}; using {rf_halo}")
            args.halo = rf_halo
    os.makedirs(args.outputs_dir, exist_ok=True)

    # File queue: (path, mono float32 waveform).  Reading up front keeps the
    # tick loop pure push/score — a live deployment would feed sockets here.
    queue = []
    for path in args.audio_files:
        wav = np.asarray(read_multichannel_audio(
            path, target_fs=cfg.working_sample_rate, cfg=cfg))[:, 0]
        queue.append({"path": path, "wav": wav.astype(np.float32), "pos": 0,
                      "scores": [], "join_tick": None})
    slots = args.slots or min(len(queue), 32)

    mesh = None
    if args.num_devices > 1:
        from sed_tpu.parallel.mesh import create_mesh

        if len(jax.devices()) < args.num_devices:
            raise SystemExit(
                f"--num_devices {args.num_devices} but only "
                f"{len(jax.devices())} devices are visible")
        slots = args.num_devices * (-(-slots // args.num_devices))
        mesh = create_mesh(args.num_devices)
    qparams = None
    if args.quantize == "int8":
        calib_wav = queue[0]["wav"]
        if args.arch == "M5":
            from sed_tpu.data.events import frame_coverage_labels
            from sed_tpu.models.quantize import quantize_m5

            frames, _ = frame_coverage_labels(calib_wav[None], [], [], cfg)
            if not len(frames):
                raise SystemExit(
                    f"first file is too short to calibrate int8 "
                    f"(needs >= {cfg.frame_size} samples)")
            qparams = quantize_m5(model, state.params, state.batch_stats,
                                  [np.transpose(frames, (0, 2, 1))])
        else:
            from sed_tpu.models.quantize import quantize_cnn, quantize_mobilenet
            from sed_tpu.ops.featurizer import logmel_features_batch

            feats = np.asarray(logmel_features_batch(
                jnp.asarray(calib_wav[None, :, None]), cfg))
            if mean is not None:
                feats = (feats - mean) / std
            quantizer = (quantize_mobilenet
                         if args.arch == "MobileNetV1" else quantize_cnn)
            qparams = quantizer(model, state.params, state.batch_stats,
                                [np.transpose(feats, (0, 2, 3, 1))])
        log("int8 serving mode: activation scales calibrated on "
            f"{queue[0]['path']}")
    if args.arch == "M5":
        from sed_tpu.waveform_streaming import (DeviceWaveformStreamPool,
                                                WaveformStreamPool)

        if mesh is not None:
            raise SystemExit("--num_devices applies to the spectrogram pool")
        ignored = [f for f, on in (
            ("--halo", args.halo != 64),
            ("--featurizer", args.featurizer != "auto"),
            ("--featurizer_precision", args.featurizer_precision != "parity"),
            ("--mean_std_file", bool(args.mean_std_file)),
        ) if on]
        if ignored:
            log(f"note: {', '.join(ignored)} have no effect on the M5 pool")
        if args.m5_pool == "device":
            # Default by hardware A/B (SERVE_SOCKET_BENCH_M5DEV.json):
            # device rings + raw sparse wire = 165.7x vs host 53.6x.
            pool = DeviceWaveformStreamPool(
                model, state.params, state.batch_stats, cfg, slots=slots,
                qparams=qparams)
        else:
            pool = WaveformStreamPool(model, state.params, state.batch_stats,
                                      cfg, slots=slots, qparams=qparams)
    else:
        from sed_tpu.stream_pool import StreamPool

        pool = StreamPool(model, state.params, state.batch_stats, cfg,
                          slots=slots, chunk_samples=chunk, halo=args.halo,
                          mean=mean, std=std, featurizer=args.featurizer,
                          featurizer_precision=args.featurizer_precision,
                          mesh=mesh, qparams=qparams)

    active = {}           # slot -> file record
    next_file = 0
    tick = 0
    t0 = time.time()
    pushed_samples = 0
    while next_file < len(queue) or active:
        # Admit files whose stagger time has arrived, while slots are free.
        while (next_file < len(queue)
               and len(active) < slots
               and tick >= next_file * args.stagger_ticks):
            rec = queue[next_file]
            slot = pool.join()
            rec["join_tick"] = tick
            active[slot] = rec
            log(f"tick {tick}: {os.path.basename(rec['path'])} joined "
                f"slot {slot}")
            next_file += 1
        if not active:  # staggered start gap with nothing live
            tick += 1
            continue

        leaving = []
        for slot, rec in active.items():
            take = min(len(rec["wav"]) - rec["pos"], chunk)
            pool.feed(slot, rec["wav"][rec["pos"]: rec["pos"] + take])
            rec["pos"] += take
            pushed_samples += take
            if rec["pos"] >= len(rec["wav"]):
                leaving.append(slot)
        # One batched device tick for every slot with a full chunk staged;
        # a file's final partial chunk is drained exactly by leave() — no
        # zero padding, no post-hoc score trimming.
        out = pool.tick()
        for slot, sc in out.items():
            if sc.shape[0]:
                active[slot]["scores"].append(sc)
        # Files finishing on the same tick drain together: ONE shared
        # featurize + stacked forward (StreamPool.leave_many) instead of
        # per-slot dispatches.  Too-short clips come back as empty blocks
        # (same reflect-padding constraint as offline); surface them
        # without aborting the other streams.
        tails = pool.leave_many(leaving) if leaving else {}
        for slot in leaving:
            rec = active.pop(slot)
            tail = tails[slot]
            if isinstance(tail, Exception):
                raise tail
            if (tail.shape[0] == 0
                    and len(rec["wav"]) <= getattr(cfg, "nfft", 0) // 2):
                log(f"tick {tick}: {os.path.basename(rec['path'])} too "
                    f"short to featurize; emitting empty scores")
            if tail.shape[0]:
                rec["scores"].append(tail)
            _finalize(rec, cfg, args)
            log(f"tick {tick}: {os.path.basename(rec['path'])} left "
                f"slot {slot}")
        tick += 1

    wall = time.time() - t0
    audio_s = pushed_samples / cfg.working_sample_rate
    print(json.dumps({
        "files": len(queue),
        "ticks": tick,
        "audio_seconds": round(audio_s, 1),
        "wall_seconds": round(wall, 2),
        "realtime_factor": round(audio_s / wall, 1) if wall > 0 else None,
    }))


def _finalize(rec, cfg, args) -> None:
    scores = (np.concatenate(rec["scores"], axis=0) if rec["scores"]
              else np.zeros((0, cfg.classes_num), np.float32))
    # feed()/leave() score exactly the real audio (the final partial chunk
    # drains through the host flush), so the frame count already equals the
    # offline pipeline's (model-stride-truncated) count — no trimming needed.
    base = os.path.splitext(os.path.basename(rec["path"]))[0]
    np.save(os.path.join(args.outputs_dir, f"{base}_scores.npy"), scores)
    if args.event_threshold is not None:
        from sed_tpu.utils.events_post import events_to_csv, extract_events

        evs = extract_events(scores, cfg.frames_per_second,
                             threshold=args.event_threshold,
                             min_duration=args.event_min_duration,
                             merge_gap=args.event_merge_gap)
        events_to_csv(evs, cfg.tau_sed_labels,
                      os.path.join(args.outputs_dir, f"{base}_events.csv"))
    rec["scores"] = None  # release


if __name__ == "__main__":
    main()
