"""Live streaming server CLI: PCM over TCP in, per-frame scores out.

    python -m sed_tpu.cli.serve_socket --ckpt <ckpt> --port 8123 \
        [--slots 8] [--chunk_seconds 1.0] [--quantize int8 --calib_wav a.wav]

Each TCP connection is one live stream over the lifecycle pool
(sed_tpu/stream_pool.py): clients write length-prefixed int16 PCM at their
own rate, batched device ticks score every stream with a full chunk staged,
and closing the stream drains the exact tail (wire protocol:
sed_tpu/serve_socket.py).  The reference serves nothing (its infer.py reads
files offline); this is the live-deployment surface on top of the same
golden-tested pipeline.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Live PCM streaming scorer")
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=0,
                   help="0 = pick a free port (printed on stdout)")
    p.add_argument("--slots", type=int, default=8,
                   help="max concurrent streams (pool slots)")
    p.add_argument("--chunk_seconds", type=float, default=1.0)
    p.add_argument("--tick_interval", type=float, default=0.05,
                   help="seconds between batched device ticks")
    p.add_argument("--wire", type=str, default="pcm16",
                   choices=["pcm16", "mulaw"],
                   help="client audio encoding: int16 PCM (default) or "
                        "1-byte/sample µ-law — half the network bytes per "
                        "client at ~38 dB codec SQNR (lossy serving tier, "
                        "ops/mulaw.py); clients must send the same encoding")
    p.add_argument("--halo", type=int, default=64)
    p.add_argument("--featurizer", type=str, default="auto")
    p.add_argument("--featurizer_precision", type=str, default="parity",
                   choices=["parity", "fast", "turbo"])
    p.add_argument("--quantize", choices=["int8"], default=None,
                   help="score with the int8 PTQ forward (lossy serving "
                        "mode, models/quantize.py); requires --calib_wav")
    p.add_argument("--calib_wav", type=str, default="",
                   help="wav file whose features calibrate the int8 "
                        "activation scales (no input files exist at server "
                        "start, so calibration audio must be supplied)")
    p.add_argument("--arch", type=str, default="CnnAvgPooling",
                   choices=["CnnAvgPooling", "MobileNetV1", "M5"],
                   help="model family: the spectrogram families "
                        "(CnnAvgPooling, MobileNetV1) stream over the "
                        "HBM-ring pool (MobileNetV1 float-only); M5 streams "
                        "hop-strided waveform frames (scored the moment "
                        "each completes)")
    p.add_argument("--m5_pool", choices=["device", "host"], default="device",
                   help="M5 serving pool: 'device' (default — HBM sample "
                        "rings + raw wire; 165.7x vs the host pool's 53.6x "
                        "aggregate real-time, hardware A/B in "
                        "SERVE_SOCKET_BENCH_M5DEV.json; scores emit per "
                        "1 s chunk) or 'host' (rolling host buffers; "
                        "lowest latency — a frame scores on the tick after "
                        "its last sample arrives)")
    p.add_argument("--bf16", action="store_true", default=False,
                   help="bfloat16 model forward (params stay f32) — lossy "
                        "serving tier, measured 1.66x for M5 at <=6.4e-3 "
                        "sigmoid deviation (benchmarks/M5_BENCH.json); "
                        "CnnAvgPooling/M5 only")
    p.add_argument("--no_warmup", action="store_true", default=False,
                   help="skip the pre-serve program warmup (the first "
                        "clients then pay each program's first compile)")
    p.add_argument("--max_frame_bytes", type=int, default=64 << 20,
                   help="reject client frames with a length prefix beyond "
                        "this (garbage/hostile header containment)")
    p.add_argument("--idle_timeout", type=float, default=0.0,
                   help="per-connection socket timeout in seconds; a "
                        "client stalled mid-frame loses its slot after "
                        "this (0 = wait forever, the trusted-client "
                        "default)")
    p.add_argument("--drain_gather", type=float, default=0.25,
                   help="seconds a finishing stream waits for other "
                        "finishers so concurrent drains share one batched "
                        "leave dispatch")
    p.add_argument("--mean_std_file", type=str, default="")
    p.add_argument("--device", default="tpu", type=str)
    p.add_argument("--tau_labels", type=str, default="doorslam")
    p.add_argument("--run_seconds", type=float, default=0.0,
                   help="serve for N seconds then exit (0 = forever); used "
                        "by tests and smoke runs")
    return p


def main(argv=None):
    args = build_arg_parser().parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from sed_tpu.cli.infer import load_model_and_state
    from sed_tpu.configs import SpectrogramConfig, WaveformConfig
    from sed_tpu.serve_socket import StreamServer

    labels = tuple(args.tau_labels.split(","))
    cfg = (WaveformConfig(tau_sed_labels=labels) if args.arch == "M5"
           else SpectrogramConfig(tau_sed_labels=labels))
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
        if args.quantize == "int8":
            raise SystemExit("--quantize int8 streaming is implemented for "
                             "CnnAvgPooling and M5; MobileNetV1 int8 serving "
                             "is the batched path (infer/serve --quantize)")
        # The streaming stack applies the serving sigmoid itself — use the
        # logits-emitting view of the same params (models/cnn.py).
        from sed_tpu.models.cnn import (MobileNetV1,
                                        mobilenet_receptive_field)

        model = MobileNetV1(classes_num=cfg.classes_num, emit="logits")
        rf_halo = 8 * (-(-((mobilenet_receptive_field() + 1) // 2) // 8))
        if args.halo < rf_halo:
            print(f"halo {args.halo} < MobileNetV1 receptive-field "
                  f"requirement {rf_halo}; using {rf_halo}", file=sys.stderr)
            args.halo = rf_halo
    qparams = None
    if args.quantize == "int8":
        if not args.calib_wav:
            raise SystemExit("--quantize int8 requires --calib_wav")
        import jax.numpy as jnp

        from sed_tpu.io.audio import read_multichannel_audio

        wav = np.asarray(read_multichannel_audio(
            args.calib_wav, target_fs=cfg.working_sample_rate, cfg=cfg))[:, 0]
        if args.arch == "M5":
            from sed_tpu.data.events import frame_coverage_labels
            from sed_tpu.models.quantize import quantize_m5

            frames, _ = frame_coverage_labels(
                wav[None].astype(np.float32), [], [], cfg)
            if not len(frames):
                raise SystemExit(
                    f"--calib_wav is too short to yield a single "
                    f"{cfg.frame_size}-sample frame "
                    f"({cfg.frame_size / cfg.working_sample_rate:.2f}s at "
                    f"{cfg.working_sample_rate} Hz); supply a longer wav")
            qparams = quantize_m5(model, state.params, state.batch_stats,
                                  [np.transpose(frames, (0, 2, 1))])
        else:
            from sed_tpu.models.quantize import quantize_cnn
            from sed_tpu.ops.featurizer import logmel_features_batch

            feats = np.asarray(logmel_features_batch(
                jnp.asarray(wav[None, :, None]), cfg))
            if mean is not None:
                feats = (feats - mean) / std
            qparams = quantize_cnn(model, state.params, state.batch_stats,
                                   [np.transpose(feats, (0, 2, 3, 1))])
        print(f"int8 serving mode: calibrated on {args.calib_wav}",
              file=sys.stderr)
    if args.arch == "M5":
        from sed_tpu.waveform_streaming import (DeviceWaveformStreamPool,
                                                WaveformStreamPool)

        ignored = [f for f, on in (
            ("--chunk_seconds", args.chunk_seconds != 1.0),
            ("--halo", args.halo != 64),
            ("--featurizer", args.featurizer != "auto"),
            ("--featurizer_precision", args.featurizer_precision != "parity"),
            ("--mean_std_file", bool(args.mean_std_file)),
        ) if on]
        if ignored:
            print(f"note: {', '.join(ignored)} have no effect on the M5 "
                  f"pool (frames finalize per hop, no featurizer)",
                  file=sys.stderr)
        if args.m5_pool == "device":
            # Default by hardware A/B: 165.7x vs the host pool's 53.6x
            # aggregate real-time on the same 16x60 s run (device rings +
            # raw sparse wire vs host-extracted f32 frames at 8x the
            # bytes; SERVE_SOCKET_BENCH_M5DEV.json).
            pool = DeviceWaveformStreamPool(
                model, state.params, state.batch_stats, cfg,
                slots=args.slots, qparams=qparams)
            chunk = pool.chunk
        else:
            pool = WaveformStreamPool(model, state.params, state.batch_stats,
                                      cfg, slots=args.slots, qparams=qparams)
            chunk = cfg.frame_size  # informational: frames finalize per hop
    else:
        from sed_tpu.stream_pool import StreamPool

        pool = StreamPool(
            model, state.params, state.batch_stats, cfg, slots=args.slots,
            chunk_samples=int(round(
                args.chunk_seconds * cfg.working_sample_rate)),
            halo=args.halo, mean=mean, std=std, featurizer=args.featurizer,
            featurizer_precision=args.featurizer_precision, qparams=qparams)
        chunk = pool.chunk
    import jax

    if not args.no_warmup and jax.default_backend() != "cpu":
        # Compile every tick/drain program BEFORE accepting connections:
        # the single-round tick, the scanned sparse-wire buckets (1, 4,
        # and all-slots-active full blocks), and the batched-drain
        # programs.  Without this the first clients' traffic pays each
        # first compile (minutes per program on relay-attached hosts;
        # seconds direct-attached).  Mirrors bench_serve_socket.py's
        # warmup ladder.
        t_w = time.time()
        rng_w = np.random.default_rng(0)
        base = (3000 * rng_w.standard_normal(chunk)).astype(np.int16)
        if args.wire == "mulaw":
            from sed_tpu.ops.mulaw import mulaw_encode

            warm_piece = mulaw_encode(base)
        else:
            warm_piece = base
        ws0 = pool.join()
        for _ in range(4):
            pool.feed(ws0, warm_piece)
            pool.tick()
        if hasattr(pool, "ROUNDS_PER_CALL"):
            K = pool.ROUNDS_PER_CALL
            others = [pool.join() for _ in range(args.slots - 1)]
            slots_all = [ws0] + others
            for _ in range(2):
                for s in slots_all:
                    pool.feed(s, warm_piece)
                pool.tick()
            for n_active in (1, 4, len(slots_all)):
                for s in slots_all[:n_active]:
                    pool.feed(s, np.tile(warm_piece, K + 1))
                pool.tick()
            pool.leave_many(slots_all)
        else:
            pool.leave(ws0)
        print(f"warmup: {time.time() - t_w:.1f}s (all serving programs "
              f"compiled)", file=sys.stderr, flush=True)
    server = StreamServer(pool, host=args.host, port=args.port,
                          tick_interval=args.tick_interval, wire=args.wire,
                          max_frame_bytes=args.max_frame_bytes,
                          idle_timeout=args.idle_timeout or None,
                          drain_gather=args.drain_gather)
    server.start()
    print(json.dumps({"host": server.address[0], "port": server.address[1],
                      "slots": args.slots, "arch": args.arch,
                      "chunk_samples": chunk, "wire": args.wire}), flush=True)
    try:
        if args.run_seconds > 0:
            time.sleep(args.run_seconds)
        else:
            while True:
                time.sleep(3600)
    except KeyboardInterrupt:
        print("shutting down", file=sys.stderr)
    finally:
        server.stop()


if __name__ == "__main__":
    main()
