"""Inference CLI: featurize + per-frame event scores for audio files.

A working version of the reference's broken infer.py (reference infer.py:1-37
ships dead imports, a missing ``plot_debug_image`` and a model config that
cannot load training checkpoints — SURVEY.md §2 C25).  This one:

  * loads a training checkpoint (same Cnn_AvgPooling config as the training
    CLI, fixing the reference's default-config mismatch);
  * featurizes on the accelerator with the fused log-mel pipeline;
  * runs batched sliding-window inference — many files at once ride the batch
    axis (shardable across a TPU mesh), and a single very long recording is
    split over the time axis with exact halo handling;
  * writes a PNG per input plus per-frame scores (.npy + .csv).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Sound-event-detection inference")
    parser.add_argument("audio_files", type=str, nargs="+")
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--outputs_dir", type=str, default="inference_outputs")
    parser.add_argument("--mean_std_file", type=str, default="",
                        help="optional normalization stats from preprocessing; "
                             "raw log-mel features are used when absent")
    parser.add_argument("--device", default="tpu", type=str)
    parser.add_argument("--window", type=int, default=1024,
                        help="time-axis window (frames) for very long recordings")
    parser.add_argument("--halo", type=int, default=64)
    parser.add_argument("--no_plot", action="store_true", default=False)
    parser.add_argument("--featurizer_precision", type=str, default="parity",
                        choices=["parity", "fast", "turbo"],
                        help="FFT precision tier: parity = golden-tested "
                             "(default); fast/turbo = reduced-precision "
                             "serving (benchmarks/FAST_FEATURIZER.json)")
    parser.add_argument("--quantize", choices=["int8"], default=None,
                        help="serve with int8 post-training quantization "
                             "(models/quantize.py); calibrated per file on "
                             "its own features — lossy fast mode, not the "
                             "parity path")
    parser.add_argument("--batch", action="store_true", default=False,
                        help="score files as batches grouped by length "
                             "(fastest for many equal-length clips)")
    parser.add_argument("--num_devices", type=int, default=1,
                        help="shard --batch inference over a data-parallel "
                             "mesh of this many devices")
    parser.add_argument("--event_threshold", type=float, default=None,
                        help="also extract event intervals (frames with "
                             "score >= threshold) to <name>_events.csv")
    parser.add_argument("--event_min_duration", type=float, default=0.0,
                        help="drop events shorter than this many seconds")
    parser.add_argument("--event_merge_gap", type=float, default=0.0,
                        help="merge events separated by less than this many "
                             "seconds")
    parser.add_argument("--tau_labels", type=str, default="doorslam",
                        help="comma-separated event classes — must match the "
                             "checkpoint's training config (--tau_labels on "
                             "the training CLI)")
    parser.add_argument("--arch", type=str, default="CnnAvgPooling",
                        choices=["CnnAvgPooling", "MobileNetV1", "M5"],
                        help="model family the checkpoint was trained with "
                             "(M5 = waveform path: one score per hop-strided "
                             "31680-sample frame)")
    parser.add_argument("--bf16", action="store_true", default=False,
                        help="compute the model forward in bfloat16 (params "
                             "stay f32) — a lossy serving tier: measured "
                             "1.66x for M5 at <=6.4e-3 sigmoid deviation "
                             "(benchmarks/M5_BENCH.json bf16_tier); not the "
                             "parity path")
    return parser


def load_model_and_state(ckpt_path: str, cfg, batch_hint: int = 1,
                         arch: str = "CnnAvgPooling", bf16: bool = False):
    import jax
    import jax.numpy as jnp

    from sed_tpu.train.checkpoint import load_checkpoint
    from sed_tpu.train.optim import make_optimizer
    from sed_tpu.train.state import init_state

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    if arch == "CnnAvgPooling":
        from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL

        model = CnnAvgPooling(classes_num=cfg.classes_num,
                              model_config=TRAIN_CHANNEL_AND_POOL,
                              dtype=dtype)
        sample = jnp.zeros((batch_hint, cfg.train_crop_size, cfg.mel_bins, 1))
    elif arch == "MobileNetV1":
        from sed_tpu.models.cnn import MobileNetV1

        model = MobileNetV1(classes_num=cfg.classes_num, dtype=dtype)
        sample = jnp.zeros((batch_hint, cfg.train_crop_size, cfg.mel_bins, 1))
    elif arch == "M5":
        from sed_tpu.models.m5 import M5

        model = M5(classes_num=cfg.classes_num, dtype=dtype)
        sample = jnp.zeros((batch_hint, cfg.frame_size, 1))
    else:
        raise ValueError(f"unknown arch {arch!r}")
    tx = make_optimizer(1e-6)
    template = init_state(model, jax.random.key(0), sample, tx)
    state = load_checkpoint(ckpt_path, template, model_only=True)
    return model, state


def predict_file(model, state, audio_path: str, cfg, mean=None, std=None,
                 window: int = 1024, halo: int = 64, quantize: str = None,
                 featurizer_precision=None):
    """Featurize one file and score every frame.

    Returns (log_mel (channels, frames, mel), scores (frames', classes)).
    ``quantize='int8'`` scores with the PTQ path (models/quantize.py),
    calibrated on this file's own features.  ``featurizer_precision``:
    None/'parity' = golden-tested featurizer; 'fast'/'turbo' = opt-in
    reduced-precision FFT tiers (benchmarks/FAST_FEATURIZER.json).
    """
    import jax
    import jax.numpy as jnp

    from sed_tpu.io.audio import read_multichannel_audio
    from sed_tpu.ops.featurizer import logmel_features, resolve_featurizer_precision
    from sed_tpu.parallel.time_shard import receptive_field, windowed_forward

    prec = resolve_featurizer_precision(featurizer_precision)

    if hasattr(model, "model_config"):
        rf = receptive_field(model.model_config)
    elif type(model).__name__ == "MobileNetV1":
        from sed_tpu.models.cnn import mobilenet_receptive_field

        rf = mobilenet_receptive_field()
    else:
        rf = None
    if rf is not None:
        min_halo = 8 * (-(-(rf // 2 + 1) // 8))  # ceil(rf/2) to the time stride
        if halo < min_halo:
            print(f"halo {halo} < receptive field requirement {min_halo}; using {min_halo}")
            halo = min_halo

    waveform = read_multichannel_audio(audio_path, target_fs=cfg.working_sample_rate, cfg=cfg)
    log_mel = np.asarray(logmel_features(waveform.astype(np.float32), cfg,
                                         "auto", "auto", prec))
    feats = log_mel if mean is None else (log_mel - mean) / std

    x = jnp.transpose(jnp.asarray(feats), (1, 2, 0))[None]  # (1, frames, mel, channels)

    # MobileNetV1 emits sigmoid confidences IN the forward (reference
    # spectogram_models.py:117); CnnAvgPooling emits logits.
    emits_scores = type(model).__name__ == "MobileNetV1"
    if quantize == "int8":
        # Calibrate over the WHOLE file (strided subsample spanning its
        # length), not a prefix: a prefix-only absmax clips loud events that
        # occur later in a long recording — the same clipping class the M5
        # 'loud transient' regression test guards against (test_quantize.py).
        calib = np.asarray(x[:, :: max(1, x.shape[1] // 2048)])
        if emits_scores:
            from sed_tpu.models.quantize import (quantize_mobilenet,
                                                 quantized_mobilenet_forward)

            q = quantize_mobilenet(model, state.params, state.batch_stats,
                                   [calib])

            def forward(batch):
                return quantized_mobilenet_forward(q, batch)
        else:
            from sed_tpu.models.quantize import (quantize_cnn,
                                                 quantized_cnn_forward)

            q = quantize_cnn(model, state.params, state.batch_stats, [calib])

            def forward(batch):
                return quantized_cnn_forward(q, batch)
    else:
        def forward(batch):
            return model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch, train=False
            )

    out = windowed_forward(forward, x, window=window, halo=halo)
    if emits_scores:
        scores = np.asarray(out)[0]
    else:
        scores = np.asarray(jax.nn.sigmoid(jnp.asarray(out)))[0]
    return log_mel, scores


def predict_file_m5(model, state, audio_path: str, cfg,
                    quantize: str = None, frame_bucket: int = 32):
    """Waveform-path inference: hop-strided frames (the offline validation
    split, data/events.py frame_coverage_labels) scored independently by M5
    — one sigmoid confidence per frame.  Returns (frames, classes) scores."""
    import jax
    import jax.numpy as jnp

    from sed_tpu.data.events import frame_coverage_labels
    from sed_tpu.io.audio import read_multichannel_audio

    wav = np.asarray(read_multichannel_audio(
        audio_path, target_fs=cfg.working_sample_rate, cfg=cfg))
    frames, _ = frame_coverage_labels(wav.T.astype(np.float32), [], [], cfg)
    if not len(frames):
        return np.zeros((0, cfg.classes_num), np.float32)
    x = np.transpose(frames, (0, 2, 1))  # (n, frame_size, channels)

    if quantize == "int8":
        from sed_tpu.models.quantize import quantize_m5, quantized_m5_forward

        q = quantize_m5(model, state.params, state.batch_stats,
                        [x[:: max(1, len(x) // 256)]])

        def forward(batch):
            return quantized_m5_forward(q, batch)
    else:
        def forward(batch):
            return model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch, train=False)

    score = jax.jit(lambda b: jax.nn.sigmoid(forward(b)))
    n = len(x)
    padded = frame_bucket * (-(-n // frame_bucket))
    if padded != n:  # bucket the batch axis: frames are independent
        x = np.concatenate(
            [x, np.zeros((padded - n,) + x.shape[1:], np.float32)])
    outs = [np.asarray(score(jnp.asarray(x[i:i + frame_bucket])))
            for i in range(0, padded, frame_bucket)]
    return np.concatenate(outs, axis=0)[:n]


def main(argv=None):
    parser = build_arg_parser()
    args = parser.parse_args(argv)
    if args.num_devices > 1 and not args.batch:
        parser.error("--num_devices shards the batched path; add --batch")

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from sed_tpu.configs import SpectrogramConfig, WaveformConfig
    from sed_tpu.utils.plotting import plot_sample_features

    labels = tuple(args.tau_labels.split(","))
    if args.arch == "M5":
        cfg = WaveformConfig(tau_sed_labels=labels)
        if args.batch:
            parser.error("--batch applies to the spectrogram archs; the M5 "
                         "path already scores all frames of a file batched")
        ignored = [f for f, on in (
            ("--mean_std_file", bool(args.mean_std_file)),
            ("--featurizer_precision", args.featurizer_precision != "parity"),
            ("--window", args.window != 1024),
            ("--halo", args.halo != 64),
        ) if on]
        if ignored:
            print(f"note: {', '.join(ignored)} have no effect on the M5 "
                  f"waveform path (no featurizer, frames scored whole)")
    else:
        cfg = SpectrogramConfig(tau_sed_labels=labels)

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
    os.makedirs(args.outputs_dir, exist_ok=True)

    batch_scores = None
    if args.batch:
        if args.quantize:
            print("--quantize applies to the per-file windowed path; "
                  "--batch uses the float forward")
        from sed_tpu.inference import batch_predict_files

        mesh = None
        if args.num_devices > 1:
            from sed_tpu.parallel.mesh import create_mesh

            if len(jax.devices()) < args.num_devices:
                raise SystemExit(
                    f"--num_devices {args.num_devices} but only "
                    f"{len(jax.devices())} devices are visible")
            mesh = create_mesh(args.num_devices)
        batch_scores = batch_predict_files(
            model, state, args.audio_files, cfg, mesh=mesh, mean=mean,
            std=std, featurizer_precision=args.featurizer_precision)

    for audio_file in args.audio_files:
        print(f"Processing {audio_file}")
        if batch_scores is not None:
            scores = batch_scores[audio_file]
            log_mel = None
            if not args.no_plot:  # features re-derived only when a plot needs them
                from sed_tpu.io.audio import read_multichannel_audio
                from sed_tpu.ops.featurizer import logmel_features

                wav = read_multichannel_audio(
                    audio_file, target_fs=cfg.working_sample_rate, cfg=cfg
                )
                log_mel = np.asarray(logmel_features(wav.astype(np.float32), cfg))
        elif args.arch == "M5":
            log_mel = None
            scores = predict_file_m5(model, state, audio_file, cfg,
                                     quantize=args.quantize)
        else:
            log_mel, scores = predict_file(
                model, state, audio_file, cfg, mean, std,
                window=args.window, halo=args.halo, quantize=args.quantize,
                featurizer_precision=args.featurizer_precision,
            )
        base = os.path.splitext(os.path.basename(audio_file))[0]
        np.save(os.path.join(args.outputs_dir, f"{base}_scores.npy"), scores)
        with open(os.path.join(args.outputs_dir, f"{base}_scores.csv"), "w") as f:
            # time_sec uses the reference's integer frames_per_second
            # (fs//hop = 3; common_config.py:7) for BOTH archs — the same
            # grid training rasterization and metrics use.  The true
            # hop-spaced rate is fs/hop = 3.0303...; exact frame start
            # times are i*hop/fs (~1% earlier at long horizons).
            f.write("frame,time_sec," + ",".join(cfg.tau_sed_labels) + "\n")
            for i, row in enumerate(scores):
                vals = ",".join(f"{v:.6f}" for v in row)
                f.write(f"{i},{i / cfg.frames_per_second:.3f},{vals}\n")
        if args.event_threshold is not None:
            from sed_tpu.utils.events_post import events_to_csv, extract_events

            evs = extract_events(scores, cfg.frames_per_second,
                                 threshold=args.event_threshold,
                                 min_duration=args.event_min_duration,
                                 merge_gap=args.event_merge_gap)
            events_to_csv(evs, cfg.tau_sed_labels,
                          os.path.join(args.outputs_dir, f"{base}_events.csv"))
            print(f"  events (score >= {args.event_threshold}): "
                  f"{sum(len(e) for e in evs)}")
        if not args.no_plot and log_mel is not None:
            plot_sample_features(
                log_mel, mode="spectogram", output=scores,
                file_name=base,
                plot_path=os.path.join(args.outputs_dir, f"{base}.png"),
                cfg=cfg,
            )
        mx = float(scores.max()) if scores.size else float("nan")
        print(f"  frames={scores.shape[0]}, max score={mx:.3f}")


if __name__ == "__main__":
    main()
