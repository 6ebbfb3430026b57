"""Training CLI with the reference's flag surface (reference: main.py:85-141).

Differences from the reference, all deliberate:
  * ``--device`` selects a JAX platform (tpu/cpu) instead of cuda:0;
  * checkpoints are flax msgpack files; ``--ckpt`` restores model weights only,
    exactly like the reference resume (main.py:37-39);
  * ``--val_descriptor`` values that parse as floats split by fraction
    (the reference's argparse always delivered strings, silently forcing
    substring mode for any CLI-provided value — an acknowledged wart).
"""

from __future__ import annotations

import argparse
import os


def parse_val_descriptor(value):
    try:
        return float(value)
    except (TypeError, ValueError):
        return value


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="TPU-native sound event detection training")
    # Training data
    parser.add_argument("--dataset_dir", type=str, default="../data", help="Directory of dataset.")
    parser.add_argument("--dataset_name", type=str, default="FilmClap", help="FilmClap or TAU")
    parser.add_argument("--train_features", type=str, default="Waveform", help="Spectogram or Waveform")
    parser.add_argument("--model", type=str, default="CnnAvgPooling",
                        choices=["CnnAvgPooling", "MobileNetV1"],
                        help="spectrogram model family (the reference trains "
                             "only Cnn_AvgPooling, main.py:35-36 — MobileNetV1 "
                             "training is a sed_tpu capability: the head "
                             "emits logits so WeightedBCE applies correctly; "
                             "checkpoints load into infer --arch MobileNetV1)")
    # Spectrogram-only arguments
    parser.add_argument("--preprocess_mode", type=str, default="logMel",
                        help="logMel or Complex; relevant only for Spectogram features")
    parser.add_argument("--force_preprocess", action="store_true", default=False)
    parser.add_argument("--preprocess_workers", type=int, default=0,
                        help="decode/resample files N at a time on the native "
                             "C++ thread pool, pipelined ahead of the device "
                             "featurizer (0 = sequential; byte-identical "
                             "output for sources already at the working "
                             "rate — resampled sources use the native "
                             "Kaiser resampler, PARITY.md divergence #4)")
    # Train
    parser.add_argument("--outputs_root", type=str, default="training_dir")
    parser.add_argument("--ckpt", type=str, default="")
    parser.add_argument("--resume", type=str, default="none", choices=["none", "auto"],
                        help="auto: restore the latest FULL checkpoint (params, "
                             "optimizer state, step) from the run directory and "
                             "continue — preemption recovery. --ckpt stays "
                             "model-only like the reference resume (main.py:37-39)")
    parser.add_argument("--val_descriptor", default=0.2,
                        help="float for percentage, string for fold substring")
    parser.add_argument("--train_tag", type=str, default="")
    # Training tricks
    parser.add_argument("--augment_data", action="store_true", default=False)
    parser.add_argument("--balance_classes", action="store_true", default=False)
    parser.add_argument("--recall_priority", type=float, default=5,
                        help="priority factor for the bce loss")
    parser.add_argument("--tau_labels", type=str, default="doorslam",
                        help="comma-separated TAU event classes (the reference "
                             "hardcodes this list in dataset/common_config.py)")
    # Hyper parameters
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=0.000001)
    parser.add_argument("--num_train_steps", type=int, default=100000)
    parser.add_argument("--log_freq", type=int, default=5000)
    # Infrastructure
    parser.add_argument("--device", default="tpu", type=str, help="tpu or cpu")
    parser.add_argument("--num_devices", type=int, default=1,
                        help=">1 trains data-parallel over a ('data',) mesh of "
                             "that many local devices; batch_size is global")
    parser.add_argument("--steps_per_call", type=int, default=1,
                        help="fuse K train steps per device dispatch "
                             "(lax.scan) — amortizes host dispatch latency on "
                             "real TPU hosts (sub-ms dispatch turns the "
                             "0.87 ms step into back-to-back device "
                             "execution; through this harness's ~30 ms relay "
                             "it is a no-op, see ROADMAP.md).  num_train_steps "
                             "and log_freq must be multiples of K; composes "
                             "with --num_devices")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--bf16", action="store_true", default=False,
                        help="Compute the model in bfloat16 (params stay f32; "
                             "~MXU 2x fast mode, opt-in).")
    parser.add_argument("--debug_nans", action="store_true", default=False,
                        help="enable jax NaN checking (aux debugging, SURVEY §5)")
    parser.add_argument("--profile_dir", type=str, default="",
                        help="capture a jax.profiler trace of steps 10-20")
    return parser


def get_spectrogram_dataset_and_model(args):
    from sed_tpu.configs import SpectrogramConfig
    from sed_tpu.data.spectrogram_dataset import (
        SpectrogramDataset,
        preprocess_film_clap_data,
        preprocess_tau_sed_data,
    )
    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL

    cfg = SpectrogramConfig(tau_sed_labels=tuple(args.tau_labels.split(",")))
    if args.dataset_name.lower() == "tau":
        features_dir, mean_std_file = preprocess_tau_sed_data(
            args.dataset_dir, fold_name="eval", preprocess_mode=args.preprocess_mode,
            force_preprocess=args.force_preprocess, cfg=cfg,
            workers=args.preprocess_workers,
        )
    elif args.dataset_name.lower() == "filmclap":
        features_dir, mean_std_file = preprocess_film_clap_data(
            args.dataset_dir, preprocessed_mode=args.preprocess_mode,
            force_preprocess=args.force_preprocess, cfg=cfg,
            workers=args.preprocess_workers,
        )
    else:
        raise ValueError(
            f"Only tau and filmclap datasets are supported, '{args.dataset_name}' given"
        )

    dataset = SpectrogramDataset(
        features_dir, mean_std_file,
        augment_data=args.augment_data,
        balance_classes=args.balance_classes,
        val_descriptor=parse_val_descriptor(args.val_descriptor),
        preprocessed_mode=args.preprocess_mode,
        cfg=cfg,
        seed=args.seed,
    )
    # Model config from the reference training CLI (main.py:35).
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32
    arch = getattr(args, "model", "CnnAvgPooling")
    if arch == "MobileNetV1":
        if getattr(args, "bf16", False):
            raise ValueError("--bf16 is implemented for CnnAvgPooling only")
        from sed_tpu.models.cnn import MobileNetV1

        model = MobileNetV1(classes_num=cfg.classes_num, emit="logits")
        descriptor = f"MobileNetV1-{args.preprocess_mode}-{cfg.cfg_descriptor}"
    else:
        model = CnnAvgPooling(classes_num=cfg.classes_num,
                              model_config=TRAIN_CHANNEL_AND_POOL, dtype=dtype)
        descriptor = f"{args.preprocess_mode}-{cfg.cfg_descriptor}"
    return dataset, model, cfg, descriptor, "spectogram"


def get_waveform_dataset_and_model(args):
    from sed_tpu.configs import WaveformConfig
    from sed_tpu.data.waveform_dataset import WaveformDataset
    from sed_tpu.io.film_clap import get_film_clap_paths_and_labels
    from sed_tpu.io.tau import ensure_tau_data, get_tau_sed_paths_and_labels
    from sed_tpu.models.m5 import M5

    cfg = WaveformConfig(tau_sed_labels=tuple(args.tau_labels.split(",")))
    if args.dataset_name.lower() == "tau":
        audio_dir, meta_data_dir = ensure_tau_data(
            f"{args.dataset_dir}/Tau_sound_events_2019", fold_name="eval"
        )
        items = get_tau_sed_paths_and_labels(audio_dir, meta_data_dir, cfg)
    elif args.dataset_name.lower() == "filmclap":
        items = get_film_clap_paths_and_labels(
            os.path.join(args.dataset_dir, "FilmClap"), cfg.time_margin
        )
    else:
        raise ValueError(
            f"Only tau and filmclap datasets are supported, '{args.dataset_name}' given"
        )

    dataset = WaveformDataset(
        items,
        augment_data=args.augment_data,
        balance_classes=args.balance_classes,
        val_descriptor=parse_val_descriptor(args.val_descriptor),
        cfg=cfg,
        seed=args.seed,
        workers=args.preprocess_workers,
    )
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32
    # The reference hardcodes M5(1) (main.py:69) because classes_num is pinned
    # to 1; with a real multi-class label list the head must match.
    model = M5(cfg.classes_num, dtype=dtype)
    return dataset, model, cfg, cfg.cfg_descriptor, "waveform"


def main(argv=None):
    args = build_arg_parser().parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    if args.train_features.lower() == "spectogram":
        dataset, model, cfg, descriptor, mode = get_spectrogram_dataset_and_model(args)
    elif args.train_features.lower() == "waveform":
        if getattr(args, "model", "CnnAvgPooling") != "CnnAvgPooling":
            raise ValueError("--model selects the spectrogram family; "
                             "waveform training uses M5")
        dataset, model, cfg, descriptor, mode = get_waveform_dataset_and_model(args)
    else:
        raise ValueError(
            f"training features can be raw waveform or spectogram only, "
            f"'{args.train_features}' given"
        )

    train_name = f"{args.dataset_name}_cfg({descriptor}_b{args.batch_size}_lr{args.lr}_{args.train_tag}"
    if args.balance_classes:
        train_name += "_BC"
    if args.augment_data:
        train_name += "_AD"
    outputs_dir = os.path.join(args.outputs_root, train_name)

    initial_state = None
    resume_path = None
    model_only = True
    if args.resume == "auto":
        from sed_tpu.train.checkpoint import latest_checkpoint

        resume_path = latest_checkpoint(outputs_dir)
        model_only = False
        if resume_path:
            print(f"Auto-resuming from {resume_path}")
    if resume_path is None and args.ckpt:
        resume_path = args.ckpt
        model_only = True

    if resume_path:
        import jax.numpy as jnp

        from sed_tpu.train.checkpoint import load_checkpoint
        from sed_tpu.train.optim import make_optimizer
        from sed_tpu.train.state import init_state

        tx = make_optimizer(args.lr)
        if mode == "spectogram":
            sample = jnp.zeros((args.batch_size, cfg.train_crop_size, cfg.mel_bins, 1))
        else:
            sample = jnp.zeros((args.batch_size, cfg.frame_size, cfg.audio_channels))
        template = init_state(model, jax.random.key(args.seed), sample, tx)
        initial_state = load_checkpoint(resume_path, template, model_only=model_only)

    mesh = None
    if args.num_devices > 1:
        from sed_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(args.num_devices)

    from sed_tpu.train.loop import train

    train(
        model, dataset, mode,
        num_steps=args.num_train_steps,
        lr=args.lr,
        log_freq=args.log_freq,
        outputs_dir=outputs_dir,
        batch_size=args.batch_size,
        pos_weight=args.recall_priority,
        augment=args.augment_data,
        preprocessed_mode=args.preprocess_mode,
        cfg=cfg,
        seed=args.seed,
        initial_state=initial_state,
        profile_dir=args.profile_dir or None,
        mesh=mesh,
        steps_per_call=args.steps_per_call,
    )


if __name__ == "__main__":
    main()
