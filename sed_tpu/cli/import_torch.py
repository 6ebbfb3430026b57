"""Checkpoint migration CLI: reference torch ``.pth`` -> sed_tpu checkpoint.

A user of the reference repo (train.py:123-128 checkpoints) switches
frameworks without retraining:

    python -m sed_tpu.cli.import_torch --pth runs/.../iteration_60000.pth \
        --out imported_run --arch CnnAvgPooling

writes ``imported_run/checkpoints/iteration_60000.ckpt`` loadable by the
infer/serve/stream CLIs (--ckpt).  Conversion mappings + measured fidelity:
sed_tpu/train/torch_import.py.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Import a reference torch checkpoint")
    p.add_argument("--pth", type=str, required=True,
                   help="reference checkpoint (.pth). TRUSTED files only: "
                        "torch.load unpickles, so loading executes code "
                        "from it")
    p.add_argument("--out", type=str, required=True,
                   help="output run directory (checkpoint written under "
                        "<out>/checkpoints/)")
    p.add_argument("--arch", type=str, default="CnnAvgPooling",
                   choices=["CnnAvgPooling", "MobileNetV1", "M5"])
    p.add_argument("--tau_labels", type=str, default="doorslam",
                   help="comma-separated event classes — must match the "
                        "torch training run's class list")
    p.add_argument("--device", default="cpu", type=str,
                   help="conversion is host-side; cpu (default) avoids a "
                        "TPU compile for a pure weight translation")
    return p


def main(argv=None):
    args = build_arg_parser().parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from sed_tpu.configs import SpectrogramConfig, WaveformConfig
    from sed_tpu.train.torch_import import import_torch_checkpoint

    labels = tuple(args.tau_labels.split(","))
    if args.arch == "M5":
        wcfg = WaveformConfig(tau_sed_labels=labels)
        from sed_tpu.models.m5 import M5

        model = M5(classes_num=wcfg.classes_num)
        sample = np.zeros((1, wcfg.frame_size, 1), np.float32)
    else:
        cfg = SpectrogramConfig(tau_sed_labels=labels)
        sample = np.zeros((1, cfg.train_crop_size, cfg.mel_bins, 1), np.float32)
        if args.arch == "CnnAvgPooling":
            from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL

            model = CnnAvgPooling(classes_num=cfg.classes_num,
                                  model_config=TRAIN_CHANNEL_AND_POOL)
        else:
            from sed_tpu.models.cnn import MobileNetV1

            model = MobileNetV1(classes_num=cfg.classes_num)

    path = import_torch_checkpoint(args.pth, model, sample, args.out)
    print(json.dumps({"ckpt": path, "arch": args.arch,
                      "classes": len(labels)}))
    return path


if __name__ == "__main__":
    main()
