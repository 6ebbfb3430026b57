"""Checkpoint migration CLI: sed_tpu checkpoint -> reference torch ``.pth``.

The reverse of :mod:`sed_tpu.cli.import_torch` — a model trained here loads
straight into the reference repo (its main.py:37-39 ``--ckpt`` resume /
infer.py checkpoint slot):

    python -m sed_tpu.cli.export_torch --ckpt runs/.../iteration_60000.ckpt \
        --arch CnnAvgPooling --out iteration_60000.pth

Conversion key maps (exact inverses of the measured import maps):
sed_tpu/train/torch_export.py.
"""

from __future__ import annotations

import argparse
import json


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Export a sed_tpu checkpoint to the reference .pth format")
    p.add_argument("--ckpt", type=str, required=True,
                   help="sed_tpu checkpoint (.ckpt msgpack or .ckpt.orbax)")
    p.add_argument("--out", type=str, required=True,
                   help="output .pth path (reference container: "
                        "{'iterations', 'model', 'optimizer'})")
    p.add_argument("--arch", type=str, default="CnnAvgPooling",
                   choices=["CnnAvgPooling", "MobileNetV1", "M5"])
    p.add_argument("--tau_labels", type=str, default="doorslam",
                   help="comma-separated event classes — must match the "
                        "sed_tpu training run's class list")
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
    from sed_tpu.train.torch_export import export_torch_checkpoint

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

    path = export_torch_checkpoint(args.ckpt, model, sample, args.out)
    print(json.dumps({"pth": path, "arch": args.arch,
                      "classes": len(labels)}))
    return path


if __name__ == "__main__":
    main()
