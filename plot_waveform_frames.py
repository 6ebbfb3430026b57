"""Debug script: plot event-positive waveform training crops.

Reference: the ``__main__`` block of dataset/waveform/waveform_dataset.py
(:160-189) — renders the first N positive frames of a WaveformDataset.
"""

import argparse
import os

import numpy as np
import matplotlib

matplotlib.use("Agg")
from matplotlib import pyplot as plt  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_dir", type=str, default="../data")
    parser.add_argument("--dataset_name", type=str, default="FilmClap")
    parser.add_argument("--out_dir", type=str, default="debug")
    parser.add_argument("--num_frames", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from sed_tpu.configs import DEFAULT_WAVEFORM as cfg
    from sed_tpu.data.waveform_dataset import WaveformDataset

    if args.dataset_name.lower() == "filmclap":
        from sed_tpu.io.film_clap import get_film_clap_paths_and_labels

        items = get_film_clap_paths_and_labels(
            os.path.join(args.dataset_dir, "FilmClap"), cfg.time_margin
        )
    else:
        from sed_tpu.io.tau import ensure_tau_data, get_tau_sed_paths_and_labels

        audio_dir, meta_dir = ensure_tau_data(
            os.path.join(args.dataset_dir, "Tau_sound_events_2019"), fold_name="eval"
        )
        items = get_tau_sed_paths_and_labels(audio_dir, meta_dir, cfg)

    dataset = WaveformDataset(items, val_descriptor=0.0, cfg=cfg, seed=args.seed)
    os.makedirs(args.out_dir, exist_ok=True)

    written = 0
    for i in range(len(dataset)):
        frame, label = dataset.get_item(i)
        if not label:
            continue
        plt.plot(range(frame.shape[1]), frame[0], c="r")
        plt.ylim(-0.5, 0.5)
        plt.autoscale(tight=True)
        plt.savefig(os.path.join(args.out_dir, f"a_{i}.png"))
        plt.clf()
        written += 1
        if written >= args.num_frames:
            break
    print(f"wrote {written} positive frames to {args.out_dir}/")


if __name__ == "__main__":
    main()
