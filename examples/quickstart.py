"""Quickstart: synthesize a tiny FilmClap-style dataset, train, and infer.

Runs on CPU or TPU:  python examples/quickstart.py [--device cpu]
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthesize_dataset(root: str, n_clips: int = 4, seconds: int = 12) -> None:
    """Write WAVs with exponential 'clap' events + the FilmClap label JSON."""
    from scipy.io import wavfile

    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg

    film_dir = os.path.join(root, "FilmClap", "demo_film")
    os.makedirs(film_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    sr = cfg.working_sample_rate
    labels = {}
    for i in range(n_clips):
        sig = 0.01 * rng.standard_normal(seconds * sr)
        center = 4.0 + 0.7 * i
        click = np.exp(-np.linspace(0, 40, int(0.1 * sr)))
        s = int(center * sr)
        sig[s:s + len(click)] += 0.8 * click * np.sin(
            2 * np.pi * 3000 * np.arange(len(click)) / sr
        )
        path = os.path.join(film_dir, f"clip_{i}.wav")
        wavfile.write(path, sr, sig.astype(np.float32))
        labels[path] = [center]
    with open(os.path.join(root, "FilmClap", "paths_and_labels_fixed_Meron.txt"), "w") as f:
        json.dump(labels, f)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", default="tpu")
    parser.add_argument("--steps", type=int, default=20)
    args = parser.parse_args()

    workdir = tempfile.mkdtemp(prefix="sed_tpu_quickstart_")
    print(f"workspace: {workdir}")
    synthesize_dataset(workdir)

    # Train (reference-parity CLI).
    from sed_tpu.cli.main import main as train_main

    train_main([
        "--dataset_dir", workdir,
        "--dataset_name", "FilmClap",
        "--train_features", "Spectogram",
        "--preprocess_mode", "logMel",
        "--outputs_root", os.path.join(workdir, "training"),
        "--val_descriptor", "clip_3",
        "--batch_size", "8",
        "--num_train_steps", str(args.steps),
        "--log_freq", str(max(args.steps // 2, 1)),
        "--device", args.device,
    ])

    run_dir = os.path.join(workdir, "training",
                           os.listdir(os.path.join(workdir, "training"))[0])
    ckpt = sorted(os.listdir(os.path.join(run_dir, "checkpoints")))[-1]
    print(f"checkpoint: {ckpt}")

    # Infer on one clip.
    from sed_tpu.cli.infer import main as infer_main

    wav = os.path.join(workdir, "FilmClap", "demo_film", "clip_0.wav")
    out_dir = os.path.join(workdir, "inference")
    infer_main([
        wav,
        "--ckpt", os.path.join(run_dir, "checkpoints", ckpt),
        "--outputs_dir", out_dir,
        "--device", args.device,
    ])
    print(f"scores + plot in {out_dir}")


if __name__ == "__main__":
    main()
