"""TAU Spatial Sound Events 2019 dataset: download, extraction, label parsing.

Reference: dataset/download_tau_sed_2019.py (Zenodo URLs/md5s, unzip shellouts)
and dataset/dataset_utils.py:42-60 (per-wav CSV label parsing).  This version
uses only the stdlib (urllib, zipfile, hashlib) — no torchvision, no
subprocess unzip — with the same Zenodo artifact list, md5 gating, and
idempotence-by-directory-existence behavior.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import urllib.request
import zipfile

from sed_tpu.configs import AudioConfig, DEFAULT_AUDIO

# Zenodo artifacts (download_tau_sed_2019.py:8-31).
FOA_ARTIFACTS = [
    ("https://zenodo.org/record/2599196/files/foa_dev.z01?download=1",
     "bd5b18a47a3ed96e80069baa6b221a5a", "foa_dev.z01"),
    ("https://zenodo.org/record/2599196/files/foa_dev.z02?download=1",
     "5194ebf43ae095190ed78691ec9889b1", "foa_dev.z02"),
    ("https://zenodo.org/record/2599196/files/foa_dev.zip?download=1",
     "2154ad0d9e1e45bfc933b39591b49206", "foa_dev.zip"),
    ("https://zenodo.org/record/2599196/files/metadata_dev.zip?download=1",
     "c2e5c8b0ab430dfd76c497325171245d", "metadata_dev.zip"),
    ("https://zenodo.org/record/3377088/files/foa_eval.zip?download=1",
     "4a8ca8bfb69d7c154a56a672e3b635d5", "foa_eval.zip"),
    ("https://zenodo.org/record/3377088/files/metadata_eval.zip?download=1",
     "a0ec7640284ade0744dfe299f7ba107b", "metadata_eval.zip"),
]


def _md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download_foa_data(data_dir: str, fold_name: str = "eval") -> None:
    """Download the Zenodo archives (eval fold = last two artifacts only,
    download_tau_sed_2019.py:33-34), skipping files whose md5 already matches."""
    artifacts = FOA_ARTIFACTS[-2:] if fold_name == "eval" else FOA_ARTIFACTS
    os.makedirs(data_dir, exist_ok=True)
    for url, md5, name in artifacts:
        dest = os.path.join(data_dir, name)
        if os.path.exists(dest) and _md5(dest) == md5:
            print(f"Using downloaded and verified file: {dest}")
            continue
        print(f"Downloading {url} -> {dest}")
        urllib.request.urlretrieve(url, dest)
        got = _md5(dest)
        if got != md5:
            raise RuntimeError(f"md5 mismatch for {name}: expected {md5}, got {got}")


def _unzip(archive: str, output_dir: str) -> None:
    with zipfile.ZipFile(archive) as zf:
        zf.extractall(output_dir)


def _merge_split_zip(parts: list, merged: str) -> None:
    """Concatenate zip spanned parts (.z01, .z02, .zip) into one archive,
    replacing the reference's ``zip -s 0`` shellout (download_tau_sed_2019.py:52)."""
    with open(merged, "wb") as out:
        for part in parts:
            with open(part, "rb") as f:
                shutil.copyfileobj(f, out)


def extract_foa_data(data_dir: str, output_dir: str, fold_name: str = "eval") -> None:
    """Extract archives, flattening Zenodo's nested proj/.../foa_eval layout
    (download_tau_sed_2019.py:41-53)."""
    os.makedirs(output_dir, exist_ok=True)
    _unzip(os.path.join(data_dir, "metadata_eval.zip"), output_dir)
    _unzip(os.path.join(data_dir, "foa_eval.zip"), output_dir)

    nested = os.path.join(output_dir, "proj", "asignal", "DCASE2019", "dataset", "foa_eval")
    if os.path.isdir(nested):
        target = os.path.join(output_dir, "foa_eval")
        os.makedirs(target, exist_ok=True)
        for name in os.listdir(nested):
            shutil.copy2(os.path.join(nested, name), target)
        shutil.rmtree(os.path.join(output_dir, "proj"))

    if fold_name == "train":
        _unzip(os.path.join(data_dir, "metadata_dev.zip"), output_dir)
        merged = os.path.join(data_dir, "unsplit_foa_dev.zip")
        _merge_split_zip(
            [os.path.join(data_dir, n) for n in ("foa_dev.z01", "foa_dev.z02", "foa_dev.zip")],
            merged,
        )
        _unzip(merged, output_dir)


def ensure_tau_data(data_dir: str, fold_name: str = "eval"):
    """Idempotent download+extract; returns (audio_dir, meta_data_dir).

    Reference: download_tau_sed_2019.py:56-71.
    """
    zipped_data_dir = os.path.join(data_dir, "zipped")
    extracted_data_dir = os.path.join(data_dir, "raw")
    audio_dir = f"{extracted_data_dir}/foa_{fold_name}"
    meta_data_dir = f"{extracted_data_dir}/metadata_{fold_name}"

    if os.path.exists(audio_dir) and os.path.exists(meta_data_dir):
        # Deliberate divergence: the reference re-downloads whenever the
        # zipped/ dir is missing even though extracted data already exists
        # (download_tau_sed_2019.py:63-64); complete existing raw data wins.
        print("Using existing raw data")
        return audio_dir, meta_data_dir

    if not os.path.exists(zipped_data_dir):
        print("Downloading zipped data")
        download_foa_data(zipped_data_dir, fold_name)
    print("Extracting raw data")
    extract_foa_data(zipped_data_dir, extracted_data_dir, fold_name)

    return audio_dir, meta_data_dir


def get_tau_sed_paths_and_labels(
    audio_dir: str,
    labels_data_dir: str,
    cfg: AudioConfig = DEFAULT_AUDIO,
):
    """Per-wav CSV -> (audio_path, start_times, end_times, bare_name) tuples,
    keeping only rows whose event class is in ``cfg.tau_sed_labels``.

    Reference: dataset/dataset_utils.py:42-60.
    """
    import pandas as pd

    results = []
    for audio_fname in sorted(os.listdir(audio_dir)):
        bare_name = os.path.splitext(audio_fname)[0]
        audio_path = os.path.join(audio_dir, audio_fname)
        df = pd.read_csv(os.path.join(labels_data_dir, bare_name + ".csv"), sep=",")
        keep = df["sound_event_recording"].isin(cfg.tau_sed_labels).values
        start_times = df["start_time"].values[keep]
        end_times = df["end_time"].values[keep]
        results.append((audio_path, start_times, end_times, bare_name))
    return results
