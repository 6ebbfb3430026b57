"""BASELINE config #3 — SVM parity benchmark.

Measures the classical SVM detector (sed_tpu.classical.svm) against a literal
float64 port of the reference's SVM math
(Classical_methods/train_svm_detector.py:51-128) on a deterministic synthetic
FilmClap fixture:

  * featurization parity: reference math = frames -> np.hanning ->
    np.fft.rfft(NFFT, zero-pad appended at the end) -> librosa-math log-mel
    (train_svm_detector.py:62-68); compared in dB against
    sed_tpu.classical.svm.featurize_frames on identical frames;
  * accuracy/AP parity: both sides fit sklearn SVC(C=1, rbf, probability=True)
    with recall-priority sample weights (train_svm_detector.py:24-30) on the
    identical train fold and evaluate on the identical val fold;
  * a featurizer throughput line for the SVM feature path.

Frame splitting + coverage labels are shared (sed_tpu.data.events
.frame_coverage_labels); their parity with the reference splitter
(waveform_dataset.py:10-30) is separately fuzz-tested in tests/test_fuzz.py.

Run: python benchmarks/bench_svm.py   (CPU; ~1 min)
Writes benchmarks/SVM_PARITY.json and prints one summary JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_fixture(root: str, n_clips: int = 10, seconds: float = 12.0, seed: int = 0):
    """Synthetic FilmClap dataset (same format as tests/test_cli.py)."""
    from scipy.io import wavfile

    from sed_tpu.configs import DEFAULT_WAVEFORM as CFG

    film_dir = os.path.join(root, "FilmClap", "filmA")
    os.makedirs(film_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    sr = CFG.working_sample_rate
    labels = {}
    for i in range(n_clips):
        n = int(seconds * sr)
        # Noisy background with non-event distractor tones so the SVM sits in
        # a discriminating (non-saturated) accuracy regime.
        sig = 0.05 * rng.standard_normal(n)
        t = np.arange(n) / sr
        sig += 0.03 * np.sin(2 * np.pi * rng.uniform(100, 500) * t)
        centers = []
        for _ in range(int(rng.integers(1, 4))):
            center = float(rng.uniform(1.0, seconds - 1.0))
            click = np.exp(-np.linspace(0, 40, int(0.1 * sr)))
            s = int(center * sr)
            amp = float(rng.uniform(0.05, 0.2))
            sig[s:s + len(click)] += amp * click * np.sin(
                2 * np.pi * rng.uniform(2000, 4000) * np.arange(len(click)) / sr)
            centers.append(center)
        path = os.path.join(film_dir, f"clip_{i}.wav")
        wavfile.write(path, sr, sig.astype(np.float32))
        labels[path] = centers
    with open(os.path.join(root, "FilmClap", "paths_and_labels_fixed_Meron.txt"), "w") as f:
        json.dump(labels, f)
        f.write("\n")
    return root


def reference_featurize(frames: np.ndarray, nfft: int, cfg) -> np.ndarray:
    """Literal float64 port of train_svm_detector.py:66-68 (+ the librosa mel
    math it calls into, preprocess.py:13-18,39-45)."""
    from sed_tpu.ops import mel as mel_ops
    from sed_tpu.configs import SpectrogramConfig

    scfg = SpectrogramConfig(
        working_sample_rate=cfg.working_sample_rate,
        time_margin=cfg.time_margin,
        audio_channels=cfg.audio_channels,
        tau_sed_labels=cfg.tau_sed_labels,
    )
    windowed = frames.astype(np.float64) * np.hanning(frames.shape[1])
    spec = np.fft.rfft(windowed, nfft)
    power = np.abs(spec) ** 2
    fb = mel_ops.mel_filterbank(scfg, dtype=np.float64)
    return 10.0 * np.log10(np.maximum(1e-10, power @ fb))


def run(log=print):
    from sed_tpu.classical.svm import (
        SVMDetector,
        featurize_frames,
        get_raw_data,
        split_train_val,
    )
    from sed_tpu.configs import DEFAULT_WAVEFORM as CFG
    from sed_tpu.data.events import frame_coverage_labels
    from sed_tpu.io.audio import read_multichannel_audio
    from sed_tpu.io.film_clap import get_film_clap_paths_and_labels
    from sed_tpu.utils.metrics import calculate_metrics

    with tempfile.TemporaryDirectory() as tmp:
        make_fixture(tmp)
        items = get_film_clap_paths_and_labels(
            os.path.join(tmp, "FilmClap"), time_margin=CFG.time_margin)
        log(f"fixture: {len(items)} clips")

        # --- our pipeline (also timed as the featurizer-throughput line) ---
        t0 = time.perf_counter()
        ours = get_raw_data(items, CFG)
        feat_seconds = time.perf_counter() - t0
        total_frames = sum(len(m) for m, _, _ in ours)
        total_audio = sum(12.0 for _ in ours)

        # --- reference-math features on identical frames -------------------
        nfft = 2 ** int(np.ceil(np.log2(CFG.frame_size)))
        worst_db = 0.0
        ref_data = []
        for (audio_path, starts, ends, name), (mel_ours, labels_ours, _) in zip(items, ours):
            waveform = read_multichannel_audio(
                audio_path, target_fs=CFG.working_sample_rate, cfg=CFG).T
            frames, labels = frame_coverage_labels(waveform, starts, ends, CFG)
            flat = frames.reshape(frames.shape[0] * frames.shape[1], -1)
            mel_ref = reference_featurize(flat, nfft, CFG)
            assert np.array_equal(np.asarray(labels, np.float64), labels_ours), name
            worst_db = max(worst_db, float(np.abs(mel_ref - mel_ours).max()))
            ref_data.append((mel_ref.astype(np.float32), labels_ours, name))
        log(f"feature parity: max |dB diff| = {worst_db:.2e}")

        # --- identical split, two SVM fits ---------------------------------
        train_x, train_y, val_x, val_y, val_names = split_train_val(ours, seed=0)
        rtrain_x, rtrain_y, rval_x, rval_y, _ = split_train_val(ref_data, seed=0)

        def fit_eval(tx, ty, vx, vy, detector_cls):
            np.random.seed(0)  # SVC(probability=True) internal CV determinism
            det = detector_cls(soft_svm=True, recall_priority=10.0)
            det.learn(tx, ty)
            accs, aps = [], []
            for f, e in zip(vx, vy):
                pred = det.predict(f)
                accs.append(float(np.mean((pred > 0.5) == e)))
                _, _, ap = calculate_metrics(pred.reshape(-1, 1), e.reshape(-1, 1))
                aps.append(ap)
            return float(np.mean(accs)), float(np.mean(aps))

        ours_acc, ours_ap = fit_eval(train_x, train_y, val_x, val_y, SVMDetector)
        ref_acc, ref_ap = fit_eval(rtrain_x, rtrain_y, rval_x, rval_y, SVMDetector)
        log(f"ours: acc={ours_acc:.4f} ap={ours_ap:.4f}; "
            f"reference-math: acc={ref_acc:.4f} ap={ref_ap:.4f}")

    import jax

    result = {
        "fixture": {"clips": 10, "seconds": 12.0, "seed": 0},
        "feature_parity_max_db": worst_db,
        "ours": {"val_accuracy": ours_acc, "mean_ap": ours_ap},
        "reference_math": {"val_accuracy": ref_acc, "mean_ap": ref_ap},
        "accuracy_delta": abs(ours_acc - ref_acc),
        "ap_delta_points": abs(ours_ap - ref_ap) * 100.0,
        "featurizer": {
            "frames_per_sec": total_frames / feat_seconds,
            "audio_sec_per_sec": total_audio / feat_seconds,
            "platform": jax.default_backend(),
            "note": "SVM feature path: host rfft + device mel (includes wav read)",
        },
        "pass": bool(worst_db < 1e-4 and abs(ours_ap - ref_ap) * 100.0 < 0.5),
    }
    return result


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # before any backend query
    result = run(log=lambda *a: print(*a, file=sys.stderr))
    with open(os.path.join(REPO, "benchmarks", "SVM_PARITY.json"), "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps({
        "metric": "svm_ap_delta_vs_reference_math",
        "value": result["ap_delta_points"],
        "unit": "AP points",
        "feature_parity_max_db": result["feature_parity_max_db"],
        "pass": result["pass"],
    }))


if __name__ == "__main__":
    main()
