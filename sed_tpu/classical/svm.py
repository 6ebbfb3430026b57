"""Classical SVM detector over log-mel spectrogram columns.

Reference: Classical_methods/train_svm_detector.py.  The featurizer (frame
split -> Hann -> rFFT -> log-mel) runs through this framework's TPU pipeline;
the SVM itself stays on the host CPU via scikit-learn — an RBF-kernel SVC is
not a TPU workload (SURVEY.md §2 C26).  Prediction is vectorized over frames
instead of the reference's one-predict-call-per-frame loop
(train_svm_detector.py:32-40).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from sed_tpu.configs import WaveformConfig, DEFAULT_WAVEFORM
from sed_tpu.data.events import frame_coverage_labels
from sed_tpu.io.audio import read_multichannel_audio
from sed_tpu.ops.featurizer import multichannel_complex_to_log_mel
from sed_tpu.ops.stft import padded_window


class SVMDetector:
    """RBF SVC with recall-priority sample weights (train_svm_detector.py:19-49)."""

    def __init__(self, soft_svm: bool = True, recall_priority: float = 10.0):
        from sklearn import svm

        self.soft_svm = soft_svm
        self.svm = svm.SVC(C=1, kernel="rbf", probability=soft_svm)
        self.recall_priority = recall_priority

    def learn(self, spectrograms, event_matrices):
        data = np.concatenate(spectrograms, axis=0)
        labels = np.concatenate(event_matrices, axis=0)
        sample_weights = labels * self.recall_priority + (1 - labels)
        print(f"Svm training on {len(data)} samples... ", end="")
        self.svm.fit(data, labels, sample_weight=sample_weights)
        print("Done")

    def predict(self, spectrogram: np.ndarray) -> np.ndarray:
        if self.soft_svm:
            return self.svm.predict_proba(spectrogram)[:, 1]
        return self.svm.predict(spectrogram)

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self.svm, f)

    def load(self, path: str) -> None:
        if os.path.exists(path):
            with open(path, "rb") as f:
                self.svm = pickle.load(f)


def featurize_frames(frames: np.ndarray, cfg: WaveformConfig = DEFAULT_WAVEFORM) -> np.ndarray:
    """(n_frames, frame_size) waveform frames -> (n_frames, mel) log-mel rows.

    Reference: train_svm_detector.py:62-68 — Hann window then
    ``np.fft.rfft(frames, NFFT)`` then the shared complex->log-mel converter.
    Note the reference multiplies by a frame_size Hann and rffts with NFFT
    zero padding appended at the END (np.fft.rfft n= semantics), unlike the
    centered window placement of the STFT path — reproduced exactly.
    """
    import numpy as np

    from sed_tpu.configs import SpectrogramConfig

    scfg = SpectrogramConfig(
        working_sample_rate=cfg.working_sample_rate,
        time_margin=cfg.time_margin,
        audio_channels=cfg.audio_channels,
        tau_sed_labels=cfg.tau_sed_labels,
    )
    hann = np.hanning(cfg.frame_size)
    windowed = frames * hann
    spec = np.fft.rfft(windowed, scfg.nfft)
    return np.asarray(multichannel_complex_to_log_mel(spec.astype(np.complex64), scfg))


def get_raw_data(audio_paths_labels_and_names, cfg: WaveformConfig = DEFAULT_WAVEFORM):
    """Per file: read audio -> hop-strided frames + coverage labels -> log-mel rows.

    Reference: train_svm_detector.py:51-75.
    """
    data = []
    for audio_path, start_times, end_times, audio_name in audio_paths_labels_and_names:
        waveform = read_multichannel_audio(audio_path, target_fs=cfg.working_sample_rate, cfg=cfg)
        waveform = waveform.T  # (channels, samples)
        frames, labels = frame_coverage_labels(waveform, start_times, end_times, cfg)
        flat = frames.reshape(frames.shape[0] * frames.shape[1], -1)  # concat channels
        mel = featurize_frames(flat, cfg)
        data.append((mel, np.asarray(labels, dtype=np.float64), audio_name))
    return data


def split_train_val(all_data, seed=None):
    """80/20 shuffle split (reference: train_svm_detector.py:77-92)."""
    rng = np.random.default_rng(seed)
    all_data = list(all_data)
    order = rng.permutation(len(all_data))
    all_data = [all_data[i] for i in order]
    features, events, names = zip(*all_data)
    val_amount = len(features) // 5
    return (
        list(features[val_amount:]), list(events[val_amount:]),
        list(features[:val_amount]), list(events[:val_amount]), list(names[:val_amount]),
    )


def evaluate_model(model: SVMDetector, eval_data, plots_dir: str = "plots"):
    """Per-recording metrics + plots (reference: train_svm_detector.py:94-128)."""
    from sed_tpu.utils.metrics import calculate_metrics, f_score
    from sed_tpu.utils.plotting import plot_sample_features

    recal_sets, precision_sets, aps, accs = [], [], [], []
    for feature, event_mat, name in eval_data:
        pred = model.predict(feature)
        acc = float(np.mean((pred > 0.5) == event_mat)) if model.soft_svm else float(
            np.mean(pred == event_mat)
        )
        recals, precisions, ap = calculate_metrics(pred.reshape(-1, 1), event_mat.reshape(-1, 1))
        f1s = [f_score(r, p, 1) for r, p in zip(recals, precisions)]
        print(f"{name} max f1 score: {np.max(f1s)}")
        recal_sets.append(recals)
        precision_sets.append(precisions)
        aps.append(ap)
        accs.append(acc)
        os.makedirs(plots_dir, exist_ok=True)
        plot_sample_features(
            np.array([feature]), mode="spectogram",
            output=pred.reshape(-1, 1), target=event_mat.reshape(-1, 1),
            file_name=f"Acc:{acc:.2f}, AP: {ap:.2f}, f1: {np.max(f1s):.2f}",
            plot_path=os.path.join(plots_dir, f"{name}-f1-{np.max(f1s):.2f}.png"),
        )
    return recal_sets, precision_sets, aps, accs


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="SVM sound-event detector (classical baseline)")
    parser.add_argument("--dataset_dir", type=str, default="../data")
    parser.add_argument("--recall_priority", type=float, default=10.0)
    parser.add_argument("--model_out", type=str, default="last_pickled_model.pkl")
    parser.add_argument("--plots_dir", type=str, default="plots")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from sed_tpu.io.film_clap import get_film_clap_paths_and_labels

    cfg = DEFAULT_WAVEFORM
    items = get_film_clap_paths_and_labels(
        os.path.join(args.dataset_dir, "FilmClap"), time_margin=cfg.time_margin
    )
    all_data = get_raw_data(items, cfg)
    train_x, train_y, val_x, val_y, val_names = split_train_val(all_data, seed=args.seed)

    model = SVMDetector(soft_svm=True, recall_priority=args.recall_priority)
    model.learn(train_x, train_y)
    model.save(args.model_out)
    evaluate_model(model, zip(val_x, val_y, val_names), plots_dir=args.plots_dir)


if __name__ == "__main__":
    main()
