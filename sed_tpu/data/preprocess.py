"""Offline feature preprocessing job.

Reference: dataset/spectogram/preprocess.py:60-86 (``preprocess_data``) —
per file: read audio -> STFT -> (log-mel if mode) -> pickle
``{'features', 'start_times', 'end_times'}``; then global per-mel-bin
mean/std over all frames, pickled separately.

TPU-native change: the STFT/mel math runs as the jit-compiled XLA featurizer
(sed_tpu.ops.featurizer) instead of host librosa; file I/O and pickling stay
on the host.  Output format is byte-compatible with the reference's pickles.
"""

from __future__ import annotations

import os
import pickle
import random

import numpy as np

from sed_tpu.configs import SpectrogramConfig, DEFAULT_SPECTROGRAM
from sed_tpu.io.audio import read_multichannel_audio
from sed_tpu.ops.featurizer import logmel_features, multichannel_stft_host


def calculate_scalar_of_tensor(x: np.ndarray):
    """Per-last-axis mean/std (reference: preprocess.py:48-57)."""
    if x.ndim == 2:
        axis = 0
    elif x.ndim == 3:
        axis = (0, 1)
    else:
        raise ValueError(f"expected 2-D or 3-D features, got {x.ndim}-D")
    return np.mean(x, axis=axis), np.std(x, axis=axis)


def featurize_waveform(
    waveform: np.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    preprocess_mode: str = "logMel",
    fft_impl: str = "auto",
) -> np.ndarray:
    """(samples, channels) float waveform -> (channels, frames, bins/mels)."""
    waveform = waveform.astype(np.float32)
    if preprocess_mode == "logMel":
        return np.asarray(logmel_features(waveform, cfg, fft_impl))
    return multichannel_stft_host(waveform, cfg, fft_impl).astype(np.complex64)


def featurize_file(
    audio_path: str,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    preprocess_mode: str = "logMel",
    fft_impl: str = "auto",
) -> np.ndarray:
    """Read one file and compute (channels, frames, bins/mels) features."""
    waveform = read_multichannel_audio(audio_path, target_fs=cfg.working_sample_rate, cfg=cfg)
    return featurize_waveform(waveform, cfg, preprocess_mode, fft_impl)


def _waveform_producer(paths, cfg, workers, out_queue):
    """Producer thread: decode+resample files in small native batches, ahead
    of the featurize/pickle consumer.  Items are (index, waveform | None,
    error) in order; a None waveform carries the per-file exception so the
    consumer can fail at the same point the sequential path would."""
    from sed_tpu.io.audio import read_multichannel_audio_batch

    group = max(2, workers)
    for base in range(0, len(paths), group):
        chunk = paths[base: base + group]
        try:
            waves = read_multichannel_audio_batch(
                chunk, target_fs=cfg.working_sample_rate, cfg=cfg,
                workers=workers)
            for j, w in enumerate(waves):
                out_queue.put((base + j, w, None))
        except Exception as e:  # fall back to per-file for exact attribution
            for j, p in enumerate(chunk):
                try:
                    w = read_multichannel_audio_batch(
                        [p], target_fs=cfg.working_sample_rate, cfg=cfg)[0]
                    out_queue.put((base + j, w, None))
                except Exception as e2:
                    out_queue.put((base + j, None, e2))
            del e


def preprocess_data(
    audio_path_and_labels,
    output_dir: str,
    output_mean_std_file: str,
    preprocess_mode: str = "logMel",
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    fft_impl: str = "auto",
    plot_sample: bool = True,
    workers: int = 0,
) -> None:
    """Featurize + pickle every labeled file, then global mean/std.

    ``workers > 0`` runs the acquisition stage (WAV decode + channel policy
    + resample) as a pipelined producer: files are loaded ``workers`` at a
    time on the native C++ thread pool (GIL-free) while the consumer runs
    the device featurizer and pickles — on a TPU host the decode of file
    i+1 overlaps the device dispatch of file i.  Sources already at the
    working rate (TAU is 48 kHz) produce byte-identical pickles and
    mean/std (pinned by tests/test_data.py); sources that need resampling
    go through the native Kaiser resampler instead of the scipy one — the
    measured-equivalent pair of PARITY.md divergence #4 (both <= -140 dBFS
    of the float64 oracle), NOT bit-equal.
    Reference analog: the serial loop in dataset/spectogram/preprocess.py:
    60-86 (its DataLoader workers parallelize training crops, not this).
    """
    print("Preprocessing collected data")
    os.makedirs(output_dir, exist_ok=True)

    from sed_tpu.io.labels import event_class_indices

    items = list(audio_path_and_labels)
    wave_iter = None
    if workers > 0 and len(items) > 1:
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=2 * max(2, workers))
        t = threading.Thread(
            target=_waveform_producer,
            args=([it[0] for it in items], cfg, workers, q), daemon=True)
        t.start()

        def _ordered():
            for i in range(len(items)):
                idx, w, err = q.get()
                assert idx == i  # producer emits in order
                if err is not None:
                    raise err
                yield w
        wave_iter = _ordered()

    all_features = []
    for item in items:
        audio_path, start_times, end_times, audio_name = item
        if wave_iter is not None:
            feature = featurize_waveform(next(wave_iter), cfg,
                                         preprocess_mode, fft_impl)
        else:
            feature = featurize_file(audio_path, cfg, preprocess_mode,
                                     fft_impl)
        all_features.append(feature)
        output_path = os.path.join(
            output_dir, audio_name + f"_{preprocess_mode}_features_and_labels.pkl"
        )
        with open(output_path, "wb") as f:
            # Superset of the reference pickle format (preprocess.py:74-76):
            # class_indices carries per-event class identity (None for
            # class-blind sources); reference-era pickles without the key
            # still load (readers use .get()).
            pickle.dump(
                {"features": feature, "start_times": start_times,
                 "end_times": end_times,
                 "class_indices": event_class_indices(item)}, f
            )

    all_features = np.concatenate(all_features, axis=1)
    mean, std = calculate_scalar_of_tensor(all_features)
    with open(output_mean_std_file, "wb") as f:
        pickle.dump({"mean": mean, "std": std}, f)

    if plot_sample and audio_path_and_labels:
        item = random.choice(list(audio_path_and_labels))
        audio_path, start_times, end_times, audio_name = item
        try:
            analyze_data_sample(
                audio_path, start_times, end_times, audio_name,
                os.path.join(os.path.dirname(output_mean_std_file), "data_sample.png"),
                cfg,
                class_indices=event_class_indices(item),
            )
        except Exception as e:  # plotting is best-effort diagnostics
            print(f"data-sample plot skipped: {e}")


def analyze_data_sample(audio_path, start_times, end_times, audio_name, plot_path,
                        cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
                        class_indices=None) -> None:
    """Debug plot + shape walkthrough (reference: preprocess.py:89-113)."""
    from sed_tpu.data.events import create_event_matrix
    from sed_tpu.utils.plotting import plot_sample_features
    from sed_tpu.io.audio import read_wav

    org_audio, org_sample_rate = read_wav(audio_path)
    audio = read_multichannel_audio(audio_path, target_fs=cfg.working_sample_rate, cfg=cfg)
    feature = np.asarray(logmel_features(audio.astype(np.float32), cfg))
    event_matrix = create_event_matrix(feature.shape[1], start_times, end_times, cfg,
                                       class_indices=class_indices)
    plot_sample_features(feature, mode="spectogram", target=event_matrix,
                         plot_path=plot_path, file_name=audio_name, cfg=cfg)

    signal_time = audio.shape[0] / cfg.working_sample_rate
    fps = cfg.working_sample_rate / cfg.hop_size
    print(f"Data sample analysis: {audio_name}")
    print(f"\tOriginal audio: {org_audio.shape} sample_rate={org_sample_rate}")
    print(f"\tsingle channel audio: {audio.shape}, sample_rate={cfg.working_sample_rate}")
    print(f"\tSignal time is (num_samples/sample_rate)={signal_time:.1f}s")
    print(f"\tSTFT FPS is (sample_rate/hop_size)={fps}")
    print(f"\tTotal number of frames is (FPS*signal_time)={fps * signal_time:.1f}")
    print(f"\tEach frame covers {cfg.frame_size} samples or "
          f"{cfg.frame_size / cfg.working_sample_rate:.3f} seconds padded into "
          f"{cfg.nfft} samples and allow ({cfg.nfft}//2+1)={cfg.freq_bins} frequency bins")
    print(f"\tFeatures shape: {feature.shape}")
