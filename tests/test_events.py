"""Golden tests for label rasterization against literal ports of the
reference loops (reference: dataset/spectogram/spectograms_dataset.py:205-218,
dataset/waveform/waveform_dataset.py:10-43)."""

import numpy as np

from sed_tpu.configs import AudioConfig, DEFAULT_AUDIO
from sed_tpu.data.events import (
    create_event_matrix,
    frame_coverage_labels,
    start_index_labels,
)

CFG = DEFAULT_AUDIO


def _reference_create_event_matrix(frames_num, start_times, end_times, cfg):
    event_matrix = np.zeros((frames_num, cfg.classes_num))
    for n in range(len(start_times)):
        start_frame = int(round(start_times[n] * cfg.frames_per_second))
        end_frame = int(round(end_times[n] * cfg.frames_per_second)) + 1
        event_matrix[start_frame:end_frame] = 1
    return event_matrix


def _reference_start_indices_labels(waveform_length, start_times, end_times, cfg):
    label = np.zeros(waveform_length)
    for start, end in zip(start_times, end_times):
        first = int(start * cfg.working_sample_rate - cfg.frame_size * (1 - cfg.min_event_percentage_in_positive_frame))
        last = int(end * cfg.working_sample_rate - cfg.frame_size * cfg.min_event_percentage_in_positive_frame)
        label[max(first, 0):last] = 1
    return label


def test_event_matrix_matches_reference():
    rng = np.random.default_rng(0)
    frames_num = 181
    starts = np.sort(rng.uniform(0, 55, size=8))
    ends = starts + rng.uniform(0.1, 3.0, size=8)
    got = create_event_matrix(frames_num, starts, ends, CFG)
    ref = _reference_create_event_matrix(frames_num, starts, ends, CFG)
    np.testing.assert_array_equal(got, ref)


def test_event_matrix_empty_events():
    got = create_event_matrix(100, [], [], CFG)
    assert got.shape == (100, CFG.classes_num)
    assert got.sum() == 0


def test_event_matrix_overlapping_events():
    got = create_event_matrix(30, [1.0, 1.5], [3.0, 2.0], CFG)
    ref = _reference_create_event_matrix(30, [1.0, 1.5], [3.0, 2.0], CFG)
    np.testing.assert_array_equal(got, ref)


def test_start_index_labels_matches_reference():
    rng = np.random.default_rng(1)
    length = CFG.working_sample_rate * 20
    starts = np.sort(rng.uniform(1, 15, size=5))
    ends = starts + rng.uniform(0.2, 1.0, size=5)
    got = start_index_labels(length, starts, ends, CFG)
    ref = _reference_start_indices_labels(length, starts, ends, CFG).astype(bool)
    np.testing.assert_array_equal(got, ref)


def test_frame_coverage_labels_matches_reference_rule():
    cfg = CFG
    fs = cfg.working_sample_rate
    duration = 10 * fs
    waveform = np.random.default_rng(2).standard_normal((1, duration)).astype(np.float32)
    starts, ends = [2.0], [4.0]
    frames, labels = frame_coverage_labels(waveform, starts, ends, cfg)

    # Literal port of split_to_frames_with_hop_size (waveform_dataset.py:10-30).
    half = cfg.frame_size // 2
    ref_labels = []
    ref_frames = []
    for center in np.arange(half, waveform.shape[1] - half + 1, step=cfg.hop_size):
        frame = waveform[:, center - half:center + half]
        label = False
        for s, e in zip(starts, ends):
            min_sample = max(s * fs, center - half)
            max_sample = min(e * fs, center + half)
            coverage = (max_sample - min_sample) / cfg.frame_size
            label = label or coverage > cfg.min_event_percentage_in_positive_frame
        ref_frames.append(frame)
        ref_labels.append(label)

    assert frames.shape == (len(ref_labels), 1, cfg.frame_size)
    np.testing.assert_array_equal(labels, np.array(ref_labels))
    np.testing.assert_array_equal(frames, np.stack(ref_frames))
    assert labels.sum() > 0  # the 2s..4s event must tag some frames


def test_config_constants():
    assert CFG.frame_size == 31680
    assert CFG.hop_size == 15840
    assert CFG.frames_per_second == 3
    assert CFG.classes_num == 1
    from sed_tpu.configs import DEFAULT_SPECTROGRAM

    assert DEFAULT_SPECTROGRAM.nfft == 32768
    assert DEFAULT_SPECTROGRAM.freq_bins == 16385
    assert DEFAULT_SPECTROGRAM.train_crop_size == 30
    assert DEFAULT_SPECTROGRAM.mel_max_freq == 24000
    assert "Spectogram_SaR-48.0K" in DEFAULT_SPECTROGRAM.cfg_descriptor


def test_top_level_api_exports():
    import sed_tpu

    assert sed_tpu.SpectrogramConfig().nfft == 32768
    assert callable(sed_tpu.calculate_metrics)
    assert callable(sed_tpu.logmel_features)
    assert "CnnAvgPooling" in dir(sed_tpu)
