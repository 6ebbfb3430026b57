"""SVM classical baseline: featurization + learn/predict on synthetic frames."""

import numpy as np
import pytest

from sed_tpu.classical.svm import SVMDetector, featurize_frames, split_train_val
from sed_tpu.configs import WaveformConfig

WCFG = WaveformConfig(working_sample_rate=8000, time_margin=0.33)


def test_featurize_frames_matches_reference_math():
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((5, WCFG.frame_size)).astype(np.float64)
    got = featurize_frames(frames, WCFG)
    # Reference math: Hann * frame -> np.fft.rfft(x, NFFT) -> |.|^2 @ mel -> dB.
    from sed_tpu.configs import SpectrogramConfig
    from sed_tpu.ops.mel import mel_filterbank

    scfg = SpectrogramConfig(working_sample_rate=8000, time_margin=0.33)
    spec = np.fft.rfft(frames * np.hanning(WCFG.frame_size), scfg.nfft)
    ref = 10 * np.log10(np.maximum(1e-10, (np.abs(spec) ** 2) @ mel_filterbank(scfg, np.float64)))
    assert got.shape == (5, scfg.mel_bins)
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_svm_learns_separable_problem():
    rng = np.random.default_rng(1)
    pos = rng.standard_normal((60, 8)) + 3.0
    neg = rng.standard_normal((60, 8)) - 3.0
    x = np.concatenate([pos, neg])
    y = np.concatenate([np.ones(60), np.zeros(60)])
    model = SVMDetector(soft_svm=True, recall_priority=5.0)
    model.learn([x], [y])
    scores = model.predict(x)
    assert ((scores > 0.5) == y).mean() > 0.95


def test_svm_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((40, 4))
    y = (x.sum(1) > 0).astype(float)
    model = SVMDetector(soft_svm=False, recall_priority=1.0)
    model.learn([x], [y])
    p = str(tmp_path / "svm.pkl")
    model.save(p)
    model2 = SVMDetector(soft_svm=False, recall_priority=1.0)
    model2.load(p)
    np.testing.assert_array_equal(model.predict(x), model2.predict(x))


def test_split_train_val_fraction():
    data = [(np.zeros((2, 3)), np.zeros(2), f"n{i}") for i in range(10)]
    tx, ty, vx, vy, names = split_train_val(data, seed=0)
    assert len(vx) == 2 and len(tx) == 8
    assert len(names) == 2
