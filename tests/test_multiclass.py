"""Multi-class support: the full 11-label (and 3-label) TAU lists kept
commented in the reference config (common_config.py:11-13) must work end to
end — and MEAN something: with per-event class identity (io.labels
.LabeledAudio) each event labels only its own class column, diverging from
the reference's class-blind painting (spectograms_dataset.py:217, a defect
masked by its hardcoded classes_num==1; PARITY.md "Known divergences")."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sed_tpu.configs import AudioConfig, SpectrogramConfig
from sed_tpu.data.events import create_event_matrix
from sed_tpu.models.cnn import CnnAvgPooling
from sed_tpu.models.m5 import M5
from sed_tpu.train.loss import weighted_bce_with_logits
from sed_tpu.utils.metrics import calculate_metrics

THREE = ("knock", "keysDrop", "doorslam")
ELEVEN = ("knock", "drawer", "clearthroat", "phone", "keysDrop", "speech",
          "keyboard", "pageturn", "cough", "doorslam", "laughter")


def test_config_classes_num():
    assert AudioConfig(tau_sed_labels=THREE).classes_num == 3
    assert AudioConfig(tau_sed_labels=ELEVEN).classes_num == 11


def test_event_matrix_multiclass_shape():
    cfg = AudioConfig(tau_sed_labels=THREE)
    em = create_event_matrix(60, [1.0], [2.0], cfg)
    assert em.shape == (60, 3)
    # Without class identity: reference class-blind painting of all columns
    # (spectograms_dataset.py:217) — parity for reference-era caches.
    assert (em[3:7] == 1).all() and (em[7] == 0).all()


# ---------------------------------------------------------------------------
# Class-indexed rasterization (the round-4 divergence that makes multiclass
# real): each event paints only its own class column.
# ---------------------------------------------------------------------------


def _loop_event_matrix_per_class(frames_num, starts, ends, cls, cfg):
    """Per-event loop oracle: the reference loop (spectograms_dataset.py:
    205-218) with the single defective line fixed to paint only column
    cls[n]."""
    em = np.zeros((frames_num, cfg.classes_num), dtype=np.float32)
    for n in range(len(starts)):
        start_frame = int(round(starts[n] * cfg.frames_per_second))
        end_frame = int(round(ends[n] * cfg.frames_per_second)) + 1
        em[start_frame:end_frame, cls[n]] = 1
    return em


def test_event_matrix_class_indexed():
    cfg = AudioConfig(tau_sed_labels=THREE)
    rng = np.random.default_rng(3)
    starts = np.sort(rng.uniform(0, 15, size=9))
    ends = starts + rng.uniform(0.2, 2.0, size=9)
    cls = rng.integers(0, 3, size=9)
    got = create_event_matrix(60, starts, ends, cfg, class_indices=cls)
    ref = _loop_event_matrix_per_class(60, starts, ends, cls, cfg)
    np.testing.assert_array_equal(got, ref)
    # The columns genuinely differ (a 2-class model no longer trains on the
    # identical union signal in every column).
    assert not np.array_equal(got[:, 0], got[:, 1]) \
        or not np.array_equal(got[:, 1], got[:, 2])
    # Union over class columns == the class-blind painting's single pattern.
    blind = create_event_matrix(60, starts, ends, cfg)
    np.testing.assert_array_equal(got.max(axis=1), blind[:, 0])


def test_event_matrix_class_indexed_validation():
    cfg = AudioConfig(tau_sed_labels=THREE)
    with pytest.raises(ValueError, match="class_indices shape"):
        create_event_matrix(10, [1.0, 2.0], [1.5, 2.5], cfg, class_indices=[0])
    with pytest.raises(ValueError, match="out of range"):
        create_event_matrix(10, [1.0], [1.5], cfg, class_indices=[3])


def test_start_index_labels_multiclass():
    from sed_tpu.data.events import start_index_labels

    cfg = AudioConfig(working_sample_rate=8000, time_margin=0.33,
                      tau_sed_labels=("a", "b"))
    length = 8000 * 20
    starts = np.array([2.0, 6.0, 11.0])
    ends = starts + np.array([1.5, 2.0, 1.0])
    cls = np.array([0, 1, 0])
    got = start_index_labels(length, starts, ends, cfg, class_indices=cls)
    assert got.shape == (length, 2)
    # Per-class column == the class-blind call restricted to that class's events.
    for c in range(2):
        ref_c = start_index_labels(length, starts[cls == c], ends[cls == c], cfg)
        np.testing.assert_array_equal(got[:, c], ref_c)
    assert not np.array_equal(got[:, 0], got[:, 1])


def test_frame_coverage_labels_multiclass():
    from sed_tpu.data.events import frame_coverage_labels

    cfg = AudioConfig(working_sample_rate=8000, time_margin=0.33,
                      tau_sed_labels=("a", "b"))
    wave = np.random.default_rng(0).standard_normal((1, 8000 * 20)).astype(np.float32)
    starts = np.array([2.0, 6.0, 11.0])
    ends = starts + np.array([1.5, 2.0, 1.0])
    cls = np.array([0, 1, 0])
    frames, labels = frame_coverage_labels(wave, starts, ends, cfg, class_indices=cls)
    assert labels.shape == (frames.shape[0], 2)
    for c in range(2):
        _, ref_c = frame_coverage_labels(wave, starts[cls == c], ends[cls == c], cfg)
        np.testing.assert_array_equal(labels[:, c], ref_c)
    assert not np.array_equal(labels[:, 0], labels[:, 1])
    assert labels.any()


def test_labeled_audio_carrier():
    from sed_tpu.io.labels import LabeledAudio, event_class_indices

    item = LabeledAudio("a.wav", [1.0], [2.0], "a", [1])
    path, s, e, name = item  # unpacks as the reference 4-tuple
    assert (path, name) == ("a.wav", "a")
    np.testing.assert_array_equal(event_class_indices(item), [1])
    assert event_class_indices(("a.wav", [1.0], [2.0], "a")) is None
    with pytest.raises(ValueError, match="class_indices"):
        LabeledAudio("a.wav", [1.0, 2.0], [1.5, 2.5], "a", [0])


def test_cnn_multiclass_forward_and_loss():
    cfg = SpectrogramConfig(tau_sed_labels=THREE)
    model = CnnAvgPooling(classes_num=cfg.classes_num, model_config=((8, 2), (16, 2)))
    x = jax.random.normal(jax.random.key(0), (2, 30, 64, 1))
    variables = model.init(jax.random.key(1), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 28, 3)
    y = jnp.zeros((2, 30, 3))
    loss = weighted_bce_with_logits(out, y, pos_weight=5.0, multi_frame=True)
    assert np.isfinite(float(loss))


def test_metrics_multiclass():
    rng = np.random.default_rng(0)
    out = rng.random((40, 11))
    tgt = (rng.random((40, 11)) > 0.9).astype(np.float32)
    r, p, ap = calculate_metrics(out, tgt)
    assert r.shape == (21,) and np.isfinite(ap)


def test_m5_multiclass():
    model = M5(classes_num=3)
    x = jnp.zeros((2, 31680, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    assert model.apply(variables, x, train=False).shape == (2, 3)


def test_two_channel_config_end_to_end():
    """audio_channels=2 (reference common_config.py:5 knob): featurizer,
    packing, model, and fused step all carry the channel axis."""
    from scipy.io import wavfile

    from sed_tpu.ops.featurizer import logmel_features

    cfg2 = SpectrogramConfig(working_sample_rate=8000, time_margin=0.33,
                             audio_channels=2)
    rng = np.random.default_rng(0)
    wave = (0.1 * rng.standard_normal((12 * 8000, 2))).astype(np.float32)
    lm = np.asarray(logmel_features(wave, cfg2))
    assert lm.shape == (2, 37, cfg2.mel_bins)

    # Fused train step with 2-channel packed features.
    from sed_tpu.data.device_pipeline import (
        SpectrogramBuffers,
        make_spectrogram_train_step,
    )
    from sed_tpu.train.optim import make_optimizer
    from sed_tpu.train.state import init_state

    crop = cfg2.train_crop_size
    total = 4 * crop
    buffers = SpectrogramBuffers(
        features=jnp.asarray(rng.standard_normal((2, total, cfg2.mel_bins)).astype(np.float32)),
        events=jnp.asarray((rng.random((total, 1)) > 0.8).astype(np.float32)),
        start_indices=jnp.arange(total - crop, dtype=jnp.int32),
        mean=jnp.zeros((cfg2.mel_bins,), jnp.float32),
        std=jnp.ones((cfg2.mel_bins,), jnp.float32),
    )
    model = CnnAvgPooling(classes_num=1, model_config=((8, 2), (16, 2)))
    tx = make_optimizer(1e-3)
    state = init_state(model, jax.random.key(0),
                       jnp.zeros((4, crop, cfg2.mel_bins, 2)), tx)
    step = make_spectrogram_train_step(model, tx, cfg2, 5.0, "logMel", augment=True)
    state, loss = step(state, buffers, jnp.arange(4, dtype=jnp.int32), jax.random.key(1))
    assert np.isfinite(float(loss))

    # Channel policy: repeat-mean when the file has fewer channels (dataset_utils.py:70-72).
    import tempfile, os

    from sed_tpu.io.audio import read_multichannel_audio

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "mono.wav")
        wavfile.write(p, 8000, (0.1 * rng.standard_normal(8000)).astype(np.float32))
        audio = read_multichannel_audio(p, target_fs=8000, cfg=cfg2)
        assert audio.shape == (8000, 2)


# ---------------------------------------------------------------------------
# End-to-end multiclass: a 2-class synthetic corpus where the class columns
# DIFFER through the full spectrogram and waveform pipelines (VERDICT r3 #1).
# ---------------------------------------------------------------------------

SCFG = SpectrogramConfig(working_sample_rate=8000, time_margin=0.33,
                         tau_sed_labels=("knock", "doorslam"))


@pytest.fixture(scope="module")
def two_class_corpus(tmp_path_factory):
    """Five 15 s wavs; each carries one 'knock' (tone) and one 'doorslam'
    (noise burst) at DIFFERENT times, as LabeledAudio items."""
    from scipy.io import wavfile

    from sed_tpu.io.labels import LabeledAudio

    root = tmp_path_factory.mktemp("mc_corpus")
    rng = np.random.default_rng(7)
    sr = SCFG.working_sample_rate
    items = []
    for i in range(5):
        n = 15 * sr
        sig = 0.01 * rng.standard_normal(n)
        knock_t, slam_t = 2.0 + 0.5 * i, 9.0 + 0.3 * i
        t = np.arange(sr) / sr
        sig[int(knock_t * sr):int(knock_t * sr) + sr] += 0.5 * np.sin(2 * np.pi * 600 * t)
        sig[int(slam_t * sr):int(slam_t * sr) + sr] += 0.5 * rng.standard_normal(sr)
        path = str(root / f"clip_{i}.wav")
        wavfile.write(path, sr, sig.astype(np.float32))
        items.append(LabeledAudio(
            path, np.array([knock_t, slam_t]), np.array([knock_t + 1.0, slam_t + 1.0]),
            f"clip_{i}", np.array([0, 1])))
    return items


def test_spectrogram_pipeline_multiclass(two_class_corpus, tmp_path):
    """preprocess -> packed dataset -> fused train step, with class columns
    that differ (the capability the class-blind reference pipeline cannot
    express)."""
    import pickle

    from sed_tpu.data.preprocess import preprocess_data
    from sed_tpu.data.spectrogram_dataset import SpectrogramDataset
    from sed_tpu.data.device_pipeline import (
        make_spectrogram_train_step,
        spectrogram_buffers_from_dataset,
    )
    from sed_tpu.train.optim import make_optimizer
    from sed_tpu.train.state import init_state

    features_dir = str(tmp_path / "features")
    mean_std = str(tmp_path / "mean_std.pkl")
    preprocess_data(two_class_corpus, features_dir, mean_std,
                    preprocess_mode="logMel", cfg=SCFG, plot_sample=False)

    # Pickles carry per-event class identity.
    import os
    with open(os.path.join(features_dir, sorted(os.listdir(features_dir))[0]), "rb") as f:
        d = pickle.load(f)
    np.testing.assert_array_equal(d["class_indices"], [0, 1])

    ds = SpectrogramDataset(features_dir, mean_std, val_descriptor="clip_4",
                            preprocessed_mode="logMel", cfg=SCFG, seed=0)
    em = ds.train_event_matrix
    assert em.shape[1] == 2
    # THE round-4 assertion: the class columns are NOT the same signal.
    assert not np.array_equal(em[:, 0], em[:, 1])
    assert em[:, 0].sum() > 0 and em[:, 1].sum() > 0
    # ... and they are disjoint here (events never overlap in this corpus).
    assert (em[:, 0] * em[:, 1]).sum() == 0
    # Validation matrices carry class identity too.
    vem = ds.val_event_matrix_list[0]
    assert not np.array_equal(vem[:, 0], vem[:, 1])

    model = CnnAvgPooling(classes_num=2, model_config=((8, 2), (16, 2)))
    tx = make_optimizer(1e-3)
    buffers = spectrogram_buffers_from_dataset(ds)
    state = init_state(model, jax.random.key(0),
                       jnp.zeros((4, SCFG.train_crop_size, SCFG.mel_bins, 1)), tx)
    step = make_spectrogram_train_step(model, tx, SCFG, 5.0, "logMel")
    starts = jnp.asarray(ds.train_start_indices[:4])
    state, loss = step(state, buffers, starts, jax.random.key(1))
    assert np.isfinite(float(loss))


def test_waveform_pipeline_multiclass(two_class_corpus, tmp_path):
    """WaveformDataset with 2-class labels -> M5 fused step (augmented) ->
    evaluate(): per-class start-index labels, (B, 2) loss, (frames, 2) eval."""
    from sed_tpu.configs import WaveformConfig
    from sed_tpu.data.device_pipeline import (
        make_waveform_train_step,
        waveform_buffers_from_dataset,
    )
    from sed_tpu.data.waveform_dataset import WaveformDataset
    from sed_tpu.train.loop import evaluate
    from sed_tpu.train.optim import make_optimizer
    from sed_tpu.train.state import init_state

    wcfg = WaveformConfig(working_sample_rate=8000, time_margin=0.33,
                          tau_sed_labels=("knock", "doorslam"))
    ds = WaveformDataset(two_class_corpus, val_descriptor="clip_4", cfg=wcfg, seed=0)
    labels = ds.all_start_indices_labels
    assert labels.shape == (ds.long_waveform.shape[1], 2)
    assert not np.array_equal(labels[:, 0], labels[:, 1])
    assert labels[:, 0].any() and labels[:, 1].any()
    # Crop label is the per-class vector at its start index.
    w, lab = ds.get_item(0)
    assert lab.shape == (2,)
    # Validation frame labels are per-class as well.
    vframes, vlabels, _ = next(ds.get_validation_sampler())
    assert vlabels.shape == (vframes.shape[0], 2)

    model = M5(classes_num=2)
    tx = make_optimizer(1e-3)
    buffers = waveform_buffers_from_dataset(ds)
    state = init_state(model, jax.random.key(0),
                       jnp.zeros((4, wcfg.frame_size, 1)), tx)
    step = make_waveform_train_step(model, tx, wcfg, 5.0, augment=True)
    starts = jnp.asarray(ds.possible_start_indices[:4])
    state, loss = step(state, buffers, starts, jax.random.key(1))
    assert np.isfinite(float(loss))

    losses, _, _, aps, _ = evaluate(
        model, state, ds, "waveform", 5.0, str(tmp_path / "out"), 0,
        make_plots=False, cfg=wcfg)
    assert len(losses) == 1 and np.isfinite(losses[0]) and np.isfinite(aps[0])


def test_waveform_multiclass_requires_class_identity(two_class_corpus):
    """classes_num > 1 with plain 4-tuples (no class identity) must fail
    loudly instead of training identical class columns."""
    from sed_tpu.configs import WaveformConfig
    from sed_tpu.data.waveform_dataset import WaveformDataset

    wcfg = WaveformConfig(working_sample_rate=8000, time_margin=0.33,
                          tau_sed_labels=("knock", "doorslam"))
    plain = [tuple(item) for item in two_class_corpus]
    with pytest.raises(ValueError, match="class identity"):
        WaveformDataset(plain, val_descriptor=0.2, cfg=wcfg, seed=0)
