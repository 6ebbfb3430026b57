"""Data pipeline integration tests on synthetic audio.

Covers: offline preprocessing (pickle format parity), packed dataset loading,
start-index classification, balance_classes, transforms (logMel and the
Complex normalize-then-logmel quirk), validation sampler, and the fused
device-resident train steps for both feature domains.
"""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.io import wavfile

from sed_tpu.configs import SpectrogramConfig, WaveformConfig
from sed_tpu.data.device_pipeline import (
    make_spectrogram_train_step,
    make_waveform_train_step,
    spectrogram_buffers_from_dataset,
    waveform_buffers_from_dataset,
)
from sed_tpu.data.preprocess import preprocess_data
from sed_tpu.data.spectrogram_dataset import SpectrogramDataset, classify_start_indices
from sed_tpu.data.waveform_dataset import WaveformDataset
from sed_tpu.models.cnn import CnnAvgPooling
from sed_tpu.models.m5 import M5
from sed_tpu.train.optim import make_optimizer
from sed_tpu.train.state import init_state

# Small config: 8 kHz, frame 5280, hop 2640, fps 3, NFFT 8192.
CFG = SpectrogramConfig(working_sample_rate=8000, time_margin=0.33)
WCFG = WaveformConfig(working_sample_rate=8000, time_margin=0.33)


@pytest.fixture(scope="module")
def synthetic_corpus(tmp_path_factory):
    """Six 15 s synthetic wavs with one event each + label tuples."""
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    items = []
    for i in range(6):
        dur, sr = 15.0, CFG.working_sample_rate
        n = int(dur * sr)
        sig = 0.01 * rng.standard_normal(n)
        start = 4.0 + i * 0.5
        end = start + 1.0
        t = np.arange(int(sr * (end - start))) / sr
        sig[int(start * sr):int(start * sr) + len(t)] += 0.5 * np.sin(2 * np.pi * 800 * t)
        path = str(root / f"clip_{i}.wav")
        wavfile.write(path, sr, sig.astype(np.float32))
        items.append((path, np.array([start]), np.array([end]), f"clip_{i}"))
    return items


@pytest.fixture(scope="module")
def preprocessed_logmel(synthetic_corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("features")
    features_dir = str(out / "logMel-features")
    mean_std = str(out / "mean_std.pkl")
    preprocess_data(synthetic_corpus, features_dir, mean_std,
                    preprocess_mode="logMel", cfg=CFG, plot_sample=False)
    return features_dir, mean_std


@pytest.fixture(scope="module")
def preprocessed_complex(synthetic_corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("features_cx")
    features_dir = str(out / "Complex-features")
    mean_std = str(out / "mean_std.pkl")
    preprocess_data(synthetic_corpus, features_dir, mean_std,
                    preprocess_mode="Complex", cfg=CFG, plot_sample=False)
    return features_dir, mean_std


def test_preprocess_pickle_format(preprocessed_logmel):
    features_dir, mean_std = preprocessed_logmel
    files = sorted(os.listdir(features_dir))
    assert len(files) == 6
    with open(os.path.join(features_dir, files[0]), "rb") as f:
        d = pickle.load(f)
    # Superset of the reference pickle keys (preprocess.py:74-76):
    # class_indices carries per-event class identity (None for plain tuples).
    assert set(d) == {"features", "start_times", "end_times", "class_indices"}
    assert d["class_indices"] is None  # synthetic_corpus uses plain 4-tuples
    # (channels, frames, mel): 15 s * 3 fps + 1 = 46 frames.
    assert d["features"].shape == (1, 46, CFG.mel_bins)
    assert d["features"].dtype == np.float32
    with open(mean_std, "rb") as f:
        stats = pickle.load(f)
    assert stats["mean"].shape == (CFG.mel_bins,)
    assert stats["std"].shape == (CFG.mel_bins,)


def test_preprocess_pipelined_workers_identical(synthetic_corpus,
                                                preprocessed_logmel,
                                                tmp_path):
    """workers>0 (native-threaded acquisition pipelined ahead of the
    featurizer) produces byte-identical pickles and mean/std to the
    sequential path."""
    seq_dir, seq_ms = preprocessed_logmel
    features_dir = str(tmp_path / "logMel-features")
    mean_std = str(tmp_path / "mean_std.pkl")
    preprocess_data(synthetic_corpus, features_dir, mean_std,
                    preprocess_mode="logMel", cfg=CFG, plot_sample=False,
                    workers=3)
    files = sorted(os.listdir(features_dir))
    assert files == sorted(os.listdir(seq_dir))
    for name in files:
        with open(os.path.join(features_dir, name), "rb") as f:
            a = f.read()
        with open(os.path.join(seq_dir, name), "rb") as f:
            b = f.read()
        assert a == b, f"pipelined pickle differs: {name}"
    with open(mean_std, "rb") as f:
        a = pickle.load(f)
    with open(seq_ms, "rb") as f:
        b = pickle.load(f)
    np.testing.assert_array_equal(a["mean"], b["mean"])
    np.testing.assert_array_equal(a["std"], b["std"])


def test_waveform_dataset_workers_identical(synthetic_corpus):
    """WaveformDataset(workers=3) builds the same packed buffers, labels,
    and val sets as the sequential loader."""
    a = WaveformDataset(synthetic_corpus, val_descriptor="clip_5",
                        cfg=WCFG, seed=0)
    b = WaveformDataset(synthetic_corpus, val_descriptor="clip_5",
                        cfg=WCFG, seed=0, workers=3)
    np.testing.assert_array_equal(a.long_waveform, b.long_waveform)
    np.testing.assert_array_equal(a.all_start_indices_labels,
                                  b.all_start_indices_labels)
    np.testing.assert_array_equal(a.possible_start_indices,
                                  b.possible_start_indices)
    assert a.val_file_names == b.val_file_names
    for x, y in zip(a.val_samples_sets, b.val_samples_sets):
        np.testing.assert_array_equal(x, y)
    for x, y in zip(a.val_label_sets, b.val_label_sets):
        np.testing.assert_array_equal(x, y)


def test_spectrogram_dataset_logmel(preprocessed_logmel):
    features_dir, mean_std = preprocessed_logmel
    ds = SpectrogramDataset(features_dir, mean_std, val_descriptor="clip_5",
                            preprocessed_mode="logMel", cfg=CFG, seed=0)
    # 5 train files x (46 - 30) legal starts each.
    assert len(ds) == 5 * (46 - CFG.train_crop_size)
    assert ds.train_features.shape == (1, 5 * 46, CFG.mel_bins)
    assert ds.train_event_matrix.shape == (5 * 46, CFG.classes_num)
    # Crop fetch: normalized crop + events.
    x, e = ds.get_item(0)
    assert x.shape == (1, CFG.train_crop_size, CFG.mel_bins)
    assert e.shape == (CFG.train_crop_size, CFG.classes_num)
    # Normalization is (x - mean) / std of the packed features.
    s = ds.train_start_indices[0]
    manual = (ds.train_features[:, s:s + 30] - ds.mean) / ds.std
    np.testing.assert_allclose(x, manual, rtol=1e-6)
    # Validation sampler: whole recording with batch dim.
    items = list(ds.get_validation_sampler())
    assert len(items) == 1
    feat, event, name = items[0]
    assert feat.shape == (1, 1, 46, CFG.mel_bins)
    assert event.shape == (1, 46, CFG.classes_num)
    assert name.startswith("clip_5")


def test_balance_classes_reduces_empty(preprocessed_logmel):
    features_dir, mean_std = preprocessed_logmel
    ds_all = SpectrogramDataset(features_dir, mean_std, val_descriptor="clip_5",
                                preprocessed_mode="logMel", cfg=CFG, seed=0)
    ds_bal = SpectrogramDataset(features_dir, mean_std, val_descriptor="clip_5",
                                balance_classes=True, preprocessed_mode="logMel",
                                cfg=CFG, seed=0)
    assert len(ds_bal) <= len(ds_all)
    assert len(ds_bal) % 2 == 0  # equal event/empty halves


def test_classify_start_indices_reference_semantics():
    # Event at frame 35 with crop 30 -> starts [5, 35) marked.
    em = np.zeros((60, 1))
    em[35] = 1
    flags = classify_start_indices(em, num_starts=30, crop_size=30)
    assert flags[5:30].all()
    assert not flags[:5].any()
    # Event at frame 10 (< crop): reference's negative slice marks nothing.
    em2 = np.zeros((60, 1))
    em2[10] = 1
    flags2 = classify_start_indices(em2, num_starts=30, crop_size=30)
    assert not flags2.any()


def test_spectrogram_device_train_step(preprocessed_logmel):
    features_dir, mean_std = preprocessed_logmel
    ds = SpectrogramDataset(features_dir, mean_std, val_descriptor="clip_5",
                            preprocessed_mode="logMel", cfg=CFG, seed=0)
    buffers = spectrogram_buffers_from_dataset(ds)
    model = CnnAvgPooling(classes_num=CFG.classes_num, model_config=((8, 2), (16, 2)))
    tx = make_optimizer(1e-3)
    sample = jnp.zeros((4, CFG.train_crop_size, CFG.mel_bins, 1))
    state = init_state(model, jax.random.key(0), sample, tx)
    step = make_spectrogram_train_step(model, tx, CFG, pos_weight=5.0,
                                       preprocessed_mode="logMel", augment=False)
    rng = jax.random.key(1)
    losses = []
    for starts in ds.epoch_start_indices(batch_size=4):
        rng, k = jax.random.split(rng)
        state, loss = step(state, buffers, jnp.asarray(starts), k)
        losses.append(float(loss))
    assert int(state.step) == len(losses) > 0
    assert np.isfinite(losses).all()


def test_complex_mode_with_augmentation(preprocessed_complex):
    features_dir, mean_std = preprocessed_complex
    ds = SpectrogramDataset(features_dir, mean_std, val_descriptor="clip_5",
                            preprocessed_mode="Complex", augment_data=True,
                            cfg=CFG, seed=0)
    assert np.iscomplexobj(ds.train_features)
    # Host transform: normalize complex then convert to log-mel.
    x, _ = ds.get_item(0)
    assert x.shape == (1, CFG.train_crop_size, CFG.mel_bins)
    assert not np.iscomplexobj(x)

    buffers = spectrogram_buffers_from_dataset(ds)
    assert buffers.features.shape[-1] == 2  # stacked real/imag
    model = CnnAvgPooling(classes_num=CFG.classes_num, model_config=((8, 2), (16, 2)))
    tx = make_optimizer(1e-3)
    sample = jnp.zeros((4, CFG.train_crop_size, CFG.mel_bins, 1))
    state = init_state(model, jax.random.key(0), sample, tx)
    step = make_spectrogram_train_step(model, tx, CFG, pos_weight=5.0,
                                       preprocessed_mode="Complex", augment=True)
    starts = jnp.asarray(ds.train_start_indices[:4])
    state, loss = step(state, buffers, starts, jax.random.key(2))
    assert np.isfinite(float(loss))

    # Device transform matches the host transform on the same crop (no augment).
    step_na = make_spectrogram_train_step(model, tx, CFG, pos_weight=5.0,
                                          preprocessed_mode="Complex", augment=False)
    state2 = init_state(model, jax.random.key(0), sample, tx)
    state2, loss2 = step_na(state2, buffers, starts, jax.random.key(2))
    assert np.isfinite(float(loss2))


def test_waveform_dataset_and_step(synthetic_corpus):
    ds = WaveformDataset(synthetic_corpus, val_descriptor="clip_5", cfg=WCFG, seed=0)
    n_per_file = 15 * WCFG.working_sample_rate - WCFG.frame_size
    assert len(ds) == 5 * n_per_file
    w, label = ds.get_item(0)
    assert w.shape == (1, WCFG.frame_size)
    # Event-positive starts exist (1 s events vs 0.66 s frames -> coverage > 0.74 possible).
    assert ds.all_start_indices_labels.sum() > 0

    frames, labels, name = next(ds.get_validation_sampler(1))
    assert frames.shape[1:] == (1, WCFG.frame_size)
    assert labels.shape == (frames.shape[0],)

    buffers = waveform_buffers_from_dataset(ds)
    model = M5(classes_num=1)
    tx = make_optimizer(1e-3)
    sample = jnp.zeros((4, WCFG.frame_size, 1))
    state = init_state(model, jax.random.key(0), sample, tx)
    step = make_waveform_train_step(model, tx, WCFG, pos_weight=5.0, augment=True)
    starts = jnp.asarray(ds.possible_start_indices[:4])
    state, loss = step(state, buffers, starts, jax.random.key(1))
    assert np.isfinite(float(loss))


def test_device_gather_matches_host_get_item(preprocessed_logmel):
    """The fused device step's gather+normalize must equal the host-side
    reference path (SpectrogramDataset.get_item) for the same start index."""
    features_dir, mean_std = preprocessed_logmel
    ds = SpectrogramDataset(features_dir, mean_std, val_descriptor="clip_5",
                            preprocessed_mode="logMel", cfg=CFG, seed=0)
    buffers = spectrogram_buffers_from_dataset(ds)

    # Re-create the step's internal gather+transform on a known index.
    import jax.numpy as jnp
    from jax import lax

    idx = 7
    s = int(ds.train_start_indices[idx])
    crop = CFG.train_crop_size
    f = lax.dynamic_slice(buffers.features, (0, s, 0),
                          (1, crop, CFG.mel_bins))
    x_dev = np.asarray((f - buffers.mean) / buffers.std)
    x_host, events_host = ds.get_item(idx)
    np.testing.assert_allclose(x_dev, x_host, rtol=1e-5, atol=1e-6)

    e = lax.dynamic_slice(buffers.events, (s, 0), (crop, CFG.classes_num))
    np.testing.assert_allclose(np.asarray(e), events_host, atol=0)


def test_device_complex_transform_matches_host(preprocessed_complex):
    """Complex mode: stacked real/imag device transform == host numpy transform."""
    features_dir, mean_std = preprocessed_complex
    ds = SpectrogramDataset(features_dir, mean_std, val_descriptor="clip_5",
                            preprocessed_mode="Complex", cfg=CFG, seed=0)
    buffers = spectrogram_buffers_from_dataset(ds)

    import jax.numpy as jnp
    from jax import lax

    from sed_tpu.ops.featurizer import power_to_logmel

    idx = 3
    s = int(ds.train_start_indices[idx])
    crop = CFG.train_crop_size
    f = lax.dynamic_slice(buffers.features, (0, s, 0, 0),
                          (1, crop, CFG.freq_bins, 2))
    xn = (f - buffers.mean) / buffers.std[..., None]
    power = jnp.sum(xn * xn, axis=-1)
    x_dev = np.asarray(power_to_logmel(power, CFG))
    x_host, _ = ds.get_item(idx)
    np.testing.assert_allclose(x_dev, x_host, rtol=1e-4, atol=2e-4)


def test_multi_step_matches_sequential(preprocessed_logmel):
    """K scanned steps per dispatch == K sequential steps (same RNG discipline)."""
    from sed_tpu.data.device_pipeline import make_multi_step

    features_dir, mean_std = preprocessed_logmel
    ds = SpectrogramDataset(features_dir, mean_std, val_descriptor="clip_5",
                            preprocessed_mode="logMel", cfg=CFG, seed=0)
    buffers = spectrogram_buffers_from_dataset(ds)
    model = CnnAvgPooling(classes_num=CFG.classes_num, model_config=((8, 2), (16, 2)))
    tx = make_optimizer(1e-3)
    sample = jnp.zeros((4, CFG.train_crop_size, CFG.mel_bins, 1))
    raw_step = make_spectrogram_train_step(model, tx, CFG, 5.0, "logMel",
                                           augment=True, jit=False)
    step = make_spectrogram_train_step(model, tx, CFG, 5.0, "logMel", augment=True)

    k = 4
    starts_block = jnp.asarray(
        np.stack([ds.train_start_indices[i * 4:(i + 1) * 4] for i in range(k)])
    )
    rng = jax.random.key(7)

    # Sequential reference with the same split discipline as make_multi_step.
    state_a = init_state(model, jax.random.key(0), sample, tx)
    r = rng
    seq_losses = []
    for i in range(k):
        r, sr = jax.random.split(r)
        state_a, loss = step(state_a, buffers, starts_block[i], sr)
        seq_losses.append(float(loss))

    state_b = init_state(model, jax.random.key(0), sample, tx)
    multi = make_multi_step(raw_step, k)
    state_b, losses = multi(state_b, buffers, starts_block, rng)

    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-5)
    assert int(state_b.step) == k
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_short_recording_yields_no_starts(tmp_path):
    """Recordings shorter than the crop contribute zero start indices instead
    of crashing (review finding; the reference handled this gracefully)."""
    import pickle

    from sed_tpu.data.spectrogram_dataset import read_train_data_to_memory

    short = {"features": np.zeros((1, 10, CFG.mel_bins), np.float32),
             "start_times": np.array([1.0]), "end_times": np.array([2.0])}
    ok = {"features": np.zeros((1, 40, CFG.mel_bins), np.float32),
          "start_times": np.array([]), "end_times": np.array([])}
    paths = []
    for name, d in [("short.pkl", short), ("ok.pkl", ok)]:
        p = str(tmp_path / name)
        with open(p, "wb") as f:
            pickle.dump(d, f)
        paths.append(p)
    packed = read_train_data_to_memory(paths, CFG.train_crop_size, cfg=CFG)
    assert len(packed.start_indices) == 40 - CFG.train_crop_size
    # Starts must all point into the long (okay) recording's range.
    assert packed.start_indices.min() >= 10


def test_odd_frame_size_coverage_labels():
    """Odd frame_size configs must not crash the frame splitter (width 2*half)."""
    from sed_tpu.configs import WaveformConfig
    from sed_tpu.data.events import frame_coverage_labels

    cfg = WaveformConfig(working_sample_rate=22050, time_margin=0.33)
    assert cfg.frame_size % 2 == 1
    wave = np.zeros((1, 5 * cfg.working_sample_rate), np.float32)
    frames, labels = frame_coverage_labels(wave, [1.0], [2.0], cfg)
    assert frames.shape[2] == 2 * (cfg.frame_size // 2)


def test_val_descriptor_matches_basename_not_path(preprocessed_logmel, tmp_path):
    """Substring val descriptors select by pickle FILENAME; a descriptor
    colliding with a directory component (reference full-path matching defect,
    spectograms_dataset.py:269-276) must not swallow the whole corpus."""
    import shutil

    features_dir, mean_std = preprocessed_logmel
    # Re-home the cache under a directory whose NAME contains the descriptor.
    evil = tmp_path / "corpus_clip_5_cache"
    shutil.copytree(features_dir, evil)
    ds = SpectrogramDataset(str(evil), mean_std, val_descriptor="clip_5",
                            preprocessed_mode="logMel", cfg=CFG, seed=0)
    # Only clip_5 is validation; the other five files train.
    assert len(ds.val_feature_paths) == 1
    assert ds.val_feature_paths[0].endswith("clip_5_logMel_features_and_labels.pkl")
    assert len(ds) == 5 * (46 - CFG.train_crop_size)
