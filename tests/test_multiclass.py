"""Multi-class configuration: the full 11-label (and 3-label) TAU lists kept
commented in the reference config (common_config.py:11-13) must work end to
end: event matrices, models, loss, metrics."""

import numpy as np
import jax
import jax.numpy as jnp

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
    # Reference paints all class columns (spectograms_dataset.py:217) — parity.
    assert (em[3:7] == 1).all() and (em[7] == 0).all()


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
