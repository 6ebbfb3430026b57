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
