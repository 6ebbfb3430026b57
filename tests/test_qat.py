"""QAT fine-tuning: STE semantics, serving-export equivalence, fidelity gain."""

import numpy as np
import jax
import jax.numpy as jnp

from sed_tpu.configs import SpectrogramConfig
from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
from sed_tpu.models.qat import (
    qat_cnn_forward,
    qat_export,
    qat_finetune,
    qat_init,
    ste_fake_quant,
)
from sed_tpu.models.quantize import quantize_cnn, quantized_scores

CFG = SpectrogramConfig()

# Small stack for the fine-tune tests (fast on the CPU test platform); the
# QAT code is config-generic, same as quantize_cnn.
SMALL_CONFIG = ((8, 2), (16, 2), (32, 1))


def _trained_ish_model(seed=0, model_config=TRAIN_CHANNEL_AND_POOL, batch=8):
    model = CnnAvgPooling(classes_num=CFG.classes_num, model_config=model_config)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((batch, CFG.train_crop_size, CFG.mel_bins, 1)),
                    jnp.float32)
    variables = model.init(jax.random.key(seed), x, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    for _ in range(2):
        _, upd = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=True, mutable=["batch_stats"])
        batch_stats = upd["batch_stats"]
    return model, params, batch_stats, x


def test_ste_fake_quant_forward_and_gradient():
    scale = jnp.float32(0.5)
    x = jnp.asarray([0.1, 0.26, -0.3, 70.0, -70.0, 63.49], jnp.float32)
    y = ste_fake_quant(x, scale)
    # forward = dequantized int8 lattice, clipped at +-127*scale = +-63.5
    np.testing.assert_allclose(
        np.asarray(y), [0.0, 0.5, -0.5, 63.5, -63.5, 63.5], atol=1e-6)
    # gradient: identity inside the clip range, zero outside
    g = jax.grad(lambda v: ste_fake_quant(v, scale).sum())(x)
    np.testing.assert_allclose(np.asarray(g), [1, 1, 1, 0, 0, 1], atol=1e-6)


def test_qat_forward_matches_int8_serving_forward():
    """The fake-quant forward must mirror quantized_cnn_forward: same lattice
    values, so sigmoid scores agree to float-accumulation noise."""
    model, params, batch_stats, x = _trained_ish_model(0)
    trainable, static = qat_init(model, params, batch_stats, [np.asarray(x)])
    fq_scores = np.asarray(jax.nn.sigmoid(qat_cnn_forward(trainable, static, x)))
    int8_scores = np.asarray(quantized_scores(qat_export(trainable, static), x))
    assert fq_scores.shape == int8_scores.shape
    np.testing.assert_allclose(fq_scores, int8_scores, atol=2e-3)


def test_qat_export_without_finetune_equals_ptq():
    """qat_init + qat_export with untouched weights is exactly PTQ."""
    model, params, batch_stats, x = _trained_ish_model(1)
    q_ptq = quantize_cnn(model, params, batch_stats, [np.asarray(x)])
    trainable, static = qat_init(model, params, batch_stats, [np.asarray(x)])
    q_qat = qat_export(trainable, static)
    a = np.asarray(quantized_scores(q_ptq, x))
    b = np.asarray(quantized_scores(q_qat, x))
    np.testing.assert_array_equal(a, b)


def test_qat_distill_finetune_improves_int8_fidelity():
    model, params, batch_stats, x = _trained_ish_model(
        2, model_config=SMALL_CONFIG, batch=8)

    def float_logits(inp):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           inp, train=False)

    rng = np.random.default_rng(5)
    xs = [x, jnp.asarray(rng.standard_normal(x.shape), jnp.float32)]
    examples = [(np.asarray(xi), np.asarray(float_logits(xi))) for xi in xs]

    trainable, static = qat_init(model, params, batch_stats,
                                 [np.asarray(xi) for xi in xs])

    def max_dev(tr):
        dev = 0.0
        for xi in xs:
            ref = jax.nn.sigmoid(float_logits(xi))
            got = quantized_scores(qat_export(tr, static), xi)
            dev = max(dev, float(jnp.max(jnp.abs(got - ref))))
        return dev

    dev_before = max_dev(trainable)  # == PTQ fidelity (see test above)
    tuned = qat_finetune(trainable, static, examples,
                         mode="distill", steps=60, lr=1e-4)
    dev_after = max_dev(tuned)
    assert dev_before > 1e-5, "PTQ already exact; test cannot discriminate"
    assert dev_after < dev_before, (dev_before, dev_after)


def test_qat_bce_finetune_runs_and_reduces_loss():
    from sed_tpu.train.loss import weighted_bce_with_logits

    model, params, batch_stats, x = _trained_ish_model(
        3, model_config=SMALL_CONFIG, batch=4)
    rng = np.random.default_rng(9)
    y = (rng.random((x.shape[0], x.shape[1], CFG.classes_num)) < 0.3).astype(
        np.float32)
    trainable, static = qat_init(model, params, batch_stats, [np.asarray(x)])

    def loss(tr):
        return float(weighted_bce_with_logits(
            qat_cnn_forward(tr, static, x), jnp.asarray(y)))

    before = loss(trainable)
    tuned = qat_finetune(trainable, static, [(np.asarray(x), y)],
                         mode="bce", steps=40, lr=3e-4)
    assert loss(tuned) < before
