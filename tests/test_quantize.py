"""int8 PTQ serving path: structure + fidelity vs the float forward."""

import numpy as np
import jax
import jax.numpy as jnp

from sed_tpu.configs import SpectrogramConfig
from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
from sed_tpu.models.quantize import (
    quantize_cnn,
    quantized_cnn_forward,
    quantized_scores,
)

CFG = SpectrogramConfig()


def _trained_ish_model(seed=0):
    """Init + a few nudges so BN running stats are not the (0, 1) init."""
    model = CnnAvgPooling(classes_num=CFG.classes_num,
                          model_config=TRAIN_CHANNEL_AND_POOL)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((8, CFG.train_crop_size, CFG.mel_bins, 1)),
                    jnp.float32)
    variables = model.init(jax.random.key(seed), x, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    # run two train-mode passes to move the running stats off their init
    for _ in range(2):
        _, upd = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=True, mutable=["batch_stats"])
        batch_stats = upd["batch_stats"]
    return model, params, batch_stats, x


def test_quantized_forward_matches_float_closely():
    model, params, batch_stats, x = _trained_ish_model()
    q = quantize_cnn(model, params, batch_stats, [np.asarray(x)])
    ref = np.asarray(jax.nn.sigmoid(model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False)))
    got = np.asarray(quantized_scores(q, x))
    assert got.shape == ref.shape
    # lossy serving mode: sigmoid confidences within a few percent
    assert np.max(np.abs(got - ref)) < 0.05, np.max(np.abs(got - ref))
    # and strongly correlated overall
    c = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert c > 0.999, c


def test_quantized_weights_are_int8():
    model, params, batch_stats, x = _trained_ish_model(1)
    q = quantize_cnn(model, params, batch_stats, [np.asarray(x)])
    for layer in q["layers"]:
        for conv in layer["convs"]:
            assert conv["qweight"].dtype == jnp.int8
            assert conv["w_scale"].shape == (conv["qweight"].shape[-1],)
    assert q["dense"]["qweight"].dtype == jnp.int8


def test_quantized_m5_matches_float_closely():
    from sed_tpu.configs import WaveformConfig
    from sed_tpu.models.m5 import M5
    from sed_tpu.models.quantize import quantize_m5, quantized_m5_forward

    wcfg = WaveformConfig()
    model = M5(classes_num=wcfg.classes_num)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, wcfg.frame_size, 1)) * 0.1,
                    jnp.float32)
    variables = model.init(jax.random.key(3), x, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    for _ in range(2):
        _, upd = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=True, mutable=["batch_stats"])
        batch_stats = upd["batch_stats"]

    q = quantize_m5(model, params, batch_stats, [np.asarray(x)])
    ref = np.asarray(jax.nn.sigmoid(model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False)))
    got = np.asarray(jax.nn.sigmoid(quantized_m5_forward(q, x)))
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 0.05, np.max(np.abs(got - ref))

    # A loud transient must not clip: the dense-head scale is calibrated on
    # the PRE-mean per-timestep activations (regression for the post-mean
    # calibration bug).
    x_spike = np.asarray(x).copy()
    x_spike[:, 1000:1100, 0] += 0.9
    xs = jnp.asarray(x_spike)
    q2 = quantize_m5(model, params, batch_stats, [x_spike])
    ref2 = np.asarray(jax.nn.sigmoid(model.apply(
        {"params": params, "batch_stats": batch_stats}, xs, train=False)))
    got2 = np.asarray(jax.nn.sigmoid(quantized_m5_forward(q2, xs)))
    assert np.max(np.abs(got2 - ref2)) < 0.05, np.max(np.abs(got2 - ref2))


def test_quantized_mobilenet_matches_float_closely():
    from sed_tpu.models.cnn import MobileNetV1
    from sed_tpu.models.quantize import (
        quantize_mobilenet,
        quantized_mobilenet_forward,
    )

    model = MobileNetV1(classes_num=CFG.classes_num)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 32, CFG.mel_bins, 1)), jnp.float32)
    variables = model.init(jax.random.key(4), x, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    for _ in range(2):
        _, upd = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=True, mutable=["batch_stats"])
        batch_stats = upd["batch_stats"]

    q = quantize_mobilenet(model, params, batch_stats, [np.asarray(x)])
    # reference forward already emits sigmoid confidences + x8 interpolation
    ref = np.asarray(model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False))
    got = np.asarray(quantized_mobilenet_forward(q, x))
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 0.05, np.max(np.abs(got - ref))


def test_quantized_scorer_export_roundtrip():
    from sed_tpu.export import export_quantized_scorer, load_scorer

    model, params, batch_stats, x = _trained_ish_model(6)
    q = quantize_cnn(model, params, batch_stats, [np.asarray(x)])
    blob = export_quantized_scorer(q, batch=x.shape[0], frames=x.shape[1],
                                   cfg=CFG)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0
    scorer = load_scorer(blob)
    direct = np.asarray(quantized_scores(q, x))
    via_export = scorer(np.asarray(x))
    # The exported artifact may fuse/round slightly differently than the
    # in-process jit; closeness within the PTQ fidelity bound is the contract.
    np.testing.assert_allclose(via_export, direct, atol=5e-3)


def test_quantized_forward_jits_and_is_deterministic():
    model, params, batch_stats, x = _trained_ish_model(2)
    q = quantize_cnn(model, params, batch_stats, [np.asarray(x)])
    f = jax.jit(lambda inp: quantized_cnn_forward(q, inp))  # close over qparams
    a = np.asarray(f(x))
    b = np.asarray(f(x))
    np.testing.assert_array_equal(a, b)


def test_quantized_m5_s2d_stem_bit_exact():
    """conv1_impl='s2d' must be BIT-identical to the direct int8 stem:
    integer accumulation is order-independent and the scattered weight
    entries are int8 zeros (models/m5.py s2d_conv1_kernel)."""
    from sed_tpu.configs import WaveformConfig
    from sed_tpu.models.m5 import M5
    from sed_tpu.models.quantize import quantize_m5, quantized_m5_forward

    wcfg = WaveformConfig()
    model = M5(classes_num=wcfg.classes_num)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((3, wcfg.frame_size, 1)) * 0.1,
                    jnp.float32)
    variables = model.init(jax.random.key(9), x, train=False)
    q = quantize_m5(model, variables["params"], variables["batch_stats"],
                    [np.asarray(x)])
    direct = np.asarray(quantized_m5_forward(q, x))
    s2d = np.asarray(quantized_m5_forward(q, x, conv1_impl="s2d"))
    assert np.array_equal(direct, s2d)
