"""Model shape/parameter-count contracts vs the reference architectures.

Shape walkthroughs follow the reference's ``model_description`` math
(models/spectogram_models.py:207-230); parameter counts were derived by hand
from the torch layer definitions (convs without bias + BN affine pairs + FC).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sed_tpu.models.cnn import (
    DEFAULT_CHANNEL_AND_POOL,
    TRAIN_CHANNEL_AND_POOL,
    CnnAvgPooling,
    MobileNetV1,
    num_pools,
)
from sed_tpu.models.layers import interpolate
from sed_tpu.models.m5 import M5


def count_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def test_num_pools_matches_reference_counter():
    # Reference counter yields 3 for both shipped configs
    # (spectogram_models.py:166-172 with main.py:35 and the default).
    assert num_pools(TRAIN_CHANNEL_AND_POOL) == 3
    assert num_pools(DEFAULT_CHANNEL_AND_POOL) == 3
    # The reference's constant-1 first term is reproduced even when the first
    # stage does not pool.
    assert num_pools(((32, 1), (64, 2))) == 2


def test_interpolate_repeats_frames():
    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
    y = interpolate(x, 4)
    assert y.shape == (1, 12, 2)
    np.testing.assert_array_equal(np.asarray(y[0, :4, 0]), [0, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(y[0, 4:8, 1]), [3, 3, 3, 3])


def test_cnn_avg_pooling_shapes_train_config():
    model = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL)
    x = jnp.zeros((2, 30, 64, 1))  # (batch, frames, mel, channels)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    # 30 frames -> 15 -> 7 -> 3 (floor pooling) -> interpolate x8 -> 24.
    assert out.shape == (2, 24, 1)


def test_cnn_avg_pooling_full_recording_shape():
    # 60 s clip: 182 frames -> 91 -> 45 -> 22 -> x8 -> 176 output frames.
    model = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL)
    x = jnp.zeros((1, 182, 64, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 176, 1)


def test_cnn_avg_pooling_param_count_matches_torch():
    # Hand-derived torch parameter count for main.py:35's config
    # [(32,2),(64,2),(128,2),(128,1)] with classes_num=1: 582,433.
    model = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 30, 64, 1)), train=False)
    assert count_params(variables["params"]) == 582433


def test_cnn_train_mode_updates_batch_stats():
    model = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL)
    x = jax.random.normal(jax.random.key(1), (4, 30, 64, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    out, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (4, 24, 1)
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_m5_shapes_and_param_count():
    model = M5(classes_num=1)
    x = jnp.zeros((2, 31680, 1))  # (batch, samples, channels)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 1)
    # Hand-derived torch count for M5(1): 426,369.
    assert count_params(variables["params"]) == 426369


@pytest.mark.slow
def test_mobilenet_shapes():
    model = MobileNetV1(classes_num=1)
    x = jnp.zeros((1, 32, 64, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    # 32 frames -> /8 via three stride-2 stages -> 4 -> interpolate x8 -> 32.
    assert out.shape == (1, 32, 1)
    # Forward emits sigmoid confidences (spectogram_models.py:117).
    assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)
    # Parameter-count parity with the torch reference (measured by
    # benchmarks/mobilenet_parity.py: torch 3,988,353 including the dead,
    # never-used bn0 BatchNorm2d(64) = 128 params we deliberately do not
    # instantiate — spectogram_models.py:46; MOBILENET_PARITY.json).
    assert count_params(variables["params"]) == 3988225 == 3988353 - 128


def test_mobilenet_logits_emit_matches_scores():
    """emit='logits' must be the sigmoid-free view of the SAME network: the
    param tree is unchanged and sigmoid(interpolate(logits)) equals the
    reference-parity scores forward exactly (interpolate is frame repetition,
    which commutes with the elementwise sigmoid)."""
    import jax.nn

    scores_model = MobileNetV1(classes_num=2)
    logits_model = MobileNetV1(classes_num=2, emit="logits")
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 30, 64, 1)),
                    dtype=jnp.float32)
    variables = scores_model.init(jax.random.key(1), x, train=False)
    # Identical parameter trees (sigmoid is parameter-free) — a checkpoint
    # trained with emit='logits' loads into the default module unchanged.
    logits_vars = logits_model.init(jax.random.key(1), x, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(logits_vars)
    scores = scores_model.apply(variables, x, train=False)
    logits = logits_model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(jax.nn.sigmoid(logits)),
                                  np.asarray(scores))


@pytest.mark.slow
def test_mobilenet_torch_init_forward_parity():
    """C16 numerical oracle: the reference torch MobileNetV1's state_dict
    copied into the flax tree must produce (near-)identical sigmoid scores —
    same harness as benchmarks/mobilenet_parity.py (committed full result:
    MOBILENET_PARITY.json, 1.79e-07)."""
    import importlib.util
    import os

    import torch

    torch.set_num_threads(1)  # deterministic CPU reductions
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "mobilenet_parity", os.path.join(repo, "benchmarks", "mobilenet_parity.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    result = mod.run(frames=64, batch=1, log=lambda *a: None)
    assert result["init_forward_max_score_diff"] < 1e-5
    assert result["int8_vs_f32_max_score_diff"] < 0.05


def test_kaiming_uniform_bound():
    # torch kaiming_uniform_(nonlinearity='leaky_relu', a=0): bound sqrt(6/fan_in).
    model = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 30, 64, 1)), train=False)
    k = variables["params"]["ConvBlock_1"]["Conv_0"]["kernel"]  # (3,3,32,64)
    fan_in = 3 * 3 * 32
    bound = np.sqrt(6.0 / fan_in)
    kk = np.asarray(k)
    assert kk.min() >= -bound and kk.max() <= bound
    assert kk.max() > 0.8 * bound  # actually fills the range


def test_bf16_fast_mode():
    """Opt-in bf16 compute: params stay f32, logits come back f32 and close
    to the f32 model's output; a train step stays finite."""
    import jax

    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
    from sed_tpu.models.m5 import M5
    from sed_tpu.train.optim import make_optimizer
    from sed_tpu.train.state import init_state, make_train_step

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 30, 64, 1)).astype(np.float32))

    f32 = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL)
    bf16 = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL,
                         dtype=jnp.bfloat16)
    v = f32.init(jax.random.key(0), x, train=False)
    # Same param tree/dtypes: the bf16 model runs with the f32 params.
    vb = bf16.init(jax.random.key(0), x, train=False)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(vb["params"]))
    out32 = f32.apply(v, x, train=False)
    out16 = bf16.apply(v, x, train=False)
    assert out16.dtype == jnp.float32
    assert np.abs(np.asarray(out16) - np.asarray(out32)).max() < 0.15

    tx = make_optimizer(1e-3)
    state = init_state(bf16, jax.random.key(0), x, tx)
    step = make_train_step(bf16, tx)
    y = jnp.asarray((rng.random((2, 30, 1)) > 0.8).astype(np.float32))
    state, loss = step(state, x, y)
    assert np.isfinite(float(loss))

    m5_16 = M5(classes_num=1, dtype=jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((2, 31680, 1)).astype(np.float32))
    vm = m5_16.init(jax.random.key(0), w, train=False)
    out = m5_16.apply(vm, w, train=False)
    assert out.dtype == jnp.float32 and np.isfinite(np.asarray(out)).all()


def test_s2d_conv1_matches_direct_conv():
    """Space-to-depth stem == lax direct conv to f32 rounding, across
    geometries (incl. n_out not a multiple of the phase count)."""
    from sed_tpu.models.m5 import s2d_conv1

    rng = np.random.default_rng(11)
    for n in (31680, 1024, 1000, 517):
        x = jnp.asarray(rng.standard_normal((3, n, 1)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((79, 1, 64)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal(64) * 0.01, jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, w, (4,), [(39, 39)],
            dimension_numbers=("NWC", "WIO", "NWC")) + b
        got = s2d_conv1(x, w, b)
        assert got.shape == ref.shape, (n, got.shape, ref.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


def test_m5_s2d_same_params_same_logits():
    """M5(conv1_s2d=True) loads the identical param tree and scores within
    f32 reassociation noise of the direct stem, eval and train modes."""
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((2, 31680, 1)) * 0.1, jnp.float32)
    direct = M5(classes_num=1, conv1_s2d=False)
    s2d = M5(classes_num=1, conv1_s2d=True)
    v = direct.init(jax.random.key(5), x, train=False)
    # Identical tree: the s2d model runs with the direct model's variables.
    v2 = s2d.init(jax.random.key(5), x, train=False)
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    out_d = np.asarray(direct.apply(v, x, train=False))
    out_s = np.asarray(s2d.apply(v, x, train=False))
    np.testing.assert_allclose(out_s, out_d, atol=1e-3)

    (od, upd_d) = direct.apply(v, x, train=True, mutable=["batch_stats"])
    (os_, upd_s) = s2d.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(os_), np.asarray(od), atol=1e-3)
    for a, b in zip(jax.tree.leaves(upd_d), jax.tree.leaves(upd_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_m5_s2d_default_is_dtype_aware():
    """Default stem policy (hardware A/B, M5_S2D_BENCH.json): f32 -> s2d
    (1.55x), bf16 -> direct (s2d unity-within-spread there)."""
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((1, 31680, 1)) * 0.1, jnp.float32)
    v = M5(classes_num=1).init(jax.random.key(3), x, train=False)

    def run(m):
        return np.asarray(m.apply(v, x, train=False))

    # f32 default == explicit s2d, != explicit direct (bitwise: same program)
    assert np.array_equal(run(M5(classes_num=1)),
                          run(M5(classes_num=1, conv1_s2d=True)))
    # bf16 default == explicit direct
    assert np.array_equal(run(M5(classes_num=1, dtype=jnp.bfloat16)),
                          run(M5(classes_num=1, dtype=jnp.bfloat16,
                                 conv1_s2d=False)))
