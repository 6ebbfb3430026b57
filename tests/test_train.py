"""Training-stack tests: loss vs torch oracle, optimizer parity vs torch
Adam(amsgrad=True), train-step learning, checkpoint round-trip."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from sed_tpu.models.cnn import CnnAvgPooling
from sed_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from sed_tpu.train.loss import weighted_bce_with_logits
from sed_tpu.train.optim import make_optimizer, reference_lr_schedule
from sed_tpu.train.state import init_state, make_eval_forward, make_train_step


# ---------------------------------------------------------------------------
# Loss vs torch (the reference's exact criterion, utils/common.py:11-30)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("pos_weight", [1.0, 5.0])
def test_weighted_bce_multi_frame_matches_torch(pos_weight):
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 24, 1)).astype(np.float32)
    targets = (rng.random((4, 30, 1)) > 0.5).astype(np.float32)
    got = float(weighted_bce_with_logits(jnp.asarray(logits), jnp.asarray(targets),
                                         pos_weight=pos_weight, multi_frame=True))
    n = min(logits.shape[1], targets.shape[1])
    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits[:, :n]), torch.from_numpy(targets[:, :n]),
        pos_weight=torch.tensor([pos_weight]))
    np.testing.assert_allclose(got, float(ref), rtol=1e-6)


def test_weighted_bce_single_frame_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((8, 1)).astype(np.float32)
    targets = (rng.random(8) > 0.5).astype(np.float32)
    got = float(weighted_bce_with_logits(jnp.asarray(logits), jnp.asarray(targets),
                                         pos_weight=5.0, multi_frame=False))
    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits).reshape(-1), torch.from_numpy(targets),
        pos_weight=torch.tensor([5.0]))
    np.testing.assert_allclose(got, float(ref), rtol=1e-6)


# ---------------------------------------------------------------------------
# Optimizer parity vs torch Adam(amsgrad=True) + lr decay schedule
# ---------------------------------------------------------------------------

def test_lr_schedule_decays_every_200_steps():
    sched = reference_lr_schedule(1e-6)
    assert sched(0) == 1e-6
    assert sched(199) == 1e-6
    np.testing.assert_allclose(sched(200), 1e-6 * 0.997)
    np.testing.assert_allclose(sched(1000), 1e-6 * 0.997**5)


def test_amsgrad_trajectory_matches_torch():
    """Run 500 identical update steps (crossing a decay boundary at 200) on a
    fixed gradient stream and compare parameter trajectories."""
    rng = np.random.default_rng(2)
    p0 = rng.standard_normal(16).astype(np.float32)
    grads = rng.standard_normal((500, 16)).astype(np.float32)
    base_lr = 1e-3

    # torch side, replicating the reference's per-200-step decay (train.py:108-110).
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([tp], lr=base_lr, betas=(0.9, 0.999), eps=1e-8,
                           weight_decay=0.0, amsgrad=True)
    torch_traj = []
    for i, g in enumerate(grads):
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()
        if (i + 1) % 200 == 0:
            for group in opt.param_groups:
                group["lr"] *= 0.997
        torch_traj.append(tp.detach().numpy().copy())

    # optax side.
    tx = make_optimizer(base_lr)
    params = jnp.asarray(p0)
    opt_state = tx.init(params)
    jax_traj = []
    import optax

    for g in grads:
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
        params = optax.apply_updates(params, updates)
        jax_traj.append(np.asarray(params))

    np.testing.assert_allclose(np.stack(jax_traj), np.stack(torch_traj),
                               rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# End-to-end train step: loss decreases, checkpoint round-trips
# ---------------------------------------------------------------------------

def _tiny_setup():
    model = CnnAvgPooling(classes_num=1, model_config=((8, 2), (16, 2)))
    tx = make_optimizer(1e-3)
    x = jax.random.normal(jax.random.key(0), (8, 16, 64, 1))
    # Learnable signal: label = 1 when the mean energy is positive.
    y = (np.asarray(x).mean(axis=(1, 2, 3), keepdims=True) > 0).astype(np.float32)
    y = np.repeat(y.reshape(8, 1, 1), 16, axis=1)
    state = init_state(model, jax.random.key(1), x, tx)
    step = make_train_step(model, tx, pos_weight=1.0, multi_frame=True)
    return model, tx, state, step, x, jnp.asarray(y)


def test_train_step_decreases_loss():
    model, tx, state, step, x, y = _tiny_setup()
    losses = []
    for _ in range(60):
        state, loss = step(state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9
    assert int(state.step) == 60


def test_checkpoint_roundtrip(tmp_path):
    model, tx, state, step, x, y = _tiny_setup()
    for _ in range(3):
        state, _ = step(state, x, y)
    out = str(tmp_path)
    save_checkpoint(state, out, iteration=3)

    template = init_state(model, jax.random.key(9), x, tx)
    restored = load_checkpoint(f"{out}/checkpoints/iteration_3.ckpt", template)
    assert int(restored.step) == 3
    fwd = make_eval_forward(model)
    a = fwd(state.params, state.batch_stats, x)
    b = fwd(restored.params, restored.batch_stats, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # Model-only load keeps fresh optimizer state/step (main.py:37-39 parity).
    model_only = load_checkpoint(f"{out}/checkpoints/iteration_3.ckpt", template, model_only=True)
    assert int(model_only.step) == 0
    c = fwd(model_only.params, model_only.batch_stats, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-7)


def test_full_resume_matches_continuous_training(tmp_path):
    """Full-state checkpoint resume must reproduce the uninterrupted run
    exactly (params, optimizer moments, step counter, loss trajectory)."""
    model, tx, state, step, x, y = _tiny_setup()

    # Continuous: 10 steps.
    cont = state
    cont_losses = []
    for _ in range(10):
        cont, loss = step(cont, x, y)
        cont_losses.append(float(loss))

    # Interrupted: 5 steps, save, restore into a fresh template, 5 more.
    model2, tx2, state2, step2, x2, y2 = _tiny_setup()
    for _ in range(5):
        state2, _ = step2(state2, x2, y2)
    save_checkpoint(state2, str(tmp_path), iteration=5)
    template = init_state(model2, jax.random.key(42), x2, tx2)
    resumed = load_checkpoint(f"{tmp_path}/checkpoints/iteration_5.ckpt", template)
    resumed_losses = []
    for _ in range(5):
        resumed, loss = step2(resumed, x2, y2)
        resumed_losses.append(float(loss))

    assert int(resumed.step) == 10
    np.testing.assert_allclose(resumed_losses, cont_losses[5:], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(cont.params), jax.tree.leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    for a, b in zip(jax.tree.leaves(cont.opt_state), jax.tree.leaves(resumed.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_orbax_checkpoint_backend(tmp_path):
    """orbax-backend save/load round-trips the full state."""
    model, tx, state, step, x, y = _tiny_setup()
    for _ in range(2):
        state, _ = step(state, x, y)
    path = save_checkpoint(state, str(tmp_path), iteration=2, backend="orbax")
    assert path.endswith(".orbax")

    template = init_state(model, jax.random.key(11), x, tx)
    restored = load_checkpoint(path, template)
    assert int(restored.step) == 2
    fwd = make_eval_forward(model)
    np.testing.assert_allclose(
        np.asarray(fwd(state.params, state.batch_stats, x)),
        np.asarray(fwd(restored.params, restored.batch_stats, x)),
        atol=1e-7,
    )


def test_latest_checkpoint_handles_both_backends(tmp_path):
    from sed_tpu.train.checkpoint import latest_checkpoint

    model, tx, state, step, x, y = _tiny_setup()
    save_checkpoint(state, str(tmp_path), iteration=2)
    save_checkpoint(state, str(tmp_path), iteration=5, backend="orbax")
    latest = latest_checkpoint(str(tmp_path))
    assert latest.endswith("iteration_5.ckpt.orbax")


def test_model_descriptions():
    """Shape walkthrough matches the reference format (spectogram_models.py:207-230)."""
    import jax

    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
    from sed_tpu.models.describe import describe_cnn, describe_m5

    model = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 30, 64, 1)), train=False)
    text = describe_cnn(model, variables["params"])
    assert "Input: (b, 1, 181, 64)" in text
    assert "interpolate(8) -> (b, 176, 1)" in text
    assert "582.4K parameters" in text

    from sed_tpu.models.m5 import M5

    m5 = M5(classes_num=1)
    v5 = m5.init(jax.random.key(0), jnp.zeros((1, 31680, 1)), train=False)
    assert "426.4K parameters" in describe_m5(v5["params"])


def test_latest_checkpoint_tie_breaks_by_mtime(tmp_path):
    """Regression (ADVICE r1): same-iteration msgpack file vs orbax dir must
    resolve to whichever was written last, not lexicographically."""
    import time

    from sed_tpu.train.checkpoint import latest_checkpoint

    model, tx, state, step, x, y = _tiny_setup()
    save_checkpoint(state, str(tmp_path), iteration=3, backend="orbax")
    time.sleep(0.05)
    save_checkpoint(state, str(tmp_path), iteration=3)
    assert latest_checkpoint(str(tmp_path)).endswith("iteration_3.ckpt")

    time.sleep(0.05)
    os.utime(os.path.join(str(tmp_path), "checkpoints", "iteration_3.ckpt.orbax"))
    assert latest_checkpoint(str(tmp_path)).endswith("iteration_3.ckpt.orbax")
