"""Optimizer and learning-rate schedule.

Reference: train.py:80-110 — Adam(betas=(0.9, 0.999), eps=1e-8,
weight_decay=0, amsgrad=True) with the LR multiplied by 0.997 every 200 steps.
Expressed as a closed-form optax schedule: lr(step) = lr0 * 0.997**(step//200),
which matches the reference exactly (the reference decays after each 200th
completed step, so updates 0..199 use lr0, update 200 uses lr0*0.997, ...).
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

LR_DECAY_FACTOR = 0.997
LR_DECAY_FREQ = 200


def reference_lr_schedule(base_lr: float):
    def schedule(step):
        return base_lr * LR_DECAY_FACTOR ** (step // LR_DECAY_FREQ)

    return schedule


class ScaleByAmsgradTorchState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates
    nu_max: optax.Updates


def scale_by_amsgrad_torch(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """torch-exact AMSGrad scaling.

    ``optax.amsgrad`` maxes the *bias-corrected* second moment, whereas torch
    (the reference optimizer, train.py:85) maxes the raw second moment and
    bias-corrects afterwards:
        nu_max <- max(nu_max, nu);  denom = sqrt(nu_max)/sqrt(1-b2^t) + eps;
        update = -(mu / (1-b1^t)) / denom.
    The two diverge by a few percent early in training (verified against a
    torch trajectory in tests/test_train.py), so we implement the torch
    semantics exactly.
    """

    def init_fn(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return ScaleByAmsgradTorchState(
            count=jnp.zeros((), jnp.int32), mu=zeros(), nu=zeros(), nu_max=zeros()
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        nu_max = jax.tree.map(jnp.maximum, state.nu_max, nu)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        new_updates = jax.tree.map(
            lambda m, vm: (m / bc1) / (jnp.sqrt(vm) / jnp.sqrt(bc2) + eps),
            mu,
            nu_max,
        )
        return new_updates, ScaleByAmsgradTorchState(count, mu, nu, nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(base_lr: float = 1e-6) -> optax.GradientTransformation:
    """Adam(betas=(0.9, 0.999), eps=1e-8, wd=0, amsgrad=True) with the
    reference's exponential step decay (train.py:85, 108-110)."""
    return optax.chain(
        scale_by_amsgrad_torch(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(reference_lr_schedule(base_lr)),
    )
