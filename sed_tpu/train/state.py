"""Functional train state and jitted train/eval step builders.

TPU-native redesign of the reference's imperative loop (train.py:77-132):
parameters, BatchNorm statistics, optimizer state, and the step counter live
in one immutable pytree; a single jit-compiled ``train_step`` performs
forward, loss, backward, and the Adam/AMSGrad update.  BatchNorm batch
statistics are computed over the *global* batch — under pjit data parallelism
XLA turns the batch-mean into an ICI all-reduce automatically (the multi-chip
analog of what the single-device reference computes).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from sed_tpu.train.loss import weighted_bce_with_logits


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def init_state(model, rng, sample_input, tx: optax.GradientTransformation) -> TrainState:
    variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    pos_weight: float = 5.0,
    multi_frame: bool = True,
    augment_fn: Optional[Callable] = None,
) -> Callable:
    """Build a jitted (state, x, y[, rng]) -> (state, loss) step.

    ``augment_fn(rng, x, y) -> (x, y)`` runs on-device before the forward pass
    when provided (mix/noise augmentation, reference
    spectograms_dataset.py:112-135).
    """

    def step(state: TrainState, x, y, rng=None):
        if augment_fn is not None:
            x, y = augment_fn(rng, x, y)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            loss = weighted_bce_with_logits(out, y, pos_weight, multi_frame)
            return loss, updates["batch_stats"]

        (loss, new_batch_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        return new_state, loss

    return jax.jit(step, donate_argnums=(0,))


@functools.lru_cache(maxsize=16)
def make_eval_forward(model) -> Callable:
    """Jitted inference forward using running BatchNorm statistics.

    Cached per model (flax Modules hash by their fields) so repeated callers —
    e.g. evaluate() at every log point — reuse one jit wrapper and its compile
    cache instead of re-tracing the network each time.
    """

    @functools.partial(jax.jit)
    def forward(params, batch_stats, x):
        return model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)

    return forward
