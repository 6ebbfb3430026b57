"""Checkpointing: full-state save/restore plus reference-compatible model-only load.

The reference saves ``{'iterations', 'model', 'optimizer'}`` to
``checkpoints/iteration_N.pth`` every log interval (train.py:123-128) but on
resume restores only the model weights, dropping optimizer state and the step
counter (main.py:37-39).  This module saves the complete functional state
(step, params, batch_stats, opt_state) as a flax-serialized msgpack file and
supports both full resume and the reference's model-only semantics.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from flax import serialization

from sed_tpu.train.state import TrainState


def checkpoint_path(outputs_dir: str, iteration: int) -> str:
    return os.path.join(outputs_dir, "checkpoints", f"iteration_{iteration}.ckpt")


def save_checkpoint(
    state: TrainState, outputs_dir: str, iteration: int, backend: str = "msgpack"
) -> str:
    """Save the full state.

    ``backend='msgpack'`` (default): one flax-serialized file.
    ``backend='orbax'``: an orbax PyTreeCheckpointer directory (same path with
    a ``.orbax`` suffix) for ecosystem interop.
    """
    path = checkpoint_path(outputs_dir, iteration)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    host_state = jax.device_get(state)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        path = path + ".orbax"
        ocp.PyTreeCheckpointer().save(
            os.path.abspath(path), serialization.to_state_dict(host_state)
        )
        return path
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_state))
    return path


def load_checkpoint(path: str, template: TrainState, model_only: bool = False) -> TrainState:
    """Restore a checkpoint into the shape of ``template``.

    Accepts both backends: a ``.orbax`` directory or a msgpack file.
    ``model_only=True`` mirrors the reference resume behavior (main.py:37-39):
    restore params and batch statistics but keep the template's fresh
    optimizer state and step counter.
    """
    host_template = jax.device_get(template)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        restored_dict = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        restored = serialization.from_state_dict(host_template, restored_dict)
    else:
        with open(path, "rb") as f:
            data = f.read()
        restored = serialization.from_bytes(host_template, data)
    if model_only:
        return template.replace(params=restored.params, batch_stats=restored.batch_stats)
    return restored


def latest_checkpoint(outputs_dir: str) -> Optional[str]:
    ckpt_dir = os.path.join(outputs_dir, "checkpoints")
    if not os.path.isdir(ckpt_dir):
        return None
    candidates = []
    for name in os.listdir(ckpt_dir):
        for suffix in (".ckpt", ".ckpt.orbax"):
            if name.startswith("iteration_") and name.endswith(suffix):
                try:
                    candidates.append((int(name[len("iteration_"):-len(suffix)]), name))
                except ValueError:
                    pass
                break
    if not candidates:
        return None
    # Tie-break equal iteration counts by mtime (most recently written wins)
    # rather than lexicographically, so whichever backend saved last is the
    # one resumed from.
    def sort_key(item):
        it, name = item
        return (it, os.path.getmtime(os.path.join(ckpt_dir, name)), name)

    return os.path.join(ckpt_dir, max(candidates, key=sort_key)[1])
