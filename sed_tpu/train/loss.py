"""Recall-weighted binary cross-entropy with logits.

Reference: utils/common.py:11-30 (WeightedBCE wrapping torch's
``binary_cross_entropy_with_logits`` with ``pos_weight=recall_factor``).

torch semantics reproduced exactly:
  loss = mean( pos_weight * t * softplus(-x) + (1 - t) * softplus(x) )
with, in multi-frame (spectrogram) mode, both tensors truncated on the frame
axis to the common length first — the reference's workaround for the
odd/even pooling frame-count mismatch (utils/common.py:20-22) — and, in
single-frame (waveform) mode, the logits flattened to match the per-crop
scalar labels (utils/common.py:26-27).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.nn import softplus


def weighted_bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pos_weight: float = 5.0,
    multi_frame: bool = True,
) -> jnp.ndarray:
    if multi_frame:
        n = min(logits.shape[1], targets.shape[1])
        logits = logits[:, :n]
        targets = targets[:, :n]
    else:
        # Reference flattens (B, 1) logits against (B,) scalar labels
        # (utils/common.py:26-27); flattening targets too keeps the pairing
        # exact when multiclass labels are (B, classes).
        logits = logits.reshape(-1)
        targets = targets.reshape(-1)
    targets = targets.astype(logits.dtype)
    loss = pos_weight * targets * softplus(-logits) + (1.0 - targets) * softplus(logits)
    return jnp.mean(loss)


def weighted_bce_with_logits_np(logits, targets, pos_weight: float = 5.0,
                                multi_frame: bool = True) -> float:
    """Host numpy twin of :func:`weighted_bce_with_logits` for the eval loop,
    where per-recording shapes vary — computing the scalar loss on host avoids
    compiling a device program per distinct validation length."""
    import numpy as np

    logits = np.asarray(logits, np.float64)
    targets = np.asarray(targets, np.float64)
    if multi_frame:
        n = min(logits.shape[1], targets.shape[1])
        logits = logits[:, :n]
        targets = targets[:, :n]
    else:
        logits = logits.reshape(-1)
        targets = targets.reshape(-1)
    sp = lambda z: np.logaddexp(0.0, z)  # log(1 + e^z), overflow-safe
    loss = pos_weight * targets * sp(-logits) + (1.0 - targets) * sp(logits)
    return float(loss.mean())
