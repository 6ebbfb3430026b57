"""Quantization-aware fine-tuning (QAT) for the int8 serving path.

The reference has no quantization story at all; models/quantize.py adds
post-training int8 (PTQ), and this module adds the standard next step:
fine-tune the trained float weights THROUGH the quantizer so they adapt to
int8 rounding, tightening the serving artifact's fidelity without changing
its structure or speed (the export is consumed by the unmodified
``quantized_cnn_forward``).

Scheme (flagship CnnAvgPooling; reference spectogram_models.py:163-205):

  * BatchNorm is frozen into per-channel affines from the trained running
    stats (standard for QAT fine-tuning — the serving forward uses exactly
    this affine, so training and serving see the same graph).  The affine's
    gain/bias ARE trainable, letting the fine-tune absorb quantization bias.
  * Activation scales are calibrated once with the same absmax sweep PTQ
    uses (models/quantize.py:quantize_cnn) and then FROZEN — the exported
    artifact keeps them, so fake-quant training exactly mirrors serving.
  * Weights are fake-quantized per step with dynamic per-output-channel
    scales (absmax/127, matching ``_quantize_weight``) and a
    straight-through estimator on the round: the forward sees the int8
    lattice, the backward sees identity inside the clip range.

Two fine-tune objectives:
  * ``mode='distill'`` (default): MSE against the float teacher's logits —
    directly minimizes the int8-vs-f32 score deviation that
    tests/test_quantize.py and benchmarks/INT8_BENCH.json pin.  Needs no
    labels.
  * ``mode='bce'``: the task loss (train/loss.py WeightedBCE), matching the
    reference training objective (utils/common.py:11-30).

Exactness note: like PTQ, this is a LOSSY serving mode; the golden-tested
float pipeline (CLAUDE.md invariants) is untouched.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sed_tpu.models.quantize import (
    DN,
    _per_channel_scale,
    _quantize_weight,
    quantize_cnn,
)
from sed_tpu.train.loss import weighted_bce_with_logits


def ste_fake_quant(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Symmetric int8 fake-quant: quantize-dequantize with STE rounding.

    Forward value equals ``dequantize(quantize(x))`` exactly as the serving
    path computes it (models/quantize.py:_quantize_act followed by the
    ``* scale`` dequant); gradient is identity where ``|x| <= 127*scale``
    and zero outside (the clip's own gradient).
    """
    q = x / scale
    qc = jnp.clip(q, -127.0, 127.0)
    qr = qc + jax.lax.stop_gradient(jnp.round(qc) - qc)
    return qr * scale


def _weight_fake_quant(w: jnp.ndarray) -> jnp.ndarray:
    """Per-output-channel fake-quant with the scale outside the gradient."""
    scale = jax.lax.stop_gradient(_per_channel_scale(w))
    return ste_fake_quant(w, scale)


# ---------------------------------------------------------------------------
# State construction / export
# ---------------------------------------------------------------------------


def qat_init(model, params, batch_stats,
             calib_batches: Sequence[jnp.ndarray]) -> Tuple[Dict, Dict]:
    """Build (trainable, static) QAT state from a trained float model.

    Delegates calibration and BN folding to :func:`quantize_cnn` so the
    activation scales and affines can never diverge from the PTQ path, then
    keeps the FLOAT conv/dense weights as the trainable pytree.
    """
    q = quantize_cnn(model, params, batch_stats, calib_batches)
    cfg = model.model_config
    blocks: List[Dict[str, Any]] = []
    act_scales: List[jnp.ndarray] = []
    for b, (_, pool) in enumerate(cfg):
        blk = params[f"ConvBlock_{b}"]
        qconvs = q["layers"][b]["convs"]
        blocks.append({
            "w": [blk[f"Conv_{c}"]["kernel"].astype(jnp.float32)
                  for c in range(2)],
            "g": [qconvs[c]["bn_gain"] for c in range(2)],
            "b": [qconvs[c]["bn_bias"] for c in range(2)],
        })
        act_scales.extend(qconvs[c]["act_scale"] for c in range(2))
    act_scales.append(q["dense"]["act_scale"])
    trainable = {
        "blocks": blocks,
        "dense": {"w": params["Dense_0"]["kernel"].astype(jnp.float32),
                  "b": params["Dense_0"]["bias"].astype(jnp.float32)},
    }
    static = {
        "act_scales": [jnp.float32(s) for s in act_scales],
        "pools": tuple(pool for _, pool in cfg),
        "interp": q["interp"],
    }
    return trainable, static


def qat_export(trainable: Dict, static: Dict) -> Dict:
    """Quantize the fine-tuned weights into the serving artifact.

    Returns the exact pytree structure :func:`quantize_cnn` produces, so the
    result drops into ``quantized_cnn_forward`` / ``quantized_scores`` /
    ``export.export_quantized_scorer`` unchanged.
    """
    layers = []
    i = 0
    for blk, pool in zip(trainable["blocks"], static["pools"]):
        convs = []
        for c in range(2):
            qw, w_scale = _quantize_weight(blk["w"][c])
            convs.append({
                "qweight": qw,
                "w_scale": w_scale,
                "act_scale": static["act_scales"][i],
                "bn_gain": blk["g"][c],
                "bn_bias": blk["b"][c],
            })
            i += 1
        layers.append({"convs": convs, "pool": pool})
    qd, d_scale = _quantize_weight(trainable["dense"]["w"])
    return {
        "layers": layers,
        "dense": {"qweight": qd, "w_scale": d_scale,
                  "act_scale": static["act_scales"][i],
                  "bias": trainable["dense"]["b"]},
        "interp": static["interp"],
    }


# ---------------------------------------------------------------------------
# Fake-quant forward (differentiable mirror of quantized_cnn_forward)
# ---------------------------------------------------------------------------


def qat_cnn_forward(trainable: Dict, static: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """NHWC float input -> per-frame logits through the int8 lattice.

    Real-arithmetic mirror of ``quantized_cnn_forward`` (models/quantize.py:
    134-171): every conv/dense contracts fake-quantized activations against
    fake-quantized weights, so the forward values match the int8 serving
    forward up to float32 accumulation order.  Close over ``static`` when
    jitting (python pool sizes / interp ratio).
    """
    i = 0
    for blk, pool in zip(trainable["blocks"], static["pools"]):
        for c in range(2):
            xq = ste_fake_quant(x, static["act_scales"][i])
            wq = _weight_fake_quant(blk["w"][c])
            x = jax.lax.conv_general_dilated(
                xq, wq, (1, 1), [(1, 1), (1, 1)], dimension_numbers=DN)
            x = jnp.maximum(x * blk["g"][c] + blk["b"][c], 0.0)
            i += 1
        if pool > 1:
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, pool, pool, 1), (1, pool, pool, 1),
                "VALID") / (pool * pool)
    x = jnp.mean(x, axis=2)
    xq = ste_fake_quant(x, static["act_scales"][i])
    wq = _weight_fake_quant(trainable["dense"]["w"])
    x = jax.lax.dot_general(xq, wq, (((2,), (0,)), ((), ())))
    x = x + trainable["dense"]["b"]
    return jnp.repeat(x, static["interp"], axis=1)


# ---------------------------------------------------------------------------
# Fine-tuning
# ---------------------------------------------------------------------------


def qat_finetune(trainable: Dict, static: Dict,
                 examples: Sequence[Tuple[np.ndarray, np.ndarray]],
                 *, mode: str = "distill", steps: int = 200, lr: float = 3e-5,
                 pos_weight: float = 5.0) -> Dict:
    """Fine-tune the float weights through the quantizer.

    ``examples``: list of (x, target) pairs — NHWC inputs with, per ``mode``:
      * ``'distill'``: target = the float teacher's LOGITS for x
        (``model.apply(..., train=False)``); loss = MSE on logits.
      * ``'bce'``: target = event matrices; loss = WeightedBCE
        (reference utils/common.py:11-30 semantics incl. frame truncation).

    Cycles through ``examples`` for ``steps`` Adam steps and returns the
    fine-tuned trainable pytree.
    """
    if mode not in ("distill", "bce"):
        raise ValueError(f"mode must be distill|bce, got {mode}")
    opt = optax.adam(lr)
    opt_state = opt.init(trainable)

    def loss_fn(tr, x, target):
        logits = qat_cnn_forward(tr, static, x)
        if mode == "distill":
            return jnp.mean((logits - target) ** 2)
        return weighted_bce_with_logits(logits, target, pos_weight=pos_weight)

    @jax.jit
    def step(tr, opt_state, x, target):
        loss, grads = jax.value_and_grad(loss_fn)(tr, x, target)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(tr, updates), opt_state, loss

    batches = [(jnp.asarray(x), jnp.asarray(t)) for x, t in examples]
    for k in range(steps):
        x, t = batches[k % len(batches)]
        trainable, opt_state, _ = step(trainable, opt_state, x, t)
    return trainable
