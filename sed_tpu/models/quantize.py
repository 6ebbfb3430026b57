"""Post-training int8 quantization for serving density (ROADMAP #4).

The reference has no quantization story; this is a TPU-native extension.
Scheme (standard PTQ, chosen for the v5e MXU whose int8 path runs at 2x the
bf16 peak):

  * conv / dense WEIGHTS: symmetric per-output-channel int8
    (scale = absmax / 127 over each output channel's fan-in);
  * ACTIVATIONS: symmetric per-tensor int8, scales calibrated with an
    absolute-max sweep over sample batches;
  * the convolutions run int8 x int8 -> int32 on the MXU
    (``preferred_element_type=int32``); everything between them —
    dequantize, inference-mode BatchNorm (an affine in the running stats,
    models/layers.py BN semantics), ReLU, average pooling, requantize — is
    float32 elementwise that XLA fuses into the conv epilogue.

Exactness note: this is a lossy serving mode, NOT the parity path.  The
golden-tested float pipeline (CLAUDE.md invariants) is untouched; tests pin
the int8/f32 score deviation instead.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sed_tpu.models.layers import BN_EPS

DN = ("NHWC", "HWIO", "NHWC")  # lax conv dimension numbers for 2-D blocks


def _per_channel_scale(w: jnp.ndarray) -> jnp.ndarray:
    """absmax/127 over all but the last (output-channel) axis; zero-safe."""
    absmax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    return jnp.maximum(absmax, 1e-12) / 127.0


def _quantize_weight(w: jnp.ndarray):
    scale = _per_channel_scale(w)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _quantize_act(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def _bn_affine(bn_params: Dict[str, Any], bn_stats: Dict[str, Any]):
    """Inference-mode BatchNorm as y = g*x + b (running stats folded)."""
    inv = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + BN_EPS)
    return inv, bn_params["bias"] - bn_stats["mean"] * inv


def quantize_cnn(model, params, batch_stats, calib_batches: Sequence[jnp.ndarray]):
    """Build the int8 serving artifact for a trained CnnAvgPooling.

    ``calib_batches``: NHWC sample inputs (e.g. a few training batches) used
    to calibrate per-layer activation scales with an absmax sweep of the
    FLOAT forward's intermediate activations.

    Returns a pytree dict consumable by :func:`quantized_cnn_forward`.
    """
    from sed_tpu.models.cnn import num_pools

    cfg = model.model_config
    layers: List[Dict[str, Any]] = []
    # Walk the float forward once per calibration batch, recording per-conv
    # input absmax.
    n_convs = 2 * len(cfg)
    absmax = np.zeros(n_convs + 1)  # +1 for the dense head input

    def float_forward(x, record):
        i = 0
        for b, (out_c, pool) in enumerate(cfg):
            block = params[f"ConvBlock_{b}"]
            stats = batch_stats[f"ConvBlock_{b}"]
            for c in range(2):
                record(i, x)
                w = block[f"Conv_{c}"]["kernel"]
                x = jax.lax.conv_general_dilated(
                    x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=DN)
                g, bias = _bn_affine(block[f"BatchNorm_{c}"], stats[f"BatchNorm_{c}"])
                x = jnp.maximum(x * g + bias, 0.0)
                i += 1
            if pool > 1:
                x = jax.lax.reduce_window(
                    x, 0.0, jax.lax.add, (1, pool, pool, 1), (1, pool, pool, 1),
                    "VALID") / (pool * pool)
        x = jnp.mean(x, axis=2)
        record(i, x)
        return x

    for cb in calib_batches:
        vals = {}
        float_forward(jnp.asarray(cb),
                      lambda i, x: vals.__setitem__(i, float(jnp.max(jnp.abs(x)))))
        for i, v in vals.items():
            absmax[i] = max(absmax[i], v)

    act_scales = np.maximum(absmax, 1e-12) / 127.0

    i = 0
    for b, (out_c, pool) in enumerate(cfg):
        block = params[f"ConvBlock_{b}"]
        stats = batch_stats[f"ConvBlock_{b}"]
        convs = []
        for c in range(2):
            qw, w_scale = _quantize_weight(block[f"Conv_{c}"]["kernel"])
            g, bias = _bn_affine(block[f"BatchNorm_{c}"], stats[f"BatchNorm_{c}"])
            convs.append({
                "qweight": qw,
                "w_scale": w_scale,
                "act_scale": jnp.float32(act_scales[i]),
                "bn_gain": g.astype(jnp.float32),
                "bn_bias": bias.astype(jnp.float32),
            })
            i += 1
        layers.append({"convs": convs, "pool": pool})

    dense = params["Dense_0"]
    qd, d_scale = _quantize_weight(dense["kernel"])
    return {
        "layers": layers,
        "dense": {"qweight": qd, "w_scale": d_scale,
                  "act_scale": jnp.float32(act_scales[n_convs]),
                  "bias": dense["bias"].astype(jnp.float32)},
        "interp": 2 ** num_pools(cfg),
    }


def quantized_cnn_forward(qparams, x: jnp.ndarray) -> jnp.ndarray:
    """int8 serving forward: NHWC float input -> per-frame logits.

    Mirrors CnnAvgPooling.__call__ (models/cnn.py:57-66; reference
    spectogram_models.py:163-205) with every conv/dense contraction on the
    int8 MXU path.

    ``qparams`` mixes arrays with static structure (pool sizes, the
    interpolation ratio), so close over it when jitting —
    ``jax.jit(lambda x: quantized_cnn_forward(qparams, x))`` — rather than
    passing it as a traced argument.
    """
    for layer in qparams["layers"]:
        for conv in layer["convs"]:
            sa = conv["act_scale"]
            xq = _quantize_act(x, sa)
            acc = jax.lax.conv_general_dilated(
                xq, conv["qweight"], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=DN,
                preferred_element_type=jnp.int32,
            )
            x = acc.astype(jnp.float32) * (sa * conv["w_scale"])
            x = jnp.maximum(x * conv["bn_gain"] + conv["bn_bias"], 0.0)
        pool = layer["pool"]
        if pool > 1:
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, pool, pool, 1), (1, pool, pool, 1),
                "VALID") / (pool * pool)
    x = jnp.mean(x, axis=2)  # mel-axis mean -> (batch, frames', feat)
    d = qparams["dense"]
    sa = d["act_scale"]
    xq = _quantize_act(x, sa)
    acc = jax.lax.dot_general(
        xq, d["qweight"], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    x = acc.astype(jnp.float32) * (sa * d["w_scale"]) + d["bias"]
    return jnp.repeat(x, qparams["interp"], axis=1)


def quantized_scores(qparams, x: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid confidences from the int8 forward (CnnAvgPooling.scores analog)."""
    return jax.nn.sigmoid(quantized_cnn_forward(qparams, x))


def quantized_serving_scores(qparams, x: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid confidences from ANY 2-D-family int8 artifact, arch inferred
    from the artifact's own structure: MobileNetV1 artifacts carry the
    'dense1' head (quantize_mobilenet; its forward already emits sigmoid,
    reference spectogram_models.py:117), CnnAvgPooling ones the single
    'dense' head (logits; sigmoid applied here).  The ONE dispatch the
    streaming stack uses, so every spectrogram family serves int8 ticks
    through the same pool code."""
    if "dense1" in qparams:
        return quantized_mobilenet_forward(qparams, x)
    return jax.nn.sigmoid(quantized_cnn_forward(qparams, x))


# ---------------------------------------------------------------------------
# MobileNetV1 (models/cnn.py; reference spectogram_models.py:42-125)
# ---------------------------------------------------------------------------

# The block stack is imported from the model definition itself so the two
# can never diverge (models/cnn.py MOBILENET_STACK).
from sed_tpu.models.cnn import MOBILENET_STACK as _MOBILENET_STACK


def quantize_mobilenet(model, params, batch_stats, calib_batches):
    """int8 PTQ artifact for a trained MobileNetV1.

    Only the POINTWISE (1x1) convolutions and the dense head are quantized —
    they carry ~98% of the MACs at the wide stages — while the depthwise 3x3s
    (C*9 MACs/px vs C^2 for pointwise) stay float32; their cost is VPU-bound
    either way, and this sidesteps int8 grouped-conv lowering entirely.
    """
    n_points = sum(1 for k, _, _ in _MOBILENET_STACK if k == "dw")
    absmax = np.zeros(n_points + 2)  # + the two dense heads

    def _block_names():
        bn_i = dw_i = 0
        for kind, _, stride in _MOBILENET_STACK:
            if kind == "bn":
                yield kind, f"_ConvBN_{bn_i}", stride
                bn_i += 1
            else:
                yield kind, f"_ConvDW_{dw_i}", stride
                dw_i += 1

    def float_forward(x, record):
        pi = 0
        for kind, name, stride in _block_names():
            b, s = params[name], batch_stats[name]
            if kind == "bn":
                x = jax.lax.conv_general_dilated(
                    x, b["Conv_0"]["kernel"], (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=DN)
                if stride > 1:
                    x = jax.lax.reduce_window(
                        x, 0.0, jax.lax.add, (1, stride, stride, 1),
                        (1, stride, stride, 1), "VALID") / (stride * stride)
                g, bias = _bn_affine(b["BatchNorm_0"], s["BatchNorm_0"])
                x = jnp.maximum(x * g + bias, 0.0)
                continue
            cin = x.shape[-1]
            x = jax.lax.conv_general_dilated(
                x, b["Conv_0"]["kernel"], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=DN, feature_group_count=cin)
            if stride > 1:
                x = jax.lax.reduce_window(
                    x, 0.0, jax.lax.add, (1, stride, stride, 1),
                    (1, stride, stride, 1), "VALID") / (stride * stride)
            g, bias = _bn_affine(b["BatchNorm_0"], s["BatchNorm_0"])
            x = jnp.maximum(x * g + bias, 0.0)
            record(pi, x)  # pointwise conv input
            x = jax.lax.conv_general_dilated(
                x, b["Conv_1"]["kernel"], (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=DN)
            g, bias = _bn_affine(b["BatchNorm_1"], s["BatchNorm_1"])
            x = jnp.maximum(x * g + bias, 0.0)
            pi += 1
        x = jnp.mean(x, axis=2)
        record(n_points, x)
        x = jnp.maximum(
            jax.lax.dot_general(x, params["Dense_0"]["kernel"],
                                (((2,), (0,)), ((), ()))) + params["Dense_0"]["bias"],
            0.0)
        record(n_points + 1, x)
        return x

    for cb in calib_batches:
        vals = {}
        float_forward(jnp.asarray(cb),
                      lambda i, x: vals.__setitem__(i, float(jnp.max(jnp.abs(x)))))
        for i, v in vals.items():
            absmax[i] = max(absmax[i], v)
    act_scales = np.maximum(absmax, 1e-12) / 127.0

    blocks = []
    pi = 0
    for kind, name, stride in _block_names():
        b, s = params[name], batch_stats[name]
        g0, bias0 = _bn_affine(b["BatchNorm_0"], s["BatchNorm_0"])
        entry = {"kind": kind, "stride": stride,
                 "dw_kernel": b["Conv_0"]["kernel"].astype(jnp.float32),
                 "bn0_gain": g0.astype(jnp.float32),
                 "bn0_bias": bias0.astype(jnp.float32)}
        if kind == "dw":
            qw, w_scale = _quantize_weight(b["Conv_1"]["kernel"])
            g1, bias1 = _bn_affine(b["BatchNorm_1"], s["BatchNorm_1"])
            entry.update(qweight=qw, w_scale=w_scale,
                         act_scale=jnp.float32(act_scales[pi]),
                         bn1_gain=g1.astype(jnp.float32),
                         bn1_bias=bias1.astype(jnp.float32))
            pi += 1
        blocks.append(entry)

    def qdense(name, scale_idx):
        qd, d_scale = _quantize_weight(params[name]["kernel"])
        return {"qweight": qd, "w_scale": d_scale,
                "act_scale": jnp.float32(act_scales[scale_idx]),
                "bias": params[name]["bias"].astype(jnp.float32)}

    return {"blocks": blocks,
            "dense0": qdense("Dense_0", n_points),
            "dense1": qdense("Dense_1", n_points + 1),
            "interp": 2 ** 3}


def quantized_mobilenet_forward(qparams, x: jnp.ndarray) -> jnp.ndarray:
    """int8 MobileNetV1 serving forward: NHWC float -> sigmoid confidences
    (the reference emits sigmoid in forward, spectogram_models.py:117).
    Close over ``qparams`` when jitting."""
    for blk in qparams["blocks"]:
        stride = blk["stride"]
        if blk["kind"] == "bn":
            x = jax.lax.conv_general_dilated(
                x, blk["dw_kernel"], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=DN)
        else:
            cin = x.shape[-1]
            x = jax.lax.conv_general_dilated(
                x, blk["dw_kernel"], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=DN, feature_group_count=cin)
        if stride > 1:
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, stride, stride, 1),
                (1, stride, stride, 1), "VALID") / (stride * stride)
        x = jnp.maximum(x * blk["bn0_gain"] + blk["bn0_bias"], 0.0)
        if blk["kind"] == "dw":
            sa = blk["act_scale"]
            xq = _quantize_act(x, sa)
            acc = jax.lax.conv_general_dilated(
                xq, blk["qweight"], (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=DN, preferred_element_type=jnp.int32)
            x = acc.astype(jnp.float32) * (sa * blk["w_scale"])
            x = jnp.maximum(x * blk["bn1_gain"] + blk["bn1_bias"], 0.0)
    x = jnp.mean(x, axis=2)

    def qdot(d, x):
        sa = d["act_scale"]
        xq = _quantize_act(x, sa)
        acc = jax.lax.dot_general(xq, d["qweight"], (((2,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (sa * d["w_scale"]) + d["bias"]

    x = jnp.maximum(qdot(qparams["dense0"], x), 0.0)
    x = jax.nn.sigmoid(qdot(qparams["dense1"], x))
    return jnp.repeat(x, qparams["interp"], axis=1)


# ---------------------------------------------------------------------------
# M5 (1-D waveform CNN, models/m5.py; reference waveform_models.py:9-75)
# ---------------------------------------------------------------------------

DN1 = ("NWC", "WIO", "NWC")
# (stride, padding, maxpool-after) per conv, mirroring M5.__call__.
_M5_SPEC = [(4, 39, 4), (1, 1, None), (1, 1, 4), (1, 1, None), (1, 1, 4),
            (1, 1, None), (1, 1, 4), (1, 1, None), (1, 1, None)]


def quantize_m5(model, params, batch_stats, calib_batches: Sequence[jnp.ndarray]):
    """int8 PTQ artifact for a trained M5 (NWC waveform input).

    M5's convs carry biases (unlike ConvBlock); they fold into the BN affine:
    BN(conv + b) = g*conv + (g*b + c).
    """
    absmax = np.zeros(len(_M5_SPEC) + 1)

    def float_forward(x, record):
        for i, (stride, padw, pool) in enumerate(_M5_SPEC):
            record(i, x)
            w = params[f"Conv_{i}"]["kernel"]
            b = params[f"Conv_{i}"]["bias"]
            x = jax.lax.conv_general_dilated(
                x, w, (stride,), [(padw, padw)], dimension_numbers=DN1) + b
            g, bias = _bn_affine(params[f"BatchNorm_{i}"],
                                 batch_stats[f"BatchNorm_{i}"])
            x = jnp.maximum(x * g + bias, 0.0)
            if pool:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, pool, 1), (1, pool, 1), "VALID")
        # Record the dense-head scale on the PRE-mean tensor: the quantized
        # forward requantizes the last conv's per-timestep activations before
        # the time mean, so the scale must cover per-timestep peaks (a
        # post-mean absmax would clip loud transients).
        record(len(_M5_SPEC), x)
        return jnp.mean(x, axis=1)

    for cb in calib_batches:
        vals = {}
        float_forward(jnp.asarray(cb),
                      lambda i, x: vals.__setitem__(i, float(jnp.max(jnp.abs(x)))))
        for i, v in vals.items():
            absmax[i] = max(absmax[i], v)
    act_scales = np.maximum(absmax, 1e-12) / 127.0

    convs = []
    for i, (stride, padw, pool) in enumerate(_M5_SPEC):
        qw, w_scale = _quantize_weight(params[f"Conv_{i}"]["kernel"])
        g, bias = _bn_affine(params[f"BatchNorm_{i}"], batch_stats[f"BatchNorm_{i}"])
        convs.append({
            "qweight": qw, "w_scale": w_scale,
            "act_scale": jnp.float32(act_scales[i]),
            "bn_gain": g.astype(jnp.float32),
            # conv bias folded through BN: g*b + (bias from BN affine)
            "bn_bias": (g * params[f"Conv_{i}"]["bias"] + bias).astype(jnp.float32),
            "stride": stride, "pad": padw, "pool": pool,
        })
    dense = params["Dense_0"]
    qd, d_scale = _quantize_weight(dense["kernel"])
    return {
        "convs": convs,
        "dense": {"qweight": qd, "w_scale": d_scale,
                  "act_scale": jnp.float32(act_scales[len(_M5_SPEC)]),
                  "bias": dense["bias"].astype(jnp.float32)},
    }


def quantized_m5_forward(qparams, x: jnp.ndarray, *,
                         conv1_impl: str = "direct") -> jnp.ndarray:
    """int8 M5 forward: (batch, samples, channels) float -> (batch, classes)
    logits.  Close over ``qparams`` when jitting (static pool/stride fields).

    Every inter-layer tensor is stored int8: max-pool commutes EXACTLY with
    the monotonic quantize (max∘clip∘round == clip∘round∘max), so each
    layer's dequant→BN→ReLU→requant chain fuses into the conv epilogue and
    pooling runs on int8 — 4x less HBM traffic between the convs, which is
    what bounds this model (the f32-activation variant measured no int8
    speedup at all).

    ``conv1_impl='s2d'`` evaluates the k=79 stem via the space-to-depth
    re-tiling (models/m5.py s2d_conv1) — BIT-EXACT here (integer
    accumulation is order-independent; the scattered weight entries are
    int8 zeros) but measured 0.29x on hardware (M5_S2D_BENCH.json: the
    int8 16-channel k=7 conv lowers far worse than the thin direct one),
    so 'direct' stays the int8 default; 's2d' is the kept measurement
    record.
    """
    from sed_tpu.models.m5 import s2d_conv1

    convs = qparams["convs"]
    xq = _quantize_act(x, convs[0]["act_scale"])
    for i, conv in enumerate(convs):
        sa = conv["act_scale"]
        if i == 0 and conv1_impl == "s2d":
            acc = s2d_conv1(xq, conv["qweight"], None, stride=conv["stride"],
                            pad=conv["pad"],
                            preferred_element_type=jnp.int32)
        else:
            acc = jax.lax.conv_general_dilated(
                xq, conv["qweight"], (conv["stride"],),
                [(conv["pad"], conv["pad"])],
                dimension_numbers=DN1, preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (sa * conv["w_scale"])
        y = jnp.maximum(y * conv["bn_gain"] + conv["bn_bias"], 0.0)
        s_next = (convs[i + 1]["act_scale"] if i + 1 < len(convs)
                  else qparams["dense"]["act_scale"])
        xq = _quantize_act(y, s_next)  # fused into the conv epilogue
        if conv["pool"]:
            p = conv["pool"]
            xq = jax.lax.reduce_window(
                xq, jnp.int8(-128), jax.lax.max, (1, p, 1), (1, p, 1), "VALID")
    d = qparams["dense"]
    sa = d["act_scale"]
    # Global mean over time in int32 (exact), then one dense int8 matmul.
    t = xq.shape[1]
    summed = jnp.sum(xq.astype(jnp.int32), axis=1)
    acc = jax.lax.dot_general(summed.astype(jnp.float32) / t,
                              d["qweight"].astype(jnp.float32),
                              (((1,), (0,)), ((), ())))
    return acc * (sa * d["w_scale"]) + d["bias"]
