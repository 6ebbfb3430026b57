"""M5: 1-D CNN over raw waveform frames.

Reference: models/waveform_models.py:9-75 ("VERY DEEP CONVOLUTIONAL NEURAL
NETWORKS FOR RAW WAVEFORMS").  NWC layout: (batch, samples, channels); one
scalar logit per 31680-sample frame.

TPU note — the space-to-depth conv1 (``conv1_s2d``): the reference stem is
Conv1d(1->64, k=79, s=4).  A 79-deep 1-channel contraction fills at most
79/128 of the MXU's lanes, and M5_ROOFLINE.json measured it at ~20% MFU —
80% of the whole model's wall time.  Blocking the waveform into 16-sample
groups (a FREE row-major reshape: (B, N, 1) -> (B, N/16, 16)) re-expresses
the same conv as k=7 over 16 channels producing 4 stride-phases x 64
channels = 256 outputs, whose (B, nb, 4*64) -> (B, 4*nb, 64) un-blocking is
again a free reshape.  Contraction depth becomes 7*16 = 112 (87.5% lane
fill) at 112/79 = 1.42x the MACs — identical math (the extra weight entries
are zeros), different summation order only.  Unlike the measured-negative
XLA im2col (M5_ROOFLINE.json conv1_patches 0.79x), nothing is materialized:
both reshapes are layout no-ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from sed_tpu.models.layers import BN_EPS, BN_MOMENTUM, kaiming_uniform

# Waveform samples per block for the space-to-depth conv1.  16 gives the
# deepest single-MXU-tile contraction (7*16 = 112 <= 128); 32 would spill to
# 160 (two tiles at 62% fill) and 8 only reaches 88.
S2D_BLOCK = 16


def s2d_conv1_kernel(w: jnp.ndarray, *, stride: int = 4, pad: int = 39,
                     block: int = S2D_BLOCK) -> jnp.ndarray:
    """Scatter a (K, 1, C) stem kernel into its space-to-depth form
    (kw, block, phases*C), phases = block//stride.

    Output channel ``p*C + c`` of the blocked conv is stride-phase ``p`` of
    original channel ``c``; positions not covered by the 79 taps are zero.
    Dtype-generic: int8 weights stay int8 (the scatter adds exact zeros), so
    the int8 serving path's accumulation is bit-identical to the direct conv.
    """
    K, cin, C = w.shape
    assert cin == 1, "space-to-depth stem requires a 1-channel input"
    assert block % stride == 0
    phases = block // stride
    L = -(-pad // block)  # left-context blocks
    kw = L + -(-(stride * (phases - 1) - pad + K) // block)
    flat = jnp.zeros((kw * block, phases, C), w.dtype)
    base = block * L - pad
    for p in range(phases):  # phases is small and static (4)
        flat = flat.at[base + stride * p: base + stride * p + K, p, :].set(
            w[:, 0, :])
    return flat.reshape(kw, block, phases * C)


def s2d_conv1(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None, *,
              stride: int = 4, pad: int = 39, block: int = S2D_BLOCK,
              preferred_element_type=None) -> jnp.ndarray:
    """Space-to-depth evaluation of ``Conv1d(1->C, k, stride, pad)``.

    x: (B, n, 1); w: (K, 1, C); returns (B, n_out, C) — the same values as
    ``lax.conv_general_dilated(x, w, (stride,), [(pad, pad)])`` up to f32
    summation order (bit-exact under integer accumulation).
    """
    B, n, cin = x.shape
    K, _, C = w.shape
    assert cin == 1
    phases = block // stride
    n_out = (n + 2 * pad - K) // stride + 1
    L = -(-pad // block)
    left = block * L
    kw = L + -(-(stride * (phases - 1) - pad + K) // block)
    n_out_blocks = -(-n_out // phases)
    padded = block * (n_out_blocks + kw - 1)
    xb = jnp.pad(x[..., 0], ((0, 0), (left, padded - left - n)))
    xb = xb.reshape(B, padded // block, block)  # free: row-major re-view
    w2 = s2d_conv1_kernel(w, stride=stride, pad=pad, block=block)
    y = jax.lax.conv_general_dilated(
        xb, w2, (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=preferred_element_type)
    y = y.reshape(B, n_out_blocks * phases, C)[:, :n_out]  # free un-blocking
    return y if b is None else y + b


class _Conv1S2D(nn.Module):
    """Drop-in stem conv holding the SAME params as ``nn.Conv`` (kernel
    (K, 1, C) + bias) but evaluating via :func:`s2d_conv1` — checkpoints,
    importers, and the quantizer see an unchanged tree."""

    features: int
    kernel: int
    stride: int
    pad: int
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("kernel", kaiming_uniform,
                       (self.kernel, x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return s2d_conv1(x.astype(self.dtype), w.astype(self.dtype),
                         b.astype(self.dtype), stride=self.stride,
                         pad=self.pad)


class M5(nn.Module):
    """Conv1d(k=79,s=4) + 4 conv stages with max-pool 4 + global-mean head."""

    classes_num: int
    # bf16 fast mode (opt-in): compute in bfloat16, params/BN stats stay f32,
    # logits cast back to f32.
    dtype: type = jnp.float32
    # Space-to-depth stem (see module docstring): same math re-tiled for the
    # MXU; f32 summation order differs from the direct conv (6.3e-5 max
    # sigmoid dev measured).  Param tree is identical either way, so any
    # checkpoint loads under either setting.  Default None = dtype-aware
    # (hardware A/B, benchmarks/M5_S2D_BENCH.json): f32 uses s2d (1.55x);
    # bf16 keeps the direct conv (s2d measured 0.98x — unity within spread);
    # the int8 serving path (models/quantize.py) keeps direct too (0.29x).
    conv1_s2d: bool | None = None

    def _conv_bn_relu(self, x, idx: int, features: int, kernel: int,
                      stride: int, pad: int, train: bool):
        # Explicit names pin the tree to the historical auto-named layout
        # (Conv_i/BatchNorm_i) regardless of which stem class is used.
        s2d = (self.dtype == jnp.float32 if self.conv1_s2d is None
               else self.conv1_s2d)
        if idx == 0 and s2d:
            x = _Conv1S2D(features, kernel, stride, pad, dtype=self.dtype,
                          name="Conv_0")(x)
        else:
            x = nn.Conv(features, (kernel,), strides=(stride,), padding=pad,
                        kernel_init=kaiming_uniform, dtype=self.dtype,
                        name=f"Conv_{idx}")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype,
                         name=f"BatchNorm_{idx}")(x)
        return nn.relu(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        # Block 1: Conv1d(C->64, k=79, s=4, p=39) + BN + ReLU + MaxPool(4).
        x = self._conv_bn_relu(x, 0, 64, 79, 4, 39, train)
        x = nn.max_pool(x, (4,), (4,))
        # Blocks 2-4: pairs of k=3 convs ending in MaxPool(4).
        idx = 1
        for features in (64, 64, 128):
            x = self._conv_bn_relu(x, idx, features, 3, 1, 1, train)
            x = self._conv_bn_relu(x, idx + 1, features, 3, 1, 1, train)
            x = nn.max_pool(x, (4,), (4,))
            idx += 2
        # Block 5: two k=3 convs, no pool (waveform_models.py:50-58).
        x = self._conv_bn_relu(x, 7, 256, 3, 1, 1, train)
        x = self._conv_bn_relu(x, 8, 256, 3, 1, 1, train)
        x = jnp.mean(x, axis=1)  # global mean over time -> (batch, 256)
        logits = nn.Dense(self.classes_num, kernel_init=kaiming_uniform,
                          dtype=self.dtype, name="Dense_0")(x)
        return logits.astype(jnp.float32)
