"""2-D spectrogram CNNs: CnnAvgPooling (flagship) and MobileNetV1.

Reference: models/spectogram_models.py.  Re-designed for XLA:TPU — NHWC
layout so convolutions tile directly onto the MXU, functional BatchNorm state,
logits head (sigmoid applied by the caller, matching the shipped default path
spectogram_models.py:196-197).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from sed_tpu.models.layers import (
    BN_EPS,
    BN_MOMENTUM,
    ConvBlock,
    interpolate,
    kaiming_uniform,
)

# Reference DEFAULT_CHANNEL_AND_POOL (spectogram_models.py:7).
DEFAULT_CHANNEL_AND_POOL: Tuple[Tuple[int, int], ...] = ((64, 2), (128, 2), (256, 2), (512, 1))
# Config instantiated by the training CLI (main.py:35).
TRAIN_CHANNEL_AND_POOL: Tuple[Tuple[int, int], ...] = ((32, 2), (64, 2), (128, 2), (128, 1))

# MobileNetV1 block stack (reference spectogram_models.py:78-104): one
# conv-bn stage then depthwise-separable stages, as ("bn"|"dw", out_channels,
# stride).  Shared with models/quantize.py so the two can never diverge.
MOBILENET_STACK: Tuple[Tuple[str, int, int], ...] = (
    ("bn", 32, 2), ("dw", 64, 1), ("dw", 128, 2), ("dw", 128, 1),
    ("dw", 256, 2), ("dw", 256, 1), ("dw", 512, 1), ("dw", 512, 1),
    ("dw", 512, 1), ("dw", 512, 1), ("dw", 512, 1), ("dw", 1024, 1),
    ("dw", 1024, 1),
)


def mobilenet_receptive_field() -> int:
    """Time receptive field (frames) of the MobileNetV1 stack: per block one
    k=3 conv (+2 frames at the current stride) followed by an avg-pool of
    k = stride (``dw`` blocks' pointwise 1x1 conv adds nothing)."""
    rf, jump = 1, 1
    for _, _, stride in MOBILENET_STACK:
        rf += 2 * jump              # the 3x3 (depthwise) conv
        rf += (stride - 1) * jump   # avg-pool k=stride
        jump *= stride
    return rf


def num_pools(model_config: Sequence[Tuple[int, int]]) -> int:
    """Count of 2x time-pooling stages, reproducing the reference counter.

    The reference initializes ``num_pools = 1 if model_config[0][1] == 2 else 1``
    — a constant 1 regardless of the first stage (spectogram_models.py:167,
    a latent bug that is correct for every shipped config because their first
    stage always pools by 2) — then adds 1 per pool==2 stage after the first
    (spectogram_models.py:168-172).  We reproduce the resulting count.
    """
    return 1 + sum(1 for (_, pool) in list(model_config)[1:] if pool == 2)


class CnnAvgPooling(nn.Module):
    """Stack of ConvBlocks -> mel-axis mean -> per-frame linear logits.

    Reference: models/spectogram_models.py:163-205.  Input is NHWC
    (batch, frames, mel_bins, channels); output is per-frame logits
    (batch, frames', classes) upsampled by 2**num_pools to recover the input
    frame rate (spectogram_models.py:200).
    """

    classes_num: int
    model_config: Tuple[Tuple[int, int], ...] = DEFAULT_CHANNEL_AND_POOL
    # bf16 fast mode: compute in bfloat16 (params/BN stats stay float32,
    # logits cast back to float32 for the loss).  Opt-in; parity mode is f32.
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for out_channels, pool in self.model_config:
            x = ConvBlock(out_channels, pool, dtype=self.dtype)(x, train=train)
        x = jnp.mean(x, axis=2)  # mean over mel bins -> (batch, frames', features)
        x = nn.Dense(self.classes_num, kernel_init=kaiming_uniform,
                     dtype=self.dtype)(x)  # logits
        logits = interpolate(x, 2 ** num_pools(self.model_config))
        return logits.astype(jnp.float32)

    def scores(self, x: jnp.ndarray) -> jnp.ndarray:
        """Sigmoid confidences (reference ``logits`` helper, spectogram_models.py:204-205)."""
        return nn.sigmoid(self(x))


class _ConvBN(nn.Module):
    """conv3x3 -> avgpool(stride) -> BN -> ReLU (reference conv_bn, spectogram_models.py:48-59)."""

    out_channels: int
    stride: int
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (3, 3), strides=(1, 1), padding=1,
                    use_bias=False, kernel_init=kaiming_uniform,
                    dtype=self.dtype)(x)
        if self.stride > 1:
            x = nn.avg_pool(x, (self.stride, self.stride), (self.stride, self.stride))
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype)(x)
        return nn.relu(x)


class _ConvDW(nn.Module):
    """Depthwise-separable block (reference conv_dw, spectogram_models.py:61-76)."""

    out_channels: int
    stride: int
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        x = nn.Conv(in_channels, (3, 3), strides=(1, 1), padding=1,
                    feature_group_count=in_channels, use_bias=False,
                    kernel_init=kaiming_uniform, dtype=self.dtype)(x)
        if self.stride > 1:
            x = nn.avg_pool(x, (self.stride, self.stride), (self.stride, self.stride))
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), strides=(1, 1), padding=0,
                    use_bias=False, kernel_init=kaiming_uniform,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype)(x)
        return nn.relu(x)


class MobileNetV1(nn.Module):
    """Depthwise-separable 2-D CNN (reference: spectogram_models.py:42-125).

    Unused by the reference CLI (main.py:36 keeps it commented out) but part
    of the model family.  Emits *sigmoid confidences* in the forward pass like
    the reference (spectogram_models.py:117) — note this is inconsistent with
    the logits-expecting loss; parity is defined against the shipped default
    path.  The reference forward's stray ``x.transpose(0, 1)``
    (spectogram_models.py:105) is dropped: input here is standard NHWC
    (batch, frames, mel_bins, channels).

    ``emit='logits'`` skips the final sigmoid so the network composes with
    the logits-expecting WeightedBCE (utils/common.py:29) — the reference
    never trains MobileNetV1, and training it as-committed would push
    sigmoid outputs through BCE-with-logits (a double sigmoid).  The param
    tree is identical either way (sigmoid is parameter-free), so checkpoints
    trained with ``emit='logits'`` load into the default scores-emitting
    module unchanged (``cli/infer.py --arch MobileNetV1``).  Documented in
    PARITY.md "Known divergences".
    """

    classes_num: int
    emit: str = "scores"  # 'scores' (reference parity) | 'logits' (trainable)
    # bf16 serving tier (like CnnAvgPooling/M5): params stay f32, compute in
    # ``dtype``.  Hardware record: benchmarks/MOBILENET_TIERS.json.
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        blocks = {"bn": _ConvBN, "dw": _ConvDW}
        for kind, out_channels, stride in MOBILENET_STACK:
            x = blocks[kind](out_channels, stride, dtype=self.dtype)(x, train=train)
        x = jnp.mean(x, axis=2)  # (batch, frames', 1024)
        x = nn.relu(nn.Dense(1024, kernel_init=kaiming_uniform,
                             dtype=self.dtype)(x))
        x = nn.Dense(self.classes_num, kernel_init=kaiming_uniform,
                     dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        if self.emit == "scores":
            x = nn.sigmoid(x)  # reference forward (spectogram_models.py:117)
        return interpolate(x, 2 ** 3)  # self.num_pools = 3 (spectogram_models.py:77)
