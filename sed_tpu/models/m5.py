"""M5: 1-D CNN over raw waveform frames.

Reference: models/waveform_models.py:9-75 ("VERY DEEP CONVOLUTIONAL NEURAL
NETWORKS FOR RAW WAVEFORMS").  NWC layout: (batch, samples, channels); one
scalar logit per 31680-sample frame.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from sed_tpu.models.layers import BN_EPS, BN_MOMENTUM, kaiming_uniform


class M5(nn.Module):
    """Conv1d(k=79,s=4) + 4 conv stages with max-pool 4 + global-mean head."""

    classes_num: int
    # bf16 fast mode (opt-in): compute in bfloat16, params/BN stats stay f32,
    # logits cast back to f32.
    dtype: type = jnp.float32

    def _conv_bn_relu(self, x, features: int, kernel: int, stride: int, pad: int, train: bool):
        x = nn.Conv(features, (kernel,), strides=(stride,), padding=pad,
                    kernel_init=kaiming_uniform, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype)(x)
        return nn.relu(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        # Block 1: Conv1d(C->64, k=79, s=4, p=39) + BN + ReLU + MaxPool(4).
        x = self._conv_bn_relu(x, 64, 79, 4, 39, train)
        x = nn.max_pool(x, (4,), (4,))
        # Blocks 2-4: pairs of k=3 convs ending in MaxPool(4).
        for features in (64, 64, 128):
            x = self._conv_bn_relu(x, features, 3, 1, 1, train)
            x = self._conv_bn_relu(x, features, 3, 1, 1, train)
            x = nn.max_pool(x, (4,), (4,))
        # Block 5: two k=3 convs, no pool (waveform_models.py:50-58).
        x = self._conv_bn_relu(x, 256, 3, 1, 1, train)
        x = self._conv_bn_relu(x, 256, 3, 1, 1, train)
        x = jnp.mean(x, axis=1)  # global mean over time -> (batch, 256)
        logits = nn.Dense(self.classes_num, kernel_init=kaiming_uniform,
                          dtype=self.dtype)(x)
        return logits.astype(jnp.float32)
