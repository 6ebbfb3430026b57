"""Shared model building blocks (flax.linen, NHWC layouts).

Initialization parity with the reference (models/spectogram_models.py:25-40):
  * conv / dense weights: torch ``kaiming_uniform_(nonlinearity='leaky_relu')``
    with the default a=0, i.e. gain sqrt(2) and bound sqrt(6 / fan_in) —
    exactly ``variance_scaling(2.0, 'fan_in', 'uniform')`` in jax;
  * biases zero; BatchNorm scale=1, bias=0, running stats (0, 1).

BatchNorm parity: torch defaults momentum=0.1 / eps=1e-5 correspond to flax
momentum=0.9 (flax keeps ``ra = m*ra + (1-m)*batch``).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn
from jax.nn.initializers import variance_scaling

# torch kaiming_uniform_(a=0, mode='fan_in', nonlinearity='leaky_relu').
kaiming_uniform = variance_scaling(2.0, "fan_in", "uniform")

BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def interpolate(x: jnp.ndarray, ratio: int) -> jnp.ndarray:
    """Repeat each time step ``ratio`` times to undo pooling decimation.

    Reference: models/spectogram_models.py:9-22.
    x: (batch, time_steps, classes) -> (batch, time_steps * ratio, classes).
    """
    if ratio == 1:
        return x
    return jnp.repeat(x, ratio, axis=1)


class ConvBlock(nn.Module):
    """2x(3x3 conv -> BN -> ReLU) -> average pool.

    Reference: models/spectogram_models.py:128-160.  NHWC layout:
    (batch, time, freq, channels).  pool_size==1 keeps torch's
    ``F.avg_pool2d(kernel_size=1)`` no-op semantics.
    """

    out_channels: int
    pool_size: int = 2
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for _ in range(2):
            x = nn.Conv(
                self.out_channels,
                kernel_size=(3, 3),
                strides=(1, 1),
                padding=1,
                use_bias=False,
                kernel_init=kaiming_uniform,
                dtype=self.dtype,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
                epsilon=BN_EPS, dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        if self.pool_size > 1:
            p = (self.pool_size, self.pool_size)
            x = nn.avg_pool(x, window_shape=p, strides=p)  # VALID: floors odd dims
        return x
