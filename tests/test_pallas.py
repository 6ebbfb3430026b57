"""Pallas fused mel kernel: interpreter-mode parity vs the XLA path (on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sed_tpu.configs import SpectrogramConfig
from sed_tpu.ops.featurizer import power_to_logmel
from sed_tpu.ops.pallas_featurizer import power_to_logmel_pallas

CFG = SpectrogramConfig()


@pytest.mark.parametrize("shape", [(182, 16385), (1, 37, 16385), (3, 16385)])
def test_pallas_matches_xla_path(shape):
    rng = np.random.default_rng(0)
    power = (rng.random(shape) * 1e3).astype(np.float32)
    ref = np.asarray(power_to_logmel(jnp.asarray(power), CFG))
    got = np.asarray(power_to_logmel_pallas(jnp.asarray(power), CFG, interpret=True))
    assert got.shape == ref.shape == shape[:-1] + (CFG.mel_bins,)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_pallas_amin_floor():
    power = np.zeros((8, 16385), dtype=np.float32)
    got = np.asarray(power_to_logmel_pallas(jnp.asarray(power), CFG, interpret=True))
    np.testing.assert_allclose(got, -100.0)  # 10*log10(1e-10)
