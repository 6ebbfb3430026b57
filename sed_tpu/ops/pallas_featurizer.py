"""Pallas TPU kernel: fused power-spectrum -> mel matmul -> log10 stage.

The featurizer's back half multiplies a (frames, 16385) power spectrum by the
(16385, 64) mel filterbank and takes 10*log10(max(1e-10, .)) (reference math:
dataset/spectogram/preprocess.py:39-45).  XLA runs this as matmul + separate
elementwise ops; this kernel fuses the K-tiled MXU matmul with the dB epilogue
in one VMEM-resident pass so mel power never round-trips through HBM:

  grid (row_tiles, k_tiles):
    k == 0:        zero the (TILE_R, 128) accumulator tile
    every k:       accumulate power_tile @ fb_tile on the MXU (f32)
    k == last:     apply 10*log10(max(amin, acc)) on the VPU, in place

The filterbank is padded to 128 output lanes (mel_bins=64 < the 128-lane
hardware tile) and K to a TILE_K multiple; zero padding contributes nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sed_tpu.configs import SpectrogramConfig, DEFAULT_SPECTROGRAM
from sed_tpu.ops import mel as mel_ops

TILE_R = 128
TILE_K = 2048
LANES = 128
AMIN = 1e-10


def _kernel(power_ref, fb_ref, out_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jax.lax.dot_general(
        power_ref[:], fb_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(k == pl.num_programs(1) - 1)
    def _epilogue():
        # Precise software log10 — the VPU's hardware log approximation is
        # ~3e-5 relative, above the 1e-4 dB parity budget (see mel_ops).
        out_ref[:] = 10.0 * mel_ops.log10_precise(jnp.maximum(out_ref[:], AMIN))


@functools.lru_cache(maxsize=4)
def _padded_filterbank(cfg: SpectrogramConfig, k_padded: int) -> np.ndarray:
    fb = mel_ops.mel_filterbank(cfg, dtype=np.float32)  # (freq_bins, mel)
    out = np.zeros((k_padded, LANES), dtype=np.float32)
    out[: fb.shape[0], : fb.shape[1]] = fb
    return out


def power_to_logmel_pallas(
    power: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    interpret: bool = False,
) -> jnp.ndarray:
    """(..., freq_bins) float32 power -> (..., mel_bins) float32 log-mel."""
    lead = power.shape[:-1]
    k = power.shape[-1]
    rows = int(np.prod(lead)) if lead else 1
    x = power.reshape(rows, k).astype(jnp.float32)

    k_tiles = pl.cdiv(k, TILE_K)
    k_padded = k_tiles * TILE_K
    r_tiles = pl.cdiv(rows, TILE_R)
    r_padded = r_tiles * TILE_R
    x = jnp.pad(x, ((0, r_padded - rows), (0, k_padded - k)))
    fb = jnp.asarray(_padded_filterbank(cfg, k_padded))

    out = pl.pallas_call(
        _kernel,
        grid=(r_tiles, k_tiles),
        in_specs=[
            pl.BlockSpec((TILE_R, TILE_K), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_K, LANES), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_R, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_padded, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_padded * k_padded * LANES,
            bytes_accessed=(r_padded * k_padded + k_padded * LANES + r_padded * LANES) * 4,
            transcendentals=r_padded * LANES,
        ),
        interpret=interpret,
    )(x, fb)

    return out[:rows, : cfg.mel_bins].reshape(lead + (cfg.mel_bins,))
