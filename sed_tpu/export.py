"""Model export for serving: serialize the jitted inference function.

Production-deployment capability beyond the reference: the featurize+score
pipeline is exported as a serialized StableHLO artifact (jax.export) that a
serving binary can load and run without the Python model definition — the
JAX analog of the reference's implicit "load a .pth into the same code"
deployment story, but self-contained.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sed_tpu.configs import SpectrogramConfig, DEFAULT_SPECTROGRAM


def export_scorer(
    model,
    params,
    batch_stats,
    batch: int,
    frames: int,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
) -> bytes:
    """Serialize a (batch, frames, mel, 1) -> (batch, frames', classes)
    sigmoid scorer with the weights baked in."""
    from jax import export as jax_export

    def score(x):
        logits = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
        return jax.nn.sigmoid(logits)

    spec = jax.ShapeDtypeStruct((batch, frames, cfg.mel_bins, 1), jnp.float32)
    exported = jax_export.export(jax.jit(score))(spec)
    return exported.serialize()


def export_quantized_scorer(
    qparams,
    batch: int,
    frames: int,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
) -> bytes:
    """Serialize the int8 PTQ scorer (models/quantize.py) as a StableHLO
    artifact — the int8 weights and scales are baked in, so the serving
    binary needs neither the model definition nor the quantizer."""
    from jax import export as jax_export

    from sed_tpu.models.quantize import quantized_scores

    def score(x):
        return quantized_scores(qparams, x)

    spec = jax.ShapeDtypeStruct((batch, frames, cfg.mel_bins, 1), jnp.float32)
    exported = jax_export.export(jax.jit(score))(spec)
    return exported.serialize()


def load_scorer(blob: bytes):
    """Deserialize an exported scorer; returns a callable over numpy/jax arrays."""
    from jax import export as jax_export

    exported = jax_export.deserialize(blob)

    def call(x):
        return np.asarray(exported.call(jnp.asarray(x, jnp.float32)))

    return call
