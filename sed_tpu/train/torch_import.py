"""Import the reference's torch checkpoints into sed_tpu.

The reference saves ``torch.save({'iterations': N, 'model': state_dict,
'optimizer': ...})`` as ``checkpoints/iteration_N.pth`` (reference
train.py:123-128) and resumes from ``checkpoint['model']`` (main.py:37-39,
infer.py:22-23).  This module maps those state_dicts into flax
``{params, batch_stats}`` trees for every model family, so a user migrating
from the reference keeps their trained weights:

  Cnn_AvgPooling  models/spectogram_models.py:7-41    -> cnn_avg_pooling_from_torch
  MobileNetV1     models/spectogram_models.py:42-125  -> mobilenet_from_torch
  M5              models/waveform_models.py:9-75      -> m5_from_torch

These are the SAME mappings the parity harnesses measure: CnnAvgPooling
init-forward max |logit diff| 8.3e-7 (benchmarks/AP_PARITY.json),
MobileNetV1 max sigmoid diff 1.79e-7 (benchmarks/MOBILENET_PARITY.json) —
the harnesses import from here so the measured converter and the shipped
converter cannot diverge.

CLI: ``python -m sed_tpu.cli.import_torch --pth iteration_60000.pth --out
ckpt_dir --arch CnnAvgPooling`` writes a sed_tpu msgpack checkpoint loadable
by the infer/serve/stream CLIs (--ckpt).
"""

from __future__ import annotations

import numpy as np


def _np(t):
    """torch tensor or array-like -> numpy array (torch import stays lazy)."""
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def cnn_avg_pooling_from_torch(sd, n_blocks: int):
    """Reference Cnn_AvgPooling state_dict -> flax {params, batch_stats}.

    Layer map (reference models/spectogram_models.py:7-41): per block
    ``conv_blocks.{i}.{conv1,bn1,conv2,bn2}`` -> flax ``ConvBlock_{i}``
    (Conv_0/BatchNorm_0/Conv_1/BatchNorm_1, kernels OIHW -> HWIO), and the
    ``event_fc`` head -> ``Dense_0`` (weight transposed).
    """
    params, stats = {}, {}
    for i in range(n_blocks):
        blk, bs = {}, {}
        for j, (conv, bn) in enumerate((("conv1", "bn1"), ("conv2", "bn2"))):
            w = _np(sd[f"conv_blocks.{i}.{conv}.weight"])
            blk[f"Conv_{j}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
            blk[f"BatchNorm_{j}"] = {
                "scale": _np(sd[f"conv_blocks.{i}.{bn}.weight"]),
                "bias": _np(sd[f"conv_blocks.{i}.{bn}.bias"]),
            }
            bs[f"BatchNorm_{j}"] = {
                "mean": _np(sd[f"conv_blocks.{i}.{bn}.running_mean"]),
                "var": _np(sd[f"conv_blocks.{i}.{bn}.running_var"]),
            }
        params[f"ConvBlock_{i}"] = blk
        stats[f"ConvBlock_{i}"] = bs
    params["Dense_0"] = {
        "kernel": _np(sd["event_fc.weight"]).T,
        "bias": _np(sd["event_fc.bias"]),
    }
    return params, stats


def mobilenet_from_torch(sd):
    """Reference MobileNetV1 state_dict -> flax {params, batch_stats}.

    Reference blocks (models/spectogram_models.py:42-125): ``features.0`` =
    conv_bn (Sequential indices: 0 conv, 2 bn); ``features.1..12`` = conv_dw
    (0 depthwise conv, 2 bn, 4 pointwise conv, 5 bn).  Flax modules:
    ``_ConvBN_0`` then ``_ConvDW_0.._ConvDW_11`` (models/cnn.py
    MOBILENET_STACK).  The reference's dead ``bn0`` (constructed, never
    called in forward) has no flax counterpart.
    """

    def conv(key):  # OIHW -> HWIO
        return {"kernel": np.transpose(_np(sd[key]), (2, 3, 1, 0))}

    def bn(prefix):
        return (
            {"scale": _np(sd[f"{prefix}.weight"]),
             "bias": _np(sd[f"{prefix}.bias"])},
            {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])},
        )

    params, stats = {}, {}
    p, s = bn("features.0.2")
    params["_ConvBN_0"] = {"Conv_0": conv("features.0.0.weight"),
                           "BatchNorm_0": p}
    stats["_ConvBN_0"] = {"BatchNorm_0": s}
    for i in range(1, 13):
        name = f"_ConvDW_{i - 1}"
        p0, s0 = bn(f"features.{i}.2")
        p1, s1 = bn(f"features.{i}.5")
        params[name] = {
            "Conv_0": conv(f"features.{i}.0.weight"),
            "BatchNorm_0": p0,
            "Conv_1": conv(f"features.{i}.4.weight"),
            "BatchNorm_1": p1,
        }
        stats[name] = {"BatchNorm_0": s0, "BatchNorm_1": s1}
    params["Dense_0"] = {"kernel": _np(sd["fc1.weight"]).T,
                         "bias": _np(sd["fc1.bias"])}
    params["Dense_1"] = {"kernel": _np(sd["fc_audioset.weight"]).T,
                         "bias": _np(sd["fc_audioset.bias"])}
    return params, stats


def m5_from_torch(sd):
    """Reference M5 state_dict -> flax {params, batch_stats}.

    Layer map (reference models/waveform_models.py:9-75): ``conv_block1`` is
    (0 conv, 1 bn); ``conv_block2..5`` are (0 conv, 1 bn, 3 conv, 4 bn); the
    head is ``fc``.  Our flax M5 (models/m5.py) names the nine conv/bn pairs
    Conv_0..8/BatchNorm_0..8 in the same call order and the head Dense_0.
    Conv1d weights (O, I, K) -> flax (K, I, O).
    """
    pairs = [("conv_block1", 0)]
    for b in range(2, 6):
        pairs += [(f"conv_block{b}", 0), (f"conv_block{b}", 3)]
    params, stats = {}, {}
    for j, (block, idx) in enumerate(pairs):
        w = _np(sd[f"{block}.{idx}.weight"])
        params[f"Conv_{j}"] = {"kernel": np.transpose(w, (2, 1, 0)),
                               "bias": _np(sd[f"{block}.{idx}.bias"])}
        bn = f"{block}.{idx + 1}"
        params[f"BatchNorm_{j}"] = {"scale": _np(sd[f"{bn}.weight"]),
                                    "bias": _np(sd[f"{bn}.bias"])}
        stats[f"BatchNorm_{j}"] = {"mean": _np(sd[f"{bn}.running_mean"]),
                                   "var": _np(sd[f"{bn}.running_var"])}
    params["Dense_0"] = {"kernel": _np(sd["fc.weight"]).T,
                         "bias": _np(sd["fc.bias"])}
    return params, stats


def load_reference_checkpoint(pth_path: str):
    """Read a reference ``.pth`` file -> (state_dict, iterations).

    Accepts both the training container {'iterations', 'model', 'optimizer'}
    (reference train.py:123-128) and a bare state_dict.  TRUSTED files only
    (torch.load unpickles).
    """
    import torch

    blob = torch.load(pth_path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model" in blob:
        return blob["model"], int(blob.get("iterations", 0))
    return blob, 0


ARCH_CONVERTERS = {
    "CnnAvgPooling": lambda sd, n_blocks: cnn_avg_pooling_from_torch(sd, n_blocks),
    "MobileNetV1": lambda sd, n_blocks: mobilenet_from_torch(sd),
    "M5": lambda sd, n_blocks: m5_from_torch(sd),
}


def import_torch_checkpoint(pth_path: str, model, sample_input,
                            outputs_dir: str, lr: float = 1e-4):
    """Convert a reference ``.pth`` into a sed_tpu msgpack checkpoint.

    ``model``: the matching flax module (CnnAvgPooling / MobileNetV1 / M5);
    ``sample_input``: a shape-correct input for init.  The optimizer state is
    FRESH (the reference's own resume is model-only — main.py:37-39), the
    step counter carries the reference's iteration count.  Returns the
    written checkpoint path.
    """
    import jax
    import jax.numpy as jnp

    from sed_tpu.train.checkpoint import save_checkpoint
    from sed_tpu.train.optim import make_optimizer
    from sed_tpu.train.state import init_state

    sd, iterations = load_reference_checkpoint(pth_path)
    name = type(model).__name__
    if name not in ARCH_CONVERTERS:
        raise ValueError(f"no torch converter for model {name!r}")
    n_blocks = len(getattr(model, "model_config", ()))
    params, stats = ARCH_CONVERTERS[name](sd, n_blocks)

    tx = make_optimizer(lr)
    state = init_state(model, jax.random.key(0), jnp.asarray(sample_input), tx)
    state = state.replace(
        step=iterations,
        params=jax.tree.map(lambda t, h: jnp.asarray(h).astype(t.dtype),
                            state.params, jax.tree.map(jnp.asarray, params)),
        batch_stats=jax.tree.map(lambda t, h: jnp.asarray(h).astype(t.dtype),
                                 state.batch_stats,
                                 jax.tree.map(jnp.asarray, stats)),
    )
    return save_checkpoint(state, outputs_dir, iterations)
