"""Export sed_tpu checkpoints back into the reference's torch format.

The inverse of :mod:`sed_tpu.train.torch_import`: flax ``{params,
batch_stats}`` trees -> torch ``state_dict`` keyed exactly like the
reference models, wrapped in the reference's checkpoint container
``{'iterations': N, 'model': state_dict, 'optimizer': {}}`` (reference
train.py:123-128), so a model trained here loads into the reference repo
with ``model.load_state_dict(checkpoint['model'])`` (reference
main.py:37-39) — migration works in BOTH directions.

Key maps are the exact inverses of torch_import.py's (which carry the
measured forward-parity numbers); buffers torch tracks but flax does not
(`num_batches_tracked` per BatchNorm; MobileNetV1's dead ``bn0``, reference
models/spectogram_models.py:46 — constructed but never called in forward)
are emitted at torch's fresh-init values.  Weight round-trips are exact:
every conversion is a transpose of the same float32 data
(tests/test_torch_import.py pins torch->sed->torch bit-equality).

CLI: ``python -m sed_tpu.cli.export_torch --ckpt .../iteration_N.ckpt
--arch CnnAvgPooling --out iteration_N.pth``.
"""

from __future__ import annotations

import numpy as np


def _t(a):
    """array-like -> contiguous CPU float32 torch tensor."""
    import torch

    return torch.from_numpy(np.ascontiguousarray(np.asarray(a, np.float32)))


def _bn_entries(prefix: str, p: dict, s: dict) -> dict:
    """flax BatchNorm {scale,bias} + {mean,var} -> the five torch BN keys."""
    import torch

    return {
        f"{prefix}.weight": _t(p["scale"]),
        f"{prefix}.bias": _t(p["bias"]),
        f"{prefix}.running_mean": _t(s["mean"]),
        f"{prefix}.running_var": _t(s["var"]),
        f"{prefix}.num_batches_tracked": torch.tensor(0, dtype=torch.long),
    }


def cnn_avg_pooling_to_torch(params, batch_stats) -> dict:
    """flax CnnAvgPooling tree -> reference Cnn_AvgPooling state_dict.

    Inverse of torch_import.cnn_avg_pooling_from_torch: flax
    ``ConvBlock_{i}/Conv_{j}`` HWIO kernels -> torch
    ``conv_blocks.{i}.{conv1,conv2}.weight`` OIHW (reference
    models/spectogram_models.py:128-160), ``Dense_0`` -> ``event_fc``.
    """
    sd = {}
    n_blocks = sum(1 for k in params if k.startswith("ConvBlock_"))
    for i in range(n_blocks):
        blk, bs = params[f"ConvBlock_{i}"], batch_stats[f"ConvBlock_{i}"]
        for j, (conv, bn) in enumerate((("conv1", "bn1"), ("conv2", "bn2"))):
            sd[f"conv_blocks.{i}.{conv}.weight"] = _t(
                np.transpose(blk[f"Conv_{j}"]["kernel"], (3, 2, 0, 1)))
            sd.update(_bn_entries(f"conv_blocks.{i}.{bn}",
                                  blk[f"BatchNorm_{j}"],
                                  bs[f"BatchNorm_{j}"]))
    sd["event_fc.weight"] = _t(np.asarray(params["Dense_0"]["kernel"]).T)
    sd["event_fc.bias"] = _t(params["Dense_0"]["bias"])
    return sd


def mobilenet_to_torch(params, batch_stats) -> dict:
    """flax MobileNetV1 tree -> reference MobileNetV1 state_dict.

    Inverse of torch_import.mobilenet_from_torch; the reference's dead
    ``bn0`` (BatchNorm2d(64), never called in forward —
    models/spectogram_models.py:46,105-107) has no flax counterpart and is
    emitted at its init_bn values (scale 1, rest 0/1) so strict
    ``load_state_dict`` succeeds.
    """
    import torch

    sd = dict(_bn_entries("bn0",
                          {"scale": np.ones(64), "bias": np.zeros(64)},
                          {"mean": np.zeros(64), "var": np.ones(64)}))

    def conv(key, kernel):  # HWIO -> OIHW
        sd[key] = _t(np.transpose(np.asarray(kernel), (3, 2, 0, 1)))

    p, s = params["_ConvBN_0"], batch_stats["_ConvBN_0"]
    conv("features.0.0.weight", p["Conv_0"]["kernel"])
    sd.update(_bn_entries("features.0.2", p["BatchNorm_0"], s["BatchNorm_0"]))
    for i in range(1, 13):
        p = params[f"_ConvDW_{i - 1}"]
        s = batch_stats[f"_ConvDW_{i - 1}"]
        conv(f"features.{i}.0.weight", p["Conv_0"]["kernel"])
        sd.update(_bn_entries(f"features.{i}.2",
                              p["BatchNorm_0"], s["BatchNorm_0"]))
        conv(f"features.{i}.4.weight", p["Conv_1"]["kernel"])
        sd.update(_bn_entries(f"features.{i}.5",
                              p["BatchNorm_1"], s["BatchNorm_1"]))
    sd["fc1.weight"] = _t(np.asarray(params["Dense_0"]["kernel"]).T)
    sd["fc1.bias"] = _t(params["Dense_0"]["bias"])
    sd["fc_audioset.weight"] = _t(np.asarray(params["Dense_1"]["kernel"]).T)
    sd["fc_audioset.bias"] = _t(params["Dense_1"]["bias"])
    return sd


def m5_to_torch(params, batch_stats) -> dict:
    """flax M5 tree -> reference M5 state_dict.

    Inverse of torch_import.m5_from_torch: flax Conv_0..8 (K, I, O) kernels
    -> torch ``conv_block{b}.{idx}.weight`` (O, I, K) in the same call
    order (reference models/waveform_models.py:15-56).
    """
    pairs = [("conv_block1", 0)]
    for b in range(2, 6):
        pairs += [(f"conv_block{b}", 0), (f"conv_block{b}", 3)]
    sd = {}
    for j, (block, idx) in enumerate(pairs):
        sd[f"{block}.{idx}.weight"] = _t(
            np.transpose(np.asarray(params[f"Conv_{j}"]["kernel"]),
                         (2, 1, 0)))
        sd[f"{block}.{idx}.bias"] = _t(params[f"Conv_{j}"]["bias"])
        sd.update(_bn_entries(f"{block}.{idx + 1}",
                              params[f"BatchNorm_{j}"],
                              batch_stats[f"BatchNorm_{j}"]))
    sd["fc.weight"] = _t(np.asarray(params["Dense_0"]["kernel"]).T)
    sd["fc.bias"] = _t(params["Dense_0"]["bias"])
    return sd


ARCH_EXPORTERS = {
    "CnnAvgPooling": cnn_avg_pooling_to_torch,
    "MobileNetV1": mobilenet_to_torch,
    "M5": m5_to_torch,
}


def export_torch_checkpoint(ckpt_path: str, model, sample_input,
                            pth_out: str) -> str:
    """Convert a sed_tpu msgpack checkpoint into a reference ``.pth``.

    ``model``/``sample_input``: the matching flax module + a shape-correct
    init input (same contract as torch_import.import_torch_checkpoint).
    The optimizer state is dropped ({} in the container) — the reference's
    own resume is model-only anyway (main.py:37-39); the step counter rides
    as ``iterations``.  Returns ``pth_out``.
    """
    import jax
    import jax.numpy as jnp
    import torch

    from sed_tpu.train.checkpoint import load_checkpoint
    from sed_tpu.train.optim import make_optimizer
    from sed_tpu.train.state import init_state

    name = type(model).__name__
    if name not in ARCH_EXPORTERS:
        raise ValueError(f"no torch exporter for model {name!r}")
    template = init_state(model, jax.random.key(0),
                          jnp.asarray(sample_input), make_optimizer(1e-4))
    state = load_checkpoint(ckpt_path, template)
    params = jax.tree.map(np.asarray, state.params)
    stats = jax.tree.map(np.asarray, state.batch_stats)
    sd = ARCH_EXPORTERS[name](params, stats)
    torch.save({"iterations": int(state.step), "model": sd,
                "optimizer": {}}, pth_out)
    return pth_out
