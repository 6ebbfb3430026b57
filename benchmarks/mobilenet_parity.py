"""MobileNetV1 numerical parity vs the reference torch model (C16 evidence).

The reference ships MobileNetV1 as part of the model family
(/root/reference/models/spectogram_models.py:42-125) but never wires it into
the CLI (main.py:36 keeps it commented out).  CnnAvgPooling and M5 both carry
torch oracles; this harness closes the remaining evidence hole by measuring

  * parameter-count parity: torch trainable params == flax params, after
    subtracting the reference's ``bn0`` — a BatchNorm2d(64) that is
    constructed and initialized but never used in forward
    (spectogram_models.py:46,105-107: every use is commented out), a disclosed
    divergence (PARITY.md): we do not instantiate dead parameters;
  * init-forward parity: the torch state_dict copied into the flax tree, both
    models run on the same random log-mel inputs, max |score diff| reported
    (both emit sigmoid confidences interpolated 8x in forward,
    spectogram_models.py:117-122);
  * int8 PTQ fidelity: the quantized MobileNet serving path
    (models/quantize.py) vs the flax float forward on the same inputs.

The reference forward's stray ``x.transpose(0, 1)`` (spectogram_models.py:105,
documented in models/cnn.py) means the torch input layout is
(channels, batch, frames, mel); the flax model takes standard NHWC.

Run:  python benchmarks/mobilenet_parity.py          (CPU is fine)
Writes benchmarks/MOBILENET_PARITY.json and prints one summary JSON line.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)


def torch_mobilenet_to_flax(sd):
    """Map the reference MobileNetV1 state_dict into flax {params, batch_stats}.

    Delegates to the SHIPPED converter (sed_tpu/train/torch_import.py) so the
    parity this harness measures certifies the user-facing checkpoint
    importer, not a private copy."""
    from sed_tpu.train.torch_import import mobilenet_from_torch

    return mobilenet_from_torch(sd)


def run(classes_num: int = 1, frames: int = 240, mel: int = 64,
        batch: int = 2, seed: int = 0, log=print):
    import torch

    torch.set_num_threads(1)  # deterministic CPU reductions (ROADMAP note)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from models.spectogram_models import MobileNetV1 as TorchMobileNet

    import jax
    import jax.numpy as jnp

    from sed_tpu.models.cnn import MobileNetV1

    torch.manual_seed(seed)
    tmodel = TorchMobileNet(classes_num)
    tmodel.eval()
    sd = tmodel.state_dict()

    # --- parameter counts --------------------------------------------------
    torch_total = sum(p.numel() for p in tmodel.parameters() if p.requires_grad)
    bn0_params = sum(p.numel() for p in tmodel.bn0.parameters())  # dead: 128
    jmodel = MobileNetV1(classes_num=classes_num)
    variables = jmodel.init(jax.random.key(0),
                            jnp.zeros((1, frames, mel, 1)), train=False)
    flax_total = sum(int(np.prod(p.shape))
                     for p in jax.tree.leaves(variables["params"]))
    log(f"params: torch {torch_total} (incl. dead bn0 {bn0_params}) "
        f"vs flax {flax_total}")
    assert torch_total - bn0_params == flax_total, (torch_total, flax_total)

    # --- init-forward parity ----------------------------------------------
    params, stats = torch_mobilenet_to_flax(sd)
    params = jax.tree.map(jnp.asarray, params)
    stats = jax.tree.map(jnp.asarray, stats)
    chex_missing = jax.tree.structure(variables["params"]) != jax.tree.structure(params)
    assert not chex_missing, "flax param tree does not match the mapped torch tree"

    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((batch, frames, mel, 1)) * 2.0).astype(np.float32)

    with torch.no_grad():
        # torch layout: (channels, batch, frames, mel); forward transposes 0,1.
        t_out = tmodel(torch.from_numpy(
            np.transpose(x, (3, 0, 1, 2)))).numpy()
    fwd = jax.jit(lambda p, s, v: jmodel.apply(
        {"params": p, "batch_stats": s}, v, train=False))
    j_out = np.asarray(fwd(params, stats, jnp.asarray(x)))
    assert t_out.shape == j_out.shape, (t_out.shape, j_out.shape)
    fwd_diff = float(np.abs(t_out - j_out).max())
    log(f"init-forward parity (max |sigmoid score diff|): {fwd_diff:.2e}")

    # --- int8 PTQ fidelity (pointwise convs + dense heads quantized) -------
    from sed_tpu.models.quantize import (quantize_mobilenet,
                                         quantized_mobilenet_forward)

    q = quantize_mobilenet(jmodel, params, stats, [x])
    q_out = np.asarray(jax.jit(
        lambda v: quantized_mobilenet_forward(q, v))(jnp.asarray(x)))
    int8_diff = float(np.abs(q_out - j_out).max())
    log(f"int8 PTQ vs f32 (max |sigmoid score diff|): {int8_diff:.2e}")

    return {
        "classes_num": classes_num,
        "frames": frames,
        "mel_bins": mel,
        "torch_params_total": int(torch_total),
        "torch_dead_bn0_params": int(bn0_params),
        "flax_params_total": int(flax_total),
        "param_count_match_minus_dead_bn0": True,
        "init_forward_max_score_diff": fwd_diff,
        "int8_vs_f32_max_score_diff": int8_diff,
    }


def main():
    result = run()
    path = os.path.join(REPO, "benchmarks", "MOBILENET_PARITY.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps({
        "metric": "MobileNetV1 init-forward parity vs torch reference",
        "value": result["init_forward_max_score_diff"],
        "unit": "max |sigmoid score diff|",
        "params": [result["torch_params_total"], result["flax_params_total"]],
    }))


if __name__ == "__main__":
    main()
