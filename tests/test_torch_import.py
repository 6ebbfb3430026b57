"""Checkpoint migration: reference torch .pth -> sed_tpu checkpoint.

Builds the ACTUAL reference torch models (imported from /root/reference as
the oracle, the same pattern as the parity harnesses), saves a
reference-format checkpoint container (reference train.py:123-128), imports
it with the migration CLI (sed_tpu/cli/import_torch.py), and pins forward
parity between the torch model and the restored sed_tpu model.  This also
supplies the C17 (M5) numerical forward oracle that previously existed only
as a parameter-count match.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo unavailable")


def _save_reference_ckpt(tmp_path, model, iterations=123):
    import torch

    pth = str(tmp_path / f"iteration_{iterations}.pth")
    torch.save({"iterations": iterations, "model": model.state_dict(),
                "optimizer": {}}, pth)
    return pth


def test_import_cnn_checkpoint_forward_parity(tmp_path):
    import torch

    torch.set_num_threads(1)  # deterministic CPU reductions (ROADMAP note)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from models.spectogram_models import Cnn_AvgPooling as TorchCnn

    import jax.numpy as jnp

    from sed_tpu.cli.import_torch import main as import_main
    from sed_tpu.cli.infer import load_model_and_state
    from sed_tpu.configs import SpectrogramConfig
    from sed_tpu.train.state import make_eval_forward

    cfg = SpectrogramConfig()
    torch.manual_seed(0)
    tmodel = TorchCnn(cfg.classes_num,
                      model_config=[(32, 2), (64, 2), (128, 2), (128, 1)])
    tmodel.eval()
    pth = _save_reference_ckpt(tmp_path, tmodel)

    out_dir = str(tmp_path / "imported")
    ckpt = import_main(["--pth", pth, "--out", out_dir,
                        "--arch", "CnnAvgPooling"])
    assert ckpt.endswith("iteration_123.ckpt") and os.path.exists(ckpt)

    # The imported checkpoint loads through the standard inference loader
    # (model-only semantics: fresh optimizer state and step, like the
    # reference's own resume — the iteration lives in the filename).
    model, state = load_model_and_state(ckpt, cfg)
    fwd = make_eval_forward(model)

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((60, cfg.mel_bins)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(feats)[None, None]).numpy()[0]
    j_out = np.asarray(fwd(state.params, state.batch_stats,
                           jnp.asarray(feats)[None, :, :, None]))[0]
    assert np.max(np.abs(t_out - j_out)) < 1e-4


@pytest.mark.parametrize("arch", ["CnnAvgPooling", "MobileNetV1", "M5"])
def test_export_round_trips_torch_checkpoint(tmp_path, arch):
    """Bidirectional migration: torch .pth -> sed_tpu ckpt -> torch .pth
    must round-trip BIT-EXACTLY (every conversion is a transpose of the
    same float32 data) and strict-load into a fresh reference model."""
    import torch

    torch.set_num_threads(1)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from models.spectogram_models import Cnn_AvgPooling as TorchCnn
    from models.spectogram_models import MobileNetV1 as TorchMobileNet
    from models.waveform_models import M5 as TorchM5

    from sed_tpu.cli.export_torch import main as export_main
    from sed_tpu.cli.import_torch import main as import_main

    torch.manual_seed(3)
    if arch == "CnnAvgPooling":
        tmodel = TorchCnn(1, model_config=[(32, 2), (64, 2), (128, 2),
                                           (128, 1)])
    elif arch == "MobileNetV1":
        tmodel = TorchMobileNet(1)
    else:
        tmodel = TorchM5(1)
    with torch.no_grad():  # nontrivial running stats, like the import tests
        for m in tmodel.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.add_(0.1 * torch.randn_like(m.running_mean))
                m.running_var.mul_(1.3)
    pth = _save_reference_ckpt(tmp_path, tmodel, iterations=42)

    ckpt = import_main(["--pth", pth, "--out", str(tmp_path / "roundtrip"),
                        "--arch", arch])
    pth2 = export_main(["--ckpt", ckpt, "--arch", arch,
                        "--out", str(tmp_path / "exported.pth")])

    blob = torch.load(pth2, map_location="cpu", weights_only=False)
    assert blob["iterations"] == 42
    fresh = type(tmodel)(1, model_config=[(32, 2), (64, 2), (128, 2),
                                          (128, 1)]) \
        if arch == "CnnAvgPooling" else type(tmodel)(1)
    fresh.load_state_dict(blob["model"], strict=True)  # every key, no extras

    orig = tmodel.state_dict()
    for k, v in fresh.state_dict().items():
        if k.endswith("num_batches_tracked") or k.startswith("bn0."):
            # No flax counterpart: BN step counters, and MobileNetV1's dead
            # bn0 (constructed but never called in forward — reference
            # models/spectogram_models.py:46,105-107); both export at
            # torch's fresh-init values.
            continue
        assert torch.equal(v, orig[k]), f"{arch}: {k} not bit-equal"


def test_import_m5_checkpoint_forward_parity(tmp_path):
    """C17 numerical oracle: the reference M5's trained-state forward equals
    the flax M5 restored from the imported checkpoint (logits, 1e-4)."""
    import torch

    torch.set_num_threads(1)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from models.waveform_models import M5 as TorchM5

    import jax

    from sed_tpu.cli.import_torch import main as import_main
    from sed_tpu.configs import WaveformConfig
    from sed_tpu.models.m5 import M5
    from sed_tpu.train.checkpoint import load_checkpoint
    from sed_tpu.train.optim import make_optimizer
    from sed_tpu.train.state import init_state

    import jax.numpy as jnp

    wcfg = WaveformConfig()
    torch.manual_seed(1)
    tmodel = TorchM5(wcfg.classes_num)
    # Perturb BN stats so the test distinguishes running stats from defaults.
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.add_(0.1 * torch.randn_like(m.running_mean))
                m.running_var.mul_(1.3)
    tmodel.eval()
    pth = _save_reference_ckpt(tmp_path, tmodel, iterations=7)

    out_dir = str(tmp_path / "imported_m5")
    ckpt = import_main(["--pth", pth, "--out", out_dir, "--arch", "M5"])

    model = M5(classes_num=wcfg.classes_num)
    sample = jnp.zeros((1, wcfg.frame_size, 1))
    template = init_state(model, jax.random.key(0), sample,
                          make_optimizer(1e-4))
    state = load_checkpoint(ckpt, template, model_only=True)

    rng = np.random.default_rng(1)
    wav = (0.2 * rng.standard_normal((2, wcfg.frame_size))).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(wav)[:, None, :]).numpy()
    j_out = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(wav)[..., None], train=False))
    assert np.max(np.abs(t_out - j_out)) < 1e-4
