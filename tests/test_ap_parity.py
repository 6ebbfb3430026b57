"""AP north-star parity (miniature): the torch reference stack and the
sed_tpu stack, started from identical parameters and fed identical batches,
must track each other through training.

The full-budget version of this experiment is benchmarks/ap_parity.py, whose
committed result (benchmarks/AP_PARITY.json) carries the BASELINE.json claim
(frame AP within 0.5 points: measured delta 0.32).  This CI pin asserts the
sharp invariants — identical init logits and closely tracking final losses —
plus a loose AP sanity bound: at miniature budget the AP itself sits on
21-threshold quantization boundaries of a tiny val set and can flip by >1
point from torch's CPU thread-count nondeterminism, so it is not a stable
regression signal (the losses are).
"""

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_ap_parity():
    spec = importlib.util.spec_from_file_location(
        "ap_parity", os.path.join(REPO, "benchmarks", "ap_parity.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_ap_parity_miniature():
    import torch

    torch.set_num_threads(1)  # deterministic CPU reductions
    mod = _load_ap_parity()
    result = mod.run(steps=150, batch=32, files=10, seconds=10.0, lr=1e-4,
                     seed=0, log=lambda *a: None)
    # Model-math mapping: identical logits at the copied init.
    assert result["init_forward_max_logit_diff"] < 1e-4
    # Trajectory parity: final losses track to float-drift level.
    assert result["final_loss_delta"] < 5e-3, result
    # AP sanity at miniature budget (the tight 0.5-pt claim lives in the
    # full-budget committed benchmark).
    assert result["ap_delta_points"] < 3.0, result


@pytest.mark.slow
def test_ap_parity_multiclass_miniature():
    """Multiclass trajectory parity (miniature): 3-class class-indexed labels
    through both frameworks from identical init/batches.  Sharp invariants
    only (init logits, final loss); the tight per-class 0.5-pt AP claim lives
    in benchmarks/AP_PARITY_MULTICLASS.json at full budget."""
    import importlib.util

    import numpy as np
    import torch

    torch.set_num_threads(1)
    spec = importlib.util.spec_from_file_location(
        "ap_parity_multiclass",
        os.path.join(REPO, "benchmarks", "ap_parity_multiclass.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    result = mod.run(steps=120, batch=16, files=8, seconds=10.0, lr=1e-4,
                     seed=0, log=lambda *a: None)
    assert result["init_forward_max_logit_diff"] < 1e-4
    assert result["final_loss_delta"] < 5e-3, result
    assert len(result["torch_ap_per_class"]) == 3
    assert np.all(np.isfinite(result["torch_ap_per_class"]))
    # Loose AP sanity at miniature budget (21-threshold quantization noise).
    assert result["max_ap_delta_points"] < 3.0, result
