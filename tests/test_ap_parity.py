"""AP north-star parity (miniature): the torch reference stack and the
sed_tpu stack, started from identical parameters and fed identical batches,
must produce matching losses and frame AP (BASELINE.json: within 0.5 points).

The full-budget version of this experiment is benchmarks/ap_parity.py
(results committed in benchmarks/AP_PARITY.json); this test pins the
machinery at a small budget so regressions in model math, loss, or optimizer
semantics surface in CI.
"""

import importlib.util
import os
import sys

import numpy as np
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
    mod = _load_ap_parity()
    result = mod.run(steps=150, batch=32, files=10, seconds=10.0, lr=1e-4,
                     seed=0, log=lambda *a: None)
    # Model-math mapping: identical logits at the copied init.
    assert result["init_forward_max_logit_diff"] < 1e-4
    # North star at miniature budget: AP within 0.5 points.
    assert result["ap_delta_points"] < 0.5, result
