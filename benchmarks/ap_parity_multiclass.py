"""Multiclass AP parity: with class-indexed labels (PARITY.md divergence #6),
the training math still matches the torch reference per class.

The reference's rasterizer paints ALL class columns per event
(/root/reference/dataset/spectogram/spectograms_dataset.py:217) — a defect
masked by its hardcoded classes_num==1.  sed_tpu fixes it (class-indexed
painting, sed_tpu/data/events.py).  To show the *training math* is still
reference-exact under the fix, both frameworks here consume the SAME
class-indexed label batches — i.e. the torch reference "patched identically"
with the one-line per-class rasterizer fix — and we compare class-wise AP:

  1. deterministic synthetic 48 kHz corpus with THREE spectrally distinct
     event classes at non-overlapping times: 'knock' (tonal burst), 'doorslam'
     (decaying broadband burst), 'keysDrop' (up-chirp);
  2. float64 librosa-math oracle featurization (benchmarks/ap_parity.py);
  3. identical init (torch params copied into flax via the shipped importer)
     and identical precomputed crop batches, reference recipe exactly
     (WeightedBCE pos_weight=5, Adam amsgrad, lr x0.997/200 steps);
  4. per-class AP with each side's own metric code: the reference
     calculate_metrics applied per class column (torch side) vs
     sed_tpu.utils.metrics.calculate_metrics_per_class (jax side).

Pass: max per-class |dAP| < 0.5 points (the BASELINE.json north-star bar),
and each framework's per-class APs must themselves be distinct and
above-chance — evidence the classes carry different signals end to end.

Run:  python benchmarks/ap_parity_multiclass.py  [--steps 800 --batch 32]
Writes benchmarks/AP_PARITY_MULTICLASS.json + one summary JSON line.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sed_tpu.configs import SpectrogramConfig
from sed_tpu.data.events import create_event_matrix

CLASSES = ("knock", "doorslam", "keysDrop")
CFG = SpectrogramConfig(tau_sed_labels=CLASSES)


def _load_base():
    spec = importlib.util.spec_from_file_location(
        "ap_parity", os.path.join(REPO, "benchmarks", "ap_parity.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


base = _load_base()


def make_recording(rng: np.random.Generator, seconds: float):
    """Background noise + 1-2 events of each class at non-overlapping slots;
    returns (waveform float32, start_times, end_times, class_indices)."""
    sr = CFG.working_sample_rate
    n = int(sr * seconds)
    bg = np.convolve(rng.standard_normal(n), np.ones(32) / 32.0, mode="same")
    y = 0.02 * bg
    # Non-overlapping 1.4 s slots; each event occupies one random slot.
    slot_len = 1.4
    n_slots = int((seconds - 1.0) / slot_len)
    slots = rng.permutation(n_slots)
    starts, ends, cls = [], [], []
    k = 0
    for c in range(len(CLASSES)):
        for _ in range(int(rng.integers(1, 3))):
            if k >= len(slots):
                break
            t0 = 0.5 + slots[k] * slot_len + float(rng.uniform(0.0, 0.2))
            k += 1
            dur = float(rng.uniform(0.2, 0.5))
            i0, i1 = int(t0 * sr), int((t0 + dur) * sr)
            t = np.arange(i1 - i0) / sr
            decay = np.exp(-np.linspace(0.0, 6.0, i1 - i0))
            if c == 0:    # knock: tonal burst
                sig = np.sin(2 * np.pi * 700.0 * t)
            elif c == 1:  # doorslam: broadband burst
                sig = rng.standard_normal(i1 - i0)
            else:         # keysDrop: up-chirp
                sig = np.sin(2 * np.pi * (400.0 + 4000.0 * t) * t)
            y[i0:i1] += 0.6 * sig * decay
            starts.append(t0)
            ends.append(t0 + dur)
            cls.append(c)
    return y.astype(np.float32), starts, ends, cls


def build_corpus(n_files: int, seconds: float, seed: int):
    rng = np.random.default_rng(seed)
    feats, events = [], []
    for _ in range(n_files):
        y, starts, ends, cls = make_recording(rng, seconds)
        lm = base.oracle_logmel(y)
        feats.append(lm)
        # THE patched rasterization, consumed by BOTH frameworks.
        events.append(create_event_matrix(len(lm), starts, ends, CFG,
                                          class_indices=cls))
    n_val = max(2, n_files // 5)
    train_f, val_f = feats[:-n_val], feats[-n_val:]
    train_e, val_e = events[:-n_val], events[-n_val:]
    allf = np.concatenate(train_f, axis=0)
    mean, std = allf.mean(axis=0), allf.std(axis=0)
    return ([(f - mean) / std for f in train_f], train_e,
            [(f - mean) / std for f in val_f], val_e)


def torch_per_class_aps(model, val_f, val_e):
    """Reference calculate_metrics applied per class column."""
    from utils.metric_utils import calculate_metrics  # reference module

    aps = []
    for f, e in zip(val_f, val_e):
        scores = base.torch_scores(model, f)
        aps.append([calculate_metrics(scores[:, c:c + 1], e[:, c:c + 1])[2]
                    for c in range(len(CLASSES))])
    return np.mean(aps, axis=0)


def jax_per_class_aps(model, state, val_f, val_e):
    from sed_tpu.utils.metrics import calculate_metrics_per_class

    aps = []
    for f, e in zip(val_f, val_e):
        scores = base.jax_scores(model, state, f)
        aps.append(calculate_metrics_per_class(scores, e)[2])
    return np.mean(aps, axis=0)


def run(steps=800, batch=32, files=18, seconds=12.0, lr=1e-4, seed=0, log=print):
    # Route the shared helpers (batch builder, model builders) through the
    # 3-class config.
    base.CFG = CFG

    log(f"corpus: {files} x {seconds:.0f}s, classes={CLASSES}")
    train_f, train_e, val_f, val_e = build_corpus(files, seconds, seed)
    ev = np.concatenate(train_e)
    log(f"per-class positive-frame fractions: {ev.mean(axis=0).round(3).tolist()}")
    # The class columns must differ pairwise — the capability under test.
    for a in range(len(CLASSES)):
        for b in range(a + 1, len(CLASSES)):
            assert not np.array_equal(ev[:, a], ev[:, b]), (a, b)
    xs, ys = base.build_batches(train_f, train_e, steps, batch, seed)
    assert ys.shape[-1] == len(CLASSES)

    tmodel, init_sd, torch_loss = base.torch_train(xs, ys, lr, log=log)
    init_parity = base.initial_forward_parity(init_sd, val_f)
    log(f"init forward parity (max |logit diff|): {init_parity:.2e}")
    jmodel, state, jax_loss = base.jax_train(xs, ys, lr, init_sd, log=log)

    t_aps = torch_per_class_aps(tmodel, val_f, val_e)
    j_aps = jax_per_class_aps(jmodel, state, val_f, val_e)
    deltas = np.abs(t_aps - j_aps) * 100.0

    result = {
        "config": {"steps": steps, "batch": batch, "files": files,
                   "seconds": seconds, "lr": lr, "seed": seed,
                   "classes": list(CLASSES), "identical_init": True,
                   "identical_batches": True,
                   "label_semantics": "class-indexed (PARITY.md divergence #6)"},
        "init_forward_max_logit_diff": float(init_parity),
        "final_loss_delta": abs(torch_loss - jax_loss),
        "torch_ap_per_class": t_aps.tolist(),
        "sed_tpu_ap_per_class": j_aps.tolist(),
        "ap_delta_points_per_class": deltas.tolist(),
        "max_ap_delta_points": float(deltas.max()),
        "macro_ap_torch": float(t_aps.mean()),
        "macro_ap_sed_tpu": float(j_aps.mean()),
        "north_star": "per-class frame AP within 0.5 points",
        "pass": bool(deltas.max() < 0.5),
    }
    return result


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # CPU-determinism experiment
    import torch

    torch.set_num_threads(1)  # deterministic CPU reductions (ROADMAP note)

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--files", type=int, default=18)
    ap.add_argument("--seconds", type=float, default=12.0)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    result = run(args.steps, args.batch, args.files, args.seconds, args.lr,
                 args.seed, log=lambda *a: print(*a, file=sys.stderr))
    out_path = os.path.join(REPO, "benchmarks", "AP_PARITY_MULTICLASS.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps({
        "metric": "multiclass_per_class_ap_delta_max",
        "value": result["max_ap_delta_points"],
        "unit": "AP points",
        "per_class_torch": result["torch_ap_per_class"],
        "per_class_sed_tpu": result["sed_tpu_ap_per_class"],
        "pass": result["pass"],
    }))


if __name__ == "__main__":
    main()
