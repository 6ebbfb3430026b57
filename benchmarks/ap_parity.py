"""AP north-star parity: train the reference torch stack and the sed_tpu stack
on IDENTICAL data and compare frame-level average precision.

BASELINE.json's headline claim is "frame-level AP within 0.5 points of the
reference".  This experiment proves it end-to-end:

  1. build a deterministic synthetic 48 kHz corpus (doorslam-like broadband
     bursts over colored background noise) with known event times;
  2. featurize once with the float64 librosa-math oracle (the same math the
     golden tests in tests/test_features.py pin to <=1e-4 dB);
  3. initialize the reference torch ``Cnn_AvgPooling`` (models/
     spectogram_models.py:163-205) and COPY its initial parameters into the
     flax model, so both stacks start from the same point;
  4. train both with the reference recipe — WeightedBCE(pos_weight=5,
     multi_frame=True) (utils/common.py:11-30), Adam(amsgrad=True)
     (train.py:85), lr x0.997 every 200 steps (train.py:108-110) — on the
     SAME precomputed crop batches (augmentation off for determinism);
  5. evaluate both on held-out whole recordings with each side's own metrics
     code (reference utils/metric_utils.py:4-37 vs sed_tpu.utils.metrics,
     themselves golden-equal) and report mean AP / max F1.

The torch side drives the reference's own modules imported from
/root/reference (loss, model, metrics), replicating train.py:93-110's update
math without its DataLoader; batches bypass both data pipelines because crop
sampling/normalization parity is separately golden-tested
(tests/test_data.py, tests/test_fuzz.py).

Run:  python benchmarks/ap_parity.py  [--steps 1500 --batch 64 --files 28]
Writes benchmarks/AP_PARITY.json and prints one summary JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)

from sed_tpu.configs import SpectrogramConfig
from sed_tpu.data.events import create_event_matrix
from sed_tpu.ops import mel as mel_ops

CFG = SpectrogramConfig()


# ---------------------------------------------------------------------------
# Synthetic corpus + float64 oracle featurization
# ---------------------------------------------------------------------------

def make_recording(rng: np.random.Generator, seconds: float):
    """Background colored noise + 1-4 doorslam-like bursts; returns
    (waveform float32, start_times, end_times)."""
    sr = CFG.working_sample_rate
    n = int(sr * seconds)
    # Background: low-amplitude brownish noise (cumsum-filtered white).
    bg = rng.standard_normal(n)
    bg = np.convolve(bg, np.ones(32) / 32.0, mode="same")
    y = 0.02 * bg
    starts, ends = [], []
    for _ in range(int(rng.integers(1, 5))):
        dur = float(rng.uniform(0.15, 0.45))
        t0 = float(rng.uniform(0.5, seconds - 1.0))
        i0, i1 = int(t0 * sr), int((t0 + dur) * sr)
        burst = rng.standard_normal(i1 - i0)
        decay = np.exp(-np.linspace(0.0, 6.0, i1 - i0))
        y[i0:i1] += 0.6 * burst * decay
        starts.append(t0)
        ends.append(t0 + dur)
    return y.astype(np.float32), starts, ends


def oracle_logmel(y: np.ndarray) -> np.ndarray:
    """float64 librosa-math log-mel (the tests' oracle), (frames, mel) f32."""
    n_fft, hop, win = CFG.nfft, CFG.hop_size, CFG.frame_size
    window = np.hanning(win)
    wpad = np.zeros(n_fft)
    lpad = (n_fft - win) // 2
    wpad[lpad:lpad + win] = window
    ypad = np.pad(y.astype(np.float64), n_fft // 2, mode="reflect")
    n_frames = 1 + len(y) // hop
    frames = np.stack([ypad[t * hop:t * hop + n_fft] for t in range(n_frames)])
    spec = np.fft.rfft(frames * wpad, n=n_fft, axis=-1)
    power = np.abs(spec) ** 2
    fb = mel_ops.mel_filterbank(CFG, dtype=np.float64)
    return (10.0 * np.log10(np.maximum(1e-10, power @ fb))).astype(np.float32)


def build_corpus(n_files: int, seconds: float, seed: int):
    """Returns (train_features, train_events, val_features, val_events),
    features normalized by global train-fold mean/std per mel bin (reference
    preprocess.py:48-57 + spectograms_dataset transform)."""
    rng = np.random.default_rng(seed)
    feats, events = [], []
    for _ in range(n_files):
        y, starts, ends = make_recording(rng, seconds)
        lm = oracle_logmel(y)
        feats.append(lm)
        events.append(create_event_matrix(len(lm), starts, ends, CFG))
    n_val = max(2, n_files // 5)
    train_f, val_f = feats[:-n_val], feats[-n_val:]
    train_e, val_e = events[:-n_val], events[-n_val:]
    allf = np.concatenate(train_f, axis=0)
    mean, std = allf.mean(axis=0), allf.std(axis=0)
    train_f = [(f - mean) / std for f in train_f]
    val_f = [(f - mean) / std for f in val_f]
    return train_f, train_e, val_f, val_e


def build_batches(train_f, train_e, steps: int, batch: int, seed: int):
    """Precompute identical crop batches for both frameworks: (steps, B, 30,
    64) features + (steps, B, 30, classes) labels, crops drawn from the
    time-concatenated train fold (reference spectograms_dataset.py:58-78)."""
    feats = np.concatenate(train_f, axis=0)
    evts = np.concatenate(train_e, axis=0)
    crop = CFG.train_crop_size
    rng = np.random.default_rng(seed + 1)
    starts = rng.integers(0, len(feats) - crop, size=(steps, batch))
    xs = feats[(starts[..., None] + np.arange(crop)).reshape(-1)].reshape(
        steps, batch, crop, CFG.mel_bins)
    ys = evts[(starts[..., None] + np.arange(crop)).reshape(-1)].reshape(
        steps, batch, crop, CFG.classes_num)
    return xs.astype(np.float32), ys.astype(np.float32)


# ---------------------------------------------------------------------------
# torch (reference) side
# ---------------------------------------------------------------------------

def torch_train(xs, ys, lr: float, classes_num: int = None, log=print):
    """Train the reference stack on precomputed batches; returns
    (model, init_state_dict, final_loss)."""
    import torch

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from models.spectogram_models import Cnn_AvgPooling  # reference module
    from utils.common import WeightedBCE  # reference loss

    torch.manual_seed(0)
    model = Cnn_AvgPooling(classes_num or CFG.classes_num,
                           model_config=[(32, 2), (64, 2), (128, 2), (128, 1)])
    criterion = WeightedBCE(recall_factor=5, multi_frame=True)
    opt = torch.optim.Adam(model.parameters(), lr=lr, betas=(0.9, 0.999),
                           eps=1e-8, weight_decay=0.0, amsgrad=True)
    init_sd = {k: v.detach().clone() for k, v in model.state_dict().items()}

    steps = len(xs)
    for i in range(steps):
        model.train()
        x = torch.from_numpy(xs[i]).unsqueeze(1)  # (B, 1, frames, mel)
        y = torch.from_numpy(ys[i])
        out = model(x)
        loss = criterion(out, y)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if (i + 1) % 200 == 0:  # train.py:108-110
            for g in opt.param_groups:
                g["lr"] *= 0.997
        if (i + 1) % max(1, steps // 5) == 0:
            log(f"  torch step {i + 1}/{steps} loss={loss.item():.4f}")
    return model, init_sd, float(loss.item())


def torch_scores(model, f):
    """Sigmoid scores of one (frames, mel) validation recording."""
    import torch

    model.eval()
    with torch.no_grad():
        x = torch.from_numpy(f).unsqueeze(0).unsqueeze(0)
        return torch.sigmoid(model(x))[0].numpy()


def torch_train_and_eval(xs, ys, val_f, val_e, lr: float, log=print):
    model, init_sd, final_loss = torch_train(xs, ys, lr, log=log)
    from utils.metric_utils import calculate_metrics, f_score  # reference metrics (path set by torch_train)
    aps, recs, precs = [], [], []
    for f, e in zip(val_f, val_e):
        # calculate_metrics returns (recalls, precisions, AP) — metric_utils
        # .py:21.  A prior revision unpacked this as (ap, r, p), recording
        # mean RECALL as "mean_ap" (both frameworks identically, so the
        # trajectory-parity conclusion held, but the quantity was mislabeled
        # — same defect ROADMAP #26 fixed in bench_qat.py).  Fixed round 4;
        # AP_PARITY*.json regenerated.
        r, p, ap = calculate_metrics(torch_scores(model, f), e)
        aps.append(ap)
        recs.append(r)
        precs.append(p)
    avg_r, avg_p = np.mean(recs, axis=0), np.mean(precs, axis=0)
    f1 = float(np.max(f_score(avg_r, avg_p, precision_importance_factor=1)))
    return float(np.mean(aps)), f1, init_sd, final_loss


def torch_params_to_flax(init_sd, n_blocks: int):
    """Map the reference state_dict into flax {params, batch_stats} trees.

    Delegates to the SHIPPED converter (sed_tpu/train/torch_import.py) so the
    parity this harness measures certifies the user-facing checkpoint
    importer, not a private copy."""
    from sed_tpu.train.torch_import import cnn_avg_pooling_from_torch

    return cnn_avg_pooling_from_torch(init_sd, n_blocks)


# ---------------------------------------------------------------------------
# sed_tpu (jax) side
# ---------------------------------------------------------------------------

def jax_train(xs, ys, lr: float, torch_init_sd, classes_num: int = None, log=print):
    """Train the sed_tpu stack from the torch init on the same batches;
    returns (model, state, final_loss)."""
    import jax
    import jax.numpy as jnp

    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
    from sed_tpu.train.optim import make_optimizer
    from sed_tpu.train.state import init_state, make_train_step

    model = CnnAvgPooling(classes_num=classes_num or CFG.classes_num,
                          model_config=TRAIN_CHANNEL_AND_POOL)
    tx = make_optimizer(lr)
    sample = jnp.zeros((1, CFG.train_crop_size, CFG.mel_bins, 1))
    state = init_state(model, jax.random.key(0), sample, tx)

    params, stats = torch_params_to_flax(torch_init_sd, len(TRAIN_CHANNEL_AND_POOL))
    to_tree = lambda host: jax.tree.map(jnp.asarray, host)
    state = state.replace(
        params=jax.tree.map(lambda t, h: jnp.asarray(h).astype(t.dtype),
                            state.params, to_tree(params)),
        batch_stats=jax.tree.map(lambda t, h: jnp.asarray(h).astype(t.dtype),
                                 state.batch_stats, to_tree(stats)),
    )

    step_fn = make_train_step(model, tx, pos_weight=5.0, multi_frame=True)
    steps = len(xs)
    for i in range(steps):
        x = jnp.asarray(xs[i])[..., None]  # NHWC (B, frames, mel, 1)
        y = jnp.asarray(ys[i])
        state, loss = step_fn(state, x, y)
        if (i + 1) % max(1, steps // 5) == 0:
            log(f"  jax   step {i + 1}/{steps} loss={float(loss):.4f}")
    return model, state, float(loss)


def jax_scores(model, state, f):
    """Sigmoid scores of one (frames, mel) validation recording."""
    import jax
    import jax.numpy as jnp

    from sed_tpu.train.state import make_eval_forward

    fwd = make_eval_forward(model)
    x = jnp.asarray(f)[None, :, :, None]
    return np.asarray(jax.nn.sigmoid(fwd(state.params, state.batch_stats, x)))[0]


def jax_train_and_eval(xs, ys, val_f, val_e, lr: float, torch_init_sd, log=print):
    from sed_tpu.utils.metrics import calculate_metrics, f_score

    model, state, final_loss = jax_train(xs, ys, lr, torch_init_sd, log=log)
    aps, recs, precs = [], [], []
    for f, e in zip(val_f, val_e):
        # (recalls, precisions, AP) — see the unpack-order note in
        # torch_train_and_eval.
        r, p, ap = calculate_metrics(jax_scores(model, state, f), e)
        aps.append(ap)
        recs.append(r)
        precs.append(p)
    avg_r, avg_p = np.mean(recs, axis=0), np.mean(precs, axis=0)
    f1 = float(np.max(f_score(avg_r, avg_p, precision_importance_factor=1)))
    return float(np.mean(aps)), f1, final_loss


def initial_forward_parity(torch_init_sd, val_f):
    """Max |logit diff| between the two frameworks at the copied init —
    a direct check of the model-math mapping before any training."""
    import torch
    import jax
    import jax.numpy as jnp

    from models.spectogram_models import Cnn_AvgPooling as TorchCnn
    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
    from sed_tpu.train.state import make_eval_forward

    tmodel = TorchCnn(CFG.classes_num, model_config=[(32, 2), (64, 2), (128, 2), (128, 1)])
    tmodel.load_state_dict(torch_init_sd)
    tmodel.eval()
    params, stats = torch_params_to_flax(torch_init_sd, 4)
    jmodel = CnnAvgPooling(classes_num=CFG.classes_num, model_config=TRAIN_CHANNEL_AND_POOL)
    fwd = make_eval_forward(jmodel)
    worst = 0.0
    for f in val_f[:2]:
        with torch.no_grad():
            t_out = tmodel(torch.from_numpy(f).unsqueeze(0).unsqueeze(0)).numpy()[0]
        j_out = np.asarray(fwd(jax.tree.map(jnp.asarray, params),
                               jax.tree.map(jnp.asarray, stats),
                               jnp.asarray(f)[None, :, :, None]))[0]
        worst = max(worst, float(np.abs(t_out - j_out).max()))
    return worst


def run(steps=1500, batch=64, files=28, seconds=14.0, lr=1e-4, seed=0, log=print):
    log(f"corpus: {files} x {seconds:.0f}s @ {CFG.working_sample_rate} Hz")
    train_f, train_e, val_f, val_e = build_corpus(files, seconds, seed)
    pos_frac = float(np.concatenate(train_e).mean())
    log(f"positive-frame fraction: {pos_frac:.3f}; "
        f"train frames {sum(len(f) for f in train_f)}, val files {len(val_f)}")
    xs, ys = build_batches(train_f, train_e, steps, batch, seed)

    torch_ap, torch_f1, init_sd, torch_loss = torch_train_and_eval(
        xs, ys, val_f, val_e, lr, log)
    init_parity = initial_forward_parity(init_sd, val_f)
    log(f"init forward parity (max |logit diff|): {init_parity:.2e}")
    jax_ap, jax_f1, jax_loss = jax_train_and_eval(xs, ys, val_f, val_e, lr,
                                                  init_sd, log)

    result = {
        "config": {"steps": steps, "batch": batch, "files": files,
                   "seconds": seconds, "lr": lr, "seed": seed,
                   "sample_rate": CFG.working_sample_rate,
                   "identical_init": True, "identical_batches": True,
                   "augmentation": False},
        "positive_frame_fraction": pos_frac,
        "init_forward_max_logit_diff": init_parity,
        "torch": {"mean_ap": torch_ap, "max_f1": torch_f1,
                  "final_loss": torch_loss},
        "sed_tpu": {"mean_ap": jax_ap, "max_f1": jax_f1,
                    "final_loss": jax_loss},
        "final_loss_delta": abs(torch_loss - jax_loss),
        "ap_delta_points": abs(torch_ap - jax_ap) * 100.0,
        "north_star": "frame AP within 0.5 points (BASELINE.json)",
        "pass": bool(abs(torch_ap - jax_ap) * 100.0 < 0.5),
    }
    return result


def main():
    # The trajectory comparison is a CPU-determinism experiment (the torch
    # reference is CPU); redirect JAX off the axon TPU relay.  Must happen
    # before any backend query (see tests/conftest.py).
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--files", type=int, default=28)
    ap.add_argument("--seconds", type=float, default=14.0)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default="AP_PARITY.json",
                    help="output JSON filename under benchmarks/")
    args = ap.parse_args()

    result = run(args.steps, args.batch, args.files, args.seconds, args.lr,
                 args.seed, log=lambda *a: print(*a, file=sys.stderr))
    out_path = os.path.join(REPO, "benchmarks", args.out)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps({
        "metric": "frame_ap_delta_vs_reference",
        "value": result["ap_delta_points"],
        "unit": "AP points",
        "torch_ap": result["torch"]["mean_ap"],
        "sed_tpu_ap": result["sed_tpu"]["mean_ap"],
        "pass": result["pass"],
    }))


if __name__ == "__main__":
    main()
