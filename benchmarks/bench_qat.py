"""QAT vs PTQ int8 fidelity on a trained model (models/qat.py).

The int8 serving artifact's speed is identical under PTQ and QAT (same
structure, same ``quantized_cnn_forward``); what QAT buys is FIDELITY — the
int8-vs-f32 sigmoid deviation and any AP impact.  This bench commits that
number on a realistically trained model:

  1. train CnnAvgPooling 800 steps on the deterministic synthetic doorslam
     corpus (benchmarks/ap_parity.py:56-111 — the same corpus every other
     fidelity bench here uses);
  2. PTQ the trained model (models/quantize.py) and score the val fold
     (featurized on-TPU at the parity tier): max sigmoid deviation vs the
     f32 forward + frame-AP delta;
  3. QAT fine-tune (distillation against the f32 teacher on train crops,
     models/qat.py) for SED_QAT_STEPS (default 300) Adam steps, export, and
     re-measure the same two numbers.

Reference context: the reference has no quantization at all; this extends
the serving story of /root/reference/infer.py:9-37.

Run: python benchmarks/bench_qat.py        (TPU; CPU works but is slow)
Writes benchmarks/QAT_BENCH.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

TRAIN_STEPS = 800
CORPUS_FILES = 16
CORPUS_SECONDS = 14.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import ap_parity
    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.data.events import create_event_matrix
    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
    from sed_tpu.models.qat import qat_export, qat_finetune, qat_init
    from sed_tpu.models.quantize import quantize_cnn, quantized_scores
    from sed_tpu.ops.featurizer import logmel_features_batch
    from sed_tpu.train.optim import make_optimizer
    from sed_tpu.train.state import init_state, make_eval_forward, make_train_step
    from sed_tpu.utils.metrics import calculate_metrics

    qat_steps = int(os.environ.get("SED_QAT_STEPS", "300"))
    qat_lr = float(os.environ.get("SED_QAT_LR", "3e-5"))
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind})")
    on_tpu = jax.default_backend() == "tpu"

    # ---- 1. corpus + training (mirrors bench_fast_featurizer.py) ----
    corpus_rng = np.random.default_rng(0)
    waves, all_starts, all_ends = [], [], []
    for _ in range(CORPUS_FILES):
        y, starts, ends = ap_parity.make_recording(corpus_rng, CORPUS_SECONDS)
        waves.append(y)
        all_starts.append(starts)
        all_ends.append(ends)
    oracle_feats = [ap_parity.oracle_logmel(y) for y in waves]
    events = [create_event_matrix(len(f), s, e, cfg)
              for f, s, e in zip(oracle_feats, all_starts, all_ends)]
    n_val = max(2, CORPUS_FILES // 5)
    train_f, val_f_feats = oracle_feats[:-n_val], oracle_feats[-n_val:]
    train_e, val_e = events[:-n_val], events[-n_val:]
    val_w = waves[-n_val:]
    allf = np.concatenate(train_f, axis=0)
    mean, std = allf.mean(axis=0), allf.std(axis=0)
    train_f = [(f - mean) / std for f in train_f]
    xs, ys = ap_parity.build_batches(train_f, train_e, TRAIN_STEPS, 64, seed=0)

    model = CnnAvgPooling(classes_num=cfg.classes_num,
                          model_config=TRAIN_CHANNEL_AND_POOL)
    tx = make_optimizer(1e-4)
    sample = jnp.zeros((1, cfg.train_crop_size, cfg.mel_bins, 1))
    state = init_state(model, jax.random.key(0), sample, tx)
    step_fn = make_train_step(model, tx, pos_weight=5.0, multi_frame=True)
    t0 = time.time()
    for i in range(TRAIN_STEPS):
        state, loss = step_fn(state, jnp.asarray(xs[i])[..., None],
                              jnp.asarray(ys[i]))
    log(f"trained {TRAIN_STEPS} steps in {time.time() - t0:.0f}s, "
        f"final loss {float(loss):.4f}")
    params, batch_stats = state.params, state.batch_stats

    # ---- 2. val-fold features (TPU parity featurizer) + f32 reference ----
    val_batch = np.stack([w[:, None] for w in val_w])  # (n_val, samples, 1)

    @jax.jit
    def val_features(vb):
        feats = logmel_features_batch(vb, cfg,
                                      use_pallas="full" if on_tpu else False)
        feats = (feats - jnp.asarray(mean)) / jnp.asarray(std)
        return jnp.transpose(feats, (0, 2, 3, 1))  # NHWC

    vx = val_features(jax.device_put(val_batch))
    vx.block_until_ready()

    fwd = make_eval_forward(model)
    ref_scores = np.asarray(jax.nn.sigmoid(fwd(params, batch_stats, vx)))

    def measure(q, label):
        sc = np.asarray(jax.jit(lambda v: quantized_scores(q, v))(vx))
        dev = float(np.max(np.abs(sc - ref_scores)))
        # calculate_metrics returns (recalls, precisions, ap) — AP is [2].
        aps = [calculate_metrics(sc[i], e)[2] for i, e in enumerate(val_e)]
        ref_aps = [calculate_metrics(ref_scores[i], e)[2]
                   for i, e in enumerate(val_e)]
        row = {"max_sigmoid_dev_vs_f32": dev,
               "val_ap": float(np.mean(aps)),
               "d_ap_vs_f32": float(np.mean(aps) - np.mean(ref_aps))}
        log(f"{label}: {row}")
        return row

    calib = [np.asarray(xs[i])[..., None] for i in range(3)]

    # ---- 3. PTQ baseline ----
    q_ptq = quantize_cnn(model, params, batch_stats, calib)
    ptq_row = measure(q_ptq, "PTQ")

    # ---- 4. QAT fine-tune ----
    # Distillation needs no labels, so the fine-tune set is FRESH unlabeled
    # recordings (same generator, unseen seeds) featurized like the val fold
    # — whole recordings, not training crops.  Measured ladder motivating
    # this (SED_QAT_SOURCE=crops): distilling on 30-frame train crops
    # improves val fidelity at 300 steps (0.0071 -> 0.0057) but OVERFITS
    # beyond that (600 steps 0.0080, 1200 @ 1e-4 0.027).
    source = os.environ.get("SED_QAT_SOURCE", "fresh")
    trainable, static = qat_init(model, params, batch_stats, calib)
    teacher = jax.jit(lambda x: fwd(params, batch_stats, x))
    examples = []
    if source == "fresh":
        fresh_w = []
        for _ in range(8):  # corpus_rng is already past the train/val draws
            y, _, _ = ap_parity.make_recording(corpus_rng, CORPUS_SECONDS)
            fresh_w.append(y)
        fresh_batch = np.stack([w[:, None] for w in fresh_w])
        fx = np.asarray(val_features(jax.device_put(fresh_batch)))
        for i in range(0, len(fx), 4):
            x = fx[i:i + 4]
            examples.append((x, np.asarray(teacher(jnp.asarray(x)))))
    else:  # 'crops': the overfitting-prone variant, kept as the A/B record
        ex_idx = list(range(0, TRAIN_STEPS, TRAIN_STEPS // 16))[:16]
        for i in ex_idx:
            x = np.asarray(xs[i])[..., None]
            examples.append((x, np.asarray(teacher(jnp.asarray(x)))))
    t0 = time.time()
    tuned = qat_finetune(trainable, static, examples, mode="distill",
                         steps=qat_steps, lr=qat_lr)
    log(f"QAT fine-tune: {qat_steps} steps in {time.time() - t0:.0f}s")
    qat_row = measure(qat_export(tuned, static), "QAT")

    out = {
        "bench": "qat_vs_ptq_int8_fidelity",
        "device_kind": dev.device_kind,
        "corpus": {"files": CORPUS_FILES, "seconds": CORPUS_SECONDS,
                   "train_steps": TRAIN_STEPS, "val_files": n_val},
        "qat": {"mode": "distill", "source": source, "steps": qat_steps,
                "lr": qat_lr, "examples": len(examples)},
        "f32_val_ap": float(np.mean(
            [calculate_metrics(ref_scores[i], e)[2]
             for i, e in enumerate(val_e)])),
        "ptq": ptq_row,
        "qat_result": qat_row,
        "fidelity_improvement": (
            ptq_row["max_sigmoid_dev_vs_f32"]
            / max(qat_row["max_sigmoid_dev_vs_f32"], 1e-12)),
    }
    with open(os.path.join(HERE, "QAT_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    log(f"wrote {os.path.join(HERE, 'QAT_BENCH.json')}")
    print(json.dumps({
        "metric": "int8 max sigmoid deviation (PTQ -> QAT)",
        "value": round(qat_row["max_sigmoid_dev_vs_f32"], 6),
        "unit": "max |sigmoid dev| vs f32",
        "ptq": round(ptq_row["max_sigmoid_dev_vs_f32"], 6),
        "improvement_x": round(out["fidelity_improvement"], 2),
    }))


if __name__ == "__main__":
    main()
