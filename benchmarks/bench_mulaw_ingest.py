"""µ-law uint8 ingest tier: score fidelity + AP impact on a trained model (TPU).

bench.py measures the tier's END-TO-END rate and its sigmoid deviation on a
random-init model every driver run; this bench pins the fidelity claim the
way the featurizer precision tiers were judged (FAST_FEATURIZER.json):

  1. train CnnAvgPooling 800 steps on the deterministic synthetic doorslam
     corpus (the AP-parity harness's corpus, benchmarks/ap_parity.py);
  2. score the val fold from int16 PCM16 wire vs uint8 µ-law wire (same
     audio, both through the production fused Pallas featurizer);
  3. record max |sigmoid deviation|, frame-AP delta, and max-F1 delta.

Also measures the HBM-resident decode overhead (uint8 pipeline vs int16
pipeline under the pinned two-point-slope protocol) — expected ~0 (the
expm1 decode is elementwise VPU work fused into the featurizer pre-pass).

Run:  python benchmarks/bench_mulaw_ingest.py          (TPU)
Writes benchmarks/MULAW_INGEST.json and prints one JSON line.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

BATCH, CLIP_SECONDS = 16, 60
CORPUS_FILES, CORPUS_SECONDS, TRAIN_STEPS = 24, 12.0, 800


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from protocol import slope_stats
    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
    from sed_tpu.ops.featurizer import logmel_features_batch
    from sed_tpu.ops.mulaw import mulaw_encode

    spec = importlib.util.spec_from_file_location(
        "ap_parity", os.path.join(HERE, "ap_parity.py"))
    ap_parity = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ap_parity)

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind})")
    use_pallas = "full" if jax.default_backend() == "tpu" else False

    model = CnnAvgPooling(classes_num=cfg.classes_num,
                          model_config=TRAIN_CHANNEL_AND_POOL)
    samples = cfg.working_sample_rate * CLIP_SECONDS
    frames = 1 + samples // cfg.hop_size
    init_x = jnp.zeros((1, frames, cfg.mel_bins, 1), jnp.float32)
    variables = model.init(jax.random.key(0), init_x, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    # ---- 1. HBM-resident decode overhead (random-init model is fine) ----
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal((BATCH, samples, 1)) * 8000).astype(np.int16)
    u8 = mulaw_encode(pcm)

    def body(w):
        feats = logmel_features_batch(w, cfg, use_pallas=use_pallas)
        x = jnp.transpose(feats, (0, 2, 3, 1))
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=False)
        return jax.nn.sigmoid(logits)

    def make_loop_factory(staged_dtype):
        delta = jnp.int16(1) if staged_dtype == np.int16 else jnp.uint8(1)

        def make_loop(iters):
            @jax.jit
            def loop(w):
                def b(i, carry):
                    wc, acc = carry
                    return (wc + delta, acc + body(wc).sum())
                return jax.lax.fori_loop(0, iters, b, (w, jnp.float32(0.0)))[1]
            return loop
        return make_loop

    def perturb_maker(staged_dtype):
        delta_t = jnp.int16 if staged_dtype == np.int16 else jnp.uint8
        add = jax.jit(lambda x, d: x + d)

        def perturb(x, k):
            xr = add(x, delta_t(101 + 7 * k))
            xr.block_until_ready()
            return xr
        return perturb

    rows = {}
    for name, arr, dt in (("int16", pcm, np.int16), ("mulaw_uint8", u8, np.uint8)):
        staged = jax.device_put(arr)
        log(f"compiling {name} pipeline loops...")
        st = slope_stats(make_loop_factory(dt), staged, perturb_maker(dt),
                         iters_pair=(10, 30), n=5)
        rows[name] = {
            "ms_per_batch": round(st["median"] * 1e3, 3),
            "audio_s_per_s": round(BATCH * CLIP_SECONDS / st["median"], 1),
            "spread_ms": [round(st["min"] * 1e3, 3), round(st["max"] * 1e3, 3)],
        }
        log(f"{name}: {rows[name]}")
    decode_overhead = (rows["mulaw_uint8"]["ms_per_batch"]
                       / rows["int16"]["ms_per_batch"])

    # ---- 2. trained-model fidelity on the synthetic corpus ----
    log(f"training {TRAIN_STEPS} steps on the AP-parity corpus...")
    corpus_rng = np.random.default_rng(0)
    waves, all_starts, all_ends = [], [], []
    for _ in range(CORPUS_FILES):
        y, starts, ends = ap_parity.make_recording(corpus_rng, CORPUS_SECONDS)
        waves.append(y)
        all_starts.append(starts)
        all_ends.append(ends)
    from sed_tpu.data.events import create_event_matrix

    oracle_feats = [ap_parity.oracle_logmel(y) for y in waves]
    events = [create_event_matrix(len(f), s, e, cfg)
              for f, s, e in zip(oracle_feats, all_starts, all_ends)]
    n_val = max(2, CORPUS_FILES // 5)
    train_f = oracle_feats[:-n_val]
    val_e = events[-n_val:]
    val_w = waves[-n_val:]
    allf = np.concatenate(train_f, axis=0)
    mean, std = allf.mean(axis=0), allf.std(axis=0)
    train_f = [(f - mean) / std for f in train_f]
    xs, ys = ap_parity.build_batches(train_f, events[:-n_val], TRAIN_STEPS,
                                     64, seed=0)

    from sed_tpu.train.optim import make_optimizer
    from sed_tpu.train.state import init_state, make_eval_forward, make_train_step
    from sed_tpu.utils.metrics import calculate_metrics, f_score

    tx = make_optimizer(1e-4)
    sample = jnp.zeros((1, cfg.train_crop_size, cfg.mel_bins, 1))
    state = init_state(model, jax.random.key(0), sample, tx)
    step_fn = make_train_step(model, tx, pos_weight=5.0, multi_frame=True)
    for i in range(TRAIN_STEPS):
        state, loss = step_fn(state, jnp.asarray(xs[i])[..., None],
                              jnp.asarray(ys[i]))
    log(f"  final loss {float(loss):.4f}")

    fwd = make_eval_forward(model)
    mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)
    # int16 wire == the exact pipeline (float wave -> PCM16 is the parity
    # reference here: TAU audio itself is 16-bit); uint8 = the lossy tier.
    val_pcm = np.stack([np.clip(w * 32768.0, -32768, 32767).astype(np.int16)
                        for w in val_w])[..., None]
    val_u8 = mulaw_encode(val_pcm)

    @jax.jit
    def run(vb):
        feats = logmel_features_batch(vb, cfg, use_pallas=use_pallas)
        feats = (feats - mean_j) / std_j
        x = jnp.transpose(feats, (0, 2, 3, 1))
        return jax.nn.sigmoid(fwd(state.params, state.batch_stats, x))

    sc16 = np.asarray(run(jax.device_put(val_pcm)))
    scu8 = np.asarray(run(jax.device_put(val_u8)))
    max_dev = float(np.abs(scu8 - sc16).max())

    def metrics_of(sc):
        aps, recs, precs = [], [], []
        for i, e in enumerate(val_e):
            ap, r, p = calculate_metrics(sc[i], e)
            aps.append(ap)
            recs.append(r)
            precs.append(p)
        f1 = float(np.max(f_score(np.mean(recs, axis=0), np.mean(precs, axis=0),
                                  precision_importance_factor=1)))
        return float(np.mean(aps)), f1

    ap16, f116 = metrics_of(sc16)
    apu8, f1u8 = metrics_of(scu8)
    log(f"fidelity: max sigmoid dev {max_dev:.2e}; AP {ap16:.4f} -> {apu8:.4f} "
        f"(d {100 * (apu8 - ap16):+.2f} pts); max F1 {f116:.4f} -> {f1u8:.4f}")

    result = {
        "bench": "mulaw_uint8_ingest",
        "device": str(dev.device_kind),
        "batch": BATCH,
        "clip_seconds": CLIP_SECONDS,
        "protocol": "median-of-5 two-point slopes (benchmarks/protocol.py)",
        "wire_bytes_per_sample": {"int16": 2, "mulaw_uint8": 1},
        "hbm_resident": rows,
        "decode_overhead_ratio": round(decode_overhead, 4),
        "corpus": {"files": CORPUS_FILES, "seconds": CORPUS_SECONDS,
                   "train_steps": TRAIN_STEPS, "val_files": n_val},
        "fidelity": {
            "max_sigmoid_dev_vs_int16": max_dev,
            "val_ap_int16": ap16,
            "val_ap_mulaw": apu8,
            "d_ap_points": round(100 * (apu8 - ap16), 4),
            "val_max_f1_int16": f116,
            "val_max_f1_mulaw": f1u8,
        },
        "note": "uint8 halves WIRE bytes; the on-chip expm1 decode rides the "
                "featurizer pre-pass (overhead ratio above); e2e speedup is "
                "measured by bench.py h2d.mulaw_uint8_wire every driver run",
    }
    with open(os.path.join(HERE, "MULAW_INGEST.json"), "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps({
        "metric": "mulaw_ingest_fidelity",
        "value": max_dev,
        "unit": "max sigmoid deviation vs int16",
        "d_ap_points": result["fidelity"]["d_ap_points"],
        "decode_overhead_ratio": result["decode_overhead_ratio"],
    }))


if __name__ == "__main__":
    main()
