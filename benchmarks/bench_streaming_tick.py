"""Device-side cost of ONE streaming tick (DeviceStreamingDetector).

The end-to-end streaming bench (bench_streaming.py) is transfer-bound on
this harness's relay; this bench isolates the DEVICE work per tick — ring
shift + frame extraction + featurize + score — by scanning the tick step
over pre-staged chunks entirely on-device (two-point slope).  The resulting
per-tick time projects the pipeline's capacity on a direct-attached TPU
host, where the int16 chunk upload (96 KB/s per stream) is negligible:

    streams_per_chip ~= batch * chunk_seconds / tick_device_time

(Steady-state tick params are used for every scanned step: the schedule
values only choose which ring rows are touched, so shapes and work — and
therefore timing — match production ticks.)

Run: python benchmarks/bench_streaming_tick.py    (TPU)
Writes benchmarks/STREAMING_TICK.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

B = int(os.environ.get("SED_TICK_B", "32"))
CHUNK_SECONDS = 1.0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.device_streaming import DeviceStreamingDetector
    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind})")

    sr = cfg.working_sample_rate
    chunk = int(sr * CHUNK_SECONDS)
    model = CnnAvgPooling(classes_num=cfg.classes_num,
                          model_config=TRAIN_CHANNEL_AND_POOL)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 128, cfg.mel_bins, 1)), train=False)

    rng = np.random.default_rng(0)
    stream = (rng.standard_normal((B, 16 * chunk)) * 2000).astype(np.int16)

    # Featurizer A/B: XLA matmul-rFFT tick vs the fused Pallas kernels
    # (featurizer='auto' default picks the winner on TPU).
    def make_det(featurizer, precision=None, extract_impl="span",
                 qparams=None):
        d = DeviceStreamingDetector(model, variables["params"],
                                    variables["batch_stats"], cfg, batch=B,
                                    chunk_samples=chunk, halo=32,
                                    featurizer=featurizer,
                                    featurizer_precision=precision,
                                    extract_impl=extract_impl,
                                    qparams=qparams)
        # run past startup so the detector is in device mode, steady counters
        outs = []
        for i in range(16):  # enough ticks that emissions exist (> halo)
            outs.append(d.push(stream[:, i * chunk:(i + 1) * chunk]))
        assert d._device_mode
        emitted = [o for o in outs if o.shape[1]]
        assert emitted, "warm-up emitted nothing; raise the push count"
        return d, np.concatenate(emitted, axis=1)

    det, out_x = make_det("xla")
    det_p, out_p = make_det("pallas")
    # Hardware score-parity gate BEFORE timing: a Mosaic miscompile in the
    # pallas-in-tick composition is invisible in interpret mode (ROADMAP
    # postmortem) — it must fail HERE, not ship inside a healthy-looking
    # speedup number.
    feat_parity = float(np.abs(out_p - out_x).max())
    log(f"hardware tick score parity pallas-vs-xla: {feat_parity:.2e}")
    assert feat_parity < 1e-3, f"pallas tick parity failure: {feat_parity}"

    # steady-state tick params captured from the live detector's arithmetic
    hop, pad = cfg.hop_size, det._pad
    t_new = det._t_total + chunk
    n_ready = (t_new - pad) // hop + 1
    n_new = n_ready - det._n_frames
    base = t_new - det._l
    offs = np.asarray([
        (det._n_frames + min(j, max(n_new - 1, 0))) * hop - pad - base
        for j in range(det._frames_max)], np.int32)
    from sed_tpu.streaming import emission_upto, window_start
    upto = emission_upto(n_ready, det.stride, det.halo, False)
    s = window_start(det._emitted, det.stride, det.halo)
    params = dict(offs=jnp.asarray(offs), n_new=jnp.int32(n_new),
                  write_pos=jnp.int32(det._n_frames - det._mel_start),
                  win_off=jnp.int32(s - det._mel_start),
                  e_off=jnp.int32(det._emitted - s),
                  shift=jnp.int32(0))

    K1, K2 = 20, 80
    chunks = jnp.asarray((rng.standard_normal((K2, B, chunk)) * 2000)
                         .astype(np.int16))

    def measure(step, buf, mel):
        def make(k):
            @jax.jit
            def run(buf, mel, cs):
                def body(carry, c):
                    buf, mel = carry
                    buf, mel, out = step(buf, mel, c, params["offs"],
                                         params["n_new"], params["write_pos"],
                                         params["win_off"], params["e_off"],
                                         params["shift"])
                    return (buf, mel), out[0, 0, 0]
                (_, _), outs = jax.lax.scan(body, (buf, mel), cs[:k])
                return outs.sum()
            return run

        times = []
        for k in (K1, K2):
            fn = make(k)
            float(fn(buf, mel, chunks))
            best = float("inf")
            for rep in range(3):
                cr = chunks + jnp.int16(rep + 1)
                cr.block_until_ready()
                t0 = time.perf_counter()
                float(fn(buf, mel, cr))
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        return (times[1] - times[0]) / (K2 - K1)

    tick = measure(det._step_fn, det._buf, det._mel)
    capacity = B * CHUNK_SECONDS / tick
    tick_p = measure(det_p._step_fn, det_p._buf, det_p._mel)
    capacity_p = B * CHUNK_SECONDS / tick_p
    log(f"pallas-featurizer tick: {1e3 * tick_p:.3f} ms vs XLA "
        f"{1e3 * tick:.3f} ms ({tick / tick_p:.2f}x) -> "
        f"~{capacity_p:.0f} streams/chip")

    # Same-process A/B of the frame extraction: 'span' (one contiguous slice
    # + static windows, the default) vs 'slices' (per-frame dynamic slices,
    # the original).  Score-gated: the two must emit equal scores.
    det_sl, out_sl = make_det("pallas", extract_impl="slices")
    extract_dev = float(np.abs(out_sl - out_p).max())
    assert extract_dev < 1e-5, f"span-vs-slices score dev {extract_dev}"
    tick_sl = measure(det_sl._step_fn, det_sl._buf, det_sl._mel)
    log(f"extract A/B (lockstep pallas tick): span {1e3 * tick_p:.3f} ms vs "
        f"slices {1e3 * tick_sl:.3f} ms ({tick_sl / tick_p:.2f}x), "
        f"score dev {extract_dev:.1e}")

    log(f"device tick: {1e3 * tick:.3f} ms ({B} streams, 1 s chunks) "
        f"-> ~{capacity:.0f} concurrent real-time streams/chip "
        f"(direct-attached-host projection)")

    # --- reduced-precision serving tiers on the tick featurizer ---
    # Same score-parity-gate discipline; tolerances are the tier fidelity
    # bounds from FAST_FEATURIZER.json with headroom ('fast' measured 0
    # sigmoid deviation, 'turbo' 6.2e-4 on the corpus study).
    tier_rows = {}
    for tier, tol in (("fast", 1e-3), ("turbo", 5e-3)):
        det_t, out_t = make_det("pallas", tier)
        sdev = float(np.abs(out_t - out_x).max())
        assert sdev < tol, f"{tier} tick score deviation {sdev} > {tol}"
        tick_t = measure(det_t._step_fn, det_t._buf, det_t._mel)
        tier_rows[tier] = {
            "tick_ms": round(1e3 * tick_t, 4),
            "streams_per_chip": round(B * CHUNK_SECONDS / tick_t, 0),
            "speedup_vs_parity_pallas_tick": round(tick_p / tick_t, 3),
            "max_score_dev_vs_xla_tick": sdev,
        }
        log(f"{tier}-tier tick: {1e3 * tick_t:.3f} ms "
            f"({tick_p / tick_t:.2f}x parity pallas, score dev {sdev:.2e}) "
            f"-> ~{tier_rows[tier]['streams_per_chip']:.0f} streams/chip")

    # --- max-density serving tick: turbo featurizer + int8 CNN ---
    # The composed fastest supported streaming mode (mirrors the offline
    # turbo_int8_combined record in FAST_FEATURIZER.json).  int8 fidelity is
    # its own (lossy) contract — gate at the pinned 0.05 sigmoid bound.
    from sed_tpu.models.quantize import quantize_cnn
    from sed_tpu.ops.featurizer import logmel_features_batch

    calib_pcm = jnp.asarray(stream[:4, : 4 * chunk, None])
    calib_f = jax.jit(lambda w: logmel_features_batch(w, cfg))(calib_pcm)
    q = quantize_cnn(model, variables["params"], variables["batch_stats"],
                     [np.transpose(np.asarray(calib_f), (0, 2, 3, 1))])
    det_q, out_q = make_det("pallas", "turbo", qparams=q)
    qdev = float(np.abs(out_q - out_x).max())
    assert qdev < 0.05, f"int8 tick score deviation {qdev}"
    tick_q = measure(det_q._step_fn, det_q._buf, det_q._mel)
    int8_row = {
        "tick_ms": round(1e3 * tick_q, 4),
        "streams_per_chip": round(B * CHUNK_SECONDS / tick_q, 0),
        "speedup_vs_parity_pallas_tick": round(tick_p / tick_q, 3),
        "max_score_dev_vs_xla_tick": qdev,
    }
    log(f"turbo+int8 tick: {1e3 * tick_q:.3f} ms "
        f"({tick_p / tick_q:.2f}x parity pallas, score dev {qdev:.2e}) "
        f"-> ~{int8_row['streams_per_chip']:.0f} streams/chip")

    # --- lifecycle pool tick (per-slot vmapped schedule, stream_pool.py) ---
    # Same geometry, but every ring slice takes a per-slot offset so streams
    # can join/leave: measures the density cost of lifecycle support.
    from sed_tpu.stream_pool import StreamPool

    def make_pool_warm(extract_impl):
        p = StreamPool(model, variables["params"], variables["batch_stats"],
                       cfg, slots=B, chunk_samples=chunk, halo=32,
                       extract_impl=extract_impl)
        slots_ = [p.join() for _ in range(B)]
        outs = []
        for i in range(16):
            outs.append(p.push({s: stream[j, i * chunk:(i + 1) * chunk]
                                for j, s in enumerate(slots_)}))
        assert p._admitted and len(p._admitted) == B
        emitted = np.concatenate(
            [np.concatenate([o[s] for s in slots_], axis=0)
             for o in outs if any(o[s].shape[0] for s in slots_)], axis=0)
        return p, emitted

    pool, pool_out = make_pool_warm("span")

    F = pool._frames_max
    v_offs = np.zeros((B, F), np.int32)
    v = {k: np.zeros(B, np.int32)
         for k in ("n_new", "write_pos", "win_off", "e_off", "shift")}
    for b, c in pool._admitted.items():
        offs_b, nn, wp, wo, eo, sh, _, _ = pool._slot_scalars(c)
        v_offs[b] = offs_b
        v["n_new"][b], v["write_pos"][b] = nn, wp
        v["win_off"][b], v["e_off"][b], v["shift"][b] = wo, eo, sh
    pstep = pool._step_fn
    pargs = {k: jnp.asarray(val) for k, val in v.items()}
    poffs = jnp.asarray(v_offs)
    pactive = jnp.ones(B, bool)

    def make_pool(k):
        @jax.jit
        def run(buf, mel, cs):
            def body(carry, c):
                buf, mel = carry
                buf, mel, out = pstep(buf, mel, c, pactive, poffs,
                                      pargs["n_new"], pargs["write_pos"],
                                      pargs["win_off"], pargs["e_off"],
                                      pargs["shift"])
                return (buf, mel), out[0, 0, 0]
            (_, _), outs = jax.lax.scan(body, (buf, mel), cs[:k])
            return outs.sum()
        return run

    ptimes = []
    for k in (K1, K2):
        fn = make_pool(k)
        float(fn(pool._buf, pool._mel, chunks))
        best = float("inf")
        for rep in range(3):
            cr = chunks + jnp.int16(rep + 1)
            cr.block_until_ready()
            t0 = time.perf_counter()
            float(fn(pool._buf, pool._mel, cr))
            best = min(best, time.perf_counter() - t0)
        ptimes.append(best)
    ptick = (ptimes[1] - ptimes[0]) / (K2 - K1)
    pcapacity = B * CHUNK_SECONDS / ptick
    # Like-for-like ratio: the pool's 'auto' featurizer matches the pallas
    # lockstep tick, so lifecycle overhead = ptick / tick_p (comparing
    # against the XLA tick would conflate featurizer speedup with
    # lifecycle cost).
    log(f"pool tick (per-slot schedule, {pool._featurizer} featurizer): "
        f"{1e3 * ptick:.3f} ms -> ~{pcapacity:.0f} streams/chip "
        f"({ptick / tick_p:.2f}x the same-featurizer lockstep tick)")

    # Pool-side extract A/B (same-process, score-gated on the warmup
    # emissions, which exercise real per-slot offsets).
    pool_sl, pool_sl_out = make_pool_warm("slices")
    pool_extract_dev = float(np.abs(pool_sl_out - pool_out).max())
    assert pool_extract_dev < 1e-5, \
        f"pool span-vs-slices score dev {pool_extract_dev}"
    v_sl = {k: np.zeros(B, np.int32)
            for k in ("n_new", "write_pos", "win_off", "e_off", "shift")}
    v_sl_offs = np.zeros((B, F), np.int32)
    for b, c in pool_sl._admitted.items():
        offs_b, nn, wp, wo, eo, sh, _, _ = pool_sl._slot_scalars(c)
        v_sl_offs[b] = offs_b
        v_sl["n_new"][b], v_sl["write_pos"][b] = nn, wp
        v_sl["win_off"][b], v_sl["e_off"][b], v_sl["shift"][b] = wo, eo, sh
    pstep_sl, pargs_save, poffs_save = pool_sl._step_fn, pargs, poffs
    pargs = {k: jnp.asarray(val) for k, val in v_sl.items()}
    poffs = jnp.asarray(v_sl_offs)
    pstep = pstep_sl
    ptimes_sl = []
    for k in (K1, K2):
        fn = make_pool(k)
        float(fn(pool_sl._buf, pool_sl._mel, chunks))
        best = float("inf")
        for rep in range(3):
            cr = chunks + jnp.int16(rep + 1)
            cr.block_until_ready()
            t0 = time.perf_counter()
            float(fn(pool_sl._buf, pool_sl._mel, cr))
            best = min(best, time.perf_counter() - t0)
        ptimes_sl.append(best)
    ptick_sl = (ptimes_sl[1] - ptimes_sl[0]) / (K2 - K1)
    pargs, poffs = pargs_save, poffs_save
    log(f"extract A/B (pool tick): span {1e3 * ptick:.3f} ms vs slices "
        f"{1e3 * ptick_sl:.3f} ms ({ptick_sl / ptick:.2f}x), "
        f"score dev {pool_extract_dev:.1e}")

    out = {
        "device_kind": dev.device_kind,
        "batch_streams": B,
        "chunk_seconds": CHUNK_SECONDS,
        "tick_device_ms": round(1e3 * tick, 4),
        "projected_streams_per_chip": round(capacity, 0),
        "pallas_featurizer_tick_ms": round(1e3 * tick_p, 4),
        "pallas_featurizer_streams_per_chip": round(capacity_p, 0),
        "pallas_vs_xla_tick_speedup": round(tick / tick_p, 3),
        "pool_featurizer": pool._featurizer,
        "hardware_tick_score_parity_pallas_vs_xla": feat_parity,
        "pool_tick_device_ms": round(1e3 * ptick, 4),
        "pool_projected_streams_per_chip": round(pcapacity, 0),
        "pool_vs_same_featurizer_lockstep_tick_ratio": round(ptick / tick_p, 3),
        "extract_ab": {
            "lockstep_span_ms": round(1e3 * tick_p, 4),
            "lockstep_slices_ms": round(1e3 * tick_sl, 4),
            "lockstep_slices_over_span": round(tick_sl / tick_p, 3),
            "lockstep_score_dev": extract_dev,
            "pool_span_ms": round(1e3 * ptick, 4),
            "pool_slices_ms": round(1e3 * ptick_sl, 4),
            "pool_slices_over_span": round(ptick_sl / ptick, 3),
            "pool_score_dev": pool_extract_dev,
        },
        "precision_tiers": tier_rows,
        "note": "device work only; per-tick int16 upload (96 KB/s/stream) "
                "and host schedule are negligible on a direct-attached host",
    }
    suffix = "" if B == 32 else f"_B{B}"
    with open(os.path.join(REPO, "benchmarks",
                           f"STREAMING_TICK{suffix}.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({
        "metric": f"device-resident streaming tick ({B} streams, 1 s chunks)",
        "value": out["tick_device_ms"],
        "unit": "ms",
        "projected_streams_per_chip": out["projected_streams_per_chip"],
    }))


if __name__ == "__main__":
    main()
