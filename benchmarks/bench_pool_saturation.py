"""StreamPool slot-count saturation sweep (VERDICT r3 #8).

STREAMING_TICK*.json measures the serving tick at 32 and 64 streams; this
bench sweeps the SLOT COUNT (32/64/128/256 by default, SED_SAT_SLOTS to
override) in ONE process/session and records where per-slot efficiency
saturates — the knee that bounds the max-density serving claim.

Method: per slot count B, build a StreamPool (production configuration:
'auto' featurizer = fused Pallas kernels on TPU, extract_impl='slices'),
warm every slot into device mode with real push() calls, then time the raw
tick step with the pinned two-point-slope discipline (scan over K pre-staged
chunk rounds, Δt/ΔK cancels the relay RPC floor).  Scan chunks are generated
ON-DEVICE (timing is content-independent; a (K,256,48000) int16 upload
through the ~40 MB/s relay would dominate the run).

    streams_per_chip(B) = B * chunk_seconds / tick_seconds(B)
    efficiency(B)       = streams_per_chip(B) / (B/B0 * streams_per_chip(B0))

Run:  python benchmarks/bench_pool_saturation.py          (TPU)
Writes benchmarks/POOL_SATURATION.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHUNK_SECONDS = 1.0
K1, K2 = 10, 40


def main():
    import jax

    if os.environ.get("SED_BENCH_DEVICE") == "cpu":
        # plumbing smoke only — the sitecustomize pins the axon platform, so
        # the redirect must go through jax.config before any backend query
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
    from sed_tpu.stream_pool import StreamPool

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind})")

    slot_counts = [int(s) for s in
                   os.environ.get("SED_SAT_SLOTS", "32,64,128,256").split(",")]
    sr = cfg.working_sample_rate
    chunk = int(sr * CHUNK_SECONDS)
    model = CnnAvgPooling(classes_num=cfg.classes_num,
                          model_config=TRAIN_CHANNEL_AND_POOL)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 128, cfg.mel_bins, 1)), train=False)

    def measure_pool(B):
        pool = StreamPool(model, variables["params"], variables["batch_stats"],
                          cfg, slots=B, chunk_samples=chunk, halo=32,
                          extract_impl="slices")
        rng = np.random.default_rng(B)
        warm = (rng.standard_normal((B, chunk)) * 2000).astype(np.int16)
        slots_ = [pool.join() for _ in range(B)]
        for i in range(16):  # past startup: every slot in device-ring mode
            pool.push({s: warm[j] for j, s in enumerate(slots_)})
        assert pool._admitted and len(pool._admitted) == B

        # Steady-state per-slot tick scalars captured from the live pool
        # (schedule values only pick which ring rows are touched — shapes and
        # work match production ticks; see bench_streaming_tick.py).
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

        # Device-generated scan chunks (content-independent timing).
        chunks = jax.jit(
            lambda key: jax.random.randint(
                key, (K2, B, chunk), -2000, 2000, jnp.int32
            ).astype(jnp.int16))(jax.random.key(B))
        chunks.block_until_ready()

        def make(k):
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

        times = []
        for k in (K1, K2):
            fn = make(k)
            float(fn(pool._buf, pool._mel, chunks))  # compile + first run
            best = float("inf")
            for rep in range(3):
                cr = chunks + jnp.int16(rep + 1)
                cr.block_until_ready()
                t0 = time.perf_counter()
                float(fn(pool._buf, pool._mel, cr))
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        tick = (times[1] - times[0]) / (K2 - K1)
        del pool, chunks
        return tick

    rows = {}
    b0 = slot_counts[0]
    for B in slot_counts:
        t0 = time.time()
        tick = measure_pool(B)
        cap = B * CHUNK_SECONDS / tick
        rows[B] = {
            "tick_ms": round(1e3 * tick, 4),
            "streams_per_chip": round(cap, 0),
            "ms_per_stream": round(1e3 * tick / B, 5),
        }
        log(f"B={B:4d}: tick {1e3 * tick:.3f} ms -> ~{cap:.0f} streams/chip "
            f"({1e3 * tick / B * 1000:.1f} µs/stream)  [{time.time() - t0:.0f}s]")

    base_cap = rows[b0]["streams_per_chip"]
    for B in slot_counts:
        rows[B]["efficiency_vs_linear"] = round(
            rows[B]["streams_per_chip"] / (base_cap * B / b0), 3)

    # The knee: the largest B whose marginal density gain over the previous
    # point is still >= 5% (past it, bigger pools only add tick latency).
    knee = slot_counts[0]
    for prev, cur in zip(slot_counts, slot_counts[1:]):
        if rows[cur]["streams_per_chip"] >= 1.05 * rows[prev]["streams_per_chip"]:
            knee = cur
    best_b = max(slot_counts, key=lambda b: rows[b]["streams_per_chip"])

    out = {
        "device_kind": dev.device_kind,
        "chunk_seconds": CHUNK_SECONDS,
        "config": {"featurizer": "auto (pallas on TPU)",
                   "extract_impl": "slices (production default)",
                   "halo": 32, "iters_pair": [K1, K2]},
        "per_slot_count": {str(b): rows[b] for b in slot_counts},
        "saturation_knee_slots": knee,
        "max_density_slots": best_b,
        "max_density_streams_per_chip": rows[best_b]["streams_per_chip"],
        "note": "device tick work only (per-tick int16 upload is 96 KB/s per "
                "stream, negligible on a direct-attached host); tick latency "
                "grows with B, so past the knee bigger pools trade real-time "
                "margin for no density",
    }
    with open(os.path.join(REPO, "benchmarks", "POOL_SATURATION.json"),
              "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({
        "metric": "stream-pool saturation sweep",
        "value": rows[best_b]["streams_per_chip"],
        "unit": "streams/chip",
        "knee_slots": knee,
        "slots_swept": slot_counts,
    }))


if __name__ == "__main__":
    main()
