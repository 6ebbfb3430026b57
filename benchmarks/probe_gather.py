"""Probe: crop-gather strategies for the fused train step.

profile_train.py shows the data stage (gather + augment + normalize) is ~69%
of the 2.6 ms fused step — the convs are only 0.69 ms.  The gather moves just
~16 MB/step (4 crops x 128 samples x 30x64 f32), so 1.8 ms means the
vmap(dynamic_slice) lowering is pathological on TPU.  This times alternatives
on hardware; the winner replaces make_gather_crops.

Each variant gathers (B, MAX+1, crop, mel) = the main crop plus 3 mix crops
(the augment path's full volume) and sums the result, in a jitted fori_loop.

Run: python benchmarks/probe_gather.py   (TPU)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 128
MIX = 4  # main + 3 extras
K = 50


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp

    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    crop, mel = cfg.train_crop_size, cfg.mel_bins
    total = 200 * crop
    rng = np.random.default_rng(0)
    features = jnp.asarray(rng.standard_normal((total, mel)).astype(np.float32))
    starts0 = jnp.asarray(rng.integers(0, total - crop, size=(B * MIX,), dtype=np.int32))

    def timed(name, fn):
        loop = jax.jit(lambda s: jax.lax.fori_loop(
            0, K, lambda i, c: (c[0] + 1, c[1] + fn(c[0]).sum()),
            (s, jnp.float32(0)))[1])
        loop(starts0).block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            loop(starts0).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        log(f"{name:34s} {1e3 * best / K:7.3f} ms")
        return best / K

    # A: current — vmap over dynamic_slice.
    def v_dynslice(starts):
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(features, (s, 0), (crop, mel))
        )(starts)

    # B: advanced-indexing row gather (one big gather op).
    def v_rowgather(starts):
        idx = starts[:, None] + jnp.arange(crop)
        return features[idx]

    # C: gather hop-free via take of flattened rows.
    def v_take(starts):
        idx = (starts[:, None] + jnp.arange(crop)).reshape(-1)
        return jnp.take(features, idx, axis=0).reshape(-1, crop, mel)

    # D: one-hot matmul on the MXU (bf16 one-hot, f32 accumulate).
    def v_onehot(starts):
        idx = starts[:, None] + jnp.arange(crop)  # (N, crop)
        oh = (idx[..., None] == jnp.arange(total)).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            oh, features.astype(jnp.bfloat16),
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # E: dynamic_slice of 8-aligned superblock + static phase switch.
    def v_aligned(starts):
        base = (starts // 8) * 8
        phase = starts - base

        def one(b, p):
            blk = jax.lax.dynamic_slice(features, (b, 0), (crop + 8, mel))
            return jax.lax.switch(p, [
                lambda blk=blk, q=q: jax.lax.slice(blk, (q, 0), (q + crop, mel))
                for q in range(8)
            ])

        return jax.vmap(one)(base, phase)

    times = {}
    times["A vmap(dynamic_slice) [current]"] = timed(
        "A vmap(dynamic_slice) [current]", v_dynslice)
    times["B advanced-index gather"] = timed("B advanced-index gather", v_rowgather)
    times["C take(flat rows)"] = timed("C take(flat rows)", v_take)
    times["D one-hot matmul"] = timed("D one-hot matmul", v_onehot)
    times["E aligned dynslice + phase switch"] = timed(
        "E aligned dynslice + phase switch", v_aligned)

    # Cross-check winner correctness vs A.
    a = np.asarray(v_dynslice(starts0))
    for name, fn in [("B", v_rowgather), ("C", v_take), ("D", v_onehot),
                     ("E", v_aligned)]:
        got = np.asarray(jax.jit(fn)(starts0))
        tol = 2e-2 if name == "D" else 0
        assert np.abs(got - a).max() <= tol, name
    log("all variants agree with A" )


if __name__ == "__main__":
    main()


def probe_packed():
    """Second-round variants: pack rows so the gather moves fewer, larger rows
    (TPU gathers are per-row latency-bound), then extract the 30-crop with
    vector ops."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp

    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    crop, mel = cfg.train_crop_size, cfg.mel_bins
    total = 200 * crop
    rng = np.random.default_rng(0)
    features = jnp.asarray(rng.standard_normal((total, mel)).astype(np.float32))
    starts0 = jnp.asarray(rng.integers(0, total - crop - 8, size=(B * MIX,), dtype=np.int32))

    def timed(name, fn):
        loop = jax.jit(lambda s: jax.lax.fori_loop(
            0, K, lambda i, c: (c[0] + 1, c[1] + fn(c[0]).sum()),
            (s, jnp.float32(0)))[1])
        loop(starts0).block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            loop(starts0).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        log(f"{name:40s} {1e3 * best / K:7.3f} ms")
        return best / K

    def v_rowgather(starts):  # baseline winner from round 1 of this probe
        idx = starts[:, None] + jnp.arange(crop)
        return features[idx]

    P = 8
    packed = features.reshape(total // P, P * mel)  # (750, 512)
    nblk = crop // P + 2  # 5 packed rows cover offset + 30

    def blocks_of(starts):
        base = starts // P
        off = starts % P
        idx = base[:, None] + jnp.arange(nblk)          # (N, 5)
        blk = packed[idx].reshape(-1, nblk * P, mel)    # (N, 40, mel)
        return blk, off

    # F: packed gather + take_along_axis extract.
    def v_packed_taa(starts):
        blk, off = blocks_of(starts)
        rows = off[:, None] + jnp.arange(crop)          # (N, 30)
        return jnp.take_along_axis(blk, rows[:, :, None], axis=1)

    # G: packed gather + selection-matmul extract (MXU).
    def v_packed_mm(starts):
        blk, off = blocks_of(starts)
        r = jnp.arange(nblk * P)
        sel = (off[:, None, None] + jnp.arange(crop)[None, :, None]
               == r[None, None, :]).astype(jnp.float32)  # (N, 30, 40)
        return jnp.einsum("njr,nrf->njf", sel, blk,
                          precision=jax.lax.Precision.HIGHEST)

    # H: packed gather + 8-way select ladder (static slices).
    def v_packed_sel(starts):
        blk, off = blocks_of(starts)
        cands = jnp.stack([blk[:, q:q + crop] for q in range(P)], axis=1)  # (N, 8, 30, mel)
        onehot = (jnp.arange(P)[None, :] == off[:, None]).astype(blk.dtype)
        return jnp.einsum("nq,nqjf->njf", onehot, cands)

    times = {}
    times["B row gather (prev winner)"] = timed("B row gather (prev winner)", v_rowgather)
    for name, fn in [("F packed8 + take_along_axis", v_packed_taa),
                     ("G packed8 + selection matmul", v_packed_mm),
                     ("H packed8 + select ladder", v_packed_sel)]:
        times[name] = timed(name, fn)
        got = np.asarray(jax.jit(fn)(starts0))
        want = np.asarray(jax.jit(v_rowgather)(starts0))
        assert np.array_equal(got, want), name
    log("packed variants agree with row gather")


if __name__ == "__main__" and os.environ.get("PROBE_PACKED") == "1":
    probe_packed()
    sys.exit(0)
