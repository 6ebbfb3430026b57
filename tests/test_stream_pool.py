"""StreamPool lifecycle: join/leave mid-run must leave every stream's scores
equal to a fresh single-stream detector on the same audio (schedule exactly,
scores to 1e-5 — jit fusion rounding)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sed_tpu.configs import SpectrogramConfig
from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
from sed_tpu.stream_pool import StreamPool
from sed_tpu.streaming import BatchedStreamingDetector
from sed_tpu.train.optim import make_optimizer
from sed_tpu.train.state import init_state

CFG = SpectrogramConfig(working_sample_rate=8000, time_margin=0.33)
CHUNK = 8000


def _model_state():
    model = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL)
    tx = make_optimizer(1e-3)
    sample = jnp.zeros((1, CFG.train_crop_size, CFG.mel_bins, 1))
    state = init_state(model, jax.random.key(0), sample, tx)
    return model, state


def _fresh_run(model, state, chunks):
    """Oracle: a fresh single-stream host detector over the same chunks.
    Returns (per-push outputs, flush tail)."""
    det = BatchedStreamingDetector(model, state.params, state.batch_stats,
                                   CFG, batch=1, halo=64, total_stride=8,
                                   bucket=64)
    outs = [det.push(c[None])[0] for c in chunks]
    return outs, det.flush()[0]


def test_pool_join_leave_matches_fresh_streams():
    """Three overlapping stream lives on a 2-slot pool: A [tick 0..14],
    B [tick 3..20] (different schedule phase than A), C [tick 16..24] reusing
    A's freed slot.  Every stream's per-tick emissions AND tail must match a
    fresh detector."""
    rng = np.random.default_rng(0)
    model, state = _model_state()
    lives = {  # name -> (join_tick, n_chunks)
        "A": (0, 15),
        "B": (3, 18),
        "C": (16, 9),
    }
    audio = {k: (0.1 * rng.standard_normal((n, CHUNK))).astype(np.float32)
             for k, (_, n) in lives.items()}

    pool = StreamPool(model, state.params, state.batch_stats, CFG, slots=2,
                      chunk_samples=CHUNK, halo=64, total_stride=8, bucket=64)
    slot_of, fed, got, tails = {}, {k: 0 for k in lives}, \
        {k: [] for k in lives}, {}
    for tick in range(30):
        for k, (j, n) in lives.items():
            if tick == j:
                slot_of[k] = pool.join()
        live = {k for k in lives
                if lives[k][0] <= tick < lives[k][0] + lives[k][1]}
        if not live and not slot_of:
            continue
        chunks = {slot_of[k]: audio[k][fed[k]] for k in live}
        if chunks:
            out = pool.push(chunks)
            for k in live:
                got[k].append(out[slot_of[k]])
                fed[k] += 1
        for k, (j, n) in lives.items():
            if tick == j + n - 1:  # last chunk fed this tick -> leave
                tails[k] = pool.leave(slot_of.pop(k))

    assert set(tails) == set(lives)
    # C must have reused a freed slot (2 slots, 3 lives).
    for k, (_, n) in lives.items():
        ref_outs, ref_tail = _fresh_run(model, state, audio[k])
        assert len(got[k]) == n
        for i, (g, r) in enumerate(zip(got[k], ref_outs)):
            assert g.shape == r.shape, (k, i, g.shape, r.shape)
        g_all = np.concatenate([g for g in got[k] if g.shape[0]] +
                               [tails[k]], axis=0)
        r_all = np.concatenate([r for r in ref_outs if r.shape[0]] +
                               [ref_tail], axis=0)
        np.testing.assert_allclose(g_all, r_all, atol=1e-5,
                                   err_msg=f"stream {k}")


def test_pool_sparse_ticks_match_fresh_streams():
    """Streams advancing at DIFFERENT rates (sparse push): A pushes every
    tick, B every 2nd, C (joining late) every 3rd.  Idle ticks must leave a
    slot's rings/counters untouched — every stream's emissions + tail must
    equal a fresh detector fed its chunks back to back."""
    rng = np.random.default_rng(7)
    model, state = _model_state()
    lives = {  # name -> (join_tick, push_period, n_chunks)
        "A": (0, 1, 12),
        "B": (1, 2, 8),
        "C": (8, 3, 5),
    }
    audio = {k: (0.1 * rng.standard_normal((n, CHUNK))).astype(np.float32)
             for k, (_, _, n) in lives.items()}

    pool = StreamPool(model, state.params, state.batch_stats, CFG, slots=3,
                      chunk_samples=CHUNK, halo=64, total_stride=8, bucket=64)
    slot_of, fed = {}, {k: 0 for k in lives}
    got, tails = {k: [] for k in lives}, {}
    for tick in range(40):
        for k, (j, _, _) in lives.items():
            if tick == j:
                slot_of[k] = pool.join()
        chunks = {}
        pushing = []
        for k, (j, period, n) in lives.items():
            if k in slot_of and tick >= j and (tick - j) % period == 0 \
                    and fed[k] < n:
                chunks[slot_of[k]] = audio[k][fed[k]]
                pushing.append(k)
        out = pool.push(chunks)  # legal even when nobody pushes
        assert set(out) == {slot_of[k] for k in pushing}
        for k in pushing:
            got[k].append(out[slot_of[k]])
            fed[k] += 1
            if fed[k] == lives[k][2]:
                tails[k] = pool.leave(slot_of.pop(k))

    assert set(tails) == set(lives)
    for k, (_, _, n) in lives.items():
        ref_outs, ref_tail = _fresh_run(model, state, audio[k])
        assert len(got[k]) == n
        for i, (g, r) in enumerate(zip(got[k], ref_outs)):
            assert g.shape == r.shape, (k, i, g.shape, r.shape)
        g_all = np.concatenate([g for g in got[k] if g.shape[0]] +
                               [tails[k]], axis=0)
        r_all = np.concatenate([r for r in ref_outs if r.shape[0]] +
                               [ref_tail], axis=0)
        np.testing.assert_allclose(g_all, r_all, atol=1e-5,
                                   err_msg=f"stream {k}")


def test_pool_feed_tick_arbitrary_sizes_match_fresh_streams():
    """Variable-size input via feed()/tick(): random piece sizes (0.1x-1.8x
    the chunk), ticks at irregular intervals, and a partial staged remainder
    drained by leave() — concatenated scores must equal a fresh detector fed
    the same audio, for float32, int16, and mixed-dtype feeds."""
    rng = np.random.default_rng(11)
    model, state = _model_state()
    total = {"f32": 9 * CHUNK + 1234, "i16": 7 * CHUNK + 777,
             "mix": 6 * CHUNK + 3210}
    audio = {k: (0.1 * rng.standard_normal(n)).astype(np.float32)
             for k, n in total.items()}
    audio["i16"] = (audio["i16"] * 32768.0).astype(np.int16)
    # 'mix' alternates dtypes per piece; snap it to the int16 grid so the
    # int16 round trip is lossless and the float oracle is exact.
    audio["mix"] = (np.round(audio["mix"] * 32768.0).astype(np.int16)
                    .astype(np.float32) / 32768.0)

    pool = StreamPool(model, state.params, state.batch_stats, CFG, slots=3,
                      chunk_samples=CHUNK, halo=64, total_stride=8, bucket=64)
    slot_of = {k: pool.join() for k in audio}
    pos = {k: 0 for k in audio}
    got = {k: [] for k in audio}
    step = 0
    while any(pos[k] < len(audio[k]) for k in audio):
        for k in audio:
            if pos[k] >= len(audio[k]):
                continue
            n = int(rng.integers(CHUNK // 10, 2 * CHUNK))
            piece = audio[k][pos[k]: pos[k] + n]
            pos[k] += len(piece)
            if k == "mix" and step % 2:  # alternate dtypes into one slot
                piece = (piece * 32768.0).astype(np.int16)
            pool.feed(slot_of[k], piece)
        step += 1
        if step % 2 == 0:  # irregular tick cadence
            for b, sc in pool.tick().items():
                for k in audio:
                    if slot_of[k] == b:
                        got[k].append(sc)
    for b, sc in pool.tick().items():
        for k in audio:
            if slot_of[k] == b:
                got[k].append(sc)
    tails = {k: pool.leave(slot_of[k]) for k in audio}

    for k in audio:
        # Oracle: fresh detector on the same signal as float32 (int16 on the
        # grid de-quantizes losslessly, incl. the 'mix' dtype alternation).
        ref_audio = audio[k].astype(np.float32) / 32768.0 \
            if audio[k].dtype == np.int16 else audio[k]
        det = BatchedStreamingDetector(model, state.params, state.batch_stats,
                                       CFG, batch=1, halo=64, total_stride=8,
                                       bucket=64)
        ref = [det.push(ref_audio[None])[0], det.flush()[0]]
        r_all = np.concatenate([x for x in ref if x.shape[0]], axis=0)
        g_all = np.concatenate([g for g in got[k] if g.shape[0]] +
                               [tails[k]], axis=0)
        np.testing.assert_allclose(g_all, r_all, atol=1e-5, err_msg=k)


def test_pool_int16_chunks_match_float():
    rng = np.random.default_rng(1)
    model, state = _model_state()
    n = 10
    audio = (0.1 * rng.standard_normal((n, CHUNK))).astype(np.float32)
    i16 = (audio * 32768.0).astype(np.int16)
    f32 = i16.astype(np.float32) / 32768.0

    def run(chunks_list):
        pool = StreamPool(model, state.params, state.batch_stats, CFG,
                          slots=1, chunk_samples=CHUNK, halo=64,
                          total_stride=8, bucket=64)
        s = pool.join()
        outs = [pool.push({s: c})[s] for c in chunks_list]
        outs.append(pool.leave(s))
        return np.concatenate([o for o in outs if o.shape[0]], axis=0)

    np.testing.assert_allclose(run(list(i16)), run(list(f32)), atol=1e-5)


def test_pool_mulaw_uint8_chunks_match_host_decode():
    """uint8 µ-law chunks ride the tick wire at 1 byte/sample and are
    decoded ON DEVICE (ops/featurizer.ingest_to_f32 inside the tick step);
    scores must equal feeding the host-decoded float32 of the same bytes
    (the codec is applied exactly once either way).  Also exercises the
    mixed-dtype tick: one uint8 + one int16 slot in the SAME push falls
    back to a host-decoded float32 batch with identical per-slot scores."""
    from sed_tpu.ops.mulaw import mulaw_decode_np, mulaw_encode

    rng = np.random.default_rng(5)
    model, state = _model_state()
    n = 8
    audio = (0.1 * rng.standard_normal((n, CHUNK))).astype(np.float32)
    u8 = mulaw_encode(audio)
    dec = mulaw_decode_np(u8)
    i16_audio = (0.05 * rng.standard_normal((n, CHUNK)))
    i16 = (i16_audio * 32768.0).astype(np.int16)

    def run_single(chunks_list):
        pool = StreamPool(model, state.params, state.batch_stats, CFG,
                          slots=1, chunk_samples=CHUNK, halo=64,
                          total_stride=8, bucket=64)
        s = pool.join()
        outs = [pool.push({s: c})[s] for c in chunks_list]
        outs.append(pool.leave(s))
        return np.concatenate([o for o in outs if o.shape[0]], axis=0)

    got_u8 = run_single(list(u8))
    got_f32 = run_single(list(dec))
    np.testing.assert_allclose(got_u8, got_f32, atol=1e-5)

    # Mixed-dtype push: uint8 + int16 slots in one tick (f32 fallback).
    pool = StreamPool(model, state.params, state.batch_stats, CFG, slots=2,
                      chunk_samples=CHUNK, halo=64, total_stride=8, bucket=64)
    a, b = pool.join(), pool.join()
    outs_a, outs_b = [], []
    for t in range(n):
        out = pool.push({a: u8[t], b: i16[t]})
        outs_a.append(out[a])
        outs_b.append(out[b])
    outs_a.append(pool.leave(a))
    outs_b.append(pool.leave(b))
    mixed_a = np.concatenate([o for o in outs_a if o.shape[0]], axis=0)
    mixed_b = np.concatenate([o for o in outs_b if o.shape[0]], axis=0)
    np.testing.assert_allclose(mixed_a, got_f32, atol=1e-5)
    ref_b = run_single(list(i16.astype(np.float32) / 32768.0))
    np.testing.assert_allclose(mixed_b, ref_b, atol=1e-5)

    # feed()/tick() staging accepts uint8 too (uneven piece sizes).
    pool2 = StreamPool(model, state.params, state.batch_stats, CFG, slots=1,
                       chunk_samples=CHUNK, halo=64, total_stride=8,
                       bucket=64)
    s = pool2.join()
    flat = u8.reshape(-1)
    outs, pos, piece = [], 0, CHUNK // 3 + 17
    while pos < flat.size:
        pool2.feed(s, flat[pos: pos + piece])
        pos += piece
        o = pool2.tick()
        if s in o:
            outs.append(o[s])
    outs.append(pool2.leave(s))
    staged = np.concatenate([o for o in outs if o.shape[0]], axis=0)
    np.testing.assert_allclose(staged, got_f32, atol=1e-5)


def test_pool_validation():
    model, state = _model_state()
    pool = StreamPool(model, state.params, state.batch_stats, CFG, slots=1,
                      chunk_samples=CHUNK, halo=64, total_stride=8, bucket=64)
    s = pool.join()
    with pytest.raises(RuntimeError, match="slots are occupied"):
        pool.join()
    assert pool.push({}) == {}  # sparse tick: everyone idles — a no-op
    with pytest.raises(ValueError, match="non-joined"):
        pool.push({s: np.zeros(CHUNK, np.float32),
                   s + 1: np.zeros(CHUNK, np.float32)})
    with pytest.raises(ValueError, match="chunk must be"):
        pool.push({s: np.zeros(17, np.float32)})
    with pytest.raises(ValueError, match="not joined"):
        pool.leave(s + 1)
    pool.leave(s)
    assert pool.join() == s  # freed slot is reusable


def test_pool_push_is_atomic_on_invalid_chunk():
    """A bad chunk in the dict must fail BEFORE any stream consumes its
    chunk — otherwise the good streams double-consume on the caller's
    retry and silently desync from their audio."""
    model, state = _model_state()

    def mk():
        pool = StreamPool(model, state.params, state.batch_stats, CFG,
                          slots=2, chunk_samples=CHUNK, halo=64,
                          total_stride=8, bucket=64)
        return pool, pool.join(), pool.join()

    rng = np.random.default_rng(3)
    chunk = (0.1 * rng.standard_normal(CHUNK)).astype(np.float32)

    pool, a, b = mk()
    with pytest.raises(ValueError, match="chunk must be"):
        pool.push({a: chunk, b: np.zeros(17, np.float32)})
    h = pool._pending[a]
    assert h._buf_start + h._samples.shape[1] == 0, \
        "slot consumed its chunk from a push that raised"
    out_retry = pool.push({a: chunk, b: chunk})

    ref_pool, ra, rb = mk()
    ref = ref_pool.push({ra: chunk, rb: chunk})
    np.testing.assert_array_equal(out_retry[a], ref[ra])
    np.testing.assert_array_equal(out_retry[b], ref[rb])


def test_pool_sharded_over_mesh_matches_plain():
    from sed_tpu.parallel.mesh import create_mesh

    rng = np.random.default_rng(2)
    model, state = _model_state()
    n = 12
    audio = (0.1 * rng.standard_normal((8, n, CHUNK))).astype(np.float32)

    def run(mesh):
        pool = StreamPool(model, state.params, state.batch_stats, CFG,
                          slots=8, chunk_samples=CHUNK, halo=64,
                          total_stride=8, bucket=64, mesh=mesh)
        slots = [pool.join() for _ in range(8)]
        outs = {s: [] for s in slots}
        for t in range(n):
            o = pool.push({s: audio[i, t] for i, s in enumerate(slots)})
            for s in slots:
                outs[s].append(o[s])
        # Multi-round scanned tick under the mesh: the (rounds, slots,
        # chunk) wire batch shards the SLOT axis and replicates rounds.
        for i, s in enumerate(slots):
            pool.feed(s, audio[i, :4].reshape(-1))
        o = pool.tick()
        for s in slots:
            outs[s].append(o[s])
        for i, s in enumerate(slots):
            outs[s].append(pool.leave(s))
        return {s: np.concatenate([x for x in outs[s] if x.shape[0]], axis=0)
                for s in slots}

    plain = run(None)
    sharded = run(create_mesh())
    for s in plain:
        np.testing.assert_allclose(sharded[s], plain[s], atol=1e-5)


def test_pool_sparse_ticks_compose_with_mesh():
    """Sparse ticks under a sharded pool: the per-slot active mask is a
    replicated scalar vector, so idle rows must stay untouched on every
    shard — mesh run equals the plain run with the same sparse pattern."""
    from sed_tpu.parallel.mesh import create_mesh

    rng = np.random.default_rng(21)
    n = 10
    audio = (0.1 * rng.standard_normal((8, n, CHUNK))).astype(np.float32)
    model, state = _model_state()

    def run(mesh):
        pool = StreamPool(model, state.params, state.batch_stats, CFG,
                          slots=8, chunk_samples=CHUNK, halo=64,
                          total_stride=8, bucket=64, mesh=mesh)
        slots = [pool.join() for _ in range(8)]
        fed = [0] * 8
        outs = {s: [] for s in slots}
        for t in range(2 * n):
            chunks = {}
            for i, s in enumerate(slots):
                if (t % (1 + i % 3) == 0) and fed[i] < n:  # periods 1/2/3
                    chunks[s] = audio[i, fed[i]]
                    fed[i] += 1
            o = pool.push(chunks)
            for s in o:
                outs[s].append(o[s])
        for i, s in enumerate(slots):
            outs[s].append(pool.leave(s))
        return {s: np.concatenate([x for x in outs[s] if x.shape[0]], axis=0)
                for s in slots}

    plain = run(None)
    sharded = run(create_mesh())
    for s in plain:
        assert sharded[s].shape == plain[s].shape
        np.testing.assert_allclose(sharded[s], plain[s], atol=1e-5)


def test_pool_pallas_featurizer_matches_xla():
    """StreamPool featurizer='pallas' (interpret on CPU): same schedule,
    near-identical scores as the XLA tick featurizer."""
    rng = np.random.default_rng(9)
    n = 12
    audio = (0.1 * rng.standard_normal((n, CHUNK))).astype(np.float32)
    model, state = _model_state()

    def run(feat):
        pool = StreamPool(model, state.params, state.batch_stats, CFG,
                          slots=1, chunk_samples=CHUNK, halo=64,
                          total_stride=8, bucket=64, featurizer=feat)
        s = pool.join()
        outs = [pool.push({s: c})[s] for c in audio]
        outs.append(pool.leave(s))
        return np.concatenate([o for o in outs if o.shape[0]], axis=0)

    np.testing.assert_allclose(run("pallas"), run("xla"), atol=1e-3)


def test_pool_extract_span_equals_slices():
    """The span-based frame extraction (one contiguous per-row slice +
    static hop-spaced windows) must emit scores equal to the per-frame
    dynamic-slice reference at staggered per-slot phases."""
    rng = np.random.default_rng(11)
    n = 14
    audio = (0.1 * rng.standard_normal((2, n, CHUNK))).astype(np.float32)
    model, state = _model_state()

    def run(extract_impl):
        pool = StreamPool(model, state.params, state.batch_stats, CFG,
                          slots=2, chunk_samples=CHUNK, halo=64,
                          total_stride=8, bucket=64,
                          extract_impl=extract_impl)
        a = pool.join()
        outs = {a: [pool.push({a: audio[0, 0]})[a]]}  # stagger slot phases
        b = pool.join()
        outs[b] = []
        for i in range(1, n):
            o = pool.push({a: audio[0, i], b: audio[1, i - 1]})
            outs[a].append(o[a])
            outs[b].append(o[b])
        outs[a].append(pool.leave(a))
        outs[b].append(pool.leave(b))
        return {k: np.concatenate([x for x in v if x.shape[0]], axis=0)
                for k, v in outs.items()}

    span, slices = run("span"), run("slices")
    for k in span:
        np.testing.assert_allclose(span[k], slices[k], atol=1e-5)


def test_pool_int8_qparams_matches_quantized_fresh_stream():
    """An int8 pool slot's scores equal a fresh int8 single-stream detector
    on the same audio (the lifecycle exactness contract in serving mode)."""
    from sed_tpu.models.quantize import quantize_cnn

    rng = np.random.default_rng(13)
    n = 12
    audio = (0.1 * rng.standard_normal((n, CHUNK))).astype(np.float32)
    model, state = _model_state()
    calib = jnp.asarray(rng.standard_normal(
        (2, CFG.train_crop_size, CFG.mel_bins, 1)), jnp.float32)
    q = quantize_cnn(model, state.params, state.batch_stats, [np.asarray(calib)])

    pool = StreamPool(model, state.params, state.batch_stats, CFG,
                      slots=2, chunk_samples=CHUNK, halo=64,
                      total_stride=8, bucket=64, qparams=q)
    s = pool.join()
    outs = [pool.push({s: c})[s] for c in audio]
    outs.append(pool.leave(s))
    pooled = np.concatenate([o for o in outs if o.shape[0]], axis=0)

    det = BatchedStreamingDetector(model, state.params, state.batch_stats,
                                   CFG, batch=1, halo=64, total_stride=8,
                                   bucket=64, qparams=q)
    fresh = [det.push(c[None])[0] for c in audio]
    fresh.append(det.flush()[0])
    ref = np.concatenate([o for o in fresh if o.shape[0]], axis=0)
    assert pooled.shape == ref.shape
    np.testing.assert_allclose(pooled, ref, atol=1e-5)


def test_pool_lifecycle_shares_one_jit_pair():
    """Every per-stream host detector the pool constructs (join startup,
    leave drain) must reuse the pool's ONE (featurize, forward) jit pair —
    a fresh jax.jit closure per lifecycle event re-compiles the identical
    programs on every connection (measured ~29 s per leave on the TPU
    relay; benchmarks/SERVE_SOCKET_BENCH.json "profile")."""
    rng = np.random.default_rng(7)
    model, state = _model_state()
    pool = StreamPool(model, state.params, state.batch_stats, CFG, slots=2,
                      chunk_samples=CHUNK, halo=64, total_stride=8, bucket=64)
    feat, fwd = pool._stream_fns

    a = pool.join()
    assert pool._pending[a]._featurize is feat
    assert pool._pending[a]._forward is fwd

    # Drive past admission so leave() goes through from_state, then verify
    # the drain detector also reuses the pair.
    from sed_tpu.streaming import BatchedStreamingDetector as BSD
    orig = BSD.from_state.__func__
    seen = {}

    def spy(cls, *args, **kw):
        det = orig(cls, *args, **kw)
        seen["featurize"], seen["forward"] = det._featurize, det._forward
        return det

    audio = (0.1 * rng.standard_normal((6, CHUNK))).astype(np.float32)
    for c in audio:
        pool.push({a: c})
    assert a in pool._admitted  # startup complete: drain will use from_state
    BSD.from_state = classmethod(spy)
    try:
        pool.leave(a)
    finally:
        BSD.from_state = classmethod(orig)
    assert seen["featurize"] is feat
    assert seen["forward"] is fwd


def test_shared_stream_fns_detectors_match_independent():
    """Two detectors sharing one make_stream_fns pair score identically to
    detectors with their own private jits (sharing is a pure cache merge)."""
    from sed_tpu.streaming import make_stream_fns

    rng = np.random.default_rng(21)
    model, state = _model_state()
    fns = make_stream_fns(model, state.params, state.batch_stats, CFG)
    audio = (0.1 * rng.standard_normal((4, CHUNK))).astype(np.float32)

    shared = BatchedStreamingDetector(model, state.params, state.batch_stats,
                                      CFG, batch=1, halo=64, total_stride=8,
                                      bucket=64, stream_fns=fns)
    outs = [shared.push(c[None])[0] for c in audio] + [shared.flush()[0]]
    ref_outs, ref_tail = _fresh_run(model, state, audio)
    got = np.concatenate([o for o in outs if o.shape[0]], axis=0)
    ref = np.concatenate([r for r in ref_outs + [ref_tail] if r.shape[0]],
                         axis=0)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_leave_many_matches_per_slot_leave():
    """leave_many (ONE shared featurize + stacked per-shape forwards) must
    equal per-slot leave() exactly in shape and to 1e-5 in scores, across a
    mix of drain states: admitted with a staged remainder, admitted with a
    different tail length, pending-only, never-fed, and too-short."""
    rng = np.random.default_rng(31)
    model, state = _model_state()

    def build():
        return StreamPool(model, state.params, state.batch_stats, CFG,
                          slots=5, chunk_samples=CHUNK, halo=64,
                          total_stride=8, bucket=64)

    n_chunks = {"A": 5, "B": 3, "C": 1}
    audio = {k: (0.1 * rng.standard_normal((n, CHUNK))).astype(np.float32)
             for k, n in n_chunks.items()}
    rem = (0.1 * rng.standard_normal(1234)).astype(np.float32)
    tiny = (0.1 * rng.standard_normal(100)).astype(np.float32)  # < pad

    def run(pool):
        slots = {k: pool.join() for k in ("A", "B", "C", "D", "E")}
        for t in range(5):
            chunks = {slots[k]: audio[k][t] for k in n_chunks
                      if t < n_chunks[k]}
            pool.push(chunks)
        pool.feed(slots["A"], rem)   # staged remainder on an admitted slot
        pool.feed(slots["E"], tiny)  # too short to ever featurize
        return slots

    pool_ref, pool_many = build(), build()
    slots_ref, slots_many = run(pool_ref), run(pool_many)

    ref = {}
    for k in ("A", "B", "C", "D"):
        ref[k] = pool_ref.leave(slots_ref[k])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="too short"):
        pool_ref.leave(slots_ref["E"])

    feat_calls, fwd_calls = [], []
    f0, f1 = pool_many._stream_fns

    def featspy(x):
        feat_calls.append(tuple(x.shape))
        return f0(x)

    def fwdspy(x):
        fwd_calls.append(tuple(x.shape))
        return f1(x)

    pool_many._stream_fns = (featspy, fwdspy)
    tails = pool_many.leave_many([slots_many[k]
                                  for k in ("A", "B", "C", "D", "E")])

    for k in ("A", "B", "C", "D"):
        got = tails[slots_many[k]]
        assert got.shape == ref[k].shape, (k, got.shape, ref[k].shape)
        if got.shape[0]:
            np.testing.assert_allclose(got, ref[k], atol=1e-5, err_msg=k)
    got_e = tails[slots_many["E"]]
    assert isinstance(got_e, np.ndarray) and got_e.shape == (0, 1)

    # Dispatch economy: every stream's remaining frames in ONE featurize;
    # one stacked forward per distinct tail-window shape, batch = slots.
    assert len(feat_calls) == 1, feat_calls
    assert len(fwd_calls) == len({s[1] for s in fwd_calls}), fwd_calls
    assert all(s[0] == 5 for s in fwd_calls), fwd_calls

    # Slots are freed: a new join succeeds for each.
    for _ in range(5):
        pool_many.join()


def test_multi_round_scanned_tick_matches_per_round_push():
    """A tick with many full chunks staged rides ONE scanned dispatch
    (_push_rounds); scores must equal per-round push() exactly, across
    sparse staging (slots at different rates), a pending slot joining
    mid-stream, and block splitting (> ROUNDS_PER_CALL rounds)."""
    rng = np.random.default_rng(41)
    model, state = _model_state()

    def build():
        return StreamPool(model, state.params, state.batch_stats, CFG,
                          slots=3, chunk_samples=CHUNK, halo=64,
                          total_stride=8, bucket=64)

    n = {"A": 21, "B": 13}  # > ROUNDS_PER_CALL rounds for A
    audio = {k: (0.1 * rng.standard_normal((m, CHUNK))).astype(np.float32)
             for k, m in n.items()}

    # Reference: per-round push (the pre-scan path).
    pool_ref = build()
    slots_ref = {k: pool_ref.join() for k in n}
    ref = {k: [] for k in n}
    for t in range(max(n.values())):
        chunks = {slots_ref[k]: audio[k][t] for k in n if t < n[k]}
        o = pool_ref.push(chunks)
        for k in n:
            if t < n[k]:
                ref[k].append(o[slots_ref[k]])
    ref = {k: np.concatenate(v, axis=0) for k, v in ref.items()}

    # Scanned: stage everything, then ONE tick.
    pool = build()
    slots = {k: pool.join() for k in n}
    steps_calls = []  # (wire shape, rounds in block) per scanned dispatch
    orig_sparse = pool._steps_sparse

    def sparse_spy(buf, mel, flat, idx, active, *rest):
        steps_calls.append((flat.shape, int(np.asarray(active).sum())))
        return orig_sparse(buf, mel, flat, idx, active, *rest)

    pool._steps_sparse = sparse_spy
    for k in n:
        pool.feed(slots[k], audio[k].reshape(-1))
    got = pool.tick()
    for k in n:
        have = got[slots[k]]
        assert have.shape == ref[k].shape, (k, have.shape, ref[k].shape)
        np.testing.assert_allclose(have, ref[k], atol=1e-5, err_msg=k)

    # The startup rounds are per-round (pending); once admitted-only, the
    # remaining ~19 rounds fold into 16-round + 4-round scanned dispatches
    # over the SPARSE wire: only the real chunks ship, bucketed to powers
    # of 4 (two streams x 16 rounds = <=32 cells -> 64-bucket; the 4-round
    # tail block has <=8 cells -> 16-bucket).
    assert len(steps_calls) == 2, steps_calls
    assert steps_calls[0][0][0] == 64 and steps_calls[0][1] <= 32, steps_calls
    assert steps_calls[1][0][0] == 16, steps_calls

    # Tails still drain exactly.
    for k in n:
        tail = pool.leave(slots[k])
        tail_ref = pool_ref.leave(slots_ref[k])
        assert tail.shape == tail_ref.shape
        np.testing.assert_allclose(tail, tail_ref, atol=1e-5, err_msg=k)


def test_pool_int8_mobilenet_matches_quantized_fresh_stream():
    """MobileNetV1 int8 streaming (round-5 tier-matrix fill): an int8 pool
    slot's scores equal a fresh int8 single-stream detector on the same
    audio.  The pool tick and the host startup/flush all dispatch through
    quantized_serving_scores, which routes a MobileNet artifact (its
    'dense1' head) to the sigmoid-emitting quantized forward."""
    from sed_tpu.models.cnn import MobileNetV1, mobilenet_receptive_field
    from sed_tpu.models.quantize import quantize_mobilenet

    rng = np.random.default_rng(29)
    model = MobileNetV1(classes_num=1, emit="logits")
    tx = make_optimizer(1e-3)
    sample = jnp.zeros((1, CFG.train_crop_size, CFG.mel_bins, 1))
    state = init_state(model, jax.random.key(0), sample, tx)
    calib = rng.standard_normal(
        (2, CFG.train_crop_size, CFG.mel_bins, 1)).astype(np.float32)
    q = quantize_mobilenet(model, state.params, state.batch_stats, [calib])

    halo = 8 * (-(-((mobilenet_receptive_field() + 1) // 2) // 8))
    n = 10
    audio = (0.1 * rng.standard_normal((n, CHUNK))).astype(np.float32)

    pool = StreamPool(model, state.params, state.batch_stats, CFG,
                      slots=2, chunk_samples=CHUNK, halo=halo,
                      total_stride=8, bucket=128, qparams=q)
    s = pool.join()
    outs = [pool.push({s: c})[s] for c in audio]
    outs.append(pool.leave(s))
    pooled = np.concatenate([o for o in outs if o.shape[0]], axis=0)

    det = BatchedStreamingDetector(model, state.params, state.batch_stats,
                                   CFG, batch=1, halo=halo, total_stride=8,
                                   bucket=128, qparams=q)
    fresh = [det.push(c[None])[0] for c in audio]
    fresh.append(det.flush()[0])
    ref = np.concatenate([o for o in fresh if o.shape[0]], axis=0)
    assert pooled.shape == ref.shape
    np.testing.assert_allclose(pooled, ref, atol=1e-5)
    # Output really is the int8 MobileNet sigmoid path: confidences in (0,1).
    assert pooled.min() >= 0.0 and pooled.max() <= 1.0


def test_mobilenet_bf16_scores_within_band():
    """MobileNetV1 --bf16 tier (round-5 tier-matrix fill): the bf16-compute
    forward loads the SAME f32 params and its sigmoid scores stay within the
    serving fidelity band of the f32 forward (the int8 tier's <=0.05
    contract; hardware throughput record in MOBILENET_TIERS.json)."""
    from sed_tpu.models.cnn import MobileNetV1

    rng = np.random.default_rng(31)
    f32 = MobileNetV1(classes_num=1)
    tx = make_optimizer(1e-3)
    sample = jnp.zeros((1, CFG.train_crop_size, CFG.mel_bins, 1))
    state = init_state(f32, jax.random.key(0), sample, tx)
    bf16 = MobileNetV1(classes_num=1, dtype=jnp.bfloat16)

    x = jnp.asarray(rng.standard_normal(
        (2, CFG.train_crop_size, CFG.mel_bins, 1)).astype(np.float32))
    ref = np.asarray(f32.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, x,
        train=False))
    got = np.asarray(bf16.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, x,
        train=False))
    assert got.dtype == np.float32  # cast back at the head
    assert float(np.abs(got - ref).max()) < 0.05
