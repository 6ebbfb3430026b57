"""Streaming M5 (sed_tpu/waveform_streaming.py): per-frame scores across
arbitrary push sizes must EXACTLY equal offline scoring of the hop-strided
validation split (data/events.py frame_coverage_labels geometry)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sed_tpu.configs import WaveformConfig
from sed_tpu.data.events import frame_coverage_labels
from sed_tpu.models.m5 import M5
from sed_tpu.train.optim import make_optimizer
from sed_tpu.train.state import init_state, make_eval_forward
from sed_tpu.waveform_streaming import (BatchedWaveformStreamingDetector,
                                        WaveformStreamingDetector)

WCFG = WaveformConfig(working_sample_rate=8000, time_margin=0.33)


@pytest.fixture(scope="module")
def m5_state():
    model = M5(classes_num=1)
    tx = make_optimizer(1e-3)
    state = init_state(model, jax.random.key(0),
                       jnp.zeros((2, WCFG.frame_size, 1)), tx)
    return model, state


def _offline_scores(model, state, wav):
    """Oracle: the offline validation path — hop-strided frames through the
    eval forward, sigmoid applied as the eval loop does."""
    frames, _ = frame_coverage_labels(wav[None], [], [], WCFG)
    fwd = make_eval_forward(model)
    logits = np.asarray(fwd(state.params, state.batch_stats,
                            jnp.asarray(np.transpose(frames, (0, 2, 1)))))
    return 1.0 / (1.0 + np.exp(-logits))


def test_streaming_m5_matches_offline_split(m5_state):
    model, state = m5_state
    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal(6 * WCFG.frame_size + 1234)
           ).astype(np.float32)
    ref = _offline_scores(model, state, wav)

    det = WaveformStreamingDetector(model, state.params, state.batch_stats,
                                    WCFG)
    outs, pos = [], 0
    while pos < len(wav):
        n = int(rng.integers(100, WCFG.frame_size * 2))
        outs.append(det.push(wav[pos: pos + n]))
        pos += n
    got = np.concatenate([o for o in outs if o.shape[0]], axis=0)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_streaming_m5_int16_and_batch(m5_state):
    """Batched lockstep streams + int16 PCM chunks: row b equals a fresh
    single-stream run on row b's audio."""
    model, state = m5_state
    rng = np.random.default_rng(1)
    wav = (0.1 * rng.standard_normal((3, 4 * WCFG.frame_size))
           ).astype(np.float32)
    i16 = (wav * 32768.0).astype(np.int16)

    det = BatchedWaveformStreamingDetector(
        model, state.params, state.batch_stats, WCFG, batch=3)
    outs = []
    for i in range(0, wav.shape[1], 5000):
        outs.append(det.push(i16[:, i: i + 5000]))
    got = np.concatenate([o for o in outs if o.shape[1]], axis=1)

    for b in range(3):
        single = WaveformStreamingDetector(model, state.params,
                                           state.batch_stats, WCFG)
        souts = [single.push(i16[b])]
        ref = np.concatenate([o for o in souts if o.shape[0]], axis=0)
        np.testing.assert_allclose(got[b], ref, atol=1e-6, err_msg=str(b))


def test_streaming_m5_int8_qparams(m5_state):
    """qparams routes every frame through the int8 M5 forward; streamed int8
    equals offline int8 scoring of the same frames."""
    model, state = m5_state
    from sed_tpu.models.quantize import quantize_m5, quantized_m5_forward

    rng = np.random.default_rng(2)
    wav = (0.1 * rng.standard_normal(4 * WCFG.frame_size)).astype(np.float32)
    frames, _ = frame_coverage_labels(wav[None], [], [], WCFG)
    calib = [np.transpose(frames, (0, 2, 1))]
    q = quantize_m5(model, state.params, state.batch_stats, calib)
    ref = np.asarray(jax.nn.sigmoid(quantized_m5_forward(
        q, jnp.asarray(np.transpose(frames, (0, 2, 1))))))

    det = WaveformStreamingDetector(model, state.params, state.batch_stats,
                                    WCFG, qparams=q)
    outs, pos = [], 0
    while pos < len(wav):
        outs.append(det.push(wav[pos: pos + 7000]))
        pos += 7000
    got = np.concatenate([o for o in outs if o.shape[0]], axis=0)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_streaming_m5_geometry_fuzz():
    """Property fuzz over (sample_rate, time_margin, push pattern): the
    streamed frame COUNT and frame CONTENT geometry must match
    frame_coverage_labels for every config, including odd frame sizes
    (frame = 2*(frame_size//2)) and pushes smaller than a hop."""
    rng = np.random.default_rng(123)
    model = M5(classes_num=1)
    tx = make_optimizer(1e-3)
    for trial in range(6):
        sr = int(rng.choice([4000, 6000, 8000, 11025]))
        margin = float(rng.uniform(0.1, 0.5))
        cfg = WaveformConfig(working_sample_rate=sr, time_margin=margin)
        state = init_state(model, jax.random.key(trial),
                           jnp.zeros((1, cfg.frame_size, 1)), tx)
        n = int(rng.integers(cfg.frame_size, 6 * cfg.frame_size))
        wav = (0.1 * rng.standard_normal(n)).astype(np.float32)
        det = WaveformStreamingDetector(model, state.params,
                                        state.batch_stats, cfg)
        outs, pos = [], 0
        while pos < len(wav):
            m = int(rng.integers(1, max(2, cfg.frame_size)))
            outs.append(det.push(wav[pos: pos + m]))
            pos += m
        got = np.concatenate([o for o in outs if o.shape[0]], axis=0) \
            if any(o.shape[0] for o in outs) else np.zeros((0, 1), np.float32)
        ref = _offline_scores_cfg(model, state, wav, cfg)
        assert got.shape == ref.shape, (trial, sr, margin, got.shape,
                                        ref.shape)
        np.testing.assert_allclose(got, ref, atol=1e-6,
                                   err_msg=f"trial {trial} sr={sr}")


def _offline_scores_cfg(model, state, wav, cfg):
    frames, _ = frame_coverage_labels(wav[None], [], [], cfg)
    if not len(frames):
        return np.zeros((0, 1), np.float32)
    fwd = make_eval_forward(model)
    logits = np.asarray(fwd(state.params, state.batch_stats,
                            jnp.asarray(np.transpose(frames, (0, 2, 1)))))
    return 1.0 / (1.0 + np.exp(-logits))


def test_waveform_pool_batched_tick_matches_per_slot(m5_state):
    """The pool tick scores ALL slots' completed frames in shared
    fixed-shape dispatches (cross-slot batching — frames are independent
    rows to M5): per-slot scores equal fresh single-stream detectors on the
    same audio, and the tick issues FEWER device dispatches than the
    per-slot path would."""
    from sed_tpu.waveform_streaming import WaveformStreamPool

    model, state = m5_state
    pool = WaveformStreamPool(model, state.params, state.batch_stats, WCFG,
                              slots=4, frame_bucket=8)
    calls = [0]
    orig = pool._score

    def spy(x):
        calls[0] += 1
        return orig(x)

    pool._score = spy

    rng = np.random.default_rng(3)
    lens = [5 * WCFG.frame_size + 123, 3 * WCFG.frame_size,
            4 * WCFG.frame_size + 7777]
    wavs = [(0.1 * rng.standard_normal(n)).astype(np.float32) for n in lens]
    slots = [pool.join() for _ in wavs]
    got = {s: [] for s in slots}

    # Feed uneven pieces over several ticks (all slots advance together).
    pos = [0] * len(wavs)
    while any(p < len(w) for p, w in zip(pos, wavs)):
        for i, s in enumerate(slots):
            step = 6000 + 1000 * i
            if pos[i] < len(wavs[i]):
                pool.feed(s, wavs[i][pos[i]: pos[i] + step])
                pos[i] += step
        for s, sc in pool.tick().items():
            got[s].append(sc)
    for i, s in enumerate(slots):
        tail = pool.leave(s)
        if tail.shape[0]:
            got[s].append(tail)

    batched_calls = calls[0]
    for i, s in enumerate(slots):
        ref = _offline_scores(model, state, wavs[i])
        have = np.concatenate(got[s], axis=0)
        assert have.shape == ref.shape, (i, have.shape, ref.shape)
        np.testing.assert_allclose(have, ref, atol=1e-6, err_msg=str(i))

    # Dispatch economy: a per-slot pool would pay >= one dispatch per slot
    # per advancing tick; the batched tick pays ceil(total_frames/bucket)
    # per round.  With 3 slots x ~1 frame/tick and bucket 8 the batched
    # count must be well under the per-slot count.
    total_frames = sum(_offline_scores(model, state, w).shape[0]
                       for w in wavs)
    assert batched_calls <= -(-total_frames // 8) + len(wavs) + 2, \
        (batched_calls, total_frames)


def test_waveform_pool_leave_many_matches_per_slot_leave(m5_state):
    """WaveformStreamPool.leave_many must equal per-slot leave() (same
    bucketed block shapes, so identical scores), including a never-fed slot
    and a not-joined slot mapped to its exception."""
    from sed_tpu.waveform_streaming import WaveformStreamPool

    model, state = m5_state
    rng = np.random.default_rng(7)
    lens = [3 * WCFG.frame_size + 500, 2 * WCFG.frame_size + 4567]
    wavs = [(0.1 * rng.standard_normal(n)).astype(np.float32) for n in lens]

    def build_and_feed():
        pool = WaveformStreamPool(model, state.params, state.batch_stats,
                                  WCFG, slots=4, frame_bucket=8)
        slots = [pool.join() for _ in range(3)]  # third: never fed
        for s, w in zip(slots, wavs):
            pool.feed(s, w[: WCFG.frame_size])
        out = pool.tick()
        for s, w in zip(slots, wavs):
            pool.feed(s, w[WCFG.frame_size:])
        return pool, slots, out

    pool_ref, slots_ref, _ = build_and_feed()
    ref = [pool_ref.leave(s) for s in slots_ref]

    pool_many, slots_many, _ = build_and_feed()
    tails = pool_many.leave_many(slots_many + [99])
    for s, r in zip(slots_many, ref):
        got = tails[s]
        assert got.shape == r.shape
        if got.shape[0]:
            np.testing.assert_allclose(got, r, atol=1e-6)
    assert isinstance(tails[99], ValueError)
    for _ in range(3):
        pool_many.join()  # slots freed


def test_device_waveform_pool_matches_offline_and_host_pool(m5_state):
    """DeviceWaveformStreamPool (round 5: HBM rings + raw sparse wire +
    on-device frame extraction): scores over a slot's lifetime equal BOTH
    the offline hop-strided split and the host-buffer WaveformStreamPool
    on the same audio, across uneven feed sizes, slot churn, multi-round
    backlogs (the scanned sparse block), and mixed int16/float feeds."""
    from sed_tpu.waveform_streaming import (DeviceWaveformStreamPool,
                                            WaveformStreamPool)

    model, state = m5_state
    rng = np.random.default_rng(17)
    chunk = WCFG.working_sample_rate
    wavs = {
        "a": (0.1 * rng.standard_normal(5 * WCFG.frame_size + 4321)
              ).astype(np.float32),
        "b": (3000 * rng.standard_normal(9 * WCFG.frame_size + 999)
              ).astype(np.int16),   # int16 wire + long backlog
        "c": (0.1 * rng.standard_normal(2 * WCFG.frame_size + 77)
              ).astype(np.float32),
    }

    dev = DeviceWaveformStreamPool(model, state.params, state.batch_stats,
                                   WCFG, slots=2, chunk_samples=chunk)
    host = WaveformStreamPool(model, state.params, state.batch_stats,
                              WCFG, slots=2)

    def run(pool, flood):
        got = {}
        for name, wav in wavs.items():
            s = pool.join()
            acc = []
            if flood:  # everything staged at once -> multi-round scan
                pool.feed(s, wav)
                o = pool.tick()
                if s in o:
                    acc.append(o[s])
            else:
                pos = 0
                while pos < len(wav):
                    n = int(rng.integers(500, 2 * chunk))
                    pool.feed(s, wav[pos: pos + n])
                    pos += n
                    o = pool.tick()
                    if s in o:
                        acc.append(o[s])
            acc.append(pool.leave(s))
            got[name] = np.concatenate(
                [x for x in acc if x.shape[0]], axis=0)
        return got

    got_flood = run(dev, flood=True)
    dev2 = DeviceWaveformStreamPool(model, state.params, state.batch_stats,
                                    WCFG, slots=2, chunk_samples=chunk)
    got_paced = run(dev2, flood=False)
    got_host = run(host, flood=False)

    for name, wav in wavs.items():
        f32 = wav.astype(np.float32) / 32768.0 if wav.dtype == np.int16 \
            else wav
        ref = _offline_scores(model, state, f32)
        for label, got in (("flood", got_flood), ("paced", got_paced),
                           ("host", got_host)):
            assert got[name].shape == ref.shape, (name, label,
                                                  got[name].shape, ref.shape)
            np.testing.assert_allclose(got[name], ref, atol=1e-5,
                                       err_msg=f"{name}/{label}")


def test_device_waveform_pool_sparse_slots_and_leave_many(m5_state):
    """Sparse ticks (slots at different rates) keep idle slots'
    rings/counters untouched; leave_many drains batched and equals
    per-slot leave."""
    from sed_tpu.waveform_streaming import DeviceWaveformStreamPool

    model, state = m5_state
    rng = np.random.default_rng(23)
    chunk = WCFG.working_sample_rate
    pool = DeviceWaveformStreamPool(model, state.params, state.batch_stats,
                                    WCFG, slots=3, chunk_samples=chunk)
    wav_a = (0.1 * rng.standard_normal(4 * WCFG.frame_size + 100)
             ).astype(np.float32)
    wav_b = (0.1 * rng.standard_normal(6 * WCFG.frame_size + 3000)
             ).astype(np.float32)
    a, b = pool.join(), pool.join()
    acc = {a: [], b: []}
    pa = pb = 0
    step_a, step_b = chunk // 2, 2 * chunk  # different rates
    while pa < len(wav_a) or pb < len(wav_b):
        if pa < len(wav_a):
            pool.feed(a, wav_a[pa: pa + step_a])
            pa += step_a
        if pb < len(wav_b):
            pool.feed(b, wav_b[pb: pb + step_b])
            pb += step_b
        o = pool.tick()
        for s in o:
            acc[s].append(o[s])
    tails = pool.leave_many([a, b])
    for s in (a, b):
        acc[s].append(tails[s])
    got_a = np.concatenate([x for x in acc[a] if x.shape[0]], axis=0)
    got_b = np.concatenate([x for x in acc[b] if x.shape[0]], axis=0)
    np.testing.assert_allclose(got_a, _offline_scores(model, state, wav_a),
                               atol=1e-5)
    np.testing.assert_allclose(got_b, _offline_scores(model, state, wav_b),
                               atol=1e-5)
    # Slots freed; rejoin works.
    c = pool.join()
    assert c in (a, b)


def test_device_waveform_pool_mesh_matches_single_device(m5_state):
    """mesh= shards the device pool's ring and tick batches over the slot
    axis; scores equal the no-mesh pool exactly (rows are independent)."""
    from sed_tpu.parallel.mesh import create_mesh
    from sed_tpu.waveform_streaming import DeviceWaveformStreamPool

    model, state = m5_state
    mesh = create_mesh(len(jax.devices()))
    chunk = WCFG.working_sample_rate
    rng = np.random.default_rng(51)
    wav = (3000 * rng.standard_normal(5 * WCFG.frame_size + 1234)
           ).astype(np.int16)

    def run(mesh_arg):
        pool = DeviceWaveformStreamPool(
            model, state.params, state.batch_stats, WCFG,
            slots=2 * len(jax.devices()), chunk_samples=chunk,
            mesh=mesh_arg)
        s = pool.join()
        pool.feed(s, wav)  # flood: multi-round path
        acc = [pool.tick().get(s)]
        acc.append(pool.leave(s))
        return np.concatenate([x for x in acc
                               if x is not None and x.shape[0]], axis=0)

    got = run(mesh)
    ref = run(None)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)
    off = _offline_scores(model, state, wav.astype(np.float32) / 32768.0)
    np.testing.assert_allclose(got, off, atol=1e-5)
