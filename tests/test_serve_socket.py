"""Live TCP streaming server (sed_tpu/serve_socket.py): scores received
over a connection's lifetime must equal offline scoring of the same audio,
across concurrent clients pushing at different rates; pool-full connections
are refused with the error frame."""

import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sed_tpu.configs import SpectrogramConfig
from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
from sed_tpu.serve_socket import StreamClient, StreamServer
from sed_tpu.stream_pool import StreamPool
from sed_tpu.streaming import BatchedStreamingDetector
from sed_tpu.train.optim import make_optimizer
from sed_tpu.train.state import init_state

CFG = SpectrogramConfig(working_sample_rate=8000, time_margin=0.33)
CHUNK = 8000


@pytest.fixture(scope="module")
def model_state():
    model = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL)
    tx = make_optimizer(1e-3)
    sample = jnp.zeros((1, CFG.train_crop_size, CFG.mel_bins, 1))
    return model, init_state(model, jax.random.key(0), sample, tx)


def _offline(model, state, wav_f32):
    det = BatchedStreamingDetector(model, state.params, state.batch_stats,
                                   CFG, batch=1, halo=64, total_stride=8,
                                   bucket=64)
    parts = [det.push(wav_f32[None])[0], det.flush()[0]]
    return np.concatenate([p for p in parts if p.shape[0]], axis=0)


def test_server_streams_match_offline(model_state):
    model, state = model_state
    pool = StreamPool(model, state.params, state.batch_stats, CFG, slots=2,
                      chunk_samples=CHUNK, halo=64, total_stride=8, bucket=64)
    server = StreamServer(pool, tick_interval=0.01)
    server.start()
    try:
        rng = np.random.default_rng(0)
        pcm = {
            "a": (3000 * rng.standard_normal(5 * CHUNK + 1717)
                  ).astype(np.int16),
            "b": (3000 * rng.standard_normal(3 * CHUNK + 99)
                  ).astype(np.int16),
        }
        results = {}

        def run(name, piece):
            c = StreamClient(*server.address, classes_num=CFG.classes_num)
            got = []
            pos = 0
            while pos < len(pcm[name]):
                c.send(pcm[name][pos: pos + piece])
                pos += piece
            # Drain everything (ticks + exact tail) via the end marker.
            got.append(c.finish())
            results[name] = np.concatenate(got, axis=0)

        # Two concurrent clients at different piece sizes (uneven rates).
        ts = [threading.Thread(target=run, args=("a", 5000)),
              threading.Thread(target=run, args=("b", 12345))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
            assert not t.is_alive()

        for name in pcm:
            ref = _offline(model, state,
                           pcm[name].astype(np.float32) / 32768.0)
            assert results[name].shape == ref.shape, name
            np.testing.assert_allclose(results[name], ref, atol=1e-5,
                                       err_msg=name)
    finally:
        server.stop()


def test_server_mulaw_wire_matches_offline(model_state):
    """'mulaw' wire mode: 1-byte/sample client frames; scores over the
    connection equal offline scoring of the µ-law-decoded audio (streaming
    invariant — the codec is the ONLY difference vs pcm16), and stay within
    the codec fidelity band of exact-PCM offline scores."""
    from sed_tpu.ops.mulaw import mulaw_decode_np, mulaw_encode

    model, state = model_state
    pool = StreamPool(model, state.params, state.batch_stats, CFG, slots=2,
                      chunk_samples=CHUNK, halo=64, total_stride=8, bucket=64)
    server = StreamServer(pool, tick_interval=0.01, wire="mulaw")
    server.start()
    try:
        rng = np.random.default_rng(7)
        pcm = (3000 * rng.standard_normal(3 * CHUNK + 513)).astype(np.int16)
        c = StreamClient(*server.address, classes_num=CFG.classes_num,
                         wire="mulaw")
        pos, piece = 0, 7000
        while pos < len(pcm):
            c.send(pcm[pos: pos + piece])  # client companded to 1 B/sample
            pos += piece
        got = c.finish()

        decoded = mulaw_decode_np(mulaw_encode(pcm))
        ref = _offline(model, state, decoded)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5)
        # Codec-level deviation vs the exact PCM16 pipeline is bounded (the
        # hardware fidelity record is benchmarks/MULAW_INGEST.json).
        exact = _offline(model, state, pcm.astype(np.float32) / 32768.0)
        assert float(np.abs(got - exact).max()) < 0.05
    finally:
        server.stop()

    with pytest.raises(ValueError, match="wire"):
        StreamServer(pool, wire="opus")
    with pytest.raises(ValueError, match="wire"):
        StreamClient("127.0.0.1", 1, wire="opus")


def test_server_refuses_when_full(model_state):
    model, state = model_state
    pool = StreamPool(model, state.params, state.batch_stats, CFG, slots=1,
                      chunk_samples=CHUNK, halo=64, total_stride=8, bucket=64)
    server = StreamServer(pool, tick_interval=0.01)
    server.start()
    try:
        first = StreamClient(*server.address)
        first.send(np.zeros(CHUNK, np.int16))  # occupy the only slot
        import time

        time.sleep(0.2)  # let the accept loop register the join
        second = StreamClient(*server.address)
        with pytest.raises((RuntimeError, ConnectionError)):
            second.send(np.zeros(64, np.int16))  # may buffer; poll surfaces it
            second.poll()
        # First stream still completes exactly.
        wav = (3000 * np.random.default_rng(1).standard_normal(2 * CHUNK)
               ).astype(np.int16)
        first.send(wav)
        out = first.finish()
        ref = _offline(model, state,
                       np.concatenate([np.zeros(CHUNK, np.float32),
                                       wav.astype(np.float32) / 32768.0]))
        np.testing.assert_allclose(out, ref, atol=1e-5)
    finally:
        server.stop()


def test_server_m5_pool_matches_offline_split():
    """The same StreamServer drives the waveform family: an M5 pool scores
    hop-strided frames; a connection's scores equal the offline split."""
    from sed_tpu.configs import WaveformConfig
    from sed_tpu.data.events import frame_coverage_labels
    from sed_tpu.models.m5 import M5
    from sed_tpu.train.state import make_eval_forward
    from sed_tpu.waveform_streaming import WaveformStreamPool

    wcfg = WaveformConfig(working_sample_rate=8000, time_margin=0.33)
    model = M5(classes_num=1)
    tx = make_optimizer(1e-3)
    state = init_state(model, jax.random.key(0),
                       jnp.zeros((1, wcfg.frame_size, 1)), tx)
    pool = WaveformStreamPool(model, state.params, state.batch_stats, wcfg,
                              slots=2)
    server = StreamServer(pool, tick_interval=0.01)
    server.start()
    try:
        rng = np.random.default_rng(3)
        pcm = (3000 * rng.standard_normal(5 * wcfg.frame_size + 321)
               ).astype(np.int16)
        c = StreamClient(*server.address, classes_num=1)
        for i in range(0, len(pcm), 4321):
            c.send(pcm[i: i + 4321])
        got = c.finish()

        frames, _ = frame_coverage_labels(
            (pcm.astype(np.float32) / 32768.0)[None], [], [], wcfg)
        fwd = make_eval_forward(model)
        ref = np.asarray(jax.nn.sigmoid(fwd(
            state.params, state.batch_stats,
            jnp.asarray(np.transpose(frames, (0, 2, 1))))))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-6)
    finally:
        server.stop()


def test_server_m5_pool_mulaw_wire():
    """wire='mulaw' over the waveform family: the M5 pool receives raw
    uint8 µ-law (the repo-wide ingest convention) and host-decodes it;
    scores equal offline scoring of the decoded audio."""
    from sed_tpu.configs import WaveformConfig
    from sed_tpu.data.events import frame_coverage_labels
    from sed_tpu.models.m5 import M5
    from sed_tpu.ops.mulaw import mulaw_decode_np, mulaw_encode
    from sed_tpu.train.state import make_eval_forward
    from sed_tpu.waveform_streaming import WaveformStreamPool

    wcfg = WaveformConfig(working_sample_rate=8000, time_margin=0.33)
    model = M5(classes_num=1)
    tx = make_optimizer(1e-3)
    state = init_state(model, jax.random.key(0),
                       jnp.zeros((1, wcfg.frame_size, 1)), tx)
    pool = WaveformStreamPool(model, state.params, state.batch_stats, wcfg,
                              slots=2)
    server = StreamServer(pool, tick_interval=0.01, wire="mulaw")
    server.start()
    try:
        rng = np.random.default_rng(9)
        pcm = (3000 * rng.standard_normal(3 * wcfg.frame_size + 777)
               ).astype(np.int16)
        c = StreamClient(*server.address, classes_num=1, wire="mulaw")
        for i in range(0, len(pcm), 4321):
            c.send(pcm[i: i + 4321])
        got = c.finish()

        decoded = mulaw_decode_np(mulaw_encode(pcm))
        frames, _ = frame_coverage_labels(decoded[None], [], [], wcfg)
        fwd = make_eval_forward(model)
        ref = np.asarray(jax.nn.sigmoid(fwd(
            state.params, state.batch_stats,
            jnp.asarray(np.transpose(frames, (0, 2, 1))))))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-6)
    finally:
        server.stop()


def test_server_survives_backend_fault_during_drain(model_state):
    """A transient backend fault while draining one stream's tail (e.g. an
    accelerator RPC error) must not take the server down: the faulting
    client sees a connection error, the slot is freed, and the NEXT
    connection serves normally."""
    model, state = model_state
    pool = StreamPool(model, state.params, state.batch_stats, CFG, slots=1,
                      chunk_samples=CHUNK, halo=64, total_stride=8, bucket=64)
    orig_leave_many = pool.leave_many
    fail_once = [True]

    def flaky_leave_many(slots):
        if fail_once[0]:
            fail_once[0] = False
            orig_leave_many(slots)  # free slots the way a mid-drain fault does
            raise RuntimeError("transient backend fault (simulated)")
        return orig_leave_many(slots)

    pool.leave_many = flaky_leave_many
    server = StreamServer(pool, tick_interval=0.01)
    server.start()
    try:
        rng = np.random.default_rng(11)
        pcm = (3000 * rng.standard_normal(4 * CHUNK + 500)).astype(np.int16)
        c = StreamClient(*server.address, classes_num=CFG.classes_num)
        c.send(pcm)
        with pytest.raises(ConnectionError):
            c.finish()

        # Slot freed; a fresh connection scores end to end.
        c2 = StreamClient(*server.address, classes_num=CFG.classes_num)
        c2.send(pcm)
        got = c2.finish()
        ref = _offline(model, state, pcm.astype(np.float32) / 32768.0)
        np.testing.assert_allclose(got, ref, atol=1e-5)
    finally:
        server.stop()


def test_server_reclaims_slot_when_client_vanishes(model_state):
    """A client killed mid-stream (no end marker) must not leak its slot:
    the reader's drain path runs on the disconnect and a new connection can
    join the freed slot (regression for the silent reader-thread death)."""
    import socket as socket_mod
    import time

    model, state = model_state
    pool = StreamPool(model, state.params, state.batch_stats, CFG, slots=1,
                      chunk_samples=CHUNK, halo=64, total_stride=8, bucket=64)
    server = StreamServer(pool, tick_interval=0.01)
    server.start()
    try:
        first = StreamClient(*server.address)
        first.send((3000 * np.random.default_rng(7)
                    .standard_normal(3 * CHUNK)).astype(np.int16))
        time.sleep(0.3)  # let ticks run
        # Vanish abruptly: RST instead of a clean end marker.
        first._sock.setsockopt(socket_mod.SOL_SOCKET, socket_mod.SO_LINGER,
                               b"\x01\x00\x00\x00\x00\x00\x00\x00")
        first._sock.close()

        deadline = time.time() + 10
        second = None
        while time.time() < deadline:
            try:
                cand = StreamClient(*server.address)
                cand.send(np.zeros(CHUNK, np.int16))
                time.sleep(0.2)
                cand.send(np.zeros(CHUNK, np.int16))
                out = cand.finish()  # raises if the join was refused
                second = out
                break
            except (RuntimeError, ConnectionError):
                time.sleep(0.3)  # slot not reclaimed yet
        assert second is not None, "slot was never reclaimed after the RST"
    finally:
        server.stop()


def test_flooding_client_receives_every_frame(model_state):
    """A faster-than-real-time client that stages its WHOLE stream and
    immediately signals end-of-stream must still receive every score frame:
    the drain flush ticks the staged backlog through the ring path and
    routes those scores to the leaving client's connection (round-5
    regression: the flush used to swap the drain queue out BEFORE ticking,
    dropping the backlog scores on the floor — only visible when staging
    outruns the tick clock)."""
    model, state = model_state
    pool = StreamPool(model, state.params, state.batch_stats, CFG, slots=2,
                      chunk_samples=CHUNK, halo=64, total_stride=8, bucket=64)
    # A slow tick clock guarantees the backlog is still staged at finish().
    server = StreamServer(pool, tick_interval=5.0, drain_gather=0.05)
    server.start()
    try:
        # Long enough that the backlog tick EMITS past the halo window
        # (~3 frames/chunk vs halo 64): a short stream would emit nothing
        # until the flush and could not expose dropped tick scores.
        pcm = (3000 * np.random.default_rng(23)
               .standard_normal(40 * CHUNK + 999)).astype(np.int16)
        c = StreamClient(*server.address, classes_num=CFG.classes_num)
        c.send(pcm)  # the whole stream in one piece
        got = c.finish()  # immediate end-of-stream: backlog still staged
        ref = _offline(model, state, pcm.astype(np.float32) / 32768.0)
        assert got.shape == ref.shape, (got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, atol=1e-5)
    finally:
        server.stop()


def test_server_m5_device_pool_matches_offline_split():
    """The TCP server drives the DEVICE M5 pool (HBM rings, raw sparse
    wire) blindly through the same join/feed/tick/leave surface; a
    connection's scores equal the offline hop-strided split."""
    from sed_tpu.configs import WaveformConfig
    from sed_tpu.data.events import frame_coverage_labels
    from sed_tpu.models.m5 import M5
    from sed_tpu.train.state import make_eval_forward
    from sed_tpu.waveform_streaming import DeviceWaveformStreamPool

    wcfg = WaveformConfig(working_sample_rate=8000, time_margin=0.33)
    model = M5(classes_num=1)
    tx = make_optimizer(1e-3)
    state = init_state(model, jax.random.key(0),
                       jnp.zeros((1, wcfg.frame_size, 1)), tx)
    pool = DeviceWaveformStreamPool(model, state.params, state.batch_stats,
                                    wcfg, slots=2,
                                    chunk_samples=wcfg.working_sample_rate)
    server = StreamServer(pool, tick_interval=0.01, drain_gather=0.05)
    server.start()
    try:
        rng = np.random.default_rng(33)
        pcm = (3000 * rng.standard_normal(5 * wcfg.frame_size + 321)
               ).astype(np.int16)
        c = StreamClient(*server.address, classes_num=1)
        for i in range(0, len(pcm), 4321):
            c.send(pcm[i: i + 4321])
        got = c.finish()

        frames, _ = frame_coverage_labels(
            (pcm.astype(np.float32) / 32768.0)[None], [], [], wcfg)
        fwd = make_eval_forward(model)
        ref = np.asarray(jax.nn.sigmoid(fwd(
            state.params, state.batch_stats,
            jnp.asarray(np.transpose(frames, (0, 2, 1))))))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5)
    finally:
        server.stop()


def test_server_m5_device_pool_mulaw_wire():
    """wire='mulaw' over the DEVICE M5 pool: raw uint8 rides the socket AND
    the device wire (decoded in the tick's ingest — this pool follows the
    device-decode convention); scores equal offline scoring of the decoded
    audio."""
    from sed_tpu.configs import WaveformConfig
    from sed_tpu.data.events import frame_coverage_labels
    from sed_tpu.models.m5 import M5
    from sed_tpu.ops.mulaw import mulaw_decode_np, mulaw_encode
    from sed_tpu.train.state import make_eval_forward
    from sed_tpu.waveform_streaming import DeviceWaveformStreamPool

    wcfg = WaveformConfig(working_sample_rate=8000, time_margin=0.33)
    model = M5(classes_num=1)
    tx = make_optimizer(1e-3)
    state = init_state(model, jax.random.key(0),
                       jnp.zeros((1, wcfg.frame_size, 1)), tx)
    pool = DeviceWaveformStreamPool(model, state.params, state.batch_stats,
                                    wcfg, slots=2,
                                    chunk_samples=wcfg.working_sample_rate)
    server = StreamServer(pool, tick_interval=0.01, wire="mulaw",
                          drain_gather=0.05)
    server.start()
    try:
        rng = np.random.default_rng(41)
        pcm = (3000 * rng.standard_normal(4 * wcfg.frame_size + 777)
               ).astype(np.int16)
        c = StreamClient(*server.address, classes_num=1, wire="mulaw")
        for i in range(0, len(pcm), 5000):
            c.send(pcm[i: i + 5000])
        got = c.finish()

        decoded = mulaw_decode_np(mulaw_encode(pcm))
        frames, _ = frame_coverage_labels(decoded[None], [], [], wcfg)
        fwd = make_eval_forward(model)
        ref = np.asarray(jax.nn.sigmoid(fwd(
            state.params, state.batch_stats,
            jnp.asarray(np.transpose(frames, (0, 2, 1))))))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5)
    finally:
        server.stop()
