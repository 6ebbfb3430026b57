"""Protocol-abuse fuzzing of the TCP serving surface (sed_tpu/serve_socket.py).

test_serve_socket.py covers backend faults, vanishing clients, and pool-full;
this file feeds the length-prefixed reader MALFORMED wire input — garbage /
oversized / "negative" length prefixes, truncated headers, mid-frame
disconnects, odd-length PCM16 payloads, slow partial writers — and pins the
containment contract: every abuse closes ONLY the abusive connection, frees
its slot, and the pool keeps serving well-formed clients whose scores still
equal offline inference (the streaming invariant).

The reference has no serving surface at all (its infer.py:9-37 is batch
offline); this is hardening for the capability this repo adds on top.
"""

import socket as socket_mod
import struct
import threading
import time

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
_U32 = struct.Struct("<I")


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


def _raw_conn(server) -> socket_mod.socket:
    return socket_mod.create_connection(server.address)


def _assert_serving(server, model, state, seed=0):
    """A fresh well-formed client joins (slot was freed), streams, and its
    scores equal offline — the pool survived the abuse intact.  Retries the
    join briefly: the abused reader's drain may still be in flight."""
    pcm = (3000 * np.random.default_rng(seed)
           .standard_normal(3 * CHUNK + 137)).astype(np.int16)
    deadline = time.time() + 20
    got = None
    while time.time() < deadline:
        try:
            c = StreamClient(*server.address, classes_num=CFG.classes_num)
            c.send(pcm)
            got = c.finish()
            break
        except (RuntimeError, ConnectionError):
            time.sleep(0.25)  # slot not reclaimed yet
    assert got is not None, "server never served a clean client after abuse"
    ref = _offline(model, state, pcm.astype(np.float32) / 32768.0)
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.fixture()
def one_slot_server(model_state):
    """slots=1 makes slot reclamation observable: if the abused connection
    leaked its slot, the follow-up clean client could never join."""
    model, state = model_state
    pool = StreamPool(model, state.params, state.batch_stats, CFG, slots=1,
                      chunk_samples=CHUNK, halo=64, total_stride=8, bucket=64)
    server = StreamServer(pool, tick_interval=0.01)
    server.start()
    yield server, model, state
    server.stop()


@pytest.mark.parametrize("prefix", [0xFFFFFFF0,   # ~4 GiB: "negative" i32
                                    0x7FFFFFFF,   # 2 GiB-1
                                    (64 << 20) + 1])  # just over the cap
def test_oversized_length_prefix(one_slot_server, prefix):
    """A length prefix over max_frame_bytes must not make the reader buffer
    gigabytes: the connection closes, the slot frees, serving continues."""
    server, model, state = one_slot_server
    s = _raw_conn(server)
    s.sendall(_U32.pack(prefix) + b"x" * 1024)  # header + some junk bytes
    # The server must close this connection itself: clean EOF, or RST
    # (ECONNRESET) when it closes with the junk bytes still unread.
    s.settimeout(10)
    try:
        assert s.recv(4096) == b""
    except ConnectionResetError:
        pass
    s.close()
    _assert_serving(server, model, state, seed=1)


def test_truncated_header_then_disconnect(one_slot_server):
    server, model, state = one_slot_server
    s = _raw_conn(server)
    s.sendall(b"\x10\x02")  # half a length prefix
    time.sleep(0.1)
    s.close()
    _assert_serving(server, model, state, seed=2)


def test_midframe_disconnect(one_slot_server):
    """Header promises 100000 bytes; the client dies after 400."""
    server, model, state = one_slot_server
    s = _raw_conn(server)
    s.sendall(_U32.pack(100000) + b"\x00" * 400)
    time.sleep(0.1)
    # RST instead of FIN: ECONNRESET on the reader's recv.
    s.setsockopt(socket_mod.SOL_SOCKET, socket_mod.SO_LINGER,
                 struct.pack("ii", 1, 0))
    s.close()
    _assert_serving(server, model, state, seed=3)


def test_odd_length_pcm16_frame(one_slot_server):
    """An int16 frame with an odd byte count is malformed by definition."""
    server, model, state = one_slot_server
    s = _raw_conn(server)
    s.sendall(_U32.pack(3) + b"abc")
    s.settimeout(10)
    try:
        assert s.recv(4096) == b""  # server closed on the malformed frame
    except ConnectionResetError:
        pass
    s.close()
    _assert_serving(server, model, state, seed=4)


def test_random_garbage_bytes(one_slot_server):
    """Unframed random bytes: whatever the first 4 bytes decode to, the
    connection must end contained (drain, free, keep serving)."""
    server, model, state = one_slot_server
    rng = np.random.default_rng(99)
    for trial in range(3):
        s = _raw_conn(server)
        s.sendall(rng.integers(0, 256, 2048, dtype=np.uint8).tobytes())
        time.sleep(0.1)
        s.close()
    _assert_serving(server, model, state, seed=5)


def test_slow_partial_writer_does_not_block_others(model_state):
    """A client stalled mid-frame occupies only its own slot: a concurrent
    well-formed client on another slot streams to completion with exact
    scores while the staller sits in recv."""
    model, state = model_state
    pool = StreamPool(model, state.params, state.batch_stats, CFG, slots=2,
                      chunk_samples=CHUNK, halo=64, total_stride=8, bucket=64)
    server = StreamServer(pool, tick_interval=0.01)
    server.start()
    try:
        staller = _raw_conn(server)
        staller.sendall(_U32.pack(10000) + b"\x00" * 100)  # then... nothing

        pcm = (3000 * np.random.default_rng(6)
               .standard_normal(3 * CHUNK + 41)).astype(np.int16)
        done = {}

        def run():
            c = StreamClient(*server.address, classes_num=CFG.classes_num)
            for i in range(0, len(pcm), 5000):
                c.send(pcm[i: i + 5000])
            done["scores"] = c.finish()

        t = threading.Thread(target=run)
        t.start()
        t.join(timeout=120)
        assert not t.is_alive(), "clean client starved by a stalled writer"
        ref = _offline(model, state, pcm.astype(np.float32) / 32768.0)
        np.testing.assert_allclose(done["scores"], ref, atol=1e-5)
        staller.close()
    finally:
        server.stop()


def test_idle_timeout_reclaims_stalled_slot(model_state):
    """With idle_timeout set, a mid-frame staller loses its slot after the
    timeout instead of holding it forever (slow-loris containment)."""
    model, state = model_state
    pool = StreamPool(model, state.params, state.batch_stats, CFG, slots=1,
                      chunk_samples=CHUNK, halo=64, total_stride=8, bucket=64)
    server = StreamServer(pool, tick_interval=0.01, idle_timeout=0.5)
    server.start()
    try:
        staller = _raw_conn(server)
        staller.sendall(_U32.pack(10000) + b"\x00" * 64)
        # Slot frees once the reader's recv times out (~0.5 s + drain).
        _assert_serving(server, model, state, seed=7)
        staller.close()
    finally:
        server.stop()
