"""Streaming inference for the waveform (M5) model family.

The spectrogram streaming stack (streaming.py / device_streaming.py /
stream_pool.py) needs rings and halos because the 2-D CNN is convolutional
over time.  M5 is simpler: it scores each hop-strided 31680-sample frame
INDEPENDENTLY (global mean over time inside the frame — reference
waveform_models.py:59-69), so streaming is a rolling sample buffer that
emits one score per completed frame, exactly matching the offline
validation splitter (reference waveform_dataset.py:10-30; our
data/events.py frame_coverage_labels: frame i covers samples
``[i*hop, i*hop + 2*(frame_size//2))``).

Scores are EXACTLY the offline per-frame scores — same forward, same
windows; no emission latency beyond the frame itself (a frame finalizes the
moment its last sample arrives).  tests/test_waveform_streaming.py pins
equality against the offline split across random push sizes.

``qparams`` switches the forward to the int8 M5 serving path
(models/quantize.py quantized_m5_forward) — lossy, same contract as the
spectrogram detectors' int8 mode.
"""

from __future__ import annotations

import threading
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sed_tpu.configs import WaveformConfig, DEFAULT_WAVEFORM


def make_m5_score_fn(model, params, batch_stats, qparams=None):
    """ONE jitted (n, frame) -> (n, classes) sigmoid scorer, shareable
    across detectors/pool slots (a fresh @jax.jit closure per stream would
    recompile the identical forward on every join)."""
    if qparams is not None:
        from sed_tpu.models.quantize import quantized_m5_forward

        fwd = partial(quantized_m5_forward, qparams)
    else:
        def fwd(x):
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, train=False)

    @jax.jit
    def score(frames):  # (n, frame) -> (n, classes)
        return jax.nn.sigmoid(fwd(frames[:, :, None]))

    return score


class BatchedWaveformStreamingDetector:
    """B lockstep waveform streams; push ANY number of samples per call.

    Returns (batch, new_frames, classes) sigmoid scores per push — frames
    whose last sample arrived in this chunk.  There is no flush: the offline
    splitter drops the partial tail (no end padding), so end-of-stream emits
    nothing further.
    """

    def __init__(self, model, params, batch_stats,
                 cfg: WaveformConfig = DEFAULT_WAVEFORM, batch: int = 1,
                 frame_bucket: int = 8, qparams=None, score_fn=None):
        """``score_fn``: optionally a shared jitted scorer from
        :func:`make_m5_score_fn` (pool slots share ONE compile)."""
        self.cfg = cfg
        self.batch = int(batch)
        self._frame = 2 * (cfg.frame_size // 2)  # == frame_size (even)
        self._hop = cfg.hop_size
        self._bucket = int(frame_bucket)
        self._total = 0     # samples received
        self._emitted = 0   # frames scored
        # Rolling buffer holds everything not yet fully consumed by a frame:
        # sample index of buf[:, 0] is emitted*hop.
        self._buf = np.zeros((self.batch, 0), np.float32)
        self._score = score_fn if score_fn is not None else make_m5_score_fn(
            model, params, batch_stats, qparams)

    def _ready(self, total: int) -> int:
        return 0 if total < self._frame else (total - self._frame) // self._hop + 1

    def extract_ready(self, chunk: np.ndarray) -> np.ndarray:
        """Consume ``chunk`` into the rolling buffer and return the newly
        completed hop-strided frames, (batch, k, frame) float32, WITHOUT
        scoring them.  The pool's batched tick uses this to gather every
        slot's frames into one device dispatch; :meth:`push` is this plus
        the bucketed scoring."""
        chunk = np.asarray(chunk)
        if chunk.dtype == np.int16:
            chunk = chunk.astype(np.float32) / 32768.0
        elif chunk.dtype == np.uint8:
            from sed_tpu.ops.mulaw import mulaw_decode_np

            chunk = mulaw_decode_np(chunk)
        chunk = chunk.astype(np.float32).reshape(self.batch, -1)
        self._buf = np.concatenate([self._buf, chunk], axis=1)
        self._total += chunk.shape[1]

        k = self._ready(self._total) - self._emitted
        if k <= 0:
            return np.zeros((self.batch, 0, self._frame), np.float32)
        # Hop-strided frame VIEWS (no giant index array); the views keep the
        # pre-trim buffer alive, so trimming below cannot corrupt them.
        win = np.lib.stride_tricks.sliding_window_view(
            self._buf, self._frame, axis=1)
        frames = win[:, :: self._hop][:, :k]            # (batch, k, frame)
        self._emitted += k
        self._buf = self._buf[:, k * self._hop:]       # drop consumed hops
        return frames

    def push(self, chunk: np.ndarray) -> np.ndarray:
        """(batch, samples) float32 — or int16 PCM (de-quantized by 1/32768,
        the ONE PCM16 rule) or uint8 µ-law (decoded host-side here; the M5
        device path is float32) — any sample count, same for every row."""
        frames = self.extract_ready(chunk)
        k = frames.shape[1]
        if k == 0:
            return np.zeros((self.batch, 0, self._classes()), np.float32)
        # Scored in FIXED bucket-sized chunks: one compiled shape no
        # matter how large a push (a whole drained file) is.
        fb = self._bucket
        outs = []
        for j in range(0, k, fb):
            blk = frames[:, j: j + fb]
            if blk.shape[1] != fb:  # pad the tail block only
                blk = np.concatenate(
                    [blk, np.zeros((self.batch, fb - blk.shape[1],
                                    self._frame), np.float32)], axis=1)
            flat = jnp.asarray(np.ascontiguousarray(
                blk.reshape(self.batch * fb, self._frame)))
            outs.append(np.asarray(self._score(flat))
                        .reshape(self.batch, fb, -1))
        scores = np.concatenate(outs, axis=1)[:, :k]
        return scores

    def _classes(self) -> int:
        return self.cfg.classes_num


class WaveformStreamingDetector(BatchedWaveformStreamingDetector):
    """Single live waveform stream: push (samples,), get (frames, classes)."""

    def __init__(self, model, params, batch_stats,
                 cfg: WaveformConfig = DEFAULT_WAVEFORM,
                 frame_bucket: int = 8, qparams=None, score_fn=None):
        super().__init__(model, params, batch_stats, cfg, batch=1,
                         frame_bucket=frame_bucket, qparams=qparams,
                         score_fn=score_fn)

    def push(self, chunk: np.ndarray) -> np.ndarray:
        return super().push(np.asarray(chunk).reshape(1, -1))[0]


class WaveformStreamPool:
    """Pool-shaped adapter for serving M5 streams (join/leave/feed/tick —
    the same surface :class:`sed_tpu.serve_socket.StreamServer` drives, so
    the TCP server serves either family unchanged).

    M5 frames are independent and any staged audio can be consumed at every
    tick (no fixed chunk), so each slot keeps its own rolling buffer
    (:class:`WaveformStreamingDetector`), but :meth:`tick` scores EVERY
    slot's newly completed frames in shared fixed-shape device dispatches —
    one batched MXU forward per ``frame_bucket`` frames across the whole
    pool, instead of one dispatch per slot (B dispatches/tick is
    dispatch-latency-bound on any host).  The block shape equals the
    per-slot path's, so both share ONE compiled program and scores are
    identical.  Slots are bounded to keep the join/refuse contract of the
    spectrogram pool.
    """

    def __init__(self, model, params, batch_stats,
                 cfg: WaveformConfig = DEFAULT_WAVEFORM, slots: int = 8,
                 frame_bucket: int = 8, qparams=None):
        self.cfg = cfg
        self.slots = int(slots)
        self._bucket = int(frame_bucket)
        # ONE jitted scorer for the whole pool: joins must not recompile
        # (a per-slot @jax.jit closure would retrace on every connection).
        shared = make_m5_score_fn(model, params, batch_stats, qparams)
        self._score = shared
        self._make = lambda: WaveformStreamingDetector(
            model, params, batch_stats, cfg, frame_bucket=frame_bucket,
            score_fn=shared)
        self._dets: dict = {}
        self._staged: dict = {}
        # feed() appends under this small lock so reader threads can stage
        # concurrently with the ticker thread's device work (same contract
        # as StreamPool: every other method needs external serialization).
        self._stage_lock = threading.Lock()

    THREAD_SAFE_FEED = True

    def join(self) -> int:
        for b in range(self.slots):
            if b not in self._dets:
                self._dets[b] = self._make()
                self._staged[b] = []
                return b
        raise RuntimeError(f"all {self.slots} slots are occupied")

    def feed(self, b: int, samples: np.ndarray) -> None:
        if b not in self._dets:
            raise ValueError(f"slot {b} is not joined")
        arr = np.asarray(samples)
        if arr.ndim != 1:
            raise ValueError(f"samples must be 1-D, got shape {arr.shape}")
        if arr.dtype == np.int16:
            arr = arr.astype(np.float32) / 32768.0
        elif arr.dtype == np.uint8:
            # µ-law decodes at HOST ingest here (vs ON DEVICE in the
            # spectrogram StreamPool): M5 streaming state is a host f32
            # rolling buffer accepting mixed-dtype feeds, and tick
            # dispatches ship extracted OVERLAPPING frames — never the wire
            # bytes — so device decode has no H2D bytes to save.  Same
            # "uint8 = µ-law, decoded by ingest" rule, different decode
            # site by architecture (CLAUDE.md ingest invariant).
            from sed_tpu.ops.mulaw import mulaw_decode_np

            arr = mulaw_decode_np(arr)
        with self._stage_lock:
            self._staged[b].append(arr.astype(np.float32))

    def tick(self) -> dict:
        """Score every completed frame of every slot's staged audio — all
        slots batched into shared ``frame_bucket``-row device dispatches
        (frames are independent rows to M5, so cross-slot batching is
        exact)."""
        per = []  # (slot, (k_b, frame) frames) in slot order
        for b in list(self._staged):
            # Swap the piece list out under the stage lock: a reader
            # appending between the read and the clear must never be lost.
            with self._stage_lock:
                pieces = self._staged.get(b)
                if not pieces:
                    continue
                self._staged[b] = []
            frames = self._dets[b].extract_ready(
                np.concatenate(pieces)[None])
            if frames.shape[1]:
                per.append((b, frames[0]))
        if not per:
            return {}
        scores = self._score_rows(np.concatenate([f for _, f in per], axis=0))
        out, pos = {}, 0
        for b, f in per:
            out[b] = scores[pos: pos + f.shape[0]]
            pos += f.shape[0]
        return out

    def _score_rows(self, allf: np.ndarray) -> np.ndarray:
        """Score (N, frame) rows in shared ``frame_bucket``-row dispatches
        (zero-padding the tail block only); frames are independent rows to
        M5, so batching across slots is exact."""
        n, fb = allf.shape[0], self._bucket
        outs = []
        for j in range(0, n, fb):
            blk = allf[j: j + fb]
            if blk.shape[0] != fb:  # pad the tail block only
                blk = np.concatenate(
                    [blk, np.zeros((fb - blk.shape[0], blk.shape[1]),
                                   np.float32)], axis=0)
            outs.append(np.asarray(self._score(
                jnp.asarray(np.ascontiguousarray(blk)))))
        return np.concatenate(outs, axis=0)[:n]

    def leave(self, b: int) -> np.ndarray:
        """Frames are emitted as soon as they complete, so the tail is just
        whatever staged audio still finishes a frame; the sub-frame
        remainder is dropped (the offline splitter has no end padding)."""
        if b not in self._dets:
            raise ValueError(f"slot {b} is not joined")
        with self._stage_lock:
            pieces = self._staged.pop(b)
        det = self._dets.pop(b)
        if pieces:
            return det.push(np.concatenate(pieces))
        return np.zeros((0, self.cfg.classes_num), np.float32)

    def leave_many(self, slots) -> dict:
        """Drain several leaving streams at once, their completed tail
        frames batched into the shared ``frame_bucket``-row dispatches (the
        same block shape as tick()/leave(), so identical scores from ONE
        compiled program).  Same result contract as StreamPool.leave_many:
        ``{slot: (frames, classes) ndarray}``, with per-slot host-side
        failures mapped to the exception instance."""
        empty = np.zeros((0, self.cfg.classes_num), np.float32)
        per, tails = [], {}
        for b in list(slots):
            try:
                if b not in self._dets:
                    raise ValueError(f"slot {b} is not joined")
                with self._stage_lock:
                    pieces = self._staged.pop(b)
                det = self._dets.pop(b)
                frames = (det.extract_ready(np.concatenate(pieces)[None])
                          if pieces else None)
                if frames is not None and frames.shape[1]:
                    per.append((b, frames[0]))
                else:
                    tails[b] = empty
            except Exception as e:  # noqa: BLE001 — per-slot prep fault
                tails[b] = e
        if per:
            scores = self._score_rows(
                np.concatenate([f for _, f in per], axis=0))
            pos = 0
            for b, f in per:
                tails[b] = scores[pos: pos + f.shape[0]]
                pos += f.shape[0]
        return tails


class DeviceWaveformStreamPool:
    """M5 serving pool with DEVICE-RESIDENT sample rings and a raw-wire
    tick: the answer to the host pool's H2D bill.

    :class:`WaveformStreamPool` keeps per-slot host buffers and ships the
    extracted frames to the device as float32 — 4 bytes/sample TIMES the 2x
    hop overlap (hop = frame/2) = **8x the raw wire bytes** (a 16x60 s
    serving run ships ~372 MB for 92 MB of audio; the entire 17.9 s tick
    wall of the round-5 M5 socket profile was this transfer).  Here each
    slot owns a row of an HBM sample ring; a tick ships ONE raw
    ``chunk_samples`` block per pushing slot (int16 PCM or uint8 µ-law
    decoded ON DEVICE — the repo ingest conventions), extracts the newly
    completed hop-strided frames with vmapped dynamic slices IN the jitted
    step, and scores them in the same dispatch.  Multi-round backlogs ride
    a lax.scan block over a SPARSE wire (flat real-chunk array + index
    gather, the stream_pool.py design; buckets are powers of 4).

    M5 needs none of the spectrogram pool's startup machinery: frames
    start at sample 0 (no reflect padding), each frame is independent (no
    halo), and a frame's score finalizes the moment its last sample
    arrives — so every slot is ring-admitted AT JOIN and the only host
    work left is the sub-chunk tail at leave.

    Same ``join/feed/tick/leave/leave_many`` surface as the host pool;
    scores equal the offline splitter exactly
    (tests/test_waveform_streaming.py pins all three against each other).
    """

    THREAD_SAFE_FEED = True
    ROUNDS_PER_CALL = 16

    def __init__(self, model, params, batch_stats,
                 cfg: WaveformConfig = DEFAULT_WAVEFORM, slots: int = 8,
                 chunk_samples: int | None = None, qparams=None, mesh=None):
        """``mesh``: optional jax.sharding.Mesh — the slot axis of the ring
        and every tick batch shards over it (data-parallel serving, same
        contract as StreamPool's mesh mode).  Multi-round backlogs run
        sequential single-round dispatches under a mesh (the sparse-wire
        gather is a single-device optimization for relay-attached hosts;
        a real pod is direct-attached and per-round dispatch is cheap)."""
        self.cfg = cfg
        self.slots = B = int(slots)
        self.chunk = C = int(chunk_samples or cfg.working_sample_rate)
        self._frame = F_len = 2 * (cfg.frame_size // 2)
        self._hop = hop = cfg.hop_size
        if C < F_len:
            # One chunk must be able to complete at least the frame that
            # ends inside it even when it starts mid-frame; C >= frame
            # keeps F small and the ring bound simple.
            raise ValueError(f"chunk_samples {C} < frame {F_len}")
        self._F = F = (C - 1) // hop + 1  # max frames completing per chunk
        self._L = L = C + F_len + hop    # ring length
        classes = cfg.classes_num

        from sed_tpu.ops.featurizer import ingest_to_f32

        if qparams is not None:
            from sed_tpu.models.quantize import quantized_m5_forward

            fwd = partial(quantized_m5_forward, qparams)
        else:
            def fwd(x):
                return model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    x, train=False)
        self._qparams = qparams
        # Shared host-side scorer for the leave tails (fixed 64-row block,
        # the same program the host pool and detectors warm).
        self._score = make_m5_score_fn(model, params, batch_stats, qparams)

        def step(buf, chunk, active, offs, n_new):
            """One pool tick round: shift active rows' rings by the
            ingested chunk, extract each slot's newly completed frames
            (ring-relative ``offs``, ``n_new`` <= F real), score them
            fused.  Rows absent from the round (active=False, all-zero
            scalars) are bit-untouched; their extracted junk is masked by
            the host (n_new=0)."""
            newc = ingest_to_f32(chunk)
            buf = jnp.where(active[:, None],
                            jnp.concatenate([buf[:, C:], newc], axis=1), buf)

            def extract(row, offrow):  # (L,), (F,) -> (F, frame)
                return jnp.stack([
                    jax.lax.dynamic_slice(row, (offrow[j],), (F_len,))
                    for j in range(F)
                ])

            frames = jax.vmap(extract)(buf, offs)         # (B, F, frame)
            scores = jax.nn.sigmoid(
                fwd(frames.reshape(B * F, F_len)[:, :, None]))
            return buf, scores.reshape(B, F, classes)

        self._step = jax.jit(step, donate_argnums=(0,))

        def steps_sparse(buf, flat, idx, active, offs, n_new):
            """K rounds in one dispatch over the sparse wire (see
            stream_pool.steps_sparse — same design: inactive cells gather
            row 0, masked by ``active``)."""
            chunks = jnp.take(flat, idx, axis=0)  # (K, B, chunk)

            def body(b, xs):
                b, o = step(b, *xs)
                return b, o

            buf, outs = jax.lax.scan(body, buf, (chunks, active, offs, n_new))
            return buf, outs

        self._steps_sparse = jax.jit(steps_sparse, donate_argnums=(0,))
        if mesh is not None:
            from sed_tpu.parallel.mesh import batch_sharding

            if B % mesh.size != 0:
                raise ValueError(
                    f"slots {B} must divide over the {mesh.size}-device mesh")
            self._sharding = batch_sharding(mesh)
            self._buf = jax.device_put(np.zeros((B, L), np.float32),
                                       self._sharding)
        else:
            self._sharding = None
            self._buf = jnp.zeros((B, L), jnp.float32)
        self._row_get = jax.jit(lambda buf, b: (
            jax.lax.dynamic_slice_in_dim(buf, b, 1, 0)[0]))

        self._counters: dict = {}   # slot -> {"total", "emitted"}
        self._staged: dict = {}     # slot -> [pieces]
        self._staged_n: dict = {}
        self._stage_lock = threading.Lock()

    # -- lifecycle -----------------------------------------------------------

    def join(self) -> int:
        for b in range(self.slots):
            if b not in self._counters:
                # No ring-row reset needed: a fresh stream's frames only
                # ever read samples it pushed (off >= L - total always).
                self._counters[b] = {"total": 0, "emitted": 0}
                return b
        raise RuntimeError(f"all {self.slots} slots are occupied")

    def feed(self, b: int, samples: np.ndarray) -> None:
        """Stage ANY number of samples (int16 PCM / uint8 µ-law / float32
        — the ingest dtype conventions; µ-law decodes ON DEVICE in the
        tick, this being the device-resident pool).  Thread-safe against a
        concurrent tick (same contract as StreamPool.feed)."""
        if b not in self._counters:
            raise ValueError(f"slot {b} is not joined")
        arr = np.asarray(samples)
        if arr.ndim != 1:
            raise ValueError(f"samples must be 1-D, got shape {arr.shape}")
        if arr.size == 0:
            return
        with self._stage_lock:
            self._staged.setdefault(b, []).append(arr.copy())
            self._staged_n[b] = self._staged_n.get(b, 0) + int(arr.size)

    @staticmethod
    def _f32(a: np.ndarray) -> np.ndarray:
        a = np.asarray(a)
        if a.dtype == np.int16:
            return a.astype(np.float32) / 32768.0
        if a.dtype == np.uint8:
            from sed_tpu.ops.mulaw import mulaw_decode_np

            return mulaw_decode_np(a)
        return a.astype(np.float32)

    def _flatten(self, pieces):
        if len(pieces) == 1:
            return pieces[0]
        if len({p.dtype for p in pieces}) == 1:
            return np.concatenate(pieces)
        return np.concatenate([self._f32(p) for p in pieces])

    def _slot_scalars(self, c: dict):
        """Ring-relative schedule for one slot consuming one chunk."""
        total2 = c["total"] + self.chunk
        ready = (0 if total2 < self._frame
                 else (total2 - self._frame) // self._hop + 1)
        n_new = ready - c["emitted"]
        offs = np.zeros(self._F, np.int32)
        for j in range(n_new):
            offs[j] = (c["emitted"] + j) * self._hop - (total2 - self._L)
        return offs, n_new, {"total": total2, "emitted": ready}

    # -- tick ----------------------------------------------------------------

    def push(self, chunks: dict) -> dict:
        """One ``(chunk_samples,)`` block for ANY subset of joined slots;
        returns ``{slot: (new_frames, classes)}``."""
        extra = set(chunks) - set(self._counters)
        if extra:
            raise ValueError(f"push for non-joined slots {sorted(extra)}")
        B, F = self.slots, self._F
        arrs = {}
        for b, ck in chunks.items():
            ck = np.asarray(ck)
            if ck.shape != (self.chunk,):
                raise ValueError(
                    f"slot {b}: chunk must be ({self.chunk},), got {ck.shape}")
            arrs[b] = ck
        if not arrs:
            return {}
        active = np.zeros(B, bool)
        offs = np.zeros((B, F), np.int32)
        n_new = np.zeros(B, np.int32)
        counters = {}
        dts = {a.dtype for a in arrs.values()}
        uniform = dts.pop() if len(dts) == 1 else None
        dt = (uniform if uniform in (np.dtype(np.int16), np.dtype(np.uint8))
              else np.float32)
        batch = np.zeros((B, self.chunk), dt)
        for b, ck in arrs.items():
            active[b] = True
            offs[b], n_new[b], counters[b] = self._slot_scalars(
                self._counters[b])
            batch[b] = ck if ck.dtype == dt else self._f32(ck)
        put = (jnp.asarray(batch) if self._sharding is None
               else jax.device_put(batch, self._sharding))
        self._buf, out = self._step(
            self._buf, put, jnp.asarray(active),
            jnp.asarray(offs), jnp.asarray(n_new))
        out = np.asarray(out)
        self._counters.update(counters)
        return {b: out[b, : n_new[b]] for b in arrs}

    def tick(self) -> dict:
        """Score every staged full chunk of every slot (multi-round
        backlogs ride scanned sparse-wire blocks); same snapshot/restore
        semantics as StreamPool.tick."""
        with self._stage_lock:
            take = {}
            for b in list(self._staged):
                if self._staged_n.get(b, 0) >= self.chunk:
                    take[b] = self._flatten(self._staged.pop(b))
                    self._staged_n[b] = 0
        if not take:
            return {}
        pos = {b: 0 for b in take}
        out: dict = {}
        try:
            rounds, rpos = [], dict(pos)
            while True:
                chunks = {b: a[rpos[b]: rpos[b] + self.chunk]
                          for b, a in take.items()
                          if a.size - rpos[b] >= self.chunk}
                if not chunks:
                    break
                for b in chunks:
                    rpos[b] += self.chunk
                rounds.append(chunks)
            for j in range(0, len(rounds), self.ROUNDS_PER_CALL):
                block = rounds[j: j + self.ROUNDS_PER_CALL]
                o = self._push_rounds(block)
                for r in block:
                    for b in r:
                        pos[b] += self.chunk
                for b, v in o.items():
                    out.setdefault(b, []).append(v)
        finally:
            with self._stage_lock:
                for b, a in take.items():
                    rem = a[pos[b]:]
                    pieces = ([rem] if rem.size else []) + \
                        (self._staged.get(b) or [])
                    if pieces:
                        self._staged[b] = pieces
                        self._staged_n[b] = sum(int(p.size) for p in pieces)
        return {b: (np.concatenate(v, axis=0) if len(v) > 1 else v[0])
                for b, v in out.items()}

    def _push_rounds(self, rounds) -> dict:
        """K rounds in one scanned dispatch over the sparse wire.  K == 1
        short-circuits to the dense single-round step; counters commit
        after the device call (fault-consistent, like push).  Under a mesh
        every round dispatches dense/sharded (see __init__)."""
        if len(rounds) == 1:
            return self.push(rounds[0])
        if self._sharding is not None:
            out: dict = {}
            for r in rounds:
                for b, v in self.push(r).items():
                    out.setdefault(b, []).append(v)
            return {b: (np.concatenate(v, axis=0) if len(v) > 1 else v[0])
                    for b, v in out.items()}
        B, F, K = self.slots, self._F, len(rounds)
        Kp = self.ROUNDS_PER_CALL
        assert K <= Kp
        counters = {b: dict(c) for b, c in self._counters.items()}
        active = np.zeros((Kp, B), bool)
        offs = np.zeros((Kp, B, F), np.int32)
        n_new = np.zeros((Kp, B), np.int32)
        emit_n = [dict() for _ in range(Kp)]
        dts = {r[b].dtype for r in rounds for b in r}
        uniform = dts.pop() if len(dts) == 1 else None
        dt = (uniform if uniform in (np.dtype(np.int16), np.dtype(np.uint8))
              else np.float32)
        cells = [(k, b) for k, r in enumerate(rounds) for b in r]
        bucket = 16
        while bucket < len(cells):
            bucket *= 4
        wire = np.zeros((bucket, self.chunk), dt)
        idx = np.zeros((Kp, B), np.int32)
        for j, (k, b) in enumerate(cells):
            ck = rounds[k][b]
            wire[j] = ck if ck.dtype == dt else self._f32(ck)
            idx[k, b] = j
            active[k, b] = True
            (offs[k, b], n_new[k, b], counters[b]) = self._slot_scalars(
                counters[b])
            emit_n[k][b] = int(n_new[k, b])
        self._buf, dev_out = self._steps_sparse(
            self._buf, jnp.asarray(wire), jnp.asarray(idx),
            jnp.asarray(active), jnp.asarray(offs), jnp.asarray(n_new))
        dev_out = np.asarray(dev_out)  # (Kp, B, F, classes)
        out: dict = {}
        for k, r in enumerate(rounds):
            for b in r:
                out.setdefault(b, []).append(dev_out[k, b, : emit_n[k][b]])
        self._counters.update(counters)
        return {b: (np.concatenate(v, axis=0) if len(v) > 1 else v[0])
                for b, v in out.items()}

    # -- leave ---------------------------------------------------------------

    def _tail_frames(self, b: int, rem) -> np.ndarray:
        """Frames completed by the sub-chunk remainder: ring tail + rem,
        extracted host-side (few rows; the device rings hold everything
        already consumed)."""
        c = self._counters[b]
        total = c["total"]
        rem = self._f32(rem) if rem is not None and rem.size else \
            np.zeros(0, np.float32)
        total2 = total + rem.size
        ready = (0 if total2 < self._frame
                 else (total2 - self._frame) // self._hop + 1)
        k = ready - c["emitted"]
        if k <= 0:
            return np.zeros((0, self._frame), np.float32)
        row = np.asarray(self._row_get(self._buf, b))
        hist = min(total, self._L)
        sig = np.concatenate([row[self._L - hist:], rem])  # samples since
        base = total2 - sig.size                           # sig[0]'s index
        frames = np.stack([
            sig[(c["emitted"] + j) * self._hop - base:
                (c["emitted"] + j) * self._hop - base + self._frame]
            for j in range(k)
        ])
        return frames

    def leave(self, b: int) -> np.ndarray:
        """End stream ``b``: score the frames its staged remainder
        completes (the offline splitter drops the sub-frame tail), free
        the slot."""
        if b not in self._counters:
            raise ValueError(f"slot {b} is not joined")
        with self._stage_lock:
            pieces = self._staged.pop(b, None)
            self._staged_n.pop(b, None)
        rem = self._flatten(pieces) if pieces else None
        frames = self._tail_frames(b, rem)
        del self._counters[b]
        if not frames.shape[0]:
            return np.zeros((0, self.cfg.classes_num), np.float32)
        pad = np.zeros((64, self._frame), np.float32)
        pad[: frames.shape[0]] = frames[:64]
        out = [np.asarray(self._score(jnp.asarray(pad)))[: min(
            frames.shape[0], 64)]]
        for j in range(64, frames.shape[0], 64):
            blk = frames[j: j + 64]
            pad = np.zeros((64, self._frame), np.float32)
            pad[: blk.shape[0]] = blk
            out.append(np.asarray(self._score(jnp.asarray(pad)))[
                : blk.shape[0]])
        return np.concatenate(out, axis=0)

    def leave_many(self, slots) -> dict:
        """Batched drains: every leaving slot's tail frames share the
        64-row score dispatches; per-slot host faults map to the exception
        instance (the serve_socket containment contract)."""
        empty = np.zeros((0, self.cfg.classes_num), np.float32)
        per, tails = [], {}
        for b in list(slots):
            try:
                if b not in self._counters:
                    raise ValueError(f"slot {b} is not joined")
                with self._stage_lock:
                    pieces = self._staged.pop(b, None)
                    self._staged_n.pop(b, None)
                rem = self._flatten(pieces) if pieces else None
                frames = self._tail_frames(b, rem)
                del self._counters[b]
                if frames.shape[0]:
                    per.append((b, frames))
                else:
                    tails[b] = empty
            except Exception as e:  # noqa: BLE001 — per-slot prep fault
                tails[b] = e
        if per:
            allf = np.concatenate([f for _, f in per], axis=0)
            outs = []
            for j in range(0, allf.shape[0], 64):
                blk = allf[j: j + 64]
                pad = np.zeros((64, self._frame), np.float32)
                pad[: blk.shape[0]] = blk
                outs.append(np.asarray(self._score(jnp.asarray(pad)))[
                    : blk.shape[0]])
            scores = np.concatenate(outs, axis=0)
            pos = 0
            for b, f in per:
                tails[b] = scores[pos: pos + f.shape[0]]
                pos += f.shape[0]
        return tails
