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
