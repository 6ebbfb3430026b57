"""Device-resident streaming with per-slot lifecycle (join/leave).

:class:`DeviceStreamingDetector` (device_streaming.py) serves B LOCKSTEP
streams: one shared integer schedule, so the whole fleet must start and end
together.  Real serving has stream churn.  This module keeps the same
HBM-ring design — sample ring (B, L) and log-mel ring (B, M, mel) resident on
device, one jitted step per tick, int16 chunks in — but passes the schedule
scalars as PER-SLOT ``(B,)`` vectors and vmaps the ring slices over the slot
axis, so every slot runs its own schedule phase:

  * :meth:`join` allocates a free slot.  The new stream's first ticks run
    through a host-side :class:`BatchedStreamingDetector` (the proven
    reflect-padding startup, exactly as the lockstep class does for the whole
    fleet), then its state migrates into the slot's ring rows — other slots
    never stop.
  * :meth:`leave` migrates the slot's rows back to the host machinery for the
    exact tail flush and frees the slot for a future join.
  * Inactive slots are fed zero chunks and their outputs discarded; rows are
    independent in the tick step (inference-mode BatchNorm uses running
    stats), so junk in a free slot cannot contaminate active ones.

Chunks stay fixed-size — one ``chunk_samples`` block per pushing stream —
which is what makes the batched model forward ride the MXU.  But ticks are
SPARSE: :meth:`push` takes any subset of the joined slots; a slot absent
from a push idles (its rings and counters are untouched — the per-slot
``active`` mask gates its sample-ring shift), so each stream advances at its
own rate, and the SET of streams may change between ticks via join/leave.

Per-slot schedule arithmetic is the same integer math as
BatchedStreamingDetector's (streaming.py emission_upto/window_start — the ONE
shared definition, per CLAUDE.md); scores for an admitted slot are equal to a
fresh single-stream detector on the same audio to 1e-5 (jit fusion rounding),
with identical emission boundaries (tests/test_stream_pool.py).

The reference has no streaming at all (its infer.py:9-37 is batch-offline
only); this extends SURVEY.md's long-context/serving analog.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sed_tpu.configs import SpectrogramConfig, DEFAULT_SPECTROGRAM
from sed_tpu.ops import stft as stft_ops
from sed_tpu.ops.featurizer import ingest_to_f32, realimag_to_log_mel
from sed_tpu.streaming import (BatchedStreamingDetector, make_stream_fns,
                               tick_schedule)


class StreamPool:
    """A pool of ``slots`` concurrent streams with join/leave lifecycle.

    Typical serving loop::

        pool = StreamPool(model, params, batch_stats, slots=32,
                          chunk_samples=48000)
        a = pool.join(); b = pool.join()
        out = pool.push({a: chunk_a, b: chunk_b})   # {slot: (frames, classes)}
        tail = pool.leave(a)                        # exact flush tail
        c = pool.join()                             # reuses a's slot
    """

    def __init__(
        self,
        model,
        params,
        batch_stats,
        cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
        slots: int = 8,
        chunk_samples: int = 48000,
        halo: int = 64,
        total_stride: int = 8,
        bucket: int = 128,
        mean: Optional[np.ndarray] = None,
        std: Optional[np.ndarray] = None,
        mesh=None,
        featurizer: str = "auto",
        featurizer_precision=None,
        extract_impl: str = "slices",
        qparams=None,
    ):
        """``qparams``: optional int8 serving artifact (models/quantize.py /
        models/qat.py) — every slot (tick, startup, and flush) scores with
        the int8 MXU forward instead of the float model."""
        if extract_impl not in ("span", "slices"):
            raise ValueError(
                f"extract_impl must be span|slices, got {extract_impl}")
        self.cfg = cfg
        self.slots = int(slots)
        self.chunk = int(chunk_samples)
        self.halo = halo
        self.stride = total_stride
        self._pad = cfg.nfft // 2
        self._model, self._params, self._batch_stats = model, params, batch_stats

        hop = cfg.hop_size
        self._frames_max = -(-self.chunk // hop) + 1
        self._emit_max = total_stride * (
            -(-(self._frames_max + total_stride) // total_stride))
        need = 2 * halo + 2 * total_stride + self._frames_max
        self._m = bucket * (-(-need // bucket))          # mel ring length
        self._l = self.chunk + cfg.nfft + hop            # sample ring length
        self._switch_after = cfg.nfft + hop
        self.mean = None if mean is None else np.asarray(mean, np.float32)
        self.std = None if std is None else np.asarray(std, np.float32)

        # Per-slot host state.  A slot is one of:
        #   free      — available for join()
        #   pending   — joined, running host-side startup (self._pending[b])
        #   admitted  — state lives in the device ring rows
        self._qparams = qparams
        # ONE shared (featurize, forward) jit pair for every per-stream
        # host detector this pool ever constructs (join startup, leave
        # drain): without it each lifecycle event re-traced identical
        # programs (~29 s/leave on the TPU relay — see
        # streaming.make_stream_fns).  Building the closures is lazy/free;
        # nothing compiles until a stream actually pushes.
        self._stream_fns = make_stream_fns(
            model, params, batch_stats, cfg, mean=self.mean, std=self.std,
            qparams=qparams)
        self._pending: Dict[int, BatchedStreamingDetector] = {}
        self._admitted: Dict[int, dict] = {}   # slot -> schedule counters
        # Staged audio is a per-slot LIST of fed pieces guarded by its own
        # small lock, so :meth:`feed` is safe to call from reader threads
        # WITHOUT the caller's device lock (serve_socket relies on this:
        # readers must keep staging while a multi-second tick dispatch runs,
        # otherwise ticks starve and every scanned block ships mostly
        # padding — the round-4 serving-gap root cause).  All other methods
        # still require external serialization (one device-driving thread).
        self._staged: Dict[int, List[np.ndarray]] = {}
        self._staged_n: Dict[int, int] = {}
        self._stage_lock = threading.Lock()
        # Optional per-phase profile accumulator (set to {} to enable): the
        # tick path records where wall time goes — pending-startup rounds,
        # scanned-block host build, H2D staging, and device exec — plus the
        # real-vs-padded round mix and wire bytes, so serving benches can
        # attribute the tick wall clock instead of guessing
        # (SERVE_SOCKET_BENCH.json round-4 verdict gap).  Profiling forces a
        # sync after H2D staging to split it from exec; leave it None in
        # production.
        self.profile: Optional[dict] = None

        B, L, M = self.slots, self._l, self._m
        if mesh is not None:
            from sed_tpu.parallel.mesh import batch_sharding

            if slots % mesh.size != 0:
                raise ValueError(
                    f"slots {slots} must divide over the {mesh.size}-device mesh")
            self._sharding = batch_sharding(mesh)
            # The scanned multi-round tick's wire batch is (rounds, slots,
            # chunk): replicate the rounds axis, shard the slot axis.
            from jax.sharding import NamedSharding, PartitionSpec

            self._sharding_rounds = NamedSharding(
                mesh, PartitionSpec(None, *self._sharding.spec))
        else:
            self._sharding = None
            self._sharding_rounds = None
        self._buf = self._put(np.zeros((B, L), np.float32))
        self._mel = self._put(np.zeros((B, M, cfg.mel_bins), np.float32))

        window = jnp.asarray(stft_ops.padded_window(cfg.frame_size, cfg.nfft))
        mean_j = None if mean is None else jnp.asarray(mean, jnp.float32)
        std_j = None if std is None else jnp.asarray(std, jnp.float32)
        C, F, EM = self.chunk, self._frames_max, self._emit_max
        nfft, mel_bins = cfg.nfft, cfg.mel_bins
        from sed_tpu.device_streaming import resolve_tick_featurizer

        self._featurizer = resolve_tick_featurizer(featurizer, cfg, mesh)
        use_pallas_feat = self._featurizer == "pallas"
        from sed_tpu.ops.featurizer import resolve_featurizer_precision

        feat_prec = resolve_featurizer_precision(featurizer_precision)

        def step(buf, mel_ring, chunk, active, offs, n_new, write_pos,
                 win_off, e_off, shift):
            """One pool tick.  Scalars are (B,) per-slot vectors (offs is
            (B, F)); ring slices are vmapped over the slot axis, the
            featurize matmuls and the model forward stay batched.

            ``active`` (B,) bool gates the sample-ring shift: a joined slot
            that skipped this tick (sparse push) keeps its row bit-identical
            — its other scalars are zero, which the masked mel write and
            emit_n=0 already make a no-op."""
            # Repo-wide ingest conventions (ops/featurizer.ingest_to_f32):
            # int16 = PCM16 (1/32768), uint8 = µ-law (decoded ON DEVICE —
            # the 1-byte/sample wire tier halves the per-tick H2D bytes),
            # float passes through.  Inactive rows' decoded junk is masked
            # by ``active`` below, so zero-filled uint8 rows are harmless.
            newc = ingest_to_f32(chunk)
            buf = jnp.where(active[:, None],
                            jnp.concatenate([buf[:, C:], newc], axis=1), buf)

            if extract_impl == "span":
                # One contiguous per-row span slice + static hop-spaced
                # windows.  tick_schedule guarantees offs[:, j] ==
                # offs[:, 0] + j*hop for the real (j < n_new) frames; the
                # masked tail (j >= n_new) reads zero-padding here instead
                # of the old clamped duplicate — fine either way, since the
                # mel write masks it (keep < n_new below).  Replaces B*F
                # vmapped dynamic slices (gather lowering) with B slices.
                SL = (F - 1) * hop + nfft
                buf_ext = jnp.concatenate(
                    [buf, jnp.zeros((B, SL - nfft), jnp.float32)], axis=1)

                def extract(bufrow_ext, off0):  # (L+SL-nfft,), () -> (F, nfft)
                    span = jax.lax.dynamic_slice(bufrow_ext, (off0,), (SL,))
                    return jnp.stack(
                        [span[j * hop: j * hop + nfft] for j in range(F)])

                frames = jax.vmap(extract)(buf_ext, offs[:, 0])  # (B, F, nfft)
            else:  # 'slices': per-frame dynamic slices (the measured A/B ref)
                def extract(bufrow, offrow):  # (L,), (F,) -> (F, nfft)
                    return jnp.stack([
                        jax.lax.dynamic_slice(bufrow, (offrow[j],), (nfft,))
                        for j in range(F)
                    ])

                frames = jax.vmap(extract)(buf, offs)    # (B, F, nfft)

            if use_pallas_feat:
                from sed_tpu.ops.pallas_featurizer import logmel_frames_pallas

                lm = logmel_frames_pallas(frames.reshape(B * F, nfft), cfg,
                                          precision=feat_prec)
            else:
                x = frames.reshape(B * F, nfft) * window
                re, im = stft_ops.rfft_matmul_realimag(x, nfft)
                lm = realimag_to_log_mel(re, im, cfg)
            if mean_j is not None:
                lm = (lm - mean_j) / std_j
            lm = lm.reshape(B, F, mel_bins)

            def write(melrow, lmrow, wp, nn):  # per-slot masked ring write
                cur = jax.lax.dynamic_slice(melrow, (wp, 0), (F, mel_bins))
                keep = jnp.arange(F)[:, None] < nn
                return jax.lax.dynamic_update_slice(
                    melrow, jnp.where(keep, lmrow, cur), (wp, 0))

            mel_ring = jax.vmap(write)(mel_ring, lm, write_pos, n_new)

            ext = jnp.concatenate(
                [mel_ring, jnp.zeros((B, M, mel_bins), jnp.float32)], axis=1)
            win = jax.vmap(
                lambda extrow, wo: jax.lax.dynamic_slice(
                    extrow, (wo, 0), (M, mel_bins)))(ext, win_off)
            if qparams is not None:
                from sed_tpu.models.quantize import quantized_serving_scores

                scores = quantized_serving_scores(qparams, win[:, :, :, None])
            else:
                scores = jax.nn.sigmoid(model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    win[:, :, :, None], train=False))
            sc_ext = jnp.concatenate(
                [scores, jnp.zeros((B, M, scores.shape[-1]), jnp.float32)],
                axis=1)
            out = jax.vmap(
                lambda srow, eo: jax.lax.dynamic_slice(
                    srow, (eo, 0), (EM, scores.shape[-1])))(sc_ext, e_off)

            mel_ring = jax.vmap(
                lambda extrow, sh: jax.lax.dynamic_slice(
                    extrow, (sh, 0), (M, mel_bins)))(ext, shift)
            return buf, mel_ring, out

        self._step_fn = step  # un-jitted, for device-side scan benches
        self._step = jax.jit(step, donate_argnums=(0, 1))

        def steps(buf, mel_ring, chunks, active, offs, n_new, write_pos,
                  win_off, e_off, shift):
            """K consecutive tick rounds in ONE dispatch (lax.scan over the
            single-round step; every operand gains a leading round axis).
            On dispatch-floor-bound hosts the per-round launch cost is the
            serving bottleneck once drains/startup are batched — this is the
            tick analog of the train loop's steps_per_call."""
            def body(carry, xs):
                b, m = carry
                b, m, o = step(b, m, *xs)
                return (b, m), o

            (buf, mel_ring), outs = jax.lax.scan(
                body, (buf, mel_ring),
                (chunks, active, offs, n_new, write_pos, win_off, e_off,
                 shift))
            return buf, mel_ring, outs

        self._steps = jax.jit(steps, donate_argnums=(0, 1))

        def steps_sparse(buf, mel_ring, flat, idx, active, offs, n_new,
                         write_pos, win_off, e_off, shift):
            """The scanned multi-round tick with a SPARSE wire: ``flat`` is
            (bucket, chunk) holding ONLY the real chunks; ``idx`` (K, B)
            maps each round/slot cell to its flat row.  Inactive cells
            point at row 0 — harmless, because ``active`` already masks
            their ring shift (the proven no-op row encoding), so their
            gathered content is never observed.  The dense wire shipped
            K*B*chunk bytes regardless of activity (a flooding/staggered
            serving mix measured 6-9x padding waste over the relay,
            SERVE_SOCKET_BENCH.json round-5 profile); this ships the real
            bytes rounded up to a bucket.  One XLA program per bucket size
            (host buckets to powers of 4: 16, 64, 256, ...)."""
            chunks = jnp.take(flat, idx, axis=0)  # (K, B, chunk)
            return steps(buf, mel_ring, chunks, active, offs, n_new,
                         write_pos, win_off, e_off, shift)

        self._steps_sparse = jax.jit(steps_sparse, donate_argnums=(0, 1))

        # Slot-row migration helpers with the slot index as a TRACED scalar:
        # ONE compiled program each, reused by every slot.  (Static indexing
        # like ``self._buf[b]`` / ``.at[b].set`` builds a distinct program
        # per slot id — 2*slots tiny programs whose first execution each
        # pays the relay session floor.)
        self._row_get = jax.jit(lambda buf, mel, b: (
            jax.lax.dynamic_slice_in_dim(buf, b, 1, 0)[0],
            jax.lax.dynamic_slice_in_dim(mel, b, 1, 0)[0]))
        self._row_set = jax.jit(
            lambda buf, mel, b, buf_row, mel_row: (
                jax.lax.dynamic_update_slice_in_dim(buf, buf_row[None], b, 0),
                jax.lax.dynamic_update_slice_in_dim(mel, mel_row[None], b, 0)),
            donate_argnums=(0, 1))

    def _put(self, x):
        if self._sharding is not None:
            return jax.device_put(x, self._sharding)
        return jnp.asarray(x)

    # -- lifecycle -----------------------------------------------------------

    def join(self) -> int:
        """Allocate a free slot for a new stream; returns the slot id.
        The stream's audio starts with its first :meth:`push` chunk."""
        for b in range(self.slots):
            if b not in self._pending and b not in self._admitted:
                self._pending[b] = BatchedStreamingDetector(
                    self._model, self._params, self._batch_stats, self.cfg,
                    batch=1, halo=self.halo, total_stride=self.stride,
                    bucket=self._m, mean=self.mean, std=self.std,
                    qparams=self._qparams, stream_fns=self._stream_fns)
                return b
        raise RuntimeError(f"all {self.slots} slots are occupied")

    def _admit(self, b: int) -> None:
        """Migrate a pending stream's host state into slot ``b``'s ring rows
        (the per-slot analog of DeviceStreamingDetector._migrate_to_device).

        Membership ordering matters for lock-free feed(): ``b`` enters
        ``_admitted`` BEFORE leaving ``_pending`` so a concurrent feed's
        joined-slot check never observes the slot in neither dict."""
        h = self._pending[b]
        t_total = h._buf_start + h._samples.shape[1]
        counters = {
            "t_total": t_total,
            "n_frames": h._n_frames,
            "emitted": h._emitted,
            "mel_start": h._mel_start,
        }

        buf_row = np.zeros(self._l, np.float32)
        lo = t_total - self._l
        src_lo = max(h._buf_start, lo)
        buf_row[src_lo - lo:] = h._samples[0, src_lo - h._buf_start:]

        mel_row = np.zeros((self._m, self.cfg.mel_bins), np.float32)
        n = h._n_frames - h._mel_start
        mel_row[:n] = h._frames_mel[0, :n]
        self._buf, self._mel = self._row_set(
            self._buf, self._mel, b, jnp.asarray(buf_row),
            jnp.asarray(mel_row))
        self._admitted[b] = counters
        self._pending.pop(b)

    def leave(self, b: int) -> np.ndarray:
        """End stream ``b``: exact tail via the host flush machinery (any
        audio still staged by :meth:`feed` is scored first); frees the slot.
        Returns the (frames, classes) tail block."""
        h, rem = self._checkout(b)
        if h is None:
            # Never received audio: nothing to flush.
            return np.zeros((0, self.cfg.classes_num), np.float32)
        return self._drain(h, rem)

    def _checkout(self, b: int):
        """Pop slot ``b`` and rebuild its host detector WITHOUT scoring
        anything; returns ``(detector | None, staged_remainder)`` (None when
        the stream never received audio).  Frees the slot either way."""
        with self._stage_lock:
            pieces = self._staged.pop(b, None)
            self._staged_n.pop(b, None)
        rem = self._flatten(pieces) if pieces else None
        if b in self._pending:
            h = self._pending.pop(b)
            if (h._buf_start + h._samples.shape[1] == 0
                    and (rem is None or rem.size == 0)):
                return None, None
            return h, rem
        if b not in self._admitted:
            raise ValueError(f"slot {b} is not joined")
        c = self._admitted.pop(b)
        lo = max(0, c["t_total"] - self._l)
        buf_row, mel_row = self._row_get(self._buf, self._mel, b)
        buf_row = np.asarray(buf_row)[None]
        mel_row = np.asarray(mel_row)[None]
        h = BatchedStreamingDetector.from_state(
            self._model, self._params, self._batch_stats, self.cfg,
            batch=1, halo=self.halo, total_stride=self.stride,
            bucket=self._m, mean=self.mean, std=self.std,
            samples=buf_row[:, lo - (c["t_total"] - self._l):],
            buf_start=lo, n_frames=c["n_frames"],
            frames_mel=mel_row[:, : c["n_frames"] - c["mel_start"]],
            mel_start=c["mel_start"], emitted=c["emitted"],
            qparams=self._qparams, stream_fns=self._stream_fns)
        return h, rem

    def leave_many(self, slots) -> Dict[int, np.ndarray]:
        """Drain several leaving streams with SHARED device dispatches: one
        featurize over every stream's remaining frames, and one stacked
        forward per distinct tail-window shape (batch-padded to the pool
        size, so each shape is ONE compiled program no matter how many
        streams share a batch).  Per-slot results equal :meth:`leave` to jit
        fusion rounding (tests/test_stream_pool.py pins schedule equality
        and scores).

        Returns ``{slot: (frames, classes) ndarray}``; a stream too short to
        featurize maps to an empty ``(0, classes)`` block (same client-
        visible outcome as leave()'s "too short" ValueError); any other
        per-slot host-side failure maps to the exception instance — callers
        (serve_socket) decide policy without one bad stream aborting the
        batch.  Device-dispatch faults propagate to the caller."""
        empty = np.zeros((0, self.cfg.classes_num), np.float32)
        tails: Dict[int, np.ndarray] = {}
        dets: Dict[int, BatchedStreamingDetector] = {}
        frames: Dict[int, np.ndarray] = {}
        for b in list(slots):
            try:
                h, rem = self._checkout(b)
                if h is None:
                    tails[b] = empty
                    continue
                if rem is not None and rem.size:
                    h.stage(self._f32(rem)[None])
                frames[b] = h._final_frames()
                dets[b] = h
            except ValueError as e:
                if "too short" in str(e):
                    tails[b] = empty
                else:
                    tails[b] = e  # invariant violation: surface per-slot
            except Exception as e:  # noqa: BLE001 — host-side prep fault
                tails[b] = e

        # ONE featurize dispatch across every stream's remaining frames
        # (rows bucketed to 64 so concurrent drains reuse a handful of
        # compiled shapes regardless of the mix of tail lengths).
        order = [b for b in dets if frames[b].shape[1]]
        if order:
            lms = self._featurize_shared([frames[b][0] for b in order])
            for b, lm in zip(order, lms):
                dets[b]._install_final(lm[None])

        # One stacked forward per distinct window shape, batch-padded to the
        # pool size (window lengths are bucket-gridded by _final_window, so
        # the shape set stays <= stride variants per bucket bin).
        groups: Dict[int, list] = {}
        for b, h in dets.items():
            fw = h._final_window()
            if fw is None:
                tails[b] = empty
                continue
            groups.setdefault(fw[0].shape[1], []).append((b, fw))
        for members in groups.values():
            stack = np.concatenate([fw[0] for _, fw in members], axis=0)
            k = len(members)
            if k < self.slots:
                stack = np.pad(stack, ((0, self.slots - k), (0, 0), (0, 0)))
            scores = np.asarray(
                self._stream_fns[1](jnp.asarray(stack)[:, :, :, None]))
            for i, (b, (window, s, upto, pad_l)) in enumerate(members):
                tails[b] = dets[b]._final_trim(
                    scores[i:i + 1], s, upto, pad_l)[0]
        return tails

    def _featurize_shared(self, rows) -> list:
        """Bucketed featurize dispatches over concatenated ``(k_i, nfft)``
        row blocks; returns the per-block log-mel results.  Featurize is
        row-independent (window+rFFT+mel per row), so cross-stream batching
        is exact.  Dispatches are CAPPED at 64 rows — every lifecycle event
        (join startup, batched drains, any coalesced mix) reuses the ONE
        warmed (64, nfft) program; on relay-attached hosts a second
        dispatch of a warm program is ~RPC-floor cheap while any NEW shape's
        first execution costs minutes (ROADMAP environment notes)."""
        flat = np.concatenate(rows, axis=0)
        n = len(flat)
        if n <= 8:
            # Small-block shape for cheap lifecycle events (join startups
            # stage ~3 frames): 1/8th the H2D of the 64-row block.  Two
            # warmed shapes total (8 and 64).
            blk = np.pad(flat, ((0, 8 - n), (0, 0))) if n != 8 else flat
            return list(np.split(
                np.asarray(self._stream_fns[0](jnp.asarray(blk)))[:n],
                np.cumsum([len(r) for r in rows])[:-1]))
        blocks = []
        for j in range(0, n, 64):
            blk = flat[j: j + 64]
            if len(blk) != 64:
                blk = np.pad(blk, ((0, 64 - len(blk)), (0, 0)))
            blocks.append(np.asarray(self._stream_fns[0](jnp.asarray(blk))))
        lm = np.concatenate(blocks, axis=0)[:n]
        outs, pos = [], 0
        for r in rows:
            outs.append(lm[pos:pos + len(r)])
            pos += len(r)
        return outs

    @staticmethod
    def _f32(a: np.ndarray) -> np.ndarray:
        """Host twin of ops/featurizer.ingest_to_f32: int16 PCM is
        de-quantized by 1/32768 (the ONE PCM16 rule, CLAUDE.md), uint8 is
        µ-law-decoded (ops/mulaw.py), float passes through as float32."""
        a = np.asarray(a)
        if a.dtype == np.int16:
            return a.astype(np.float32) / 32768.0
        if a.dtype == np.uint8:
            from sed_tpu.ops.mulaw import mulaw_decode_np

            return mulaw_decode_np(a)
        return a.astype(np.float32)

    def _drain(self, h: BatchedStreamingDetector, rem) -> np.ndarray:
        """Score a staged remainder and the ring tail in ONE flush (a single
        featurize + forward dispatch — drains are dispatch-count-bound on
        RPC-floored hosts; same scores as push-then-flush by the streaming
        exactness invariant, same frame count by emission_upto)."""
        if rem is not None and rem.size:
            h.stage(self._f32(rem)[None])
        return h.flush()[0]

    # -- variable-size input: host staging over the fixed-chunk tick ---------

    # feed() may be called concurrently with tick()/push() from other
    # threads (serve_socket reader threads stage while the ticker thread
    # drives the device); every other method needs external serialization.
    THREAD_SAFE_FEED = True

    def feed(self, b: int, samples: np.ndarray) -> None:
        """Stage ANY number of samples (int16 PCM, uint8 µ-law, or float32,
        1-D — the repo-wide ingest dtype conventions) for slot
        ``b``.  No device work happens here — :meth:`tick` scores every slot
        that has accumulated a full chunk, and :meth:`leave` drains a partial
        remainder exactly — so callers push audio as it arrives (sockets,
        files, uneven producers) without caring about chunk geometry.

        Thread-safe against a concurrent :meth:`tick`: staging has its own
        lock, so readers keep feeding while a tick's device dispatch runs.

        Drive a slot through either feed()/tick() or raw :meth:`push`, not
        both interleaved: push bypasses staging, so staged samples would be
        scored out of order."""
        if b not in self._pending and b not in self._admitted:
            raise ValueError(f"slot {b} is not joined")
        arr = np.asarray(samples)
        if arr.ndim != 1:
            raise ValueError(f"samples must be 1-D, got shape {arr.shape}")
        if arr.size == 0:
            return
        with self._stage_lock:
            self._staged.setdefault(b, []).append(arr.copy())
            self._staged_n[b] = self._staged_n.get(b, 0) + int(arr.size)

    def staged(self, b: int) -> int:
        """Samples staged for slot ``b`` not yet scored by a tick (samples a
        concurrently running tick has already claimed are not counted)."""
        with self._stage_lock:
            return self._staged_n.get(b, 0)

    def _flatten(self, pieces: List[np.ndarray]) -> np.ndarray:
        """Concatenate staged pieces; mixed wire dtypes promote through the
        ingest de-quantization rules (the ONE PCM16/µ-law convention)."""
        if len(pieces) == 1:
            return pieces[0]
        if len({p.dtype for p in pieces}) == 1:
            return np.concatenate(pieces)
        return np.concatenate([self._f32(p) for p in pieces])

    # Max rounds folded into one scanned dispatch: bounds the staged wire
    # batch at ROUNDS_PER_CALL * slots * chunk samples host-side.
    ROUNDS_PER_CALL = 16

    def _prof(self, **kv) -> None:
        if self.profile is not None:
            for k, v in kv.items():
                self.profile[k] = self.profile.get(k, 0) + v

    def tick(self) -> Dict[int, np.ndarray]:
        """Score one fixed-size chunk for EVERY slot with a full chunk
        staged, repeating until no slot has a full chunk left.  Rounds that
        involve a PENDING stream go through per-round :meth:`push` (startup
        and admission must interleave rounds); once every remaining round is
        admitted-only, up to ROUNDS_PER_CALL rounds ride ONE scanned device
        dispatch (:meth:`_push_rounds`).  Returns ``{slot: (frames,
        classes)}`` concatenated emissions for the slots that advanced.

        The tick claims a SNAPSHOT of the staged audio up front (under the
        stage lock) and works from it, so reader threads keep feeding while
        the device dispatches run; audio fed mid-tick waits for the next
        tick.  Unconsumed samples — the sub-chunk remainder, or everything
        not yet dispatched when a device fault aborts the tick — go back to
        the FRONT of the staging queue, preserving both sample order and
        push()'s consume-only-after-success rule."""
        import time as _time

        with self._stage_lock:
            take: Dict[int, np.ndarray] = {}
            for b in list(self._staged):
                if self._staged_n.get(b, 0) >= self.chunk:
                    take[b] = self._flatten(self._staged.pop(b))
                    self._staged_n[b] = 0
        if not take:
            return {}
        pos = {b: 0 for b in take}
        out: Dict[int, list] = {}
        try:
            t0 = _time.perf_counter()
            while True:
                chunks = {b: a[pos[b]: pos[b] + self.chunk]
                          for b, a in take.items()
                          if a.size - pos[b] >= self.chunk}
                if not chunks or not any(b in self._pending for b in chunks):
                    break
                o = self.push(chunks)
                self._prof(pending_rounds=1)
                for b in chunks:
                    pos[b] += self.chunk
                    out.setdefault(b, []).append(o[b])
            self._prof(pending_s=_time.perf_counter() - t0)
            # Admitted-only rounds, scanned per block; per-slot consumption
            # commits only after each block's dispatch returns.
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

    def _push_rounds(self, rounds) -> Dict[int, np.ndarray]:
        """Score K consecutive full-chunk rounds of ADMITTED slots in one
        scanned dispatch.  K > 1 is padded to the full ROUNDS_PER_CALL block
        with inactive rounds (all-zero scalars are the proven no-op row
        encoding, so a padded round is a no-op for every slot): exactly TWO
        compiled tick programs ever exist (single-round and full-block) —
        on relay-attached hosts every extra shape is a first-execution tax,
        and a no-op round costs ~ms of device compute.  Schedule counters advance on a tentative
        copy and commit only after the device call returns, so a dispatch
        fault leaves the pool consistent.  Scores equal sequential push()
        rounds exactly (same per-round schedule scalars through the same
        step; pinned by tests/test_stream_pool.py)."""
        import time as _time

        assert all(b in self._admitted for r in rounds for b in r)
        t0 = _time.perf_counter()
        B, F, K = self.slots, self._frames_max, len(rounds)
        Kp = 1 if K == 1 else self.ROUNDS_PER_CALL
        counters = {b: dict(c) for b, c in self._admitted.items()}
        active = np.zeros((Kp, B), bool)
        offs = np.zeros((Kp, B, F), np.int32)
        n_new = np.zeros((Kp, B), np.int32)
        write_pos = np.zeros((Kp, B), np.int32)
        win_off = np.zeros((Kp, B), np.int32)
        e_off = np.zeros((Kp, B), np.int32)
        shift = np.zeros((Kp, B), np.int32)
        emit_n = [dict() for _ in range(Kp)]

        dts = {r[b].dtype for r in rounds for b in r}
        uniform = dts.pop() if len(dts) == 1 else None
        dt = (uniform if uniform in (np.dtype(np.int16), np.dtype(np.uint8))
              else np.float32)
        cells = [(k, b) for k, r in enumerate(rounds) for b in r]
        for k, r in enumerate(rounds):
            for b in r:
                active[k, b] = True
                (offs[k, b], n_new[k, b], write_pos[k, b], win_off[k, b],
                 e_off[k, b], shift[k, b], emit_n[k][b],
                 counters[b]) = self._slot_scalars(counters[b])

        sparse = self._sharding_rounds is None and Kp > 1
        if sparse:
            # Sparse wire: ship only the real chunks, bucketed to powers of
            # 4 so the program count stays tiny (16/64/256/...; inactive
            # cells gather row 0, masked by ``active``).
            bucket = 16
            while bucket < len(cells):
                bucket *= 4
            wire = np.zeros((bucket, self.chunk), dt)
            idx = np.zeros((Kp, B), np.int32)
            for j, (k, b) in enumerate(cells):
                ck = rounds[k][b]
                wire[j] = ck if ck.dtype == dt else self._f32(ck)
                idx[k, b] = j
        else:
            wire = np.zeros((Kp, B, self.chunk), dt)
            for k, r in enumerate(rounds):
                for b, ck in r.items():
                    wire[k, b] = ck if ck.dtype == dt else self._f32(ck)

        t1 = _time.perf_counter()
        put_rounds = (jnp.asarray(wire) if self._sharding_rounds is None
                      else jax.device_put(wire, self._sharding_rounds))
        if self.profile is not None:  # split H2D from exec (forces a sync)
            jax.block_until_ready(put_rounds)
        t2 = _time.perf_counter()
        scalars = (jnp.asarray(active), jnp.asarray(offs),
                   jnp.asarray(n_new), jnp.asarray(write_pos),
                   jnp.asarray(win_off), jnp.asarray(e_off),
                   jnp.asarray(shift))
        if sparse:
            self._buf, self._mel, dev_out = self._steps_sparse(
                self._buf, self._mel, put_rounds, jnp.asarray(idx), *scalars)
        else:
            self._buf, self._mel, dev_out = self._steps(
                self._buf, self._mel, put_rounds, *scalars)
        dev_out = np.asarray(dev_out)  # (Kp, B, EM, classes)
        self._prof(blocks=1, rounds_real=K, rounds_padded=Kp - K,
                   chunks_real=len(cells), chunks_shipped=wire.nbytes // (
                       self.chunk * wire.dtype.itemsize),
                   h2d_bytes=wire.nbytes,
                   build_s=t1 - t0, h2d_s=t2 - t1,
                   exec_s=_time.perf_counter() - t2)
        out: Dict[int, list] = {}
        for k, r in enumerate(rounds):
            for b in r:
                out.setdefault(b, []).append(dev_out[k, b, : emit_n[k][b]])
        self._admitted.update(counters)
        return {b: (np.concatenate(v, axis=0) if len(v) > 1 else v[0])
                for b, v in out.items()}

    # -- tick ----------------------------------------------------------------

    def _slot_scalars(self, c: dict):
        """This tick's ring-relative schedule for one admitted slot — the
        ONE shared definition (streaming.tick_schedule) that the lockstep
        DeviceStreamingDetector also uses."""
        return tick_schedule(c, self.chunk, self._frames_max, self._emit_max,
                             self._m, self._l, self.cfg, self.stride,
                             self.halo)

    def push(self, chunks: Dict[int, np.ndarray]) -> Dict[int, np.ndarray]:
        """Feed one ``(chunk_samples,)`` chunk — int16 PCM, uint8 µ-law, or
        float32 (ingest conventions, ops/featurizer.ingest_to_f32) — for ANY
        subset of the joined streams; returns ``{slot: (frames, classes)}``
        newly finalized scores for the slots that pushed.

        Ticks are sparse: a joined slot absent from ``chunks`` idles this
        tick — its rings, schedule counters, and scores are untouched, so
        every stream advances at its own pace (variable-rate serving).  The
        set of slots may also change between ticks via
        :meth:`join`/:meth:`leave`."""
        joined = set(self._pending) | set(self._admitted)
        extra = set(chunks) - joined
        if extra:
            raise ValueError(
                f"push for non-joined slots {sorted(extra)} "
                f"(joined: {sorted(joined)})")
        # Validate EVERY chunk before any state mutation: raising after some
        # pending stream already consumed its chunk would silently desync
        # that stream when the caller retries the push.
        arrs: Dict[int, np.ndarray] = {}
        for b in chunks:
            ck = np.asarray(chunks[b])
            if ck.shape != (self.chunk,):
                raise ValueError(
                    f"slot {b}: chunk must be ({self.chunk},), got {ck.shape}")
            arrs[b] = ck
        out: Dict[int, np.ndarray] = {}

        # 1. pending streams: host-side startup, with every pending slot's
        # new frames batched into ONE featurize dispatch (the join-startup
        # analog of leave_many — per-slot pushes made churn-heavy serving
        # pay one dispatch per joining stream per tick).  Admission happens
        # AFTER the device tick (step 3): the tick shifts every sample-ring
        # row, so writing a freshly admitted stream's rows before it would
        # corrupt them (and its chunk was already consumed host-side this
        # tick).
        to_admit = []
        pend = [b for b in self._pending if b in arrs]
        news = {}
        for b in pend:
            h = self._pending[b]
            h.stage(self._f32(arrs[b])[None])
            news[b] = h._new_frames()
        framed = [b for b in pend if news[b].shape[1]]
        if framed:
            lms = self._featurize_shared([news[b][0] for b in framed])
            for b, lm in zip(framed, lms):
                self._pending[b]._install_new(lm[None])
        for b in pend:
            h = self._pending[b]
            if b not in framed:
                h._install_new(news[b][:, :0, :])  # trim raw samples only
            out[b] = h._emit()[0]
            if h._buf_start + h._samples.shape[1] >= self._switch_after:
                to_admit.append(b)

        # 2. admitted streams that pushed this tick: ONE vmapped device tick.
        ticking = [b for b in self._admitted if b in arrs]
        if ticking:
            B, F = self.slots, self._frames_max
            active = np.zeros(B, bool)
            offs = np.zeros((B, F), np.int32)
            n_new = np.zeros(B, np.int32)
            write_pos = np.zeros(B, np.int32)
            win_off = np.zeros(B, np.int32)
            e_off = np.zeros(B, np.int32)
            shift = np.zeros(B, np.int32)
            emit_n = {}
            new_counters = {}
            for b in ticking:
                active[b] = True
                (offs[b], n_new[b], write_pos[b], win_off[b], e_off[b],
                 shift[b], emit_n[b], new_counters[b]) = self._slot_scalars(
                     self._admitted[b])
            # Rows without a ticking stream (free slots AND idle joined
            # slots) keep all-zero scalars, which are in-range (n_new=0
            # masks the mel write, shift=0 is the identity ring shift, and
            # active=False skips the sample-ring shift); slices and writes
            # touch only their own row, so junk cannot leak across slots.

            # The narrowest uniform wire dtype rides the link: int16 PCM
            # (B*chunk*2 bytes, de-quantized on device) when every ticking
            # chunk is int16; uint8 µ-law (B*chunk*1 bytes, expanded on
            # device — ops/mulaw.py) when every chunk is uint8; any mix
            # falls back to a host-decoded float32 batch.  Idle rows stay
            # zero-filled — their decode is masked by ``active`` in step.
            dts = {arrs[b].dtype for b in ticking}
            uniform = dts.pop() if len(dts) == 1 else None
            dt = (uniform if uniform in (np.dtype(np.int16),
                                         np.dtype(np.uint8))
                  else np.float32)
            chunk_batch = np.zeros((B, self.chunk), dt)
            for b in ticking:
                ck = arrs[b]
                chunk_batch[b] = ck if ck.dtype == dt else self._f32(ck)

            self._buf, self._mel, dev_out = self._step(
                self._buf, self._mel, self._put(chunk_batch),
                jnp.asarray(active), jnp.asarray(offs), jnp.asarray(n_new),
                jnp.asarray(write_pos), jnp.asarray(win_off),
                jnp.asarray(e_off), jnp.asarray(shift))
            dev_out = np.asarray(dev_out)
            for b in ticking:
                out[b] = dev_out[b, : emit_n[b]]
            self._admitted.update(new_counters)

        # 3. migrate streams whose startup completed this tick; they ride the
        # vmapped device step from the next tick on.
        for b in to_admit:
            self._admit(b)
        return out
