"""Device-resident batched streaming detection.

The host-driven streaming classes (sed_tpu.streaming) frame on the host and
upload float32 frame windows every push — measured transfer-bound at scale
(benchmarks/STREAMING_BENCH.json).  This module keeps ALL streaming state on
the device: a rolling sample ring (B, L) and a rolling log-mel ring (B, M, mel)
live in HBM, and each tick runs ONE jitted step that

  1. shifts the sample ring and appends the new chunk (int16 PCM accepted —
     de-quantized on device, so the per-tick upload is just B*chunk*2 bytes),
  2. extracts the newly-ready STFT frames with dynamic slices,
  3. featurizes them (windowed matmul rFFT -> mel -> dB, same math as the
     offline path) and writes them into the mel ring,
  4. scores the emission window and returns the newly finalized block.

The host keeps only the *schedule* — pure integer arithmetic (frame counts,
emission boundaries), identical to BatchedStreamingDetector's — and passes the
tick's offsets as traced scalars, so ONE compiled program serves every tick.
The irregular stream start (reflect padding) and the exact tail (flush) reuse
the proven host-side machinery: the first ticks run through an internal
BatchedStreamingDetector, whose state then migrates into the device rings;
flush() migrates back.  Emitted scores are tick-for-tick equal to the host
classes (and therefore to offline inference) up to jit fusion rounding.

Serving shape: B lockstep streams, FIXED chunk size per push.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sed_tpu.configs import SpectrogramConfig, DEFAULT_SPECTROGRAM
from sed_tpu.ops import stft as stft_ops
from sed_tpu.ops.featurizer import realimag_to_log_mel
from sed_tpu.streaming import BatchedStreamingDetector, tick_schedule


def resolve_tick_featurizer(featurizer: str, cfg, mesh=None) -> str:
    """'auto' -> the fused Pallas featurizer on TPU at the production nfft
    (Mosaic lowers it only for nfft >= 32768 — ROADMAP.md), XLA elsewhere.

    Under a ``mesh`` the tick step is GSPMD-partitioned; a pallas_call has
    no sharding rule, so that combination is untested/unsupported — 'auto'
    falls back to XLA and an explicit 'pallas' raises."""
    if featurizer == "auto":
        return ("pallas" if mesh is None and jax.default_backend() == "tpu"
                and cfg.nfft >= 32768 else "xla")
    if featurizer not in ("xla", "pallas"):
        raise ValueError(f"featurizer must be auto|xla|pallas, got {featurizer}")
    if featurizer == "pallas" and mesh is not None:
        raise ValueError(
            "featurizer='pallas' is not supported with a mesh: the Pallas "
            "kernels cannot be GSPMD-partitioned inside the sharded tick "
            "step (use 'auto'/'xla' for sharded serving)")
    return featurizer


class DeviceStreamingDetector:
    def __init__(
        self,
        model,
        params,
        batch_stats,
        cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
        batch: int = 1,
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
        """``mesh``: an optional ``jax.sharding.Mesh`` with a 'data' axis —
        the stream batch (rings and chunks) is sharded across its devices and
        jit propagates the sharding through the tick step, so serving density
        scales over a pod the same way batch inference does.

        ``featurizer``: 'xla' = matmul rFFT in XLA ops; 'pallas' = the fused
        window+rFFT+power+mel kernels (ops/pallas_featurizer.py, <=1e-5 dB
        vs the XLA path on TPU); 'auto' = pallas on TPU at the production
        nfft, xla elsewhere.  Hardware A/B in STREAMING_TICK.json.

        ``featurizer_precision``: None/'parity' = golden-tested FFT
        (default); 'fast'/'turbo' = reduced-precision serving tiers on the
        Pallas tick path (benchmarks/FAST_FEATURIZER.json); the XLA tick
        path ignores it.

        ``extract_impl``: 'slices' (default) = per-frame dynamic slices;
        'span' = one contiguous ring slice + static hop-spaced frame
        windows — built as a candidate speedup, pending the hardware
        same-process A/B (STREAMING_TICK.json) before it can become the
        default (CLAUDE.md: interpret/CPU passing does not clear Mosaic
        compositions).

        ``qparams``: int8 serving artifact (models/quantize.py /
        models/qat.py) — the tick (and the startup/flush host machinery)
        scores with the int8 MXU forward instead of the float model."""
        if extract_impl not in ("span", "slices"):
            raise ValueError(
                f"extract_impl must be span|slices, got {extract_impl}")
        self.cfg = cfg
        self.batch = batch
        self.chunk = int(chunk_samples)
        self.halo = halo
        self.stride = total_stride
        self._pad = cfg.nfft // 2
        self._model, self._params, self._batch_stats = model, params, batch_stats
        self._closed = False

        hop = cfg.hop_size
        self._frames_max = -(-self.chunk // hop) + 1
        self._emit_max = total_stride * (
            -(-(self._frames_max + total_stride) // total_stride))
        need = 2 * halo + 2 * total_stride + self._frames_max
        self._m = bucket * (-(-need // bucket))          # mel ring length
        self._l = self.chunk + cfg.nfft + hop            # sample ring length
        self.mean = None if mean is None else np.asarray(mean, np.float32)
        self.std = None if std is None else np.asarray(std, np.float32)

        # Startup runs through the host-side class until every
        # reflection-dependent frame is featurized and the ring covers the
        # live window.
        self._qparams = qparams
        self._host = BatchedStreamingDetector(
            model, params, batch_stats, cfg, batch=batch, halo=halo,
            total_stride=total_stride, bucket=bucket, mean=mean, std=std,
            qparams=qparams)
        # Keep the startup detector's jitted (featurize, forward) pair so the
        # flush-time migration back to host (from_state below) reuses its
        # trace cache instead of re-compiling (streaming.make_stream_fns).
        self._stream_fns = (self._host._featurize, self._host._forward)
        self._switch_after = cfg.nfft + hop  # total samples, then migrate
        self._device_mode = False

        # host-side schedule counters (valid in device mode)
        self._t_total = 0
        self._n_frames = 0
        self._emitted = 0
        self._mel_start = 0

        self._buf = None   # (B, L) f32 device
        self._mel = None   # (B, M, mel) f32 device
        if mesh is not None:
            from sed_tpu.parallel.mesh import batch_sharding

            assert batch % mesh.size == 0, \
                f"batch {batch} must divide over the {mesh.size}-device mesh"
            self._sharding = batch_sharding(mesh)
        else:
            self._sharding = None

        window = jnp.asarray(stft_ops.padded_window(cfg.frame_size, cfg.nfft))
        mean_j = None if mean is None else jnp.asarray(mean, jnp.float32)
        std_j = None if std is None else jnp.asarray(std, jnp.float32)
        B, L, M, C = batch, self._l, self._m, self.chunk
        F, EM = self._frames_max, self._emit_max
        nfft, mel_bins = cfg.nfft, cfg.mel_bins
        self._featurizer = resolve_tick_featurizer(featurizer, cfg, mesh)
        use_pallas_feat = self._featurizer == "pallas"
        from sed_tpu.ops.featurizer import resolve_featurizer_precision

        feat_prec = resolve_featurizer_precision(featurizer_precision)

        def step(buf, mel_ring, chunk, offs, n_new, write_pos, win_off,
                 e_off, shift):
            # 1. sample ring shift + append (int16 PCM de-quantized here).
            if chunk.dtype == jnp.int16:
                newc = chunk.astype(jnp.float32) / 32768.0
            else:
                newc = chunk.astype(jnp.float32)
            buf = jnp.concatenate([buf[:, C:], newc], axis=1)

            # 2. extract the up-to-F newly ready frames.
            if extract_impl == "span":
                # One contiguous slice + static hop-spaced windows:
                # tick_schedule guarantees offs[j] == offs[0] + j*hop for the
                # real (j < n_new) frames; the masked tail reads the zero
                # padding (the mel write masks it via n_new below).
                SL = (F - 1) * hop + nfft
                buf_ext = jnp.concatenate(
                    [buf, jnp.zeros((B, SL - nfft), jnp.float32)], axis=1)
                span = jax.lax.dynamic_slice(buf_ext, (0, offs[0]), (B, SL))
                frames = jnp.stack(
                    [span[:, j * hop: j * hop + nfft] for j in range(F)],
                    axis=1)                     # (B, F, nfft)
            else:  # 'slices': per-frame dynamic slices (measured A/B ref)
                frames = jnp.stack([
                    jax.lax.dynamic_slice(buf, (0, offs[j]), (B, nfft))
                    for j in range(F)
                ], axis=1)                      # (B, F, nfft)

            # 3. featurize (same math as the offline featurizer).
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

            cur = jax.lax.dynamic_slice(mel_ring, (0, write_pos, 0),
                                        (B, F, mel_bins))
            keep = jnp.arange(F)[None, :, None] < n_new
            mel_ring = jax.lax.dynamic_update_slice(
                mel_ring, jnp.where(keep, lm, cur), (0, write_pos, 0))

            # 4. score the emission window (zeros beyond the ring are outside
            # the trusted region, same exactness argument as the host class).
            ext = jnp.concatenate(
                [mel_ring, jnp.zeros((B, M, mel_bins), jnp.float32)], axis=1)
            win = jax.lax.dynamic_slice(ext, (0, win_off, 0), (B, M, mel_bins))
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
            out = jax.lax.dynamic_slice(sc_ext, (0, e_off, 0),
                                        (B, EM, scores.shape[-1]))

            # 5. trim the mel ring for the next tick.
            mel_ring = jax.lax.dynamic_slice(ext, (0, shift, 0),
                                             (B, M, mel_bins))
            return buf, mel_ring, out

        # The rings are consumed and fully rewritten every tick — donate them
        # so XLA updates in place instead of allocating fresh buffers.
        self._step_fn = step  # un-jitted, for device-side scanning (benches)
        self._step = jax.jit(step, donate_argnums=(0, 1))

    def _put(self, x):
        if self._sharding is not None:
            return jax.device_put(x, self._sharding)
        return jnp.asarray(x)

    # -- state migration -----------------------------------------------------

    def _migrate_to_device(self):
        h = self._host
        self._t_total = h._buf_start + h._samples.shape[1]
        self._n_frames = h._n_frames
        self._emitted = h._emitted
        self._mel_start = h._mel_start

        buf = np.zeros((self.batch, self._l), np.float32)
        # place host samples [buf_start, T) at ring-relative positions
        lo = self._t_total - self._l
        src_lo = max(h._buf_start, lo)
        buf[:, src_lo - lo:] = h._samples[:, src_lo - h._buf_start:]
        self._buf = self._put(buf)

        mel = np.zeros((self.batch, self._m, self.cfg.mel_bins), np.float32)
        n = h._n_frames - h._mel_start
        mel[:, :n] = h._frames_mel[:, :n]
        self._mel = self._put(mel)
        self._device_mode = True
        self._host = None

    def _migrate_to_host(self) -> BatchedStreamingDetector:
        lo = max(0, self._t_total - self._l)
        buf = np.asarray(self._buf)
        mel = np.asarray(self._mel)
        return BatchedStreamingDetector.from_state(
            self._model, self._params, self._batch_stats, self.cfg,
            batch=self.batch, halo=self.halo, total_stride=self.stride,
            bucket=self._m, mean=self.mean, std=self.std,
            samples=buf[:, lo - (self._t_total - self._l):],
            buf_start=lo, n_frames=self._n_frames,
            frames_mel=mel[:, : self._n_frames - self._mel_start],
            mel_start=self._mel_start, emitted=self._emitted,
            qparams=self._qparams, stream_fns=self._stream_fns)

    # -- public API ----------------------------------------------------------

    def push(self, chunk: np.ndarray) -> np.ndarray:
        """Feed (batch, chunk_samples) int16 PCM or float32 audio; returns the
        newly finalized (batch, frames, classes) block."""
        if self._closed:
            raise RuntimeError("stream already flushed; create a new detector")
        chunk = np.asarray(chunk)
        # Explicit raise (not assert): these validations guard jax dynamic
        # slices that CLAMP silently, so they must survive ``python -O``.
        if chunk.shape != (self.batch, self.chunk):
            raise ValueError(
                f"lockstep push must be {(self.batch, self.chunk)}, "
                f"got {chunk.shape}")
        if not self._device_mode:
            f32 = (chunk.astype(np.float32) / 32768.0
                   if chunk.dtype == np.int16 else chunk.astype(np.float32))
            out = self._host.push(f32)
            if (self._host._buf_start + self._host._samples.shape[1]
                    >= self._switch_after):
                self._migrate_to_device()
            return out

        # The shared schedule definition (streaming.tick_schedule) — also
        # used per-slot by StreamPool; CLAUDE.md's tick-for-tick equality is
        # structural, not by convention.
        counters = {"t_total": self._t_total, "n_frames": self._n_frames,
                    "emitted": self._emitted, "mel_start": self._mel_start}
        (offs, n_new, write_pos, win_off, e_off, shift, emit_n,
         new_c) = tick_schedule(counters, self.chunk, self._frames_max,
                                self._emit_max, self._m, self._l, self.cfg,
                                self.stride, self.halo)

        self._buf, self._mel, out = self._step(
            self._buf, self._mel, self._put(chunk),
            jnp.asarray(offs), jnp.int32(n_new), jnp.int32(write_pos),
            jnp.int32(win_off), jnp.int32(e_off), jnp.int32(shift))

        self._t_total = new_c["t_total"]
        self._n_frames = new_c["n_frames"]
        self._emitted = new_c["emitted"]
        self._mel_start = new_c["mel_start"]
        return np.asarray(out)[:, :emit_n]

    def flush(self) -> np.ndarray:
        """End of stream: exact tail via the host-side flush machinery.
        Terminal — further push()/flush() calls raise."""
        if self._closed:
            raise RuntimeError("stream already flushed")
        self._closed = True
        if not self._device_mode:
            return self._host.flush()
        h = self._migrate_to_host()
        return h.flush()
