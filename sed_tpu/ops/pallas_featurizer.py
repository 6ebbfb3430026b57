"""Pallas TPU kernel: fused power-spectrum -> mel matmul -> log10 stage.

The featurizer's back half multiplies a (frames, 16385) power spectrum by the
(16385, 64) mel filterbank and takes 10*log10(max(1e-10, .)) (reference math:
dataset/spectogram/preprocess.py:39-45).  XLA runs this as matmul + separate
elementwise ops; this kernel fuses the K-tiled MXU matmul with the dB epilogue
in one VMEM-resident pass so mel power never round-trips through HBM:

  grid (row_tiles, k_tiles):
    k == 0:        zero the (TILE_R, 128) accumulator tile
    every k:       accumulate power_tile @ fb_tile on the MXU (f32)
    k == last:     apply 10*log10(max(amin, acc)) on the VPU, in place

The filterbank is padded to 128 output lanes (mel_bins=64 < the 128-lane
hardware tile) and K to a TILE_K multiple; zero padding contributes nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sed_tpu.configs import SpectrogramConfig, DEFAULT_SPECTROGRAM
from sed_tpu.ops import mel as mel_ops

TILE_R = 128
TILE_K = 2048
LANES = 128
AMIN = 1e-10


@functools.lru_cache(maxsize=8)
def _make_mel_kernel(mel_precision: str):
    """K-streamed mel+log kernel body at the given matmul precision.

    The default 'bf16x4' split-operand matmul (see _make_dot) is
    well inside the 1e-4 dB budget — at a fraction of HIGHEST's cost.
    bf16 shares f32's exponent range, so the power spectrum's huge dynamic
    range survives the hi/lo split exactly.  Lower tiers ('bf16x1') are for
    the reduced-precision serving ladder only (mel is all-positive
    accumulation: single-pass bf16 is ~0.4% relative ≈ 0.02 dB — orders
    below the turbo FFT tier's own error; never the parity default).
    """
    mel_dot = _make_dot(mel_precision)

    def _kernel(power_ref, fb_ref, out_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _zero():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += mel_dot(power_ref[:], fb_ref[:], (((1,), (0,)), ((), ())))

        @pl.when(k == pl.num_programs(1) - 1)
        def _epilogue():
            # Precise software log10 — the VPU's hardware log approximation
            # is ~3e-5 relative, above the 1e-4 dB parity budget (see
            # mel_ops).
            out_ref[:] = 10.0 * mel_ops.log10_precise(
                jnp.maximum(out_ref[:], AMIN))

    return _kernel


@functools.lru_cache(maxsize=8)
def _make_mel_kernel_resident_fb(mel_precision: str):
    """Mel+log kernel with the WHOLE filterbank resident in VMEM.

    The K-streamed variant above re-fetches each (TILE_K, 128) fb block for
    every row tile: at nfft=32768 that is 16 MB of fb x 23 row tiles ≈ 368 MB
    of redundant HBM reads per 16x60 s batch — as much as the power spectrum
    itself.  Here fb's index map is constant, so the pipeline loads it once
    and only power tiles stream; K is walked with static slices inside the
    kernel.  (Requires vmem_limit_bytes > fb size; used when fb fits.)
    """
    mel_dot = _make_dot(mel_precision)

    def _kernel_resident_fb(power_ref, fb_ref, out_ref):
        k = pl.program_id(1)
        k_tiles = pl.num_programs(1)

        @pl.when(k == 0)
        def _zero():
            out_ref[:] = jnp.zeros_like(out_ref)

        fb_tile = fb_ref[pl.ds(pl.multiple_of(k * TILE_K, 8), TILE_K), :]
        out_ref[:] += mel_dot(power_ref[:], fb_tile, (((1,), (0,)), ((), ())))

        @pl.when(k == k_tiles - 1)
        def _epilogue():
            out_ref[:] = 10.0 * mel_ops.log10_precise(
                jnp.maximum(out_ref[:], AMIN))

    return _kernel_resident_fb


@functools.lru_cache(maxsize=4)
def _padded_filterbank(cfg: SpectrogramConfig, k_padded: int) -> np.ndarray:
    fb = mel_ops.mel_filterbank(cfg, dtype=np.float32)  # (freq_bins, mel)
    out = np.zeros((k_padded, LANES), dtype=np.float32)
    out[: fb.shape[0], : fb.shape[1]] = fb
    return out


# ---------------------------------------------------------------------------
# Fully fused featurizer: window -> rFFT -> |X|^2 in one VMEM-resident kernel,
# then the K-tiled mel+log kernel over a hermitian-folded filterbank.
#
# The FFT runs as two big MXU matmuls per 8-frame tile (Cooley-Tukey
# n_fft = n1*n2 with the frame batch folded into the matmul N dimension), so
# no intermediate ever leaves VMEM between the window multiply and the power
# spectrum.  Real-input hermitian symmetry |X[k]| == |X[n-k]| is exploited on
# the *filterbank* side instead of unpacking bins: the kernel emits all n_fft
# power bins in (k2, k1) tile layout and the mel projection uses a folded,
# layout-matched filterbank (fb_fold[k] = fb[k]/2 shared between k and n-k,
# endpoints unhalved), which is mathematically identical to projecting the
# n_fft//2+1 one-sided spectrum.
# ---------------------------------------------------------------------------

FFT_TILE_R = 8


@functools.lru_cache(maxsize=4)
def _fft_power_constants(n_fft: int, win_length: int):
    from sed_tpu.ops import stft as stft_ops

    n1, n2, (w2r, w2i), (w1r, w1i), (twr, twi) = stft_ops._matmul_fft_constants(n_fft)
    window = stft_ops.padded_window(win_length, n_fft)
    return n1, n2, w2r, w2i, w1r, w1i, twr, twi, window


@functools.lru_cache(maxsize=4)
def _folded_filterbank(cfg: SpectrogramConfig, k_padded: int) -> np.ndarray:
    """(n_fft, mel) filterbank folded over hermitian pairs, reordered to the
    FFT kernel's (k2, k1) flat output layout: flat = k2*n1 + k1 where the
    spectral bin is n2*k1 + k2."""
    from sed_tpu.ops import stft as stft_ops

    n_fft = cfg.nfft
    n1, n2, *_ = stft_ops._matmul_fft_constants(n_fft)
    fb = mel_ops.mel_filterbank(cfg, dtype=np.float64)  # (n_fft//2+1, mel)
    full = np.zeros((n_fft, cfg.mel_bins), dtype=np.float64)
    half = n_fft // 2
    full[: half + 1] = fb
    full[1:half] *= 0.5
    full[half + 1:] = full[1:half][::-1]  # fb[n-k] = fb[k]/2 for k in 1..half-1

    # Reorder rows: kernel's flat index k2*n1 + k1 holds spectral bin n2*k1 + k2.
    k2 = np.arange(n2)[:, None]
    k1 = np.arange(n1)[None, :]
    spectral_bin = (n2 * k1 + k2).reshape(-1)
    reordered = full[spectral_bin]

    out = np.zeros((k_padded, LANES), dtype=np.float32)
    out[:n_fft, : cfg.mel_bins] = reordered.astype(np.float32)
    return out


@functools.lru_cache(maxsize=4)
def _onesided_tile_filterbank(cfg: SpectrogramConfig, k_padded: int) -> np.ndarray:
    """One-sided mel filterbank permuted to the HALF-size FFT's tile layout
    (packed even/odd path): row j = k2*n1 + k1 holds fb[bin n2*k1 + k2] for
    bins 0..m-1 (m = n_fft//2), and row m holds the Nyquist row fb[m] — the
    unpack stage appends |X[m]|^2 as power column m."""
    from sed_tpu.ops import stft as stft_ops

    m = cfg.nfft // 2
    n1, n2, *_ = stft_ops._matmul_fft_constants(m)
    fb = mel_ops.mel_filterbank(cfg, dtype=np.float64)  # (m+1, mel)
    k2 = np.arange(n2)[:, None]
    k1 = np.arange(n1)[None, :]
    bins = (n2 * k1 + k2).reshape(-1)  # flat j = k2*n1 + k1 -> spectral bin
    out = np.zeros((k_padded, LANES), dtype=np.float32)
    out[:m, : cfg.mel_bins] = fb[bins].astype(np.float32)
    out[m, : cfg.mel_bins] = fb[m].astype(np.float32)
    return out


def _split_bf16(a):
    """f32 -> (hi, lo) with hi = bf16-rounded leading bits, lo = residual."""
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, a - hi


def _make_dot(precision):
    """Matmul at the requested accuracy tier.

    'bf16x3' / 'bf16x4': split-operand emulation — a@b expanded over bf16
    hi/lo halves as single-pass (DEFAULT) MXU matmuls with f32 accumulation;
    x4 adds the al@bl term.  A 2-way split covers only ~16 mantissa bits, so
    accuracy is workload-dependent: sufficient for the ALL-POSITIVE mel
    accumulation (hardware-measured 2.2e-5 dB with the FFT at HIGHEST) but
    NOT for the FFT's cancellation-heavy sums on tonal spectra (1.9e-4 dB
    on the parity-sweep tonal family; up to ~0.5 dB in near-floor bins of
    dense sum-of-sines content, FAST_FEATURIZER.json) — the FFT kernel
    therefore defaults to HIGHEST and offers the split tiers only as
    explicit serving modes ('fast' = bf16x3, which measured strictly
    faster than bf16x4 at the same fidelity class; 'turbo' = bf16x1).
    """
    if precision == "bf16x1":
        # Single-pass bf16 matmul — NOT accurate enough for any production
        # tier; exists so profiling can put a floor under the matmul cost.
        d = jax.lax.Precision.DEFAULT

        def dot1(a, b, dn):
            return jax.lax.dot_general(a, b, dn, precision=d,
                                       preferred_element_type=jnp.float32)

        return dot1

    if precision in ("bf16x3", "bf16x4"):
        d = jax.lax.Precision.DEFAULT
        passes = 4 if precision == "bf16x4" else 3

        def dotn(a, b, dn):
            ah, al = _split_bf16(a)
            bh, bl = _split_bf16(b)
            out = jax.lax.dot_general(ah, bh, dn, precision=d,
                                      preferred_element_type=jnp.float32)
            out += jax.lax.dot_general(ah, bl, dn, precision=d,
                                       preferred_element_type=jnp.float32)
            out += jax.lax.dot_general(al, bh, dn, precision=d,
                                       preferred_element_type=jnp.float32)
            if passes == 4:
                out += jax.lax.dot_general(al, bl, dn, precision=d,
                                           preferred_element_type=jnp.float32)
            return out

        return dotn

    if precision == "bf16x6":
        # 3-way mantissa split (f32 = three exact bf16 chunks); the six terms
        # with magnitude >= 2^-16 reproduce full f32 products.  Hardware
        # measurement: parity equals HIGHEST (2.2e-5 dB on tonal spectra) but
        # Mosaic's native HIGHEST is ~20% faster — kept as a reference
        # implementation / fallback, not a default.
        d = jax.lax.Precision.DEFAULT

        def _split3(a):
            h1, r = _split_bf16(a)
            h2, l = _split_bf16(r)
            return h1, h2, l

        def dot6(a, b, dn):
            a1, a2, a3 = _split3(a)
            b1, b2, b3 = _split3(b)

            def dd(x, y):
                return jax.lax.dot_general(x, y, dn, precision=d,
                                           preferred_element_type=jnp.float32)

            return (dd(a1, b1) + dd(a1, b2) + dd(a2, b1)
                    + dd(a2, b2) + dd(a3, b1) + dd(a1, b3))

        return dot6

    p = precision if precision is not None else jax.lax.Precision.HIGHEST

    def dot(a, b, dn):
        return jax.lax.dot_general(a, b, dn, precision=p,
                                   preferred_element_type=jnp.float32)

    return dot


def _stage_dots(precision):
    """Per-stage matmul accuracy: a single tier for both FFT stages, or a
    ``(inner, outer)`` tuple — the two stages have different cancellation
    profiles, so mixed tiers (e.g. HIGHEST inner / bf16x4 outer) are a
    legitimate speed/accuracy point to probe on hardware."""
    if isinstance(precision, tuple):
        return _make_dot(precision[0]), _make_dot(precision[1])
    dot = _make_dot(precision)
    return dot, dot


def _make_fft_power_kernel(n_fft: int, n1: int, n2: int, precision=None):
    dot_inner, dot_outer = _stage_dots(precision)

    def kernel(frames_ref, window_ref, w2r_ref, w2i_ref, w1r_ref, w1i_ref,
               twr_ref, twi_ref, out_ref):
        rows = frames_ref.shape[0]
        # int16 PCM frames halve the HBM framing traffic and convert exactly
        # here (the window constant is pre-scaled by 1/32768 by the caller).
        x = frames_ref[:].astype(jnp.float32) * window_ref[:]  # (R, n_fft)
        x = x.reshape(rows, n2, n1)
        # Inner DFT over n2, all frames as one matmul: (n2, n2) @ (n2, R*n1).
        x2 = jnp.transpose(x, (1, 0, 2)).reshape(n2, rows * n1)
        dn = (((1,), (0,)), ((), ()))
        yr = dot_inner(w2r_ref[:], x2, dn)
        yi = dot_inner(w2i_ref[:], x2, dn)
        # Twiddle W_N^{n1*k2}: (n2, n1) broadcast over frames.
        yr = yr.reshape(n2, rows, n1)
        yi = yi.reshape(n2, rows, n1)
        twr = twr_ref[:].reshape(n2, 1, n1)
        twi = twi_ref[:].reshape(n2, 1, n1)
        tr = yr * twr - yi * twi
        ti = yr * twi + yi * twr
        # Outer DFT over n1, frames x k2 rows folded: (R*n2, n1) @ (n1, n1).
        tr = jnp.transpose(tr, (1, 0, 2)).reshape(rows * n2, n1)
        ti = jnp.transpose(ti, (1, 0, 2)).reshape(rows * n2, n1)
        zr = dot_outer(tr, w1r_ref[:], dn) - dot_outer(ti, w1i_ref[:], dn)
        zi = dot_outer(tr, w1i_ref[:], dn) + dot_outer(ti, w1r_ref[:], dn)
        power = zr * zr + zi * zi                         # (R*n2, n1): [f, k2, k1]
        out_ref[:] = power.reshape(rows, n_fft)           # flat idx k2*n1 + k1

    return kernel


# ---------------------------------------------------------------------------
# In-kernel DMA framing.  Mosaic requires 1-D HBM DMA starts to be 1024-element
# aligned; frame starts (multiples of hop=15840) are not.  But the tile base
# phase mod 1024 cycles with period gcd: base = t*8*hop has phase
# (t * (8*hop mod 1024)) mod 1024, which for hop=15840 takes only 4 values —
# so the kernel DMAs the 1024-aligned enclosing span once and a lax.switch
# over the tile's phase makes every per-frame extract a *static* VMEM slice.
# ---------------------------------------------------------------------------


def _extract_rolled(span_vmem, lane, o: int, frame_rows: int):
    """One frame (frame_rows, 128) starting at STATIC span offset ``o``:
    an 8-row-aligned ref slice, two sublane rolls (the second supplies the
    lane-carry row), a lane roll, and a lane-mask select — all full-tile
    vector ops that Mosaic lowers.  Shared by every DMA-framing kernel so the
    a8/sub roll arithmetic lives in exactly one place.

      rs, ls = o // 128, o % 128   row start / lane shift
      A = roll(piece, -sub)[0:frame_rows]      rows rs..rs+frame_rows-1
      B = roll(piece, -sub-1)[0:frame_rows]    one row later (lane carry)
      frame[j, l] = (A if l < 128-ls else B)[j, (l+ls) % 128]
    """
    rs, ls = o // 128, o % 128
    a8 = (rs // 8) * 8
    sub = rs - a8
    piece = span_vmem[a8:a8 + frame_rows + 8, :]
    rows_p = frame_rows + 8
    a = pltpu.roll(piece, (rows_p - sub) % rows_p, 0)[:frame_rows]
    if ls == 0:
        return a
    b = pltpu.roll(piece, (rows_p - sub - 1) % rows_p, 0)[:frame_rows]
    ar = pltpu.roll(a, 128 - ls, 1)
    br = pltpu.roll(b, 128 - ls, 1)
    return jnp.where(lane < 128 - ls, ar, br)


def _make_wave_fft_power_kernel(n_fft: int, n1: int, n2: int, hop: int,
                                s_pad: int, span_len: int, phases):
    tile_stride = FFT_TILE_R * hop

    def kernel(wave_ref, window_ref, w2r_ref, w2i_ref, w1r_ref, w1i_ref,
               twr_ref, twi_ref, out_ref, span_vmem, sem):
        c = pl.program_id(0)
        t = pl.program_id(1)
        base = c * s_pad + t * tile_stride
        aligned = pl.multiple_of((base // 1024) * 1024, 1024)
        dma = pltpu.make_async_copy(
            wave_ref.at[pl.ds(aligned, span_len)], span_vmem, sem
        )
        dma.start()
        dma.wait()

        def build(phase):
            def _build():
                return jnp.stack([
                    span_vmem[phase + f * hop: phase + f * hop + n_fft]
                    for f in range(FFT_TILE_R)
                ])

            return _build

        phase_idx = jax.lax.rem(t, len(phases))
        frames = jax.lax.switch(phase_idx, [build(p) for p in phases])

        rows = FFT_TILE_R
        x = frames * window_ref[0]
        x = x.reshape(rows, n2, n1)
        x2 = jnp.transpose(x, (1, 0, 2)).reshape(n2, rows * n1)
        hi = jax.lax.Precision.HIGHEST
        dn = (((1,), (0,)), ((), ()))
        yr = jax.lax.dot_general(w2r_ref[:], x2, dn, precision=hi,
                                 preferred_element_type=jnp.float32)
        yi = jax.lax.dot_general(w2i_ref[:], x2, dn, precision=hi,
                                 preferred_element_type=jnp.float32)
        yr = yr.reshape(n2, rows, n1)
        yi = yi.reshape(n2, rows, n1)
        twr = twr_ref[:].reshape(n2, 1, n1)
        twi = twi_ref[:].reshape(n2, 1, n1)
        tr = yr * twr - yi * twi
        ti = yr * twi + yi * twr
        tr = jnp.transpose(tr, (1, 0, 2)).reshape(rows * n2, n1)
        ti = jnp.transpose(ti, (1, 0, 2)).reshape(rows * n2, n1)
        zr = (jax.lax.dot_general(tr, w1r_ref[:], dn, precision=hi,
                                  preferred_element_type=jnp.float32)
              - jax.lax.dot_general(ti, w1i_ref[:], dn, precision=hi,
                                    preferred_element_type=jnp.float32))
        zi = (jax.lax.dot_general(tr, w1i_ref[:], dn, precision=hi,
                                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(ti, w1r_ref[:], dn, precision=hi,
                                    preferred_element_type=jnp.float32))
        power = zr * zr + zi * zi
        out_ref[:] = power.reshape(rows, n_fft)

    return kernel


def _make_wave_fft_power_kernel_roll(n_fft: int, n1: int, n2: int, hop: int,
                                     s_pad: int, span_len: int, phases,
                                     precision=None, debug_frame_mode="roll",
                                     double_buffer=True):
    """DMA-framing kernel, roll-based frame extraction.

    The slice-based kernel above fails to lower because Mosaic rejects
    lane-unaligned static slices + stack.  This variant never slices
    unaligned: the span lives in VMEM as (rows, 128); each frame is produced
    by an 8-row-ALIGNED ref slice, two sublane rolls (pltpu.roll, static
    shifts), a lane roll, and a lane-mask select — all full-tile vector ops:

      o  = phase + f*hop          frame start within the span (static per
                                  switch branch; o % 32 == 0 always)
      rs, ls = o // 128, o % 128  row start / lane shift (ls in {0,32,64,96})
      piece  = span[(rs//8)*8 : +264]          # aligned ref slice
      A = roll(piece, -(rs%8), rows)[0:256]    # rows rs..rs+255
      B = roll(piece, -(rs%8)-1, rows)[0:256]  # rows rs+1..rs+256 (lane carry)
      frame[j, l] = (A if l < 128-ls else B)[j, (l+ls) % 128]

    The span HBM->VMEM copy is DOUBLE-BUFFERED across grid steps (tile k+1's
    span streams into the other slot while tile k computes): the serial
    start/wait version measured a ~3.3 ms/batch stall on 16x60 s input —
    ~23% of the whole featurizer (hardware ablation, benchmarks round 2).
    """
    tile_stride = FFT_TILE_R * hop
    span_rows = span_len // 128
    frame_rows = n_fft // 128  # 256

    def kernel(wave_ref, window_ref, w2r_ref, w2i_ref, w1r_ref, w1i_ref,
               twr_ref, twi_ref, out_ref, span_a, *db_scratch):
        c = pl.program_id(0)
        t = pl.program_id(1)
        n_tiles = pl.num_programs(1)
        n_sigs = pl.num_programs(0)
        linear = c * n_tiles + t
        total = n_sigs * n_tiles

        def aligned_row_of(ci, ti):
            flat_base = ci * s_pad + ti * tile_stride
            return pl.multiple_of((flat_base // 1024) * 8, 8)

        def dma_for(span_vmem, sem, ci, ti):
            return pltpu.make_async_copy(
                wave_ref.at[pl.ds(aligned_row_of(ci, ti), span_rows)],
                span_vmem, sem)

        if double_buffer:
            span_b, sem_a, sem_b = db_scratch
            slot = jax.lax.rem(linear, 2)
            nlin = linear + 1
            nc = nlin // n_tiles
            nt = nlin - nc * n_tiles

            @pl.when(linear == 0)
            def _prologue():
                dma_for(span_a, sem_a, c, t).start()

            @pl.when((slot == 0) & (nlin < total))
            def _prefetch_b():
                dma_for(span_b, sem_b, nc, nt).start()

            @pl.when((slot == 1) & (nlin < total))
            def _prefetch_a():
                dma_for(span_a, sem_a, nc, nt).start()

            @pl.when(slot == 0)
            def _wait_a():
                dma_for(span_a, sem_a, c, t).wait()

            @pl.when(slot == 1)
            def _wait_b():
                dma_for(span_b, sem_b, c, t).wait()
        else:
            # Serial fallback (impl='roll_nodb'): one span slot, start+wait
            # inline each tile — no second slot, no dead cond branch.
            (sem_a,) = db_scratch
            d = dma_for(span_a, sem_a, c, t)
            d.start()
            d.wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (frame_rows, 128), 1)

        def build(span_vmem, phase):
            def _build():
                return jnp.stack([
                    _extract_rolled(span_vmem, lane, phase + f * hop, frame_rows)
                    for f in range(FFT_TILE_R)
                ])  # (R, 256, 128)

            return _build

        def extract(span_vmem):
            if debug_frame_mode == "aligned":
                # PROFILING ONLY (wrong values): skip the roll machinery and
                # take 8 aligned slices — isolates the framing cost in-situ.
                return jnp.stack([
                    span_vmem[(f * (hop // 1024) * 8):(f * (hop // 1024) * 8) + frame_rows, :]
                    for f in range(FFT_TILE_R)
                ])
            phase_idx = jax.lax.rem(t, len(phases))
            return jax.lax.switch(phase_idx, [build(span_vmem, p) for p in phases])

        if double_buffer:
            frames = jax.lax.cond(slot == 0,
                                  lambda: extract(span_a),
                                  lambda: extract(span_b))
        else:
            frames = extract(span_a)
        frames = frames.reshape(FFT_TILE_R, n_fft)

        rows = FFT_TILE_R
        dot_inner, dot_outer = _stage_dots(precision)
        x = frames * window_ref[0]
        x = x.reshape(rows, n2, n1)
        x2 = jnp.transpose(x, (1, 0, 2)).reshape(n2, rows * n1)
        dn = (((1,), (0,)), ((), ()))
        yr = dot_inner(w2r_ref[:], x2, dn)
        yi = dot_inner(w2i_ref[:], x2, dn)
        yr = yr.reshape(n2, rows, n1)
        yi = yi.reshape(n2, rows, n1)
        twr = twr_ref[:].reshape(n2, 1, n1)
        twi = twi_ref[:].reshape(n2, 1, n1)
        tr = yr * twr - yi * twi
        ti = yr * twi + yi * twr
        tr = jnp.transpose(tr, (1, 0, 2)).reshape(rows * n2, n1)
        ti = jnp.transpose(ti, (1, 0, 2)).reshape(rows * n2, n1)
        zr = dot_outer(tr, w1r_ref[:], dn) - dot_outer(ti, w1i_ref[:], dn)
        zi = dot_outer(tr, w1i_ref[:], dn) + dot_outer(ti, w1r_ref[:], dn)
        power = zr * zr + zi * zi
        out_ref[:] = power.reshape(rows, n_fft)

    return kernel


MEL_GROUP = 16  # FFT tiles buffered per in-kernel mel matmul (impl='fuse')


def _make_wave_fft_mel_kernel_roll(n_fft: int, n1: int, n2: int, hop: int,
                                   s_pad: int, span_len: int, phases,
                                   precision=None, mel_precision="bf16x4"):
    """Single-kernel featurizer (impl='fuse'): roll-framed FFT tiles with the
    mel+log projection fused in as a grouped epilogue.

    The two-kernel production path round-trips the (rows, n_fft) power
    spectrum through HBM between the FFT and mel kernels — ~380 MB written
    + 380 MB read per 16x60 s batch, plus a second kernel launch.  Here each
    tile's 8 power rows are written to a VMEM accumulation buffer instead;
    every MEL_GROUP-th tile (or the final tile) projects the buffered
    (MEL_GROUP*8, n_fft) rows through the VMEM-resident folded filterbank
    and applies 10*log10(max(amin, .)), emitting (128, 128) log-mel blocks.
    M=128 keeps the mel matmul MXU-efficient (a per-tile M=8 projection
    would K-stream the 32768-deep filterbank at 1/16th utilization).

    The mel accumulation walks K in the same TILE_K ascending order with the
    same split-operand dot as the standalone resident-fb mel kernel, so the
    fused path is numerically identical to the production two-kernel path.

    Stale buffer rows (slots past the last real tile in a partial final
    group) produce junk output rows that land beyond n_frames and are
    trimmed by the caller — they never alias real rows because each tile
    writes its own slot before any epilogue fires.
    """
    tile_stride = FFT_TILE_R * hop
    span_rows = span_len // 128
    group_rows = MEL_GROUP * FFT_TILE_R
    assert n_fft % TILE_K == 0
    k_chunks = n_fft // TILE_K
    mel_dot = _make_dot(mel_precision)

    def kernel(wave_ref, window_ref, w2r_ref, w2i_ref, w1r_ref, w1i_ref,
               twr_ref, twi_ref, fb_ref, out_ref, span_a, span_b, sem_a,
               sem_b, pbuf):
        c = pl.program_id(0)
        t = pl.program_id(1)
        n_tiles = pl.num_programs(1)
        n_sigs = pl.num_programs(0)
        linear = c * n_tiles + t
        total = n_sigs * n_tiles

        def aligned_row_of(ci, ti):
            flat_base = ci * s_pad + ti * tile_stride
            return pl.multiple_of((flat_base // 1024) * 8, 8)

        def dma_for(span_vmem, sem, ci, ti):
            return pltpu.make_async_copy(
                wave_ref.at[pl.ds(aligned_row_of(ci, ti), span_rows)],
                span_vmem, sem)

        slot = jax.lax.rem(linear, 2)
        nlin = linear + 1
        nc = nlin // n_tiles
        nt = nlin - nc * n_tiles

        @pl.when(linear == 0)
        def _prologue():
            dma_for(span_a, sem_a, c, t).start()

        @pl.when((slot == 0) & (nlin < total))
        def _prefetch_b():
            dma_for(span_b, sem_b, nc, nt).start()

        @pl.when((slot == 1) & (nlin < total))
        def _prefetch_a():
            dma_for(span_a, sem_a, nc, nt).start()

        @pl.when(slot == 0)
        def _wait_a():
            dma_for(span_a, sem_a, c, t).wait()

        @pl.when(slot == 1)
        def _wait_b():
            dma_for(span_b, sem_b, c, t).wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (n_fft // 128, 128), 1)

        def build(span_vmem, phase):
            def _build():
                return jnp.stack([
                    _extract_rolled(span_vmem, lane, phase + f * hop,
                                    n_fft // 128)
                    for f in range(FFT_TILE_R)
                ])

            return _build

        def extract(span_vmem):
            phase_idx = jax.lax.rem(t, len(phases))
            return jax.lax.switch(phase_idx,
                                  [build(span_vmem, p) for p in phases])

        frames = jax.lax.cond(slot == 0,
                              lambda: extract(span_a),
                              lambda: extract(span_b))
        frames = frames.reshape(FFT_TILE_R, n_fft)
        power = _fft_power_body(frames, window_ref, w2r_ref, w2i_ref,
                                w1r_ref, w1i_ref, twr_ref, twi_ref,
                                n1, n2, precision)

        in_group = jax.lax.rem(linear, MEL_GROUP)
        pbuf[pl.ds(pl.multiple_of(in_group * FFT_TILE_R, 8), FFT_TILE_R),
             :] = power

        @pl.when((in_group == MEL_GROUP - 1) | (linear == total - 1))
        def _mel_epilogue():
            acc = jnp.zeros((group_rows, LANES), jnp.float32)
            dn = (((1,), (0,)), ((), ()))
            for kk in range(k_chunks):
                acc += mel_dot(
                    pbuf[:, kk * TILE_K:(kk + 1) * TILE_K],
                    fb_ref[pl.ds(kk * TILE_K, TILE_K), :], dn)
            out_ref[:] = 10.0 * mel_ops.log10_precise(
                jnp.maximum(acc, AMIN))

    return kernel


# ---------------------------------------------------------------------------
# Packed even/odd rFFT featurizer ('pack').  The classic rFFT halving: frame
# even/odd half-waveforms in-kernel (same roll framing, half hop / half frame
# length), run ONE half-size complex FFT on z = x_even + i*x_odd per frame —
# 2x fewer MXU FLOPs than the full-N real transform — then recover the
# one-sided power spectrum with a pure-XLA hermitian unpack between the two
# kernels, and project with a HALF-K mel kernel (16385 vs 32768 K rows).
# The unpack mirror conj(Z[(m-k) mod m]) is flips/rolls on the (k2, k1) tile
# axes in XLA, where they are cheap relayouts — in-kernel lane reversal is
# exactly what Mosaic cannot lower (ROADMAP.md "Environment notes").
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _packed_fft_constants(n_fft: int, win_length: int):
    from sed_tpu.ops import stft as stft_ops

    m = n_fft // 2
    n1, n2, (w2r, w2i), (w1r, w1i), (twr, twi) = stft_ops._matmul_fft_constants(m)
    window = stft_ops.padded_window(win_length, n_fft).astype(np.float64)
    return (m, n1, n2, w2r, w2i, w1r, w1i, twr, twi,
            window[0::2].astype(np.float32).copy(),
            window[1::2].astype(np.float32).copy())


@functools.lru_cache(maxsize=4)
def _packed_unpack_constants(n_fft: int):
    """cos/sin of -2*pi*bin/n_fft for bins laid out in the half-size FFT's
    (k2, k1) tile order: flat j = k2*n1 + k1 holds spectral bin n2*k1 + k2."""
    from sed_tpu.ops import stft as stft_ops

    m = n_fft // 2
    n1, n2, *_ = stft_ops._matmul_fft_constants(m)
    k2 = np.arange(n2)[:, None]
    k1 = np.arange(n1)[None, :]
    bins = (n2 * k1 + k2).reshape(-1)
    theta = -2.0 * np.pi * bins / n_fft
    return np.cos(theta).astype(np.float32), np.sin(theta).astype(np.float32), n1, n2


def packed_power_onesided(zr: jnp.ndarray, zi: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """(..., m) tile-layout packed FFT -> (..., m+1) one-sided power.

    Hermitian unpack of Z = FFT_m(x_even + i*x_odd) (same math as
    stft.rfft_matmul_realimag:165, re-derived in tile layout):
      E[k] = (Z[k] + conj(Z[-k]))/2,  O[k] = (Z[k] - conj(Z[-k]))/(2i),
      X[k] = E[k] + W_N^k O[k],       X[m] = Re(Z[0]) - Im(Z[0]).
    The mirror Z[(m-k) mod m] in (k2, k1) tile layout is flip+roll on the k2
    axis combined with a flip on k1 (row k2=0 mirrors within itself) — all
    XLA relayout ops.  Output column m is the Nyquist power, matching
    :func:`_onesided_tile_filterbank` row m.
    """
    c, s, n1, n2 = _packed_unpack_constants(n_fft)
    m = n_fft // 2
    lead = zr.shape[:-1]
    zr3 = zr.reshape(lead + (n2, n1))
    zi3 = zi.reshape(lead + (n2, n1))

    def mirror(z):
        # k2 > 0 rows: (k2, k1) -> (n2-k2, n1-1-k1); row 0: k1 -> (n1-k1)%n1.
        main = jnp.flip(jnp.roll(jnp.flip(z, axis=-2), 1, axis=-2), axis=-1)
        row0 = jnp.roll(jnp.flip(z[..., :1, :], axis=-1), 1, axis=-1)
        return jnp.concatenate([row0, main[..., 1:, :]], axis=-2)

    zmr = mirror(zr3).reshape(lead + (m,))
    zmi = mirror(zi3).reshape(lead + (m,))
    er = 0.5 * (zr + zmr)
    ei = 0.5 * (zi - zmi)
    orr = 0.5 * (zi + zmi)
    oi = 0.5 * (zmr - zr)
    c = jnp.asarray(c)
    s = jnp.asarray(s)
    xr = er + c * orr - s * oi
    xi = ei + c * oi + s * orr
    power = xr * xr + xi * xi
    nyq = (zr[..., :1] - zi[..., :1]) ** 2  # X[m] = Re(Z[0]) - Im(Z[0])
    return jnp.concatenate([power, nyq], axis=-1)


def _make_wave_eo_fft_power_kernel(m: int, n1: int, n2: int, hop2: int,
                                   s_pad2: int, span_len: int, phases,
                                   precision=None):
    """Even/odd SPLIT rFFT kernel: two half-size REAL FFTs, combined in-kernel.

    The decimation-in-time identity X[k] = E[k] + W_N^k O[k] (k = 0..m-1,
    E = FFT_m(x_even), O = FFT_m(x_odd)) needs E and O only at the SAME bin k
    — unlike the packed z = e + i*o formulation there is no conj(Z[-k])
    mirror, so the one-sided power spectrum is a pure elementwise epilogue in
    the kernel's own tile layout.  Matmul cost per frame: 2*(2*m*n2 + 4*m*n1)
    = 25.2M MACs at n_fft=32768 vs 33.6M for the full-N real transform (1.33x
    cut), every stage a 128-point DFT that exactly fills the MXU, and the
    output is HALF the bytes (one-sided).  Output columns: 0..m-1 = power in
    (k2, k1) tile layout of the HALF transform; column m = the Nyquist bin
    |E[0] - O[0]|^2; columns m+1..m+127 zero (lane padding) — matching
    :func:`_onesided_tile_filterbank`.

    Span copies for both half-waveforms are double-buffered across grid steps
    like the roll kernel.
    """
    tile_stride = FFT_TILE_R * hop2
    span_rows = span_len // 128
    frame_rows = m // 128

    def kernel(we_ref, wo_ref, window_e_ref, window_o_ref, w2r_ref, w2i_ref,
               w1r_ref, w1i_ref, twr_ref, twi_ref, cos_ref, sin_ref,
               out_ref, span_ea, span_eb, span_oa, span_ob,
               sem_ea, sem_eb, sem_oa, sem_ob):
        c = pl.program_id(0)
        t = pl.program_id(1)
        n_tiles = pl.num_programs(1)
        n_sigs = pl.num_programs(0)
        linear = c * n_tiles + t
        slot = jax.lax.rem(linear, 2)
        total = n_sigs * n_tiles

        def aligned_row_of(ci, ti):
            flat_base = ci * s_pad2 + ti * tile_stride
            return pl.multiple_of((flat_base // 1024) * 8, 8)

        def dma_for(wref, span_vmem, sem, ci, ti):
            return pltpu.make_async_copy(
                wref.at[pl.ds(aligned_row_of(ci, ti), span_rows)],
                span_vmem, sem)

        nlin = linear + 1
        nc = nlin // n_tiles
        nt = nlin - nc * n_tiles

        @pl.when(linear == 0)
        def _prologue():
            dma_for(we_ref, span_ea, sem_ea, c, t).start()
            dma_for(wo_ref, span_oa, sem_oa, c, t).start()

        @pl.when((slot == 0) & (nlin < total))
        def _prefetch_b():
            dma_for(we_ref, span_eb, sem_eb, nc, nt).start()
            dma_for(wo_ref, span_ob, sem_ob, nc, nt).start()

        @pl.when((slot == 1) & (nlin < total))
        def _prefetch_a():
            dma_for(we_ref, span_ea, sem_ea, nc, nt).start()
            dma_for(wo_ref, span_oa, sem_oa, nc, nt).start()

        @pl.when(slot == 0)
        def _wait_a():
            dma_for(we_ref, span_ea, sem_ea, c, t).wait()
            dma_for(wo_ref, span_oa, sem_oa, c, t).wait()

        @pl.when(slot == 1)
        def _wait_b():
            dma_for(we_ref, span_eb, sem_eb, c, t).wait()
            dma_for(wo_ref, span_ob, sem_ob, c, t).wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (frame_rows, 128), 1)

        def build_pair(span_e, span_o):
            def from_phase(phase):
                def _build():
                    return jnp.stack(
                        [_extract_rolled(span_e, lane, phase + f * hop2, frame_rows)
                         for f in range(FFT_TILE_R)]
                        + [_extract_rolled(span_o, lane, phase + f * hop2, frame_rows)
                           for f in range(FFT_TILE_R)]
                    )  # (2R, frame_rows, 128)

                return _build

            phase_idx = jax.lax.rem(t, len(phases))
            return jax.lax.switch(phase_idx, [from_phase(p) for p in phases])

        eo = jax.lax.cond(slot == 0,
                          lambda: build_pair(span_ea, span_oa),
                          lambda: build_pair(span_eb, span_ob))
        rows = FFT_TILE_R
        xe = eo[:rows].reshape(rows, m) * window_e_ref[0]
        xo = eo[rows:].reshape(rows, m) * window_o_ref[0]

        dot_inner, dot_outer = _stage_dots(precision)
        dn = (((1,), (0,)), ((), ()))
        twr = twr_ref[:].reshape(n2, 1, n1)
        twi = twi_ref[:].reshape(n2, 1, n1)

        def rfft_half(x):
            """Real m-point FFT in tile layout: (rows, m) -> (zr, zi)."""
            x = x.reshape(rows, n2, n1)
            x2 = jnp.transpose(x, (1, 0, 2)).reshape(n2, rows * n1)
            yr = dot_inner(w2r_ref[:], x2, dn)
            yi = dot_inner(w2i_ref[:], x2, dn)
            yr = yr.reshape(n2, rows, n1)
            yi = yi.reshape(n2, rows, n1)
            tr = yr * twr - yi * twi
            ti = yr * twi + yi * twr
            tr = jnp.transpose(tr, (1, 0, 2)).reshape(rows * n2, n1)
            ti = jnp.transpose(ti, (1, 0, 2)).reshape(rows * n2, n1)
            zr = dot_outer(tr, w1r_ref[:], dn) - dot_outer(ti, w1i_ref[:], dn)
            zi = dot_outer(tr, w1i_ref[:], dn) + dot_outer(ti, w1r_ref[:], dn)
            return zr.reshape(rows, m), zi.reshape(rows, m)

        er, ei = rfft_half(xe)
        orr, oi = rfft_half(xo)
        cth = cos_ref[0]
        sth = sin_ref[0]
        xr = er + cth * orr - sth * oi
        xi = ei + cth * oi + sth * orr
        power = xr * xr + xi * xi  # one-sided bins 0..m-1, tile layout
        nyq = (er[:, :1] - orr[:, :1])  # X[m] = E[0] - O[0], purely real
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        nyq_tile = jnp.where(lane_row == 0, nyq * nyq, 0.0)
        out_ref[:] = jnp.concatenate([power, nyq_tile], axis=1)

    return kernel


def _make_wave_packed_fft_kernel(m: int, n1: int, n2: int, hop2: int,
                                 s_pad2: int, span_len: int, phases,
                                 precision=None):
    """Packed even/odd FFT kernel with in-kernel roll framing.

    Inputs: the deinterleaved half-waveforms (even samples, odd samples) as
    flat (rows, 128) HBM views.  Each grid step DMAs both tiles' 1024-aligned
    spans, extracts the 8 half-frames from each via the sublane/lane roll
    machinery (see _make_wave_fft_power_kernel_roll), windows with the
    deinterleaved Hann halves, and runs ONE complex m-point FFT per frame on
    z = even + i*odd.  Outputs Z's real/imag parts in (k2, k1) tile layout.
    """
    tile_stride = FFT_TILE_R * hop2
    span_rows = span_len // 128
    frame_rows = m // 128

    def kernel(we_ref, wo_ref, window_e_ref, window_o_ref, w2r_ref, w2i_ref,
               w1r_ref, w1i_ref, twr_ref, twi_ref, outr_ref, outi_ref,
               span_e, span_o, sem_e, sem_o):
        c = pl.program_id(0)
        t = pl.program_id(1)
        flat_base = c * s_pad2 + t * tile_stride
        aligned_row = pl.multiple_of((flat_base // 1024) * 8, 8)
        dma_e = pltpu.make_async_copy(
            we_ref.at[pl.ds(aligned_row, span_rows)], span_e, sem_e)
        dma_o = pltpu.make_async_copy(
            wo_ref.at[pl.ds(aligned_row, span_rows)], span_o, sem_o)
        dma_e.start()
        dma_o.start()
        dma_e.wait()
        dma_o.wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (frame_rows, 128), 1)

        def build(phase):
            def _build():
                return jnp.stack(
                    [_extract_rolled(span_e, lane, phase + f * hop2, frame_rows)
                     for f in range(FFT_TILE_R)]
                    + [_extract_rolled(span_o, lane, phase + f * hop2, frame_rows)
                       for f in range(FFT_TILE_R)]
                )  # (2R, frame_rows, 128)

            return _build

        phase_idx = jax.lax.rem(t, len(phases))
        eo = jax.lax.switch(phase_idx, [build(p) for p in phases])
        rows = FFT_TILE_R
        xr = eo[:rows].reshape(rows, m) * window_e_ref[0]
        xi = eo[rows:].reshape(rows, m) * window_o_ref[0]

        dot_inner, dot_outer = _stage_dots(precision)
        xr = xr.reshape(rows, n2, n1)
        xi = xi.reshape(rows, n2, n1)
        xr2 = jnp.transpose(xr, (1, 0, 2)).reshape(n2, rows * n1)
        xi2 = jnp.transpose(xi, (1, 0, 2)).reshape(n2, rows * n1)
        dn = (((1,), (0,)), ((), ()))
        yr = dot_inner(w2r_ref[:], xr2, dn) - dot_inner(w2i_ref[:], xi2, dn)
        yi = dot_inner(w2r_ref[:], xi2, dn) + dot_inner(w2i_ref[:], xr2, dn)
        yr = yr.reshape(n2, rows, n1)
        yi = yi.reshape(n2, rows, n1)
        twr = twr_ref[:].reshape(n2, 1, n1)
        twi = twi_ref[:].reshape(n2, 1, n1)
        tr = yr * twr - yi * twi
        ti = yr * twi + yi * twr
        tr = jnp.transpose(tr, (1, 0, 2)).reshape(rows * n2, n1)
        ti = jnp.transpose(ti, (1, 0, 2)).reshape(rows * n2, n1)
        zr = dot_outer(tr, w1r_ref[:], dn) - dot_outer(ti, w1i_ref[:], dn)
        zi = dot_outer(tr, w1i_ref[:], dn) + dot_outer(ti, w1r_ref[:], dn)
        outr_ref[:] = zr.reshape(rows, m)
        outi_ref[:] = zi.reshape(rows, m)

    return kernel


def _deinterleaved_layout(waveforms: jnp.ndarray, cfg: SpectrogramConfig):
    """Shared pack/eo driver setup: reflect-pad, deinterleave into even/odd
    half-waveforms in the kernels' strided flat (rows, 128) DMA layout, and
    compute the span/phase geometry (half hop, half frame length)."""
    n_fft, hop = cfg.nfft, cfg.hop_size
    assert n_fft % 2 == 0 and hop % 2 == 0, "even/odd paths need even nfft/hop"
    m = n_fft // 2
    hop2 = hop // 2
    n_signals, n_samples = waveforms.shape
    n_frames = 1 + n_samples // hop
    n_tiles = pl.cdiv(n_frames, FFT_TILE_R)

    tile_stride = FFT_TILE_R * hop2
    phase_step = tile_stride % 1024
    phases = []
    p = 0
    while True:
        phases.append(p)
        p = (p + phase_step) % 1024
        if p == 0:
            break
    span_len = 1024 + (FFT_TILE_R - 1) * hop2 + m
    span_len += (-span_len) % 1024

    pad = n_fft // 2
    wave = jnp.pad(waveforms.astype(jnp.float32), ((0, 0), (pad, pad)),
                   mode="reflect")
    # Deinterleave: frame f's even part = even_half[f*hop2 : f*hop2+m] (hop
    # and the reflect pad are both even, so every frame start is even).
    total = (wave.shape[1] // 2) * 2
    eo = wave[:, :total].reshape(n_signals, -1, 2)
    needed = (n_tiles * FFT_TILE_R - 1) * hop2 + m + 1024
    s_pad2 = max(needed, eo.shape[1])
    s_pad2 += (-s_pad2) % 1024

    def flatten_half(h):
        h = jnp.pad(h, ((0, 0), (0, s_pad2 - h.shape[1]))).reshape(-1)
        total_needed = (n_signals - 1) * s_pad2 + (n_tiles - 1) * tile_stride + span_len
        if total_needed > h.shape[0]:
            h = jnp.pad(h, (0, total_needed - h.shape[0]))
        h = jnp.pad(h, (0, (-h.shape[0]) % 128))
        return h.reshape(-1, 128)

    return dict(m=m, hop2=hop2, n_signals=n_signals, n_frames=n_frames,
                n_tiles=n_tiles, phases=tuple(phases), span_len=span_len,
                s_pad2=s_pad2,
                wave_e=flatten_half(eo[:, :, 0]),
                wave_o=flatten_half(eo[:, :, 1]))


def stft_packed_from_waveform_pallas(
    waveforms: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    interpret=None,
    precision=None,
    trim: bool = True,
):
    """(n_signals, samples) -> (Zr, Zi), each (n_signals, n_frames, m).

    Z = FFT_m(frame_even + i*frame_odd) per centered frame (m = n_fft//2) in
    the kernel's (k2, k1) tile layout; framing happens in-kernel from the
    deinterleaved half-waveforms (hop/2-strided).  Feed through
    :func:`packed_power_onesided` + :func:`_onesided_mel_from_power`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_fft = cfg.nfft
    geo = _deinterleaved_layout(waveforms, cfg)
    m, hop2 = geo["m"], geo["hop2"]
    n_signals, n_frames, n_tiles = geo["n_signals"], geo["n_frames"], geo["n_tiles"]
    phases, span_len, s_pad2 = geo["phases"], geo["span_len"], geo["s_pad2"]
    wave_e, wave_o = geo["wave_e"], geo["wave_o"]

    (m_, n1, n2, w2r, w2i, w1r, w1i, twr, twi, win_e, win_o) = \
        _packed_fft_constants(n_fft, cfg.frame_size)
    consts = [jnp.asarray(win_e)[None, :], jnp.asarray(win_o)[None, :],
              jnp.asarray(w2r), jnp.asarray(w2i), jnp.asarray(w1r),
              jnp.asarray(w1i), jnp.asarray(twr), jnp.asarray(twi)]
    const_specs = [
        pl.BlockSpec(c.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        for c in consts
    ]

    kernel = _make_wave_packed_fft_kernel(
        m, n1, n2, hop2, s_pad2, span_len, tuple(phases), precision)

    out_spec = pl.BlockSpec(
        (FFT_TILE_R, m), lambda c, t: (c * n_tiles + t, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n_signals * n_tiles * FFT_TILE_R, m),
                                     jnp.float32)
    zr, zi = pl.pallas_call(
        kernel,
        grid=(n_signals, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # even half, HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # odd half, HBM
            *const_specs,
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((span_len // 128, 128), jnp.float32),
            pltpu.VMEM((span_len // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_signals * n_tiles * FFT_TILE_R * (8 * n2 * n2 * n1 + 8 * n2 * n1 * n1),
            bytes_accessed=n_signals * n_tiles * (2 * span_len + 2 * FFT_TILE_R * m) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(wave_e, wave_o, *consts)
    zr = zr.reshape(n_signals, n_tiles * FFT_TILE_R, m)
    zi = zi.reshape(n_signals, n_tiles * FFT_TILE_R, m)
    if trim:
        zr, zi = zr[:, :n_frames], zi[:, :n_frames]
    return zr, zi


def stft_eo_power_from_waveform_pallas(
    waveforms: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    interpret=None,
    precision=None,
    trim: bool = True,
):
    """(n_signals, samples) -> (n_signals, n_frames, m+128) one-sided power.

    The even/odd SPLIT kernel (see :func:`_make_wave_eo_fft_power_kernel`):
    columns 0..m-1 are power bins in the half-transform's (k2, k1) tile
    layout, column m the Nyquist bin, the rest zero lane padding.  Project
    with :func:`_onesided_mel_from_power`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_fft = cfg.nfft
    geo = _deinterleaved_layout(waveforms, cfg)
    m, hop2 = geo["m"], geo["hop2"]
    n_signals, n_frames, n_tiles = geo["n_signals"], geo["n_frames"], geo["n_tiles"]
    phases, span_len, s_pad2 = geo["phases"], geo["span_len"], geo["s_pad2"]
    wave_e, wave_o = geo["wave_e"], geo["wave_o"]

    (m_, n1, n2, w2r, w2i, w1r, w1i, twr, twi, win_e, win_o) = \
        _packed_fft_constants(n_fft, cfg.frame_size)
    cth, sth, _, _ = _packed_unpack_constants(n_fft)
    consts = [jnp.asarray(win_e)[None, :], jnp.asarray(win_o)[None, :],
              jnp.asarray(w2r), jnp.asarray(w2i), jnp.asarray(w1r),
              jnp.asarray(w1i), jnp.asarray(twr), jnp.asarray(twi),
              jnp.asarray(cth)[None, :], jnp.asarray(sth)[None, :]]
    const_specs = [
        pl.BlockSpec(c.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        for c in consts
    ]

    kernel = _make_wave_eo_fft_power_kernel(
        m, n1, n2, hop2, s_pad2, span_len, tuple(phases), precision)

    span_scratch = pltpu.VMEM((span_len // 128, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(n_signals, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # even half, HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # odd half, HBM
            *const_specs,
        ],
        out_specs=pl.BlockSpec(
            (FFT_TILE_R, m + 128), lambda c, t: (c * n_tiles + t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_signals * n_tiles * FFT_TILE_R, m + 128), jnp.float32
        ),
        scratch_shapes=[
            span_scratch, span_scratch, span_scratch, span_scratch,
            pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_signals * n_tiles * FFT_TILE_R * 2 * (4 * n2 * n2 * n1 + 8 * n2 * n1 * n1),
            bytes_accessed=n_signals * n_tiles * (2 * span_len + FFT_TILE_R * (m + 128)) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(wave_e, wave_o, *consts)
    out = out.reshape(n_signals, n_tiles * FFT_TILE_R, m + 128)
    return out[:, :n_frames] if trim else out


def _make_wave_fft_power_kernel_rollraw(n_fft: int, n1: int, n2: int, hop: int,
                                        n_samples: int, stride_l: int,
                                        stride_r: int, t_lo: int, t_hi: int,
                                        span_len: int, phase_g: int,
                                        precision=None):
    """Roll-framing FFT kernel that reads INTERIOR tiles straight from the
    raw (unpadded) waveform.

    The legacy roll kernel requires an XLA pre-pass (reflect pad + repack to
    a 1024-aligned per-signal stride) costing ~1.6 ms per 16x60 s batch.
    Here only the boundary tiles touching the reflect pad read from two SMALL
    XLA-built edge buffers (one span each side per signal); every interior
    tile DMAs from the raw 2-D waveform flattened row-major — valid whenever
    n_samples % 128 == 0 (every whole-second 48 kHz clip).  The span phase
    mod 1024 then depends on BOTH (signal, tile), but stays inside the static
    set {0, phase_g, 2*phase_g, ...}, so extraction is one lax.switch over
    1024/phase_g branches with a dynamically computed index.

    Tile classes (t = tile index within a signal):
      t <  t_lo : left-edge  -> left_ref  at offset c*stride_l + t*ts
      t <= t_hi : interior   -> raw_ref   at offset c*n_samples + t*ts - pad
      t >  t_hi : right-edge -> right_ref at offset c*stride_r + (t-t_hi-1)*ts
    All three layouts are constructed so offset % 1024 lands in the same
    phase set.  Span DMAs are double-buffered across grid steps.
    """
    ts = FFT_TILE_R * hop
    pad = n_fft // 2
    span_rows = span_len // 128
    frame_rows = n_fft // 128
    phases = tuple(range(0, 1024, phase_g))

    def kernel(raw_ref, left_ref, right_ref, window_ref, w2r_ref, w2i_ref,
               w1r_ref, w1i_ref, twr_ref, twi_ref, out_ref,
               span_a, span_b, sem_a, sem_b):
        c = pl.program_id(0)
        t = pl.program_id(1)
        n_tiles = pl.num_programs(1)
        n_sigs = pl.num_programs(0)
        linear = c * n_tiles + t
        slot = jax.lax.rem(linear, 2)
        total = n_sigs * n_tiles

        def flat_of(ci, ti):
            interior = ci * n_samples + ti * ts - pad
            left = ci * stride_l + ti * ts
            right = ci * stride_r + (ti - (t_hi + 1)) * ts
            return jnp.where(ti < t_lo, left,
                             jnp.where(ti > t_hi, right, interior))

        def dma(span, sem, ci, ti, action):
            def issue(ref, flat):
                row = pl.multiple_of((flat // 1024) * 8, 8)
                cp = pltpu.make_async_copy(
                    ref.at[pl.ds(row, span_rows)], span, sem)
                cp.start() if action == "start" else cp.wait()

            @pl.when(ti < t_lo)
            def _l():
                issue(left_ref, ci * stride_l + ti * ts)

            @pl.when((ti >= t_lo) & (ti <= t_hi))
            def _i():
                issue(raw_ref, ci * n_samples + ti * ts - pad)

            @pl.when(ti > t_hi)
            def _r():
                issue(right_ref, ci * stride_r + (ti - (t_hi + 1)) * ts)

        nlin = linear + 1
        nc = nlin // n_tiles
        nt = nlin - nc * n_tiles

        @pl.when(linear == 0)
        def _prologue():
            dma(span_a, sem_a, c, t, "start")

        @pl.when((slot == 0) & (nlin < total))
        def _prefetch_b():
            dma(span_b, sem_b, nc, nt, "start")

        @pl.when((slot == 1) & (nlin < total))
        def _prefetch_a():
            dma(span_a, sem_a, nc, nt, "start")

        @pl.when(slot == 0)
        def _wait_a():
            dma(span_a, sem_a, c, t, "wait")

        @pl.when(slot == 1)
        def _wait_b():
            dma(span_b, sem_b, c, t, "wait")

        lane = jax.lax.broadcasted_iota(jnp.int32, (frame_rows, 128), 1)

        def build(span_vmem, phase):
            def _build():
                return jnp.stack([
                    _extract_rolled(span_vmem, lane, phase + f * hop, frame_rows)
                    for f in range(FFT_TILE_R)
                ])

            return _build

        phase_idx = jax.lax.rem(flat_of(c, t), 1024) // phase_g

        def extract(span_vmem):
            return jax.lax.switch(phase_idx,
                                  [build(span_vmem, p) for p in phases])

        frames = jax.lax.cond(slot == 0,
                              lambda: extract(span_a),
                              lambda: extract(span_b))
        frames = frames.reshape(FFT_TILE_R, n_fft)

        rows = FFT_TILE_R
        dot_inner, dot_outer = _stage_dots(precision)
        x = frames * window_ref[0]
        x = x.reshape(rows, n2, n1)
        x2 = jnp.transpose(x, (1, 0, 2)).reshape(n2, rows * n1)
        dn = (((1,), (0,)), ((), ()))
        yr = dot_inner(w2r_ref[:], x2, dn)
        yi = dot_inner(w2i_ref[:], x2, dn)
        yr = yr.reshape(n2, rows, n1)
        yi = yi.reshape(n2, rows, n1)
        twr = twr_ref[:].reshape(n2, 1, n1)
        twi = twi_ref[:].reshape(n2, 1, n1)
        tr = yr * twr - yi * twi
        ti_ = yr * twi + yi * twr
        tr = jnp.transpose(tr, (1, 0, 2)).reshape(rows * n2, n1)
        ti_ = jnp.transpose(ti_, (1, 0, 2)).reshape(rows * n2, n1)
        zr = dot_outer(tr, w1r_ref[:], dn) - dot_outer(ti_, w1i_ref[:], dn)
        zi = dot_outer(tr, w1i_ref[:], dn) + dot_outer(ti_, w1r_ref[:], dn)
        power = zr * zr + zi * zi
        out_ref[:] = power.reshape(rows, n_fft)

    return kernel


def _fft_power_body(frames, window_ref, w2r_ref, w2i_ref, w1r_ref, w1i_ref,
                    twr_ref, twi_ref, n1, n2, precision):
    """Shared FFT+power tile body: (FFT_TILE_R, n_fft) raw frames -> power in
    the kernel's flat (k2, k1) layout (used by the edge-specialized kernels;
    the older kernels keep their inlined copies)."""
    rows = FFT_TILE_R
    dot_inner, dot_outer = _stage_dots(precision)
    x = frames * window_ref[0]
    x = x.reshape(rows, n2, n1)
    x2 = jnp.transpose(x, (1, 0, 2)).reshape(n2, rows * n1)
    dn = (((1,), (0,)), ((), ()))
    yr = dot_inner(w2r_ref[:], x2, dn)
    yi = dot_inner(w2i_ref[:], x2, dn)
    yr = yr.reshape(n2, rows, n1)
    yi = yi.reshape(n2, rows, n1)
    twr = twr_ref[:].reshape(n2, 1, n1)
    twi = twi_ref[:].reshape(n2, 1, n1)
    tr = yr * twr - yi * twi
    ti = yr * twi + yi * twr
    tr = jnp.transpose(tr, (1, 0, 2)).reshape(rows * n2, n1)
    ti = jnp.transpose(ti, (1, 0, 2)).reshape(rows * n2, n1)
    zr = dot_outer(tr, w1r_ref[:], dn) - dot_outer(ti, w1i_ref[:], dn)
    zi = dot_outer(tr, w1i_ref[:], dn) + dot_outer(ti, w1r_ref[:], dn)
    power = zr * zr + zi * zi
    return power.reshape(rows, n1 * n2)


def _make_wave_fft_power_kernel_interior(n_fft: int, n1: int, n2: int,
                                         hop: int, n_samples: int, t_lo: int,
                                         span_len: int, phase_g: int,
                                         precision=None):
    """Branch-free raw-read kernel for INTERIOR tiles only (impl='rolledge').

    The rollraw post-mortem (ROADMAP.md) attributed its 0.9 ms in-kernel
    regression to the 3-way predicated DMA source selection executed on
    EVERY tile.  Here the grid covers only tiles whose span lies entirely
    inside the unpadded signal, so the DMA source is always the raw
    waveform and the offset is plain arithmetic — the kernel is the
    production roll kernel minus the padded layout, with the span phase
    computed per (signal, tile) over the small static set
    {0, phase_g, ...} (4 entries for whole-second 48 kHz clips).
    Double-buffered spans as in the roll kernel.
    """
    ts = FFT_TILE_R * hop
    pad = n_fft // 2
    span_rows = span_len // 128
    frame_rows = n_fft // 128
    phases = tuple(range(0, 1024, phase_g))

    def kernel(raw_ref, window_ref, w2r_ref, w2i_ref, w1r_ref, w1i_ref,
               twr_ref, twi_ref, out_ref, span_a, span_b, sem_a, sem_b):
        c = pl.program_id(0)
        t = pl.program_id(1)
        n_tiles = pl.num_programs(1)
        n_sigs = pl.num_programs(0)
        linear = c * n_tiles + t
        slot = jax.lax.rem(linear, 2)
        total = n_sigs * n_tiles

        def flat_of(ci, ti):
            return ci * n_samples + (ti + t_lo) * ts - pad

        def dma_for(span_vmem, sem, ci, ti):
            row = pl.multiple_of((flat_of(ci, ti) // 1024) * 8, 8)
            return pltpu.make_async_copy(
                raw_ref.at[pl.ds(row, span_rows)], span_vmem, sem)

        nlin = linear + 1
        nc = nlin // n_tiles
        nt = nlin - nc * n_tiles

        @pl.when(linear == 0)
        def _prologue():
            dma_for(span_a, sem_a, c, t).start()

        @pl.when((slot == 0) & (nlin < total))
        def _prefetch_b():
            dma_for(span_b, sem_b, nc, nt).start()

        @pl.when((slot == 1) & (nlin < total))
        def _prefetch_a():
            dma_for(span_a, sem_a, nc, nt).start()

        @pl.when(slot == 0)
        def _wait_a():
            dma_for(span_a, sem_a, c, t).wait()

        @pl.when(slot == 1)
        def _wait_b():
            dma_for(span_b, sem_b, c, t).wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (frame_rows, 128), 1)

        def build(span_vmem, phase):
            def _build():
                return jnp.stack([
                    _extract_rolled(span_vmem, lane, phase + f * hop, frame_rows)
                    for f in range(FFT_TILE_R)
                ])

            return _build

        phase_idx = jax.lax.rem(flat_of(c, t), 1024) // phase_g

        def extract(span_vmem):
            return jax.lax.switch(phase_idx,
                                  [build(span_vmem, p) for p in phases])

        frames = jax.lax.cond(slot == 0,
                              lambda: extract(span_a),
                              lambda: extract(span_b))
        frames = frames.reshape(FFT_TILE_R, n_fft)
        out_ref[:] = _fft_power_body(frames, window_ref, w2r_ref, w2i_ref,
                                     w1r_ref, w1i_ref, twr_ref, twi_ref,
                                     n1, n2, precision)

    return kernel


def _rollraw_layout(cfg: SpectrogramConfig, n_signals: int, n_samples: int):
    """Static geometry of the raw-read roll kernel, or None if ineligible."""
    import math

    n_fft, hop = cfg.nfft, cfg.hop_size
    if n_samples % 128 != 0 or n_fft < 32768:
        return None
    pad = n_fft // 2
    ts = FFT_TILE_R * hop
    n_frames = 1 + n_samples // hop
    n_tiles = pl.cdiv(n_frames, FFT_TILE_R)
    span_len = 1024 + (FFT_TILE_R - 1) * hop + n_fft
    span_len += (-span_len) % 1024
    t_lo = -(-pad // ts)  # first tile whose span never enters the left pad
    t_hi = (n_samples - span_len) // ts
    if t_hi < t_lo:  # too short: no interior tiles, use the legacy path
        return None
    phase_g = math.gcd(1024, math.gcd(n_samples % 1024 or 1024,
                                      math.gcd(ts % 1024 or 1024,
                                               pad % 1024 or 1024)))
    # Left buffer: logical [-pad, -pad + L_len) per signal.
    l_len = (t_lo - 1) * ts + span_len
    stride_l = l_len + ((-l_len) % 1024)
    # Right buffer: logical [R0, R0 + R_len), R0 = (t_hi+1)*ts - pad.
    r0 = (t_hi + 1) * ts - pad
    r_len = (n_tiles - 1 - t_hi) * ts + span_len
    stride_r = r_len + ((-r_len) % 1024)
    return dict(pad=pad, ts=ts, n_frames=n_frames, n_tiles=n_tiles,
                span_len=span_len, t_lo=t_lo, t_hi=t_hi, phase_g=phase_g,
                l_len=l_len, stride_l=stride_l, r0=r0, r_len=r_len,
                stride_r=stride_r)


def stft_power_from_waveform_raw_pallas(
    waveforms: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    interpret=None,
    precision=None,
    trim: bool = True,
):
    """Raw-read variant of :func:`stft_power_from_waveform_pallas`: interior
    tiles DMA straight from the unpadded waveform; only two small edge
    buffers (reflect pad regions) are built in XLA.  Caller must check
    :func:`_rollraw_layout` eligibility (production 60 s clips qualify)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_signals, n_samples = waveforms.shape
    geo = _rollraw_layout(cfg, n_signals, n_samples)
    assert geo is not None, "ineligible shape for the raw-read roll kernel"
    n_fft, hop = cfg.nfft, cfg.hop_size
    pad, ts = geo["pad"], geo["ts"]

    w = waveforms.astype(jnp.float32)
    raw = w.reshape(-1, 128)

    # Left edge: [reflect(pad) | head of the signal], zero-padded to stride.
    left = jnp.concatenate(
        [jnp.flip(w[:, 1:pad + 1], axis=1), w[:, : geo["l_len"] - pad]], axis=1)
    left = jnp.pad(left, ((0, 0), (0, geo["stride_l"] - left.shape[1])))
    left = left.reshape(-1, 128)
    # Right edge: [tail from R0 | reflect(pad)], zero-padded to stride.
    tail = jnp.concatenate(
        [w[:, geo["r0"]:], jnp.flip(w[:, n_samples - pad - 1:n_samples - 1], axis=1)],
        axis=1)
    tail = tail[:, : geo["r_len"]]
    tail = jnp.pad(tail, ((0, 0), (0, geo["stride_r"] - tail.shape[1])))
    right = tail.reshape(-1, 128)

    n1, n2, w2r, w2i, w1r, w1i, twr, twi, window = _fft_power_constants(
        n_fft, cfg.frame_size
    )
    consts = [jnp.asarray(window)[None, :], jnp.asarray(w2r), jnp.asarray(w2i),
              jnp.asarray(w1r), jnp.asarray(w1i), jnp.asarray(twr), jnp.asarray(twi)]
    const_specs = [
        pl.BlockSpec(c.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        for c in consts
    ]

    kernel = _make_wave_fft_power_kernel_rollraw(
        n_fft, n1, n2, hop, n_samples, geo["stride_l"], geo["stride_r"],
        geo["t_lo"], geo["t_hi"], geo["span_len"], geo["phase_g"], precision)

    n_tiles = geo["n_tiles"]
    span_scratch = pltpu.VMEM((geo["span_len"] // 128, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(n_signals, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # raw waveform, HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # left edge buffer
            pl.BlockSpec(memory_space=pltpu.ANY),  # right edge buffer
            *const_specs,
        ],
        out_specs=pl.BlockSpec(
            (FFT_TILE_R, n_fft), lambda c, t: (c * n_tiles + t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_signals * n_tiles * FFT_TILE_R, n_fft), jnp.float32
        ),
        scratch_shapes=[span_scratch, span_scratch,
                        pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_signals * n_tiles * FFT_TILE_R * (4 * n2 * n2 * n1 + 8 * n2 * n1 * n1),
            bytes_accessed=n_signals * n_tiles * (geo["span_len"] + FFT_TILE_R * n_fft) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(raw, left, right, *consts)
    out = out.reshape(n_signals, n_tiles * FFT_TILE_R, n_fft)
    return out[:, : geo["n_frames"]] if trim else out


def logmel_waveform_rolledge(
    waveforms: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    interpret=None,
    precision=None,
) -> jnp.ndarray:
    """Edge-specialized framing (impl='rolledge'): (n_signals, samples) f32
    -> (n_signals, n_frames, mel).

    The production 'roll' path pays a ~1.6 ms XLA pre-pass per 16x60 s batch
    (reflect pad + repack to a 1024-aligned stride); 'rollraw' removed it but
    paid more in-kernel (3-way predicated DMA on every tile — measured
    negative, ROADMAP.md).  This variant splits the GRID instead of
    branching the kernel:

      * interior tiles (the ~87%% whose spans lie inside the raw signal) run
        a branch-free kernel DMAing straight from the unpadded waveform
        (:func:`_make_wave_fft_power_kernel_interior`) — no pre-pass at all;
      * edge tiles run the PROVEN roll kernel over two small repacked strips
        per signal ([reflect|head] and [tail|reflect]) whose pre-pass cost
        scales with the edge size only;
      * the pieces merge AFTER the mel stage, where rows are ~256x smaller —
        sidestepping the sliced-pallas-output composition hazard entirely
        (power arrays feed the mel kernel with full padded rows, exactly
        like production; see the MISCOMPILE note in logmel_waveform_pallas).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_signals, n_samples = waveforms.shape
    geo = _rollraw_layout(cfg, n_signals, n_samples)
    assert geo is not None, "rolledge needs n_samples % 128 == 0, nfft >= 32768"
    n_fft, hop = cfg.nfft, cfg.hop_size
    pad, ts, span_len = geo["pad"], geo["ts"], geo["span_len"]
    t_lo, t_hi, n_tiles = geo["t_lo"], geo["t_hi"], geo["n_tiles"]
    n_frames = geo["n_frames"]
    w = waveforms.astype(jnp.float32)

    n1, n2, w2r, w2i, w1r, w1i, twr, twi, window = _fft_power_constants(
        n_fft, cfg.frame_size
    )
    consts = [jnp.asarray(window)[None, :], jnp.asarray(w2r), jnp.asarray(w2i),
              jnp.asarray(w1r), jnp.asarray(w1i), jnp.asarray(twr), jnp.asarray(twi)]
    const_specs = [
        pl.BlockSpec(c.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        for c in consts
    ]
    span_slot = pltpu.VMEM((span_len // 128, 128), jnp.float32)
    scratch = [span_slot, span_slot,
               pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())]

    # --- interior tiles: straight from the raw waveform --------------------
    n_int = t_hi - t_lo + 1
    kernel_i = _make_wave_fft_power_kernel_interior(
        n_fft, n1, n2, hop, n_samples, t_lo, span_len, geo["phase_g"],
        precision)
    p_int = pl.pallas_call(
        kernel_i,
        grid=(n_signals, n_int),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), *const_specs],
        out_specs=pl.BlockSpec(
            (FFT_TILE_R, n_fft), lambda c, t: (c * n_int + t, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_signals * n_int * FFT_TILE_R, n_fft), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_signals * n_int * FFT_TILE_R * (4 * n2 * n2 * n1 + 8 * n2 * n1 * n1),
            bytes_accessed=n_signals * n_int * (span_len + FFT_TILE_R * n_fft) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(w.reshape(-1, 128), *consts)

    # --- edge tiles: proven roll kernel over two small strips per signal ---
    m_l, m_r = t_lo, n_tiles - 1 - t_hi
    m_t = max(m_l, m_r)
    strip_stride = (m_t - 1) * ts + span_len
    strip_stride += (-strip_stride) % 1024
    left = jnp.concatenate(
        [jnp.flip(w[:, 1:pad + 1], axis=1), w[:, : geo["l_len"] - pad]], axis=1)
    left = jnp.pad(left, ((0, 0), (0, strip_stride - left.shape[1])))
    tail = jnp.concatenate(
        [w[:, geo["r0"]:],
         jnp.flip(w[:, n_samples - pad - 1:n_samples - 1], axis=1)], axis=1)
    tail = tail[:, :strip_stride]
    right = jnp.pad(tail, ((0, 0), (0, strip_stride - tail.shape[1])))
    strips = jnp.concatenate([left, right], axis=0)  # lefts then rights

    phase_step = ts % 1024
    phases = []
    p = 0
    while True:
        phases.append(p)
        p = (p + phase_step) % 1024
        if p == 0:
            break
    kernel_e = _make_wave_fft_power_kernel_roll(
        n_fft, n1, n2, hop, strip_stride, span_len, phases, precision)
    p_edge = pl.pallas_call(
        kernel_e,
        grid=(2 * n_signals, m_t),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), *const_specs],
        out_specs=pl.BlockSpec(
            (FFT_TILE_R, n_fft), lambda c, t: (c * m_t + t, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (2 * n_signals * m_t * FFT_TILE_R, n_fft), jnp.float32),
        scratch_shapes=list(scratch),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(strips.reshape(-1, 128), *consts)

    # --- mel on each piece (full padded rows in, slice at the very end),
    # then merge the SMALL mel arrays per signal ----------------------------
    mel_i = _folded_mel_from_power(p_int, cfg, interpret)
    mel_e = _folded_mel_from_power(p_edge, cfg, interpret)
    mel_i = mel_i.reshape(n_signals, n_int * FFT_TILE_R, cfg.mel_bins)
    mel_e = mel_e.reshape(2, n_signals, m_t * FFT_TILE_R, cfg.mel_bins)
    full = jnp.concatenate(
        [mel_e[0][:, : m_l * FFT_TILE_R], mel_i,
         mel_e[1][:, : m_r * FFT_TILE_R]], axis=1)
    return full[:, :n_frames]


def _roll_prepass(waveforms: jnp.ndarray, cfg: SpectrogramConfig):
    """Shared XLA pre-pass of the roll-framed kernels: reflect-pad each
    signal, lay signals out 1024-aligned in one flat f32 buffer, and compute
    the kernel's static span geometry.  Returns
    ``(flat_wave, n_frames, n_tiles, s_pad, span_len, phases)``."""
    n_fft, hop = cfg.nfft, cfg.hop_size
    n_signals, n_samples = waveforms.shape
    n_frames = 1 + n_samples // hop
    n_tiles = pl.cdiv(n_frames, FFT_TILE_R)

    tile_stride = FFT_TILE_R * hop
    phase_step = tile_stride % 1024
    phases = []
    p = 0
    while True:
        phases.append(p)
        p = (p + phase_step) % 1024
        if p == 0:
            break
    span_len = 1024 + (FFT_TILE_R - 1) * hop + n_fft
    span_len += (-span_len) % 1024

    pad = n_fft // 2
    # NOTE a zeros-buffer + three .at[].set() formulation of this pre-pass
    # (hoping XLA fuses the updates into one pass) measured WORSE on
    # hardware: 15.2 vs 13.3 ms full path per 16x60 s batch — the update
    # chain does not fuse.  The jnp.pad chain below stands.
    needed = (n_tiles * FFT_TILE_R - 1) * hop + n_fft + 1024
    wave = jnp.pad(waveforms.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    s_pad = max(needed, wave.shape[1])
    s_pad += (-s_pad) % 1024  # signals start 1024-aligned in the flat buffer
    wave = jnp.pad(wave, ((0, 0), (0, s_pad - wave.shape[1]))).reshape(-1)
    # The last tile's aligned span must fit.
    total_needed = (n_signals - 1) * s_pad + (n_tiles - 1) * tile_stride + span_len
    if total_needed > wave.shape[0]:
        wave = jnp.pad(wave, (0, total_needed - wave.shape[0]))
    wave = jnp.pad(wave, (0, (-wave.shape[0]) % 128))  # row-granular view below
    return wave, n_frames, n_tiles, s_pad, span_len, phases


def logmel_waveform_fused(
    waveforms: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    interpret=None,
    precision=None,
    mel_precision="bf16x4",
) -> jnp.ndarray:
    """Single-kernel featurizer (impl='fuse'): (n_signals, samples) ->
    (n_signals, n_frames, mel_bins) with the mel+log stage fused into the
    roll-framed FFT kernel (see :func:`_make_wave_fft_mel_kernel_roll`) —
    the power spectrum never exists in HBM, removing its ~760 MB/batch
    round-trip plus the second kernel launch.  Reference math:
    dataset/spectogram/preprocess.py:21-45.  Numerics match the production
    two-kernel path exactly (same dots, same accumulation order); the
    trim-after-mel rule is satisfied trivially (one kernel, trim at end).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_fft, hop = cfg.nfft, cfg.hop_size
    assert n_fft % TILE_K == 0, "fuse needs nfft % TILE_K == 0"
    n_signals, n_samples = waveforms.shape
    wave, n_frames, n_tiles, s_pad, span_len, phases = _roll_prepass(
        waveforms, cfg)
    wave = wave.reshape(-1, 128)

    n1, n2, w2r, w2i, w1r, w1i, twr, twi, window = _fft_power_constants(
        n_fft, cfg.frame_size
    )
    consts = [jnp.asarray(window)[None, :], jnp.asarray(w2r), jnp.asarray(w2i),
              jnp.asarray(w1r), jnp.asarray(w1i), jnp.asarray(twr), jnp.asarray(twi)]
    const_specs = [
        pl.BlockSpec(c.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        for c in consts
    ]
    fb = jnp.asarray(_folded_filterbank(cfg, n_fft))
    fb_spec = pl.BlockSpec(fb.shape, lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)

    kernel = _make_wave_fft_mel_kernel_roll(
        n_fft, n1, n2, hop, s_pad, span_len, phases, precision, mel_precision)

    total_tiles = n_signals * n_tiles
    n_groups = pl.cdiv(total_tiles, MEL_GROUP)
    group_rows = MEL_GROUP * FFT_TILE_R
    span_slot = pltpu.VMEM((span_len // 128, 128), jnp.float32)
    scratch = [span_slot, span_slot,
               pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
               pltpu.VMEM((group_rows, n_fft), jnp.float32)]

    # Resident filterbank (16 MB) + power group buffer (16 MB) + double
    # span slots + FFT constants ≈ 36 MB of scoped VMEM (v5e has headroom).
    mel_flops_pass = {"bf16x1": 1, "bf16x3": 3, None: 3}.get(mel_precision, 4)
    out = pl.pallas_call(
        kernel,
        grid=(n_signals, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # waveform stays in HBM
            *const_specs,
            fb_spec,
        ],
        out_specs=pl.BlockSpec(
            (group_rows, LANES),
            lambda c, t: ((c * n_tiles + t) // MEL_GROUP, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups * group_rows, LANES),
                                       jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=total_tiles * FFT_TILE_R * (
                4 * n2 * n2 * n1 + 8 * n2 * n1 * n1
                + 2 * n_fft * LANES * mel_flops_pass),
            bytes_accessed=total_tiles * span_len * 4
            + n_groups * group_rows * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(wave, *consts, fb)
    out = out[: total_tiles * FFT_TILE_R].reshape(
        n_signals, n_tiles * FFT_TILE_R, LANES)
    return out[:, :n_frames, : cfg.mel_bins]


def stft_power_from_waveform_pallas(
    waveforms: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    interpret=None,
    impl: str = "roll",
    precision=None,
    trim: bool = True,
):
    """(n_signals, samples) -> (n_signals, n_frames, n_fft) power, framed in-kernel.

    The waveform stays flat in HBM; each grid step DMAs its tile's
    1024-aligned enclosing span into VMEM and extracts the 8 overlapping
    frames with static slices (see module comment) — no (frames, n_fft)
    array is ever materialized in HBM.  Power bins come out in the kernel's
    flat (k2, k1) layout for :func:`_folded_mel_from_power`.

    ``impl='rollraw'`` selects the raw-read kernel
    (:func:`stft_power_from_waveform_raw_pallas`): interior tiles DMA from
    the unpadded waveform, skipping the ~1.6 ms reflect-pad/repack pre-pass.
    MEASURED NEGATIVE RESULT on v5e: same-process A/B 14.2 vs 13.3 ms per
    16x60 s batch — the 3-way source branching + dynamic phase cost more
    in-kernel than the XLA pre-pass they replace — so 'roll' (padded layout)
    stays the default.  ``impl='slice'`` keeps the historical slice-based
    kernel (interpreter only: Mosaic cannot lower its unaligned static
    extracts).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if impl == "rollraw":
        assert _rollraw_layout(cfg, *waveforms.shape) is not None, \
            "rollraw needs n_samples % 128 == 0 and nfft >= 32768"
        return stft_power_from_waveform_raw_pallas(waveforms, cfg, interpret,
                                                   precision, trim=trim)
    n_fft, hop = cfg.nfft, cfg.hop_size
    n_signals, n_samples = waveforms.shape
    wave, n_frames, n_tiles, s_pad, span_len, phases = _roll_prepass(
        waveforms, cfg)

    n1, n2, w2r, w2i, w1r, w1i, twr, twi, window = _fft_power_constants(
        n_fft, cfg.frame_size
    )
    consts = [jnp.asarray(window)[None, :], jnp.asarray(w2r), jnp.asarray(w2i),
              jnp.asarray(w1r), jnp.asarray(w1i), jnp.asarray(twr), jnp.asarray(twi)]
    const_specs = [
        pl.BlockSpec(c.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        for c in consts
    ]

    if impl.startswith("roll"):
        db = impl != "roll_nodb"
        kernel = _make_wave_fft_power_kernel_roll(
            n_fft, n1, n2, hop, s_pad, span_len, phases, precision,
            debug_frame_mode="aligned" if impl == "roll_aligned_debug" else "roll",
            double_buffer=db)
        wave = wave.reshape(-1, 128)  # row-granular DMA view
        # Two span slots + two DMA semaphores: the kernel double-buffers the
        # HBM->VMEM span copy across grid steps ('roll_nodb' keeps one slot).
        span_slot = pltpu.VMEM((span_len // 128, 128), jnp.float32)
        if db:
            scratch = [span_slot, span_slot,
                       pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())]
        else:
            scratch = [span_slot, pltpu.SemaphoreType.DMA(())]
        # Sequential order over BOTH grid dims so the cross-step prefetch
        # pipeline is well-defined.
        semantics = ("arbitrary", "arbitrary")
        # The second span slot puts the kernel ~0.6 MB over Mosaic's default
        # 16 MB scoped-vmem budget; raise the limit (v5e has headroom).
        vmem_limit = 32 * 1024 * 1024
    else:
        kernel = _make_wave_fft_power_kernel(
            n_fft, n1, n2, hop, s_pad, span_len, phases)
        scratch = [pltpu.VMEM((span_len,), jnp.float32),
                   pltpu.SemaphoreType.DMA(())]
        semantics = ("parallel", "arbitrary")
        vmem_limit = None

    out = pl.pallas_call(
        kernel,
        grid=(n_signals, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # waveform stays in HBM
            *const_specs,
        ],
        out_specs=pl.BlockSpec(
            (FFT_TILE_R, n_fft), lambda c, t: (c * n_tiles + t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_signals * n_tiles * FFT_TILE_R, n_fft), jnp.float32
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            **({"vmem_limit_bytes": vmem_limit} if vmem_limit else {}),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_signals * n_tiles * FFT_TILE_R * (4 * n2 * n2 * n1 + 8 * n2 * n1 * n1),
            bytes_accessed=n_signals * n_tiles * (span_len + FFT_TILE_R * n_fft) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(wave, *consts)
    out = out.reshape(n_signals, n_tiles * FFT_TILE_R, n_fft)
    return out[:, :n_frames] if trim else out


def logmel_waveform_pallas(
    waveforms: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    interpret=None,
    impl: str = "roll",
    precision=None,
    mel_precision=None,
) -> jnp.ndarray:
    """Fully fused featurizer from raw waveforms, framing included:
    (n_signals, samples) -> (n_signals, n_frames, mel_bins).

    ``impl='roll'`` (PRODUCTION): full-N real FFT with in-kernel roll framing
    and the hermitian-FOLDED mel kernel — hardware-fastest (13.3 ms per
    16x60 s batch on v5e).  ``impl='pack'`` / ``'eo'`` are the even/odd
    packed variants: numerically exact but MEASURED SLOWER (33.9 / 29 ms;
    see ROADMAP.md), kept as tested measurement records.  ``'rollraw'``
    skips the pad pre-pass (also slower, see
    :func:`stft_power_from_waveform_pallas`).  ``'fuse'`` runs mel+log as
    a grouped epilogue inside the FFT kernel (no power HBM round-trip,
    one launch): hardware BIT-EXACT vs 'roll' but measured 12.08 vs
    11.46 ms at parity / within-spread at turbo (FUSE_BENCH.json) — the
    round-trip it removes was already overlapped.  All impls keep framing
    traffic out of HBM — no (frames, n_fft) array ever exists there.
    ``precision=None`` = HIGHEST (parity); 'bf16x3'/'bf16x1' = the
    fast/turbo serving tiers (1.27x/1.71x end-to-end, score-fidelity record
    in benchmarks/FAST_FEATURIZER.json)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # NOTE the frame trim happens AFTER the mel kernel on every path below:
    # slicing the first pallas kernel's output to n_frames and reshaping it
    # into the second kernel's input MISCOMPILES on this TPU backend for some
    # batch geometries (hardware-observed at 11x20 s: power exact, mel fed
    # garbage — interpret mode and single-signal runs unaffected).  Feeding
    # the mel kernel the full padded tile rows (junk rows discarded after)
    # sidesteps the bad slice+reshape+pallas composition and is also
    # copy-free.  See benchmarks/parity_sweep.py for the regression check.
    n_frames_out = 1 + waveforms.shape[1] // cfg.hop_size
    if impl == "fuse":
        return logmel_waveform_fused(
            waveforms, cfg, interpret, precision,
            mel_precision if mel_precision else "bf16x4")
    if impl == "rolledge":
        return logmel_waveform_rolledge(waveforms, cfg, interpret, precision)
    if impl == "eo":
        power = stft_eo_power_from_waveform_pallas(waveforms, cfg, interpret,
                                                   precision, trim=False)
        n_signals, rows, mw = power.shape
        mel = _onesided_mel_from_power(
            power.reshape(n_signals * rows, mw), cfg, interpret)
        return mel.reshape(n_signals, rows, cfg.mel_bins)[:, :n_frames_out]
    if impl == "pack":
        zr, zi = stft_packed_from_waveform_pallas(waveforms, cfg, interpret,
                                                  precision, trim=False)
        n_signals, rows, m = zr.shape
        power = packed_power_onesided(zr, zi, cfg.nfft)
        mel = _onesided_mel_from_power(
            power.reshape(n_signals * rows, m + 1), cfg, interpret)
        return mel.reshape(n_signals, rows, cfg.mel_bins)[:, :n_frames_out]
    power = stft_power_from_waveform_pallas(waveforms, cfg, interpret, impl,
                                            precision, trim=False)
    n_signals, rows, n_fft = power.shape
    mel = _folded_mel_from_power(power.reshape(n_signals * rows, n_fft), cfg,
                                 interpret,
                                 mel_precision if mel_precision else "bf16x4")
    return mel.reshape(n_signals, rows, cfg.mel_bins)[:, :n_frames_out]


def _folded_mel_from_power(power, cfg: SpectrogramConfig, interpret,
                           mel_precision="bf16x4"):
    """K-tiled mel+log kernel over the hermitian-folded, layout-matched fb."""
    return _mel_from_power_fb(power, cfg, interpret, _folded_filterbank,
                              mel_precision)


def _onesided_mel_from_power(power, cfg: SpectrogramConfig, interpret,
                             mel_precision="bf16x4"):
    """K-tiled mel+log kernel over the one-sided tile-layout fb (packed path)."""
    return _mel_from_power_fb(power, cfg, interpret, _onesided_tile_filterbank,
                              mel_precision)


def _mel_from_power_fb(power, cfg: SpectrogramConfig, interpret, fb_fn,
                       mel_precision="bf16x4"):
    rows, k = power.shape
    k_tiles = pl.cdiv(k, TILE_K)
    k_padded = k_tiles * TILE_K
    r_tiles = pl.cdiv(rows, TILE_R)
    r_padded = r_tiles * TILE_R
    x = jnp.pad(power, ((0, r_padded - rows), (0, k_padded - k)))
    fb = jnp.asarray(fb_fn(cfg, k_padded))

    # Keep the whole fb resident in VMEM when it fits (vs re-streaming 16 MB
    # of fb per row tile — hardware-measured 1.86 -> ~0.7 ms on 16x60 s).
    fb_bytes = k_padded * LANES * 4
    resident = fb_bytes <= 24 * 1024 * 1024
    if resident:
        kernel = _make_mel_kernel_resident_fb(mel_precision)
        fb_spec = pl.BlockSpec((k_padded, LANES), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)
        params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=min(fb_bytes + 16 * 1024 * 1024, 100 * 1024 * 1024),
        )
    else:
        kernel = _make_mel_kernel(mel_precision)
        fb_spec = pl.BlockSpec((TILE_K, LANES), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM)
        params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        )

    out = pl.pallas_call(
        kernel,
        grid=(r_tiles, k_tiles),
        in_specs=[
            pl.BlockSpec((TILE_R, TILE_K), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            fb_spec,
        ],
        out_specs=pl.BlockSpec((TILE_R, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_padded, LANES), jnp.float32),
        compiler_params=params,
        interpret=interpret,
    )(x, fb)
    return out[:rows, : cfg.mel_bins]


def stft_power_pallas(
    frames: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    interpret=None,
    precision=None,
) -> jnp.ndarray:
    """(rows, n_fft) raw frames -> (rows, n_fft) power bins in kernel layout.

    Fuses window multiply, two-stage matmul rFFT, and |X|^2 in VMEM.  Output
    rows are ALL n_fft bins ordered flat = k2*n1 + k1 (spectral bin n2*k1+k2);
    combine with the folded filterbank via :func:`logmel_frames_pallas`.

    Default precision HIGHEST: the FFT's cancellation-heavy sums need the full
    3-way mantissa split (6 bf16 passes) to stay under 1e-4 dB on tonal
    signals — 2-way splits measure 1.9e-4 dB on the parity-sweep tonal
    family and up to ~0.5 dB in near-floor bins of dense sum-of-sines
    content, but their SCORE-level deviation is <=2.6e-5 sigmoid
    (FAST_FEATURIZER.json); pass 'bf16x3' (fast) or 'bf16x1' (turbo)
    explicitly for throughput-first serving.  The mel kernel, by contrast,
    is accumulation-friendly and runs bf16x4 by default (2.2e-5 dB measured
    with FFT at HIGHEST).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"  # CPU fallback for tests
    n_fft = cfg.nfft
    n1, n2, w2r, w2i, w1r, w1i, twr, twi, window = _fft_power_constants(
        n_fft, cfg.frame_size
    )
    if frames.dtype == jnp.int16:
        window = window / 32768.0  # exact PCM16 de-quantization fused in-kernel
    else:
        frames = frames.astype(jnp.float32)
    rows = frames.shape[0]
    r_tiles = pl.cdiv(rows, FFT_TILE_R)
    r_padded = r_tiles * FFT_TILE_R
    x = jnp.pad(frames, ((0, r_padded - rows), (0, 0)))

    consts = [jnp.asarray(window)[None, :], jnp.asarray(w2r), jnp.asarray(w2i),
              jnp.asarray(w1r), jnp.asarray(w1i), jnp.asarray(twr), jnp.asarray(twi)]
    const_specs = [pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim, memory_space=pltpu.VMEM)
                   for c in consts]

    out = pl.pallas_call(
        _make_fft_power_kernel(n_fft, n1, n2, precision),
        grid=(r_tiles,),
        in_specs=[
            pl.BlockSpec((FFT_TILE_R, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=pl.BlockSpec((FFT_TILE_R, n_fft), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_padded, n_fft), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=r_padded * (4 * n2 * n2 * n1 + 8 * n2 * n1 * n1),
            bytes_accessed=2 * r_padded * n_fft * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, *consts)
    return out[:rows]


def logmel_frames_pallas(
    frames: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    interpret=None,
    precision=None,
) -> jnp.ndarray:
    """Fully fused featurizer back half: (rows, n_fft) raw frames -> (rows, mel).

    Kernel 1: window+rFFT+power (VMEM-resident butterflies).
    Kernel 2: K-tiled MXU mel matmul over the hermitian-folded filterbank with
    the 10*log10 epilogue.
    ``precision``: None = parity mode (FFT at HIGHEST); 'bf16x3'/'bf16x1' =
    the fast/turbo serving tiers (benchmarks/FAST_FEATURIZER.json).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # MISCOMPILE-HAZARD discipline (ROADMAP.md): keep PADDED row counts
    # through the kernel chain and slice at the very end.  Pre-padding the
    # frame rows to the FFT tile makes stft_power_pallas's internal trim an
    # identity, so no sliced pallas output ever feeds the mel kernel (the
    # hardware-confirmed hazard composition at rows % 8 != 0 geometries).
    rows = frames.shape[0]
    r_padded = pl.cdiv(rows, FFT_TILE_R) * FFT_TILE_R
    frames = jnp.pad(frames, ((0, r_padded - rows), (0, 0)))
    power = stft_power_pallas(frames, cfg, interpret, precision)
    return _folded_mel_from_power(power, cfg, interpret)[:rows]


def power_to_logmel_pallas(
    power: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    interpret=None,
) -> jnp.ndarray:
    """(..., freq_bins) float32 power -> (..., mel_bins) float32 log-mel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"  # CPU fallback for tests
    lead = power.shape[:-1]
    k = power.shape[-1]
    rows = int(np.prod(lead)) if lead else 1
    x = power.reshape(rows, k).astype(jnp.float32)
    out = _mel_from_power_fb(x, cfg, interpret, _padded_filterbank)
    return out.reshape(lead + (cfg.mel_bins,))
