"""TPU-native STFT with librosa-exact semantics.

The reference computes per-channel spectrograms with
``librosa.core.stft(y, n_fft=32768, win_length=31680, hop_length=15840,
window=np.hanning(31680), center=True, dtype=complex64, pad_mode='reflect')``
(reference: dataset/spectogram/preprocess.py:21-36).  That call's exact
semantics, re-derived here for XLA:

  1. the *symmetric* Hann window ``np.hanning(win_length)`` (NOT librosa's
     default periodic Hann) is zero-padded centered into the n_fft buffer
     (left pad = (n_fft - win_length) // 2 = 544);
  2. the signal is reflect-padded by n_fft//2 on both sides;
  3. frames of length n_fft are taken every hop samples:
     n_frames = 1 + len(y) // hop;
  4. each frame is windowed and transformed with a real FFT -> n_fft//2 + 1
     complex bins.

Two FFT backends:
  * ``fft_impl='fft'``    — XLA's native FFT op (fastest path).
  * ``fft_impl='matmul'`` — a Cooley-Tukey two-stage matmul rFFT that runs the
    butterflies as MXU matmuls in float32 with HIGHEST precision.  This exists
    because XLA:TPU's large-size FFT can lose precision; the matmul
    decomposition keeps the 1e-4 librosa-parity budget on-device, and the
    stage shapes (128/256-point DFT matrices) map directly onto the MXU.
"""

from __future__ import annotations

import functools
from typing import Literal

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sed_tpu.configs import SpectrogramConfig, DEFAULT_SPECTROGRAM


def symmetric_hann(win_length: int) -> np.ndarray:
    """np.hanning: 0.5 - 0.5*cos(2*pi*n/(N-1)), zero-valued at both endpoints."""
    n = np.arange(win_length, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / (win_length - 1))


@functools.lru_cache(maxsize=8)
def padded_window(win_length: int, n_fft: int) -> np.ndarray:
    """Symmetric Hann centered in an n_fft-length zero buffer (float32)."""
    w = symmetric_hann(win_length)
    lpad = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=np.float64)
    out[lpad:lpad + win_length] = w
    return out.astype(np.float32)


def num_frames(n_samples: int, hop: int) -> int:
    """Frame count for a center-padded STFT: 1 + floor(n / hop)."""
    return 1 + n_samples // hop


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(samples,) -> (n_frames, n_fft) reflect-padded overlapping frames.

    Built from hop-sized blocks with shifted slicing instead of a
    (n_frames, n_fft) gather: frame t spans blocks [t, t+k) of the padded
    signal, so k leading-axis slices + one concatenate produce all frames.
    Slices/reshapes lower to cheap XLA ops where a multi-million-element
    gather index matrix is slow to compile and execute on TPU.
    """
    n = y.shape[0]
    pad = n_fft // 2
    ypad = jnp.pad(y, (pad, pad), mode="reflect")
    nf = num_frames(n, hop)
    k = -(-n_fft // hop)  # blocks spanned by one frame
    total_blocks = max(nf + k - 1, -(-ypad.shape[0] // hop))
    ypad = jnp.pad(ypad, (0, total_blocks * hop - ypad.shape[0]))
    blocks = ypad.reshape(total_blocks, hop)
    parts = [blocks[i:i + nf] for i in range(k)]  # k x (n_frames, hop)
    frames = jnp.concatenate(parts, axis=1)
    return frames[:, :n_fft]


# ---------------------------------------------------------------------------
# Matmul rFFT: N = N1 * N2 Cooley-Tukey with DFT stages as MXU matmuls.
# ---------------------------------------------------------------------------

def _dft_matrix(n: int) -> np.ndarray:
    """(n, n) complex128 DFT matrix W[k, m] = exp(-2j*pi*k*m/n)."""
    k = np.arange(n)
    return np.exp(-2j * np.pi * np.outer(k, k) / n)


@functools.lru_cache(maxsize=4)
def _matmul_fft_constants(n_fft: int):
    """Precompute split-radix constants for the two-stage matmul FFT.

    Balanced factorization n_fft = n1 * n2 with n1 ~ n2 ~ sqrt(n_fft): at the
    packed production size (m = 16384) both DFT stages become 128x128 matmuls
    that exactly fill the MXU systolic array (a lopsided 256x64 split measured
    ~2x slower).  For odd log2 sizes the SMALLER factor goes to n1 (the outer
    stage): real-input callers run the inner stage as 2 real matmuls but the
    outer as 4 (complex x complex), so FLOPs = 4*N*n2 + 8*N*n1 — putting the
    larger factor on the 2-matmul inner stage is a 1.25x FLOP cut at
    n_fft = 32768 (n1=128, n2=256 vs the reverse).  Returns float32
    real/imag parts.
    """
    k = int(np.log2(n_fft))
    assert 2 ** k == n_fft, f"matmul FFT requires power-of-two size, got {n_fft}"
    n1 = 2 ** (k // 2)
    n2 = n_fft // n1
    w2 = _dft_matrix(n2)                       # inner stage (n2, n2)
    w1 = _dft_matrix(n1)                       # outer stage (n1, n1)
    # Twiddles W_N^{n1_idx * k2} with shape (n2 outputs k2, n1 columns).
    k2 = np.arange(n2)[:, None]
    n1_idx = np.arange(n1)[None, :]
    tw = np.exp(-2j * np.pi * k2 * n1_idx / n_fft)  # (n2, n1)

    def f32(c):
        return (c.real.astype(np.float32), c.imag.astype(np.float32))

    return n1, n2, f32(w2), f32(w1), f32(tw)


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cfft_matmul(xr: jnp.ndarray, xi: jnp.ndarray, m: int):
    """Complex FFT of length m on (real, imag) float32 arrays via two
    Cooley-Tukey stages, each a small dense MXU matmul (HIGHEST precision)."""
    n1, n2, (w2r, w2i), (w1r, w1i), (twr, twi) = _matmul_fft_constants(m)
    batch = xr.shape[:-1]
    xr = xr.reshape(batch + (n2, n1))
    xi = xi.reshape(batch + (n2, n1))

    hi = jax.lax.Precision.HIGHEST
    w2r, w2i = jnp.asarray(w2r), jnp.asarray(w2i)
    # Inner DFT over n2: Y[k2, n1] = sum_n2 W2[k2, n2] x[n2, n1] (complex).
    yr = (jnp.einsum("kn,...nm->...km", w2r, xr, precision=hi)
          - jnp.einsum("kn,...nm->...km", w2i, xi, precision=hi))
    yi = (jnp.einsum("kn,...nm->...km", w2r, xi, precision=hi)
          + jnp.einsum("kn,...nm->...km", w2i, xr, precision=hi))
    # Twiddle (elementwise on (k2, n1)).
    yr, yi = _cmul(yr, yi, jnp.asarray(twr), jnp.asarray(twi))
    # Outer DFT over n1: X[k2, k1] = sum_n1 Y[k2, n1] W1[n1, k1].
    w1r, w1i = jnp.asarray(w1r), jnp.asarray(w1i)
    zr = (jnp.einsum("...km,ml->...kl", yr, w1r, precision=hi)
          - jnp.einsum("...km,ml->...kl", yi, w1i, precision=hi))
    zi = (jnp.einsum("...km,ml->...kl", yr, w1i, precision=hi)
          + jnp.einsum("...km,ml->...kl", yi, w1r, precision=hi))
    # X[n2*k1 + k2] = Z[k2, k1] -> transpose to (k1, k2) and flatten.
    zr = jnp.swapaxes(zr, -1, -2).reshape(batch + (m,))
    zi = jnp.swapaxes(zi, -1, -2).reshape(batch + (m,))
    return zr, zi


@functools.lru_cache(maxsize=4)
def _rfft_unpack_constants(n_fft: int):
    """cos/sin twiddles for the even/odd rFFT unpack, k = 0..n_fft//2-1."""
    k = np.arange(n_fft // 2)
    theta = -2.0 * np.pi * k / n_fft
    return np.cos(theta).astype(np.float32), np.sin(theta).astype(np.float32)


def rfft_matmul_realimag(frames: jnp.ndarray, n_fft: int):
    """Real FFT of (..., n_fft) frames as MXU matmuls, complex-free.

    Classic even/odd packing: z[n] = x[2n] + i*x[2n+1] of length M = n_fft/2
    goes through a two-stage matmul complex FFT (half the work of a length-N
    transform), then the hermitian unpack recovers the N//2+1 real-input bins:
      E[k] = (Z[k] + conj(Z[M-k]))/2,  O[k] = (Z[k] - conj(Z[M-k]))/(2i),
      X[k] = E[k] + W_N^k O[k],        X[M] = E[0] - O[0].
    Returns (real, imag) float32 arrays of shape (..., n_fft//2 + 1).
    Complex-free on purpose: the axon TPU backend in this environment does not
    implement complex dtypes, and the downstream featurizer only needs |X|^2.
    """
    m = n_fft // 2
    batch = frames.shape[:-1]
    x = frames.astype(jnp.float32).reshape(batch + (m, 2))
    zr, zi = _cfft_matmul(x[..., 0], x[..., 1], m)

    # conj(Z[(M-k) mod M]): index 0 stays, the rest reversed (flip, not gather).
    zrev_r = jnp.concatenate([zr[..., :1], jnp.flip(zr[..., 1:], axis=-1)], axis=-1)
    zrev_i = -jnp.concatenate([zi[..., :1], jnp.flip(zi[..., 1:], axis=-1)], axis=-1)

    er = 0.5 * (zr + zrev_r)
    ei = 0.5 * (zi + zrev_i)
    # O = (Z - conj(Zrev)) / (2i).
    nr = zr - zrev_r
    ni = zi - zrev_i
    orr = 0.5 * ni
    oi = -0.5 * nr

    c, s = _rfft_unpack_constants(n_fft)
    c, s = jnp.asarray(c), jnp.asarray(s)
    xr = er + c * orr - s * oi
    xi = ei + c * oi + s * orr
    # Nyquist bin X[M] = E[0] - O[0] (purely real).
    xr = jnp.concatenate([xr, (er[..., :1] - orr[..., :1])], axis=-1)
    xi = jnp.concatenate([xi, jnp.zeros_like(xi[..., :1])], axis=-1)
    return xr, xi


def rfft_matmul(frames: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Complex-output wrapper over :func:`rfft_matmul_realimag` (host/CPU use)."""
    re, im = rfft_matmul_realimag(frames, n_fft)
    return lax.complex(re, im)


def default_fft_impl() -> str:
    """'fft' where XLA has a native FFT; 'matmul' on TPU backends without
    complex support (this environment's axon plugin)."""
    return "matmul" if jax.default_backend() == "tpu" else "fft"


def _windowed_frames(y: jnp.ndarray, cfg: SpectrogramConfig) -> jnp.ndarray:
    frames = frame_signal(y.astype(jnp.float32), cfg.nfft, cfg.hop_size)
    return frames * jnp.asarray(padded_window(cfg.frame_size, cfg.nfft))


def stft_realimag(
    y: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    fft_impl: Literal["fft", "matmul", "auto"] = "auto",
):
    """Complex-free STFT: (samples,) -> ((frames, bins) real, (frames, bins) imag)."""
    if fft_impl == "auto":
        fft_impl = default_fft_impl()
    frames = _windowed_frames(y, cfg)
    if fft_impl == "matmul":
        return rfft_matmul_realimag(frames, cfg.nfft)
    spec = jnp.fft.rfft(frames, n=cfg.nfft, axis=-1)
    return jnp.real(spec).astype(jnp.float32), jnp.imag(spec).astype(jnp.float32)


def stft(
    y: jnp.ndarray,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    fft_impl: Literal["fft", "matmul", "auto"] = "fft",
) -> jnp.ndarray:
    """Single-channel STFT: (samples,) -> (n_frames, n_fft//2+1) complex64.

    Output is already transposed to frames-major like the reference's ``.T``
    (preprocess.py:34).  Complex output — use :func:`stft_realimag` on TPU
    backends without complex support.
    """
    if fft_impl == "auto":
        fft_impl = default_fft_impl()
    frames = _windowed_frames(y, cfg)
    if fft_impl == "matmul":
        return rfft_matmul(frames, cfg.nfft)
    return jnp.fft.rfft(frames, n=cfg.nfft, axis=-1).astype(jnp.complex64)
