"""µ-law companded 8-bit ingest tier: half the wire bytes of int16 PCM.

The end-to-end serving rate when audio must cross a host->device link is
transfer-bound (benchmarks/README.md: e2e is ~92% of the raw link floor with
int16 PCM at 2 bytes/sample).  This module defines the repo-wide uint8 wire
format — G.711-style µ-law companding (µ=255, sign + 7-bit magnitude) — which
halves the bytes per sample at a *measured, lossy* fidelity cost
(benchmarks/MULAW_INGEST.json), analogous to the 'fast'/'turbo' featurizer
precision tiers and the int8 CNN serving mode.

Repo-wide dtype conventions on the featurizer ingest path:

  * ``int16``  means PCM16    — de-quantized by 1/32768 (CLAUDE.md invariant)
  * ``uint8``  means µ-law    — decoded by :func:`mulaw_decode` (this module)
  * ``float`` means waveform  — passed through as float32

Encoding (host, numpy): y = sign(x) * ln(1 + µ|x|)/ln(1 + µ); the byte is
sign-magnitude — bit 7 = sign, bits 0-6 = round(|y| * 127) — so silence
encodes to exactly 0x00 and decodes to exactly 0.0 (a rounded-offset binary
code would put a ~9e-5 DC pedestal under silent audio, which the log-mel
stage would amplify to a large dB shift in silent bins).

Decoding (device, jnp): |x| = expm1(|y| * ln(1 + µ)) / µ — elementwise VPU
work that XLA fuses into the featurizer's existing pad/reshape pre-pass; the
decode adds no measurable device time against the 2x wire saving (the e2e
path is >90% transfer-bound).

Fidelity: ~38 dB SQNR on full-scale content (constant *relative* error by
design — quiet audio keeps the same relative precision, unlike linear int8).
This is NOT the parity path: the golden-tested float/int16 pipeline is
untouched; uint8 is an opt-in serving wire format whose score-level deviation
is pinned by tests and measured on hardware.
"""

from __future__ import annotations

import numpy as np

MU = 255.0
_LOG1P_MU = float(np.log1p(MU))  # ln(256)


def mulaw_encode(x) -> np.ndarray:
    """Host-side encoder: waveform -> uint8 µ-law bytes (numpy).

    ``x``: float array in [-1, 1] (values are clipped) or int16 PCM16
    (de-quantized by 1/32768 first, the repo-wide int16 convention).
    Returns the same-shaped uint8 array: bit 7 = sign (1 = negative),
    bits 0-6 = round(|y| * 127) where y is the µ-law companded magnitude.
    """
    x = np.asarray(x)
    if x.dtype == np.int16:
        x = x.astype(np.float32) / 32768.0
    x = np.clip(np.asarray(x, np.float32), -1.0, 1.0)
    mag = np.log1p(MU * np.abs(x)) / _LOG1P_MU            # [0, 1]
    m7 = np.round(mag * 127.0).astype(np.uint8)           # [0, 127]
    sign = (x < 0).astype(np.uint8) << 7
    return sign | m7


def mulaw_decode(u8):
    """Device-side decoder: uint8 µ-law bytes -> float32 waveform (jnp).

    Inverse of :func:`mulaw_encode` at the 128 magnitude code points:
    |x| = expm1((m7/127) * ln(1+µ)) / µ, sign from bit 7.  Elementwise;
    safe inside jit on every backend (no complex dtype, no gather).
    """
    import jax.numpy as jnp

    u8 = jnp.asarray(u8)
    if u8.dtype != jnp.uint8:
        raise TypeError(f"mulaw_decode expects uint8, got {u8.dtype}")
    m7 = (u8 & jnp.uint8(0x7F)).astype(jnp.float32) / 127.0
    mag = jnp.expm1(m7 * _LOG1P_MU) / MU
    sign = jnp.where((u8 & jnp.uint8(0x80)) != 0, -1.0, 1.0)
    return (sign * mag).astype(jnp.float32)


def mulaw_decode_np(u8: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`mulaw_decode` for host-side tooling/tests."""
    u8 = np.asarray(u8)
    if u8.dtype != np.uint8:
        raise TypeError(f"mulaw_decode_np expects uint8, got {u8.dtype}")
    m7 = (u8 & 0x7F).astype(np.float32) / 127.0
    mag = np.expm1(m7.astype(np.float64) * _LOG1P_MU) / MU
    sign = np.where((u8 & 0x80) != 0, -1.0, 1.0)
    return (sign * mag).astype(np.float32)
