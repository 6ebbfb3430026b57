"""µ-law uint8 ingest tier (ops/mulaw.py) + the raw AOT loader.

The uint8 wire format halves host->device bytes for the transfer-bound
serving path (VERDICT r3 Weak #3).  These tests pin the codec itself
(golden code points, exact zero, SNR, monotonicity), the repo-wide dtype
convention (uint8 means µ-law on every featurizer path), and the AOT
artifact plumbing (uint8 pipeline round-trip, float->µ-law host bridge,
load_aot_fn raw calls).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sed_tpu.configs import SpectrogramConfig
from sed_tpu.ops.mulaw import MU, mulaw_decode, mulaw_decode_np, mulaw_encode

CFG = SpectrogramConfig(working_sample_rate=8000, time_margin=0.33)


def test_zero_and_fullscale_are_exact():
    # Sign-magnitude layout: silence is code 0x00 and decodes to exactly 0.0
    # (a biased binary code would put a DC pedestal under silence, which
    # log-mel would blow up into a large dB shift in silent bins).
    assert mulaw_encode(np.zeros(4, np.float32)).tolist() == [0, 0, 0, 0]
    assert mulaw_decode_np(np.zeros(4, np.uint8)).tolist() == [0.0] * 4
    # +/- full scale hit the extreme codes and decode back to exactly +/-1:
    # expm1(ln(1+mu))/mu == 1.
    assert mulaw_encode(np.float32([1.0]))[0] == 127
    assert mulaw_encode(np.float32([-1.0]))[0] == 0x80 | 127
    np.testing.assert_array_equal(
        mulaw_decode_np(np.uint8([127, 0x80 | 127])), [1.0, -1.0])


def test_golden_codepoints():
    # Independent recomputation of the companding law at arbitrary points.
    for x in (0.5, -0.5, 0.01, -0.2, 0.9, 1.5, -2.0):  # incl. clipped inputs
        xc = min(1.0, max(-1.0, x))
        y = math.log1p(MU * abs(xc)) / math.log1p(MU)
        m7 = int(round(y * 127.0))
        want = (0x80 if xc < 0 else 0) | m7
        assert int(mulaw_encode(np.float32([x]))[0]) == want, x
        back = math.copysign(math.expm1(m7 / 127.0 * math.log1p(MU)) / MU, xc)
        assert abs(float(mulaw_decode_np(np.uint8([want]))[0]) - back) < 1e-7


def test_int16_convention_matches_float():
    # int16 means PCM16 on every path: encoding int16 == encoding x/32768.
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(2048) * 12000).astype(np.int16)
    np.testing.assert_array_equal(
        mulaw_encode(pcm), mulaw_encode(pcm.astype(np.float32) / 32768.0))


def test_roundtrip_snr_constant_relative():
    # ~38 dB SQNR on a full-scale sine, and — the point of companding —
    # roughly the SAME relative precision 20 dB down (linear int8 would lose
    # 20 dB of SNR there).
    t = np.arange(48000) / 48000.0
    for amp, floor in ((0.99, 36.0), (0.099, 33.0)):
        x = (amp * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        err = mulaw_decode_np(mulaw_encode(x)) - x
        snr = 10.0 * np.log10(float(np.sum(x**2)) / float(np.sum(err**2)))
        assert snr > floor, (amp, snr)


def test_decode_monotonic_and_symmetric():
    m = np.arange(128, dtype=np.uint8)
    pos = mulaw_decode_np(m)
    assert np.all(np.diff(pos) > 0)
    neg = mulaw_decode_np(m | 0x80)
    np.testing.assert_array_equal(neg, -pos)


def test_jnp_decode_matches_numpy():
    codes = np.arange(256, dtype=np.uint8)
    # (the numpy twin accumulates in f64; 5e-7 covers f32 expm1 rounding)
    np.testing.assert_allclose(np.asarray(mulaw_decode(codes)),
                               mulaw_decode_np(codes), atol=5e-7)
    with pytest.raises(TypeError):
        mulaw_decode(np.zeros(4, np.int16))


def test_featurizer_uint8_path_equals_decoded_float():
    # uint8 into the featurizer == explicit device decode then float path,
    # on both the per-recording and batched entry points.
    from sed_tpu.ops.featurizer import ingest_to_f32, logmel_features_batch

    rng = np.random.default_rng(1)
    sec = 2
    pcm = (rng.standard_normal((2, CFG.working_sample_rate * sec, 1))
           * 9000).astype(np.int16)
    u8 = mulaw_encode(pcm)
    via_u8 = np.asarray(logmel_features_batch(jnp.asarray(u8), CFG))
    dec = jax.jit(ingest_to_f32)(jnp.asarray(u8))
    via_f32 = np.asarray(logmel_features_batch(dec, CFG))
    np.testing.assert_array_equal(via_u8, via_f32)

    # The lossy tier stays recognizably close to the exact int16 features on
    # active content (codec SQNR ~38 dB); this is a sanity band, the real
    # fidelity contract is score-level and hardware-measured
    # (benchmarks/MULAW_INGEST.json).
    exact = np.asarray(logmel_features_batch(jnp.asarray(pcm), CFG))
    active = exact > (exact.max() - 40.0)
    assert float(np.abs((via_u8 - exact)[active]).max()) < 3.0


def test_aot_uint8_pipeline_and_raw_loader():
    # The serving artifact compiles with a uint8 µ-law input spec; the host
    # bridge encodes float/int16 audio transparently; load_aot_fn returns
    # the raw device-level callable used by the AOT-first bench.
    from sed_tpu.export import (aot_export_pipeline, cnn_serving, load_aot_fn,
                                load_aot_pipeline)
    from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
    from sed_tpu.ops.featurizer import logmel_features_batch

    model = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL)
    B, sec = 2, 2
    samples = CFG.working_sample_rate * sec
    rng = np.random.default_rng(2)
    pcm = (rng.standard_normal((B, samples, 1)) * 9000).astype(np.int16)
    u8 = mulaw_encode(pcm)

    frames = 1 + samples // CFG.hop_size
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, frames, CFG.mel_bins, 1)),
                           train=False)
    score_fn, weights = cnn_serving(model, variables["params"],
                                    variables["batch_stats"])
    blob = aot_export_pipeline(score_fn, weights, B, samples, CFG,
                               pcm_dtype=jnp.uint8, use_pallas=False)

    feats = logmel_features_batch(jnp.asarray(u8), CFG)
    ref = np.asarray(jax.nn.sigmoid(model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.transpose(feats, (0, 2, 3, 1)), train=False)))

    call = load_aot_pipeline(blob)
    np.testing.assert_allclose(call(u8), ref, atol=1e-6)   # native uint8
    np.testing.assert_allclose(call(pcm), ref, atol=1e-6)  # int16 -> encode
    np.testing.assert_allclose(                            # float -> encode
        call(pcm.astype(np.float32) / 32768.0), ref, atol=1e-6)

    raw = load_aot_fn(blob)
    assert raw.input_dtype == "uint8"
    out = raw(jnp.asarray(u8))  # device array in, device array out
    assert isinstance(out, jax.Array)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)
