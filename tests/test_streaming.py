"""Streaming detector: incremental scores must exactly match offline
whole-recording inference for arbitrary chunkings."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sed_tpu.configs import SpectrogramConfig
from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
from sed_tpu.ops.featurizer import logmel_features
from sed_tpu.streaming import StreamingDetector
from sed_tpu.train.optim import make_optimizer
from sed_tpu.train.state import init_state

CFG = SpectrogramConfig(working_sample_rate=8000, time_margin=0.33)


def _model_state():
    model = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL)
    tx = make_optimizer(1e-3)
    sample = jnp.zeros((1, CFG.train_crop_size, CFG.mel_bins, 1))
    state = init_state(model, jax.random.key(0), sample, tx)
    return model, state


def _offline_scores(model, state, y):
    lm = np.asarray(logmel_features(jnp.asarray(y[:, None]), CFG))
    x = jnp.transpose(jnp.asarray(lm), (1, 2, 0))[None]
    logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, x, train=False
    )
    return np.asarray(jax.nn.sigmoid(logits))[0]


@pytest.mark.parametrize("seed,chunking", [(0, "random"), (1, "hop"), (2, "large")])
def test_streaming_matches_offline(seed, chunking):
    rng = np.random.default_rng(seed)
    seconds = 120
    y = (0.1 * rng.standard_normal(seconds * CFG.working_sample_rate)).astype(np.float32)
    model, state = _model_state()
    offline = _offline_scores(model, state, y)

    det = StreamingDetector(model, state.params, state.batch_stats, CFG,
                            halo=64, total_stride=8, bucket=64)
    pieces = []
    i = 0
    while i < len(y):
        if chunking == "random":
            n = int(rng.integers(1000, 40000))
        elif chunking == "hop":
            n = CFG.hop_size
        else:
            n = 8 * CFG.working_sample_rate
        pieces.append(det.push(y[i:i + n]))
        i += n
    pieces.append(det.flush())
    streamed = np.concatenate(pieces, axis=0)

    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=1e-5)


def test_streaming_emits_incrementally():
    rng = np.random.default_rng(3)
    y = (0.1 * rng.standard_normal(100 * CFG.working_sample_rate)).astype(np.float32)
    model, state = _model_state()
    det = StreamingDetector(model, state.params, state.batch_stats, CFG,
                            halo=64, total_stride=8, bucket=64)
    emitted_before_end = 0
    for i in range(0, len(y), 10 * CFG.working_sample_rate):
        out = det.push(y[i:i + 10 * CFG.working_sample_rate])
        emitted_before_end += len(out)
    assert emitted_before_end > 0  # scores flow before the stream ends
    det.flush()


def test_streaming_rejects_too_small_halo():
    model, state = _model_state()
    with pytest.raises(ValueError, match="receptive field"):
        StreamingDetector(model, state.params, state.batch_stats, CFG,
                          halo=8, total_stride=8)


def test_streaming_flush_short_stream_errors():
    model, state = _model_state()
    det = StreamingDetector(model, state.params, state.batch_stats, CFG,
                            halo=64, total_stride=8)
    det.push(np.zeros(100, np.float32))
    with pytest.raises(ValueError, match="stream too short"):
        det.flush()


def test_streaming_flush_with_hop_ge_half_nfft():
    """Regression (ADVICE r1): for configs where frame_size is a power of two,
    hop == nfft/2 and the raw-buffer trim could drop samples flush() needs for
    the end reflection.  The buffer must always retain >= pad+1 tail samples."""
    cfg = SpectrogramConfig(working_sample_rate=1600, time_margin=0.32)
    assert cfg.hop_size >= cfg.nfft // 2  # the regression precondition
    rng = np.random.default_rng(7)
    y = (0.1 * rng.standard_normal(40 * cfg.working_sample_rate)).astype(np.float32)

    model = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL)
    tx = make_optimizer(1e-3)
    sample = jnp.zeros((1, cfg.train_crop_size, cfg.mel_bins, 1))
    state = init_state(model, jax.random.key(0), sample, tx)

    lm = np.asarray(logmel_features(jnp.asarray(y[:, None]), cfg))
    x = jnp.transpose(jnp.asarray(lm), (1, 2, 0))[None]
    logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, x, train=False
    )
    offline = np.asarray(jax.nn.sigmoid(logits))[0]

    det = StreamingDetector(model, state.params, state.batch_stats, cfg,
                            halo=64, total_stride=8, bucket=64)
    pieces = []
    for i in range(0, len(y), 3 * cfg.working_sample_rate):
        pieces.append(det.push(y[i:i + 3 * cfg.working_sample_rate]))
    pieces.append(det.flush())  # raised a shape error before the fix
    streamed = np.concatenate(pieces, axis=0)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=1e-6)


def test_batched_streaming_matches_per_stream():
    """BatchedStreamingDetector: N lockstep streams, each bit-equal to its
    own single-stream run (and therefore to offline inference)."""
    from sed_tpu.streaming import BatchedStreamingDetector

    rng = np.random.default_rng(7)
    seconds, n_streams = 60, 3
    ys = (0.1 * rng.standard_normal(
        (n_streams, seconds * CFG.working_sample_rate))).astype(np.float32)
    model, state = _model_state()

    batched = BatchedStreamingDetector(model, state.params, state.batch_stats,
                                       CFG, batch=n_streams, halo=64,
                                       total_stride=8, bucket=64)
    singles = [StreamingDetector(model, state.params, state.batch_stats, CFG,
                                 halo=64, total_stride=8, bucket=64)
               for _ in range(n_streams)]

    chunk = 3 * CFG.working_sample_rate
    got, ref = [], [[] for _ in range(n_streams)]
    for i in range(0, ys.shape[1], chunk):
        got.append(batched.push(ys[:, i:i + chunk]))
        for s in range(n_streams):
            ref[s].append(singles[s].push(ys[s, i:i + chunk]))
    got.append(batched.flush())
    for s in range(n_streams):
        ref[s].append(singles[s].flush())

    got_full = np.concatenate([g for g in got if g.shape[1]], axis=1)
    for s in range(n_streams):
        ref_full = np.concatenate([r for r in ref[s] if len(r)], axis=0)
        np.testing.assert_array_equal(got_full[s], ref_full)


def test_streaming_int8_matches_offline_int8():
    """qparams streaming: incremental int8 scores == offline int8 scoring of
    the same featurized audio (the streaming exactness contract carries over
    to the quantized serving mode)."""
    from sed_tpu.models.quantize import quantize_cnn, quantized_scores

    rng = np.random.default_rng(5)
    y = (0.1 * rng.standard_normal(60 * CFG.working_sample_rate)).astype(np.float32)
    model, state = _model_state()

    lm = np.asarray(logmel_features(jnp.asarray(y[:, None]), CFG))
    x = jnp.transpose(jnp.asarray(lm), (1, 2, 0))[None]
    q = quantize_cnn(model, state.params, state.batch_stats, [np.asarray(x)])
    offline = np.asarray(quantized_scores(q, x))[0]

    det = StreamingDetector(model, state.params, state.batch_stats, CFG,
                            halo=64, total_stride=8, bucket=64, qparams=q)
    pieces = []
    i = 0
    while i < len(y):
        n = int(rng.integers(4000, 30000))
        pieces.append(det.push(y[i:i + n]))
        i += n
    pieces.append(det.flush())
    streamed = np.concatenate(pieces, axis=0)
    assert streamed.shape == offline.shape
    # Looser than the float contract (1e-5): the quantizer's round() is
    # discontinuous, so ~1e-6 featurizer fusion differences between the
    # streamed and offline graphs flip occasional activation LSBs (measured
    # max 6e-4 on 4.5% of frames) — still 100x inside the 0.05 int8-vs-f32
    # serving bound.
    np.testing.assert_allclose(streamed, offline, atol=5e-3)
