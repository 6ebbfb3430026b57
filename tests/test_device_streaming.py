"""Device-resident streaming: equality with the host streaming classes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sed_tpu.configs import SpectrogramConfig
from sed_tpu.device_streaming import DeviceStreamingDetector
from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
from sed_tpu.streaming import BatchedStreamingDetector
from sed_tpu.train.optim import make_optimizer
from sed_tpu.train.state import init_state

CFG = SpectrogramConfig(working_sample_rate=8000, time_margin=0.33)


def _model_state():
    model = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL)
    tx = make_optimizer(1e-3)
    sample = jnp.zeros((1, CFG.train_crop_size, CFG.mel_bins, 1))
    state = init_state(model, jax.random.key(0), sample, tx)
    return model, state


def _run_pair(ys, chunk, dtype=np.float32, seconds_pushed=None):
    model, state = _model_state()
    B = ys.shape[0]
    ref = BatchedStreamingDetector(model, state.params, state.batch_stats,
                                   CFG, batch=B, halo=64, total_stride=8,
                                   bucket=64)
    dev = DeviceStreamingDetector(model, state.params, state.batch_stats,
                                  CFG, batch=B, chunk_samples=chunk, halo=64,
                                  total_stride=8, bucket=64)
    r_out, d_out = [], []
    n = ys.shape[1] // chunk
    for i in range(n):
        c_f32 = ys[:, i * chunk:(i + 1) * chunk]
        if dtype == np.int16:
            c_i16 = (c_f32 * 32768.0).astype(np.int16)
            c_f32 = c_i16.astype(np.float32) / 32768.0
            d = dev.push(c_i16)
        else:
            d = dev.push(c_f32)
        r = ref.push(c_f32)
        assert r.shape == d.shape, (i, r.shape, d.shape)
        r_out.append(r)
        d_out.append(d)
    r_out.append(ref.flush())
    d_out.append(dev.flush())
    R = np.concatenate([r for r in r_out if r.shape[1]], axis=1)
    D = np.concatenate([d for d in d_out if d.shape[1]], axis=1)
    return R, D


@pytest.mark.parametrize("chunk_seconds", [1.0, 0.35])
def test_device_streaming_matches_host(chunk_seconds):
    rng = np.random.default_rng(0)
    B, sec = 2, 70
    ys = (0.1 * rng.standard_normal(
        (B, sec * CFG.working_sample_rate))).astype(np.float32)
    chunk = int(chunk_seconds * CFG.working_sample_rate)
    ys = ys[:, : (ys.shape[1] // chunk) * chunk]
    R, D = _run_pair(ys, chunk)
    assert R.shape == D.shape
    np.testing.assert_allclose(D, R, atol=1e-5)


def test_device_streaming_int16_input():
    rng = np.random.default_rng(1)
    B, sec = 2, 60
    ys = (0.1 * rng.standard_normal(
        (B, sec * CFG.working_sample_rate))).astype(np.float32)
    chunk = CFG.working_sample_rate
    R, D = _run_pair(ys, chunk, dtype=np.int16)
    assert R.shape == D.shape
    np.testing.assert_allclose(D, R, atol=1e-5)


def test_device_streaming_rejects_wrong_shape():
    model, state = _model_state()
    dev = DeviceStreamingDetector(model, state.params, state.batch_stats,
                                  CFG, batch=2, chunk_samples=8000, halo=64,
                                  total_stride=8, bucket=64)
    with pytest.raises(ValueError):  # explicit raise — survives python -O
        dev.push(np.zeros((2, 4000), np.float32))


def test_device_streaming_sharded_over_mesh():
    """Rings and chunks sharded over an 8-device data mesh: outputs equal the
    unsharded run (serving density scales over the mesh like batch infer)."""
    from sed_tpu.parallel.mesh import create_mesh

    rng = np.random.default_rng(5)
    B, sec = 8, 50
    ys = (0.1 * rng.standard_normal(
        (B, sec * CFG.working_sample_rate))).astype(np.float32)
    chunk = CFG.working_sample_rate
    model, state = _model_state()

    mesh = create_mesh()
    sharded = DeviceStreamingDetector(model, state.params, state.batch_stats,
                                      CFG, batch=B, chunk_samples=chunk,
                                      halo=64, total_stride=8, bucket=64,
                                      mesh=mesh)
    plain = DeviceStreamingDetector(model, state.params, state.batch_stats,
                                    CFG, batch=B, chunk_samples=chunk,
                                    halo=64, total_stride=8, bucket=64)
    s_out, p_out = [], []
    for i in range(sec):
        c = ys[:, i * chunk:(i + 1) * chunk]
        s_out.append(sharded.push(c))
        p_out.append(plain.push(c))
    s_out.append(sharded.flush())
    p_out.append(plain.flush())
    S = np.concatenate([x for x in s_out if x.shape[1]], axis=1)
    P = np.concatenate([x for x in p_out if x.shape[1]], axis=1)
    np.testing.assert_allclose(S, P, atol=1e-5)


def test_device_streaming_pallas_featurizer_matches_xla():
    """featurizer='pallas' (fused window+rFFT+power+mel kernels, interpret
    mode on CPU) must emit the same schedule and near-identical scores as
    the XLA tick featurizer."""
    rng = np.random.default_rng(7)
    B, sec = 2, 40
    ys = (0.1 * rng.standard_normal(
        (B, sec * CFG.working_sample_rate))).astype(np.float32)
    chunk = CFG.working_sample_rate
    model, state = _model_state()

    outs = {}
    for feat in ("xla", "pallas"):
        det = DeviceStreamingDetector(model, state.params, state.batch_stats,
                                      CFG, batch=B, chunk_samples=chunk,
                                      halo=64, total_stride=8, bucket=64,
                                      featurizer=feat)
        o = [det.push(ys[:, i * chunk:(i + 1) * chunk]) for i in range(sec)]
        o.append(det.flush())
        outs[feat] = [x for x in o if x.shape[1]]
    for a, b in zip(outs["xla"], outs["pallas"]):
        assert a.shape == b.shape
    A = np.concatenate(outs["xla"], axis=1)
    P = np.concatenate(outs["pallas"], axis=1)
    # featurizer parity is <=1e-4 dB in log-mel; after the CNN + sigmoid the
    # score deviation stays small but above the jit-rounding tolerance.
    np.testing.assert_allclose(P, A, atol=1e-3)


def test_device_streaming_extract_span_equals_slices():
    """Lockstep tick: the span extraction must emit scores equal to the
    per-frame dynamic-slice reference (the pool twin lives in
    test_stream_pool.py)."""
    rng = np.random.default_rng(17)
    B, sec = 2, 40
    chunk = CFG.working_sample_rate  # 1 s
    ys = (0.1 * rng.standard_normal((B, sec * chunk))).astype(np.float32)
    model, state = _model_state()

    def run(extract_impl):
        det = DeviceStreamingDetector(model, state.params, state.batch_stats,
                                      CFG, batch=B, chunk_samples=chunk,
                                      halo=64, total_stride=8, bucket=64,
                                      extract_impl=extract_impl)
        outs = [det.push(ys[:, i * chunk:(i + 1) * chunk])
                for i in range(sec)]
        outs.append(det.flush())
        return np.concatenate([o for o in outs if o.shape[1]], axis=1)

    np.testing.assert_allclose(run("span"), run("slices"), atol=1e-5)
