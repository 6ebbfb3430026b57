"""Randomized cross-checks: literal reference ports vs the vectorized
implementations over many seeds, and windowed-forward exactness across random
geometry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sed_tpu.configs import AudioConfig, SpectrogramConfig
from sed_tpu.data.events import create_event_matrix, start_index_labels
from sed_tpu.data.split import split_train_val
from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
from sed_tpu.parallel.time_shard import windowed_forward
from sed_tpu.utils.metrics import calculate_metrics

CFG = AudioConfig()


@pytest.mark.parametrize("seed", range(8))
def test_metrics_fuzz_vs_literal_port(seed):
    rng = np.random.default_rng(100 + seed)
    n_out = int(rng.integers(5, 120))
    n_tgt = int(rng.integers(5, 120))
    classes = int(rng.integers(1, 4))
    output = rng.random((n_out, classes))
    target = (rng.random((n_tgt, classes)) > rng.uniform(0.5, 0.99)).astype(np.float32)

    got_r, got_p, got_ap = calculate_metrics(output, target)

    ths = np.arange(0.00, 1.05, 0.05)
    n = min(n_out, n_tgt)
    t, o = target[:n], output[:n]
    ref_r, ref_p = [], []
    for th in ths:
        od = np.where(o > th, 1, 0)
        tp = ((2 * t - od) == 1).sum()
        ref_r.append(float(tp) / float(t.sum()) if t.sum() > 0 else 1)
        ref_p.append(float(tp) / float(od.sum()) if od.sum() > 0 else 1)
    ref_r, ref_p = np.array(ref_r), np.array(ref_p)
    np.testing.assert_allclose(got_r, ref_r, atol=1e-12)
    np.testing.assert_allclose(got_p, ref_p, atol=1e-12)
    np.testing.assert_allclose(got_ap, np.sum(ref_p[:-1] * (ref_r[:-1] - ref_r[1:])), atol=1e-12)


@pytest.mark.parametrize("seed", range(6))
def test_event_rasterization_fuzz(seed):
    rng = np.random.default_rng(200 + seed)
    frames_num = int(rng.integers(20, 400))
    k = int(rng.integers(0, 6))
    starts = np.sort(rng.uniform(0, frames_num / CFG.frames_per_second, size=k))
    ends = starts + rng.uniform(0.05, 4.0, size=k)

    got = create_event_matrix(frames_num, starts, ends, CFG)
    ref = np.zeros((frames_num, CFG.classes_num))
    for i in range(k):
        sf = int(round(starts[i] * CFG.frames_per_second))
        ef = int(round(ends[i] * CFG.frames_per_second)) + 1
        ref[sf:ef] = 1
    np.testing.assert_array_equal(got, ref)

    length = CFG.working_sample_rate * 30
    got2 = start_index_labels(length, starts, ends, CFG)
    ref2 = np.zeros(length)
    p = CFG.min_event_percentage_in_positive_frame
    for s, e in zip(starts, ends):
        first = int(s * CFG.working_sample_rate - CFG.frame_size * (1 - p))
        last = int(e * CFG.working_sample_rate - CFG.frame_size * p)
        ref2[max(first, 0):last] = 1
    np.testing.assert_array_equal(got2, ref2[:length].astype(bool))


def test_split_train_val_edges():
    items = [f"f{i}" for i in range(10)]
    tr, va = split_train_val(items, 0.0, seed=0)
    assert len(va) == 0 and sorted(tr) == sorted(items)
    tr, va = split_train_val(items, 1.0, seed=0)
    assert len(tr) == 0 and sorted(va) == sorted(items)
    tr, va = split_train_val(items, "f1", seed=0)
    assert set(va) == {"f1"} and "f1" not in tr  # substring routing


@pytest.mark.parametrize("seed", range(4))
def test_windowed_forward_fuzz(seed):
    rng = np.random.default_rng(300 + seed)
    t = int(rng.integers(500, 1500))
    window = 8 * int(rng.integers(16, 64))
    halo = 8 * int(rng.integers(4, 12))  # >= 32 >= rf//2 == 30
    model = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL)
    x = jax.random.normal(jax.random.key(seed), (1, t, 64, 1))
    variables = model.init(jax.random.key(99), jnp.zeros((1, 200, 64, 1)), train=False)

    def forward(batch):
        return model.apply(variables, batch, train=False)

    ref = np.asarray(forward(x))
    got = windowed_forward(forward, x, window=window, halo=halo, total_stride=8)
    assert got.shape == ref.shape, (t, window, halo)
    np.testing.assert_allclose(got, ref, atol=1e-5, err_msg=f"{(t, window, halo)}")
