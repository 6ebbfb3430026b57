"""Golden tests for frame-level metrics against a literal port of the
reference math (reference: utils/metric_utils.py:4-37)."""

import numpy as np
import pytest

from sed_tpu.utils.metrics import (
    THRESHOLDS,
    calculate_metrics,
    calculate_metrics_jax,
    compute_recall_precision,
    f_score,
)


def _reference_calculate_metrics(output, target):
    """Literal transcription of the reference loop, used as the oracle."""
    ths = np.arange(0.00, 1.05, 0.05)
    n = min(output.shape[0], target.shape[0])
    t = target[:n]
    o = output[:n]
    recalls, precisions = [], []
    for th in ths:
        o_discrete = np.where(o > th, 1, 0)
        tp = ((2 * t - o_discrete) == 1).sum()
        num_gt = t.sum()
        num_positives = o_discrete.sum()
        recall = float(tp) / float(num_gt) if num_gt > 0 else 1
        prec = float(tp) / float(num_positives) if num_positives > 0 else 1
        recalls.append(recall)
        precisions.append(prec)
    recalls, precisions = np.array(recalls), np.array(precisions)
    ap = np.sum(precisions[:-1] * (recalls[:-1] - recalls[1:]))
    return recalls, precisions, ap


def test_threshold_grid():
    assert len(THRESHOLDS) == 21
    assert THRESHOLDS[0] == 0.0
    np.testing.assert_allclose(THRESHOLDS[-1], 1.0)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_calculate_metrics_matches_reference_math(seed):
    rng = np.random.default_rng(seed)
    output = rng.random((50, 1))
    target = (rng.random((53, 1)) > 0.7).astype(np.float32)
    got_r, got_p, got_ap = calculate_metrics(output, target)
    ref_r, ref_p, ref_ap = _reference_calculate_metrics(output, target)
    np.testing.assert_allclose(got_r, ref_r, atol=1e-12)
    np.testing.assert_allclose(got_p, ref_p, atol=1e-12)
    np.testing.assert_allclose(got_ap, ref_ap, atol=1e-12)


def test_degenerate_conventions():
    # No ground truth at all -> recall == 1 at every threshold.
    output = np.zeros((10, 1))
    target = np.zeros((10, 1))
    r, p, ap = calculate_metrics(output, target)
    assert np.all(r == 1.0)
    # Output all zeros -> no positives at any threshold -> precision == 1.
    assert np.all(p == 1.0)


def test_compute_recall_precision_counts_tp_only_where_both_one():
    o = np.array([[1, 0], [1, 1]])
    t = np.array([[1, 1], [0, 1]])
    recall, prec = compute_recall_precision(o, t)
    # TP = positions where t==1 and o==1: (0,0) and (1,1) -> 2.
    assert recall == 2 / 3
    assert prec == 2 / 3


def test_jax_variant_matches_numpy():
    rng = np.random.default_rng(7)
    output = rng.random((40, 1)).astype(np.float32)
    target = (rng.random((40, 1)) > 0.6).astype(np.float32)
    r_np, p_np, ap_np = calculate_metrics(output, target)
    r_j, p_j, ap_j = calculate_metrics_jax(output, target)
    np.testing.assert_allclose(np.asarray(r_j), r_np, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_j), p_np, atol=1e-6)
    np.testing.assert_allclose(float(ap_j), ap_np, atol=1e-6)


def test_f_score_formula():
    # Reference: (1+b^2) * r * p / (b^2 * r + p + 1e-9).
    r, p = 0.8, 0.4
    np.testing.assert_allclose(f_score(r, p, 1), 2 * r * p / (r + p + 1e-9))
    b = 5.0
    np.testing.assert_allclose(
        f_score(r, p, b), (1 + b**2) * r * p / (b**2 * r + p + 1e-9)
    )


def test_calculate_metrics_per_class():
    """Class-wise view (round 4): per-class results equal the pooled metric
    applied to each column alone; asymmetric GT yields distinct numbers."""
    from sed_tpu.utils.metrics import calculate_metrics, calculate_metrics_per_class

    rng = np.random.default_rng(5)
    n = 120
    # Class 0: near-perfect scores; class 1: anti-correlated; class 2: no GT.
    tgt = np.zeros((n, 3), np.float32)
    tgt[10:30, 0] = 1
    tgt[50:90, 1] = 1
    out = np.empty((n, 3))
    out[:, 0] = np.clip(tgt[:, 0] * 0.9 + 0.05 + 0.02 * rng.standard_normal(n), 0, 1)
    out[:, 1] = np.clip((1 - tgt[:, 1]) * 0.9 + 0.02 * rng.standard_normal(n), 0, 1)
    out[:, 2] = rng.random(n)

    recalls, precisions, aps = calculate_metrics_per_class(out, tgt)
    assert recalls.shape == (21, 3) and precisions.shape == (21, 3) and aps.shape == (3,)
    for c in range(3):
        r1, p1, ap1 = calculate_metrics(out[:, c:c + 1], tgt[:, c:c + 1])
        np.testing.assert_array_equal(recalls[:, c], r1)
        np.testing.assert_array_equal(precisions[:, c], p1)
        assert aps[c] == ap1
    # Distinct per-class numbers: the good class far above the inverted one.
    assert aps[0] > 0.9 > aps[1]
    # No-GT class: recall convention := 1 at every threshold.
    np.testing.assert_array_equal(recalls[:, 2], np.ones(21))


def test_calculate_metrics_per_class_single_class_matches_pooled():
    from sed_tpu.utils.metrics import calculate_metrics, calculate_metrics_per_class

    rng = np.random.default_rng(6)
    out = rng.random((60, 1))
    tgt = (rng.random((60, 1)) > 0.7).astype(np.float32)
    r, p, ap = calculate_metrics(out, tgt)
    rc, pc, apc = calculate_metrics_per_class(out, tgt)
    np.testing.assert_array_equal(rc[:, 0], r)
    np.testing.assert_array_equal(pc[:, 0], p)
    assert apc[0] == ap
