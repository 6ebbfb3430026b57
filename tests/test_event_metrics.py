"""Event-based (onset/offset collar) metrics: matching rules + pipeline."""

import numpy as np

from sed_tpu.utils.event_metrics import (
    event_metrics_from_matrices,
    event_based_metrics,
    event_metrics_from_scores,
    match_events,
)


def test_exact_match():
    ref = [(1.0, 2.0), (5.0, 6.0)]
    m = event_based_metrics(ref, list(ref))
    assert m["tp"] == 2 and m["fp"] == 0 and m["fn"] == 0
    assert m["precision"] == m["recall"] == m["f1"] == 1.0


def test_onset_collar_boundary():
    ref = [(1.0, 2.0)]
    # onset off by 0.19 s: inside the default 0.2 s collar
    assert event_based_metrics(ref, [(1.19, 2.0)])["tp"] == 1
    # onset off by 0.30 s: outside
    m = event_based_metrics(ref, [(1.30, 2.0)])
    assert m["tp"] == 0 and m["fp"] == 1 and m["fn"] == 1


def test_offset_tolerance_scales_with_event_length():
    # 10 s event: offset tolerance = max(0.2, 0.2 * 10) = 2 s
    ref = [(0.0, 10.0)]
    assert event_based_metrics(ref, [(0.1, 8.5)])["tp"] == 1   # off by 1.5 s
    assert event_based_metrics(ref, [(0.1, 7.0)])["tp"] == 0   # off by 3 s
    # short event keeps the absolute 0.2 s floor
    ref = [(1.0, 1.3)]
    assert event_based_metrics(ref, [(1.0, 1.45)])["tp"] == 1
    assert event_based_metrics(ref, [(1.0, 1.6)])["tp"] == 0


def test_onset_only_mode():
    ref = [(1.0, 2.0)]
    est = [(1.1, 9.0)]  # wildly wrong offset
    assert event_based_metrics(ref, est)["tp"] == 0
    assert event_based_metrics(ref, est, match_offset=False)["tp"] == 1


def test_each_reference_matched_once():
    ref = [(1.0, 2.0)]
    est = [(0.95, 2.0), (1.05, 2.0)]  # both inside the collar
    m = event_based_metrics(ref, est)
    assert m["tp"] == 1 and m["fp"] == 1 and m["fn"] == 0


def test_degenerate_conventions_match_house_style():
    # no reference events: recall := 1 (precision penalizes false alarms)
    m = event_based_metrics([], [(1.0, 2.0)])
    assert m["recall"] == 1.0 and m["precision"] == 0.0
    # no estimated events: precision := 1
    m = event_based_metrics([(1.0, 2.0)], [])
    assert m["precision"] == 1.0 and m["recall"] == 0.0
    # both empty: perfect
    m = event_based_metrics([], [])
    assert m["f1"] == 1.0


def test_greedy_matching_is_onset_ordered():
    # two refs, two ests — each est can only reach its own ref
    ref = [(1.0, 2.0), (1.3, 2.3)]
    est = [(1.35, 2.3), (1.05, 2.0)]
    pairs = match_events(ref, est)
    assert sorted(pairs) == [(0, 1), (1, 0)]


def test_event_metrics_from_scores_pipeline():
    # 3 fps scores with one active run at frames 6..11 -> event (2.0, 4.0) s
    fps = 3.0
    scores = np.zeros((30, 1), np.float32)
    scores[6:12, 0] = 0.9
    m = event_metrics_from_scores(scores, [2.1], [3.9], fps, threshold=0.5)
    assert m["tp"] == 1 and m["fp"] == 0 and m["fn"] == 0

    # shifted ground truth far from the prediction: miss + false alarm
    m = event_metrics_from_scores(scores, [5.0], [6.0], fps, threshold=0.5)
    assert m["tp"] == 0 and m["fp"] == 1 and m["fn"] == 1


def test_event_metrics_from_matrices_micro_average():
    from sed_tpu.data.events import create_event_matrix
    from sed_tpu.configs import SpectrogramConfig

    cfg = SpectrogramConfig(tau_sed_labels=("a", "b"))
    fps = cfg.frames_per_second
    gt = create_event_matrix(30, [2.0], [4.0], cfg)  # paints ALL columns
    scores = np.zeros((30, 2), np.float32)
    # class 0: matches the GT run; class 1: silent (misses its GT run)
    s = int(round(2.0 * fps))
    e = int(round(4.0 * fps)) + 1
    scores[s:e, 0] = 0.9
    m = event_metrics_from_matrices(scores, gt, fps)
    assert m["tp"] == 1 and m["fn"] == 1 and m["fp"] == 0
    assert m["precision"] == 1.0 and abs(m["recall"] - 0.5) < 1e-9

    # mismatched shapes must raise
    import pytest
    with pytest.raises(ValueError):
        event_metrics_from_matrices(scores[:, :1], gt, fps)


def test_segment_activity_grid():
    from sed_tpu.utils.event_metrics import segment_activity

    # fps=3, 1 s segments -> 3 frames per segment; 7 frames -> 3 segments
    act = np.zeros((7, 2), np.float32)
    act[1, 0] = 1   # segment 0, class 0
    act[6, 1] = 1   # segment 2, class 1
    seg = segment_activity(act, 3, 1.0)
    assert seg.shape == (3, 2)
    assert seg[0, 0] and not seg[0, 1]
    assert not seg[1].any()
    assert not seg[2, 0] and seg[2, 1]


def test_segment_metrics_hand_vector():
    """Hand-computed sed_eval-style segment F1 + ER (fps=3, 1 s segments).

    ref segments (class 0): {0, 1};  est: {1, 2}
      seg 0: fn=1 (deletion)   seg 1: tp=1   seg 2: fp=1 (insertion)
      => tp=1 fp=1 fn=1, S=0 D=1 I=1, N_ref=2, ER=(0+1+1)/2 = 1.0
    """
    from sed_tpu.utils.event_metrics import segment_metrics_from_matrices

    gt = np.zeros((9, 1), np.float32)
    gt[0:6, 0] = 1            # segments 0,1 active
    scores = np.zeros((9, 1), np.float32)
    scores[3:9, 0] = 0.9      # segments 1,2 active
    m = segment_metrics_from_matrices(scores, gt, 3)
    assert m["tp"] == 1 and m["fp"] == 1 and m["fn"] == 1
    assert m["substitutions"] == 0 and m["deletions"] == 1 and m["insertions"] == 1
    assert m["n_ref"] == 2
    assert abs(m["error_rate"] - 1.0) < 1e-12
    assert abs(m["f1"] - 0.5) < 1e-12


def test_segment_metrics_substitution_multiclass():
    """A miss and a false alarm in the SAME segment count as one
    substitution (sed_eval ER definition), not a deletion + insertion."""
    from sed_tpu.utils.event_metrics import segment_metrics_from_matrices

    gt = np.zeros((3, 2), np.float32)
    gt[:, 0] = 1               # segment 0: class 0 active
    scores = np.zeros((3, 2), np.float32)
    scores[:, 1] = 0.9         # predicted class 1 instead
    m = segment_metrics_from_matrices(scores, gt, 3)
    assert m["substitutions"] == 1 and m["deletions"] == 0 and m["insertions"] == 0
    assert abs(m["error_rate"] - 1.0) < 1e-12


def test_micro_average_segments():
    from sed_tpu.utils.event_metrics import (
        micro_average_segments,
        segment_metrics_from_matrices,
    )

    gt = np.zeros((6, 1), np.float32)
    gt[:3, 0] = 1
    good = segment_metrics_from_matrices(gt, gt, 3)          # perfect
    bad = segment_metrics_from_matrices(np.zeros_like(gt), gt, 3)  # all missed
    pooled = micro_average_segments([good, bad])
    assert pooled["tp"] == 1 and pooled["fn"] == 1
    assert abs(pooled["recall"] - 0.5) < 1e-12
    assert abs(pooled["error_rate"] - 0.5) < 1e-12  # 1 deletion / 2 ref


def test_event_metrics_per_class_and_macro():
    """Class-wise event metrics (round 4): asymmetric per-class GT gives
    distinct class numbers; micro == pooled counts; macro == class mean."""
    import numpy as np

    from sed_tpu.configs import AudioConfig
    from sed_tpu.data.events import create_event_matrix
    from sed_tpu.utils.event_metrics import (
        event_metrics_from_matrices,
        event_metrics_per_class_from_matrices,
        macro_average_classes,
    )

    cfg = AudioConfig(tau_sed_labels=("a", "b"))
    fps = cfg.frames_per_second
    gt = create_event_matrix(60, [2.0, 10.0], [4.0, 12.0], cfg,
                             class_indices=[0, 1])
    # Predictions: class 0 reproduced exactly, class 1 entirely missed plus a
    # false alarm.
    scores = np.zeros_like(gt)
    scores[:, 0] = gt[:, 0]
    scores[50:55, 1] = 1.0
    per_class = event_metrics_per_class_from_matrices(scores, gt, fps)
    assert len(per_class) == 2
    assert per_class[0]["f1"] == 1.0 and per_class[0]["tp"] == 1
    assert per_class[1]["tp"] == 0 and per_class[1]["fn"] == 1 and per_class[1]["fp"] == 1
    assert per_class[1]["f1"] == 0.0

    micro = event_metrics_from_matrices(scores, gt, fps)
    assert micro["tp"] == 1 and micro["fp"] == 1 and micro["fn"] == 1

    macro = macro_average_classes([per_class])
    assert macro["f1"] == 0.5  # mean(1.0, 0.0)
    assert len(macro["per_class"]) == 2
    # Pooling across recordings sums counts per class before averaging.
    macro2 = macro_average_classes([per_class, per_class])
    assert macro2["per_class"][0]["tp"] == 2
    assert macro2["f1"] == 0.5


def test_segment_metrics_per_class():
    import numpy as np

    from sed_tpu.configs import AudioConfig
    from sed_tpu.data.events import create_event_matrix
    from sed_tpu.utils.event_metrics import (
        segment_metrics_from_matrices,
        segment_metrics_per_class_from_matrices,
    )

    cfg = AudioConfig(tau_sed_labels=("a", "b"))
    fps = cfg.frames_per_second
    gt = create_event_matrix(60, [2.0, 10.0], [4.0, 12.0], cfg,
                             class_indices=[0, 1])
    scores = np.zeros_like(gt)
    scores[:, 0] = gt[:, 0]  # class 0 perfect, class 1 all missed
    per_class = segment_metrics_per_class_from_matrices(scores, gt, fps)
    assert per_class[0]["f1"] == 1.0 and per_class[0]["error_rate"] == 0.0
    assert per_class[1]["tp"] == 0 and per_class[1]["error_rate"] == 1.0
    # Per-class counts sum to the pooled micro counts.
    micro = segment_metrics_from_matrices(scores, gt, fps)
    assert sum(m["tp"] for m in per_class) == micro["tp"]
    assert sum(m["fn"] for m in per_class) == micro["fn"]
