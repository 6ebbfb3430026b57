"""Event-interval extraction from frame scores (utils/events_post.py)."""

import numpy as np
import pytest

from sed_tpu.utils.events_post import event_dict, events_to_csv, extract_events

FPS = 3.0


def _scores(active_frames, n=30, classes=1, value=0.9):
    s = np.full((n, classes), 0.1, np.float32)
    for f in active_frames:
        s[f, 0] = value
    return s


def test_single_event_bounds():
    s = _scores([6, 7, 8])
    (evs,) = extract_events(s, FPS, threshold=0.5)
    assert evs == [(2.0, 3.0, pytest.approx(0.9))]


def test_no_events_and_all_active():
    assert extract_events(_scores([]), FPS) == [[]]
    s = np.full((9, 1), 0.8, np.float32)
    (evs,) = extract_events(s, FPS)
    assert evs == [(0.0, 3.0, pytest.approx(0.8))]


def test_merge_gap_and_min_duration():
    # Two runs separated by one inactive frame (1/3 s gap).
    s = _scores([3, 4, 6, 7])
    (separate,) = extract_events(s, FPS, merge_gap=0.0)
    assert len(separate) == 2
    (merged,) = extract_events(s, FPS, merge_gap=0.5)
    assert merged == [(1.0, 8 / 3, pytest.approx(0.9))]
    # min_duration drops a single-frame blip but keeps the long run.
    s2 = _scores([0, 10, 11, 12, 13])
    (evs,) = extract_events(s2, FPS, min_duration=1.0)
    assert len(evs) == 1 and evs[0][0] == 10 / 3


def test_peak_is_within_event():
    s = _scores([2, 3, 4], value=0.7)
    s[3, 0] = 0.95
    s[20, 0] = 0.99  # inactive elsewhere? no — make it below threshold
    s[20, 0] = 0.2
    (evs,) = extract_events(s, FPS)
    assert evs[0][2] == pytest.approx(0.95)


def test_multiclass_independent():
    s = np.full((12, 2), 0.1, np.float32)
    s[3:6, 0] = 0.9
    s[9:10, 1] = 0.8
    a, b = extract_events(s, FPS)
    assert len(a) == 1 and len(b) == 1
    assert a[0][0] == 1.0 and b[0][0] == 3.0


def test_validation():
    with pytest.raises(ValueError, match="frames, classes"):
        extract_events(np.zeros(5), FPS)
    with pytest.raises(ValueError, match="threshold"):
        extract_events(np.zeros((5, 1)), FPS, threshold=0.0)


def test_csv_and_dict(tmp_path):
    s = _scores([6, 7, 8])
    evs = extract_events(s, FPS)
    p = str(tmp_path / "events.csv")
    events_to_csv(evs, ["doorslam"], p)
    lines = open(p).read().strip().splitlines()
    assert lines[0] == "class,start_sec,end_sec,peak"
    assert lines[1].startswith("doorslam,2.000,3.000,")
    d = event_dict(evs, ["doorslam"])
    assert d["doorslam"][0]["start_sec"] == 2.0
