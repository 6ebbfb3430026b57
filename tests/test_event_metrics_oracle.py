"""Pin sed_tpu/utils/event_metrics.py against a LITERAL PORT of sed_eval.

The frame metrics (C19) are fuzz-pinned against a literal port of the
reference's own math (tests/test_fuzz.py); the event/segment metrics are a
beyond-reference capability claiming "sed_eval-style" semantics, so their
oracle is a float64 host port of sed_eval's PUBLISHED algorithm (Mesaros,
Heittola, Virtanen: "Metrics for Polyphonic Sound Event Detection",
Applied Sciences 2016; implementation semantics of the sed_eval package):

  * event-based: per-pair onset condition |ref_on - est_on| <= t_collar and
    offset condition |ref_off - est_off| <= max(t_collar,
    pct_of_length * ref_length) build a boolean hit matrix; Ntp is the
    MAXIMUM-cardinality bipartite matching of that matrix (sed_eval
    util.bipartite_match, the Hopcroft–Karp recipe); Nfp = Nsys - Ntp,
    Nfn = Nref - Ntp.
  * segment-based: per fixed-length segment and class, activity = any
    active frame; per segment Ntp/Nfp/Nfn and the error-rate decomposition
    S = min(Nref_s, Nsys_s) - Ntp_s, D = max(0, Nref_s - Nsys_s),
    I = max(0, Nsys_s - Nref_s); ER = (S+D+I)/Nref.

House divergence (documented in event_metrics.py): degenerate P/R use the
repo-wide convention (precision := 1 with no estimates, recall := 1 with no
references) where sed_eval's eps-division yields 0 — so the fuzz pins the
COUNTS (tp/fp/fn/S/D/I) exactly everywhere and P/R/F1 on the non-degenerate
cases only.
"""

from __future__ import annotations

import numpy as np
import pytest

from sed_tpu.utils.event_metrics import (
    event_based_metrics,
    match_events,
    segment_metrics_from_matrices,
    segment_metrics_per_class_from_matrices,
)


# ---------------------------------------------------------------------------
# Oracle: literal port of sed_eval's algorithm (float64 host, no deps).
# ---------------------------------------------------------------------------


def _oracle_bipartite_match(graph):
    """Hopcroft–Karp maximum bipartite matching — the exact recipe sed_eval
    ships as util.event_matching.bipartite_match (D. Eppstein's published
    implementation): input maps U-members to lists of V-neighbors, output
    maps V-members to their U-match."""
    matching = {}
    for u in graph:
        for v in graph[u]:
            if v not in matching:
                matching[v] = u
                break
    while True:
        preds = {}
        unmatched = []
        pred = dict([(u, unmatched) for u in graph])
        for v in matching:
            del pred[matching[v]]
        layer = list(pred)
        while layer and not unmatched:
            new_layer = {}
            for u in layer:
                for v in graph[u]:
                    if v not in preds:
                        new_layer.setdefault(v, []).append(u)
            layer = []
            for v in new_layer:
                preds[v] = new_layer[v]
                if v in matching:
                    layer.append(matching[v])
                    pred[matching[v]] = v
                else:
                    unmatched.append(v)
        if not unmatched:
            return matching

        def recurse(v):
            if v in preds:
                L = preds[v]
                del preds[v]
                for u in L:
                    if u in pred:
                        pu = pred[u]
                        del pred[u]
                        if pu is unmatched or recurse(pu):
                            matching[v] = u
                            return 1
            return 0

        for v in unmatched:
            recurse(v)


def oracle_event_counts(ref, est, t_collar=0.2, pct_of_length=0.2,
                        evaluate_offset=True):
    """sed_eval EventBasedMetrics.evaluate core, single class: hit matrix
    from the published onset/offset conditions, Ntp = max matching."""
    hit = {}
    for i, (e_on, e_off) in enumerate(est):
        for j, (r_on, r_off) in enumerate(ref):
            onset_ok = abs(float(r_on) - float(e_on)) <= t_collar
            if evaluate_offset:
                tol = max(t_collar,
                          pct_of_length * (float(r_off) - float(r_on)))
                offset_ok = abs(float(r_off) - float(e_off)) <= tol
            else:
                offset_ok = True
            if onset_ok and offset_ok:
                hit.setdefault(i, []).append(j)
    matching = _oracle_bipartite_match(hit) or {}
    ntp = len(matching)
    return ntp, len(est) - ntp, len(ref) - ntp


def oracle_segment_counts(ref_mat, est_mat, fps, segment_length=1.0):
    """sed_eval SegmentBasedMetrics.evaluate core: per-segment activity by
    any-frame rule; overall Ntp/Nfp/Nfn and the S/D/I decomposition."""
    ref_mat = np.asarray(ref_mat, np.float64) >= 0.5
    est_mat = np.asarray(est_mat, np.float64) >= 0.5
    n_frames, n_classes = ref_mat.shape
    seg_of = np.floor(np.arange(n_frames) / fps / segment_length).astype(int)
    n_seg = seg_of[-1] + 1 if n_frames else 0
    tot = dict(ntp=0, nfp=0, nfn=0, S=0, D=0, I=0, nref=0)
    for s in range(n_seg):
        rows = seg_of == s
        ref_s = ref_mat[rows].any(axis=0)
        est_s = est_mat[rows].any(axis=0)
        Nref = int(ref_s.sum())
        Nsys = int(est_s.sum())
        Ntp = int((ref_s & est_s).sum())
        tot["ntp"] += Ntp
        tot["nfp"] += int((est_s & ~ref_s).sum())
        tot["nfn"] += int((ref_s & ~est_s).sum())
        tot["S"] += min(Nref, Nsys) - Ntp
        tot["D"] += max(0, Nref - Nsys)
        tot["I"] += max(0, Nsys - Nref)
        tot["nref"] += Nref
    return tot


# ---------------------------------------------------------------------------
# Fuzz harness
# ---------------------------------------------------------------------------


def _random_events(rng, n, spread, min_len=0.05, max_len=2.0):
    """Event lists with CLUSTERED onsets (spread ~ collar scale) so hit
    matrices are dense and matching ambiguity actually occurs."""
    onsets = np.round(rng.uniform(0, spread, n), 3)
    lengths = np.round(rng.uniform(min_len, max_len, n), 3)
    return [(float(s), float(s + l)) for s, l in zip(onsets, lengths)]


@pytest.mark.parametrize("evaluate_offset", [True, False])
def test_event_fuzz_vs_sed_eval_literal_port(evaluate_offset):
    rng = np.random.default_rng(0 if evaluate_offset else 1)
    for trial in range(400):
        n_ref = int(rng.integers(0, 7))
        n_est = int(rng.integers(0, 7))
        spread = float(rng.uniform(0.1, 3.0))
        collar = float(rng.uniform(0.05, 0.5))
        ratio = float(rng.choice([0.2, 0.5, 1.0]))
        ref = _random_events(rng, n_ref, spread)
        est = _random_events(rng, n_est, spread)
        tp_o, fp_o, fn_o = oracle_event_counts(
            ref, est, t_collar=collar, pct_of_length=ratio,
            evaluate_offset=evaluate_offset)
        got = event_based_metrics(ref, est, onset_collar=collar,
                                  offset_collar=collar, offset_ratio=ratio,
                                  match_offset=evaluate_offset)
        assert (got["tp"], got["fp"], got["fn"]) == (tp_o, fp_o, fn_o), (
            f"trial {trial}: ref={ref} est={est} collar={collar} "
            f"ratio={ratio}")
        if n_ref and n_est:  # non-degenerate: sed_eval P/R/F agree too
            assert got["precision"] == pytest.approx(tp_o / n_est)
            assert got["recall"] == pytest.approx(tp_o / n_ref)
            if tp_o:
                p, r = tp_o / n_est, tp_o / n_ref
                assert got["f1"] == pytest.approx(2 * p * r / (p + r))


def test_event_matching_is_maximum_not_greedy():
    """The adversarial shape that breaks first-fit greedy matching: the
    earliest estimate is compatible with BOTH references, a later estimate
    with only one.  Greedy (est-onset order, ref-onset scan) gives 1 TP;
    the sed_eval maximum matching gives 2."""
    # match_offset distinguishes compatibility: E1 fits R1 and R2 by onset
    # and offset; E2 fits only R2 (its offset is far from R1's tolerance).
    ref = [(0.0, 0.4), (0.1, 5.0)]
    est = [(0.05, 0.45), (0.15, 4.9)]
    # E1(0.05): onset ok both; offset |0.45-0.4|=0.05 ok for R1
    #           (tol max(0.2, 0.2*0.4)=0.2), |0.45-5.0| not ok for R2.
    # Wait — E1 fits only R1 here; make E1 fit both by lengths:
    ref = [(0.0, 1.0), (0.1, 1.1)]
    est = [(0.05, 1.05),   # fits R1 (|1.05-1|=.05) and R2 (|1.05-1.1|=.05)
           (0.0, 0.95)]    # fits R1 (|.95-1|=.05); R2 onset |0-0.1|=.1 ok,
    #                        offset |.95-1.1|=.15 ok too (tol 0.2) — both!
    # Both fit both => matching 2 regardless.  Force asymmetry with a tight
    # offset_ratio and no offset_collar floor:
    ref = [(0.0, 1.0), (0.1, 3.0)]
    est = [(0.05, 1.02),   # fits R1 (tol max(.0,.2*1)=.2, |.02|), R2? tol
           #                 .58, |1.02-3|=1.98 -> no. Only R1.
           (0.02, 2.9)]    # R1: offset |2.9-1|=1.9 > .2 -> no; R2: onset
    #                        .08 ok, offset .1 <= .58 -> only R2.
    # Disjoint again... the genuinely ambiguous case needs one est in both:
    ref = [(0.0, 1.0), (0.1, 1.4)]
    est = [(0.02, 1.1),    # R1: |1.1-1|=.1<=.2 ok; R2: |1.1-1.4|=.3 > tol
           #                 max(.2,.2*1.3)=.26 -> no.  Only R1.
           (0.0, 1.2)]     # R1: |1.2-1|=.2<=.2 ok; R2: |1.2-1.4|=.2<=.26
    #                        ok.  Both.
    # est-onset order processes (0.0, 1.2) FIRST; ref-onset scan gives it
    # R1.  Then (0.02, 1.1) fits only R1 -> greedy scores 1.  Maximum:
    # (0.0,1.2)->R2, (0.02,1.1)->R1 = 2.
    got = event_based_metrics(ref, est, onset_collar=0.2, offset_collar=0.2,
                              offset_ratio=0.2, match_offset=True)
    tp_o, _, _ = oracle_event_counts(ref, est, 0.2, 0.2, True)
    assert tp_o == 2, "oracle sanity: this case has a perfect matching"
    assert got["tp"] == 2, "matcher must be maximum, not greedy"
    pairs = match_events(ref, est, 0.2, 0.2, 0.2, True)
    assert sorted(pairs) == [(0, 0), (1, 1)]


def test_segment_fuzz_vs_sed_eval_literal_port():
    rng = np.random.default_rng(7)
    for trial in range(200):
        n_frames = int(rng.integers(1, 60))
        n_classes = int(rng.integers(1, 4))
        fps = float(rng.choice([1.0, 3.0, 10.0]))
        seg_len = float(rng.choice([0.5, 1.0, 2.0]))
        ref = (rng.random((n_frames, n_classes)) < 0.3).astype(np.float32)
        scores = rng.random((n_frames, n_classes)).astype(np.float32)
        o = oracle_segment_counts(ref, scores >= 0.5, fps, seg_len)
        got = segment_metrics_from_matrices(scores, ref, fps, threshold=0.5,
                                            segment_length=seg_len)
        assert got["tp"] == o["ntp"] and got["fp"] == o["nfp"] \
            and got["fn"] == o["nfn"], f"trial {trial}"
        assert got["substitutions"] == o["S"], f"trial {trial}"
        assert got["deletions"] == o["D"], f"trial {trial}"
        assert got["insertions"] == o["I"], f"trial {trial}"
        assert got["n_ref"] == o["nref"]
        if o["nref"]:
            assert got["error_rate"] == pytest.approx(
                (o["S"] + o["D"] + o["I"]) / o["nref"])
        # Class-wise view sums back to the same pooled counts.
        per = segment_metrics_per_class_from_matrices(
            scores, ref, fps, threshold=0.5, segment_length=seg_len)
        assert sum(m["tp"] for m in per) == o["ntp"]
        assert sum(m["fp"] for m in per) == o["nfp"]
        assert sum(m["fn"] for m in per) == o["nfn"]
