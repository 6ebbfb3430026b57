"""Property fuzz of the shared tick schedule (streaming.tick_schedule).

The schedule's internal ValueError guards are the safety net between the
integer arithmetic and the silently-clamping jax dynamic slices
(device_streaming.py / stream_pool.py consume its outputs verbatim).  This
fuzz drives the schedule through thousands of ticks across random
geometries and checks the guards never fire and the invariants hold —
pure host integer math, no device work.
"""

import numpy as np
import pytest

from sed_tpu.configs import SpectrogramConfig
from sed_tpu.streaming import emission_upto, tick_schedule, window_start


def _initial_counters(t0, cfg, stride, halo):
    """Counters equivalent to a stream migrated to the device rings after
    t0 total samples (stream_pool.StreamPool._admit arithmetic)."""
    hop, pad = cfg.hop_size, cfg.nfft // 2
    n_frames = max(0, (t0 - pad) // hop + 1)
    emitted = emission_upto(n_frames, stride, halo, final=False)
    return {"t_total": t0, "n_frames": n_frames, "emitted": emitted,
            "mel_start": window_start(emitted, stride, halo)}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tick_schedule_fuzz(seed):
    rng = np.random.default_rng(seed)
    for _ in range(40):
        cfg = SpectrogramConfig(
            working_sample_rate=int(rng.integers(4000, 48001)),
            time_margin=float(rng.uniform(0.05, 0.4)))
        hop = cfg.hop_size
        stride = int(rng.choice([1, 2, 4, 8]))
        halo = int(rng.integers(1, 96))
        chunk = int(rng.integers(hop // 3 + 1, 4 * hop))
        frames_max = -(-chunk // hop) + 1
        emit_max = stride * (-(-(frames_max + stride) // stride))
        ring_l = chunk + cfg.nfft + hop
        need = 2 * halo + 2 * stride + frames_max
        ring_m = 128 * (-(-need // 128))

        # device-mode switch happens after nfft + hop total samples
        # (device_streaming.py _switch_after); start a tick multiple past it
        t0 = chunk * (-(-(cfg.nfft + hop) // chunk))
        c = _initial_counters(t0, cfg, stride, halo)
        prev_emitted = c["emitted"]
        for _ in range(60):
            offs, n_new, write_pos, win_off, e_off, shift, emit_n, c = \
                tick_schedule(c, chunk, frames_max, emit_max, ring_m, ring_l,
                              cfg, stride, halo)
            # guards did not fire; check the documented invariants directly
            assert 0 <= n_new <= frames_max
            assert (offs >= 0).all() and (offs + cfg.nfft <= ring_l).all()
            # consecutive real frames are hop-spaced from offs[0] (the
            # span-extraction contract, stream_pool.py)
            for j in range(n_new):
                assert offs[j] == offs[0] + j * hop
            assert emit_n >= 0 and c["emitted"] == prev_emitted + emit_n
            assert c["emitted"] <= c["n_frames"]  # never emit unfeaturized
            prev_emitted = c["emitted"]
