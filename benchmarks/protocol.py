"""The pinned benchmark measurement protocol (median-of-N two-point slopes).

Round-2 verdict (Weak #2): single-sample headline numbers on this harness's
TPU relay carry ~±20% session variance, making round-over-round deltas
unfalsifiable.  Every headline bench therefore reports the MEDIAN of N
independent slope samples plus the min/max spread, all from the same
process/session, so future rounds can be diffed mechanically.

One slope sample = two device-side loop lengths timed once each with a fresh
perturbed input and a forced VALUE fetch (``float(...)``); per-step time is
Δt/Δiters, which cancels the relay's ~30 ms RPC floor exactly and defeats
its result cache (ROADMAP.md "Environment notes").  Non-positive slopes
(relay jitter) are discarded and re-sampled up to a retry budget.
"""

from __future__ import annotations

import time
from typing import Callable, Dict


def slope_stats(
    make_loop: Callable[[int], Callable],
    staged,
    perturb: Callable[[object, int], object],
    iters_pair=(10, 30),
    n: int = 5,
) -> Dict[str, float]:
    """Median-of-``n`` two-point slope of a compiled device loop.

    ``make_loop(iters)`` returns a jitted callable ``loop(x)`` whose result
    can be pulled with ``float(...)``; ``perturb(x, k)`` must return a fresh
    input (defeating cross-call result caching) that is ready on device.

    Returns {"median", "min", "max", "n", "samples", "discarded"} — seconds
    per loop iteration.
    """
    i1, i2 = iters_pair
    loops = {it: make_loop(it) for it in iters_pair}
    for lp in loops.values():
        float(lp(staged))  # compile + first run

    slopes = []
    discarded = 0
    k = 0
    while len(slopes) < n and k < 3 * n:
        ts = {}
        for it in iters_pair:
            x = perturb(staged, k)
            k += 1
            t0 = time.perf_counter()
            float(loops[it](x))
            ts[it] = time.perf_counter() - t0
        s = (ts[i2] - ts[i1]) / (i2 - i1)
        if s > 0:
            slopes.append(s)
        else:
            discarded += 1
    if not slopes:
        raise RuntimeError(
            f"no positive slope in {k} samples — relay too jittery")
    slopes.sort()
    mid = len(slopes) // 2
    median = (slopes[mid] if len(slopes) % 2
              else 0.5 * (slopes[mid - 1] + slopes[mid]))
    return {
        "median": median,
        "min": slopes[0],
        "max": slopes[-1],
        "n": len(slopes),
        "samples": slopes,
        "discarded": discarded,
    }
