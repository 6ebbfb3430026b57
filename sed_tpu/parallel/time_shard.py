"""Time-axis sharded inference for a single ultra-long recording.

The SED analog of sequence/context parallelism (SURVEY.md §5): the model is
fully convolutional over time, so one arbitrarily long recording can be split
into fixed-size windows with a halo of ``receptive_field/2`` frames on each
side; windows ride the batch axis (shardable across chips with
sed_tpu.parallel.data_parallel.shard_inference), and halo outputs are trimmed.
Interior windows reproduce the unsharded forward bit-exactly because
activation corruption from a window's zero-padded edge can propagate at most
half the receptive field inward; the first/last windows start/end at the true
recording boundaries so edge behavior (per-layer conv zero padding) is also
exact.  Pooling-phase alignment requires every window start to be a multiple
of the total time stride (2**num_pools).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def receptive_field(model_config: Sequence[Tuple[int, int]]) -> int:
    """Time receptive field (frames) of a CnnAvgPooling stack.

    Each ConvBlock adds two k=3 convs (+2 frames each at the current stride),
    then multiplies the stride by its pool factor.
    """
    rf, stride = 1, 1
    for _, pool in model_config:
        rf += 4 * stride
        stride *= pool
    return rf


def windowed_forward(
    forward: Callable,
    x: jnp.ndarray,
    window: int,
    halo: int,
    total_stride: int = 8,
) -> np.ndarray:
    """Exact fully-convolutional forward over windows.

    Args:
      forward: (batch, frames, mel, channels) -> (batch, frames', classes)
        frame-rate-preserving model forward (frames' = stride*floor(frames/stride)).
      x: (1, frames, mel, channels) single long recording.
      window: retained frames per window (multiple of total_stride).
      halo: context frames on each side (multiple of total_stride,
        >= receptive_field // 2).

    Returns (1, frames_out, classes) numpy scores identical to ``forward(x)``.
    """
    assert window % total_stride == 0 and halo % total_stride == 0
    t = x.shape[1]
    slice_len = window + 2 * halo
    if t <= slice_len:
        return np.asarray(forward(x))

    t_out = total_stride * (t // total_stride)
    n = math.ceil(t_out / window)

    starts = []
    for i in range(n):
        s = max(0, i * window - halo)
        if s + slice_len > t:
            # Last uniform window: latest stride-aligned start that still fits.
            s = total_stride * ((t - slice_len) // total_stride)
        starts.append(s)

    windows = jnp.stack([x[0, s:s + slice_len] for s in starts])  # (n, slice_len, M, C)
    outs = np.asarray(forward(windows))  # (n, slice_len, classes)

    pieces = []
    covered = 0
    for i, s in enumerate(starts):
        retain_start = i * window
        # Outputs within ``halo`` of a slice edge are corrupted by the slice's
        # zero padding — unless that edge is the true recording boundary,
        # where zero padding is exactly what the unsharded forward does.
        trusted_end = s + slice_len if s + slice_len == t else s + slice_len - halo
        retain_end = min((i + 1) * window, t_out, trusted_end)
        if retain_end <= retain_start:
            continue
        pieces.append(outs[i, retain_start - s:retain_end - s])
        covered = retain_end

    if covered < t_out:
        # Ragged tail (t not stride-aligned): run [s_tail, t) directly so the
        # true right-edge conv padding matches the unsharded forward.  This is
        # one extra compile shape, reused across recordings of equal raggedness.
        s_tail = covered - halo
        tail_out = np.asarray(forward(x[:, s_tail:]))[0]
        pieces.append(tail_out[covered - s_tail:t_out - s_tail])

    scores = np.concatenate(pieces, axis=0)[None]
    return scores


def pool_product(model_config: Sequence[Tuple[int, int]]) -> int:
    p = 1
    for _, pool in model_config:
        p *= pool
    return p


def bucketed_forward_exact(
    forward: Callable,
    x: jnp.ndarray,
    stride: int,
    halo: int,
    bucket: int = 64,
) -> np.ndarray:
    """Variable-length exact forward with O(#buckets + stride) compiled shapes.

    Whole-recording eval jits one program per distinct recording length
    (SURVEY.md §7 "hard parts": bucket/pad).  Zero-padding the time axis is
    NOT output-preserving for a fully convolutional stack — the pad region
    becomes nonzero after the first BN bias, so outputs within
    ``receptive_field/2`` of the true end are corrupted.  This runs:

      * a MAIN pass on x zero-padded to the next ``bucket`` multiple — exact
        for output frames < c = stride*floor((t - halo)/stride) because their
        receptive fields end before the pad junction (halo >= rf/2, and the
        junction's layer-1 outputs are identical to the unpadded forward's own
        conv zero padding);
      * a TAIL pass on x[:, s:t] with s = c - halo — its right edge is the
        TRUE recording end, so edge behavior is exact; outputs >= halo past
        its left cut are uncorrupted.  s is stride-aligned so pooling phase
        matches, and len = t - s is bounded in [2*halo, 2*halo + stride),
        giving at most ``stride`` distinct tail shapes.

    Recordings shorter than 2*halo + stride run the raw forward (one compile
    per distinct short length).  Returns (1, stride*floor(t/stride), classes)
    numpy logits identical to ``forward(x)``.
    """
    assert halo % stride == 0 and bucket % stride == 0
    t = x.shape[1]
    if t < 2 * halo + stride:
        return np.asarray(forward(x))
    t_out = stride * (t // stride)
    c = stride * ((t - halo) // stride)

    b = bucket * (-(-t // bucket))
    xp = jnp.pad(x, ((0, 0), (0, b - t)) + ((0, 0),) * (x.ndim - 2))
    main = np.asarray(forward(xp))  # (1, b, classes)

    s = c - halo
    tail = np.asarray(forward(x[:, s:t]))  # (1, t_out - s, classes)
    return np.concatenate([main[:, :c], tail[:, c - s:t_out - s]], axis=1)
