"""High-level batched inference API.

BASELINE config #5: many concurrent 60 s clips.  Equal-length recordings ride
the batch axis through one jit program (featurize -> CNN -> sigmoid); with a
mesh, the batch axis is sharded across chips (no cross-chip communication —
recordings are independent).  A single very long recording instead goes
through sed_tpu.parallel.time_shard.windowed_forward.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sed_tpu.configs import SpectrogramConfig, DEFAULT_SPECTROGRAM
from sed_tpu.ops.featurizer import logmel_features_batch


def make_batch_predictor(
    model,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    mesh=None,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    featurizer_precision=None,
):
    """Build a jitted (params, batch_stats, waveforms) -> scores function.

    waveforms: (batch, samples, channels) float32; scores:
    (batch, frames', classes) sigmoid confidences.  With ``mesh`` the batch
    axis is sharded over the 'data' axis.  ``featurizer_precision``: None /
    'parity' = the golden-tested featurizer; 'fast' / 'turbo' = opt-in
    reduced-precision FFT serving tiers (hardware fidelity record:
    benchmarks/FAST_FEATURIZER.json).
    """
    from sed_tpu.ops.featurizer import resolve_featurizer_precision

    prec = resolve_featurizer_precision(featurizer_precision)
    mean_arr = None if mean is None else jnp.asarray(np.asarray(mean, np.float32))
    std_arr = None if std is None else jnp.asarray(np.asarray(std, np.float32))

    # MobileNetV1 emits sigmoid confidences IN its forward (reference
    # spectogram_models.py:117); applying sigmoid again would compress all
    # scores into [0.5, 0.731].
    emits_scores = type(model).__name__ == "MobileNetV1"

    def forward(params, batch_stats, waveforms):
        feats = logmel_features_batch(waveforms, cfg,
                                      pallas_precision=prec)  # (B, C, T, M)
        if mean_arr is not None:
            feats = (feats - mean_arr) / std_arr
        x = jnp.transpose(feats, (0, 2, 3, 1))               # NHWC
        out = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
        return out if emits_scores else jax.nn.sigmoid(out)

    if mesh is not None:
        from sed_tpu.parallel.data_parallel import shard_inference

        return shard_inference(forward, mesh)
    return jax.jit(forward)


def batch_predict_files(
    model,
    state,
    audio_paths,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    mesh=None,
    mean=None,
    std=None,
    featurizer_precision=None,
):
    """Read many audio files, group by equal sample length, and score each.

    Returns {path: (frames', classes) numpy scores}.  One compile per distinct
    length group; groups are padded to a multiple of the mesh size when
    sharded.
    """
    from sed_tpu.io.audio import read_multichannel_audio

    predictor = make_batch_predictor(model, cfg, mesh, mean, std,
                                     featurizer_precision=featurizer_precision)
    by_len = {}
    for path in audio_paths:
        wav = read_multichannel_audio(path, target_fs=cfg.working_sample_rate, cfg=cfg)
        by_len.setdefault(wav.shape[0], []).append((path, wav.astype(np.float32)))

    results = {}
    n_dev = 1 if mesh is None else mesh.devices.size

    def staged_batch(group):
        batch = np.stack([w for _, w in group])
        pad = (-len(batch)) % n_dev
        if pad:
            batch = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)])
        if mesh is not None:
            from sed_tpu.parallel.mesh import shard_batch

            return shard_batch(mesh, jnp.asarray(batch))
        return jax.device_put(jnp.asarray(batch))

    # Double-buffer: a worker thread uploads the next group's waveforms while
    # the device scores the current one (host->device copies are the
    # bottleneck for long-form batches; see bench.py's e2e methodology).
    from concurrent.futures import ThreadPoolExecutor

    groups = [g for _, g in sorted(by_len.items())]
    with ThreadPoolExecutor(1) as ex:
        fut = ex.submit(staged_batch, groups[0]) if groups else None
        for gi, group in enumerate(groups):
            batch = fut.result()
            if gi + 1 < len(groups):
                fut = ex.submit(staged_batch, groups[gi + 1])
            if mesh is not None:
                from sed_tpu.parallel.mesh import replicate

                scores = np.asarray(predictor(
                    replicate(mesh, state.params),
                    replicate(mesh, state.batch_stats), batch,
                ))
            else:
                scores = np.asarray(predictor(state.params, state.batch_stats, batch))
            for i, (path, _) in enumerate(group):
                results[path] = scores[i]
    return results


def make_batch_evaluator(
    model,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    mesh=None,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    pos_weight: float = 5.0,
):
    """Fused device evaluator: one dispatch scores AND grades a whole
    equal-length validation batch.

    (params, batch_stats, waveforms, targets) -> (scores, per-recording
    losses, recalls (B, 21), precisions (B, 21), APs (B,)) — the 21-threshold
    metric sweep (utils/metric_utils.py:4-33 semantics via
    sed_tpu.utils.metrics.calculate_metrics_jax) runs on device, vmapped over
    recordings, so a full validation pass costs a single host round trip
    instead of one per recording — the eval analog of the fused train step.
    Targets must already be truncated/padded to the model's output frame
    count (min-frame truncation is applied on the frame axis like
    utils/common.py:20-22).
    """
    from sed_tpu.train.loss import weighted_bce_with_logits
    from sed_tpu.utils.metrics import calculate_metrics_jax

    mean_arr = None if mean is None else jnp.asarray(np.asarray(mean, np.float32))
    std_arr = None if std is None else jnp.asarray(np.asarray(std, np.float32))

    def evaluate(params, batch_stats, waveforms, targets):
        feats = logmel_features_batch(waveforms, cfg)
        if mean_arr is not None:
            feats = (feats - mean_arr) / std_arr
        x = jnp.transpose(feats, (0, 2, 3, 1))
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=False)
        n = min(logits.shape[1], targets.shape[1])
        logits = logits[:, :n]
        t = targets[:, :n]
        scores = jax.nn.sigmoid(logits)
        losses = jax.vmap(
            lambda lg, tg: weighted_bce_with_logits(lg[None], tg[None],
                                                    pos_weight, True)
        )(logits, t)
        recalls, precisions, aps = jax.vmap(calculate_metrics_jax)(scores, t)
        return scores, losses, recalls, precisions, aps

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from sed_tpu.parallel.mesh import DATA_AXIS

        rep = NamedSharding(mesh, P())
        sharded = NamedSharding(mesh, P(DATA_AXIS))
        return jax.jit(evaluate,
                       in_shardings=(rep, rep, sharded, sharded),
                       out_shardings=(sharded,) * 5)
    return jax.jit(evaluate)
