"""Training orchestration and whole-recording evaluation.

Reference: train.py:12-132 (eval + train).  The hot loop is the fused device
step from sed_tpu.data.device_pipeline; this module owns epochs, logging
(identical im/sec definition, train.py:113-115), periodic eval on whole
validation recordings, diagnostic images, and checkpoints.
"""

from __future__ import annotations

import os
from time import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sed_tpu.configs import SpectrogramConfig, WaveformConfig
from sed_tpu.data.device_pipeline import (
    make_spectrogram_train_step,
    make_waveform_train_step,
    spectrogram_buffers_from_dataset,
    waveform_buffers_from_dataset,
)
from sed_tpu.train.checkpoint import save_checkpoint
from sed_tpu.train.loss import weighted_bce_with_logits_np
from sed_tpu.train.optim import make_optimizer
from sed_tpu.train.state import init_state, make_eval_forward
from sed_tpu.utils.metrics import calculate_metrics
from sed_tpu.utils.plotting import plot_sample_features
from sed_tpu.utils.progress import ProgressPlotter


def _sigmoid_np(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float64)
    return np.where(x >= 0, 1.0 / (1.0 + np.exp(-x)),
                    np.exp(x) / (1.0 + np.exp(x))).astype(np.float32)


def evaluate(
    model,
    state,
    dataset,
    mode: str,
    pos_weight: float,
    outputs_dir: str,
    iteration: int,
    limit_val_samples: Optional[int] = None,
    make_plots: bool = True,
    cfg=None,
):
    """Whole-recording eval (reference: train.py:12-74).

    Spectrogram mode: each validation recording goes through the fully
    convolutional model as one (1, frames, mel, channels) batch — bucketed
    with an exact tail pass (parallel.time_shard.bucketed_forward_exact), so
    mixed-length validation sets compile O(#buckets) programs instead of one
    per distinct recording length (SURVEY.md §7 "hard parts").  Waveform
    mode: a recording is a batch of hop-strided frames, each scoring one
    logit; the batch axis is padded to a bucket (frames are independent, so
    batch padding is output-preserving).  Per-recording losses are computed
    on host (numpy) to keep variable shapes off the device entirely.
    Sigmoid is applied here since models emit logits (train.py:44).
    Returns (losses, recall_sets, precision_sets, APs, event_metrics) —
    the last a per-recording list of onset/offset-collar event-based
    P/R/F1 dicts (utils/event_metrics.py; beyond the reference, which
    evaluates frames only — metric_utils.py:4-37), or [] when ``cfg`` is
    None (no frame rate to place event times on).
    """
    forward = make_eval_forward(model)
    losses, recal_sets, precision_sets, aps = [], [], [], []
    event_ms = []
    debug = []  # (input, output_scores, target, name)

    model_config = getattr(model, "model_config", None)
    if mode == "spectogram" and model_config is not None:
        from sed_tpu.models.cnn import num_pools
        from sed_tpu.parallel.time_shard import (
            bucketed_forward_exact,
            pool_product,
            receptive_field,
        )

        stride = pool_product(model_config)
        # The exactness argument assumes the interpolate ratio matches the
        # actual time decimation (true for every shipped config; the
        # reference's num_pools quirk could break it for exotic ones).
        if 2 ** num_pools(model_config) != stride:
            model_config = None
        else:
            rf = receptive_field(model_config)
            halo = stride * (-(-(rf // 2 + 1) // stride))

    for input_np, target_np, name in dataset.get_validation_sampler(limit_val_samples):
        if mode == "spectogram":
            # (1, channels, frames, mel) -> NHWC
            x = jnp.transpose(jnp.asarray(input_np), (0, 2, 3, 1))
            if model_config is not None:
                logits = bucketed_forward_exact(
                    lambda b: forward(state.params, state.batch_stats, b),
                    x, stride, halo,
                )
            else:
                logits = np.asarray(forward(state.params, state.batch_stats, x))
            loss = weighted_bce_with_logits_np(
                logits, np.asarray(target_np), pos_weight, multi_frame=True
            )
            scores = _sigmoid_np(logits)[0]
            target = np.asarray(target_np)[0]
            plot_input = np.asarray(input_np)[0]
        else:
            # (frames, channels, samples) -> NWC batch of frames
            x = jnp.transpose(jnp.asarray(input_np), (0, 2, 1))
            n = x.shape[0]
            bucket = 32
            padded = bucket * (-(-n // bucket))
            if padded != n:
                x = jnp.pad(x, ((0, padded - n), (0, 0), (0, 0)))
            logits = np.asarray(forward(state.params, state.batch_stats, x))[:n]
            loss = weighted_bce_with_logits_np(
                logits, np.asarray(target_np), pos_weight, multi_frame=False
            )
            scores = _sigmoid_np(logits)
            target = np.asarray(target_np)
            if target.ndim == 1:  # scalar labels -> (frames, 1) like the scores
                target = target.reshape(-1, 1)
            plot_input = np.transpose(np.asarray(input_np), (1, 0, 2))

        recal_vals, precision_vals, ap = calculate_metrics(scores, target)
        losses.append(float(loss))
        recal_sets.append(recal_vals)
        precision_sets.append(precision_vals)
        aps.append(ap)
        if cfg is not None:
            from sed_tpu.utils.event_metrics import (
                event_metrics_per_class_from_matrices,
                segment_metrics_from_matrices,
                segment_metrics_per_class_from_matrices,
                _pooled,
            )
            from sed_tpu.utils.metrics import calculate_metrics_per_class

            # Truncate to the common frame count — the same odd/even pooling
            # mismatch rule the loss applies (reference utils/common.py:20-22).
            n = min(scores.shape[0], target.shape[0])
            # One extraction+matching pass serves both views: micro pools
            # the per-class counts, macro averages the class-wise metrics.
            per_class = event_metrics_per_class_from_matrices(
                scores[:n], target[:n], cfg.frames_per_second)
            m = _pooled({k: sum(d[k] for d in per_class)
                         for k in ("tp", "fp", "fn")})
            m["per_class"] = per_class
            # sed_eval's segment view (1 s segments): F1 + error rate.
            m["segment"] = segment_metrics_from_matrices(
                scores[:n], target[:n], cfg.frames_per_second)
            m["segment_per_class"] = segment_metrics_per_class_from_matrices(
                scores[:n], target[:n], cfg.frames_per_second)
            m["frame_ap_per_class"] = calculate_metrics_per_class(
                scores[:n], target[:n])[2].tolist()
            event_ms.append(m)
        debug.append((plot_input, scores, target, name))

    if make_plots and debug:
        _plot_best_worst(debug, losses, aps, mode, outputs_dir, iteration, cfg)
    return losses, recal_sets, precision_sets, aps, event_ms


def _plot_best_worst(debug, losses, aps, mode, outputs_dir, iteration, cfg):
    """Best/worst sample images by loss and AP (reference: train.py:60-72)."""
    n = len(debug)
    for metric_name, values, named_indices in [
        ("loss", losses, [("worst", -1), ("2-worst", -2), ("3-worst", -3), ("best", 0)]),
        ("AP", aps, [("worst", 0), ("best", -1)]),
    ]:
        order = np.argsort(values)
        for rank_name, idx in named_indices:
            if abs(idx) > n - (idx >= 0):
                continue  # fewer validation samples than ranks requested
            sample_idx = order[idx]
            plot_input, scores, target, name = debug[sample_idx]
            plot_sample_features(
                plot_input,
                mode=mode,
                output=scores,
                target=target,
                file_name=f"{name} {metric_name} {values[sample_idx]:.2f}",
                plot_path=os.path.join(outputs_dir, "images", f"Iter-{iteration}",
                                       f"{metric_name}-{rank_name}.png"),
                cfg=cfg,
            )


def train(
    model,
    dataset,
    mode: str,
    num_steps: int,
    lr: float,
    log_freq: int,
    outputs_dir: str,
    batch_size: int = 128,
    pos_weight: float = 5.0,
    augment: bool = False,
    preprocessed_mode: str = "logMel",
    cfg=None,
    seed: int = 0,
    initial_state=None,
    make_plots: bool = True,
    limit_val_samples: Optional[int] = 3,
    profile_dir: Optional[str] = None,
    mesh=None,
    steps_per_call: int = 1,
):
    """Train loop (reference: train.py:77-132) on the fused device pipeline.

    ``mesh``: a jax.sharding.Mesh for data-parallel training — the per-step
    start-index batch is sharded over the 'data' axis, state and packed
    buffers are replicated, and XLA inserts the gradient/BatchNorm ICI
    all-reduces (sed_tpu/parallel/data_parallel.py).  batch_size is the
    GLOBAL batch and must divide by the mesh size.

    ``steps_per_call``: run K fused steps per dispatch via lax.scan
    (sed_tpu.data.device_pipeline.make_multi_step) — amortizes host dispatch
    latency; num_steps and log_freq must be multiples of K.

    ``profile_dir`` captures a jax.profiler trace of steps 10-20 (the
    reference has only an im/sec counter, train.py:113-115; this adds real
    tracing per SURVEY.md §5).  Returns the final TrainState.
    """
    assert mode in ("spectogram", "waveform")
    print("Training:")
    print("\t- Using device: ", jax.devices()[0])
    os.makedirs(os.path.join(outputs_dir, "checkpoints"), exist_ok=True)

    tx = make_optimizer(lr)
    plotter = ProgressPlotter()

    if steps_per_call > 1 and (num_steps % steps_per_call or log_freq % steps_per_call):
        raise ValueError("num_steps and log_freq must be multiples of steps_per_call")
    if steps_per_call > 1 and initial_state is not None \
            and int(initial_state.step) % steps_per_call:
        raise ValueError(
            f"resumed step {int(initial_state.step)} is not a multiple of "
            f"steps_per_call={steps_per_call}"
        )
    use_mesh = mesh is not None
    if use_mesh and batch_size % mesh.devices.size != 0:
        raise ValueError(
            f"global batch_size={batch_size} must be divisible by the mesh "
            f"size {mesh.devices.size}"
        )
    needs_raw = use_mesh or steps_per_call > 1
    if mode == "spectogram":
        cfg = cfg or SpectrogramConfig()
        buffers = spectrogram_buffers_from_dataset(dataset)
        channels = buffers.features.shape[0]
        # Model input width is mel_bins post-transform (Complex mode narrows
        # freq_bins -> mel inside the fused step).
        sample = jnp.zeros((batch_size, cfg.train_crop_size, cfg.mel_bins, channels), jnp.float32)
        step_fn = make_spectrogram_train_step(
            model, tx, cfg, pos_weight, preprocessed_mode, augment, jit=not needs_raw
        )
    else:
        cfg = cfg or WaveformConfig()
        buffers = waveform_buffers_from_dataset(dataset)
        channels = buffers.waveform.shape[0]
        sample = jnp.zeros((batch_size, cfg.frame_size, channels), jnp.float32)
        step_fn = make_waveform_train_step(model, tx, cfg, pos_weight, augment,
                                           jit=not needs_raw)
    if steps_per_call > 1:
        from sed_tpu.data.device_pipeline import make_multi_step

        # Under a mesh, keep the multi-step raw: shard_train_step below jits
        # it with the (K, batch) block sharded on the batch axis.
        step_fn = make_multi_step(step_fn, steps_per_call, jit=not use_mesh)
    if use_mesh:
        from sed_tpu.parallel.data_parallel import shard_train_step
        from sed_tpu.parallel.mesh import replicate as _replicate

        step_fn = shard_train_step(step_fn, mesh, steps_per_call=steps_per_call)

    state = initial_state if initial_state is not None else init_state(
        model, jax.random.key(seed), sample, tx
    )
    if use_mesh:
        state = _replicate(mesh, state)
        buffers = _replicate(mesh, buffers)

    from sed_tpu.models.describe import describe_cnn, describe_m5

    if mode == "spectogram" and hasattr(model, "model_config"):
        print(describe_cnn(model, state.params, cfg))
    elif mode == "waveform":
        print(describe_m5(state.params))

    rng = jax.random.key(seed + 1)
    iterations = int(state.step)
    start_iterations = iterations
    epoch = 0
    training_start_time = time()

    if len(dataset) < batch_size:
        raise ValueError(
            f"dataset has {len(dataset)} training start indices, fewer than "
            f"batch_size={batch_size}; no full batch can be formed"
        )

    # Per-step losses stay on device; they are only pulled to the host at log
    # points so async dispatch keeps the accelerator queue full.
    pending_losses = []

    starts_block = []  # accumulates batches for steps_per_call > 1
    profiling = False

    while iterations < num_steps:
        for starts in dataset.epoch_start_indices(batch_size):
            if profile_dir is not None and not profiling and iterations >= 10:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            if steps_per_call > 1:
                starts_block.append(starts)
                if len(starts_block) < steps_per_call:
                    continue
                rng, step_rng = jax.random.split(rng)
                block = jnp.asarray(np.stack(starts_block))
                if use_mesh:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    from sed_tpu.parallel.mesh import DATA_AXIS

                    block = jax.device_put(
                        block, NamedSharding(mesh, P(None, DATA_AXIS)))
                    step_rng = _replicate(mesh, step_rng)
                state, losses = step_fn(state, buffers, block, step_rng)
                starts_block = []
                iterations += steps_per_call
                pending_losses.extend([losses[i] for i in range(steps_per_call)])
            else:
                rng, step_rng = jax.random.split(rng)
                starts_dev = jnp.asarray(starts)
                if use_mesh:
                    from sed_tpu.parallel.mesh import shard_batch

                    starts_dev = shard_batch(mesh, starts_dev)
                    step_rng = _replicate(mesh, step_rng)
                state, loss = step_fn(state, buffers, starts_dev, step_rng)
                iterations += 1
                pending_losses.append(loss)
            if profiling and iterations >= 20:
                jax.block_until_ready(pending_losses[-1])
                jax.profiler.stop_trace()
                profiling = False
                profile_dir = None

            if iterations % log_freq == 0:
                for pl_loss in pending_losses:
                    plotter.report_train_loss(float(pl_loss))
                last_loss = float(pending_losses[-1])
                pending_losses = []
                # Same definition as the reference (train.py:113-115), counting
                # only steps run in THIS session (matters after --resume auto).
                im_sec = (iterations - start_iterations) * batch_size / (
                    time() - training_start_time
                )
                print(f"epoch: {epoch}, step: {iterations}, loss: {last_loss:.2f}, "
                      f"im/sec: {im_sec:.1f}")

                val_losses, recal_sets, precision_sets, aps, event_ms = \
                    evaluate(
                        model, state, dataset, mode, pos_weight, outputs_dir,
                        iterations, limit_val_samples=limit_val_samples,
                        make_plots=make_plots, cfg=cfg,
                    )
                if val_losses:
                    plotter.report_validation_metrics(
                        val_losses, recal_sets, precision_sets, aps, iterations
                    )
                    if event_ms:
                        from sed_tpu.utils.event_metrics import (
                            macro_average_classes,
                            micro_average,
                            micro_average_segments,
                        )

                        plotter.report_event_metrics(micro_average(event_ms))
                        plotter.report_segment_metrics(micro_average_segments(
                            [m["segment"] for m in event_ms]))
                        plotter.report_per_class_metrics(
                            frame_ap_per_class=np.mean(
                                [m["frame_ap_per_class"] for m in event_ms],
                                axis=0).tolist(),
                            event_macro=macro_average_classes(
                                [m["per_class"] for m in event_ms]),
                            segment_macro=macro_average_classes(
                                [m["segment_per_class"] for m in event_ms]),
                        )
                    plotter.record(outputs_dir)  # metrics.jsonl always written
                    if make_plots:
                        plotter.plot(outputs_dir)
                save_checkpoint(state, outputs_dir, iterations)

            if iterations >= num_steps:
                break
        epoch += 1

    return state
