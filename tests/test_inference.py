"""Batched inference API: equal-length grouping, mesh sharding, parity with
per-file inference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.io import wavfile

from sed_tpu.configs import SpectrogramConfig
from sed_tpu.inference import batch_predict_files, make_batch_predictor
from sed_tpu.models.cnn import CnnAvgPooling
from sed_tpu.parallel.mesh import create_mesh
from sed_tpu.train.optim import make_optimizer
from sed_tpu.train.state import init_state

CFG = SpectrogramConfig(working_sample_rate=8000, time_margin=0.33)


def _model_state():
    model = CnnAvgPooling(classes_num=1, model_config=((8, 2), (16, 2)))
    tx = make_optimizer(1e-3)
    sample = jnp.zeros((1, CFG.train_crop_size, CFG.mel_bins, 1))
    state = init_state(model, jax.random.key(0), sample, tx)
    return model, state


def _write_clips(tmp_path, lengths):
    rng = np.random.default_rng(0)
    paths = []
    for i, sec in enumerate(lengths):
        n = int(sec * CFG.working_sample_rate)
        sig = (0.1 * rng.standard_normal(n)).astype(np.float32)
        p = str(tmp_path / f"clip{i}_{sec}s.wav")
        wavfile.write(p, CFG.working_sample_rate, sig)
        paths.append(p)
    return paths


def test_batch_predict_groups_by_length(tmp_path):
    model, state = _model_state()
    paths = _write_clips(tmp_path, [12, 12, 15, 12, 15])
    results = batch_predict_files(model, state, paths, CFG)
    assert set(results) == set(paths)
    # Tiny 2-block model: two /2 pools then x4 interpolation.
    frames_12 = ((1 + 12 * 3) // 2 // 2) * 4
    frames_15 = ((1 + 15 * 3) // 2 // 2) * 4
    for p, scores in results.items():
        expect = frames_12 if "_12s" in p else frames_15
        assert scores.shape == (expect, 1)
        assert ((scores >= 0) & (scores <= 1)).all()


def test_batch_predict_mesh_matches_single(tmp_path):
    model, state = _model_state()
    paths = _write_clips(tmp_path, [12] * 5)  # 5 files on an 8-device mesh (pads)
    single = batch_predict_files(model, state, paths, CFG)
    mesh = create_mesh(8)
    sharded = batch_predict_files(model, state, paths, CFG, mesh=mesh)
    for p in paths:
        np.testing.assert_allclose(sharded[p], single[p], atol=1e-5)


def test_predictor_normalization():
    model, state = _model_state()
    rng = np.random.default_rng(1)
    wav = (0.1 * rng.standard_normal((2, 12 * CFG.working_sample_rate, 1))).astype(np.float32)
    mean = np.zeros(CFG.mel_bins, np.float32)
    std = 2.0 * np.ones(CFG.mel_bins, np.float32)
    pred_raw = make_batch_predictor(model, CFG)
    pred_norm = make_batch_predictor(model, CFG, mean=mean, std=std)
    a = np.asarray(pred_raw(state.params, state.batch_stats, jnp.asarray(wav)))
    b = np.asarray(pred_norm(state.params, state.batch_stats, jnp.asarray(wav)))
    assert a.shape == b.shape
    assert not np.allclose(a, b)  # normalization changes features


def test_export_roundtrip(tmp_path):
    import jax.numpy as jnp

    from sed_tpu.export import export_scorer, load_scorer

    model, state = _model_state()
    blob = export_scorer(model, state.params, state.batch_stats, batch=2, frames=32, cfg=CFG)
    path = tmp_path / "scorer.bin"
    path.write_bytes(blob)

    scorer = load_scorer(path.read_bytes())
    x = np.random.default_rng(0).standard_normal((2, 32, CFG.mel_bins, 1)).astype(np.float32)
    got = scorer(x)
    ref = np.asarray(jax.nn.sigmoid(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), train=False)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_batch_evaluator_matches_host_metrics():
    """make_batch_evaluator (fused device eval): per-recording losses, P/R
    sweeps, and APs from one dispatch must equal the host-side path
    (evaluate-loop semantics: sigmoid here, min-frame truncation, 21-threshold
    sweep)."""
    import jax

    from sed_tpu.inference import make_batch_evaluator, make_batch_predictor
    from sed_tpu.models.cnn import CnnAvgPooling
    from sed_tpu.train.loss import weighted_bce_with_logits_np
    from sed_tpu.train.optim import make_optimizer
    from sed_tpu.train.state import init_state
    from sed_tpu.utils.metrics import calculate_metrics

    cfg = SpectrogramConfig(working_sample_rate=8000, time_margin=0.33)
    rng = np.random.default_rng(0)
    b, seconds = 3, 6
    waveforms = rng.standard_normal(
        (b, seconds * cfg.working_sample_rate, 1)).astype(np.float32) * 0.1
    n_frames = 1 + seconds * cfg.frames_per_second
    targets = (rng.random((b, n_frames, 1)) > 0.7).astype(np.float32)

    model = CnnAvgPooling(classes_num=1, model_config=((8, 2), (16, 2)))
    state = init_state(model, jax.random.key(0),
                       jnp.zeros((1, cfg.train_crop_size, cfg.mel_bins, 1)),
                       make_optimizer(1e-3))

    ev = make_batch_evaluator(model, cfg)
    scores, losses, recalls, precisions, aps = jax.tree.map(
        np.asarray,
        ev(state.params, state.batch_stats, jnp.asarray(waveforms),
           jnp.asarray(targets)))

    predictor = make_batch_predictor(model, cfg)
    host_scores = np.asarray(
        predictor(state.params, state.batch_stats, jnp.asarray(waveforms)))
    n = min(host_scores.shape[1], targets.shape[1])
    for i in range(b):
        r, p, ap = calculate_metrics(host_scores[i, :n], targets[i, :n])
        np.testing.assert_allclose(aps[i], ap, atol=1e-6)
        np.testing.assert_allclose(recalls[i], r, atol=1e-6)
        np.testing.assert_allclose(precisions[i], p, atol=1e-6)
        logits = np.log(host_scores[i, :n]) - np.log1p(-host_scores[i, :n])
        expect_loss = weighted_bce_with_logits_np(
            logits[None], targets[i:i + 1, :n], 5.0, True)
        np.testing.assert_allclose(losses[i], expect_loss, rtol=1e-4)
    np.testing.assert_allclose(scores[:, :n], host_scores[:, :n], atol=1e-6)


def test_aot_pipeline_roundtrip():
    """AOT serving artifact (export.aot_export_pipeline): the full int16
    PCM -> featurize -> CNN -> sigmoid graph, compiled + serialized, must
    reload in-process and match the direct jit pipeline (f32 exactly, int8
    within the PTQ fidelity bound)."""
    import jax.numpy as jnp

    from sed_tpu.export import (aot_export_pipeline, cnn_serving,
                                load_aot_pipeline, quantized_serving)
    from sed_tpu.models.quantize import quantize_cnn
    from sed_tpu.ops.featurizer import logmel_features_batch

    model, state = _model_state()
    B, sec = 2, 4
    samples = CFG.working_sample_rate * sec
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal((B, samples, 1)) * 4000).astype(np.int16)

    feats = logmel_features_batch(jnp.asarray(pcm), CFG)
    ref = np.asarray(jax.nn.sigmoid(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.transpose(feats, (0, 2, 3, 1)), train=False)))

    score_fn, weights = cnn_serving(model, state.params, state.batch_stats)
    call = load_aot_pipeline(aot_export_pipeline(
        score_fn, weights, B, samples, CFG, use_pallas=False))
    np.testing.assert_allclose(call(pcm), ref, atol=1e-6)
    with pytest.raises(ValueError, match="expects audio"):
        call(pcm[:1])

    q = quantize_cnn(model, state.params, state.batch_stats,
                     [np.asarray(jnp.transpose(feats, (0, 2, 3, 1)))])
    sfn, w = quantized_serving(q)
    call_q = load_aot_pipeline(aot_export_pipeline(
        sfn, w, B, samples, CFG, use_pallas=False))
    assert float(np.abs(call_q(pcm) - ref).max()) < 0.05


def test_aot_m5_and_generic_export():
    """aot_export_fn generalizes the artifact path to the waveform family:
    an M5 window scorer round-trips and matches the direct forward."""
    import jax.numpy as jnp

    from sed_tpu.configs import WaveformConfig
    from sed_tpu.export import aot_export_fn, load_aot_pipeline, m5_serving
    from sed_tpu.models.m5 import M5

    wcfg = WaveformConfig(working_sample_rate=8000, time_margin=0.33)
    model = M5(classes_num=1)
    B = 4
    x = (np.random.default_rng(0).standard_normal(
        (B, wcfg.frame_size, 1)) * 0.1).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)

    score_fn, weights = m5_serving(model, variables["params"],
                                   variables["batch_stats"])
    blob = aot_export_fn(score_fn, weights,
                         jax.ShapeDtypeStruct(x.shape, jnp.float32))
    call = load_aot_pipeline(blob)
    ref = np.asarray(jax.nn.sigmoid(model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False)))
    np.testing.assert_allclose(call(x), ref, atol=1e-6)


def test_aot_sharded_pipeline_roundtrip():
    """Multi-device AOT artifact: the serving graph compiled over an 8-device
    data mesh (batch sharded, weights replicated) serializes, reloads, and
    matches the single-device artifact — sharded serving with zero load-time
    compilation."""
    import jax.numpy as jnp

    from sed_tpu.export import (aot_export_pipeline, cnn_serving,
                                load_aot_pipeline)

    model, state = _model_state()
    B, sec = 8, 4
    samples = CFG.working_sample_rate * sec
    rng = np.random.default_rng(3)
    pcm = (rng.standard_normal((B, samples, 1)) * 4000).astype(np.int16)

    score_fn, weights = cnn_serving(model, state.params, state.batch_stats)
    plain = load_aot_pipeline(aot_export_pipeline(
        score_fn, weights, B, samples, CFG, use_pallas=False))
    sharded = load_aot_pipeline(aot_export_pipeline(
        score_fn, weights, B, samples, CFG, use_pallas=False,
        mesh=create_mesh()))
    np.testing.assert_allclose(sharded(pcm), plain(pcm), atol=1e-5)


def test_aot_m5_pipeline_roundtrip():
    """M5 AOT artifact (export.aot_export_m5_pipeline): int16 PCM ->
    hop-strided windows -> M5 -> sigmoid, compiled + serialized, must reload
    and equal the offline hop-split scoring."""
    import jax
    import jax.numpy as jnp

    from sed_tpu.configs import WaveformConfig
    from sed_tpu.data.events import frame_coverage_labels
    from sed_tpu.export import (aot_export_m5_pipeline, load_aot_pipeline,
                                m5_serving)
    from sed_tpu.models.m5 import M5
    from sed_tpu.train.optim import make_optimizer
    from sed_tpu.train.state import init_state

    wcfg = WaveformConfig(working_sample_rate=8000, time_margin=0.33)
    model = M5(classes_num=1)
    state = init_state(model, jax.random.key(0),
                       jnp.zeros((1, wcfg.frame_size, 1)),
                       make_optimizer(1e-4))
    score_fn, weights = m5_serving(model, state.params, state.batch_stats)

    B, samples = 2, 4 * wcfg.frame_size
    blob = aot_export_m5_pipeline(score_fn, weights, B, samples, wcfg)
    call = load_aot_pipeline(blob)

    rng = np.random.default_rng(0)
    pcm = (3000 * rng.standard_normal((B, samples, 1))).astype(np.int16)
    got = call(pcm)

    for b in range(B):
        frames, _ = frame_coverage_labels(
            (pcm[b, :, 0].astype(np.float32) / 32768.0)[None], [], [], wcfg)
        ref = np.asarray(score_fn(
            weights, jnp.asarray(np.transpose(frames, (0, 2, 1)))))
        assert got[b].shape == ref.shape
        np.testing.assert_allclose(got[b], ref, atol=1e-6, err_msg=str(b))
