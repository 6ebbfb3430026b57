"""Model export for serving: StableHLO artifacts and AOT compiled executables.

Production-deployment capability beyond the reference (its serving story is
"load a .pth into the same code", infer.py:27-37).  Two artifact tiers:

  * **StableHLO** (jax.export, `export_scorer`/`export_quantized_scorer`):
    portable across compiler versions — but the target still COMPILES it, so
    cold start pays the full XLA compile (638 s for the full kernel stack
    through this harness's remote compiler, BENCH_r02.json).
  * **AOT executables** (`aot_export_pipeline`/`load_aot_pipeline`):
    the fully compiled TPU binary serialized via
    jax.experimental.serialize_executable, covering the WHOLE serving graph —
    int16 PCM -> Pallas featurizer -> (f32 or int8) CNN -> sigmoid scores —
    with the weights shipped alongside.  A fresh process loads and runs it
    with NO compilation (seconds, measured in benchmarks/SERVING_AOT.json),
    which is the real cold-start fix.  The binary is specific to the compiled
    topology/compiler version (standard AOT caveat).
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from sed_tpu.configs import SpectrogramConfig, DEFAULT_SPECTROGRAM


def export_scorer(
    model,
    params,
    batch_stats,
    batch: int,
    frames: int,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
) -> bytes:
    """Serialize a (batch, frames, mel, 1) -> (batch, frames', classes)
    sigmoid scorer with the weights baked in."""
    from jax import export as jax_export

    def score(x):
        logits = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
        return jax.nn.sigmoid(logits)

    spec = jax.ShapeDtypeStruct((batch, frames, cfg.mel_bins, 1), jnp.float32)
    exported = jax_export.export(jax.jit(score))(spec)
    return exported.serialize()


def export_quantized_scorer(
    qparams,
    batch: int,
    frames: int,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
) -> bytes:
    """Serialize the int8 PTQ scorer (models/quantize.py) as a StableHLO
    artifact — the int8 weights and scales are baked in, so the serving
    binary needs neither the model definition nor the quantizer."""
    from jax import export as jax_export

    from sed_tpu.models.quantize import quantized_scores

    def score(x):
        return quantized_scores(qparams, x)

    spec = jax.ShapeDtypeStruct((batch, frames, cfg.mel_bins, 1), jnp.float32)
    exported = jax_export.export(jax.jit(score))(spec)
    return exported.serialize()


# ---------------------------------------------------------------------------
# AOT: serialized compiled executables (no compile at load time)
# ---------------------------------------------------------------------------

def _partition_weights(weights):
    """Split a weights pytree into traced array leaves and static (non-array)
    leaves such as pool sizes in int8 qparams; returns
    (array_leaves, rebuild(array_args) -> pytree)."""
    leaves, treedef = jax.tree.flatten(weights)
    is_arr = [isinstance(l, (jnp.ndarray, np.ndarray)) for l in leaves]
    arr_leaves = [l for l, a in zip(leaves, is_arr) if a]

    def rebuild(arr_args):
        it = iter(arr_args)
        merged = [next(it) if a else l for l, a in zip(leaves, is_arr)]
        return jax.tree.unflatten(treedef, merged)

    return arr_leaves, rebuild


def aot_compile_fn(fn, weights, input_spec, mesh=None, input_pspec=None):
    """AOT-compile ``fn(weights, x) -> y``; returns ``(compiled, arr_leaves)``.

    The compiled executable's call signature is ``compiled(x, *arr_leaves)``
    (non-array weight leaves are compiled in as static).  Use
    :func:`serialize_compiled` to ship it — callers that both MEASURE and
    EXPORT a program (e.g. bench.py's AOT-first headline) compile once here
    and serialize the very executable they timed.
    """
    arr_leaves, rebuild = _partition_weights(weights)

    def flat_fn(x, *leaf_args):
        return fn(rebuild(leaf_args), x)

    leaf_specs = [jax.ShapeDtypeStruct(np.shape(l), np.asarray(l).dtype)
                  for l in arr_leaves]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        ip = (input_pspec if input_pspec is not None
              else PartitionSpec(mesh.axis_names[0]))
        in_shardings = ((NamedSharding(mesh, ip),)
                        + tuple(NamedSharding(mesh, PartitionSpec())
                                for _ in leaf_specs))
        jitted = jax.jit(flat_fn, in_shardings=in_shardings)
    else:
        jitted = jax.jit(flat_fn)
    compiled = jitted.lower(input_spec, *leaf_specs).compile()
    return compiled, arr_leaves


def serialize_compiled(compiled, arr_leaves, input_spec, meta=None) -> bytes:
    """Serialize an :func:`aot_compile_fn` executable + its weight leaves
    into the pickled sed_tpu-aot-v1 artifact :func:`load_aot_pipeline` /
    :func:`load_aot_fn` understand.  ``meta``: optional JSON-style dict of
    caller metadata (e.g. ``{"arch": "M5"}``), surfaced as ``call.meta``
    at load time."""
    from jax.experimental import serialize_executable as se

    payload, _, _ = se.serialize(compiled)
    return pickle.dumps({
        "format": "sed_tpu-aot-v1",
        "payload": payload,
        "leaves": [np.asarray(l) for l in arr_leaves],
        "input_shape": tuple(input_spec.shape),
        "input_dtype": np.dtype(input_spec.dtype).name,
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        "n_devices": len(compiled._executable.xla_executable.local_devices()),
        "jax_version": jax.__version__,
        "meta": dict(meta or {}),
    })


def aot_export_fn(fn, weights, input_spec, mesh=None, input_pspec=None,
                  meta=None) -> bytes:
    """AOT-compile and serialize an arbitrary ``fn(weights, x) -> y``.

    ``weights``: any pytree (arrays ship in the artifact as executable
    arguments; non-array leaves are compiled in as static).  ``input_spec``:
    a jax.ShapeDtypeStruct for ``x``.  Returns a pickled artifact loadable
    by :func:`load_aot_pipeline` in a fresh process with no compilation.

    ``mesh``: an optional jax.sharding.Mesh — the artifact is compiled as a
    MULTI-DEVICE executable with ``x`` sharded by ``input_pspec`` (default:
    batch over the mesh's first axis) and weights replicated; loading binds
    the same device count and the XLA collectives ride inside the serialized
    program, so sharded serving also skips compilation.
    """
    compiled, arr_leaves = aot_compile_fn(fn, weights, input_spec,
                                          mesh=mesh, input_pspec=input_pspec)
    return serialize_compiled(compiled, arr_leaves, input_spec, meta=meta)


def aot_export_pipeline(
    score_fn,
    weights,
    batch: int,
    samples: int,
    cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM,
    pcm_dtype=jnp.int16,
    use_pallas="auto",
    mesh=None,
    featurizer_precision=None,
    meta=None,
) -> bytes:
    """AOT-compile and serialize the FULL serving graph.

    ``score_fn(weights, feats)``: (B, C, T, mel) log-mel features -> scores;
    ``weights``: any pytree (arrays become executable arguments and are
    shipped in the artifact; non-array leaves — e.g. int8 qparams' pool
    sizes — are compiled in as static).  The compiled input is
    (batch, samples, 1) ``pcm_dtype`` audio (int16 means PCM16, de-quantized
    by 1/32768 like every featurizer path).  ``use_pallas`` defaults to
    'auto' (fused Pallas kernels on TPU at the production nfft, XLA
    elsewhere) — an explicit 'full' on a non-TPU build would bake the
    interpret-mode kernels into the artifact.

    Returns a pickled artifact loadable by :func:`load_aot_pipeline` in a
    fresh process with no compilation.  ``featurizer_precision`` bakes a
    reduced-precision FFT tier ('fast'/'turbo', see
    ops/featurizer.py:FEATURIZER_PRECISION_TIERS) into the artifact; the
    default None compiles the golden-tested parity featurizer.
    """
    from sed_tpu.ops.featurizer import (logmel_features_batch,
                                        resolve_featurizer_precision)

    prec = resolve_featurizer_precision(featurizer_precision)

    def pipeline(w, x):
        feats = logmel_features_batch(x, cfg, use_pallas=use_pallas,
                                      pallas_precision=prec)
        return score_fn(w, feats)

    spec = jax.ShapeDtypeStruct((batch, samples, 1), pcm_dtype)
    return aot_export_fn(pipeline, weights, spec, mesh=mesh, meta=meta)


def aot_export_m5_pipeline(
    score_fn,
    weights,
    batch: int,
    samples: int,
    cfg=None,
    pcm_dtype=jnp.int16,
    mesh=None,
    meta=None,
) -> bytes:
    """AOT-compile the waveform-family serving graph: (batch, samples, 1)
    PCM -> hop-strided frame windows (the offline validation split geometry,
    data/events.py frame_coverage_labels) -> per-frame M5 scores
    (batch, n_frames, classes).  ``score_fn(weights, windows)`` is
    :func:`m5_serving`'s scorer (or its int8 variant).  Loadable by
    :func:`load_aot_pipeline`.  (M5 compiles in seconds even cold — this
    exists for API symmetry with the CNN pipeline, whose Pallas featurizer
    is the expensive compile.)"""
    from sed_tpu.configs import DEFAULT_WAVEFORM

    cfg = cfg or DEFAULT_WAVEFORM
    frame = 2 * (cfg.frame_size // 2)
    hop = cfg.hop_size
    n = (samples - frame) // hop + 1
    if n < 1:
        raise ValueError(
            f"samples={samples} yields no {frame}-sample frame")

    def pipeline(w, x):
        if x.dtype == jnp.int16:
            x = x.astype(jnp.float32) / 32768.0
        else:
            x = x.astype(jnp.float32)
        wins = jnp.stack(
            [x[:, i * hop: i * hop + frame, :] for i in range(n)], axis=1)
        sc = score_fn(w, wins.reshape(batch * n, frame, x.shape[-1]))
        return sc.reshape(batch, n, -1)

    spec = jax.ShapeDtypeStruct((batch, samples, 1), pcm_dtype)
    return aot_export_fn(pipeline, weights, spec, mesh=mesh, meta=meta)


def _deserialize_aot(blob: bytes):
    """Shared sed_tpu-aot-v1 deserialization: returns
    ``(loaded_executable, device_leaves, meta_dict)``."""
    from jax.experimental import serialize_executable as se

    d = pickle.loads(blob)
    if d.get("format") != "sed_tpu-aot-v1":
        raise ValueError(f"not a sed_tpu AOT artifact: {d.get('format')!r}")
    n_args = 1 + len(d["leaves"])
    _, in_tree = jax.tree.flatten(((0,) * n_args, {}))
    out_tree = jax.tree.structure(0)
    # Bind exactly the device count the artifact was compiled for (a host
    # with more local devices — e.g. the 8-virtual-CPU test mesh — would
    # otherwise try to shard the args 8 ways into a 1-device executable).
    n_dev = d.get("n_devices", 1)
    if len(jax.devices()) < n_dev:
        raise ValueError(
            f"artifact was compiled for {n_dev} devices; this host has "
            f"{len(jax.devices())}")
    devs = jax.devices()[:n_dev]
    loaded = se.deserialize_and_load(d["payload"], in_tree, out_tree,
                                     execution_devices=devs)
    leaves = [jnp.asarray(l) for l in d["leaves"]]
    return loaded, leaves, d


def load_aot_fn(blob: bytes):
    """Load an AOT artifact as a RAW device-level callable: ``call(x) -> y``
    with no host/numpy conversions on either side (x may already live on
    device; the result is a jax array).  The measurement-path twin of
    :func:`load_aot_pipeline` — bench code that times device work must not
    pay a D2H/H2D round trip per call.  Same trust caveat (pickle)."""
    loaded, leaves, d = _deserialize_aot(blob)

    def call(x):
        return loaded(x, *leaves)

    call.input_shape = tuple(d["input_shape"])
    call.input_dtype = d["input_dtype"]
    call.device_kind = d.get("device_kind")
    call.jax_version = d.get("jax_version")
    return call


def load_aot_pipeline(blob: bytes):
    """Load an :func:`aot_export_pipeline` / :func:`aot_export_fn` artifact;
    returns ``call(audio) -> scores`` running the pre-compiled executable
    (no compilation happens — cold start is deserialize + weight upload).

    The returned callable exposes the artifact metadata as attributes:
    ``call.input_shape``, ``call.input_dtype``, ``call.device_kind``.

    .. warning:: artifacts are pickle containers — loading one executes
       code from the file.  Load TRUSTED artifacts only (ones you built);
       for untrusted exchange use the StableHLO tier (:func:`export_scorer`
       + :func:`load_scorer`), which deserializes data, not code.
    """
    loaded, leaves, d = _deserialize_aot(blob)
    shape, dtype = tuple(d["input_shape"]), d["input_dtype"]

    def call(audio):
        audio = np.asarray(audio)
        if audio.shape != shape:
            raise ValueError(f"artifact expects audio {shape} {dtype}, "
                             f"got {audio.shape}")
        # Value-preserving dtype bridge (int16 means PCM16 repo-wide): a
        # bare cast would truncate float [-1,1] audio to silence.
        if audio.dtype != np.dtype(dtype):
            if np.dtype(dtype) == np.int16 and np.issubdtype(
                    audio.dtype, np.floating):
                audio = np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)
            elif np.issubdtype(np.dtype(dtype), np.floating) \
                    and audio.dtype == np.int16:
                audio = audio.astype(dtype) / np.asarray(32768.0, dtype)
            elif np.issubdtype(np.dtype(dtype), np.floating) \
                    and np.issubdtype(audio.dtype, np.floating):
                audio = audio.astype(dtype)  # e.g. float64 wav decode -> f32
            elif np.dtype(dtype) == np.uint8 and (
                    audio.dtype == np.int16
                    or np.issubdtype(audio.dtype, np.floating)):
                # uint8 means µ-law repo-wide: encode on the host (the lossy
                # half-wire-bytes ingest tier, ops/mulaw.py).
                from sed_tpu.ops.mulaw import mulaw_encode

                audio = mulaw_encode(audio)
            else:
                raise ValueError(
                    f"artifact expects {dtype} audio, got {audio.dtype}")
        return np.asarray(loaded(jnp.asarray(audio), *leaves))

    call.input_shape = shape
    call.input_dtype = dtype
    call.device_kind = d.get("device_kind")
    call.meta = d.get("meta", {})
    return call


def _norm_weights(mean, std):
    """Normalization stats as pytree entries (NOT closure constants — large
    embedded constants cannot be serialized by serialize_executable)."""
    if mean is None:
        return {}
    return {"norm": {"mean": jnp.asarray(mean, jnp.float32),
                     "std": jnp.asarray(std, jnp.float32)}}


def _apply_norm(w, feats):
    if "norm" in w:
        feats = (feats - w["norm"]["mean"]) / w["norm"]["std"]
    return feats


def cnn_serving(model, params, batch_stats, mean=None, std=None):
    """(score_fn, weights) for the f32 CNN head of
    :func:`aot_export_pipeline`: feats (B, C, T, mel) -> normalize -> NHWC ->
    model -> sigmoid."""
    weights = {"params": params, "batch_stats": batch_stats,
               **_norm_weights(mean, std)}

    def score(w, feats):
        x = jnp.transpose(_apply_norm(w, feats), (0, 2, 3, 1))
        logits = model.apply(
            {"params": w["params"], "batch_stats": w["batch_stats"]},
            x, train=False)
        return jax.nn.sigmoid(logits)

    return score, weights


def quantized_serving(qparams, mean=None, std=None):
    """(score_fn, weights) for the int8 PTQ head: feats -> normalize -> NHWC
    -> quantized CNN -> sigmoid.  ``qparams`` from models/quantize
    .quantize_cnn (static fields compile in; arrays ship in the artifact)."""
    from sed_tpu.models.quantize import quantized_scores

    weights = {"q": qparams, **_norm_weights(mean, std)}

    def score(w, feats):
        x = jnp.transpose(_apply_norm(w, feats), (0, 2, 3, 1))
        return quantized_scores(w["q"], x)

    return score, weights


def mobilenet_quantized_serving(qparams, mean=None, std=None):
    """(score_fn, weights) for the int8 MobileNetV1 head: feats ->
    normalize -> NHWC -> quantized MobileNet (emits sigmoid confidences
    itself, matching the reference forward — spectogram_models.py:117)."""
    from sed_tpu.models.quantize import quantized_mobilenet_forward

    weights = {"q": qparams, **_norm_weights(mean, std)}

    def score(w, feats):
        x = jnp.transpose(_apply_norm(w, feats), (0, 2, 3, 1))
        return quantized_mobilenet_forward(w["q"], x)

    return score, weights


def m5_quantized_serving(qparams):
    """(score_fn, weights) for the int8 M5 waveform head: (batch,
    frame_size, channels) windows -> sigmoid scores (quantize_m5's
    forward emits logits)."""
    from sed_tpu.models.quantize import quantized_m5_forward

    weights = {"q": qparams}

    def score(w, x):
        return jax.nn.sigmoid(quantized_m5_forward(w["q"], x))

    return score, weights


def m5_serving(model, params, batch_stats):
    """(score_fn, weights) for the M5 waveform family: (batch, frame_size,
    channels) raw audio windows -> sigmoid clip scores.  Export with
    :func:`aot_export_fn` and a (batch, frame_size, 1) float32 spec (or
    build the int8 variant from quantize_m5 via ``lambda w, x:
    jax.nn.sigmoid(quantized_m5_forward(w, x))``)."""
    weights = {"params": params, "batch_stats": batch_stats}

    def score(w, x):
        logits = model.apply(
            {"params": w["params"], "batch_stats": w["batch_stats"]},
            x, train=False)
        return jax.nn.sigmoid(logits)

    return score, weights


def load_scorer(blob: bytes):
    """Deserialize an exported scorer; returns a callable over numpy/jax arrays."""
    from jax import export as jax_export

    exported = jax_export.deserialize(blob)

    def call(x):
        return np.asarray(exported.call(jnp.asarray(x, jnp.float32)))

    return call
