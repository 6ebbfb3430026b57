"""Multi-chip tests on the simulated 8-device CPU mesh: data-parallel train
step equivalence, sharded inference, time-axis windowed inference exactness,
and the driver graft entry points."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sed_tpu.configs import SpectrogramConfig
from sed_tpu.data.device_pipeline import (
    SpectrogramBuffers,
    make_spectrogram_train_step,
)
from sed_tpu.models.cnn import CnnAvgPooling, TRAIN_CHANNEL_AND_POOL
from sed_tpu.parallel.data_parallel import shard_inference, shard_train_step
from sed_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from sed_tpu.parallel.time_shard import receptive_field, windowed_forward
from sed_tpu.train.optim import make_optimizer
from sed_tpu.train.state import init_state, make_eval_forward

CFG = SpectrogramConfig()


def _tiny_buffers(seed=0):
    rng = np.random.default_rng(seed)
    crop, mel = CFG.train_crop_size, CFG.mel_bins
    total = 6 * crop
    return SpectrogramBuffers(
        features=jnp.asarray(rng.standard_normal((1, total, mel)).astype(np.float32)),
        events=jnp.asarray((rng.random((total, 1)) > 0.8).astype(np.float32)),
        start_indices=jnp.arange(total - crop, dtype=jnp.int32),
        mean=jnp.zeros((mel,), jnp.float32),
        std=jnp.ones((mel,), jnp.float32),
    ), total


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_data_parallel_step_matches_single_device():
    buffers, total = _tiny_buffers()
    model = CnnAvgPooling(classes_num=1, model_config=((8, 2), (16, 2)))
    tx = make_optimizer(1e-3)
    crop, mel = CFG.train_crop_size, CFG.mel_bins
    batch = 16
    sample = jnp.zeros((batch, crop, mel, 1), jnp.float32)
    starts = jnp.asarray(
        np.random.default_rng(1).integers(0, total - crop, size=batch, dtype=np.int32)
    )
    rng = jax.random.key(2)

    # Single-device fused step.
    state1 = init_state(model, jax.random.key(0), sample, tx)
    step1 = make_spectrogram_train_step(model, tx, CFG, 5.0, "logMel", False)
    state1, loss1 = step1(state1, buffers, starts, rng)

    # 8-device data-parallel step with identical inputs.
    mesh = create_mesh(8)
    state8 = init_state(model, jax.random.key(0), sample, tx)
    raw = make_spectrogram_train_step(model, tx, CFG, 5.0, "logMel", False, jit=False)
    step8 = shard_train_step(raw, mesh)
    state8, loss8 = step8(
        replicate(mesh, state8), replicate(mesh, buffers),
        shard_batch(mesh, starts), replicate(mesh, rng),
    )

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # Global BatchNorm stats must match the single-device global-batch stats.
    for a, b in zip(jax.tree.leaves(state1.batch_stats), jax.tree.leaves(state8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_sharded_inference_matches_single_device():
    model = CnnAvgPooling(classes_num=1, model_config=((8, 2), (16, 2)))
    x = jax.random.normal(jax.random.key(0), (16, 30, 64, 1))
    variables = model.init(jax.random.key(1), x, train=False)
    fwd = make_eval_forward(model)
    ref = np.asarray(fwd(variables["params"], variables["batch_stats"], x))

    mesh = create_mesh(8)
    sharded_fwd = shard_inference(
        lambda p, bs, batch: model.apply({"params": p, "batch_stats": bs}, batch, train=False),
        mesh,
    )
    got = np.asarray(sharded_fwd(
        replicate(mesh, variables["params"]),
        replicate(mesh, variables["batch_stats"]),
        shard_batch(mesh, x),
    ))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_receptive_field_train_config():
    # 2 convs per block: +4 frames at strides 1,2,4,8 -> 1 + 4*15 = 61.
    assert receptive_field(TRAIN_CHANNEL_AND_POOL) == 61


@pytest.mark.parametrize("t", [1000, 997])  # stride-aligned and ragged lengths
def test_windowed_forward_exact(t):
    model = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL)
    x = jax.random.normal(jax.random.key(3), (1, t, 64, 1))
    variables = model.init(jax.random.key(4), jnp.zeros((1, 200, 64, 1)), train=False)

    def forward(batch):
        return model.apply(variables, batch, train=False)

    ref = np.asarray(forward(x))
    got = windowed_forward(forward, x, window=256, halo=64, total_stride=8)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_graft_entry():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 176, 1)
    ge.dryrun_multichip(8)


def test_windowed_forward_with_sharded_windows():
    """Time-axis windows of one ultra-long recording ride the batch axis of an
    8-device mesh — the full conv context-parallel path (SURVEY §5)."""
    model = CnnAvgPooling(classes_num=1, model_config=TRAIN_CHANNEL_AND_POOL)
    x = jax.random.normal(jax.random.key(5), (1, 2048, 64, 1))  # ~11 min audio
    variables = model.init(jax.random.key(6), jnp.zeros((1, 200, 64, 1)), train=False)

    def forward(batch):
        return model.apply(variables, batch, train=False)

    ref = np.asarray(forward(x))

    mesh = create_mesh(8)
    sharded = shard_inference(
        lambda p, bs, batch: model.apply({"params": p, "batch_stats": bs}, batch, train=False),
        mesh,
    )

    def sharded_forward(batch):
        n = batch.shape[0]
        pad = (-n) % 8
        padded = jnp.pad(batch, ((0, pad), (0, 0), (0, 0), (0, 0)))
        out = sharded(
            replicate(mesh, variables["params"]),
            replicate(mesh, variables.get("batch_stats", {})),
            shard_batch(mesh, padded),
        )
        return out[:n]

    got = windowed_forward(sharded_forward, x, window=256, halo=64, total_stride=8)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_waveform_data_parallel_step_matches_single_device():
    """M5 waveform fused step under the 8-device mesh == single device.

    Compares loss and raw GRADIENTS (not post-Adam params: the first Adam
    update is ~lr*sign(g), so reduction-order noise on near-zero gradients
    flips signs and shows up as lr-scale param diffs on both paths equally).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sed_tpu.configs import WaveformConfig
    from sed_tpu.data.device_pipeline import WaveformBuffers
    from sed_tpu.models.m5 import M5
    from sed_tpu.train.loss import weighted_bce_with_logits

    wcfg = WaveformConfig(working_sample_rate=8000, time_margin=0.33)
    rng = np.random.default_rng(0)
    total = 6 * wcfg.frame_size
    buffers = WaveformBuffers(
        waveform=jnp.asarray(rng.standard_normal((1, total)).astype(np.float32)),
        labels=jnp.asarray((rng.random(total) > 0.8).astype(np.float32)),
        start_indices=jnp.arange(total - wcfg.frame_size, dtype=jnp.int32),
    )
    model = M5(classes_num=1)
    batch = 8
    sample = jnp.zeros((batch, wcfg.frame_size, 1), jnp.float32)
    variables = model.init(jax.random.key(0), sample, train=False)
    starts = jnp.asarray(rng.integers(0, total - wcfg.frame_size, size=batch,
                                      dtype=np.int32))

    def loss_of(params, starts):
        def one(s):
            return jax.lax.dynamic_slice(buffers.waveform, (0, s),
                                         (1, wcfg.frame_size)), buffers.labels[s]

        waves, labels = jax.vmap(one)(starts)
        x = jnp.transpose(waves, (0, 2, 1))
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return weighted_bce_with_logits(out, labels, 5.0, multi_frame=False)

    grad_fn = jax.value_and_grad(loss_of)
    l1, g1 = jax.jit(grad_fn)(variables["params"], starts)

    mesh = create_mesh(8)
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P("data"))
    sharded_grad = jax.jit(grad_fn, in_shardings=(rep, shd), out_shardings=(rep, rep))
    l8, g8 = sharded_grad(replicate(mesh, variables["params"]),
                          shard_batch(mesh, starts))

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-6)


def test_mesh_with_steps_per_call_matches_sequential_sharded():
    """mesh x steps_per_call (VERDICT r1 #4): a sharded K-step scan must equal
    K sequential sharded steps with the same per-step RNG discipline, with
    augmentation ON so the in-scan RNG path is exercised."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sed_tpu.data.device_pipeline import make_multi_step
    from sed_tpu.parallel.mesh import DATA_AXIS

    buffers, total = _tiny_buffers()
    model = CnnAvgPooling(classes_num=1, model_config=((8, 2), (16, 2)))
    tx = make_optimizer(1e-3)
    crop, mel = CFG.train_crop_size, CFG.mel_bins
    batch, K = 16, 3
    sample = jnp.zeros((batch, crop, mel, 1), jnp.float32)
    starts_block = np.random.default_rng(1).integers(
        0, total - crop, size=(K, batch), dtype=np.int32)
    rng = jax.random.key(2)
    mesh = create_mesh(8)

    raw = make_spectrogram_train_step(model, tx, CFG, 5.0, "logMel", True, jit=False)

    # K sequential sharded single steps, replicating make_multi_step's
    # rng split discipline (rng, step_rng = split(rng) before each step).
    state_seq = replicate(mesh, init_state(model, jax.random.key(0), sample, tx))
    step1 = shard_train_step(raw, mesh)
    r = rng
    seq_losses = []
    bufs = replicate(mesh, buffers)
    for k in range(K):
        r, step_rng = jax.random.split(r)
        state_seq, loss = step1(state_seq, bufs,
                                shard_batch(mesh, jnp.asarray(starts_block[k])),
                                replicate(mesh, step_rng))
        seq_losses.append(float(loss))

    # One sharded K-step scan over the same block.
    state_blk = replicate(mesh, init_state(model, jax.random.key(0), sample, tx))
    multi = make_multi_step(raw, K, jit=False)
    stepK = shard_train_step(multi, mesh, steps_per_call=K)
    block = jax.device_put(jnp.asarray(starts_block),
                           NamedSharding(mesh, P(None, DATA_AXIS)))
    state_blk, losses = stepK(state_blk, replicate(mesh, buffers), block,
                              replicate(mesh, rng))

    np.testing.assert_allclose(np.asarray(losses), np.asarray(seq_losses), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_seq.params), jax.tree.leaves(state_blk.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree.leaves(state_seq.batch_stats),
                    jax.tree.leaves(state_blk.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_multihost_two_process_smoke():
    """2-process jax.distributed CPU smoke (VERDICT r1 #9): each process runs
    initialize_multihost + a cross-process psum over a 2-device global mesh.
    Spawned as real subprocesses so the DCN coordinator path actually runs."""
    import subprocess
    import sys
    import socket

    # Pick a free port for the coordinator.
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from sed_tpu.parallel.multihost import initialize_multihost, is_primary_host

pid = int(sys.argv[1])
initialize_multihost(coordinator_address="127.0.0.1:{port}",
                     num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert is_primary_host() == (pid == 0)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devices = np.array(jax.devices()).reshape(2)
mesh = Mesh(devices, ("data",))
sharding = NamedSharding(mesh, P("data"))

# Each process contributes its process_index+1; global psum must see both.
local = jnp.full((1,), float(pid + 1))
garr = jax.make_array_from_single_device_arrays(
    (2,), sharding, [jax.device_put(local, jax.local_devices()[0])])
total = jax.jit(lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P()))(garr)
# Fully-addressable replicated output: safe to read on every host.
assert float(total) == 3.0, float(total)
print("OK", pid)
""".format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))), port=port)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen([sys.executable, "-c", worker, str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (out.decode(), err.decode()[-2000:])
    assert b"OK" in outs[0][0] and b"OK" in outs[1][0]


def test_multihost_full_train_step_two_process():
    """The FUSED spectrogram train step across 2 processes x 4 virtual
    devices == the single-device step (VERDICT r3 Weak #5: the multihost
    path exercised by a real cross-process program, not just a psum).

    Each worker initializes jax.distributed, builds the 8-device GLOBAL mesh,
    places state/buffers via the pod-safe multihost helpers
    (make_array_from_callback — device_put cannot target non-addressable
    shardings), runs one fused step, and prints loss + param/batch-stat
    checksums; both workers must agree with the in-process single-device
    reference."""
    import subprocess
    import sys
    import socket

    # --- in-process single-device reference (same seeds as the worker) ----
    buffers, total = _tiny_buffers()
    model = CnnAvgPooling(classes_num=1, model_config=((8, 2), (16, 2)))
    tx = make_optimizer(1e-3)
    crop, mel = CFG.train_crop_size, CFG.mel_bins
    batch = 16
    sample = jnp.zeros((batch, crop, mel, 1), jnp.float32)
    starts = jnp.asarray(
        np.random.default_rng(1).integers(0, total - crop, size=batch, dtype=np.int32)
    )
    rng = jax.random.key(2)
    state1 = init_state(model, jax.random.key(0), sample, tx)
    step1 = make_spectrogram_train_step(model, tx, CFG, 5.0, "logMel", False)
    state1, loss1 = step1(state1, buffers, starts, rng)
    ref_loss = float(loss1)
    ref_psum = sum(float(np.abs(np.asarray(l)).sum())
                   for l in jax.tree.leaves(state1.params))
    ref_bsum = sum(float(np.abs(np.asarray(l)).sum())
                   for l in jax.tree.leaves(state1.batch_stats))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = r"""
import sys
pid = int(sys.argv[1])
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
from sed_tpu.parallel.multihost import (initialize_multihost,
                                        global_replicate, global_shard_batch)
initialize_multihost(coordinator_address="127.0.0.1:{port}",
                     num_processes=2, process_id=pid)
assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4, jax.local_devices()

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
import test_parallel as tp

buffers, total = tp._tiny_buffers()
model = tp.CnnAvgPooling(classes_num=1, model_config=((8, 2), (16, 2)))
tx = tp.make_optimizer(1e-3)
crop, mel = tp.CFG.train_crop_size, tp.CFG.mel_bins
batch = 16
sample = jnp.zeros((batch, crop, mel, 1), jnp.float32)
starts = np.random.default_rng(1).integers(0, total - crop, size=batch,
                                           dtype=np.int32)
rng = jax.random.key(2)
state = tp.init_state(model, jax.random.key(0), sample, tx)

mesh = Mesh(np.array(jax.devices()), ("data",))
raw = tp.make_spectrogram_train_step(model, tx, tp.CFG, 5.0, "logMel", False,
                                     jit=False)
step = tp.shard_train_step(raw, mesh)
state, loss = step(global_replicate(mesh, state),
                   global_replicate(mesh, buffers),
                   global_shard_batch(mesh, starts),
                   global_replicate(mesh, rng))
psum = sum(float(np.abs(np.asarray(l)).sum())
           for l in jax.tree.leaves(state.params))
bsum = sum(float(np.abs(np.asarray(l)).sum())
           for l in jax.tree.leaves(state.batch_stats))
print("RESULT", f"{{float(loss):.10e}}", f"{{psum:.10e}}", f"{{bsum:.10e}}")
""".format(repo=repo, tests=os.path.join(repo, "tests"), port=port)

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen([sys.executable, "-c", worker, str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=360) for p in procs]
    results = []
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (out.decode(), err.decode()[-2000:])
        line = [l for l in out.decode().splitlines() if l.startswith("RESULT")]
        assert line, out.decode()
        results.append([float(v) for v in line[0].split()[1:]])

    for loss, psum, bsum in results:
        np.testing.assert_allclose(loss, ref_loss, rtol=1e-5)
        np.testing.assert_allclose(psum, ref_psum, rtol=1e-5)
        np.testing.assert_allclose(bsum, ref_bsum, rtol=1e-5)
    # Both processes computed the identical global program.
    np.testing.assert_allclose(results[0], results[1], rtol=1e-12)


def test_bucketed_forward_exact_fuzz():
    """bucketed_forward_exact == raw whole-recording forward for fuzzed
    lengths, and compiles O(#buckets + stride) programs (VERDICT r1 #7)."""
    import flax.linen as nn

    from sed_tpu.models.cnn import num_pools
    from sed_tpu.parallel.time_shard import (
        bucketed_forward_exact,
        pool_product,
        receptive_field,
    )

    mc = ((8, 2), (16, 2))
    model = CnnAvgPooling(classes_num=2, model_config=mc)
    stride = pool_product(mc)
    assert 2 ** num_pools(mc) == stride
    rf = receptive_field(mc)
    halo = stride * (-(-(rf // 2 + 1) // stride))

    rng = np.random.default_rng(0)
    x_init = jnp.zeros((1, 32, CFG.mel_bins, 1))
    variables = model.init(jax.random.key(0), x_init, train=False)

    forward = jax.jit(lambda b: model.apply(variables, b, train=False))

    lengths = [17, 33, 64, 65, 97, 128, 181, 230, 300]
    for t in lengths:
        x = jnp.asarray(rng.standard_normal((1, t, CFG.mel_bins, 1)).astype(np.float32))
        expect = np.asarray(forward(x))
        got = bucketed_forward_exact(forward, x, stride, halo, bucket=64)
        np.testing.assert_array_equal(got, expect), t

    # Compile count: buckets {64,128,192,256,320} + <=stride tails + short raws.
    n_short = sum(1 for t in lengths if t < 2 * halo + stride)
    n_buckets = len({64 * (-(-t // 64)) for t in lengths if t >= 2 * halo + stride})
    n_tails = len({(t - (stride * ((t - halo) // stride) - halo))
                   for t in lengths if t >= 2 * halo + stride})
    # The raw-forward calls above compiled one shape per length; subtract them.
    assert forward._cache_size() - len(lengths) <= n_short + n_buckets + n_tails
