"""Data-parallel training and inference over a device mesh.

The fused train step from sed_tpu.data.device_pipeline is jitted with explicit
shardings: model/optimizer state and the packed data buffers are replicated,
the per-step start-index batch is sharded over the 'data' axis.  Inside the
step, XLA sees a global batch: BatchNorm statistics and the loss/gradient
reductions become ICI all-reduces inserted automatically by the partitioner —
no hand-written collectives, per the scaling-book recipe (mesh + shardings ->
let XLA place psums).
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sed_tpu.parallel.mesh import DATA_AXIS


def shard_train_step(
    raw_step: Callable,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
    steps_per_call: int = 1,
) -> Callable:
    """Jit a raw (state, buffers, starts, rng) step with data-parallel shardings.

    ``steps_per_call > 1`` shards a multi-step (from
    sed_tpu.data.device_pipeline.make_multi_step) whose start-index block is
    (K, batch): the leading scan axis stays unsharded, the per-step batch axis
    rides the mesh — so dispatch amortization and data parallelism compose.
    """
    rep = NamedSharding(mesh, P())
    starts_spec = P(axis_name) if steps_per_call == 1 else P(None, axis_name)
    sharded = NamedSharding(mesh, starts_spec)
    return jax.jit(
        raw_step,
        in_shardings=(rep, rep, sharded, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def shard_inference(forward: Callable, mesh: Mesh, axis_name: str = DATA_AXIS) -> Callable:
    """Jit a (params, batch_stats, x) forward with the batch sharded over chips.

    This is the scaling strategy for BASELINE config #5 (128 concurrent 60 s
    clips): recordings are independent, so the batch axis rides the mesh and
    no cross-chip communication is needed at all.
    """
    rep = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        forward,
        in_shardings=(rep, rep, sharded),
        out_shardings=sharded,
    )
