"""Multi-host initialization for TPU pod slices.

The reference has no distributed story (SURVEY.md §2 C29); this framework's
multi-host path is the standard JAX one: ``jax.distributed.initialize`` on
every host, then the same pjit programs run SPMD — XLA routes in-slice
collectives over ICI and cross-host ones over DCN transparently.
"""

from __future__ import annotations

from typing import Optional


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime (no-op on a single host).

    With no arguments, jax auto-detects the cluster from TPU metadata (GCE)
    or environment variables; arguments override for manual setups.
    """
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary_host() -> bool:
    import jax

    return jax.process_index() == 0


def global_put(mesh, tree, spec=None):
    """Place host data onto a (possibly multi-process) mesh.

    Every process must call this with IDENTICAL data (the SPMD input
    contract); each host materializes only its addressable shards via
    ``jax.make_array_from_callback``.  ``jax.device_put`` cannot target a
    sharding with non-addressable devices, so the single-process
    ``mesh.replicate``/``mesh.shard_batch`` helpers do not generalize to
    pods — this is the pod-safe equivalent (works on single-process meshes
    too).  Typed PRNG keys are carried via key_data/wrap_key_data (extended
    dtypes are not constructible by make_array_from_callback).
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    if spec is None:
        spec = P()

    def put(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(x))
            g = jax.make_array_from_callback(
                data.shape, NamedSharding(mesh, P()), lambda idx: data[idx])
            return jax.random.wrap_key_data(g, impl=jax.random.key_impl(x))
        a = np.asarray(x)
        s = NamedSharding(mesh, spec if a.ndim else P())
        return jax.make_array_from_callback(a.shape, s, lambda idx: a[idx])

    return jax.tree.map(put, tree)


def global_replicate(mesh, tree):
    """Replicate a pytree (model/optimizer state, packed buffers) across a
    possibly multi-process mesh; every process passes identical values."""
    return global_put(mesh, tree, None)


def global_shard_batch(mesh, batch, axis_name: str = "data"):
    """Shard a host-global batch's leading axis across a possibly
    multi-process mesh (every process passes the identical global batch)."""
    from jax.sharding import PartitionSpec as P

    return global_put(mesh, batch, P(axis_name))
