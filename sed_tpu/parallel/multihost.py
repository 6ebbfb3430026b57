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
