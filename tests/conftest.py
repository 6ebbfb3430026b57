"""Test configuration: run everything on a simulated 8-device CPU platform.

Multi-chip sharding is validated without a TPU pod by forcing the host CPU
platform to expose 8 virtual devices (standard JAX practice; see SURVEY.md §4).

Note: this environment's sitecustomize imports jax and pins JAX_PLATFORMS to
the TPU plugin at interpreter start, so plain env-var overrides are too late —
we must redirect via jax.config before any backend is instantiated.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
