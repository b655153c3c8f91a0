"""Test configuration: force an 8-device virtual CPU mesh before any computation.

Multi-chip sharding logic is validated on a virtual CPU mesh (no TPU pod in CI);
the real-chip paths are exercised by bench.py / __graft_entry__.py.

Note: the environment's axon TPU plugin re-exports JAX_PLATFORMS=axon from a
sitecustomize hook, so the env var alone does NOT stick — the config update
below is the authoritative override.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
