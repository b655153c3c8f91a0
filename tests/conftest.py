"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding logic is validated on a virtual CPU mesh (no TPU pod in CI);
the real-chip paths are exercised by bench.py / __graft_entry__.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
