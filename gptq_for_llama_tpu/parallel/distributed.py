"""Multi-host (multi-process) execution scaffolding.

The reference is strictly single-process — its multi-GPU story is in-process
layer round-robin (reference: llama.py:328-382). Scaling a TPU pod slice means
one JAX process per host, all participating in ONE global computation:

  1. `initialize()` — `jax.distributed.initialize()` before first backend use
     (auto-detected on real TPU pods; explicit coordinator/process args for
     CPU simulation and tests).
  2. `make_mesh` (parallel/sharding.py) orders devices host-major, so `tp`
     stays within a host (ICI) and `dp` spans hosts (DCN).
  3. `put_global()` — build a GLOBAL array on a multi-host mesh from a
     host-local numpy copy; each device materializes only its own shard.
     jit'd programs then run SPMD across all hosts with XLA collectives.

Launch recipe (N hosts): run the same program on every host with
  GPTQ_TPU_COORDINATOR=host0:8476 GPTQ_TPU_NUM_PROCESSES=N \
  GPTQ_TPU_PROCESS_ID=i python -m gptq_for_llama_tpu ... --distributed
(on Cloud TPU pods the three env vars are unnecessary — initialize() with no
arguments auto-detects). Validated without real hosts by
`__graft_entry__.dryrun_multichip` / tests/test_multihost.py, which spawn
real separate processes over the multi-process CPU backend.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return None if v in (None, "") else int(v)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Env-gated `jax.distributed.initialize()`. Call BEFORE any backend use.

    Explicit arguments win; otherwise GPTQ_TPU_COORDINATOR /
    GPTQ_TPU_NUM_PROCESSES / GPTQ_TPU_PROCESS_ID are read. With no arguments
    and GPTQ_TPU_DISTRIBUTED=1, argument-free auto-detection is used (real
    TPU pods). Returns True iff distributed mode was initialized.
    """
    import jax
    coordinator_address = (coordinator_address
                           or os.environ.get("GPTQ_TPU_COORDINATOR"))
    if num_processes is None:
        num_processes = _int_env("GPTQ_TPU_NUM_PROCESSES")
    if process_id is None:
        process_id = _int_env("GPTQ_TPU_PROCESS_ID")
    if coordinator_address is None:
        if os.environ.get("GPTQ_TPU_DISTRIBUTED") != "1":
            return False
        jax.distributed.initialize()  # TPU-pod auto-detection
        return True
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def put_global(x, mesh, spec):
    """Place x on mesh with spec, valid on multi-host meshes.

    Every process passes the same full host-local value; each addressable
    device materializes only its shard (no cross-host transfer). In a
    single-process mesh this is equivalent to jax.device_put.
    """
    import jax
    from jax.sharding import NamedSharding
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)  # no host round-trip needed
    x = np.asarray(x)
    return jax.make_array_from_callback(
        x.shape, sharding, lambda idx: x[idx])


def process_count() -> int:
    import jax
    return jax.process_count()
