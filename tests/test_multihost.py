"""Multi-host scaffolding (parallel/distributed.py): real multi-process CPU
'pod' simulation — jax.distributed.initialize across separate OS processes,
host-major mesh, put_global placement, cross-process collectives."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_initialize_is_env_gated():
    from gptq_for_llama_tpu.parallel import distributed
    for k in ("GPTQ_TPU_COORDINATOR", "GPTQ_TPU_DISTRIBUTED"):
        assert os.environ.get(k) is None, f"{k} leaked into the test env"
    assert distributed.initialize() is False  # no env, no args: a no-op


def test_put_global_single_process_matches_device_put():
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from gptq_for_llama_tpu.parallel.distributed import put_global
    from gptq_for_llama_tpu.parallel.sharding import make_mesh
    mesh = make_mesh(tp=4, dp=2)
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    g = put_global(x, mesh, P("dp", None))
    assert g.sharding.spec == P("dp", None)
    np.testing.assert_array_equal(np.asarray(g), x)


def test_two_process_pod_simulation():
    """Two REAL processes, 2 virtual devices each: one global jitted forward
    with dp across processes; both must compute the identical reduction."""
    import __graft_entry__ as ge
    ge.dryrun_multihost(n_processes=2, local_devices=2)
