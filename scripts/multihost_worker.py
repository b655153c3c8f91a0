"""One simulated host of a multi-process CPU "pod".

Launched once per simulated host by __graft_entry__.dryrun_multichip and
tests/test_multihost.py. Validates — without pod hardware — the full
multi-host stack: jax.distributed.initialize (parallel/distributed.py),
host-major make_mesh (tp rows confined to one process's devices),
put_global param/batch placement, and a jitted forward whose dp reduction
crosses processes (real cross-process XLA collectives over the CPU backend).

usage: multihost_worker.py NPROC PID PORT LOCAL_DEVICES
Prints "MULTIHOST_OK pid=<i> mean=<v>" on success; the launcher asserts the
value matches across processes.
"""

import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
nproc, pid, port, local = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                           int(sys.argv[4]))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={local}"
                           ).strip()

import jax

jax.config.update("jax_platforms", "cpu")  # the axon sitecustomize pins axon

from gptq_for_llama_tpu.parallel import distributed

assert distributed.initialize(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

import __graft_entry__ as ge
from gptq_for_llama_tpu.models import registry
from gptq_for_llama_tpu.models.config import ModelConfig
from gptq_for_llama_tpu.parallel.distributed import put_global
from gptq_for_llama_tpu.parallel.sharding import make_mesh, shard_model_params

dp, tp = nproc, local
mesh = make_mesh(tp=tp, dp=dp)
for row in mesh.devices:  # tp must ride ICI: one host per row
    assert len({d.process_index for d in row}) == 1, "tp row crosses hosts"

hidden = max(32 * tp, 64)
cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=hidden,
                  intermediate_size=2 * hidden, num_layers=2, num_heads=tp,
                  num_kv_heads=tp, head_dim=hidden // tp, max_seq_len=32)
params = ge._tiny_packed_llama(cfg, jnp.float32, gs=32)
sharded = shard_model_params("llama", cfg, params, mesh)
arch = registry.get_arch("llama")

rng = np.random.RandomState(0)
ids = put_global(rng.randint(0, 64, size=(2 * dp, 8)).astype(np.int32),
                 mesh, P("dp", None))


@jax.jit
def step(p, i):
    logits = arch.forward(p, cfg, i)
    return jnp.mean(logits)  # the dp reduction crosses processes


m = step(sharded, ids)  # out: replicated scalar — every host holds a shard
val = float(np.asarray(m.addressable_shards[0].data))
assert np.isfinite(val)
print(f"MULTIHOST_OK pid={pid} mean={val:.6f}", flush=True)
