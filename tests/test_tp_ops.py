"""shard_map-wrapped quantized matmuls on the virtual CPU mesh — with the
Pallas kernel forced (interpret) so the real TP kernel path is what runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gptq_for_llama_tpu.ops.linear import quant_matmul_xla
from gptq_for_llama_tpu.parallel.sharding import make_mesh, shard_packed_linear
from gptq_for_llama_tpu.parallel.tp_ops import tp_quant_matmul
from gptq_for_llama_tpu.quant import packing
from gptq_for_llama_tpu.ops.linear import PackedLinear


def _lin(k, n, gs, bits=4, seed=0, bias=False):
    rng = np.random.RandomState(seed)
    g = k // gs
    codes = rng.randint(0, 2 ** bits, size=(k, n)).astype(np.uint32)
    zeros = rng.randint(1, 2 ** bits, size=(g, n)).astype(np.uint32)
    scales = (rng.rand(g, n) * 0.02 + 0.005).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32) if bias else None
    return PackedLinear.from_wire(
        packing.pack_rows(codes, bits), packing.pack_cols(zeros - 1, bits),
        scales, (np.arange(k) // gs).astype(np.int32), bits=bits, bias=b,
        dtype=jnp.float32)


@pytest.fixture(autouse=True)
def _force_pallas_interpret(monkeypatch):
    import gptq_for_llama_tpu.ops.pallas.matmul as pmm
    orig = pmm.quant_matmul_pallas
    monkeypatch.setenv("GPTQ_TPU_QMM_IMPL", "pallas")
    monkeypatch.setattr(pmm, "quant_matmul_pallas",
                        lambda x, l, interpret=False: orig(x, l, interpret=True))


def test_tp_col_matches_replicated():
    k, n, gs, tp = 256, 512, 32, 4
    lin = _lin(k, n, gs, bias=True)
    mesh = make_mesh(tp=tp, dp=2)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.standard_normal((4, k)).astype(np.float32))
    want = np.asarray(quant_matmul_xla(x, lin, dtype=jnp.float32))

    sharded = shard_packed_linear(lin, mesh, "col")
    y = jax.jit(lambda x, l: tp_quant_matmul(x, l, mesh, "col"))(x, sharded)
    assert len(y.sharding.device_set) == 8
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(np.asarray(y), want, atol=tol, rtol=0)


def test_tp_row_matches_replicated():
    k, n, gs, tp = 512, 256, 32, 4  # G=16 divisible by tp
    lin = _lin(k, n, gs, seed=2, bias=True)
    mesh = make_mesh(tp=tp, dp=2)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.standard_normal((4, k)).astype(np.float32))
    want = np.asarray(quant_matmul_xla(x, lin, dtype=jnp.float32))

    sharded = shard_packed_linear(lin, mesh, "row")
    y = jax.jit(lambda x, l: tp_quant_matmul(x, l, mesh, "row"))(x, sharded)
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(np.asarray(y), want, atol=tol, rtol=0)
