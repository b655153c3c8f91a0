"""Gradient flow through quantized matmuls (reference QuantLinearFunction,
quant/quant_linear.py:282-301: fp fwd kernel, transpose kernel for grad-input).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from gptq_for_llama_tpu.ops import quant_matmul as qm
from gptq_for_llama_tpu.ops.linear import quant_matmul_xla


def _lin(k=64, n=128, bits=4, gs=32, seed=0):
    from gptq_for_llama_tpu.quant import packing
    from gptq_for_llama_tpu.ops.linear import PackedLinear
    rng = np.random.RandomState(seed)
    g = k // gs
    codes = rng.randint(0, 2 ** bits, size=(k, n)).astype(np.uint32)
    zeros = rng.randint(1, 2 ** bits, size=(g, n)).astype(np.uint32)
    scales = (rng.rand(g, n) * 0.02 + 0.005).astype(np.float32)
    return PackedLinear.from_wire(
        packing.pack_rows(codes, bits), packing.pack_cols(zeros - 1, bits),
        scales, (np.arange(k) // gs).astype(np.int32), bits=bits,
        dtype=jnp.float32)


def test_grad_matches_dense_xla_path():
    lin = _lin()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    w = np.asarray(lin.dequantize(jnp.float32))
    if lin.perm is not None:
        raise AssertionError("monotone g_idx should not produce a perm")

    def loss(x):
        return jnp.sum(quant_matmul_xla(x, lin, dtype=jnp.float32) ** 2)

    gx = jax.grad(loss)(x)
    want = 2.0 * (np.asarray(x) @ w) @ w.T
    np.testing.assert_allclose(np.asarray(gx), want, atol=1e-3, rtol=1e-4)


def test_grad_through_pallas_dispatch(monkeypatch):
    """custom-vjp path: force the pallas branch (interpret via CPU backend is
    exercised by the dispatch's interpret fallback in tests)."""
    monkeypatch.setenv("GPTQ_TPU_QMM_IMPL", "pallas")
    lin = _lin()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    w = np.asarray(lin.dequantize(jnp.float32))

    def loss(x):
        from gptq_for_llama_tpu.ops.pallas import matmul as pmm
        y = qm._quant_matmul_ad(x, lin) if pmm.supports(lin) else None
        assert y is not None
        return jnp.sum(y ** 2)

    # run the custom-vjp backward; forward uses interpret mode off-TPU
    import gptq_for_llama_tpu.ops.pallas.matmul as pmm
    orig = pmm.quant_matmul_pallas
    monkeypatch.setattr(pmm, "quant_matmul_pallas",
                        lambda x, l, interpret=False: orig(x, l, interpret=True))
    gx = jax.grad(loss)(x)
    want = 2.0 * (np.asarray(x) @ w) @ w.T
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(np.asarray(gx), want, atol=tol, rtol=0)


def _lin_full(k, n, bits, gs, seed=0, actorder=False):
    from gptq_for_llama_tpu.quant import packing
    from gptq_for_llama_tpu.ops.linear import PackedLinear
    rng = np.random.RandomState(seed)
    g = k // gs
    codes = rng.randint(0, 2 ** bits, size=(k, n)).astype(np.uint32)
    zeros = rng.randint(1, 2 ** bits, size=(g, n)).astype(np.uint32)
    scales = (rng.rand(g, n) * 0.02 + 0.005).astype(np.float32)
    g_idx = (np.arange(k) // gs).astype(np.int32)
    if actorder:
        g_idx = g_idx[rng.permutation(k)]
    return PackedLinear.from_wire(
        packing.pack_rows(codes, bits), packing.pack_cols(zeros - 1, bits),
        scales, g_idx, bits=bits, dtype=jnp.float32)


def _dx_xla(g, lin):
    """Dense-dequant oracle for the transposed kernel."""
    w = np.asarray(lin.dequantize(jnp.float32))[: lin.in_features]
    dx = np.asarray(g) @ w.T
    if lin.perm is not None:
        dx = dx[..., np.argsort(np.asarray(lin.perm))]
    return dx


import pytest


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
@pytest.mark.parametrize("m", [1, 8, 33])
def test_transposed_kernel_matches_xla(bits, m):
    """The grad-input Pallas kernel (transpose_matmul_248 equivalent) vs the
    dense-dequant oracle, interpret mode."""
    from gptq_for_llama_tpu.ops.pallas import matmul as pmm
    k, n, gs = 128, 256, 32
    lin = _lin_full(k, n, bits, gs, seed=bits)
    assert pmm.supports(lin)
    rng = np.random.RandomState(10 + bits)
    g = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    want = _dx_xla(g, lin)
    got = np.asarray(pmm.quant_matmul_t_pallas(g, lin, interpret=True))
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=tol, rtol=0)


def test_transposed_kernel_actorder_and_padded_k():
    """act-order perm inversion + K device padding drop in the backward."""
    from gptq_for_llama_tpu.ops.pallas import matmul as pmm
    k, n, gs = 2176, 128, 32  # G=68 -> kp=2304 (padded)
    lin = _lin_full(k, n, 4, gs, seed=5, actorder=True)
    assert lin.perm is not None and lin.k_padded == 2304
    assert pmm.supports(lin)
    rng = np.random.RandomState(11)
    g = jnp.asarray(rng.standard_normal((4, n)).astype(np.float32) * 0.1)
    want = _dx_xla(g, lin)
    got = np.asarray(pmm.quant_matmul_t_pallas(g, lin, interpret=True))
    assert got.shape == (4, k)
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=tol, rtol=0)


def test_vjp_dispatches_to_transposed_kernel(monkeypatch):
    """forced-pallas grad path runs the transposed kernel (interpret off-TPU)
    and matches the analytic gradient."""
    monkeypatch.setenv("GPTQ_TPU_QMM_IMPL", "pallas")
    lin = _lin_full(128, 256, 4, 32, seed=3)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    w = np.asarray(lin.dequantize(jnp.float32))

    import gptq_for_llama_tpu.ops.pallas.matmul as pmm
    orig = pmm.quant_matmul_pallas
    monkeypatch.setattr(pmm, "quant_matmul_pallas",
                        lambda x, l, interpret=False: orig(x, l, interpret=True))

    def loss(x):
        return jnp.sum(qm._quant_matmul_ad(x, lin) ** 2)

    gx = jax.grad(loss)(x)
    want = 2.0 * (np.asarray(x) @ w) @ w.T
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(np.asarray(gx), want, atol=tol, rtol=0)


def test_grad_through_fused_mlp(monkeypatch):
    """jax.grad through fused_gate_up's Pallas path (the LoRA case where
    gate/up stay frozen packed linears): the custom VJP recomputes through
    the differentiable unfused form instead of crashing on pallas_call."""
    import jax
    from gptq_for_llama_tpu.ops import quant_matmul as qm
    from gptq_for_llama_tpu.ops.pallas import matmul as pmm
    monkeypatch.setenv("GPTQ_TPU_QMM_IMPL", "pallas")

    gate, up = _lin(seed=11), _lin(seed=12)
    x = jnp.asarray(np.random.RandomState(13)
                    .standard_normal((4, gate.in_features)).astype(np.float32))

    def loss(xx):
        return jnp.sum(qm.fused_gate_up(gate, up, xx, "silu") ** 2)

    val, dx = jax.value_and_grad(loss)(x)
    assert np.isfinite(float(val))
    # numeric check against the unfused XLA form
    from gptq_for_llama_tpu.ops.linear import quant_matmul_xla
    def loss_ref(xx):
        g = quant_matmul_xla(xx, gate, dtype=jnp.float32)
        u = quant_matmul_xla(xx, up, dtype=jnp.float32)
        return jnp.sum((jax.nn.silu(g) * u) ** 2)
    dx_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               atol=2e-2 * float(jnp.abs(dx_ref).max()),
                               rtol=0)
