"""Pallas kernel equivalence vs the XLA dequant-matmul oracle (interpret mode).

Every Pallas kernel ships with a jnp reference implementation; these tests pin
them together on CPU (interpret=True). Real-chip numerics are exercised by
bench.py and the TPU smoke path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gptq_for_llama_tpu.ops.linear import PackedLinear, quant_matmul_xla
from gptq_for_llama_tpu.ops.pallas import matmul as pmm
from gptq_for_llama_tpu.quant import packing


def _random_packed(k, n, bits, groupsize, seed=0, actorder=False):
    rng = np.random.RandomState(seed)
    g = k // groupsize
    codes = rng.randint(0, 2 ** bits, size=(k, n)).astype(np.uint32)
    qweight = packing.pack_rows(codes, bits)
    zeros = rng.randint(1, 2 ** bits, size=(g, n)).astype(np.uint32)
    qzeros = packing.pack_cols(zeros - 1, bits)
    scales = (rng.rand(g, n).astype(np.float32) * 0.02 + 0.005)
    g_idx = (np.arange(k) // groupsize).astype(np.int32)
    if actorder:
        p = rng.permutation(k)
        codes_p = packing.unpack_rows(qweight, bits, k=k)[np.argsort(p)]
        # rebuild wire in a scrambled row order with matching g_idx
        qweight = packing.pack_rows(codes_p, bits)
        g_idx = g_idx[np.argsort(p)]
    return PackedLinear.from_wire(qweight, qzeros, scales, g_idx, bits=bits,
                                  dtype=jnp.float32)


@pytest.mark.parametrize("bits", [2, 4, 8])
@pytest.mark.parametrize("m", [1, 8, 33])
def test_qmm_matches_xla(bits, m):
    k, n, gs = 128, 128, 32
    lin = _random_packed(k, n, bits, gs, seed=bits)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    want = np.asarray(quant_matmul_xla(x, lin, dtype=jnp.float32))
    got = np.asarray(pmm.quant_matmul_pallas(x, lin, interpret=True))
    # kernel feeds the MXU bf16 inputs (like the reference's fp16 kernels);
    # the f32 oracle differs by bf16 input rounding, which scales with |y|
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=tol, rtol=0)


def test_qmm_3d_batch_and_bias():
    k, n, gs = 64, 128, 32
    import dataclasses
    lin = _random_packed(k, n, 4, gs)
    lin = dataclasses.replace(
        lin, bias=jnp.asarray(np.linspace(-1, 1, n), jnp.float32))
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.standard_normal((2, 5, k)).astype(np.float32))
    want = np.asarray(quant_matmul_xla(x, lin, dtype=jnp.float32))
    got = np.asarray(pmm.quant_matmul_pallas(x, lin, interpret=True))
    assert got.shape == (2, 5, n)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_qmm_padded_k():
    """K with G % 8 != 0 but small pad: kernel pads K to 8*gs internally."""
    k, n, gs = 2176, 128, 32   # G=68 -> kp=2304 (+6%)
    lin = _random_packed(k, n, 4, gs, seed=7)
    assert lin.layout == "tpu" and lin.k_padded == 2304
    assert pmm.supports(lin)
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.standard_normal((3, k)).astype(np.float32) * 0.1)
    want = np.asarray(quant_matmul_xla(x, lin, dtype=jnp.float32))
    got = np.asarray(pmm.quant_matmul_pallas(x, lin, interpret=True))
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=tol, rtol=0)
    # wire round-trip drops the pad
    wire = lin.to_wire()
    assert wire["qweight"].shape == (k * 4 // 32, n)
    assert wire["scales"].shape == (k // gs, n)


def test_qmm_3bit_actorder():
    """act-order (non-monotone g_idx) + the 3-bit bit-plane layout together."""
    k, n, gs = 128, 128, 32
    lin = _random_packed(k, n, 3, gs, seed=44, actorder=True)
    assert lin.perm is not None and lin.layout == "tpu"
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.standard_normal((4, k)).astype(np.float32))
    want = np.asarray(quant_matmul_xla(x, lin, dtype=jnp.float32))
    got = np.asarray(pmm.quant_matmul_pallas(x, lin, interpret=True))
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=tol, rtol=0)


def test_qmm_actorder_perm():
    k, n, gs = 64, 128, 16
    lin = _random_packed(k, n, 4, gs, actorder=True)
    assert lin.perm is not None
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.standard_normal((4, k)).astype(np.float32))
    want = np.asarray(quant_matmul_xla(x, lin, dtype=jnp.float32))
    got = np.asarray(pmm.quant_matmul_pallas(x, lin, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_fused_mlp_matches_unfused():
    import jax
    from gptq_for_llama_tpu.ops.pallas import mlp as pmlp
    k, n, gs = 128, 128, 32
    gate = _random_packed(k, n, 4, gs, seed=10)
    up = _random_packed(k, n, 4, gs, seed=11)
    assert pmlp.supports_fused(gate, up)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.standard_normal((8, k)).astype(np.float32))
    g = quant_matmul_xla(x, gate, dtype=jnp.float32)
    u = quant_matmul_xla(x, up, dtype=jnp.float32)
    want = np.asarray(jax.nn.silu(g) * u)
    got = np.asarray(pmlp.fused_mlp_pallas(x, gate, up, interpret=True))
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=tol, rtol=0)


def test_rms_norm_matches_jnp():
    from gptq_for_llama_tpu.ops.pallas.norm import rms_norm_pallas
    from gptq_for_llama_tpu.models.common import rms_norm
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.standard_normal((2, 7, 256)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    want = np.asarray(rms_norm(x, w, 1e-6))
    got = np.asarray(rms_norm_pallas(x, w, 1e-6, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_supports_gates():
    lin = _random_packed(128, 128, 4, 32)
    assert pmm.supports(lin)
    # 3-bit with gs % 32 != 0: the pure bit-plane layout needed whole words
    # per group, but the round-5 nibble device layout (wire_bits=3, device
    # bits=4) only needs gs % 8 — this shape now runs on the kernel
    rng = np.random.RandomState(0)
    codes = rng.randint(0, 8, size=(96, 128)).astype(np.uint32)
    qweight = packing.pack_rows(codes, 3)
    zeros = np.ones((6, 128), np.uint32)
    qzeros = packing.pack_cols(zeros, 3)
    scales = np.ones((6, 128), np.float32)
    g_idx = (np.arange(96) // 16).astype(np.int32)
    lin3 = PackedLinear.from_wire(qweight, qzeros, scales, g_idx, bits=3,
                                  dtype=jnp.float32)
    assert lin3.bits == 4 and lin3.wire_bits == 3
    assert lin3.layout == "tpu" and pmm.supports(lin3)
    # the wire buffers survive the double re-layout byte-exactly
    np.testing.assert_array_equal(lin3.to_wire()["qweight"], qweight)


@pytest.mark.parametrize("m", [1, 8])
def test_qmm_3bit_kernel(m):
    """INT3 checkpoint on the nibble device layout (default): kernel matches
    the XLA dequant oracle and to_wire restores the 3-bit buffers."""
    k, n, gs = 128, 128, 32
    lin = _random_packed(k, n, 3, gs, seed=33)
    assert lin.layout == "tpu" and pmm.supports(lin)
    assert lin.bits == 4 and lin.wire_bits == 3  # nibble device layout
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    want = np.asarray(quant_matmul_xla(x, lin, dtype=jnp.float32))
    got = np.asarray(pmm.quant_matmul_pallas(x, lin, interpret=True))
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=tol, rtol=0)
    # wire round-trip preserves the original 3-bit buffers
    wire = lin.to_wire()
    assert wire["qweight"].shape == (k * 3 // 32, n)


@pytest.mark.parametrize("m", [1, 8])
def test_qmm_3bit_planes_kernel(m, monkeypatch):
    """GPTQ_TPU_INT3_PLANES=1 capacity mode: the pure 3-bit bit-plane device
    layout (3.0 bits/weight in HBM, slower VPU unpack) still runs and
    matches; its wire round-trip is byte-exact too."""
    monkeypatch.setenv("GPTQ_TPU_INT3_PLANES", "1")
    k, n, gs = 128, 128, 32
    lin = _random_packed(k, n, 3, gs, seed=34)
    assert lin.bits == 3 and lin.wire_bits is None
    assert lin.layout == "tpu" and pmm.supports(lin)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    want = np.asarray(quant_matmul_xla(x, lin, dtype=jnp.float32))
    got = np.asarray(pmm.quant_matmul_pallas(x, lin, interpret=True))
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=tol, rtol=0)
    assert lin.to_wire()["qweight"].shape == (k * 3 // 32, n)


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_qmm_single_group(bits):
    """groupsize=-1 semantics: ONE group spanning all of K (the reference's
    --groupsize -1 default, llama.py:459) takes the full-K tile plan (scale
    block = full G rows) instead of the XLA fallback."""
    k, n = 256, 128
    lin = _random_packed(k, n, bits, groupsize=k, seed=bits + 10)
    assert lin.scales.shape[0] == 1
    assert lin.layout == "tpu"
    assert pmm.supports(lin)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.standard_normal((4, k)).astype(np.float32))
    want = np.asarray(quant_matmul_xla(x, lin, dtype=jnp.float32))
    got = np.asarray(pmm.quant_matmul_pallas(x, lin, interpret=True))
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=tol, rtol=0)
