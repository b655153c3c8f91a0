"""Bit-packing round-trips, wire-format compatibility, and device dequantization."""

import numpy as np
import jax.numpy as jnp
import pytest

from gptq_for_llama_tpu.quant import packing


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_pack_unpack_rows_roundtrip(bits):
    rng = np.random.default_rng(0)
    k, n = 96, 8  # 96 is a multiple of 32 (3-bit) and of 32/bits
    codes = rng.integers(0, 2 ** bits, size=(k, n)).astype(np.int32)
    packed = packing.pack_rows(codes, bits)
    assert packed.dtype == np.int32
    assert packed.shape == (k * bits // 32, n)
    out = packing.unpack_rows(packed, bits, k=k)
    np.testing.assert_array_equal(out, codes)


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_pack_unpack_cols_roundtrip(bits):
    rng = np.random.default_rng(1)
    g, n = 4, 96
    codes = rng.integers(0, 2 ** bits, size=(g, n)).astype(np.int32)
    packed = packing.pack_cols(codes, bits)
    assert packed.shape == (g, n * bits // 32)
    out = packing.unpack_cols(packed, bits, n=n)
    np.testing.assert_array_equal(out, codes)


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_jnp_unpack_matches_numpy(bits):
    rng = np.random.default_rng(2)
    k, n = 64, 16
    codes = rng.integers(0, 2 ** bits, size=(k, n)).astype(np.int32)
    packed = packing.pack_rows(codes, bits)
    out = np.asarray(packing.unpack_rows_jnp(jnp.asarray(packed), bits, k=k))
    np.testing.assert_array_equal(out, codes)
    zpacked = packing.pack_cols(codes.T.copy(), bits)
    zout = np.asarray(packing.unpack_cols_jnp(jnp.asarray(zpacked), bits, n=k))
    np.testing.assert_array_equal(zout, codes.T)


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_wire_format_matches_reference_loop(bits):
    """The vectorized packer must produce byte-identical words to the reference's
    per-row loop scheme (quant_linear.py:342-353): value j of word w sits at bit
    offset bits*j, rows ordered k = w*(32/bits) + j."""
    rng = np.random.default_rng(3)
    k, n = 64, 4
    codes = rng.integers(0, 2 ** bits, size=(k, n)).astype(np.uint32)
    ipw = 32 // bits
    expected = np.zeros((k // ipw, n), dtype=np.uint32)
    for row in range(expected.shape[0]):
        for j in range(ipw):
            expected[row] |= codes[row * ipw + j] << (bits * j)
    got = packing.pack_rows(codes.astype(np.int32), bits)
    np.testing.assert_array_equal(got.view(np.uint32), expected)


def test_pack_quantized_and_dequantize():
    rng = np.random.default_rng(4)
    bits, k, n, gs = 4, 128, 32, 64
    g = k // gs
    g_idx = (np.arange(k) // gs).astype(np.int32)
    scales = rng.uniform(0.05, 0.2, size=(n, g)).astype(np.float32)
    zeros = rng.integers(1, 15, size=(n, g)).astype(np.float32)
    codes = rng.integers(0, 16, size=(n, k))
    w = (codes - zeros[:, g_idx]) * scales[:, g_idx]  # lattice-aligned (N, K)

    buffers = packing.pack_quantized(w, scales, zeros, g_idx, bits)
    assert buffers["qweight"].shape == (k // 32 * bits, n)
    assert buffers["qzeros"].shape == (g, n // 32 * bits)
    assert buffers["scales"].shape == (g, n)

    w_deq = np.asarray(packing.dequantize(
        jnp.asarray(buffers["qweight"]), jnp.asarray(buffers["qzeros"]),
        jnp.asarray(buffers["scales"]), jnp.asarray(buffers["g_idx"]), bits))
    # dequantize returns (K, N); scales are stored fp16 (reference wire format),
    # so tolerance is the fp16 relative precision of the scales (~5e-4)
    np.testing.assert_allclose(w_deq, w.T, rtol=1e-3, atol=1e-3)


def test_qzeros_minus_one_offset():
    """zero==1 must pack to raw 0 and dequantize back to 1 (the reference's
    zeros-1 storage with +1 in the kernel, quant_linear.py:356 & :121)."""
    bits, k, n = 4, 32, 8
    g_idx = np.zeros(k, dtype=np.int32)
    scales = np.ones((n, 1), dtype=np.float32)
    zeros = np.ones((n, 1), dtype=np.float32)
    w = np.zeros((n, k), dtype=np.float32)  # codes all == zero == 1
    buffers = packing.pack_quantized(w, scales, zeros, g_idx, bits)
    assert (packing.unpack_cols(buffers["qzeros"], bits, n=n) == 0).all()
    w_deq = np.asarray(packing.dequantize(
        jnp.asarray(buffers["qweight"]), jnp.asarray(buffers["qzeros"]),
        jnp.asarray(buffers["scales"]), jnp.asarray(buffers["g_idx"]), bits))
    np.testing.assert_allclose(w_deq, 0.0, atol=1e-7)


def test_3bit_needs_32_rows():
    with pytest.raises(ValueError):
        packing.pack_rows(np.zeros((16, 4), dtype=np.int32), 3)


def test_unsupported_bits():
    with pytest.raises(NotImplementedError):
        packing.pack_rows(np.zeros((32, 4), dtype=np.int32), 5)


@pytest.mark.parametrize("actorder", [False, True])
def test_wire_roundtrip_byte_identical_bf16(actorder):
    """Regression (advisor round 1): loading a reference checkpoint into a
    bf16 model and saving it back must be BYTE-identical — including the fp16
    scales, which bf16 cannot represent. PackedLinear keeps the original
    wire-precision scales buffer (scales_wire) for to_wire."""
    from gptq_for_llama_tpu.ops.linear import PackedLinear

    rng = np.random.RandomState(3)
    k, n, bits, gs = 2176, 128, 4, 32  # G=68: also exercises the K padding
    g = k // gs
    codes = rng.randint(0, 2 ** bits, size=(k, n)).astype(np.uint32)
    qweight = packing.pack_rows(codes, bits)
    qzeros = packing.pack_cols(
        rng.randint(1, 2 ** bits, size=(g, n)).astype(np.uint32) - 1, bits)
    scales = (rng.rand(g, n).astype(np.float32) * 0.02 + 0.005).astype(
        np.float16)  # wire format stores fp16
    g_idx = (np.arange(k) // gs).astype(np.int32)
    if actorder:
        # non-monotone g_idx triggers the group-sort row permutation path;
        # byte round-trip only needs consistent buffers, not solver output
        g_idx = g_idx[rng.permutation(k)]

    lin = PackedLinear.from_wire(qweight, qzeros, scales, g_idx, bits=bits,
                                 dtype=jnp.bfloat16)
    assert lin.scales.dtype == jnp.bfloat16
    wire = lin.to_wire()
    np.testing.assert_array_equal(wire["qweight"], qweight)
    np.testing.assert_array_equal(wire["qzeros"], qzeros)
    np.testing.assert_array_equal(wire["g_idx"], g_idx)
    assert wire["scales"].dtype == np.float16
    assert wire["scales"].tobytes() == scales.tobytes()

    # scales_wire lives on the HOST in pytree aux: it must not be a tree
    # leaf (no HBM, not part of any jitted step signature) and must survive
    # tree_map / device_put round trips byte-intact
    import jax as _jax
    assert not any(leaf is lin.scales_wire
                   for leaf in _jax.tree_util.tree_leaves(lin))
    assert isinstance(lin.scales_wire.arr, np.ndarray)
    mapped = _jax.tree_util.tree_map(lambda x: x, lin)
    assert mapped.scales_wire is lin.scales_wire
    moved = _jax.device_put(lin)
    assert moved.to_wire()["scales"].tobytes() == scales.tobytes()
