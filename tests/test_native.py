"""Native C++ packlib vs numpy reference parity (skipped if g++ unavailable)."""

import numpy as np
import pytest

from gptq_for_llama_tpu import native


requires_native = pytest.mark.skipif(native.get_lib() is None,
                                     reason="no native toolchain")


@requires_native
@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_native_pack_matches_numpy(bits, monkeypatch):
    from gptq_for_llama_tpu.quant import packing
    rng = np.random.RandomState(bits)
    k, n = 96, 64
    codes = rng.randint(0, 2 ** bits, size=(k, n)).astype(np.uint32)

    native_packed = native.pack_rows(codes, bits)
    # force the pure-numpy path for the oracle
    monkeypatch.setenv("GPTQ_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    numpy_packed = packing.pack_rows(codes, bits)
    np.testing.assert_array_equal(native_packed, numpy_packed)

    monkeypatch.setattr(native, "_TRIED", False)
    monkeypatch.delenv("GPTQ_TPU_NO_NATIVE")
    unpacked = native.unpack_rows(numpy_packed, bits, k)
    np.testing.assert_array_equal(unpacked, codes.astype(np.int32))


def _numpy_codes(w, scales, zeros, g_idx):
    """The pure-numpy oracle (duplicated here so the test pins the native
    path against it even though packing.quantize_weight_to_codes now calls
    the native fast path itself)."""
    s = scales.astype(np.float64)[:, g_idx]
    z = zeros.astype(np.float64)[:, g_idx]
    return np.rint(w.astype(np.float64) / s + z).astype(np.int64).T.astype(
        np.int32)


@requires_native
def test_native_quantize_to_codes():
    from gptq_for_llama_tpu.quant.packing import quantize_weight_to_codes
    rng = np.random.RandomState(0)
    n_rows, k, g = 16, 64, 4
    g_idx = (np.arange(k) // (k // g)).astype(np.int32)
    scales = (rng.rand(n_rows, g) * 0.02 + 0.005).astype(np.float32)
    zeros = rng.randint(1, 15, size=(n_rows, g)).astype(np.float32)
    codes0 = rng.randint(0, 16, size=(n_rows, k))
    w = ((codes0 - zeros[:, g_idx]) * scales[:, g_idx]).astype(np.float32)

    want = _numpy_codes(w, scales, zeros, g_idx)
    got = native.quantize_to_codes(w, scales, zeros, g_idx)
    np.testing.assert_array_equal(got, want)
    # production entry point dispatches to the same result
    np.testing.assert_array_equal(
        quantize_weight_to_codes(w, scales, zeros, g_idx), want)


@requires_native
def test_native_quantize_ties_and_wrap():
    """Round-half-to-even at exact .5 boundaries and the zero==0 uint wrap
    (regression: the old native code rounded half-away-from-zero in fp32 and
    clamped, diverging from np.rint at exactly these inputs)."""
    n_rows, g = 1, 1
    g_idx = np.zeros(8, np.int32)
    scales = np.ones((n_rows, g), np.float32)
    zeros = np.zeros((n_rows, g), np.float32)
    # w/s + z hits exact ties 0.5, 1.5, 2.5, -0.5, -1.5 and a negative wrap
    w = np.array([[0.5, 1.5, 2.5, -0.5, -1.5, -1.0, 3.0, 16.0]], np.float32)
    want = _numpy_codes(w, scales, zeros, g_idx)
    got = native.quantize_to_codes(w, scales, zeros, g_idx)
    np.testing.assert_array_equal(got, want)
    # ties went to even; -1 wrapped to 0xffffffff viewed as int32 -1
    assert got.reshape(-1).tolist() == [0, 2, 2, 0, -2, -1, 3, 16]


def test_gather_rows_packed_matches_numpy():
    """Word-level packed-row gather (C++ and fallback) == unpack/index/repack."""
    from gptq_for_llama_tpu.quant import packing
    from gptq_for_llama_tpu import native
    rng = np.random.RandomState(0)
    for bits in (2, 4, 8):
        k, n = 256, 96
        codes = rng.randint(0, 2 ** bits, size=(k, n)).astype(np.uint32)
        packed = packing.pack_rows(codes, bits)
        perm = rng.permutation(k).astype(np.int32)
        want = packing.pack_rows(codes[perm], bits)
        got = packing.gather_rows_packed(packed, perm, bits)
        np.testing.assert_array_equal(got, want)
        if native.get_lib() is not None:
            got_native = native.gather_rows_packed(packed, perm, bits)
            np.testing.assert_array_equal(got_native, want)
