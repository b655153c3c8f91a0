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

    want = quantize_weight_to_codes(w, scales, zeros, g_idx)
    got = native.quantize_to_codes(w, scales, zeros, g_idx, maxq=15)
    np.testing.assert_array_equal(got, want)
