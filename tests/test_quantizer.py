"""Quantizer parameter search vs the numpy oracle."""

import numpy as np
import pytest

from gptq_for_llama_tpu.quant.quantizer import (
    QuantConfig, find_params_weight, find_params_activation, fake_quantize,
    quantize_affine)
import oracle


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
@pytest.mark.parametrize("sym", [False, True])
def test_find_params_perchannel(bits, sym):
    rng = np.random.default_rng(0)
    w = rng.normal(size=(16, 64)).astype(np.float32) * rng.uniform(0.5, 2.0, size=(16, 1))
    cfg = QuantConfig(bits=bits, perchannel=True, sym=sym)
    s, z = find_params_weight(w, cfg)
    s_ref, z_ref = oracle.minmax_params(w, cfg.maxq, sym)
    np.testing.assert_allclose(np.asarray(s)[:, 0], s_ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(z)[:, 0], z_ref, rtol=1e-6)


def test_find_params_pertensor():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(8, 32)).astype(np.float32)
    cfg = QuantConfig(bits=4, perchannel=False, sym=False)
    s, z = find_params_weight(w, cfg)
    s_ref, z_ref = oracle.minmax_params(w.reshape(1, -1), 15, False)
    assert np.allclose(np.asarray(s), s_ref[0], rtol=1e-6)
    assert np.allclose(np.asarray(z), z_ref[0], rtol=1e-6)
    assert np.asarray(s).shape == (8, 1)


def test_zero_range_guard():
    # all-zero rows must get the [-1, +1] range (reference quantizer.py:62-64)
    w = np.zeros((4, 16), dtype=np.float32)
    cfg = QuantConfig(bits=4, perchannel=True, sym=False)
    s, z = find_params_weight(w, cfg)
    np.testing.assert_allclose(np.asarray(s)[:, 0], 2.0 / 15.0, rtol=1e-6)
    # oracle in fp32: 1/(2/15) = 7.4999995f -> 7 (torch fp32 computes the same;
    # a float64 oracle would give 7.5 -> 8)
    expect_z = np.rint(np.float32(1.0) / (np.float32(2.0) / np.float32(15.0)))
    np.testing.assert_allclose(np.asarray(z)[:, 0], expect_z)


@pytest.mark.parametrize("sym", [False, True])
def test_mse_search(sym):
    rng = np.random.default_rng(2)
    w = rng.normal(size=(8, 128)).astype(np.float32)
    w[0, 0] = 20.0  # outlier: shrinking should win for this row
    cfg = QuantConfig(bits=4, perchannel=True, sym=sym, mse=True)
    s, z = find_params_weight(w, cfg)
    s_ref, z_ref = oracle.mse_params(w, 15, sym)
    np.testing.assert_allclose(np.asarray(s)[:, 0], s_ref, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(z)[:, 0], z_ref, rtol=1e-4)
    # MSE must actually shrink the outlier row's range
    s_mm, _ = oracle.minmax_params(w, 15, sym)
    assert s_ref[0] < s_mm[0]


def test_trits_params_and_quantize():
    rng = np.random.default_rng(3)
    w = rng.normal(size=(4, 32)).astype(np.float32)
    cfg = QuantConfig(perchannel=True, sym=False, trits=True)
    assert cfg.maxq == -1
    s, z = find_params_weight(w, cfg)
    s_ref, z_ref = oracle.minmax_params(w, -1, False)
    np.testing.assert_allclose(np.asarray(s)[:, 0], s_ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(z)[:, 0], z_ref, rtol=1e-6)
    q = np.asarray(fake_quantize(w, s, z, cfg))
    q_ref = oracle.quantize_values(w, s_ref[:, None], z_ref[:, None], -1)
    np.testing.assert_allclose(q, q_ref, rtol=1e-6)
    # ternary output has at most 3 distinct values per row
    for r in range(q.shape[0]):
        assert len(np.unique(q[r])) <= 3


def test_quantize_roundtrip_lattice():
    # values exactly on the lattice must survive quantize-dequantize
    rng = np.random.default_rng(4)
    scale = np.float32(0.1)
    zero = np.float32(7)
    codes = rng.integers(0, 16, size=(8, 16))
    x = (codes - zero) * scale
    q = np.asarray(quantize_affine(x.astype(np.float32), scale, zero, 15))
    np.testing.assert_allclose(q, x, atol=1e-6)


def test_activation_params():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 6, 32)).astype(np.float32)
    cfg = QuantConfig(bits=8, perchannel=False, sym=True)
    s, z = find_params_activation(x, cfg)
    s_ref, z_ref = oracle.minmax_params(x.reshape(1, -1), 255, True)
    assert np.allclose(np.asarray(s).ravel()[0], s_ref[0], rtol=1e-6)
    assert np.asarray(s).shape == (1, 1, 32)
