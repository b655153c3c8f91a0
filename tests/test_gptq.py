"""GPTQ solver vs the independent numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from gptq_for_llama_tpu.quant.gptq import (
    GPTQResult, batch_hessian, update_hessian, gptq_quantize, rtn_quantize)
from gptq_for_llama_tpu.quant.quantizer import QuantConfig
import oracle


def _problem(rows=16, cols=64, nsamples=4, tokens=32, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(rows, cols)).astype(np.float32)
    x = rng.normal(size=(nsamples, tokens, cols)).astype(np.float32)
    h = np.zeros((cols, cols), dtype=np.float32)
    for j in range(nsamples):
        h += x[j].T @ x[j]
    h *= 2.0 / nsamples
    return w, x, h


def test_batch_hessian_matches_streaming():
    _, x, h_ref = _problem()
    h1 = np.asarray(batch_hessian(jnp.asarray(x)))
    np.testing.assert_allclose(h1, h_ref, rtol=1e-4, atol=1e-4)
    h2 = jnp.zeros((x.shape[-1], x.shape[-1]), jnp.float32)
    n = jnp.zeros((), jnp.float32)
    for j in range(x.shape[0]):
        h2, n = update_hessian(h2, n, jnp.asarray(x[j]))
    np.testing.assert_allclose(np.asarray(h2), h_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("groupsize", [-1, 16, 32])
@pytest.mark.parametrize("sym", [False, True])
def test_gptq_matches_oracle(groupsize, sym):
    w, _, h = _problem(seed=1)
    cfg = QuantConfig(bits=4, perchannel=True, sym=sym)
    res = gptq_quantize(jnp.asarray(w), jnp.asarray(h), cfg,
                        blocksize=32, groupsize=groupsize)
    q_ref, s_ref, z_ref, g_ref, err_ref = oracle.gptq_reference(
        w, h, bits=4, sym=sym, blocksize=32, groupsize=groupsize)
    np.testing.assert_array_equal(np.asarray(res.g_idx), g_ref)
    np.testing.assert_allclose(np.asarray(res.scale), s_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.zero), z_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.qweight), q_ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(res.error), err_ref, rtol=2e-2)


def test_gptq_actorder_matches_oracle():
    w, _, h = _problem(seed=2)
    # spread the diagonal so argsort order is unambiguous across implementations
    h += np.diag(np.linspace(0.0, 10.0, h.shape[0])[::-1].copy()).astype(np.float32)
    cfg = QuantConfig(bits=4, perchannel=True, sym=False)
    res = gptq_quantize(jnp.asarray(w), jnp.asarray(h), cfg,
                        blocksize=32, groupsize=16, actorder=True)
    q_ref, s_ref, z_ref, g_ref, _ = oracle.gptq_reference(
        w, h, bits=4, blocksize=32, groupsize=16, actorder=True)
    np.testing.assert_array_equal(np.asarray(res.g_idx), g_ref)
    np.testing.assert_allclose(np.asarray(res.qweight), q_ref, rtol=1e-3, atol=1e-3)


def test_gptq_dead_columns():
    w, _, h = _problem(seed=3)
    h[:, :4] = 0.0
    h[:4, :] = 0.0  # first 4 inputs never fire
    cfg = QuantConfig(bits=4, perchannel=True, sym=False)
    res = gptq_quantize(jnp.asarray(w), jnp.asarray(h), cfg, blocksize=32)
    q = np.asarray(res.qweight)
    # dead columns were zeroed before quantization; quantizing 0 stays on the grid
    q_ref, *_ = oracle.gptq_reference(w, h, bits=4, blocksize=32)
    np.testing.assert_allclose(q[:, :4], q_ref[:, :4], atol=1e-5)


def test_gptq_improves_on_rtn():
    """GPTQ's error-compensated rounding must beat RTN on correlated inputs
    (the reference's whole reason to exist; cf. README ppl tables)."""
    rng = np.random.default_rng(4)
    rows, cols, tokens = 32, 128, 512
    w = rng.normal(size=(rows, cols)).astype(np.float32)
    base = rng.normal(size=(tokens, cols // 4)).astype(np.float32)
    x = (base @ rng.normal(size=(cols // 4, cols)).astype(np.float32)
         + 0.1 * rng.normal(size=(tokens, cols)).astype(np.float32))
    h = (2.0 / 1) * (x.T @ x)
    cfg = QuantConfig(bits=3, perchannel=True, sym=False)
    res = gptq_quantize(jnp.asarray(w), jnp.asarray(h), cfg, blocksize=32)
    q_rtn = np.asarray(rtn_quantize(jnp.asarray(w), cfg))
    err_gptq = np.mean(((x @ np.asarray(res.qweight).T) - x @ w.T) ** 2)
    err_rtn = np.mean(((x @ q_rtn.T) - x @ w.T) ** 2)
    assert err_gptq < err_rtn * 0.9


def test_rtn_grouped():
    rng = np.random.default_rng(5)
    w = rng.normal(size=(8, 64)).astype(np.float32)
    cfg = QuantConfig(bits=4, perchannel=True, sym=False)
    q = np.asarray(rtn_quantize(jnp.asarray(w), cfg, groupsize=16))
    # each (row, group) slice must use its own minmax params
    for g in range(4):
        blk = w[:, g * 16:(g + 1) * 16]
        s, z = oracle.minmax_params(blk, 15, False)
        q_ref = oracle.quantize_values(blk, s[:, None], z[:, None], 15)
        np.testing.assert_allclose(q[:, g * 16:(g + 1) * 16], q_ref, atol=1e-5)


def test_gptq_trits():
    w, _, h = _problem(seed=6)
    cfg = QuantConfig(perchannel=True, sym=False, trits=True)
    res = gptq_quantize(jnp.asarray(w), jnp.asarray(h), cfg, blocksize=32, groupsize=16)
    q = np.asarray(res.qweight)
    for r in range(q.shape[0]):
        # ternary: values per (row, group) drawn from {scale, zero, 0}
        assert len(np.unique(np.round(q[r], 5))) <= 3 * (w.shape[1] // 16)
