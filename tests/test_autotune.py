"""Measured-autotuner cache mechanics (reference custom_autotune.py:14-127).

Measurement itself needs a real chip; here the timing hook is faked so the
selection, persistence, cold-reload, and kernel-dispatch plumbing are pinned
on CPU.
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from gptq_for_llama_tpu.ops.pallas import autotune as at
from gptq_for_llama_tpu.ops.pallas import matmul as pmm
from gptq_for_llama_tpu.ops.linear import PackedLinear, quant_matmul_xla
from gptq_for_llama_tpu.quant import packing


def _lin(k=512, n=512, bits=4, gs=32, seed=0):
    rng = np.random.RandomState(seed)
    g = k // gs
    codes = rng.randint(0, 2 ** bits, size=(k, n)).astype(np.uint32)
    zeros = rng.randint(1, 2 ** bits, size=(g, n)).astype(np.uint32)
    scales = (rng.rand(g, n) * 0.02 + 0.005).astype(np.float32)
    return PackedLinear.from_wire(
        packing.pack_rows(codes, bits), packing.pack_cols(zeros - 1, bits),
        scales, (np.arange(k) // gs).astype(np.int32), bits=bits,
        dtype=jnp.float32)


@pytest.fixture
def tune_cache(tmp_path, monkeypatch):
    path = str(tmp_path / "autotune.json")
    monkeypatch.setenv("GPTQ_TPU_AUTOTUNE_CACHE", path)
    at.reset_cache_for_tests()
    yield path
    at.reset_cache_for_tests()


def test_candidates_valid_and_include_heuristic():
    k, n, gs, bits = 4096, 12288, 128, 4
    cands = at.candidates(k, n, gs, bits)
    assert cands, "7B qkv shape must have candidates"
    g = k // gs
    for bg, bn in cands:
        assert g % bg == 0 and n % bn == 0
        assert bg * gs * bits // 32 * bn * 4 <= pmm._QW_TILE_BYTES
    assert pmm._best_blocks(k, n, gs, bits) == cands[0]


def test_store_lookup_persist_cold_reload(tune_cache):
    at.store("fwd", 4096, 12288, 4, 128, 8, (16, 512))
    assert at.lookup("fwd", 4096, 12288, 4, 128, 8) == (16, 512)
    # M buckets share pow2 keys like the reference (custom_autotune.py:84-87)
    assert at.lookup("fwd", 4096, 12288, 4, 128, 7) == (16, 512)
    assert at.lookup("fwd", 4096, 12288, 4, 128, 16) is None
    # cold process: reload from disk
    at.reset_cache_for_tests()
    assert at.lookup("fwd", 4096, 12288, 4, 128, 8) == (16, 512)
    data = json.load(open(tune_cache))
    assert data["_version"] == at._VERSION


def test_tune_qmm_selects_fake_fastest_and_persists(tune_cache, monkeypatch):
    lin = _lin()
    want = at.candidates(lin.k_padded, lin.out_features, lin.groupsize,
                         lin.bits)[-1]

    def fake_measure(fn, x, args=(), iters=20, reps=2):
        # pretend the LAST candidate is fastest (recorded via closure below)
        fake_measure.calls += 1
        return 1e-3 if fake_measure.calls == fake_measure.n else 2e-3
    fake_measure.calls = 0
    fake_measure.n = len(at.candidates(lin.k_padded, lin.out_features,
                                       lin.groupsize, lin.bits))
    monkeypatch.setattr(at, "measure", fake_measure)

    got = at.tune_qmm(lin, 8)
    assert got == want
    # second call is a cache hit: no further measurement
    calls = fake_measure.calls
    assert at.tune_qmm(lin, 8) == want and fake_measure.calls == calls


def test_kernel_dispatch_uses_tuned_blocks(tune_cache):
    """quant_matmul_pallas consults the cache at trace time; a tuned entry
    changes the tiling without changing the result."""
    lin = _lin()
    cands = at.candidates(lin.k_padded, lin.out_features, lin.groupsize,
                          lin.bits)
    alt = cands[-1]
    at.store("fwd", lin.k_padded, lin.out_features, lin.bits, lin.groupsize,
             8, alt)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.standard_normal((4, lin.in_features)).astype(np.float32))
    want = np.asarray(quant_matmul_xla(x, lin, dtype=jnp.float32))
    got = np.asarray(pmm.quant_matmul_pallas(x, lin, interpret=True))
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=tol, rtol=0)


def test_disabled_mode(tune_cache, monkeypatch):
    monkeypatch.setenv("GPTQ_TPU_AUTOTUNE", "0")
    at.store("fwd", 64, 128, 4, 32, 8, (8, 128))
    assert at.lookup("fwd", 64, 128, 4, 32, 8) is None


def test_transposed_dispatch_uses_tuned_blocks(tune_cache):
    """quant_matmul_t_pallas consults the 'bwd' cache at trace time; a tuned
    entry changes the tiling without changing the grad-input."""
    lin = _lin(seed=7)
    cands = at.candidates(lin.k_padded, lin.out_features, lin.groupsize,
                          lin.bits)
    at.store("bwd", lin.k_padded, lin.out_features, lin.bits, lin.groupsize,
             8, cands[-1])
    rng = np.random.RandomState(8)
    g = jnp.asarray(rng.standard_normal((4, lin.out_features))
                    .astype(np.float32))
    w = np.asarray(lin.dequantize(jnp.float32))  # (K_sorted, N)
    want = np.asarray(g) @ w.T
    got = np.asarray(pmm.quant_matmul_t_pallas(g, lin, interpret=True))
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=tol, rtol=0)


def test_tune_qmm_bwd_kind(tune_cache, monkeypatch):
    lin = _lin(seed=9)
    cands = at.candidates(lin.k_padded, lin.out_features, lin.groupsize,
                          lin.bits)

    def fake_measure(fn, x, args=(), iters=20, reps=2):
        assert x.shape == (8, lin.out_features)  # cotangent rows, N cols
        fake_measure.calls += 1
        return 1e-3 if fake_measure.calls == len(cands) else 2e-3
    fake_measure.calls = 0
    monkeypatch.setattr(at, "measure", fake_measure)
    assert at.tune_qmm(lin, 8, kind="bwd") == cands[-1]
    assert at.lookup("bwd", lin.k_padded, lin.out_features, lin.bits,
                     lin.groupsize, 8) == cands[-1]
    # fwd cache is independent
    assert at.lookup("fwd", lin.k_padded, lin.out_features, lin.bits,
                     lin.groupsize, 8) is None


def test_tune_mlp_selects_fake_fastest_and_persists(tune_cache, monkeypatch):
    gate, up = _lin(seed=2), _lin(seed=3)
    cands = at.candidates(gate.k_padded, gate.out_features, gate.groupsize,
                          gate.bits, n_weights=2)
    want = cands[-1]

    def fake_measure(fn, x, args=(), iters=20, reps=2):
        fake_measure.calls += 1
        return 1e-3 if fake_measure.calls == len(cands) else 2e-3
    fake_measure.calls = 0
    monkeypatch.setattr(at, "measure", fake_measure)

    got = at.tune_mlp(gate, up, 8)
    assert got == want
    calls = fake_measure.calls
    assert at.tune_mlp(gate, up, 8) == want and fake_measure.calls == calls


def test_fused_mlp_dispatch_uses_tuned_blocks(tune_cache):
    """fused_mlp_pallas consults the 'mlp' cache at trace time; a tuned entry
    changes the tiling without changing the result."""
    from gptq_for_llama_tpu.ops.pallas import mlp as pmlp
    gate, up = _lin(seed=4), _lin(seed=5)
    cands = at.candidates(gate.k_padded, gate.out_features, gate.groupsize,
                          gate.bits, n_weights=2)
    at.store("mlp", gate.k_padded, gate.out_features, gate.bits,
             gate.groupsize, 8, cands[-1])
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.standard_normal((4, gate.in_features))
                    .astype(np.float32))
    g = np.asarray(quant_matmul_xla(x, gate, dtype=jnp.float32))
    u = np.asarray(quant_matmul_xla(x, up, dtype=jnp.float32))
    want = g / (1.0 + np.exp(-g)) * u
    got = np.asarray(pmlp.fused_mlp_pallas(x, gate, up, interpret=True))
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=tol, rtol=0)
