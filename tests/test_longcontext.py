"""Long-sequence paths: chunked-query attention parity + long-seq eval."""

import numpy as np
import jax
import jax.numpy as jnp

from gptq_for_llama_tpu.models.common import causal_mask, sdpa


def test_chunked_query_sdpa_matches_unchunked():
    b, s, h, d = 1, 512, 2, 32  # s > 256 triggers the chunked path
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    mask = causal_mask(s, s)
    got = np.asarray(sdpa(q, k, v, mask))
    # oracle: unchunked math via a non-multiple length (no chunk path)
    want_parts = []
    for qs in range(0, s, 128):  # manual reference chunks of a DIFFERENT size
        want_parts.append(np.asarray(
            sdpa(q[:, qs:qs + 128], k, v, mask[qs:qs + 128])))
    want = np.concatenate(want_parts, axis=1)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_flash_prefill_matches_sdpa():
    from gptq_for_llama_tpu.ops.pallas.flash import (flash_prefill,
                                                     supports_prefill)
    b, s, h, hkv, d = 2, 512, 4, 2, 128  # GQA ratio 2
    assert supports_prefill(s, s, h, hkv, d)
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)).astype(np.float32))
    want = np.asarray(sdpa(q, k, v, causal_mask(s, s)))
    got = np.asarray(flash_prefill(q, k, v, d ** -0.5, interpret=True))
    tol = 3e-2 * float(np.abs(want).max())  # kernel uses bf16 MXU inputs
    np.testing.assert_allclose(got, want, atol=tol, rtol=0)


def test_long_seq_eval_finite():
    """seqlen 512 full-model eval through the chunked attention path."""
    from gptq_for_llama_tpu.engine import perplexity
    from gptq_for_llama_tpu.models import registry
    from gptq_for_llama_tpu.models.config import ModelConfig
    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=32,
                      intermediate_size=64, num_layers=1, num_heads=4,
                      num_kv_heads=4, head_dim=8, max_seq_len=512)
    arch = registry.get_arch("llama")
    params = arch.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = np.random.RandomState(0).randint(0, 64, size=2 * 512).astype(np.int32)
    ppl = perplexity("llama", cfg, params, ids, seqlen=512)
    assert np.isfinite(ppl)


def test_flash_prefill_blocked_cached_matches_sdpa():
    """Cached prefill: sq chunk tokens attend an skv cache at an offset
    (chunked serving prefill). Kernel (interpret) vs the XLA masked path."""
    from gptq_for_llama_tpu.models.common import decode_mask
    from gptq_for_llama_tpu.ops.pallas.flash import (
        flash_prefill_blocked, supports_prefill_blocked)
    rng = np.random.RandomState(2)
    for (b, sq, skv, h, hkv, d, off) in [(2, 128, 512, 4, 2, 128, 37),
                                         (1, 256, 1024, 8, 8, 128, 777),
                                         (1, 128, 256, 4, 4, 128, 0)]:
        assert supports_prefill_blocked(sq, skv, h, hkv, d)
        q = jnp.asarray(rng.standard_normal((b, sq, h, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, skv, hkv, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, skv, hkv, d)).astype(np.float32))
        want = np.asarray(sdpa(q, k, v, decode_mask(sq, skv, jnp.int32(off)),
                               d ** -0.5))
        got = np.asarray(flash_prefill_blocked(q, k, v, jnp.int32(off),
                                               d ** -0.5, interpret=True))
        tol = 3e-2 * float(np.abs(want).max())
        np.testing.assert_allclose(got, want, atol=tol, rtol=0)


def test_flash_prefill_blocked_long_self_attention():
    """q_offset=0, sq == skv: plain causal self-attention with no VMEM cap —
    the S>8k long-context form (tested at a CPU-friendly size)."""
    from gptq_for_llama_tpu.ops.pallas.flash import (
        flash_prefill_blocked, supports_prefill, supports_prefill_blocked)
    b, s, h, hkv, d = 1, 1024, 2, 2, 128
    assert supports_prefill_blocked(s, s, h, hkv, d)
    # and it covers shapes the VMEM-resident kernel must reject
    assert not supports_prefill(16384, 16384, h, hkv, 256)
    assert supports_prefill_blocked(16384, 16384, h, hkv, 256)
    # cap boundary (round 5): S=8192 at d=128 repeatably crashes the Mosaic
    # remote compile for the resident kernel — it must dispatch blocked
    assert supports_prefill(4096, 4096, h, hkv, 128)
    assert not supports_prefill(8192, 8192, h, hkv, 128)
    assert supports_prefill_blocked(8192, 8192, h, hkv, 128)
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)).astype(np.float32))
    want = np.asarray(sdpa(q, k, v, causal_mask(s, s), d ** -0.5))
    got = np.asarray(flash_prefill_blocked(q, k, v, jnp.int32(0), d ** -0.5,
                                           interpret=True))
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=tol, rtol=0)


def test_sdpa_dispatches_blocked_kernel_for_cached_prefill(monkeypatch):
    """sdpa with a scalar decode_offset and sq>1 must route to the blocked
    kernel when forced (GPTQ_TPU_ATTN_IMPL=pallas) and match the XLA path."""
    from gptq_for_llama_tpu.models.common import decode_mask
    b, sq, skv, h, d, off = 1, 128, 512, 4, 128, 300
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)).astype(np.float32))
    mask = decode_mask(sq, skv, jnp.int32(off))
    monkeypatch.setenv("GPTQ_TPU_ATTN_IMPL", "xla")
    want = np.asarray(sdpa(q, k, v, mask, decode_offset=jnp.int32(off)))
    monkeypatch.setenv("GPTQ_TPU_ATTN_IMPL", "pallas")
    got = np.asarray(sdpa(q, k, v, mask, decode_offset=jnp.int32(off)))
    tol = 3e-2 * float(np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=tol, rtol=0)
