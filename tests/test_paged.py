"""Paged KV cache: allocator behavior + parity with the dense cache."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gptq_for_llama_tpu.models.common import decode_mask, sdpa
from gptq_for_llama_tpu.runtime.paged import (BlockAllocator, PagedKV,
                                              paged_decode_attention,
                                              paged_write)


def test_allocator_alloc_release():
    a = BlockAllocator(8)
    b0 = a.alloc(0, 3)
    b1 = a.alloc(1, 4)
    assert len(set(b0) | set(b1)) == 7
    with pytest.raises(MemoryError):
        a.alloc(2, 2)
    a.release(0)
    assert len(a.free) == 4
    assert a.ensure_capacity(1, tokens=5 * 16, block_size=16) != []  # grow to 5


def test_layer_paged_matches_dense():
    """arch.layer with the paged protocol == dense cache, prefill + decode."""
    from gptq_for_llama_tpu.models import registry
    from gptq_for_llama_tpu.models.config import ModelConfig
    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=32,
                      intermediate_size=64, num_layers=1, num_heads=4,
                      num_kv_heads=4, head_dim=8, max_seq_len=64)
    arch = registry.get_arch("llama")
    params = arch.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    lp = params["layers"][0]
    rng = np.random.RandomState(1)
    B, BS, MB = 2, 8, 3
    max_len = MB * BS

    paged = PagedKV(1, 8, BS, cfg.num_kv_heads, cfg.head_dim, slots=B,
                    max_len=max_len, dtype=jnp.float32)
    for slot in range(B):
        blocks = paged.alloc.ensure_capacity(slot, max_len, BS)
        paged.tables[slot, :len(blocks)] = blocks
    tables = paged.tables_device()
    kp, vp = paged.k[0], paged.v[0]

    dk = jnp.zeros((B, max_len, cfg.num_kv_heads, cfg.head_dim), jnp.float32)
    dv = jnp.zeros_like(dk)

    # prefill 8 tokens (block-aligned), then 3 decode steps
    x0 = jnp.asarray(rng.standard_normal((B, 8, 32)).astype(np.float32))
    pos = jnp.arange(8)[None, :]
    off = jnp.zeros((B,), jnp.int32)
    mask = decode_mask(8, max_len, off)
    yd, _, (dk, dv) = arch.layer(cfg, lp, x0, pos, mask, (dk, dv, off))
    yp, _, (kp, vp) = arch.layer(cfg, lp, x0, pos, mask,
                                 ("paged", kp, vp, tables, off))
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yd), atol=1e-5,
                               rtol=1e-5)
    for t in range(8, 11):
        x1 = jnp.asarray(rng.standard_normal((B, 1, 32)).astype(np.float32))
        pos = jnp.full((B, 1), t, jnp.int32)
        off = jnp.full((B,), t, jnp.int32)
        mask = decode_mask(1, max_len, off)
        yd, _, (dk, dv) = arch.layer(cfg, lp, x1, pos, mask, (dk, dv, off))
        yp, _, (kp, vp) = arch.layer(cfg, lp, x1, pos, mask,
                                     ("paged", kp, vp, tables, off))
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yd), atol=1e-5,
                                   rtol=1e-5, err_msg=f"t={t}")


def test_paged_matches_dense_cache():
    L, B, H, D, BS, NB = 2, 3, 4, 32, 8, 16
    max_len = 24  # 3 blocks/slot
    rng = np.random.RandomState(0)
    paged = PagedKV(L, NB, BS, H, D, slots=B, max_len=max_len,
                    dtype=jnp.float32)
    # non-trivial block assignment: interleave slots' physical blocks
    for slot in range(B):
        blocks = paged.alloc.ensure_capacity(slot, max_len, BS)
        paged.tables[slot, :len(blocks)] = blocks

    dense_k = np.zeros((L, B, max_len, H, D), np.float32)
    dense_v = np.zeros((L, B, max_len, H, D), np.float32)
    k_pool, v_pool = paged.k, paged.v
    tables = paged.tables_device()

    # write 10 tokens per slot, slots at different offsets; finished slots
    # re-write their last value (idempotent), like a retired serving slot
    lens = np.array([10, 7, 4], np.int32)
    last_k = np.zeros((L, B, 1, H, D), np.float32)
    last_v = np.zeros((L, B, 1, H, D), np.float32)
    for t in range(int(lens.max())):
        active = lens > t
        offs = jnp.asarray(np.minimum(t, lens - 1).astype(np.int32))
        k_new = rng.standard_normal((L, B, 1, H, D)).astype(np.float32)
        v_new = rng.standard_normal((L, B, 1, H, D)).astype(np.float32)
        for b in range(B):
            if active[b]:
                last_k[:, b] = k_new[:, b]
                last_v[:, b] = v_new[:, b]
            else:
                k_new[:, b] = last_k[:, b]
                v_new[:, b] = last_v[:, b]
        k_pool, v_pool = paged_write(k_pool, v_pool, jnp.asarray(k_new),
                                     jnp.asarray(v_new), tables, offs)
        for b in range(B):
            if active[b]:
                dense_k[:, b, t] = k_new[:, b, 0]
                dense_v[:, b, t] = v_new[:, b, 0]

    offsets = jnp.asarray(lens - 1)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)).astype(np.float32))
    got = np.asarray(paged_decode_attention(q, k_pool[0], v_pool[0], tables,
                                            offsets, scale=D ** -0.5))
    # dense oracle (pad dense cache to the paged logical length)
    s_logical = paged.max_blocks * BS
    dk = np.zeros((B, s_logical, H, D), np.float32)
    dv = np.zeros((B, s_logical, H, D), np.float32)
    dk[:, :max_len] = np.swapaxes(dense_k[0], 0, 0)
    dv[:, :max_len] = dense_v[0]
    mask = decode_mask(1, s_logical, offsets)
    want = np.asarray(sdpa(q, jnp.asarray(dk), jnp.asarray(dv), mask))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_pool_native_decode_kernel_parity():
    """ops/pallas/attention.pool_decode_attention (pool-native, table-routed
    block DMA) matches the dense decode kernel over the gathered view —
    interpret mode, GQA shapes, varied live lengths, permuted physical
    blocks."""
    from gptq_for_llama_tpu.ops.pallas.attention import (
        decode_attention, pool_decode_attention as pool_kernel,
        supports_paged_decode)
    rng = np.random.RandomState(0)
    B, H, HKV, D = 3, 8, 4, 128
    BS, MB, NB = 16, 8, 32
    assert supports_paged_decode(BS, H, HKV, D)
    kp = jnp.asarray(rng.standard_normal((NB, BS, HKV, D)).astype(np.float32))
    vp = jnp.asarray(rng.standard_normal((NB, BS, HKV, D)).astype(np.float32))
    tables = jnp.asarray(
        rng.permutation(NB)[:B * MB].reshape(B, MB).astype(np.int32))
    offs = jnp.asarray([5, 37, 127], jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)).astype(np.float32))
    scale = 1.0 / D ** 0.5
    got = np.asarray(pool_kernel(q, kp, vp, tables, offs, scale,
                                 interpret=True))
    kd = jnp.take(kp, tables, axis=0).reshape(B, MB * BS, HKV, D)
    vd = jnp.take(vp, tables, axis=0).reshape(B, MB * BS, HKV, D)
    want = np.asarray(decode_attention(q, kd, vd, offs, scale,
                                       interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_paged_serving_forced_pallas_matches_xla(monkeypatch):
    """Full paged ServingEngine with the pool-native kernel FORCED through
    interpret mode must produce the same greedy outputs as the XLA gather
    path (the whole decode program runs the kernel, not just the unit)."""
    from gptq_for_llama_tpu.models import registry
    from gptq_for_llama_tpu.models.config import ModelConfig
    from gptq_for_llama_tpu.runtime.serve import GenRequest, ServingEngine

    from gptq_for_llama_tpu.ops.pallas.attention import supports_paged_decode
    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=1024,
                      intermediate_size=128, num_layers=2, num_heads=8,
                      num_kv_heads=4, head_dim=128, max_seq_len=64)
    assert supports_paged_decode(8, cfg.num_heads, cfg.num_kv_heads,
                                 cfg.head_dim)  # forced run hits the kernel
    arch = registry.get_arch("llama")
    params = arch.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompts = [np.array([1, 2, 3], np.int32), np.array([5, 6], np.int32),
               np.array([9, 8, 7, 6], np.int32)]

    def run():
        eng = ServingEngine("llama", cfg, params, batch_slots=2,
                            max_seq_len=32, dtype=jnp.float32, paged=True,
                            block_size=8, prefill_buckets=(8,))
        for uid, p in enumerate(prompts):
            eng.submit(GenRequest(uid=uid, prompt=p, max_new_tokens=5,
                                  temperature=0.0))
        return eng.run()

    monkeypatch.setenv("GPTQ_TPU_ATTN_IMPL", "xla")
    base = run()
    monkeypatch.setenv("GPTQ_TPU_ATTN_IMPL", "pallas")
    got = run()
    for uid in base:
        np.testing.assert_array_equal(got[uid], base[uid],
                                      err_msg=f"request {uid}")
