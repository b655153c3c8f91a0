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
