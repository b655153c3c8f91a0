"""Paged KV cache: block-table memory management for continuous batching.

Beyond the reference (whose cache is a growing per-sequence concat,
fused_attn.py:140-143) and required by the north star: sequences share one
physical block pool (L, num_blocks, block_size, Hkv, D); each slot owns a
block table mapping logical block -> physical block. Memory scales with
actual tokens, not slots * max_len, so many more concurrent sequences fit.

Device side is functional: writes are per-slot scatters into the pool,
attention gathers the slot's blocks through the table. The allocator is host
code (the scheduler already runs on host between decode steps).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class BlockAllocator:
    """Host-side free-list over the physical block pool.

    `reserved` low block indices are never handed out — the serving engine
    keeps block 0 as a scratch block so the 0 filler in unowned block-table
    entries aliases no slot's cache (overshoot writes from multi-step decode
    spans land there harmlessly instead of corrupting a neighbor).
    """

    num_blocks: int
    reserved: int = 0

    def __post_init__(self):
        self.free = list(range(self.num_blocks - 1, self.reserved - 1, -1))
        self.owned: dict[int, list[int]] = {}

    def alloc(self, slot: int, n: int) -> list[int]:
        if len(self.free) < n:
            raise MemoryError(f"paged KV pool exhausted: need {n}, "
                              f"have {len(self.free)} free blocks")
        blocks = [self.free.pop() for _ in range(n)]
        self.owned.setdefault(slot, []).extend(blocks)
        return blocks

    def release(self, slot: int):
        self.free.extend(reversed(self.owned.pop(slot, [])))

    def ensure_capacity(self, slot: int, tokens: int, block_size: int) -> list[int]:
        """Grow slot's table so `tokens` positions fit; returns new blocks."""
        have = len(self.owned.get(slot, []))
        need = -(-tokens // block_size) - have
        return self.alloc(slot, need) if need > 0 else []


class PagedKV:
    """Device pool + per-slot block tables (padded to max_blocks_per_slot)."""

    def __init__(self, num_layers: int, num_blocks: int, block_size: int,
                 num_kv_heads: int, head_dim: int, slots: int,
                 max_len: int, dtype=jnp.bfloat16):
        self.block_size = block_size
        self.max_blocks = -(-max_len // block_size)
        shape = (num_layers, num_blocks, block_size, num_kv_heads, head_dim)
        self.k = jnp.zeros(shape, dtype)
        self.v = jnp.zeros(shape, dtype)
        # physical block per (slot, logical block); 0 is a valid block, unused
        # entries are masked by the offset so any filler value is safe
        self.tables = np.zeros((slots, self.max_blocks), np.int32)
        self.alloc = BlockAllocator(num_blocks)

    def tables_device(self):
        return jnp.asarray(self.tables)


def paged_write(k_pool, v_pool, k_new, v_new, tables, offsets):
    """Write one token per slot into the pool.

    k_pool/v_pool: (L, NB, BS, H, D); k_new/v_new: (L, B, 1, H, D);
    tables: (B, max_blocks) int32; offsets: (B,) int32 (position being written).
    Returns updated pools.
    """
    bs = k_pool.shape[2]
    phys = jnp.take_along_axis(tables, (offsets // bs)[:, None], axis=1)[:, 0]
    off = offsets % bs

    def write_slot(pools, b):
        kp, vp = pools
        kp = jax.lax.dynamic_update_slice(
            kp, k_new[:, b][:, None], (0, phys[b], off[b], 0, 0))
        vp = jax.lax.dynamic_update_slice(
            vp, v_new[:, b][:, None], (0, phys[b], off[b], 0, 0))
        return (kp, vp), None

    (k_pool, v_pool), _ = jax.lax.scan(write_slot, (k_pool, v_pool),
                                       jnp.arange(tables.shape[0]))
    return k_pool, v_pool


def paged_gather(pool_layer, table):
    """(NB, BS, H, D) pool layer + (max_blocks,) table -> (max_blocks*BS, H, D)
    contiguous logical KV for one slot."""
    blocks = jnp.take(pool_layer, table, axis=0)  # (MB, BS, H, D)
    mb, bs, h, d = blocks.shape
    return blocks.reshape(mb * bs, h, d)


def paged_update_layer(kp, vp, k_new, v_new, tables, offset, write_mask=None,
                       gather=True):
    """One layer's paged-cache update + logical gather (the arch-layer hook).

    kp/vp: (NB, BS, Hkv, D) this layer's pool slice; k_new/v_new (B, s, H, D);
    tables (B, MB); offset scalar or (B,) — the first position being written.
    s == 1 is the decode write; s > 1 is a prefill write and requires
    block-aligned offsets (serving prefills at 0). Writing past the sequence
    end inside a block is safe: those positions are masked until the real
    token overwrites them before first read. Returns (kp, vp, k_eff, v_eff)
    where k_eff/v_eff are the gathered logical (B, MB*BS, H, D) views, or
    (None, None) with gather=False (pool-native attention reads the blocks
    directly — ops/pallas/attention.paged_decode_attention).
    write_mask: optional (B,) bool — rows with False keep their existing pool
    contents (decode alongside mid-prefill slots must not clobber them). In
    the s > 1 (prefill) branch masked-off rows are redirected to the reserved
    scratch block 0 (batched admission; the pool must carry that block).
    """
    b, s, h, d = k_new.shape
    bs = kp.shape[1]
    offv = jnp.broadcast_to(jnp.asarray(offset, jnp.int32).reshape(-1), (b,))
    k_new = k_new.astype(kp.dtype)
    v_new = v_new.astype(vp.dtype)

    if s == 1:
        phys = jnp.take_along_axis(tables, (offv // bs)[:, None], axis=1)[:, 0]
        off_in = offv % bs
        if write_mask is not None:
            def rd(pool, bi):
                return jax.lax.dynamic_slice(
                    pool, (phys[bi], off_in[bi], 0, 0), (1, 1, h, d))[0]
            k_new = jnp.stack([jnp.where(write_mask[bi], k_new[bi],
                                         rd(kp, bi)) for bi in range(b)])
            v_new = jnp.stack([jnp.where(write_mask[bi], v_new[bi],
                                         rd(vp, bi)) for bi in range(b)])

        def write(pools, bi):
            kpl, vpl = pools
            kpl = jax.lax.dynamic_update_slice(
                kpl, k_new[bi][None], (phys[bi], off_in[bi], 0, 0))
            vpl = jax.lax.dynamic_update_slice(
                vpl, v_new[bi][None], (phys[bi], off_in[bi], 0, 0))
            return (kpl, vpl), None

        (kp, vp), _ = jax.lax.scan(write, (kp, vp), jnp.arange(b))
    else:
        nblk = -(-s // bs)
        pad = nblk * bs - s
        if pad:
            k_new = jnp.pad(k_new, ((0, 0), (0, pad), (0, 0), (0, 0)))
            v_new = jnp.pad(v_new, ((0, 0), (0, pad), (0, 0), (0, 0)))
        kc = k_new.reshape(b, nblk, bs, h, d)
        vc = v_new.reshape(b, nblk, bs, h, d)

        def write(pools, bi):
            kpl, vpl = pools
            base = offv[bi] // bs
            for j in range(nblk):
                phys = jax.lax.dynamic_slice(tables, (bi, base + j), (1, 1))[0, 0]
                if write_mask is not None:
                    # masked prefill rows (batched admission): redirect the
                    # write to the reserved scratch block 0 instead of the
                    # slot's real blocks — requires a pool with a reserved
                    # scratch block (ServingEngine paged mode always has one)
                    phys = jnp.where(write_mask[bi], phys, 0)
                kpl = jax.lax.dynamic_update_slice(
                    kpl, kc[bi, j][None], (phys, 0, 0, 0))
                vpl = jax.lax.dynamic_update_slice(
                    vpl, vc[bi, j][None], (phys, 0, 0, 0))
            return (kpl, vpl), None

        (kp, vp), _ = jax.lax.scan(write, (kp, vp), jnp.arange(b))

    if not gather:
        return kp, vp, None, None
    mb = tables.shape[1]
    g_k = jax.vmap(lambda t: jnp.take(kp, t, axis=0).reshape(mb * bs, h, d))
    g_v = jax.vmap(lambda t: jnp.take(vp, t, axis=0).reshape(mb * bs, h, d))
    return kp, vp, g_k(tables), g_v(tables)


def paged_decode_attention(q, k_pool_layer, v_pool_layer, tables, offsets,
                           scale: float):
    """Single-token attention over the paged cache (one layer).

    q: (B, 1, H, D); pools: (NB, BS, Hkv, D); tables (B, MB); offsets (B,).
    The token's k/v must already be written at `offsets`. Returns (B, 1, H, D).
    """
    from ..models.common import sdpa, decode_mask

    def one(qb, table, off):
        k = paged_gather(k_pool_layer, table)[None]  # (1, S, H, D)
        v = paged_gather(v_pool_layer, table)[None]
        mask = decode_mask(1, k.shape[1], off)
        return sdpa(qb[None], k, v, mask, scale=scale)[0]

    return jax.vmap(one)(q, tables, offsets)
