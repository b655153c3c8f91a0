"""Pallas TPU kernel: single-token (decode) attention over a static KV cache.

The decode-path analog of the reference's fused attention module
(reference: quant/fused_attn.py:117-161 — fused QKV + in-place RoPE + SDPA).
RoPE and the cache write stay in XLA (they fuse well); this kernel fuses the
part XLA splits into ~8 ops per layer: masked q·K^T, softmax, and probs·V —
one kernel per decode step per layer, reading each cache slot once.

Supports per-row cache offsets (continuous batching). Prefill keeps the XLA
softmax path (models/common.sdpa) — it is MXU-bound and fuses fine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(off_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    off = off_ref[0]
    q = q_ref[0].astype(jnp.float32)            # (Ht, D)
    k = k_ref[0]                                 # (S, Ht, D)
    v = v_ref[0]
    s = k.shape[0]
    logits = jnp.sum(q[None, :, :] * k.astype(jnp.float32), axis=-1) * scale
    kj = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)  # (S, Ht)
    logits = jnp.where(kj <= off, logits, -jnp.inf)
    m = jnp.max(logits, axis=0, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=0, keepdims=True)
    w = (p / denom).astype(jnp.float32)          # (S, Ht)
    out = jnp.sum(w[:, :, None] * v.astype(jnp.float32), axis=0)  # (Ht, D)
    o_ref[0] = out.astype(o_ref.dtype)


def supports_decode_attention(q_len: int, num_heads: int, num_kv_heads: int,
                              head_dim: int) -> bool:
    return (q_len == 1 and num_heads == num_kv_heads
            and head_dim % 128 == 0 and num_heads % 8 == 0)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def decode_attention(q, k_cache, v_cache, offset, scale: float,
                     interpret: bool = False):
    """q: (B, 1, H, D); caches: (B, S, H, D); offset: () or (B,) int32.

    Returns (B, 1, H, D). Query attends cache slots <= its own offset (the
    current token's k/v must already be written at slot `offset`).
    """
    b, _, h, d = q.shape
    s = k_cache.shape[1]
    ht = 16 if h % 16 == 0 else 8
    offs = jnp.broadcast_to(jnp.asarray(offset, jnp.int32).reshape(-1), (b,))

    grid = (b, h // ht)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1,), lambda bi, hi: (bi,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ht, d), lambda bi, hi: (bi, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, ht, d), lambda bi, hi: (bi, 0, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, ht, d), lambda bi, hi: (bi, 0, hi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, d), lambda bi, hi: (bi, hi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(offs, q.reshape(b, h, d), k_cache, v_cache)
    return out.reshape(b, 1, h, d)
