"""Pallas TPU kernel: memory-resident causal prefill attention.

The XLA softmax path materializes the (B, H, S, S) fp32 logits in HBM —
~2.7 GB of traffic per layer at S=2048 — which dominates prefill, calibration
forwards, and ppl evaluation. This kernel keeps each query tile's logits in
VMEM: per (batch*head, q-tile) program it loads the full K/V for that head
(S x D bf16 = 512 KB at S=2048 — fits VMEM comfortably), computes the masked
softmax in registers, and writes only the (BQ, D) output. Beyond the VMEM cap
(S > ~8k), and for CACHED prefill (sq chunk tokens attending an skv cache at
an offset — chunked serving prefill), `flash_prefill_blocked` streams KV in
blocks with an online softmax (running max/denominator in VMEM scratch).

GQA is handled in the index map: query head h reads KV head h // ratio — no
repeated K/V materialization (the XLA path pays a full repeat).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, bq: int):
    qt = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.bfloat16)                    # (BQ, D)
    k = k_ref[0, 0].astype(jnp.bfloat16)                    # (S, D)
    v = v_ref[0, 0].astype(jnp.bfloat16)
    s = k.shape[0]
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (BQ, S)
    qi = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + qt * bq
    kj = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(kj <= qi, logits, -jnp.inf)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    w = p / jnp.sum(p, axis=1, keepdims=True)
    o_ref[0, 0] = jnp.dot(w.astype(jnp.bfloat16), v,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def supports_prefill(sq: int, skv: int, num_heads: int, num_kv_heads: int,
                     head_dim: int) -> bool:
    # K+V VMEM budget 2 MB (S <= 4096 at d=128). The previous 4 MB cap
    # admitted S=8192, where the Mosaic compile REPEATABLY crashes the
    # remote tpu_compile_helper (HTTP 500, round-5 bisect: resident FAILs in
    # ~1.4 s while blocked at the same shape compiles and runs) — S >= 8k
    # now dispatches to flash_prefill_blocked, which is the right kernel at
    # that scale anyway (validated on chip: bench_artifacts/r05/).
    return (sq == skv and sq % 256 == 0 and head_dim % 128 == 0
            and num_heads % num_kv_heads == 0
            and skv * head_dim * 2 * 2 <= 2 * 1024 * 1024)


# ---------------------------------------------------------------------------
# blocked-KV online-softmax variant: sq < skv (cached/chunked prefill) and
# skv beyond the VMEM-resident cap (long context)
# ---------------------------------------------------------------------------

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)  # large-negative, nan-safe


def _load_bf16(block):
    """VMEM K/V block -> bf16 (the MXU operand dtype here). fp8-e4m3 caches
    upcast via integer bit math — Mosaic's native fp8 convert is 3-27x
    slower than the kernel body (see ops/pallas/attention._load_f32 and
    bench_artifacts/r05/fp8_upcast.json); the bf16 bit pattern is exact for
    every non-NaN code (3-bit mantissa fits bf16's 7, subnormal man*2^-9 is
    a power-of-two multiple)."""
    if block.dtype == jnp.float8_e4m3fn:
        u = jax.lax.bitcast_convert_type(block, jnp.uint8).astype(jnp.int32)
        sign = jnp.where((u & 0x80) != 0, -1.0, 1.0).astype(jnp.bfloat16)
        em = u & 0x7F
        bits = ((em << 4) + (120 << 7)).astype(jnp.uint16)
        normal = jax.lax.bitcast_convert_type(bits, jnp.bfloat16)
        sub = (em & 0x7).astype(jnp.bfloat16) * jnp.bfloat16(2.0 ** -9)
        return jnp.where((em >> 3) == 0, sub, normal) * sign
    return block.astype(jnp.bfloat16)


def _flash_blocked_kernel(off_ref, q_ref, k_ref, v_ref, o_ref,
                          m_ref, l_ref, acc_ref, *, scale: float, bq: int,
                          bk: int):
    qt, kt = pl.program_id(2), pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(kt == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    off = off_ref[0]
    # kv blocks entirely above this q tile's causal limit contribute nothing:
    # skip their MXU work (the DMA is already prefetched; decode pays the same
    # full-cache read every step)
    @pl.when(kt * bk < off + (qt + 1) * bq)
    def _compute():
        q = q_ref[0, 0].astype(jnp.bfloat16)                  # (BQ, D)
        k = _load_bf16(k_ref[0, 0])                           # (BK, D)
        v = _load_bf16(v_ref[0, 0])
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # (BQ, BK)
        qi = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qt * bq + off
        kj = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kt * bk
        s = jnp.where(kj <= qi, s, _NEG)
        m_prev = m_ref[:, :1]                                 # (BQ, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot(
            p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kt == nk - 1)
    def _out():
        o_ref[0, 0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


def _blocked_tiles(sq: int, skv: int):
    bq = next((t for t in (256, 128) if sq % t == 0), None)
    bk = next((t for t in (512, 256, 128) if skv % t == 0), None)
    return bq, bk


def supports_prefill_blocked(sq: int, skv: int, num_heads: int,
                             num_kv_heads: int, head_dim: int) -> bool:
    """Cached prefill (sq queries at offset into an skv cache) or causal
    self-attention too long for the VMEM-resident kernel."""
    bq, bk = _blocked_tiles(sq, skv)
    return (bq is not None and bk is not None and head_dim % 128 == 0
            and num_heads % num_kv_heads == 0 and sq <= skv)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def flash_prefill_blocked(q, k, v, q_offset, scale: float,
                          interpret: bool = False):
    """Blocked-KV flash attention with online softmax.

    q: (B, SQ, H, D) — SQ query tokens whose absolute positions start at
    q_offset (traced int32 scalar). k/v: (B, SKV, Hkv, D) — the cache,
    ALREADY containing the chunk's own k/v (apply_kv_cache writes before
    attention). Query i attends cache slots j <= q_offset + i. q_offset=0 with
    SQ == SKV is plain causal self-attention with no VMEM cap on SKV.

    The reference has nothing comparable (it materializes full logits and is
    capped at seqlen 2048); this is the north-star long-context/serving path.
    """
    b, sq, h, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    ratio = h // hkv
    bq, bk = _blocked_tiles(sq, skv)

    qt = jnp.swapaxes(q, 1, 2)        # (B, H, SQ, D)
    kt = jnp.swapaxes(k, 1, 2)        # (B, Hkv, SKV, D)
    vt = jnp.swapaxes(v, 1, 2)

    grid = (b, h, sq // bq, skv // bk)
    out = pl.pallas_call(
        functools.partial(_flash_blocked_kernel, scale=scale, bq=bq, bk=bk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq, d),
                             lambda bi, hi, qi, ki, off: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, bk, d),
                             lambda bi, hi, qi, ki, off, _r=ratio:
                             (bi, hi // _r, ki, 0)),
                pl.BlockSpec((1, 1, bk, d),
                             lambda bi, hi, qi, ki, off, _r=ratio:
                             (bi, hi // _r, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, d),
                                   lambda bi, hi, qi, ki, off: (bi, hi, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),   # running max
                pltpu.VMEM((bq, 128), jnp.float32),   # running denom
                pltpu.VMEM((bq, d), jnp.float32),     # output accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * skv * d,
            bytes_accessed=b * (h * sq + 2 * hkv * skv) * d * 2,
            transcendentals=b * h * sq * skv),
        interpret=interpret,
    )(jnp.asarray(q_offset, jnp.int32).reshape(1), qt, kt, vt)
    return jnp.swapaxes(out, 1, 2)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def flash_prefill(q, k, v, scale: float, interpret: bool = False):
    """Causal self-attention; q (B, S, H, D), k/v (B, S, Hkv, D) -> (B, S, H, D)."""
    b, s, h, d = q.shape
    hkv = k.shape[2]
    ratio = h // hkv
    bq = 256

    qt = jnp.swapaxes(q, 1, 2)        # (B, H, S, D)
    kt = jnp.swapaxes(k, 1, 2)        # (B, Hkv, S, D)
    vt = jnp.swapaxes(v, 1, 2)

    grid = (b, h, s // bq)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, bq=bq),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d),
                         lambda bi, hi, qi, _r=ratio: (bi, hi // _r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d),
                         lambda bi, hi, qi, _r=ratio: (bi, hi // _r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * d,
            bytes_accessed=b * h * s * d * 2 * 3,
            transcendentals=b * h * s * s),
        interpret=interpret,
    )(qt, kt, vt)
    return jnp.swapaxes(out, 1, 2)