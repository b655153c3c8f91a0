"""Pallas TPU kernel: single-token (decode) attention over a static KV cache.

The decode-path analog of the reference's fused attention module
(reference: quant/fused_attn.py:117-161 — fused QKV + in-place RoPE + SDPA).
RoPE and the cache write stay in XLA (they fuse well); this kernel fuses the
part XLA splits into ~8 ops per layer: masked q·K^T, softmax, and probs·V.

Bandwidth design: the cache is blocked along the sequence axis and the KV
block index map CLAMPS to the last live block (scalar-prefetched per-row
offsets) — grid steps past the live prefix map to the same block index, and
Pallas skips the DMA for a block that is already resident. Cache HBM traffic
is therefore proportional to the LIVE context, not to max_len (a full-length
static cache would otherwise cost e.g. 32 MB/layer/step for 7B at 2048).
Softmax is accumulated online (flash-style m/l rescaling) across seq blocks.

Supports per-row cache offsets (continuous batching). Prefill keeps the XLA
softmax path (models/common.sdpa) — it is MXU-bound and fuses fine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 6 * 1024 * 1024  # k+v blocks, double-buffered


def _load_f32(block):
    """Read a VMEM K/V block as fp32.

    fp8-e4m3-stored caches upcast via INTEGER bit math instead of Mosaic's
    native convert: bf16 bit pattern = (em<<4) + (120<<7) for normals,
    man * 2^-9 for subnormals — bit-exact for all 254 non-NaN codes (KV
    caches are NaN-free by construction). Measured on v5e (round 5,
    bench_artifacts/r05/fp8_upcast.json): the native convert made fp8
    kernels 3-27x slower than their bf16 twins (746-1987 us vs ~330); the
    integer path runs at ~bf16 parity (68.7 vs 63.5 us on the probe shape),
    which is what makes fp8 caches usable on the kernel path at all."""
    if block.dtype == jnp.float8_e4m3fn:
        u = jax.lax.bitcast_convert_type(block, jnp.uint8).astype(jnp.int32)
        sign = jnp.where((u & 0x80) != 0, -1.0, 1.0).astype(jnp.float32)
        em = u & 0x7F
        bits = ((em << 4) + (120 << 7)).astype(jnp.uint16)
        normal = jax.lax.bitcast_convert_type(bits,
                                              jnp.bfloat16).astype(jnp.float32)
        sub = (em & 0x7).astype(jnp.float32) * (2.0 ** -9)
        return jnp.where((em >> 3) == 0, sub, normal) * sign
    return block.astype(jnp.float32)


def _seq_block(s: int) -> int:
    """Seq rows per KV block. 128 preferred over 256: it halves the minimum
    live-prefix read at short contexts (bench/serving run max_len 256, live
    16-128) while long contexts lose nothing — steps past the live prefix
    clamp to the same block and their DMAs are elided."""
    for bs in (128, 64):
        if s % bs == 0:
            return bs
    return s


def _attn_kernel(off_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                 *, scale: float, seq_block: int):
    bi = pl.program_id(0)
    si = pl.program_id(2)
    off = off_ref[bi]

    @pl.when(si == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    base = si * seq_block

    @pl.when(base <= off)
    def _():
        q = q_ref[0].astype(jnp.float32)             # (Ht, D)
        k = _load_f32(k_ref[0])                      # (BS, Ht, D)
        v = _load_f32(v_ref[0])
        logits = jnp.sum(q[None, :, :] * k, axis=-1) * scale     # (BS, Ht)
        kj = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + base
        logits = jnp.where(kj <= off, logits, -jnp.inf)
        m_blk = jnp.max(logits, axis=0)                          # (Ht,)
        m_old = m_ref[0]                                         # (Ht,)
        m_new = jnp.maximum(m_old, m_blk)
        # renormalize previous accumulation to the new max
        corr = jnp.exp(m_old - m_new)                            # (Ht,)
        p = jnp.exp(logits - m_new[None, :])                     # (BS, Ht)
        l_ref[0] = l_ref[0] * corr + jnp.sum(p, axis=0)
        acc_ref[:] = acc_ref[:] * corr[:, None] \
            + jnp.sum(p[:, :, None] * v, axis=0)                 # (Ht, D)
        m_ref[0] = m_new

    @pl.when(si == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[0][:, None]).astype(o_ref.dtype)


def _gqa_blocks(num_heads: int, num_kv_heads: int, seq_block: int = 64,
                head_dim: int = 128, itemsize: int = 2):
    """(ht kv-heads per block, G q-heads per kv head) or None.

    The q block covers ht*G contiguous q heads (q head order is kv-major:
    h = kvh*G + g), so ht*G must be sublane-friendly (multiple of 8, <= 64)
    and ht must divide num_kv_heads. Picks the LARGEST ht whose k+v blocks
    (double-buffered) fit the VMEM budget: covering every head in ONE grid
    step drops the per-step fixed cost that dominated odd head counts (13B
    h=40 used to run 5 sequential ht=8 steps per layer)."""
    if num_heads % num_kv_heads:
        return None
    g = num_heads // num_kv_heads
    for ht in sorted({num_kv_heads, 32, 16, 8, 4, 2, 1}, reverse=True):
        if ht > num_kv_heads or num_kv_heads % ht:
            continue
        htq = ht * g
        if htq > 64 or htq % 8:
            continue
        if 4 * seq_block * ht * head_dim * itemsize > _VMEM_BUDGET:
            continue
        return ht, g
    return None


def supports_decode_attention(q_len: int, num_heads: int, num_kv_heads: int,
                              head_dim: int, seq_len: int | None = None,
                              itemsize: int = 2) -> bool:
    """Gate with the REAL cache geometry when the caller has it: the block
    plan depends on the derived seq block and the cache itemsize, so gating
    with defaults while the kernel re-derives stricter params could admit a
    shape whose plan is infeasible (round-4 advisor finding). decode_attention
    also falls back internally, so a stale gate degrades, never crashes."""
    bs = _seq_block(seq_len) if seq_len is not None else 64
    return (q_len == 1 and head_dim % 128 == 0
            and _gqa_blocks(num_heads, num_kv_heads, bs, head_dim,
                            itemsize) is not None)


def _attn_kernel_gqa(off_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref,
                     l_ref, *, scale: float, seq_block: int, ht: int, g: int):
    """GQA variant: the q block holds ht*G q heads grouped per kv head; the
    cache block is DMA'd ONCE per kv head for all its G q heads (the XLA
    fallback repeats k/v G times — G x the HBM traffic). In-VMEM the kv heads
    are expanded by sublane concat (Mosaic rejects the reshape form) and the
    math is identical to the MHA kernel."""
    bi = pl.program_id(0)
    si = pl.program_id(2)
    off = off_ref[bi]

    @pl.when(si == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    base = si * seq_block

    @pl.when(base <= off)
    def _():
        q = q_ref[0].astype(jnp.float32)                     # (Ht*G, D)
        k = _load_f32(k_ref[0])                              # (BS, Ht, D)
        v = _load_f32(v_ref[0])
        # expand kv heads G-fold along the head (sublane) dim: q head
        # kvh*G + j pairs with kv head kvh
        k = jnp.concatenate(
            [k[:, i:i + 1, :] for i in range(ht) for _ in range(g)], axis=1)
        v = jnp.concatenate(
            [v[:, i:i + 1, :] for i in range(ht) for _ in range(g)], axis=1)
        logits = jnp.sum(q[None, :, :] * k, axis=-1) * scale  # (BS, Ht*G)
        kj = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + base
        logits = jnp.where(kj <= off, logits, -jnp.inf)
        m_blk = jnp.max(logits, axis=0)
        m_old = m_ref[0]
        m_new = jnp.maximum(m_old, m_blk)
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(logits - m_new[None, :])
        l_ref[0] = l_ref[0] * corr + jnp.sum(p, axis=0)
        acc_ref[:] = acc_ref[:] * corr[:, None] \
            + jnp.sum(p[:, :, None] * v, axis=0)
        m_ref[0] = m_new

    @pl.when(si == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[0][:, None]).astype(o_ref.dtype)


def _fused_attn_kernel(off_ref, wm_ref, q_ref, k_ref, v_ref, kn_ref, vn_ref,
                       o_ref, ko_ref, vo_ref, acc_ref, m_ref, l_ref, *,
                       scale: float, seq_block: int, ht: int, g: int,
                       write: bool = True):
    """Decode attention + IN-PLACE cache row write, one kernel.

    Prefix slots (< off) stream from the cache blocks exactly like
    _attn_kernel_gqa; the CURRENT token's k/v arrive as separate (1, Ht, D)
    register inputs and are folded into the online softmax on the last grid
    step — so attention never needs the cache row to be written first, and
    the write itself happens here: the 8-row slab holding `off` is copied
    from the resident block, the row inserted, and DMA'd back over the
    ALIASED cache buffer (input_output_aliases). This removes the per-layer
    XLA dynamic-update-slice pair that cost ~32 us/buffer/token on 13B
    (bench_artifacts/r05/decomp2_13b.json, cache_probe.json: the DUS carries
    a ~12 us floor even standalone — op count, not bytes, was the cost)."""
    bi = pl.program_id(0)
    si = pl.program_id(2)
    off = off_ref[bi]

    @pl.when(si == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    base = si * seq_block

    def expand(blk):  # (.., Ht, D) kv heads -> q-head-major (.., Ht*G, D)
        if g == 1:
            return blk
        return jnp.concatenate(
            [blk[..., i:i + 1, :] for i in range(ht) for _ in range(g)],
            axis=-2)

    @pl.when(base < off)
    def _():  # prefix blocks: slots strictly below the write position
        q = q_ref[0].astype(jnp.float32)                     # (Ht*G, D)
        k = expand(_load_f32(k_ref[0]))                      # (BS, Ht*G, D)
        v = expand(_load_f32(v_ref[0]))
        logits = jnp.sum(q[None, :, :] * k, axis=-1) * scale
        kj = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + base
        logits = jnp.where(kj < off, logits, -jnp.inf)
        m_blk = jnp.max(logits, axis=0)
        m_old = m_ref[0]
        m_new = jnp.maximum(m_old, m_blk)
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(logits - m_new[None, :])
        l_ref[0] = l_ref[0] * corr + jnp.sum(p, axis=0)
        acc_ref[:] = acc_ref[:] * corr[:, None] \
            + jnp.sum(p[:, :, None] * v, axis=0)
        m_ref[0] = m_new

    @pl.when(si == pl.num_programs(2) - 1)
    def _():
        # fold the current token in from registers, then finalize
        q = q_ref[0].astype(jnp.float32)                     # (Ht*G, D)
        kn = expand(kn_ref[0].astype(jnp.float32))           # (1, Ht*G, D)
        vn = expand(vn_ref[0].astype(jnp.float32))
        logit_cur = jnp.sum(q * kn[0], axis=-1) * scale      # (Ht*G,)
        m_old = m_ref[0]
        m_new = jnp.maximum(m_old, logit_cur)
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(logit_cur - m_new)
        l = l_ref[0] * corr + p
        acc = acc_ref[:] * corr[:, None] + p[:, None] * vn[0]
        o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)
        if not write:
            return
        # cache write: the 8-row slab containing `off` within the resident
        # block (clamped kv_map guarantees this step holds block off//BS)
        local = off % seq_block
        slab0 = (local // 8) * 8
        slab_k = k_ref[0, pl.dslice(slab0, 8)]               # (8, Ht, D)
        slab_v = v_ref[0, pl.dslice(slab0, 8)]
        ko_ref[0] = slab_k
        vo_ref[0] = slab_v

        @pl.when(wm_ref[bi] != 0)
        def _():
            r = local - slab0
            ko_ref[0, pl.dslice(r, 1)] = kn_ref[0].astype(ko_ref.dtype)
            vo_ref[0, pl.dslice(r, 1)] = vn_ref[0].astype(vo_ref.dtype)


def supports_fused_decode(q_len: int, num_heads: int, num_kv_heads: int,
                          head_dim: int, seq_len: int,
                          itemsize: int = 2) -> bool:
    """Gate for fused attention + cache write: decode attention's block plan
    plus an 8-aligned seq axis for the write-back slab."""
    return (seq_len % 8 == 0
            and supports_decode_attention(q_len, num_heads, num_kv_heads,
                                          head_dim, seq_len, itemsize))


def fused_decode_attention(q, k_cache, v_cache, k_new, v_new, offset,
                           scale: float, write_mask=None,
                           interpret: bool = False, write: bool = True):
    # NOT @jax.jit on purpose: a nested jit is a call boundary that XLA does
    # not propagate the pallas input_output_aliases through — the caches get
    # defensively copied and the in-place win evaporates. Callers are always
    # inside the runner/serving step jit already.
    # write=False: attention-only form (stale prefix + register fold, no
    # cache output) — the caller writes the row separately. Used by the
    # deferred-write path and perf probes.
    """One-kernel decode step: attention over [cache[:off], (k_new, v_new)]
    and an in-place write of k_new/v_new at slot `off`.

    q, k_new, v_new: (B, 1, H|Hkv, D); caches: (B, S, Hkv, D); offset ()/(B,);
    write_mask: optional (B,) bool — False rows skip the write (their slab is
    copied back unchanged). Returns (out (B, 1, H, D), k_cache', v_cache') —
    the caches are the SAME buffers, updated in place via aliasing.
    """
    b, _, h, d = q.shape
    hkv = k_cache.shape[2]
    s = k_cache.shape[1]
    bs = _seq_block(s)
    ht, g = _gqa_blocks(h, hkv, bs, d, k_cache.dtype.itemsize)
    offs = jnp.broadcast_to(jnp.asarray(offset, jnp.int32).reshape(-1), (b,))
    wm = (jnp.ones((b,), jnp.int32) if write_mask is None
          else write_mask.astype(jnp.int32))

    def kv_map(bi, hi, si, off_ref, wm_ref):
        sb = jnp.minimum(si, off_ref[bi] // bs)
        return (bi, sb, hi, 0)

    def row_map(bi, hi, si, off_ref, wm_ref):
        return (bi, 0, hi, 0)

    def slab_map(bi, hi, si, off_ref, wm_ref):
        return (bi, off_ref[bi] // 8, hi, 0)

    htq = ht * g
    grid = (b, hkv // ht, s // bs)
    if write:
        kernel = functools.partial(_fused_attn_kernel, scale=scale,
                                   seq_block=bs, ht=ht, g=g)
        out_specs = [
            pl.BlockSpec((1, htq, d),
                         lambda bi, hi, si, off, wm: (bi, hi, 0)),
            pl.BlockSpec((1, 8, ht, d), slab_map),
            pl.BlockSpec((1, 8, ht, d), slab_map),
        ]
        out_shape = [jax.ShapeDtypeStruct((b, h, d), q.dtype),
                     jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                     jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype)]
        # operand indices count the scalar-prefetch args:
        # offs=0, wm=1, q=2, k_cache=3, v_cache=4, k_new=5, v_new=6
        aliases = {3: 1, 4: 2}
    else:
        def kernel(off_ref, wm_ref, q_ref, k_ref, v_ref, kn_ref, vn_ref,
                   o_ref, acc_ref, m_ref, l_ref):
            return _fused_attn_kernel(
                off_ref, wm_ref, q_ref, k_ref, v_ref, kn_ref, vn_ref,
                o_ref, None, None, acc_ref, m_ref, l_ref, scale=scale,
                seq_block=bs, ht=ht, g=g, write=False)

        out_specs = [pl.BlockSpec((1, htq, d),
                                  lambda bi, hi, si, off, wm: (bi, hi, 0))]
        out_shape = [jax.ShapeDtypeStruct((b, h, d), q.dtype)]
        aliases = {}
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, htq, d),
                             lambda bi, hi, si, off, wm: (bi, hi, 0)),
                pl.BlockSpec((1, bs, ht, d), kv_map),
                pl.BlockSpec((1, bs, ht, d), kv_map),
                pl.BlockSpec((1, 1, ht, d), row_map),
                pl.BlockSpec((1, 1, ht, d), row_map),
            ],
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((htq, d), jnp.float32),
                            pltpu.VMEM((1, htq), jnp.float32),
                            pltpu.VMEM((1, htq), jnp.float32)],
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(offs, wm, q.reshape(b, h, d), k_cache, v_cache,
      k_new.astype(k_cache.dtype).reshape(b, 1, hkv, d),
      v_new.astype(v_cache.dtype).reshape(b, 1, hkv, d))
    if not write:
        return res[0].reshape(b, 1, h, d), k_cache, v_cache
    out, ko, vo = res
    return out.reshape(b, 1, h, d), ko, vo


def supports_paged_decode(block_size: int, num_heads: int, num_kv_heads: int,
                          head_dim: int, itemsize: int = 2) -> bool:
    return (block_size % 8 == 0 and head_dim % 128 == 0
            and _gqa_blocks(num_heads, num_kv_heads, block_size,
                            head_dim, itemsize) is not None)


def _xla_decode_fallback(q, k, v, offs, scale):
    """Plain XLA masked decode attention — the in-kernel fallback when the
    VMEM block plan is infeasible for the real cache geometry (e.g. fp32
    caches at long seq with non-power-of-two blocks). Matches the sdpa
    fallback in models/common.py."""
    b, _, h, d = q.shape
    hkv = k.shape[2]
    kf, vf = k.astype(jnp.float32), v.astype(jnp.float32)
    if h != hkv:
        kf = jnp.repeat(kf, h // hkv, axis=2)
        vf = jnp.repeat(vf, h // hkv, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), kf) * scale
    kj = jnp.arange(k.shape[1])
    live = kj[None, None, None, :] <= offs[:, None, None, None]
    logits = jnp.where(live, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vf)
    return out.astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def pool_decode_attention(q, k_pool, v_pool, tables, offset,
                          scale: float, interpret: bool = False):
    """Decode attention DIRECTLY over the paged block pool.

    q: (B, 1, H, D); pools: (NB, BS, Hkv, D); tables: (B, MB) int32 physical
    block per logical block; offset: (B,) int32 current write position.
    Query attends logical slots <= its offset.

    The block index map routes each grid step through the slot's table row
    (scalar-prefetched) so the pool blocks are DMA'd in place — no gathered
    logical view is ever materialized (the XLA fallback pays pool-read +
    view-write + view-read, ~3x the live bytes). Steps beyond the live
    prefix clamp to the last live block and Pallas elides the repeat DMA, so
    traffic is proportional to live context like the dense decode kernel.
    """
    b, _, h, d = q.shape
    hkv = k_pool.shape[2]
    bs = k_pool.shape[1]
    mb = tables.shape[1]
    blocks = _gqa_blocks(h, hkv, bs, d, k_pool.dtype.itemsize)
    offs = jnp.broadcast_to(jnp.asarray(offset, jnp.int32).reshape(-1), (b,))
    tabs = jnp.asarray(tables, jnp.int32)
    if blocks is None:  # infeasible block plan: gather-then-dense XLA path
        kd = jnp.take(k_pool, tabs, axis=0).reshape(b, mb * bs, hkv, d)
        vd = jnp.take(v_pool, tabs, axis=0).reshape(b, mb * bs, hkv, d)
        return _xla_decode_fallback(q, kd, vd, offs, scale)
    ht, g = blocks

    def kv_map(bi, hi, si, tab_ref, off_ref):
        # clamp to the slot's last live logical block, then map through the
        # table: dead steps revisit the same physical block (DMA elided)
        sb = jnp.minimum(si, off_ref[bi] // bs)
        return (tab_ref[bi, sb], 0, hi, 0)

    htq = ht * g
    grid = (b, hkv // ht, mb)
    if g == 1:
        kernel = functools.partial(_attn_kernel, scale=scale, seq_block=bs)
    else:
        kernel = functools.partial(_attn_kernel_gqa, scale=scale,
                                   seq_block=bs, ht=ht, g=g)

    def wrapped(tab_ref, off_ref, *rest):
        return kernel(off_ref, *rest)

    out = pl.pallas_call(
        wrapped,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, htq, d),
                             lambda bi, hi, si, tab, off: (bi, hi, 0)),
                pl.BlockSpec((1, bs, ht, d), kv_map),
                pl.BlockSpec((1, bs, ht, d), kv_map),
            ],
            out_specs=pl.BlockSpec((1, htq, d),
                                   lambda bi, hi, si, tab, off: (bi, hi, 0)),
            scratch_shapes=[pltpu.VMEM((htq, d), jnp.float32),
                            pltpu.VMEM((1, htq), jnp.float32),
                            pltpu.VMEM((1, htq), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(tabs, offs, q.reshape(b, h, d), k_pool, v_pool)
    return out.reshape(b, 1, h, d)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def decode_attention(q, k_cache, v_cache, offset, scale: float,
                     interpret: bool = False):
    """q: (B, 1, H, D); caches: (B, S, H, D); offset: () or (B,) int32.

    Returns (B, 1, H, D). Query attends cache slots <= its own offset (the
    current token's k/v must already be written at slot `offset`).
    """
    b, _, h, d = q.shape
    hkv = k_cache.shape[2]
    s = k_cache.shape[1]
    bs = _seq_block(s)
    blocks = _gqa_blocks(h, hkv, bs, d, k_cache.dtype.itemsize)
    offs = jnp.broadcast_to(jnp.asarray(offset, jnp.int32).reshape(-1), (b,))
    if blocks is None:  # infeasible block plan for this cache geometry
        return _xla_decode_fallback(q, k_cache, v_cache, offs, scale)
    ht, g = blocks

    def kv_map(bi, hi, si, off_ref):
        # clamp to the last live block: steps past the prefix revisit it and
        # Pallas elides the DMA for an already-resident block
        sb = jnp.minimum(si, off_ref[bi] // bs)
        return (bi, sb, hi, 0)

    htq = ht * g
    grid = (b, hkv // ht, s // bs)
    if g == 1:
        kernel = functools.partial(_attn_kernel, scale=scale, seq_block=bs)
        scratch = [pltpu.VMEM((ht, d), jnp.float32),
                   pltpu.VMEM((1, ht), jnp.float32),
                   pltpu.VMEM((1, ht), jnp.float32)]
    else:
        kernel = functools.partial(_attn_kernel_gqa, scale=scale,
                                   seq_block=bs, ht=ht, g=g)
        scratch = [pltpu.VMEM((htq, d), jnp.float32),
                   pltpu.VMEM((1, htq), jnp.float32),
                   pltpu.VMEM((1, htq), jnp.float32)]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, htq, d), lambda bi, hi, si, off: (bi, hi, 0)),
                pl.BlockSpec((1, bs, ht, d), kv_map),
                pl.BlockSpec((1, bs, ht, d), kv_map),
            ],
            out_specs=pl.BlockSpec((1, htq, d),
                                   lambda bi, hi, si, off: (bi, hi, 0)),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(offs, q.reshape(b, h, d), k_cache, v_cache)
    return out.reshape(b, 1, h, d)
