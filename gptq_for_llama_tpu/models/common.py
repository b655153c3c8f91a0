"""Shared model building blocks: norms, RoPE, attention — pure jnp functions.

fp32 is used for normalization statistics and softmax (the TPU-safe spots);
everything else runs in the model compute dtype (bfloat16 by default — the MXU
native type; the reference uses fp16 on GPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x, weight, eps: float):
    """RMSNorm, fp32 statistics (reference kernel: quant/triton_norm.py:7-39)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(x, weight, bias, eps: float):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rope_cos_sin(positions, dim: int, theta: float, dtype=jnp.float32):
    """cos/sin tables for rotary embedding.

    positions: (..., seq) int32. Returns cos, sin with shape (..., seq, dim)
    where the dim axis holds the duplicated-half layout (HF convention:
    freqs concatenated twice, matching rotate_half; the reference fuses the
    same math on the fly in quant/fused_attn.py:8-58 with BASE=10000).
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # (..., seq, dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q, k, cos, sin, rotary_dim: int | None = None):
    """Apply rotary embedding to q, k of shape (..., seq, heads, head_dim).

    cos/sin: (..., seq, rotary_dim). rotary_dim < head_dim applies partial rotary
    (GPT-NeoX rotary_pct, reference: neox models via HF)."""
    cos = cos[..., :, None, :]
    sin = sin[..., :, None, :]
    if rotary_dim is None or rotary_dim == q.shape[-1]:
        q2 = q * cos + rotate_half(q) * sin
        k2 = k * cos + rotate_half(k) * sin
        return q2.astype(q.dtype), k2.astype(k.dtype)
    q_rot, q_pass = q[..., :rotary_dim], q[..., rotary_dim:]
    k_rot, k_pass = k[..., :rotary_dim], k[..., rotary_dim:]
    q_rot = q_rot * cos + rotate_half(q_rot) * sin
    k_rot = k_rot * cos + rotate_half(k_rot) * sin
    q2 = jnp.concatenate([q_rot, q_pass], axis=-1)
    k2 = jnp.concatenate([k_rot, k_pass], axis=-1)
    return q2.astype(q.dtype), k2.astype(k.dtype)


def update_kv_cache(cache_k, cache_v, k_new, v_new, offset, write_mask=None):
    """Write k/v at [offset, offset+s) of a static-size cache.

    cache_k/v: (B, max_len, Hkv, D); k_new/v_new: (B, s, Hkv, D); offset:
    traced int32 scalar (all rows aligned) or (B,) vector (continuous batching:
    every slot at its own position). The TPU-native replacement for the
    reference's growing concat KV cache (reference: quant/fused_attn.py:140-143)
    — static shapes keep decode under one compiled step.

    write_mask: optional (B,) bool with vector offsets — rows with False keep
    their EXISTING cache contents (a batched decode step must not clobber a
    slot that is mid-prefill in the same engine iteration: its offset points
    into rows another program already filled).
    """
    k_new = k_new.astype(cache_k.dtype)
    v_new = v_new.astype(cache_v.dtype)
    if jnp.ndim(offset) == 0:
        cache_k = jax.lax.dynamic_update_slice(cache_k, k_new, (0, offset, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(cache_v, v_new, (0, offset, 0, 0))
        return cache_k, cache_v
    if write_mask is not None:
        old = jax.vmap(lambda c, o: jax.lax.dynamic_slice(
            c, (o, 0, 0), k_new.shape[1:]))
        m = write_mask[:, None, None, None]
        k_new = jnp.where(m, k_new, old(cache_k, offset))
        v_new = jnp.where(m, v_new, old(cache_v, offset))
    upd = jax.vmap(lambda c, n, o: jax.lax.dynamic_update_slice(
        c, n, (o, 0, 0)))
    return upd(cache_k, k_new, offset), upd(cache_v, v_new, offset)


def decode_mask(q_len: int, max_len: int, offset, dtype=jnp.float32):
    """Additive mask for cached attention: query i (at abs pos offset+i) sees
    cache slots j <= offset + i.

    offset scalar -> (q_len, max_len); offset (B,) -> (B, 1, q_len, max_len)
    (per-slot positions for continuous batching)."""
    qi = jnp.arange(q_len)[:, None]
    kj = jnp.arange(max_len)[None, :]
    if jnp.ndim(offset) == 0:
        allowed = kj <= qi + offset
    else:
        allowed = (kj[None] <= qi[None] + offset[:, None, None])[:, None]
    return jnp.where(allowed, 0.0, jnp.finfo(dtype).min).astype(dtype)


def apply_kv_cache(past_kv, k, v):
    """Uniform cache protocol used by every arch layer.

    past_kv forms:
      None                          -> no cache (plain causal forward)
      (ck, cv, offset)              -> dense static cache (runner/serving)
      (ck, cv, offset, write_mask)  -> dense with per-slot write masking
                                       (batched decode alongside mid-prefill
                                       slots; see update_kv_cache)
      ("paged", kp, vp, tables, offset[, write_mask]) -> paged block-pool
                                       cache (one layer's pool slice
                                       (NB, BS, Hkv, D); runtime/paged.py)
    Returns (k_eff, v_eff, present, offset_or_None): k_eff/v_eff are what
    attention reads; present is what the layer must return as its cache.
    """
    if past_kv is None:
        return k, v, (k, v), None
    if past_kv[0] == "fresh":
        # batched admission prefill: every masked slot's prompt starts at
        # cache position 0 (runtime/serve.py _admit batching). The cache is
        # WRITTEN under the mask, but attention reads only the fresh chunk —
        # nothing earlier exists for these rows — so the scalar offset-0
        # declaration dispatches the chunked/blocked prefill paths in sdpa.
        _, ck, cv, wmask = past_kv
        zero = jnp.zeros((k.shape[0],), jnp.int32)
        ck, cv = update_kv_cache(ck, cv, k, v, zero, write_mask=wmask)
        return k, v, (ck, cv), jnp.int32(0)
    if past_kv[0] == "fresh_paged":
        # paged twin: masked rows write their prompt's whole blocks through
        # their table row; unmasked rows are redirected to the reserved
        # scratch block (paged_update_layer write_mask, s > 1 branch).
        _, kp, vp, tables, wmask = past_kv
        from ..runtime.paged import paged_update_layer
        kp, vp, _, _ = paged_update_layer(kp, vp, k, v, tables,
                                          jnp.zeros((k.shape[0],), jnp.int32),
                                          write_mask=wmask, gather=False)
        return k, v, (kp, vp), jnp.int32(0)
    if past_kv[0] == "grouped":
        # token-fused serving step: rows 0..B-1 are one decode token per slot,
        # rows B.. are a prompt chunk for slot `slot` starting at off0. ONE
        # weight pass serves both groups; the cache write and attention split
        # here (runtime/serve.py fused_chunk_decode, weights-once form).
        _, ck, cv, offsets, live, slot, off0, b_dec = past_kv
        k_dec, v_dec = k[0, :b_dec][:, None], v[0, :b_dec][:, None]
        k_chunk, v_chunk = k[0, b_dec:][None], v[0, b_dec:][None]
        ck = jax.lax.dynamic_update_slice(ck, k_chunk.astype(ck.dtype),
                                          (slot, off0, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v_chunk.astype(cv.dtype),
                                          (slot, off0, 0, 0))
        ck, cv = update_kv_cache(ck, cv, k_dec, v_dec, offsets,
                                 write_mask=live)
        return ck, cv, (ck, cv), ("grouped", offsets, slot, off0, b_dec)
    if past_kv[0] == "grouped_paged":
        # the paged twin of "grouped": decode rows write/read through the
        # block pool; the chunk rows write whole blocks of slot `slot`'s
        # table at off0 (prefill_chunk % block_size enforced by the engine).
        # Attention reads the POOL markers: the decode group dispatches the
        # pool-native kernel, the chunk group gathers only ITS slot's row
        # (the old path gathered the full (B, MB*BS) logical views).
        _, kp, vp, tables, offsets, live, slot, off0, b_dec = past_kv
        from ..runtime.paged import paged_update_layer
        k_dec, v_dec = k[0, :b_dec][:, None], v[0, :b_dec][:, None]
        k_chunk, v_chunk = k[0, b_dec:][None], v[0, b_dec:][None]
        trow = jax.lax.dynamic_slice_in_dim(tables, slot, 1, axis=0)
        kp, vp, _, _ = paged_update_layer(kp, vp, k_chunk, v_chunk, trow,
                                          off0, gather=False)
        kp, vp, _, _ = paged_update_layer(kp, vp, k_dec, v_dec,
                                          tables, offsets,
                                          write_mask=live, gather=False)
        return (("pool", kp, tables), ("pool", vp, tables), (kp, vp),
                ("grouped", offsets, slot, off0, b_dec))
    if past_kv[0] == "paged":
        _, kp, vp, tables, offset = past_kv[:5]
        write_mask = past_kv[5] if len(past_kv) > 5 else None
        from ..runtime.paged import paged_update_layer
        if k.shape[1] == 1:
            # pure decode step: hand sdpa the POOL itself — the pool-native
            # kernel DMAs blocks through the table; no gathered logical view
            # is materialized (sdpa's fallback gathers on demand)
            kp, vp, _, _ = paged_update_layer(kp, vp, k, v, tables, offset,
                                              write_mask=write_mask,
                                              gather=False)
            return (("pool", kp, tables), ("pool", vp, tables),
                    (kp, vp), offset)
        kp, vp, k_eff, v_eff = paged_update_layer(kp, vp, k, v, tables, offset,
                                                  write_mask=write_mask)
        return k_eff, v_eff, (kp, vp), offset
    cache_k, cache_v, offset = past_kv[:3]
    write_mask = past_kv[3] if len(past_kv) > 3 else None
    k, v = update_kv_cache(cache_k, cache_v, k, v, offset,
                           write_mask=write_mask)
    return k, v, (k, v), offset


_warned_attn_skip = False


def attention_block(past_kv, q, k, v, mask, scale=None):
    """Cache update + attention for one arch layer: returns (attn_out, present).

    The uniform entry point the four arch layers call in place of the
    apply_kv_cache + sdpa pair. The default is the classic write-then-attend
    pair; GPTQ_TPU_CACHE_IMPL='pallas' dispatches the dense-cache decode
    step to the FOLD kernel instead (ops/pallas/attention.
    fused_decode_attention(write=False)): attention reads the STALE prefix
    (slots < offset) plus the current token's k/v folded in from registers,
    and the row write stays a plain dynamic-update-slice feeding only the
    scan carry.

    Why fold is NOT the default (round-5 on-chip evidence, all at the fixed
    down_proj tiling, bench_artifacts/r05/decode_variants_13b_path.json):
    classic 12.62 ms/token vs fold 13.31 vs all-XLA 13.00 on 13B — the fold
    form makes the cache a two-consumer buffer (kernel read + DUS write) and
    XLA inserts extra full-cache copies inside the scan (400 vs 80 per
    8-token iteration, scripts/fused_attn_hlo.py). An in-kernel ALIASED
    write is worse still: XLA copies the whole cache for every aliased
    pallas operand inside a loop (one bf16[1,256,40,128] copy per call,
    fused_slope.json). The round-4 "cache write costs 2.6 ms" attribution
    (decomp2_13b.json nocache delta) turned out to be a program-restructuring
    artifact — the device trace puts all DUS fusions at 24.5 us/token
    (trace_13b_default.json); the real cost hid in the down_proj GEMM tiling.

    GPTQ_TPU_CACHE_IMPL: 'pallas' forces the fold kernel (interpret mode
    off-TPU), anything else keeps the classic path.
    """
    import os
    fused_ok = (past_kv is not None and not isinstance(past_kv[0], str)
                and q.shape[1] == 1 and k.shape[1] == 1
                and os.environ.get("GPTQ_TPU_ATTN_SKIP") != "1")
    if fused_ok:
        ck, cv = past_kv[0], past_kv[1]
        use = os.environ.get("GPTQ_TPU_CACHE_IMPL", "") == "pallas"
        interp = jax.default_backend() != "tpu"
        if use:
            from ..ops.pallas.attention import (fused_decode_attention,
                                                supports_fused_decode)
            b, _, h, d = q.shape
            if supports_fused_decode(1, h, ck.shape[2], d, ck.shape[1],
                                     ck.dtype.itemsize):
                offset = past_kv[2]
                wm = past_kv[3] if len(past_kv) > 3 else None
                sc = scale if scale is not None else 1.0 / (d ** 0.5)
                out, _, _ = fused_decode_attention(
                    q, ck, cv, k, v, offset, sc, write_mask=wm,
                    interpret=interp, write=False)
                ck2, cv2 = update_kv_cache(ck, cv, k, v, offset,
                                           write_mask=wm)
                return out, (ck2, cv2)
    k_eff, v_eff, present, off = apply_kv_cache(past_kv, k, v)
    out = sdpa(q, k_eff, v_eff, mask, scale, decode_offset=off,
               causal=past_kv is None)
    return out, present


def causal_mask(q_len: int, kv_len: int, dtype=jnp.float32):
    """Additive causal mask (q_len, kv_len); query i attends kv <= i + kv_len - q_len."""
    qi = jnp.arange(q_len)[:, None]
    kj = jnp.arange(kv_len)[None, :]
    allowed = kj <= qi + (kv_len - q_len)
    return jnp.where(allowed, 0.0, jnp.finfo(dtype).min).astype(dtype)


def _attn_impl(cache_dtype, fp8_favored: bool = True):
    """(use_pallas, interpret) for the attention-kernel dispatch.

    GPTQ_TPU_ATTN_IMPL: 'pallas' forces kernels (interpret off-TPU),
    'xla' forces the fallback, '' auto (kernels on TPU).

    fp8-stored caches use the kernels where MEASURED to win on v5e with the
    round-5 integer-bit-math upcast (ops/pallas/attention._load_f32,
    bench_artifacts/r05/attn_validate.json): GQA 449 us vs 731 XLA, paged
    667 vs 778 — callers pass fp8_favored=False only for the one shape
    class where XLA still wins (dense MHA decode: 513 vs 259 us — XLA's
    fused convert beats the kernel when every q head re-reads its own kv
    head anyway). GPTQ_TPU_ATTN_FP8=1 forces the kernels everywhere;
    round 4's blanket fp8 gate-off (native Mosaic convert was 3-27x slower)
    is obsolete."""
    import os
    forced = os.environ.get("GPTQ_TPU_ATTN_IMPL", "")
    use = forced == "pallas" or (forced != "xla"
                                 and jax.default_backend() == "tpu")
    if (use and jnp.dtype(cache_dtype).itemsize == 1 and not fp8_favored
            and os.environ.get("GPTQ_TPU_ATTN_FP8", "") != "1"):
        use = False
    return use, forced == "pallas" and jax.default_backend() != "tpu"


def sdpa(q, k, v, mask=None, scale: float | None = None, decode_offset=None,
         causal: bool = False):
    """Scaled dot-product attention with fp32 softmax.

    q: (B, Sq, H, D); k, v: (B, Skv, Hkv, D) with H a multiple of Hkv (GQA).
    mask: additive (Sq, Skv) or (B, 1, Sq, Skv). Returns (B, Sq, H, D).

    decode_offset: when given as a scalar, k/v are a static cache whose
    valid slots are < offset + Sq; passing it DECLARES that `mask` encodes
    exactly the causal-at-offset predicate (decode_mask(Sq, Skv, offset)) —
    TPU dispatches to the fused decode kernel (Sq == 1) or the blocked
    flash prefill kernel (Sq > 1), both of which apply that predicate and
    ignore `mask`. Callers with any other mask (padding, ragged batches)
    must leave decode_offset unset.
    causal: asserts mask is plain causal self-attention — dispatches long
    prefills to the VMEM-resident flash kernel on TPU.
    """
    b, sq, h, d = q.shape
    if sq == 1 and decode_offset is not None \
            and not isinstance(decode_offset, tuple) \
            and not isinstance(k, tuple):
        import os
        if os.environ.get("GPTQ_TPU_ATTN_SKIP") == "1":
            # decomposition probes ONLY (scripts/attn13b_probe.py): removes
            # the decode-attention op so its in-model cost can be isolated;
            # output is q (right shape, WRONG VALUES). Kept in its own env
            # var (not GPTQ_TPU_ATTN_IMPL's pallas/xla namespace) so a typo
            # there can never silently corrupt generation; warn loudly once.
            global _warned_attn_skip
            if not _warned_attn_skip:
                _warned_attn_skip = True
                import warnings
                warnings.warn("GPTQ_TPU_ATTN_SKIP=1: decode attention is "
                              "REMOVED — outputs are numerically wrong "
                              "(decomposition probes only)")
            return q
    if isinstance(decode_offset, tuple) and decode_offset[0] == "grouped":
        # token-fused serving step (see apply_kv_cache "grouped"): split the
        # flat token rows into the per-slot decode group and the one-slot
        # chunk group; each attends its own cache view. k/v are the updated
        # caches — dense (B, S, Hkv, D) arrays or paged pool markers.
        _, offsets, slot, off0, b_dec = decode_offset
        q_dec = q[0, :b_dec][:, None]                      # (B, 1, H, D)
        if isinstance(k, tuple) and k[0] == "pool":
            # decode group recurses into the pool branch below (sq == 1);
            # the chunk group gathers only ITS slot's logical view
            _, kp, tables = k
            _, vp, _ = v
            out_dec = sdpa(q_dec, k, v, None, scale, decode_offset=offsets)
            trow = jax.lax.dynamic_slice_in_dim(tables, slot, 1, axis=0)[0]
            mb, bs = tables.shape[1], kp.shape[1]
            kc = jnp.take(kp, trow, axis=0).reshape(
                1, mb * bs, kp.shape[2], d).astype(q.dtype)
            vc = jnp.take(vp, trow, axis=0).reshape(
                1, mb * bs, vp.shape[2], d).astype(q.dtype)
            skv = mb * bs
        else:
            m_dec = decode_mask(1, k.shape[1], offsets)  # XLA-fallback mask
            out_dec = sdpa(q_dec, k, v, m_dec, scale, decode_offset=offsets)
            kc = jax.lax.dynamic_slice_in_dim(k, slot, 1, axis=0)
            vc = jax.lax.dynamic_slice_in_dim(v, slot, 1, axis=0)
            skv = k.shape[1]
        q_chunk = q[0, b_dec:][None]                       # (1, C, H, D)
        m = decode_mask(q_chunk.shape[1], skv, off0)
        # scalar offset + sq>1 dispatches the blocked flash kernel on TPU
        out_chunk = sdpa(q_chunk, kc, vc, m, scale, decode_offset=off0)
        return jnp.concatenate([out_dec[:, 0][None], out_chunk], axis=1)
    if isinstance(k, tuple) and k[0] == "pool":
        # paged decode: k/v are ("pool", pool (NB, BS, Hkv, D), tables) —
        # pool-native kernel on TPU, gather-then-dense fallback elsewhere
        _, kp, tables = k
        _, vp, _ = v
        use, interp = _attn_impl(kp.dtype)
        from ..ops.pallas.attention import (pool_decode_attention,
                                            supports_paged_decode)
        sc = scale if scale is not None else 1.0 / (d ** 0.5)
        if (use and sq == 1
                and supports_paged_decode(kp.shape[1], h, kp.shape[2], d,
                                          kp.dtype.itemsize)):
            return pool_decode_attention(
                q, kp, vp, tables, decode_offset, sc, interpret=interp)
        mb, bs = tables.shape[1], kp.shape[1]
        kd = jnp.take(kp, tables, axis=0).reshape(b, mb * bs, kp.shape[2], d)
        vd = jnp.take(vp, tables, axis=0).reshape(b, mb * bs, vp.shape[2], d)
        return sdpa(q, kd.astype(q.dtype), vd.astype(q.dtype),
                    decode_mask(sq, mb * bs, decode_offset),
                    scale, decode_offset=decode_offset)
    if causal and decode_offset is None and sq > 256:
        use, interp = _attn_impl(k.dtype)
        from ..ops.pallas.flash import (flash_prefill, flash_prefill_blocked,
                                        supports_prefill,
                                        supports_prefill_blocked)
        sc = scale if scale is not None else 1.0 / (d ** 0.5)
        if use and supports_prefill(sq, k.shape[1], h, k.shape[2], d):
            return flash_prefill(q, k, v, sc, interpret=interp)
        if use and supports_prefill_blocked(sq, k.shape[1], h, k.shape[2], d):
            # beyond the VMEM-resident cap (S > ~8k): KV-blocked online softmax
            return flash_prefill_blocked(q, k, v, jnp.int32(0), sc,
                                         interpret=interp)
    if (decode_offset is not None and not isinstance(decode_offset, tuple)
            and jnp.ndim(decode_offset) == 0 and sq > 1):
        # cached prefill: sq chunk tokens attending a cache of skv slots at
        # offset (chunked serving prefill / offloaded generation ramp). The
        # additive mask encodes the same predicate the kernel applies.
        use, interp = _attn_impl(k.dtype)
        from ..ops.pallas.flash import (flash_prefill_blocked,
                                        supports_prefill_blocked)
        if use and supports_prefill_blocked(sq, k.shape[1], h, k.shape[2], d):
            sc = scale if scale is not None else 1.0 / (d ** 0.5)
            return flash_prefill_blocked(q, k, v, decode_offset, sc,
                                         interpret=interp)
    # long prefill: chunk the query axis so the (B, H, Sq, Skv) fp32 logits
    # transient stays bounded (~64 MB at chunk 256, S=2048) instead of O(S^2).
    # Also reached with a SCALAR decode_offset when the blocked flash kernel
    # declined the shape (e.g. head_dim % 128 != 0): each query chunk carries
    # offset + qs so large cached-prefill chunks stay bounded too.
    _Q_CHUNK = 256
    scalar_off = (decode_offset is not None
                  and not isinstance(decode_offset, tuple)
                  and jnp.ndim(decode_offset) == 0)
    if sq > _Q_CHUNK and sq % _Q_CHUNK == 0 and (
            decode_offset is None or scalar_off):
        outs = []
        for qs in range(0, sq, _Q_CHUNK):
            m = mask
            if m is not None:
                m = m[..., qs:qs + _Q_CHUNK, :] if m.ndim == 4 \
                    else m[qs:qs + _Q_CHUNK]
            outs.append(sdpa(q[:, qs:qs + _Q_CHUNK], k, v, m, scale,
                             decode_offset=None if decode_offset is None
                             else decode_offset + qs))
        return jnp.concatenate(outs, axis=1)
    if decode_offset is not None and sq == 1:
        # dense MHA (h == hkv) is the one fp8 shape class where XLA still
        # wins (see _attn_impl); GQA and paged favor the kernels
        use, interp = _attn_impl(k.dtype, fp8_favored=h != k.shape[2])
        from ..ops.pallas.attention import (decode_attention,
                                            supports_decode_attention)
        if use and supports_decode_attention(sq, h, k.shape[2], d,
                                             k.shape[1], k.dtype.itemsize):
            sc = scale if scale is not None else 1.0 / (d ** 0.5)
            return decode_attention(q, k, v, decode_offset, sc,
                                    interpret=interp)
    hkv = k.shape[2]
    scale = scale if scale is not None else 1.0 / (d ** 0.5)
    if k.dtype != q.dtype:  # fp8-stored cache: upcast for the XLA einsums
        k = k.astype(q.dtype)
        v = v.astype(q.dtype)
    if h != hkv:
        k = jnp.repeat(k, h // hkv, axis=2)
        v = jnp.repeat(v, h // hkv, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    if mask is not None:
        if mask.ndim == 2:
            mask = mask[None, None]
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out


def row_parallel_apply(lin, x, tp_ctx):
    """Apply a row-parallel (input-sharded) linear under shard_map TP.

    tp_ctx: None (no TP — plain apply) or (axis_name, tp). Inside shard_map the
    activation x arrives sharded on its last dim (attention heads / ffn width)
    and `lin` holds the local shard of a weight sharded on in-features; the
    partial products are psum'ed over the tp axis and the (replicated) bias is
    added once afterwards (reference equivalent: the o_proj/down_proj side of
    Megatron TP replacing llama.py:328-382's layer placement).

    Act-order / K-padded packed weights carry a device-row index map in `perm`
    (parallel/tp_model.prepare_tp_params): the activation is all-gathered and
    each shard takes its own device rows.
    """
    import dataclasses
    from ..ops.linear import PackedLinear, linear_apply

    if tp_ctx is None:
        return linear_apply(lin, x)
    axis, _tp = tp_ctx
    if isinstance(lin, PackedLinear):
        local = lin
        if lin.perm is not None:
            xg = jax.lax.all_gather(x, axis, axis=x.ndim - 1, tiled=True)
            x = jnp.take(xg, lin.perm, axis=-1)
            local = dataclasses.replace(lin, perm=None, perm_sig=None)
        bias = lin.bias
        if bias is not None:
            local = dataclasses.replace(local, bias=None)
        y = jax.lax.psum(linear_apply(local, x), axis)
        return y if bias is None else y + bias
    bias = lin.get("bias")
    y = jnp.matmul(x, lin["kernel"].astype(x.dtype))
    y = jax.lax.psum(y, axis)
    return y if bias is None else y + bias.astype(y.dtype)


def activation(name: str):
    # HF ACT2FN "gelu" is EXACT erf-GELU; jax.nn.gelu defaults to the tanh
    # approximation (up to ~4e-4 apart) — NeoX/Pythia ship hidden_act="gelu"
    return {"silu": jax.nn.silu, "relu": jax.nn.relu,
            "gelu": lambda x: jax.nn.gelu(x, approximate=False),
            "gelu_new": jax.nn.gelu, "gelu_fast": jax.nn.gelu}[name]
