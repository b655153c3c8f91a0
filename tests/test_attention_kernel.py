"""Fused decode-attention kernel vs the XLA softmax oracle (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gptq_for_llama_tpu.models.common import decode_mask, sdpa
from gptq_for_llama_tpu.ops.pallas.attention import (decode_attention,
                                                     supports_decode_attention)


@pytest.mark.parametrize("b,offset", [(1, 5), (4, None)])
def test_decode_attention_matches_sdpa(b, offset):
    s, h, d = 32, 8, 128
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    if offset is None:  # per-row offsets (continuous batching)
        off = jnp.asarray(rng.randint(0, s - 1, size=(b,)), jnp.int32)
    else:
        off = jnp.int32(offset)

    got = np.asarray(decode_attention(q, k, v, off, 1.0 / d ** 0.5,
                                      interpret=True))
    mask = decode_mask(1, s, off)
    want = np.asarray(sdpa(q, k, v, mask))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_supports_gates():
    assert supports_decode_attention(1, 32, 32, 128)
    assert not supports_decode_attention(2, 32, 32, 128)   # prefill
    assert supports_decode_attention(1, 32, 8, 128)        # GQA kernel
    assert not supports_decode_attention(1, 32, 32, 64)    # head_dim < 128
    assert supports_decode_attention(1, 40, 40, 128)       # 13B odd heads
    # real cache geometry must reach the gate (round-4 advisor): a ragged
    # seq (bs = s = 1000) at bf16, or s = 500 at fp32, exhausts the VMEM
    # block budget — the gate must say no instead of letting the kernel
    # derive an infeasible plan and crash at trace time
    assert not supports_decode_attention(1, 32, 32, 128, 1000, 2)
    assert not supports_decode_attention(1, 32, 32, 128, 500, 4)
    assert supports_decode_attention(1, 32, 32, 128, 1024, 2)


def test_decode_attention_infeasible_plan_falls_back():
    """decode_attention/pool_decode_attention must return the XLA-equivalent
    result (not raise) when the real geometry has no feasible block plan
    (round-4 advisor: h=hkv=32, s=1000 bf16 previously raised TypeError)."""
    b, s, h, d = 1, 1000, 32, 128
    rng = np.random.RandomState(11)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    off = jnp.int32(17)
    got = np.asarray(decode_attention(q, k, v, off, 1.0 / d ** 0.5)
                     .astype(jnp.float32))
    want = np.asarray(sdpa(q, k, v, decode_mask(1, s, off))
                      .astype(jnp.float32))
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)

    from gptq_for_llama_tpu.ops.pallas.attention import (_gqa_blocks,
                                                         pool_decode_attention)
    # fp32 pool at block 500: no plan -> gather-then-dense fallback
    assert _gqa_blocks(32, 32, 500, 128, 4) is None
    kp = jnp.asarray(rng.standard_normal((2, 500, h, d)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((2, 500, h, d)), jnp.float32)
    tables = jnp.asarray([[0, 1]], jnp.int32)
    qf = q.astype(jnp.float32)
    got = np.asarray(pool_decode_attention(qf, kp, vp, tables,
                                           jnp.asarray([17], jnp.int32),
                                           1.0 / d ** 0.5))
    kd = np.asarray(kp).reshape(1, 1000, h, d)
    vd = np.asarray(vp).reshape(1, 1000, h, d)
    want = np.asarray(sdpa(qf, jnp.asarray(kd), jnp.asarray(vd),
                           decode_mask(1, 1000, jnp.int32(17))))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_decode_attention_odd_heads_multi_block():
    """13B head layout (h=hkv=40): one ht=40 head block per grid step, seq
    blocked at 128 (s=256 -> 2 blocks) so the live-prefix clamp and the
    online-softmax block accumulation are both exercised."""
    from gptq_for_llama_tpu.ops.pallas.attention import _gqa_blocks
    assert _gqa_blocks(40, 40, 128, 128) == (40, 1)
    b, s, h, d = 2, 256, 40, 128
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    for off in (jnp.int32(16), jnp.asarray([30, 200], jnp.int32)):
        got = np.asarray(decode_attention(q, k, v, off, 1.0 / d ** 0.5,
                                          interpret=True))
        want = np.asarray(sdpa(q, k, v, decode_mask(1, s, off)))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("h,hkv", [(32, 8), (8, 1), (16, 2), (64, 8)])
def test_decode_attention_gqa(h, hkv):
    """GQA decode kernel: the cache is read once per kv head for all G query
    heads (the XLA fallback repeats it G times)."""
    from gptq_for_llama_tpu.ops.pallas.attention import (
        decode_attention, supports_decode_attention)
    B, S, D = 2, 64, 128
    assert supports_decode_attention(1, h, hkv, D)
    rng = np.random.default_rng(h * 10 + hkv)
    q = jnp.asarray(rng.standard_normal((B, 1, h, D)) * 0.2, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, hkv, D)) * 0.2, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, hkv, D)) * 0.2, jnp.float32)
    for off in (0, 5, 40, 63):
        got = np.asarray(decode_attention(q, k, v, jnp.int32(off),
                                          float(1 / np.sqrt(D)),
                                          interpret=True))
        g = h // hkv
        kk = np.repeat(np.asarray(k), g, axis=2)
        vv = np.repeat(np.asarray(v), g, axis=2)
        lo = np.einsum("bqhd,bshd->bhqs", np.asarray(q), kk) / np.sqrt(D)
        lo[:, :, :, off + 1:] = -np.inf
        p = np.exp(lo - lo.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = np.einsum("bhqs,bshd->bqhd", p, vv)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3,
                                   err_msg=f"h={h} hkv={hkv} off={off}")


def test_decode_attention_fp8_cache_interpret():
    """fp8-stored caches through the Pallas decode kernel (interpret mode):
    parity vs the upcast XLA fallback on identical fp8 values. On-chip
    Mosaic compile+parity is captured by scripts/attn_onchip.py
    (bench_artifacts/r04)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gptq_for_llama_tpu.ops.pallas.attention import decode_attention
    from gptq_for_llama_tpu.models.common import sdpa, decode_mask

    rng = np.random.default_rng(3)
    b, s, h, d = 2, 256, 8, 128
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)) * 0.5,
                    jnp.float8_e4m3fn)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)) * 0.5,
                    jnp.float8_e4m3fn)
    off = jnp.asarray([100, 200], jnp.int32)
    got = np.asarray(decode_attention(q, k, v, off, 0.0884, interpret=True))
    want = np.asarray(sdpa(q, k, v, decode_mask(1, s, off), 0.0884))
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), atol=2e-2)


def test_pool_decode_attention_fp8_interpret():
    import jax.numpy as jnp
    import numpy as np
    from gptq_for_llama_tpu.ops.pallas.attention import pool_decode_attention
    from gptq_for_llama_tpu.models.common import sdpa, decode_mask

    rng = np.random.default_rng(4)
    b, mb, bs, h, d = 2, 4, 16, 8, 128
    nb = b * mb
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
    kp = jnp.asarray(rng.standard_normal((nb, bs, h, d)) * 0.5,
                     jnp.float8_e4m3fn)
    vp = jnp.asarray(rng.standard_normal((nb, bs, h, d)) * 0.5,
                     jnp.float8_e4m3fn)
    tables = jnp.asarray(rng.permutation(nb).reshape(b, mb), jnp.int32)
    off = jnp.asarray([30, 60], jnp.int32)
    got = np.asarray(pool_decode_attention(q, kp, vp, tables, off, 0.0884,
                                           interpret=True))
    kd = np.asarray(kp)[np.asarray(tables)].reshape(b, mb * bs, h, d)
    vd = np.asarray(vp)[np.asarray(tables)].reshape(b, mb * bs, h, d)
    want = np.asarray(sdpa(q, jnp.asarray(kd), jnp.asarray(vd),
                           decode_mask(1, mb * bs, off), 0.0884))
    np.testing.assert_allclose(got.reshape(want.shape).astype(np.float32),
                               want.astype(np.float32), atol=2e-2)
