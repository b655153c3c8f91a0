"""Interpret-mode parity: fused decode attention + in-place cache row write.

Repo invariant: every Pallas kernel keeps a jnp/XLA fallback and an
interpret-mode equivalence test against it (CLAUDE.md). The fallback here is
the classic write-then-attend pair: models/common.update_kv_cache (XLA DUS)
followed by masked-softmax attention — the fused kernel must produce the same
attention output AND leave the caches byte-identical (including untouched
blocks, which proves the input_output_aliases wiring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptq_for_llama_tpu.models import common
from gptq_for_llama_tpu.models.common import attention_block, update_kv_cache
from gptq_for_llama_tpu.ops.pallas.attention import (fused_decode_attention,
                                                     supports_fused_decode)


def _reference(q, ck, cv, kn, vn, offs, scale, mask=None):
    ck2, cv2 = update_kv_cache(ck, cv, kn, vn, offs, write_mask=mask)
    b, _, h, d = q.shape
    hkv = ck.shape[2]
    kf, vf = ck2.astype(jnp.float32), cv2.astype(jnp.float32)
    if h != hkv:
        kf = jnp.repeat(kf, h // hkv, axis=2)
        vf = jnp.repeat(vf, h // hkv, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), kf) * scale
    kj = jnp.arange(ck.shape[1])
    offs_b = jnp.broadcast_to(jnp.asarray(offs).reshape(-1), (b,))
    live = kj[None, None, None, :] <= offs_b[:, None, None, None]
    logits = jnp.where(live, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vf)
    return out.astype(q.dtype), ck2, cv2


@pytest.mark.parametrize("b,s,h,hkv,d", [
    (1, 256, 8, 8, 128),    # MHA
    (2, 256, 40, 40, 128),  # 13B head count
    (2, 128, 32, 8, 128),   # GQA
])
def test_fused_decode_parity(b, s, h, hkv, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    ck = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
    cv = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(b, 1, hkv, d)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(b, 1, hkv, d)), jnp.float32)
    offs = jnp.asarray(rng.integers(0, s, size=(b,)), jnp.int32)
    scale = d ** -0.5
    assert supports_fused_decode(1, h, hkv, d, s, 4)
    out, ck2, cv2 = fused_decode_attention(q, ck, cv, kn, vn, offs, scale,
                                           interpret=True)
    want, wck, wcv = _reference(q, ck, cv, kn, vn, offs, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(ck2), np.asarray(wck))
    np.testing.assert_array_equal(np.asarray(cv2), np.asarray(wcv))


def test_fused_decode_offset_zero_and_full():
    """Empty prefix (first token) and last-slot writes."""
    rng = np.random.default_rng(1)
    b, s, h, d = 2, 64, 8, 128
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    ck = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    cv = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    offs = jnp.asarray([0, s - 1], jnp.int32)
    out, ck2, cv2 = fused_decode_attention(q, ck, cv, kn, vn, offs,
                                           d ** -0.5, interpret=True)
    want, wck, wcv = _reference(q, ck, cv, kn, vn, offs, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(ck2), np.asarray(wck))
    np.testing.assert_array_equal(np.asarray(cv2), np.asarray(wcv))


def test_fused_decode_write_mask():
    """write_mask=False rows keep their cache contents but still attend."""
    rng = np.random.default_rng(2)
    b, s, h, d = 3, 64, 8, 128
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    ck = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    cv = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    offs = jnp.asarray([5, 17, 60], jnp.int32)
    mask = jnp.asarray([True, False, True])
    out, ck2, cv2 = fused_decode_attention(q, ck, cv, kn, vn, offs, d ** -0.5,
                                           write_mask=mask, interpret=True)
    _, wck, wcv = _reference(q, ck, cv, kn, vn, offs, d ** -0.5, mask)
    np.testing.assert_array_equal(np.asarray(ck2), np.asarray(wck))
    np.testing.assert_array_equal(np.asarray(cv2), np.asarray(wcv))
    # masked row's attention must still see ITS OWN k/v for the current slot
    # (it reads kn/vn from registers, not the unwritten cache)
    want, _, _ = _reference(q, ck, cv, kn, vn, offs, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_attention_block_dispatch_parity(monkeypatch):
    """The production entry point routes decode steps to the fused kernel
    when forced and matches its own classic path."""
    rng = np.random.default_rng(3)
    b, s, h, d = 2, 64, 8, 128
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    ck = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    cv = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    offs = jnp.asarray([3, 60], jnp.int32)
    mask = common.decode_mask(1, s, offs)
    monkeypatch.setenv("GPTQ_TPU_CACHE_IMPL", "xla")
    want_out, (wck, wcv) = attention_block((ck, cv, offs), q, kn, vn, mask)
    monkeypatch.setenv("GPTQ_TPU_CACHE_IMPL", "pallas")
    got_out, (gck, gcv) = attention_block((ck, cv, offs), q, kn, vn, mask)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(gck), np.asarray(wck))
    np.testing.assert_array_equal(np.asarray(gcv), np.asarray(wcv))
