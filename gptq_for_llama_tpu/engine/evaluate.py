"""Perplexity evaluation — the reference's integration test.

Re-implements *_eval (reference: llama.py:173-261) functionally: the test token
stream is cut into seqlen windows, each window's shifted cross-entropy is
computed under one jitted full-model forward, and
ppl = exp(sum nll / (nsamples * seqlen)) (reference: llama.py:246-259).

The reference streams layers CPU<->GPU holding all activations resident
(llama.py:191-239); on TPU the whole quantized model fits in HBM, so a straight
per-window forward is both simpler and faster. RTN (--nearest) happens at
quantize time via QuantizeSpec(nearest=True), not inside eval.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.common import causal_mask
from ..models.registry import get_arch


def _nll_fn(arch, cfg, head_chunk: int = 512):
    @jax.jit
    def nll(params, ids):
        """Per-window summed shifted cross-entropy for (B, seqlen) windows.

        The trunk runs whole-window (flash prefill keeps attention O(S) in
        memory); the HEAD is applied in `head_chunk`-position chunks under
        lax.scan so the fp32 (B, S, V) logits never materialize — per-row
        log-softmax is position-independent, so chunking changes nothing
        numerically (reference computes full logits then shifts,
        llama.py:246-252)."""
        b, s = ids.shape
        positions = jnp.arange(s)[None, :]
        x = arch.embed(params, cfg, ids, positions)
        mask = causal_mask(s, s)
        for lp in params["layers"]:
            x, _, _ = arch.layer(cfg, lp, x, positions, mask)

        xs, labels = x[:, :-1], ids[:, 1:]
        sm1 = s - 1
        c = min(head_chunk, sm1)
        pad = (-sm1) % c
        xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)))
        valid = jnp.pad(jnp.ones((b, sm1), jnp.float32), ((0, 0), (0, pad)))
        nch = (sm1 + pad) // c
        xs = jnp.swapaxes(xs.reshape(b, nch, c, -1), 0, 1)
        labels = jnp.swapaxes(labels.reshape(b, nch, c), 0, 1)
        valid = jnp.swapaxes(valid.reshape(b, nch, c), 0, 1)

        def body(acc, inp):
            xc, lc, vc = inp
            logits = arch.head(params, cfg, xc).astype(jnp.float32)
            lse = jax.nn.logsumexp(logits, axis=-1)
            gold = jnp.take_along_axis(logits, lc[..., None], axis=-1)[..., 0]
            return acc + jnp.sum((lse - gold) * vc, axis=-1), None

        acc, _ = jax.lax.scan(body, jnp.zeros((b,), jnp.float32),
                              (xs, labels, valid))
        # mean CE over seqlen-1 tokens, scaled by seqlen (reference llama.py:250-252)
        return acc / sm1 * s

    return nll


def _default_batch(cfg, seqlen: int) -> int:
    """Eval window batch: 8 when the flash prefill kernel will actually take
    the shape on TPU; otherwise the seqlen-scaled cap that bounds the XLA
    fallback's per-chunk (B, H, q_chunk, S) fp32 logits transient."""
    import os
    scaled = max(1, min(8, (512 * 512 * 8) // (seqlen * seqlen)))
    if (jax.default_backend() != "tpu"
            or os.environ.get("GPTQ_TPU_ATTN_IMPL", "") == "xla"):
        return scaled
    from ..ops.pallas.flash import supports_prefill, supports_prefill_blocked
    flash_ok = seqlen > 256 and (
        supports_prefill(seqlen, seqlen, cfg.num_heads, cfg.num_kv_heads,
                         cfg.head_dim)
        or supports_prefill_blocked(seqlen, seqlen, cfg.num_heads,
                                    cfg.num_kv_heads, cfg.head_dim))
    return 8 if flash_ok else scaled


def perplexity(arch_name: str, cfg, params, test_ids, seqlen: int | None = None,
               verbose: bool = False, log=print, batch: int | None = None) -> float:
    """Wikitext2/PTB/C4-style perplexity over a flat token stream.

    test_ids: (T,) int32. Uses floor(T / seqlen) windows (reference llama.py:181).
    Windows run `batch` at a time under one jit (the reference evaluates one by
    one; batching only amortizes dispatch — per-window NLLs are identical).
    Default batch: 8 on TPU when the flash prefill kernel accepts the shape —
    flash never materializes the (B, H, S, S) transient and the chunked head
    never materializes (B, S, V), so batching is bounded by activation memory,
    not attention/logits; larger batches amortize the per-window weight stream.
    When the kernel's supports() gate declines (sq <= 256, head_dim % 128 != 0,
    GQA mismatch — e.g. GPT-2's head_dim 64) the XLA fallback materializes
    (B, H, q_chunk<=256, S) fp32 logits per layer, so the batch scales down
    with seqlen like the CPU path instead of risking OOM. Off-TPU (CPU tests)
    the fallback is always in play, so the batch always scales down there.
    """
    arch = get_arch(arch_name)
    seqlen = seqlen or cfg.max_seq_len
    if batch is None:
        batch = _default_batch(cfg, seqlen)
    test_ids = np.asarray(test_ids).reshape(-1)
    nsamples = len(test_ids) // seqlen
    if nsamples == 0:
        raise ValueError(f"test stream of {len(test_ids)} tokens < seqlen {seqlen}")
    windows = test_ids[: nsamples * seqlen].reshape(nsamples, seqlen)
    nll = _nll_fn(arch, cfg)
    total = 0.0
    done = 0
    for i in range(0, nsamples, batch):
        chunk = windows[i:i + batch]
        if len(chunk) < batch and nsamples >= batch:
            # keep one compiled shape: pad then drop the padded rows' nlls
            pad = batch - len(chunk)
            vals = nll(params, jnp.asarray(np.pad(chunk, ((0, pad), (0, 0)))))
            total += float(jnp.sum(vals[: len(chunk)]))
        else:
            total += float(jnp.sum(nll(params, jnp.asarray(chunk))))
        done += len(chunk)
        if verbose and (i // batch) % 4 == 3:
            log(f"  ppl eval {done}/{nsamples}: "
                f"{float(np.exp(total / (done * seqlen))):.4f}")
    return float(np.exp(total / (nsamples * seqlen)))
