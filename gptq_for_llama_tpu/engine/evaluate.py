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

from ..models.registry import get_arch


def _nll_fn(arch, cfg):
    @jax.jit
    def nll(params, ids):
        """Per-window summed shifted cross-entropy for (B, seqlen) windows."""
        logits = arch.forward(params, cfg, ids).astype(jnp.float32)
        shift_logits = logits[:, :-1]
        shift_labels = ids[:, 1:]
        logp = jax.nn.log_softmax(shift_logits, axis=-1)
        tok = jnp.take_along_axis(logp, shift_labels[..., None], axis=-1)
        # mean CE over seqlen-1 tokens, scaled by seqlen (reference llama.py:250-252)
        return -jnp.mean(tok, axis=(1, 2)) * ids.shape[1]

    return nll


def perplexity(arch_name: str, cfg, params, test_ids, seqlen: int | None = None,
               verbose: bool = False, log=print, batch: int | None = None) -> float:
    """Wikitext2/PTB/C4-style perplexity over a flat token stream.

    test_ids: (T,) int32. Uses floor(T / seqlen) windows (reference llama.py:181).
    Windows run `batch` at a time under one jit (the reference evaluates one by
    one; batching only amortizes dispatch — per-window NLLs are identical).
    Default batch scales down with seqlen: full-causal attention materializes
    (B, H, S, S) fp32 logits (~0.5 GB per layer at S=2048, B=1), so long
    sequences cap the batch until a flash prefill kernel lands.
    """
    arch = get_arch(arch_name)
    seqlen = seqlen or cfg.max_seq_len
    if batch is None:
        batch = max(1, min(8, (512 * 512 * 8) // (seqlen * seqlen)))
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
