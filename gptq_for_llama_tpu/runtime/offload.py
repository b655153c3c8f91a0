"""Host-offload inference: run models bigger than device HBM.

The reference's CPU-offload path streams decoder layers GPU<->CPU per forward
with accelerate hooks, keeping the first `pre_layer` layers resident, and its
actual use case is GENERATING with a 65B on small memory
(reference: llama_inference_offload.py:17-235, README.md:174). The TPU-native
translation:

- resident layers live in HBM as usual;
- offloaded layers live in host memory (numpy pytrees) and are staged to the
  device one layer ahead of use (`jax.device_put` is async — the transfer of
  layer i+1 overlaps with layer i's compute, the double-buffering the
  reference gets from accelerate's prefetch hooks);
- each layer's forward is one jitted program shared across offloaded layers
  (same treedef/shapes => one compile);
- generation keeps a static per-layer KV cache ON DEVICE (the cache is small
  next to the weights) and decodes with the same cached layer step as
  ModelRunner, so offloaded greedy output bit-matches the resident runner.

This trades HBM capacity for PCIe/ICI bandwidth exactly like the reference
trades VRAM for PCIe.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.registry import get_arch
from ..models.common import causal_mask, decode_mask


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _to_device(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


class OffloadRunner:
    """Layer-streaming forward for models larger than device memory."""

    def __init__(self, arch_name: str, cfg, params, pre_layer: int,
                 dtype=jnp.bfloat16, batch_size: int = 1,
                 max_seq_len: Optional[int] = None, kv_dtype=None):
        self.arch = get_arch(arch_name)
        self.cfg = cfg
        self.dtype = dtype
        self.kv_dtype = kv_dtype or dtype
        self.pre_layer = pre_layer
        self.batch = batch_size
        self.max_len = max_seq_len or cfg.max_seq_len
        # resident prefix on device, rest staged from host per forward
        self.resident = [_to_device(lp) for lp in params["layers"][:pre_layer]]
        self.host_layers = [_to_host(lp) for lp in params["layers"][pre_layer:]]
        self.num_layers = len(params["layers"])
        self.statics = _to_device({k: v for k, v in params.items()
                                   if k != "layers"})

        arch, c = self.arch, cfg

        @jax.jit
        def layer_fwd(lp, x, positions, mask, rope):
            y, _, _ = arch.layer(c, lp, x, positions, mask, rope=rope)
            return y

        self._layer_fwd = layer_fwd

        @jax.jit
        def embed_step(statics, ids, positions):
            x = arch.embed(statics, c, ids, positions).astype(dtype)
            rope = arch.step_rope(c, positions, dtype)
            return x, rope

        @jax.jit
        def layer_step(lp, x, positions, mask, ck, cv, offset, rope):
            y, _, (ck2, cv2) = arch.layer(c, lp, x, positions, mask,
                                          (ck, cv, offset), rope=rope)
            return y, ck2, cv2

        @jax.jit
        def head_step(statics, x):
            return arch.head(statics, c, x)

        self._embed_step = embed_step
        self._layer_step = layer_step
        self._head_step = head_step

    def forward(self, input_ids) -> jax.Array:
        """(B, S) -> (B, S, V) logits, streaming offloaded layers."""
        ids = jnp.asarray(input_ids, jnp.int32)
        b, s = ids.shape
        positions = jnp.arange(s)[None, :]
        mask = causal_mask(s, s)
        params = dict(self.statics)
        x = self.arch.embed(params, self.cfg, ids, positions).astype(self.dtype)
        # rope hoisted once per window (layers would otherwise recompute the
        # full cos/sin tables per layer)
        rope = self.arch.step_rope(self.cfg, positions, self.dtype)

        for lp in self.resident:
            x = self._layer_fwd(lp, x, positions, mask, rope)

        # stage layer i+1 while layer i computes (device_put is async)
        staged: Optional[dict] = (_to_device(self.host_layers[0])
                                  if self.host_layers else None)
        for i in range(len(self.host_layers)):
            nxt = (_to_device(self.host_layers[i + 1])
                   if i + 1 < len(self.host_layers) else None)
            x = self._layer_fwd(staged, x, positions, mask, rope)
            staged = nxt

        return self.arch.head(params, self.cfg, x)

    # -- KV-cached generation (reference llama_inference_offload.py:186-235) --

    def init_cache(self):
        """Per-layer tuple static KV caches on device + offset 0."""
        shape = (self.batch, self.max_len, self.cfg.num_kv_heads,
                 self.cfg.head_dim)
        k = tuple(jnp.zeros(shape, self.kv_dtype)
                  for _ in range(self.num_layers))
        v = tuple(jnp.zeros(shape, self.kv_dtype)
                  for _ in range(self.num_layers))
        return k, v, jnp.zeros((), jnp.int32)

    def _stream_step(self, ids, cache):
        """One cached model step of width s = ids.shape[1], streaming the
        offloaded layers with one-ahead staging. Returns (logits, cache)."""
        k, v, offset = cache
        b, s = ids.shape
        positions = offset + jnp.arange(s)[None, :]
        mask = decode_mask(s, self.max_len, offset)
        x, rope = self._embed_step(self.statics, jnp.asarray(ids, jnp.int32),
                                   positions)
        ks, vs = list(k), list(v)
        for li, lp in enumerate(self.resident):
            x, ks[li], vs[li] = self._layer_step(
                lp, x, positions, mask, k[li], v[li], offset, rope)
        n_res = len(self.resident)
        staged = (_to_device(self.host_layers[0]) if self.host_layers
                  else None)
        for i in range(len(self.host_layers)):
            nxt = (_to_device(self.host_layers[i + 1])
                   if i + 1 < len(self.host_layers) else None)
            li = n_res + i
            x, ks[li], vs[li] = self._layer_step(
                staged, x, positions, mask, k[li], v[li], offset, rope)
            staged = nxt
        logits = self._head_step(self.statics, x)
        return logits, (tuple(ks), tuple(vs), offset + s)

    def prefill(self, ids, cache):
        """(B, S) prompt pass writing the cache; returns (logits, cache)."""
        return self._stream_step(jnp.asarray(ids, jnp.int32), cache)

    def decode(self, ids, cache):
        """(B, 1) decode step; returns (logits, cache)."""
        return self._stream_step(jnp.asarray(ids, jnp.int32), cache)

    def generate(self, prompt_ids, max_new_tokens: int,
                 temperature: float = 0.0, top_p: float = 0.95,
                 top_k: int = 0, min_new_tokens: int = 0,
                 eos_token_id: Optional[int] = None, seed: int = 0,
                 stream=None) -> np.ndarray:
        """Autoregressive generation with half-resident weights — the
        reference's offloaded-decode use case (llama_inference_offload.py:
        186-235). Delegates to runtime.runner.generate (this runner exposes
        the same init_cache/prefill/decode surface), so sampling semantics —
        including min_new_tokens EOS suppression — stay in one place and
        greedy output bit-matches a fully resident ModelRunner."""
        from .runner import generate as runner_generate
        return runner_generate(self, prompt_ids, max_new_tokens,
                               temperature=temperature, top_p=top_p,
                               top_k=top_k, min_new_tokens=min_new_tokens,
                               eos_token_id=eos_token_id, seed=seed,
                               stream=stream)

    def warmup(self, prefill_buckets=()):
        """benchmark_decode compatibility: offloaded layer programs share one
        treedef, so the first decode step compiles everything there is."""
        return None

    def perplexity(self, test_ids, seqlen: int) -> float:
        """Streamed ppl eval (matches engine.evaluate semantics)."""
        test_ids = np.asarray(test_ids).reshape(-1)
        nsamples = len(test_ids) // seqlen
        if nsamples == 0:
            raise ValueError(
                f"test stream has {len(test_ids)} tokens < seqlen {seqlen}")
        total = 0.0
        for i in range(nsamples):
            ids = test_ids[i * seqlen:(i + 1) * seqlen][None]
            logits = self.forward(ids).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
            tok = jnp.take_along_axis(
                logp, jnp.asarray(ids[:, 1:, None]), axis=-1)
            total += float(-jnp.mean(tok) * seqlen)
        return float(np.exp(total / (nsamples * seqlen)))
