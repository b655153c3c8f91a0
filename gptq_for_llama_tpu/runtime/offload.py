"""Host-offload inference: run models bigger than device HBM.

The reference's CPU-offload path streams decoder layers GPU<->CPU per forward
with accelerate hooks, keeping the first `pre_layer` layers resident
(reference: llama_inference_offload.py:17-235). The TPU-native translation:

- resident layers live in HBM as usual;
- offloaded layers live in host memory (numpy pytrees) and are staged to the
  device one layer ahead of use (`jax.device_put` is async — the transfer of
  layer i+1 overlaps with layer i's compute, the double-buffering the
  reference gets from accelerate's prefetch hooks);
- each layer's forward is one jitted program shared across offloaded layers
  (same treedef/shapes => one compile).

This trades HBM capacity for PCIe/ICI bandwidth exactly like the reference
trades VRAM for PCIe (its 65B-on-24GB use case, README.md:174).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.registry import get_arch
from ..models.common import causal_mask


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _to_device(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


class OffloadRunner:
    """Layer-streaming forward for models larger than device memory."""

    def __init__(self, arch_name: str, cfg, params, pre_layer: int,
                 dtype=jnp.bfloat16):
        self.arch = get_arch(arch_name)
        self.cfg = cfg
        self.dtype = dtype
        self.pre_layer = pre_layer
        # resident prefix on device, rest staged from host per forward
        self.resident = [_to_device(lp) for lp in params["layers"][:pre_layer]]
        self.host_layers = [_to_host(lp) for lp in params["layers"][pre_layer:]]
        self.statics = _to_device({k: v for k, v in params.items()
                                   if k != "layers"})

        arch, c = self.arch, cfg

        @jax.jit
        def layer_fwd(lp, x, positions, mask):
            y, _, _ = arch.layer(c, lp, x, positions, mask)
            return y

        self._layer_fwd = layer_fwd

    def forward(self, input_ids) -> jax.Array:
        """(B, S) -> (B, S, V) logits, streaming offloaded layers."""
        ids = jnp.asarray(input_ids, jnp.int32)
        b, s = ids.shape
        positions = jnp.arange(s)[None, :]
        mask = causal_mask(s, s)
        params = dict(self.statics)
        x = self.arch.embed(params, self.cfg, ids, positions).astype(self.dtype)

        for lp in self.resident:
            x = self._layer_fwd(lp, x, positions, mask)

        # stage layer i+1 while layer i computes (device_put is async)
        staged: Optional[dict] = (_to_device(self.host_layers[0])
                                  if self.host_layers else None)
        for i in range(len(self.host_layers)):
            nxt = (_to_device(self.host_layers[i + 1])
                   if i + 1 < len(self.host_layers) else None)
            x = self._layer_fwd(staged, x, positions, mask)
            staged = nxt

        return self.arch.head(params, self.cfg, x)

    def perplexity(self, test_ids, seqlen: int) -> float:
        """Streamed ppl eval (matches engine.evaluate semantics)."""
        test_ids = np.asarray(test_ids).reshape(-1)
        nsamples = len(test_ids) // seqlen
        total = 0.0
        for i in range(nsamples):
            ids = test_ids[i * seqlen:(i + 1) * seqlen][None]
            logits = self.forward(ids).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
            tok = jnp.take_along_axis(
                logp, jnp.asarray(ids[:, 1:, None]), axis=-1)
            total += float(-jnp.mean(tok) * seqlen)
        return float(np.exp(total / (nsamples * seqlen)))
