"""Low-rank adapters (LoRA) over frozen quantized linears.

The reference ships a backward pass for exactly this use case — LoRA-style
finetuning where the packed weight stays frozen and only small adapters
train (reference: quant/quant_linear.py:282-301, QuantLinearFunction's
fp16 transpose backward) — but no adapter machinery itself. Here the
adapter is a pytree node wrapping any linear (PackedLinear or dense dict):

    y = base(x) + (x @ a) @ b * (alpha / r)

Gradients flow to (a, b) by plain autodiff and into earlier layers through
quant_matmul's custom VJP (the transposed Pallas dequant-GEMM on TPU,
ops/pallas/matmul.quant_matmul_t_pallas). The packed integer buffers are
never differentiated: `split_lora`/`join_lora` separate the trainable
adapter leaves from the frozen skeleton so `jax.grad` only ever sees
float adapter arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LoraLinear:
    """A frozen linear plus a rank-r trainable delta.

    base: PackedLinear or dense {'kernel', ...} dict (frozen).
    a: (K, r); b: (r, N). b starts at zero so the initial delta is exactly
    zero (standard LoRA init). alpha: static scaling numerator.
    """

    base: Any
    a: jax.Array | None
    b: jax.Array | None
    alpha: float = 16.0

    def tree_flatten(self):
        return (self.base, self.a, self.b), (self.alpha,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        base, a, b = children
        return cls(base, a, b, aux[0])


def lora_apply(lin: LoraLinear, x, dtype):
    """base(x) + scaled low-rank delta (delta compute in the base dtype)."""
    from .linear import linear_apply
    y = linear_apply(lin.base, x, dtype)
    r = lin.a.shape[-1]
    delta = (x.astype(dtype) @ lin.a.astype(dtype)) @ lin.b.astype(dtype)
    return y + delta * (lin.alpha / r)


def _is_lora(x) -> bool:
    return isinstance(x, LoraLinear)


def split_lora(params):
    """-> (adapters, skeleton): adapters is a list of {'a','b'} dicts (the
    only trainable leaves, in tree order); skeleton is params with those
    slots emptied. join_lora(skeleton, adapters) restores the tree."""
    adapters = []

    def strip(n):
        if _is_lora(n):
            adapters.append({"a": n.a, "b": n.b})
            return dataclasses.replace(n, a=None, b=None)
        return n

    skeleton = jax.tree_util.tree_map(strip, params, is_leaf=_is_lora)
    return adapters, skeleton


def join_lora(skeleton, adapters):
    it = iter(adapters)

    def put(n):
        if _is_lora(n):
            ab = next(it)
            return dataclasses.replace(n, a=ab["a"], b=ab["b"])
        return n

    return jax.tree_util.tree_map(put, skeleton, is_leaf=_is_lora)
