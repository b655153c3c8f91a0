"""Attach trainable LoRA adapters to a (quantized) model's linears.

The downstream use the reference designed its backward kernel for
(reference: quant/quant_linear.py:282-301): freeze the packed weights,
train rank-r deltas. Functional recipe:

    params = attach_lora("llama", params, rank=8, key=key)
    adapters, skeleton = split_lora(params)           # trainables | frozen

    def loss_fn(adapters, skeleton, ids, labels):
        p = join_lora(skeleton, adapters)
        logits = arch.forward(p, cfg, ids)
        return cross_entropy(logits, labels)

    grads = jax.grad(loss_fn)(adapters, skeleton, ids, labels)  # a/b only

Grad-input through each frozen packed linear runs the transposed Pallas
dequant-GEMM on TPU (ops/pallas/matmul.quant_matmul_t_pallas).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.registry import get_arch
from ..ops.linear import PackedLinear
from ..ops.lora import LoraLinear, join_lora, split_lora  # re-export
from .quantize import get_path, set_path

__all__ = ["attach_lora", "split_lora", "join_lora", "LoraLinear"]


def _lin_dims(lin):
    if isinstance(lin, PackedLinear):
        return lin.in_features, lin.out_features, lin.scales.dtype
    kernel = lin["kernel"]
    return kernel.shape[0], kernel.shape[1], kernel.dtype


def attach_lora(arch_name: str, params: dict, rank: int, key,
                alpha: float = 16.0, targets=None) -> dict:
    """Wrap target per-layer linears in LoraLinear (a ~ N(0, 0.01), b = 0 —
    the initial delta is exactly zero, so forward output is unchanged).

    targets: iterable of layer-relative dotted paths (default: every linear
    in arch.LAYER_LINEARS). Returns a tree whose edited dicts are copies;
    the caller's params are untouched (array leaves shared)."""
    arch = get_arch(arch_name)
    targets = tuple(targets) if targets is not None else arch.LAYER_LINEARS
    out = dict(params)
    out["layers"] = []
    for lp in params["layers"]:
        lp = jax.tree_util.tree_map(
            lambda x: x, lp,
            is_leaf=lambda x: isinstance(x, PackedLinear))
        for name in targets:
            try:
                lin = get_path(lp, name)
            except (KeyError, TypeError):
                continue
            if isinstance(lin, LoraLinear):
                continue
            k, n, dtype = _lin_dims(lin)
            key, sub = jax.random.split(key)
            a = (jax.random.normal(sub, (k, rank), jnp.float32) * 0.01
                 ).astype(dtype)
            b = jnp.zeros((rank, n), dtype)
            set_path(lp, name, LoraLinear(lin, a, b, alpha))
        out["layers"].append(lp)
    return out
