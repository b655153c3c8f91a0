"""Quantized matmul dispatch: Pallas fused kernel on TPU, XLA dequant-matmul fallback.

Equivalent of the reference's matmul248 launcher + QuantLinearFunction autograd
wrapper (reference: quant/quant_linear.py:263-301). The grad-input path — the
reference's transpose_matmul_248_kernel — falls out of autodiff on the XLA path
(dequantize is differentiable in x only) and gets a dedicated transposed Pallas
kernel on the TPU path (ops/pallas/matmul.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .linear import PackedLinear, quant_matmul_xla

_IMPL_ENV = "GPTQ_TPU_QMM_IMPL"  # 'xla' | 'pallas' | '' (auto)


def _use_pallas(lin: PackedLinear) -> bool:
    forced = os.environ.get(_IMPL_ENV, "")
    if forced == "xla":
        return False
    try:
        from .pallas import matmul as pallas_matmul
    except ImportError:
        return False
    if forced == "pallas":
        return True
    if jax.default_backend() != "tpu":
        return False
    return pallas_matmul.supports(lin)


def quant_matmul(x, lin: PackedLinear, dtype=jnp.bfloat16):
    """y = x @ dequant(lin) + bias, for x of any leading shape (..., K)."""
    x = x.astype(dtype)
    if _use_pallas(lin):
        from .pallas import matmul as pallas_matmul
        return pallas_matmul.quant_matmul_pallas(x, lin)
    return quant_matmul_xla(x, lin, dtype=dtype)


def fused_gate_up(gate, up, x, act: str):
    """act(x @ gate) * (x @ up) — one fused Pallas kernel when both linears are
    packed SiLU-compatible (the reference's fused MLP, quant/fused_mlp.py),
    otherwise two plain applies."""
    from .linear import linear_apply
    if (act == "silu" and isinstance(gate, PackedLinear)
            and isinstance(up, PackedLinear) and _use_pallas(gate)):
        from .pallas import mlp as pallas_mlp
        if pallas_mlp.supports_fused(gate, up):
            same_perm = (gate.perm is None and up.perm is None) or (
                gate.perm is not None and up.perm is not None
                and gate.perm is up.perm)
            if gate.perm is None or same_perm:
                return pallas_mlp.fused_mlp_pallas(x, gate, up)
    import jax
    g = linear_apply(gate, x)
    u = linear_apply(up, x)
    fn = {"silu": jax.nn.silu, "relu": jax.nn.relu,
          "gelu": jax.nn.gelu}.get(act, jax.nn.gelu)
    return fn(g) * u
