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
