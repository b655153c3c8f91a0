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
    """y = x @ dequant(lin) + bias, for x of any leading shape (..., K).

    Differentiable in x (LoRA-style finetuning downstream): the backward is
    g @ dequant(W)^T — the reference's transpose_matmul_248_kernel path
    (reference: quant/quant_linear.py:192-301). Packed integer buffers get
    zero tangents.
    """
    x = x.astype(dtype)
    if _use_pallas(lin):
        return _quant_matmul_ad(x, lin)
    return quant_matmul_xla(x, lin, dtype=dtype)


@jax.custom_vjp
def _quant_matmul_ad(x, lin: PackedLinear):
    from .pallas import matmul as pallas_matmul
    return pallas_matmul.quant_matmul_pallas(x, lin)


def _qmm_fwd(x, lin):
    return _quant_matmul_ad(x, lin), (lin,)


def _qmm_bwd(res, g):
    import numpy as np
    (lin,) = res
    # grad-input: g @ W^T — the transposed Pallas dequant-GEMM when the
    # shape supports it (reference: transpose_matmul_248_kernel,
    # quant/quant_linear.py:192-258), XLA dense-dequant otherwise
    from .pallas import matmul as pallas_matmul
    if _use_pallas(lin):
        interpret = (os.environ.get(_IMPL_ENV, "") == "pallas"
                     and jax.default_backend() != "tpu")
        dx = pallas_matmul.quant_matmul_t_pallas(g, lin, interpret=interpret)
    else:
        w = lin.dequantize(g.dtype)                   # (K_dev, N) device order
        dx = jnp.matmul(g, w.T)
        if lin.perm is not None:
            dx = jnp.take(dx, jnp.argsort(lin.perm), axis=-1)

    def zero_tan(t):
        if jnp.issubdtype(t.dtype, jnp.floating):
            return jnp.zeros_like(t)
        return np.zeros(t.shape, jax.dtypes.float0)

    dlin = jax.tree_util.tree_map(zero_tan, lin)
    return dx, dlin


_quant_matmul_ad.defvjp(_qmm_fwd, _qmm_bwd)


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
    from ..models.common import activation
    g = linear_apply(gate, x)
    u = linear_apply(up, x)
    return activation(act)(g) * u
