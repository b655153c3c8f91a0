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
    if forced != "pallas" and jax.default_backend() != "tpu":
        return False
    # forcing pallas cannot waive the shape preconditions — unsupported
    # linears (wire layout, ragged groups) still take the XLA fallback
    return pallas_matmul.supports(lin)


def _interpret() -> bool:
    """Interpret-mode kernels when pallas is FORCED off-TPU (tests/CI)."""
    return (os.environ.get(_IMPL_ENV, "") == "pallas"
            and jax.default_backend() != "tpu")


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
    return pallas_matmul.quant_matmul_pallas(x, lin, interpret=_interpret())


def _qmm_fwd(x, lin):
    return _quant_matmul_ad(x, lin), (lin,)


def _qmm_bwd(res, g):
    (lin,) = res
    # grad-input: g @ W^T — the transposed Pallas dequant-GEMM when the
    # shape supports it (reference: transpose_matmul_248_kernel,
    # quant/quant_linear.py:192-258), XLA dense-dequant otherwise
    from .pallas import matmul as pallas_matmul
    if _use_pallas(lin):
        dx = pallas_matmul.quant_matmul_t_pallas(g, lin,
                                                 interpret=_interpret())
    else:
        w = lin.dequantize(g.dtype)                   # (K_dev, N) device order
        dx = jnp.matmul(g, w.T)
        if lin.perm is not None:
            dx = jnp.take(dx, jnp.argsort(lin.perm), axis=-1)

    return dx, _zero_lin_tangent(lin)


def _zero_lin_tangent(lin):
    """Zero cotangent for a frozen PackedLinear (float0 for int buffers)."""
    import numpy as np

    def zero_tan(t):
        if jnp.issubdtype(t.dtype, jnp.floating):
            return jnp.zeros_like(t)
        return np.zeros(t.shape, jax.dtypes.float0)

    return jax.tree_util.tree_map(zero_tan, lin)


_quant_matmul_ad.defvjp(_qmm_fwd, _qmm_bwd)


@jax.custom_vjp
def _fused_mlp_ad(x, gate, up):
    from .pallas import mlp as pallas_mlp
    return pallas_mlp.fused_mlp_pallas(x, gate, up, interpret=_interpret())


def _fmlp_fwd(x, gate, up):
    return _fused_mlp_ad(x, gate, up), (x, gate, up)


def _fmlp_bwd(res, g):
    # grad-input through the DIFFERENTIABLE unfused form: silu(x@Wg)*(x@Wu).
    # quant_matmul's own custom VJP supplies the transposed dequant-GEMM
    # grad-input for each branch (the LoRA use case: frozen weights,
    # trainable adapters elsewhere in the graph).
    x, gate, up = res

    def f(xx):
        gx = quant_matmul(xx, gate, dtype=xx.dtype)
        ux = quant_matmul(xx, up, dtype=xx.dtype)
        return jax.nn.silu(gx) * ux

    _, vjp = jax.vjp(f, x)
    (dx,) = vjp(g)
    return dx, _zero_lin_tangent(gate), _zero_lin_tangent(up)


_fused_mlp_ad.defvjp(_fmlp_fwd, _fmlp_bwd)


def fused_gate_up(gate, up, x, act: str):
    """act(x @ gate) * (x @ up) — one fused Pallas kernel when both linears are
    packed SiLU-compatible (the reference's fused MLP, quant/fused_mlp.py),
    otherwise two plain applies. Differentiable in x (custom VJP recomputes
    through the unfused transposed-kernel path)."""
    from .linear import linear_apply
    if (act == "silu" and isinstance(gate, PackedLinear)
            and isinstance(up, PackedLinear) and _use_pallas(gate)):
        from .pallas import mlp as pallas_mlp
        # supports_fused also proves the input permutations identical
        # (via the host-side g_idx aux — perm may be a tracer here)
        if pallas_mlp.supports_fused(gate, up):
            return _fused_mlp_ad(x, gate, up)
    from ..models.common import activation
    g = linear_apply(gate, x)
    u = linear_apply(up, x)
    return activation(act)(g) * u
