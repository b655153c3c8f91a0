"""Pallas TPU kernel: fused RMSNorm.

Equivalent of the reference's Triton `rms_norm_fwd_fused` + TritonLlamaRMSNorm
(reference: quant/triton_norm.py:7-67): one pass computing the fp32 mean-square
then normalize-and-scale, per row block. XLA fuses this pattern well on its own
(models/common.rms_norm is the default path); the kernel exists for parity and
for fusion contexts XLA splits (e.g. very wide hidden dims).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rms_kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * w_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _rms_2d(x, w, eps: float, interpret: bool = False):
    m, h = x.shape
    bm = 8
    while m % bm != 0:
        bm = 1 if bm == 1 else bm // 2
    return pl.pallas_call(
        functools.partial(_rms_kernel, eps=eps),
        grid=(m // bm,),
        in_specs=[pl.BlockSpec((bm, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, h), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, h), x.dtype),
        interpret=interpret,
    )(x, w.reshape(1, h))


def rms_norm_pallas(x, weight, eps: float, interpret: bool = False):
    """RMSNorm over the last axis; x (..., H)."""
    lead = x.shape[:-1]
    h = x.shape[-1]
    x2 = x.reshape(-1, h)
    m = x2.shape[0]
    mp = max(8, -(-m // 8) * 8)  # pad rows: odd m would degrade to bm=1
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    y = _rms_2d(x2, weight, eps, interpret=interpret)[:m]
    return y.reshape(*lead, h)
