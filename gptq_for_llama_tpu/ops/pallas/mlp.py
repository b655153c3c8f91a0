"""Pallas TPU kernel: fused quantized gate/up SiLU MLP.

Equivalent of the reference's Triton `fusedmatmul_248_kernel` + QuantLlamaMLP
(reference: quant/fused_mlp.py:85-218): computes silu(x @ Wg) * (x @ Wu) with
both packed weights dequantized in-register, in one kernel — x is read once and
neither intermediate ever touches HBM (the reference's stated purpose: halve
activation reads in the MLP).

Shares the dot-then-scale formulation and tiling policy with matmul.py; the two
GEMMs accumulate in two VMEM scratch buffers and the SiLU*mul epilogue runs on
the final K step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..linear import PackedLinear
from .matmul import _select_blocks, _tile_plan, _unpack_rows, supports


def _fused_kernel(x_ref, qg_ref, sg_ref, zg_ref, qu_ref, su_ref, zu_ref,
                  o_ref, accg_ref, accu_ref, *, bits: int, groupsize: int,
                  groups_per_tile: int, out_dtype):
    kstep = pl.program_id(2)

    @pl.when(kstep == 0)
    def _():
        accg_ref[:] = jnp.zeros_like(accg_ref)
        accu_ref[:] = jnp.zeros_like(accu_ref)

    gs, gpt = groupsize, groups_per_tile
    wpg = gs * bits // 32  # packed rows per group
    xb = x_ref[:].astype(jnp.bfloat16)
    accg = accg_ref[:]
    accu = accu_ref[:]
    for g in range(gpt):
        xg = xb[:, g * gs:(g + 1) * gs]
        sumx = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        cg = _unpack_rows(qg_ref[g * wpg:(g + 1) * wpg, :], bits, gs).astype(jnp.bfloat16)
        pg = jnp.dot(xg, cg, preferred_element_type=jnp.float32)
        accg = accg + pg * sg_ref[g:g + 1, :].astype(jnp.float32) \
                    - sumx * zg_ref[g:g + 1, :].astype(jnp.float32)
        cu = _unpack_rows(qu_ref[g * wpg:(g + 1) * wpg, :], bits, gs).astype(jnp.bfloat16)
        pu = jnp.dot(xg, cu, preferred_element_type=jnp.float32)
        accu = accu + pu * su_ref[g:g + 1, :].astype(jnp.float32) \
                    - sumx * zu_ref[g:g + 1, :].astype(jnp.float32)
    accg_ref[:] = accg
    accu_ref[:] = accu

    @pl.when(kstep == pl.num_programs(2) - 1)
    def _():
        gate = accg_ref[:]
        o_ref[:] = (gate * jax.lax.logistic(gate) * accu_ref[:]).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bits", "groupsize", "out_dtype",
                                             "interpret", "block_n",
                                             "block_groups"))
def _fused_2d(x, qg, sg, zg, qu, su, zu, bits: int, groupsize: int,
              out_dtype=jnp.bfloat16, interpret: bool = False,
              block_n: int | None = None, block_groups: int | None = None):
    m, k = x.shape
    n = qg.shape[1]
    bm, bn, bk, gpt = _select_blocks(m, k, n, groupsize, bits, n_weights=2,
                                     block_n=block_n,
                                     block_groups=block_groups)
    grid = (m // bm, n // bn, k // bk)
    kernel = functools.partial(_fused_kernel, bits=bits, groupsize=groupsize,
                               groups_per_tile=gpt, out_dtype=out_dtype)

    w_spec = pl.BlockSpec((bk * bits // 32, bn), lambda i, j, kk: (kk, j),
                          memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((gpt, bn), lambda i, j, kk: (kk, j),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                               memory_space=pltpu.VMEM),
                  w_spec, g_spec, g_spec, w_spec, g_spec, g_spec],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32),
                        pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n * k,
            bytes_accessed=2 * k * n * bits // 8 + m * k * 2 + m * n * 2,
            transcendentals=m * n),
        interpret=interpret,
    )(x, qg, sg, zg, qu, su, zu)


def supports_fused(gate: PackedLinear, up: PackedLinear) -> bool:
    if not (supports(gate) and supports(up)):
        return False
    same = (gate.bits == up.bits and gate.groupsize == up.groupsize
            and gate.in_features == up.in_features
            and gate.out_features == up.out_features
            and gate.bias is None and up.bias is None)
    if not same:
        return False
    # the fused kernel fetches TWO packed streams per grid step: the full-K
    # fallback plan must budget for both
    if _tile_plan(gate.k_padded, gate.out_features, gate.groupsize,
                  gate.bits, n_weights=2) is None:
        return False
    # the kernel applies ONE input permutation (gate's) to x, so the two
    # must be IDENTICAL. perm may be a tracer at call time (params are jit
    # arguments) — compare perm_sig, the STATIC g_idx digest that lives in
    # the treedef (ops/linear.py): the decision is then derivable from the
    # jit cache key, so two same-shape act-order models can never share a
    # wrong compiled fusion decision through a common jitted function.
    if (gate.perm is None) != (up.perm is None):
        return False
    if gate.perm is not None:
        if gate.perm is up.perm:
            return True  # literally the same buffer (e.g. shared pytree node)
        return (gate.perm_sig is not None
                and gate.perm_sig == up.perm_sig)
    return True


def fused_mlp_pallas(x, gate: PackedLinear, up: PackedLinear,
                     interpret: bool = False):
    """silu(x @ dequant(gate)) * (x @ dequant(up)); x (..., K) -> (..., N)."""
    if gate.perm is not None:
        x = jnp.take(x, gate.perm, axis=-1)  # identical perm asserted upstream
    lead = x.shape[:-1]
    k = gate.in_features
    kp = gate.k_padded
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    mp = max(8, -(-m // 8) * 8)
    if mp != m or kp != k:
        x2 = jnp.pad(x2, ((0, mp - m), (0, kp - k)))
    f32 = jnp.float32
    zsg = (gate.zeros.astype(f32) * gate.scales.astype(f32)).astype(gate.scales.dtype)
    zsu = (up.zeros.astype(f32) * up.scales.astype(f32)).astype(up.scales.dtype)
    # measured-autotune cache (trace-time lookup only, like quant_matmul)
    from . import autotune
    tuned = autotune.lookup("mlp", kp, gate.out_features, gate.bits,
                            gate.groupsize, mp)
    bg, bn = tuned if tuned is not None else (None, None)
    y = _fused_2d(x2, gate.qweight, gate.scales, zsg,
                  up.qweight, up.scales, zsu,
                  gate.bits, gate.groupsize, out_dtype=x.dtype,
                  interpret=interpret, block_n=bn, block_groups=bg)
    return y[:m].reshape(*lead, gate.out_features)
