"""Pallas TPU kernel: fused dequant + matmul over bit-packed weights.

The TPU-native equivalent of the reference's Triton `matmul_248_kernel`
(reference: quant/quant_linear.py:73-137): int32-packed 2/4/8-bit codes are
unpacked by shift/mask IN REGISTERS inside each (bk, bn) tile and fed to the
MXU — packed words are the only weight HBM traffic, which is what makes
bandwidth-bound decode fast.

Design points, driven by TPU hardware (not a Triton translation):

- **dot-then-scale**: instead of dequantizing every weight element
  ((c - z) * s on (bk, bn) elements — VPU-bound for matvec), each group's raw
  codes go straight to the MXU and the affine correction is applied to the
  (bm, bn) accumulator:
      x_g @ ((C_g - z_g) * s_g) == (x_g @ C_g) * s_g - sum_k(x_g) * (z_g * s_g)
  This moves O(bk*bn) VPU work to O(bm*bn) — 16-128x less for decode.
- No per-row g_idx gather (reference quant_linear.py:114-118): rows are
  group-sorted at load (ops/linear.py from_wire), so a K-tile covers whole
  groups; scale rows are read with STATIC slices (Mosaic-friendly).
- Zero-points arrive pre-unpacked (+1 applied) as float (G, N)
  (PackedLinear.zeros) — the qzeros column-unpack happens once at load.
- The f32 accumulator lives in VMEM scratch across the K grid dimension.
- No runtime autotuner (reference custom_autotune.py): block sizes are picked
  statically from the problem shape (Mosaic constraints: scale-block sublane
  dim must be a multiple of 8 or the full G).

K-tiling policy: tiles of 8 groups when G % 8 == 0 (scale blocks (8, bn)),
otherwise one full-K tile (scale blocks (G, bn) — full-dim blocks bypass the
multiple-of-8 rule). Unsupported shapes fall back to the XLA dequant path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..linear import PackedLinear


def _unpack_rows(w, bits: int, groupsize: int):
    """One group's packed words (gs*bits/32, bn) -> (gs, bn) int32 codes.

    TPU layout (quant/packing.py to_tpu_layout): field j of all words = one
    contiguous row block, so unpack is shift/mask + CONCAT — no cross-sublane
    interleave (measured ~6x faster on v5e than the stack+reshape the wire
    layout needs). 3-bit uses the bit-plane split: a 2-bit plane and a 1-bit
    plane, combined with one shift+or."""
    if bits == 3:
        wlo = groupsize // 16
        lo_w, hi_w = w[:wlo], w[wlo:]
        lo = jnp.concatenate(
            [(jax.lax.shift_right_logical(lo_w, 2 * j) & 3) for j in range(16)],
            axis=0)
        hi = jnp.concatenate(
            [(jax.lax.shift_right_logical(hi_w, j) & 1) for j in range(32)],
            axis=0)
        return lo | (hi << 2)
    ipw = 32 // bits
    maxq = (1 << bits) - 1
    vals = [(jax.lax.shift_right_logical(w, bits * j) & maxq) for j in range(ipw)]
    return jnp.concatenate(vals, axis=0)


def _qmm_kernel(x_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref, *, bits: int,
                groupsize: int, groups_per_tile: int, out_dtype):
    """One (bm, bn) output tile, accumulating over the K grid dimension."""
    kstep = pl.program_id(2)

    @pl.when(kstep == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gs, gpt = groupsize, groups_per_tile
    wpg = gs * bits // 32  # packed rows per group
    xb = x_ref[:].astype(jnp.bfloat16)
    acc = acc_ref[:]
    for g in range(gpt):
        codes = _unpack_rows(qw_ref[g * wpg:(g + 1) * wpg, :], bits, gs)
        cg = codes.astype(jnp.bfloat16)
        xg = xb[:, g * gs:(g + 1) * gs]
        p = jnp.dot(xg, cg, preferred_element_type=jnp.float32)
        sumx = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        # static row slices of the scale/zero blocks (z_ref holds z*s, see call)
        acc = acc + p * s_ref[g:g + 1, :].astype(jnp.float32) \
                  - sumx * z_ref[g:g + 1, :].astype(jnp.float32)
    acc_ref[:] = acc

    @pl.when(kstep == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _pick_block(dim: int, preferred: int, align: int) -> int:
    """Largest multiple of `align` <= preferred that divides dim."""
    b = min(preferred, dim)
    b = (b // align) * align
    while b > align and dim % b != 0:
        b -= align
    return max(b, align)


# VMEM budget for one qweight tile (x2 double buffering happens outside)
_QW_TILE_BYTES = 4 * 1024 * 1024

# Decode is per-grid-step overhead bound (~300-450 ns/step on v5e through this
# environment), NOT bandwidth bound: measured qkv 4096x12288 int4 went from
# 463 GB/s at 128 KB tiles to 755 GB/s (92% of the 819 GB/s peak) at 512 KB
# tiles (scripts/kbench_sweep.py). Target ~512 KB qweight tiles.
_TARGET_TILE = 512 * 1024


def _tile_plan(k: int, n: int, groupsize: int, bits: int,
               n_weights: int = 1):
    """Returns (bk, groups_per_tile) or None if unsupported.

    n_weights: packed streams fetched per grid step (2 for the fused MLP) —
    the full-K budget must cover ALL of them."""
    g = k // groupsize
    if g % 8 == 0 and k % (8 * groupsize) == 0:
        return 8 * groupsize, 8
    # full-K single tile: scale block = full G rows (any size allowed)
    if (k * bits // 32) * 256 * 4 * n_weights <= _QW_TILE_BYTES * 2:
        return k, g
    return None


def _select_blocks(m: int, k: int, n: int, groupsize: int, bits: int,
                   n_weights: int = 1, block_n=None, block_groups=None):
    """(bm, bn, bk, gpt) for one dequant-GEMM invocation: static tile plan ->
    heuristic widening toward the overhead-optimal tile -> explicit
    (autotuner/benchmark) overrides -> M/N block picks. The single source of
    truth shared by _qmm_2d, _qmm_t_2d, and the fused MLP kernel."""
    g = k // groupsize
    plan = _tile_plan(k, n, groupsize, bits, n_weights)
    assert plan is not None, "caller must check supports()"
    bk, gpt = plan
    bn = None
    if gpt != g:  # tiled plan: widen toward the overhead-optimal tile size
        tuned = _best_blocks(k, n, groupsize, bits, n_weights=n_weights)
        if tuned is not None:
            gpt, bn = tuned
            bk = gpt * groupsize
    if block_groups is not None and k % (block_groups * groupsize) == 0:
        gpt = block_groups
        bk = block_groups * groupsize
    if block_n is not None:
        bn = block_n
    bm = _pick_block(m, 256, 8)
    bn = _pick_block(n, bn or 256, 128)
    return bm, bn, bk, gpt


def _ranked_blocks(k: int, n: int, groupsize: int, bits: int,
                   n_weights: int = 1):
    """All Mosaic-valid (groups_per_tile, bn) tilings for this shape, ordered
    by |per-step weight traffic - _TARGET_TILE| (heuristic best first).

    n_weights: packed streams fetched per grid step (2 for the fused gate/up
    MLP kernel). Mosaic constraint: the (gpt, bn) scale block's sublane dim
    must be a multiple of 8 (or the full G, handled by the _tile_plan full-K
    fallback). Single source of truth for both the offline heuristic
    (_best_blocks) and the measured autotuner's candidate set
    (autotune.candidates)."""
    g = k // groupsize
    # every lane-aligned tiling that divides N, not just powers of two —
    # N=13824 (13B MLP) has no pow2 divisor above 512, but its natural
    # 768/1536 tilings cut the grid-step count 3x (round-5: step count, not
    # bandwidth, is what degrades in-model perf; see _race's tie resolution)
    bns = [b for b in range(128, min(n, 8192) + 1, 128) if n % b == 0]
    out = []
    for bg in (8, 16, 32):
        if g % bg:
            continue
        rows = bg * groupsize * bits // 32
        for bn in bns:
            tile = rows * bn * 4 * n_weights
            if tile > _QW_TILE_BYTES:
                continue
            out.append((abs(tile - _TARGET_TILE), bg, bn))
    out.sort()
    return [(bg, bn) for _, bg, bn in out]


def _best_blocks(k: int, n: int, groupsize: int, bits: int,
                 n_weights: int = 1):
    """The heuristic (groups_per_tile, bn) pick: head of _ranked_blocks."""
    ranked = _ranked_blocks(k, n, groupsize, bits, n_weights)
    return ranked[0] if ranked else None


def supports(lin: PackedLinear) -> bool:
    """Shapes/bits this kernel handles; others take the XLA fallback path."""
    if lin.bits not in (2, 3, 4, 8):
        return False
    if lin.layout != "tpu":
        return False  # kernel unpack assumes the group-interleaved layout
    kp, n = lin.k_padded, lin.out_features
    g = lin.scales.shape[0]
    if g * lin.groupsize != kp:
        return False  # ragged last group
    if n % 128 != 0:
        return False
    align = 32 if lin.bits == 3 else 32 // lin.bits
    if lin.groupsize % align != 0:
        return False  # group boundaries must align to packed words
    return _tile_plan(kp, n, lin.groupsize, lin.bits) is not None


@functools.partial(jax.jit, static_argnames=("bits", "groupsize", "out_dtype",
                                             "interpret", "block_n", "block_groups"))
def _qmm_2d(x, qweight, scales, zeros_scaled, bits: int, groupsize: int,
            out_dtype=jnp.bfloat16, interpret: bool = False,
            block_n: int | None = None, block_groups: int | None = None):
    """y = x @ dequant(qweight): x (M, K) -> (M, N). M must be 8-aligned.

    zeros_scaled = zeros * scales (precomputed outside; see _qmm_kernel).
    block_n / block_groups override the static tile plan (benchmarks/tuning);
    block_groups must keep the scale block a multiple of 8 rows or the full G.
    """
    m, k = x.shape
    n = qweight.shape[1]
    bm, bn, bk, gpt = _select_blocks(m, k, n, groupsize, bits,
                                     block_n=block_n,
                                     block_groups=block_groups)

    grid = (m // bm, n // bn, k // bk)
    kernel = functools.partial(_qmm_kernel, bits=bits, groupsize=groupsize,
                               groups_per_tile=gpt, out_dtype=out_dtype)
    flops = 2 * m * n * k
    bytes_accessed = (m * k * 2) * (n // bn) + k * n * bits // 8 + m * n * 2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk * bits // 32, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpt, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpt, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(x, qweight, scales, zeros_scaled)


def _qmm_t_kernel(g_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref, *, bits: int,
                  groupsize: int, groups_per_tile: int, out_dtype):
    """Transposed product: one (bm, bk) grad-input tile, accumulating over
    the N (reduction) grid dimension.

    dx = g @ W^T with W = (C - z) * s. The scale varies along the reduction
    axis (it is indexed by n inside the sum), so the dot-then-scale trick of
    the forward kernel does not transpose; instead each group's code tile is
    dequantized in-register ((c * s) - z*s on (gs, bn) VPU elements — fine
    for the finetuning/backward path) and fed to the MXU contracting on n.
    Packed words remain the only weight HBM traffic.
    """
    nstep = pl.program_id(2)

    @pl.when(nstep == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gs, gpt = groupsize, groups_per_tile
    wpg = gs * bits // 32
    gb = g_ref[:].astype(jnp.bfloat16)  # (bm, bn) cotangent tile
    acc = acc_ref[:]
    outs = []
    for gr in range(gpt):
        codes = _unpack_rows(qw_ref[gr * wpg:(gr + 1) * wpg, :], bits, gs)
        cf = codes.astype(jnp.float32)
        # wd = (c - z) * s = c*s - (z*s); z_ref holds z*s (see call site)
        wd = (cf * s_ref[gr:gr + 1, :].astype(jnp.float32)
              - z_ref[gr:gr + 1, :].astype(jnp.float32)).astype(jnp.bfloat16)
        outs.append(jax.lax.dot_general(
            gb, wd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))  # (bm, gs)
    acc_ref[:] = acc + jnp.concatenate(outs, axis=1)

    @pl.when(nstep == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bits", "groupsize", "out_dtype",
                                             "interpret", "block_n",
                                             "block_groups"))
def _qmm_t_2d(g, qweight, scales, zeros_scaled, bits: int, groupsize: int,
              out_dtype=jnp.bfloat16, interpret: bool = False,
              block_n: int | None = None, block_groups: int | None = None):
    """dx = g @ dequant(qweight)^T: g (M, N) -> (M, K). M must be 8-aligned."""
    m, n = g.shape
    k = qweight.shape[0] * 32 // bits
    bm, bn, bk, gpt = _select_blocks(m, k, n, groupsize, bits,
                                     block_n=block_n,
                                     block_groups=block_groups)

    grid = (m // bm, k // bk, n // bn)
    kernel = functools.partial(_qmm_t_kernel, bits=bits, groupsize=groupsize,
                               groups_per_tile=gpt, out_dtype=out_dtype)
    flops = 2 * m * n * k
    bytes_accessed = (m * n * 2) * (k // bk) + k * n * bits // 8 + m * k * 2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bn), lambda i, kk, nn: (i, nn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk * bits // 32, bn), lambda i, kk, nn: (kk, nn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpt, bn), lambda i, kk, nn: (kk, nn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpt, bn), lambda i, kk, nn: (kk, nn),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bk), lambda i, kk, nn: (i, kk),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, k), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bk), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(g, qweight, scales, zeros_scaled)


def quant_matmul_t_pallas(g, lin: PackedLinear, interpret: bool = False):
    """Grad-input dx = g @ dequant(lin)^T for g (..., N); output (..., K).

    The TPU equivalent of the reference's transpose_matmul_248_kernel
    (reference: quant/quant_linear.py:192-258). Act-order/K-pad: the kernel
    produces device-row order; the inverse permutation and pad-drop are
    applied here (pad columns are exactly zero: pad codes 0, zeros 0 ->
    wd = 0*1 - 0 = 0)."""
    lead = g.shape[:-1]
    n = lin.out_features
    k, kp = lin.in_features, lin.k_padded
    g2 = g.reshape(-1, n)
    m = g2.shape[0]
    mp = max(8, -(-m // 8) * 8)
    if mp != m:
        g2 = jnp.pad(g2, ((0, mp - m), (0, 0)))
    zs = (lin.zeros.astype(jnp.float32) * lin.scales.astype(jnp.float32))
    from . import autotune
    tuned = autotune.lookup("bwd", lin.k_padded, n, lin.bits,
                            lin.groupsize, mp)
    bg, bn = tuned if tuned is not None else (None, None)
    dx = _qmm_t_2d(g2, lin.qweight, lin.scales, zs.astype(lin.scales.dtype),
                   lin.bits, lin.groupsize, out_dtype=g.dtype,
                   interpret=interpret, block_n=bn, block_groups=bg)
    dx = dx[:m, :k]  # drop M pad + K pad (device order)
    if lin.perm is not None:
        dx = jnp.take(dx, jnp.argsort(lin.perm), axis=-1)
    return dx.reshape(*lead, k)


def quant_matmul_pallas(x, lin: PackedLinear, interpret: bool = False):
    """y = x @ dequant(lin) + bias for x (..., K); output (..., N) in x.dtype."""
    if lin.perm is not None:
        x = jnp.take(x, lin.perm, axis=-1)
    lead = x.shape[:-1]
    k = lin.in_features
    kp = lin.k_padded
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    mp = max(8, -(-m // 8) * 8)  # pad rows to the fp32 sublane tile
    if mp != m or kp != k:
        x2 = jnp.pad(x2, ((0, mp - m), (0, kp - k)))
    # measured-autotune cache (trace-time lookup only; misses fall back to
    # the static heuristic inside _qmm_2d — see ops/pallas/autotune.py)
    from . import autotune
    tuned = autotune.lookup("fwd", kp, lin.out_features, lin.bits,
                            lin.groupsize, mp)
    bg, bn = tuned if tuned is not None else (None, None)
    zs = (lin.zeros.astype(jnp.float32) * lin.scales.astype(jnp.float32))
    y = _qmm_2d(x2, lin.qweight, lin.scales, zs.astype(lin.scales.dtype),
                lin.bits, lin.groupsize, out_dtype=x.dtype, interpret=interpret,
                block_n=bn, block_groups=bg)
    y = y[:m].reshape(*lead, lin.out_features)
    if lin.bias is not None:
        y = y + lin.bias
    return y
