"""Micro-benchmark for the fused dequant-matmul kernel on the real TPU.

Times L kernel invocations inside ONE jitted fori_loop (amortizes the
~16-35 ms relay dispatch; a scalar carry dependence defeats CSE/hoisting),
reports effective GB/s against the packed-weight bytes.  Also times a
"stream" kernel with the same grid/BlockSpecs that only reads the qweight
tiles — the pure-DMA ceiling for this tiling, isolating VPU unpack cost.

Usage: python scripts/kbench.py [--iters 50] [--reps 3]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gptq_for_llama_tpu.quant.packing import pack_rows, pack_cols
from gptq_for_llama_tpu.ops.linear import PackedLinear
from gptq_for_llama_tpu.ops.pallas import matmul as pk


def make_lin(k, n, bits=4, groupsize=128, seed=0):
    rng = np.random.default_rng(seed)
    g = k // groupsize
    codes = rng.integers(0, 2 ** bits, size=(k, n), dtype=np.int32)
    scales = (rng.random((g, n), dtype=np.float32) * 0.01 + 0.005).astype(np.float16)
    zeros = np.full((g, n), 2 ** (bits - 1), dtype=np.uint32)
    g_idx = np.repeat(np.arange(g, dtype=np.int32), groupsize)
    qweight = pack_rows(codes, bits)
    qzeros = pack_cols(zeros - 1, bits)
    return PackedLinear.from_wire(qweight, qzeros, scales, g_idx, bits=bits)


def _timed_loop_u(fn, x, iters, reps, unroll):
    """fn chained `unroll` times per fori iteration (scalar carry dependence
    defeats CSE); returns best total seconds for `iters` iterations."""
    def body(i, c):
        for _ in range(unroll):
            y = fn(c)
            c = x + 1e-12 * jnp.sum(y).astype(x.dtype)
        return c

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, iters, body, x)

    r = loop(x)
    np.asarray(r)  # compile + settle
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = loop(x)
        np.asarray(r)
        best = min(best, time.perf_counter() - t0)
    return best


def timed_loop(fn, x, iters, reps, u_lo=1, u_hi=9):
    """Per-call seconds via the slope between two unroll factors — cancels the
    relay's ~1 ms per-iteration floor (see memory: axon relay environment)."""
    t_lo = _timed_loop_u(fn, x, iters, reps, u_lo)
    t_hi = _timed_loop_u(fn, x, iters, reps, u_hi)
    return (t_hi - t_lo) / (iters * (u_hi - u_lo))


def stream_kernel(x_ref, qw_ref, o_ref, acc_ref):
    kstep = pl.program_id(2)

    @pl.when(kstep == 0)
    def _():
        acc_ref[:] = x_ref[:].astype(jnp.int32)
    acc_ref[:] += qw_ref[0:8, 0:128]  # full tile is DMA'd per BlockSpec; touch a corner

    @pl.when(kstep == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def stream_bw(lin, iters, reps, bn=256):
    """Pure qweight stream with the production grid; returns sec/iter."""
    kp, n = lin.k_padded, lin.out_features
    bits, gs = lin.bits, lin.groupsize
    bk, gpt = pk._tile_plan(kp, n, gs, bits)
    grid = (1, n // bn, kp // bk)
    qw = lin.qweight

    def run(x):
        out = pl.pallas_call(
            stream_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((8, 128), lambda i, j, kk: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((bk * bits // 32, bn),
                                   lambda i, j, kk: (kk, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i, j, kk: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x.astype(jnp.bfloat16), qw)
        return x + out.astype(jnp.bfloat16) * 1e-12

    x = jnp.ones((8, 128), jnp.bfloat16)
    return timed_loop(run, x, iters, reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--m", type=int, default=8)
    args = ap.parse_args()

    shapes = [  # 7B decode shapes
        ("qkv", 4096, 12288),
        ("o", 4096, 4096),
        ("gate_up", 4096, 22016),
        ("down", 11008, 4096),
    ]
    print(f"device={jax.devices()[0].device_kind} bits={args.bits} m={args.m}")
    total_t = total_b = 0.0
    for name, k, n in shapes:
        lin = make_lin(k, n, bits=args.bits)
        wbytes = lin.qweight.size * 4 + lin.scales.size * 2 + lin.zeros.size * 2
        x = jnp.ones((args.m, lin.k_padded), jnp.bfloat16)
        fn = lambda xx: pk._qmm_2d(
            xx, lin.qweight, lin.scales,
            (lin.zeros.astype(jnp.float32) * lin.scales.astype(jnp.float32)
             ).astype(lin.scales.dtype), lin.bits, lin.groupsize)
        t = timed_loop(fn, x, args.iters, args.reps)
        ts = stream_bw(lin, args.iters, args.reps)
        total_t += t; total_b += wbytes
        print(f"{name:8s} K={k:6d} N={n:6d}  kernel {t*1e6:8.1f} us "
              f"{wbytes/t/1e9:6.1f} GB/s | stream {ts*1e6:8.1f} us "
              f"{lin.qweight.size*4/ts/1e9:6.1f} GB/s")
    print(f"TOTAL per-layer {total_t*1e3:.3f} ms  -> {total_b/total_t/1e9:.1f} GB/s "
          f"(32 layers = {32*total_t*1e3:.2f} ms/tok)")


if __name__ == "__main__":
    main()
