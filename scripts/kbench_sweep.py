"""Block-size sweep for the fused dequant-matmul kernel (see kbench.py).

Hypothesis under test: at decode (m=8) the kernel is per-grid-step overhead
bound (~300 ns/step), so fewer/bigger tiles should approach the HBM roofline.
"""
from __future__ import annotations

import argparse
import sys, os, time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.kbench import make_lin, timed_loop
from gptq_for_llama_tpu.ops.pallas import matmul as pk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--shapes", default="qkv,down")
    args = ap.parse_args()

    all_shapes = {"qkv": (4096, 12288), "o": (4096, 4096),
                  "gate_up": (4096, 22016), "down": (11008, 4096)}
    configs = [(None, None), (512, 8), (1024, 8), (512, 16), (1024, 16),
               (512, 32), (2048, 8)]
    print(f"device={jax.devices()[0].device_kind} bits={args.bits} m={args.m}")
    for name in args.shapes.split(","):
        k, n = all_shapes[name]
        lin = make_lin(k, n, bits=args.bits)
        wbytes = lin.qweight.size * 4 + lin.scales.size * 2 + lin.zeros.size * 2
        x = jnp.ones((args.m, lin.k_padded), jnp.bfloat16)
        zs = (lin.zeros.astype(jnp.float32) * lin.scales.astype(jnp.float32)
              ).astype(lin.scales.dtype)
        for bn, bg in configs:
            g = lin.k_padded // lin.groupsize
            if bg is not None and (g % bg != 0 or (bg % 8 != 0 and bg != g)):
                continue
            fn = lambda xx: pk._qmm_2d(xx, lin.qweight, lin.scales, zs,
                                       lin.bits, lin.groupsize,
                                       block_n=bn, block_groups=bg)
            try:
                t = timed_loop(fn, x, args.iters, args.reps)
            except Exception as e:
                print(f"{name:8s} bn={bn} bg={bg}: FAIL {type(e).__name__}")
                continue
            steps = (n // min(bn or 256, n)) * (k // ((bg or 8) * lin.groupsize))
            print(f"{name:8s} bn={str(bn):>5s} bg={str(bg):>4s}  "
                  f"{t*1e6:8.1f} us  {wbytes/t/1e9:6.1f} GB/s  "
                  f"({steps} grid steps, {t/steps*1e9:5.0f} ns/step)")


if __name__ == "__main__":
    main()
