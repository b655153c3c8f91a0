"""Slope-timed marginal cost of the decode cache-write candidates (round-5).

Scan-based probes are drowned by the relay's ~0.4 ms per-iteration floor, so
this times each form with the autotune slope method (u=5 vs u=1 chained calls
inside fori_loop — the floor cancels):

  dus        lax.dynamic_update_slice K+V pair into a carried cache
  attn       decode_attention (classic kernel, cache read-only)
  fold       fused_decode_attention(write=False): stale prefix + register fold
  fused      fused_decode_attention(write=True): fold + in-place slab write

Also greps the fori_loop HLO for cache-shaped copies per variant — the
while-body context is exactly where the scan program grew 80 copies.

Usage: python scripts/fused_slope.py [--h 40] [--s 256]
"""
from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gptq_for_llama_tpu.ops.pallas.attention import (decode_attention,
                                                     fused_decode_attention)


def stage(msg, _t=[time.perf_counter()]):
    now = time.perf_counter()
    print(f"[fs +{now - _t[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)
    _t[0] = now


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=40)
    ap.add_argument("--s", type=int, default=256)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--out", default="bench_artifacts/r05/fused_slope.json")
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_bench_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    b, s, h, d = 1, args.s, args.h, 128
    ck = jnp.zeros((b, s, h, d), jnp.bfloat16)
    cv = jnp.zeros((b, s, h, d), jnp.bfloat16)
    q = jnp.ones((b, 1, h, d), jnp.bfloat16)
    row = jnp.ones((b, 1, h, d), jnp.bfloat16)
    off = jnp.int32(40)
    out = {"device": jax.devices()[0].device_kind,
           "shape": {"s": s, "h": h, "d": d, "off": 40}}

    # each variant: c -> c' chained through the K cache so the loop cannot
    # be collapsed; the V cache rides as a loop-invariant arg
    def make(kind):
        if kind == "dus":
            def f(c, cvv):
                c2 = jax.lax.dynamic_update_slice(c, row, (0, off, 0, 0))
                cv2 = jax.lax.dynamic_update_slice(cvv, row, (0, off, 0, 0))
                return c2 + 0.0 * jnp.sum(cv2).astype(c2.dtype)
        elif kind == "attn":
            def f(c, cvv):
                o = decode_attention(q, c, cvv, off, 0.09)
                return c + 1e-12 * jnp.sum(o).astype(c.dtype)
        elif kind == "fold":
            def f(c, cvv):
                o, _, _ = fused_decode_attention(q, c, cvv, row, row, off,
                                                 0.09, write=False)
                return c + 1e-12 * jnp.sum(o).astype(c.dtype)
        else:  # fused
            def f(c, cvv):
                o, c2, _ = fused_decode_attention(q, c, cvv, row, row, off,
                                                  0.09)
                return c2 + 1e-12 * jnp.sum(o).astype(c2.dtype)
        return f

    def timed(kind, unroll):
        f = make(kind)

        @jax.jit
        def loop(c0, cvv):
            def body(i, c):
                for _ in range(unroll):
                    c = f(c, cvv)
                return c
            return jax.lax.fori_loop(0, args.iters, body, c0)

        text = jax.jit(loop).lower(ck, cv).compile().as_text()
        census = collections.Counter()
        for m in re.finditer(r"= (\S+?)\[([\d,]*)\][^ ]* copy\(", text):
            if f"{s},{h},{d}" in m.group(2):
                census["copy"] += 1
        np.asarray(loop(ck, cv))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(ck, cv))
            best = min(best, time.perf_counter() - t0)
        return best, dict(census)

    for kind in ("dus", "attn", "fold", "fused"):
        t1, c1 = timed(kind, 1)
        t5, c5 = timed(kind, 5)
        slope_us = (t5 - t1) / (args.iters * 4) * 1e6
        out[kind] = {"us_per_call": round(slope_us, 2),
                     "hlo_cache_copies_u1": c1, "u5": c5}
        stage(f"{kind:6s} {slope_us:7.2f} us/call  copies u1={c1} u5={c5}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
