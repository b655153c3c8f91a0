"""Isolate the fused attention+cache-write kernel's cost in a scan (round-5).

The in-model bench shows the fused kernel dispatching (zero cache DUS/copies
in the step HLO) yet no speedup over classic attend+DUS. This times the two
forms in a bare scan over carried caches — same shapes as 13B decode — to
separate kernel cost from model-level effects:

  classic   decode_attention(q, ck, cv, off) + 2x dynamic_update_slice
  fused     fused_decode_attention(q, ck, cv, kn, vn, off)

Usage: python scripts/fused_probe.py [--layers 16] [--steps 64]
"""
from __future__ import annotations

import argparse
import json
import os
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
    print(f"[fp +{now - _t[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)
    _t[0] = now


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--h", type=int, default=40)
    ap.add_argument("--s", type=int, default=256)
    ap.add_argument("--out", default="bench_artifacts/r05/fused_probe.json")
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_bench_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    L, steps = args.layers, args.steps
    b, s, h, d = 1, args.s, args.h, 128
    caches = tuple(jnp.zeros((b, s, h, d), jnp.bfloat16) for _ in range(2 * L))
    q = jnp.ones((b, 1, h, d), jnp.bfloat16)
    row = jnp.ones((b, 1, h, d), jnp.bfloat16)
    out = {"device": jax.devices()[0].device_kind,
           "shape": {"layers": L, "s": s, "h": h, "d": d}}

    def run(kind: str):
        def body(carry, _):
            cs, off = carry
            new = []
            acc = 0.0
            for i in range(0, 2 * L, 2):
                if kind == "fused":
                    o, ck2, cv2 = fused_decode_attention(
                        q, cs[i], cs[i + 1], row, row, off, 0.09)
                elif kind == "fold_only":      # fold epilogue, no cache write
                    o, _, _ = fused_decode_attention(
                        q, cs[i], cs[i + 1], row, row, off, 0.09,
                        write=False)
                    ck2, cv2 = cs[i], cs[i + 1]
                elif kind == "attn_only":      # plain kernel, no cache write
                    o = decode_attention(q, cs[i], cs[i + 1], off, 0.09)
                    ck2, cv2 = cs[i], cs[i + 1]
                else:
                    ck2 = jax.lax.dynamic_update_slice(
                        cs[i], row, (0, off, 0, 0))
                    cv2 = jax.lax.dynamic_update_slice(
                        cs[i + 1], row, (0, off, 0, 0))
                    o = decode_attention(q, ck2, cv2, off, 0.09)
                acc = acc + o.sum()
                new += [ck2, cv2]
            return (tuple(new), off + 1), acc

        f = jax.jit(lambda c, o: jax.lax.scan(body, (c, o),
                                              jnp.arange(steps)))
        (c2, _), accs = f(caches, jnp.int32(16))
        np.asarray(accs)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            (c2, _), accs = f(caches, jnp.int32(16))
            np.asarray(accs)
            best = min(best, time.perf_counter() - t0)
        return best / steps * 1e3

    for kind in ("attn_only", "fold_only", "classic", "fused"):
        ms = run(kind)
        out[kind] = {"ms_per_step": round(ms, 3),
                     "us_per_layer": round(ms * 1e3 / L, 2)}
        stage(f"{kind}: {ms:.3f} ms/step ({ms * 1e3 / L:.1f} us/layer)")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
