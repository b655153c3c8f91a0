"""Bisect the S=8192 blocked-flash Mosaic compile crash (round-4).

Compiles each flash variant at increasing sizes, one jit per entry, and
records compile+run success. Data is born on device; only a corner scalar is
read back. Usage: python scripts/flash_probe.py
"""
from __future__ import annotations

import functools
import json
import sys, os, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def stage(msg, _t=[time.perf_counter()]):
    now = time.perf_counter()
    print(f"[probe +{now - _t[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)
    _t[0] = now


def dev_normal(seed, shape, dtype, scale=0.5):
    @functools.partial(jax.jit, static_argnames=("shape", "dtype", "scale"))
    def gen(key, shape, dtype, scale):
        return (jax.random.normal(key, shape, jnp.float32) * scale
                ).astype(dtype)
    return gen(jax.random.PRNGKey(seed), shape=shape, dtype=dtype,
               scale=scale)


def main():
    from gptq_for_llama_tpu.ops.pallas.flash import (flash_prefill,
                                                     flash_prefill_blocked)
    results = {}
    scale = 0.0883883
    h, d = 32, 128

    def probe(name, fn):
        try:
            out = fn()
            np.asarray(out[0, 0, 0, :1])
            results[name] = "ok"
            stage(f"{name}: ok")
        except Exception as e:
            results[name] = f"{type(e).__name__}: {str(e)[:160]}"
            stage(f"{name}: FAIL {results[name]}")

    for s in (2048, 4096, 8192):
        q = dev_normal(1, (1, s, h, d), jnp.bfloat16)
        k = dev_normal(2, (1, s, h, d), jnp.bfloat16)
        v = dev_normal(3, (1, s, h, d), jnp.bfloat16)
        probe(f"blocked_self_{s}",
              lambda: flash_prefill_blocked(q, k, v, jnp.int32(0), scale))
        probe(f"resident_{s}", lambda: flash_prefill(q, k, v, scale))

    for skv in (4096, 8192):
        sq = 512
        q = dev_normal(4, (1, sq, h, d), jnp.bfloat16)
        k = dev_normal(5, (1, skv, h, d), jnp.bfloat16)
        v = dev_normal(6, (1, skv, h, d), jnp.bfloat16)
        probe(f"blocked_cached_{sq}_{skv}",
              lambda: flash_prefill_blocked(q, k, v, jnp.int32(skv - sq - 7),
                                            scale))

    out = "bench_artifacts/r04/flash_probe.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
