"""Probe WHY the decode KV-cache write costs ~2.6 ms/token on 13B (round-5).

The decomposition (bench_artifacts/r05/decomp2_13b.json) shows nocache saves
2.6 ms/token — ~32 us per cache buffer per token, which is a full 2.6 MB
buffer copy at ~160 GB/s, not the 10 KB row write it should be. This probe
gets the ground truth two ways:

1. AOT-compiles the production decode step for TPU and counts post-layout
   HLO `copy` instructions whose shape matches the cache buffers (proof of
   whether XLA in-places the dynamic-update-slice into the scan carry).
2. Times a minimal standalone scan — carry = tuple of N cache buffers,
   per-iteration DUS row write + a dot that consumes them — under variants
   (with/without a Pallas consumer between writes) to isolate what defeats
   in-place updates.

Usage: BENCH_MODEL=13b python scripts/cache_probe.py [--out f.json]
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

import bench as benchmod


def stage(msg, _t=[time.perf_counter()]):
    now = time.perf_counter()
    print(f"[cp +{now - _t[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)
    _t[0] = now


def hlo_copy_census(text: str):
    """Count fusion/copy/DUS instructions per shape in optimized HLO."""
    census = collections.Counter()
    for m in re.finditer(r"= (\S+)\[([\d,]*)\][^ ]* (copy|dynamic-update-slice)\(",
                         text):
        census[f"{m.group(3)} {m.group(1)}[{m.group(2)}]"] += 1
    return census


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_artifacts/r05/cache_probe.json")
    ap.add_argument("--skip-hlo", action="store_true")
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_bench_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    out = {"device": jax.devices()[0].device_kind}

    # ---- part 2 first (cheap): standalone carry-write scan variants -------
    L = 16            # cache buffers (fewer than 80: keeps compile fast)
    B, S, H, D = 1, 256, 40, 128
    steps = 64
    caches = tuple(jnp.zeros((B, S, H, D), jnp.bfloat16) for _ in range(2 * L))
    row = jnp.ones((B, 1, H, D), jnp.bfloat16)
    w = jnp.ones((H * D, 8), jnp.bfloat16)

    from gptq_for_llama_tpu.ops.pallas.attention import decode_attention

    def run_variant(consume: str):
        def body(carry, tok):
            caches, off = carry
            new = []
            acc = 0.0
            for i in range(0, 2 * L, 2):
                ck = jax.lax.dynamic_update_slice(
                    caches[i], row, (0, off, 0, 0))
                cv = jax.lax.dynamic_update_slice(
                    caches[i + 1], row, (0, off, 0, 0))
                if consume == "dot":
                    # consume the written row like attention does (reads the
                    # updated buffer) but via plain XLA
                    acc = acc + jnp.dot(
                        jax.lax.dynamic_slice(
                            ck, (0, off, 0, 0), (B, 1, H, D)).reshape(1, -1),
                        w).sum()
                elif consume == "pallas":
                    o = decode_attention(row.astype(jnp.bfloat16), ck, cv,
                                         off, 0.1)
                    acc = acc + o.sum()
                new += [ck, cv]
            return (tuple(new), off + 1), acc

        f = jax.jit(lambda c, o: jax.lax.scan(body, (c, o),
                                              jnp.arange(steps)))
        (c2, _), accs = f(caches, jnp.int32(8))
        np.asarray(accs)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            (c2, _), accs = f(caches, jnp.int32(8))
            np.asarray(accs)
            best = min(best, time.perf_counter() - t0)
        us_per_buf = best / steps / (2 * L) * 1e6
        return round(best / steps * 1e3, 3), round(us_per_buf, 2)

    for variant in ("none", "dot", "pallas"):
        ms, us = run_variant(variant)
        out[f"scan_{variant}"] = {"ms_per_step": ms, "us_per_buffer": us}
        stage(f"standalone scan consume={variant}: {ms} ms/step "
              f"({us} us/buffer)")

    # ---- part 1: production step HLO census -------------------------------
    if not args.skip_hlo:
        from gptq_for_llama_tpu.runtime import ModelRunner
        cfg = benchmod.build_cfg(tiny=False)
        params = benchmod.random_packed_llama(cfg, jnp.bfloat16)
        jax.block_until_ready(params["embed_tokens"])
        stage("weights on device")
        runner = ModelRunner("llama", cfg, params, batch_size=1,
                             max_seq_len=256, dtype=jnp.bfloat16)
        cache = runner.init_cache()
        step = runner._step_fn(1)
        lowered = jax.jit(step).lower(runner._step_params,
                                      jnp.zeros((1, 1), jnp.int32), cache)
        compiled = lowered.compile()
        text = compiled.as_text()
        census = hlo_copy_census(text)
        big = {k: v for k, v in census.items()
               if "256,40,128" in k or "256, 40, 128" in k}
        out["step_hlo_cache_copies"] = big
        out["step_hlo_all_copy_kinds"] = len(census)
        stage(f"HLO census: cache-shaped copy/DUS: {big}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
