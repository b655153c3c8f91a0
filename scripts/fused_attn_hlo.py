"""Census of cache-shaped copies in the compiled 13B decode step (round-5).

Ground truth for whether the fused attention+cache-write kernel's
input_output_aliases survive into the optimized program: counts `copy` /
`dynamic-update-slice` instructions on the (1, 256, 40, 128) cache shape.
With working aliasing there should be ZERO of either (the classic path shows
80 DUS; a defensive-copy regression shows 80 copies).

Usage: BENCH_MODEL=13b python scripts/fused_attn_hlo.py
"""
from __future__ import annotations

import collections
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench as benchmod


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_bench_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    from gptq_for_llama_tpu.runtime import ModelRunner
    cfg = benchmod.build_cfg(tiny=False)
    params = benchmod.random_packed_llama(cfg, jnp.bfloat16)
    jax.block_until_ready(params["embed_tokens"])
    runner = ModelRunner("llama", cfg, params, batch_size=1,
                         max_seq_len=256, dtype=jnp.bfloat16)
    cache = runner.init_cache()

    def census_of(text, label):
        census = collections.Counter()
        for m in re.finditer(
                r"= (\S+?)\[([\d,]*)\][^ ]* (copy|dynamic-update-slice)\(",
                text):
            if "256,40,128" in m.group(2):
                census[f"{m.group(3)} {m.group(1)}[{m.group(2)}]"] += 1
        print(label, json.dumps(dict(census), indent=1))

    step = runner._step_fn(1)
    t0 = time.perf_counter()
    compiled = jax.jit(step).lower(runner._step_params,
                                   jnp.zeros((1, 1), jnp.int32),
                                   cache).compile()
    print(f"step compiled in {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)
    census_of(compiled.as_text(), "single-step:")

    # the PRODUCTION program: decode_greedy_scan's jitted scan (token
    # unroll inside lax.scan) — while-loop buffer reuse is where in-place
    # aliasing can silently fail even when the step program is clean
    try:
        runner.decode_greedy_scan(jnp.zeros((1, 1), jnp.int32), cache, 0)
    except Exception:
        pass  # only needed to populate the jitted-run cache for steps=64
    if 64 not in runner._decode_scan_cache:
        # build the jitted run WITHOUT executing: reproduce runner wiring
        step1 = runner._step_fn(1)

        @jax.jit
        def run64(sp, tok0, c):
            def body(carry, _):
                tok, c = carry
                logits, c = step1(sp, tok, c)
                nxt = jnp.argmax(logits[:, -1].astype(jnp.float32),
                                 axis=-1).astype(jnp.int32)[:, None]
                return (nxt, c), nxt[:, 0]
            (_, c), toks = jax.lax.scan(body, (tok0, c), None, length=64,
                                        unroll=runner._token_unroll)
            return jnp.swapaxes(toks, 0, 1), c

        runner._decode_scan_cache[64] = run64
    run = runner._decode_scan_cache[64]
    t0 = time.perf_counter()
    compiled2 = run.lower(runner._step_params,
                          jnp.zeros((1, 1), jnp.int32), cache).compile()
    print(f"scan compiled in {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)
    census_of(compiled2.as_text(), "decode-scan:")


if __name__ == "__main__":
    main()
