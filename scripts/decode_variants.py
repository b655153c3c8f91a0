"""Time production decode under dispatch variants, one process, shared weights.

Round-5 diagnostic: the r05 7B capture read 6.84 ms/token where r03 recorded
6.41 on the same shapes — this probe isolates whether the delta is attention
dispatch (the round-5 gate fixes moved short-context decode onto the Pallas
kernel), token-scan unroll depth, or relay-day variance, by timing the REAL
ModelRunner.decode_greedy_scan under each setting with the weights built once.

Usage: BENCH_MODEL=13b python scripts/decode_variants.py \
           [--steps 64] [--variants default,xla,unroll16] [--out f.json]
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

import bench as benchmod


def stage(msg, _t=[time.perf_counter()]):
    now = time.perf_counter()
    print(f"[var +{now - _t[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)
    _t[0] = now


# variant -> env overrides applied at TRACE time (scan cache cleared between)
VARIANTS = {
    "default": {},
    "xla": {"GPTQ_TPU_ATTN_IMPL": "xla"},
    "pallas": {"GPTQ_TPU_ATTN_IMPL": "pallas"},
    "unroll4": {"GPTQ_TPU_TOKEN_UNROLL": "4"},
    "unroll16": {"GPTQ_TPU_TOKEN_UNROLL": "16"},
    "unroll32": {"GPTQ_TPU_TOKEN_UNROLL": "32"},
    "xla_unroll16": {"GPTQ_TPU_ATTN_IMPL": "xla",
                     "GPTQ_TPU_TOKEN_UNROLL": "16"},
    # in-model config sweep for 13B down_proj (trace_13b_default.json found
    # the standalone-raced (16,128) costing 107.6 us/call in-model vs 58.5
    # standalone — small n-blocks lose DMA overlap next to their neighbors)
    "down_8_1024": {"GPTQ_TPU_TUNE_OVERRIDE": "fwd:K14336:N5120=8,1024"},
    "down_16_512": {"GPTQ_TPU_TUNE_OVERRIDE": "fwd:K14336:N5120=16,512"},
    "down_8_512": {"GPTQ_TPU_TUNE_OVERRIDE": "fwd:K14336:N5120=8,512"},
    "down_16_256": {"GPTQ_TPU_TUNE_OVERRIDE": "fwd:K14336:N5120=16,256"},
    # 13B fused-MLP tiling sweep (non-pow2 bn now enumerated)
    "mlp_8_768": {"GPTQ_TPU_TUNE_OVERRIDE": "mlp:K5120:N13824=8,768"},
    "mlp_8_1152": {"GPTQ_TPU_TUNE_OVERRIDE": "mlp:K5120:N13824=8,1152"},
    "mlp_8_1536": {"GPTQ_TPU_TUNE_OVERRIDE": "mlp:K5120:N13824=8,1536"},
    "mlp_8_2304": {"GPTQ_TPU_TUNE_OVERRIDE": "mlp:K5120:N13824=8,2304"},
    # attention/cache path comparison at the fixed down config
    "d8k_fold": {"GPTQ_TPU_TUNE_OVERRIDE": "fwd:K14336:N5120=8,1024"},
    "d8k_classic": {"GPTQ_TPU_TUNE_OVERRIDE": "fwd:K14336:N5120=8,1024",
                    "GPTQ_TPU_CACHE_IMPL": "xla"},
    "d8k_xla": {"GPTQ_TPU_TUNE_OVERRIDE": "fwd:K14336:N5120=8,1024",
                "GPTQ_TPU_ATTN_IMPL": "xla"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--variants", default="default,xla,unroll16")
    ap.add_argument("--out", default="bench_artifacts/r05/decode_variants.json")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_bench_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from gptq_for_llama_tpu.ops.pallas import autotune as at
    from gptq_for_llama_tpu.runtime import ModelRunner
    from gptq_for_llama_tpu.runtime.runner import (collect_mlp_pairs,
                                                   collect_packed_linears)

    cfg = benchmod.build_cfg(tiny=False)
    params = benchmod.random_packed_llama(cfg, jnp.bfloat16)
    jax.block_until_ready(params["embed_tokens"])
    stage("weights on device")

    results = {}
    touched = set()
    for name in args.variants.split(","):
        fuse = name.endswith("+fuse")
        env = VARIANTS[name[:-5] if fuse else name]
        for k in touched:
            os.environ.pop(k, None)
        touched = set(env)
        os.environ.update(env)
        runner = ModelRunner("llama", cfg, params, batch_size=1,
                             max_seq_len=256, dtype=jnp.bfloat16,
                             fuse_qkv=fuse)
        at.ensure_linears(collect_packed_linears(runner.params), 8)
        at.ensure_mlp_pairs(collect_mlp_pairs(runner.params), 8)
        cache = runner.init_cache()
        logits, cache = runner.forced_decode_scan(
            jnp.zeros((1, 16), jnp.int32), cache)
        np.asarray(logits[:1, :1, :1])
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        toks, _ = runner.decode_greedy_scan(tok, cache, args.steps)  # compile
        np.asarray(toks)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            toks, _ = runner.decode_greedy_scan(tok, cache, args.steps)
            np.asarray(toks)
            best = min(best, time.perf_counter() - t0)
        ms = best / args.steps * 1e3
        results[name] = round(ms, 3)
        stage(f"{name:14s} {ms:7.3f} ms/token")
    for k in touched:
        os.environ.pop(k, None)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"model": os.environ.get("BENCH_MODEL", "7b"),
                   "steps": args.steps, "ms_per_token": results}, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
