"""In-model decomposition of the REAL runner's decode step (round-4).

scripts/decomp.py rebuilds the step from parts and (it turned out) slices a
stacked KV cache — inflating the attention attribution ~6x. This probe
decomposes the PRODUCTION ModelRunner.decode_greedy_scan instead, by
monkeypatching one component at a time out of the traced step (patches are
active at trace time; the scan cache is cleared between variants):

  full        production step
  skipattn    GPTQ_TPU_ATTN_SKIP=1 (attention op removed)
  norope      apply_rope -> identity
  nonorms     rms_norm -> identity
  nocache     update_kv_cache -> no write (attention reads stale cache)
  floor       all of the above off: packed GEMMs + head + embed + argmax
              + scan overhead only

Deltas vs `full` attribute per-component cost; `floor` minus the kbench m=1
GEMM sum isolates scan/glue overhead the kernels cannot see.

Usage: BENCH_MODEL=13b python scripts/attn13b_probe2.py [--steps 64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_MODEL", "13b")

import jax
import jax.numpy as jnp

import bench as benchmod


def stage(msg, _t=[time.perf_counter()]):
    now = time.perf_counter()
    print(f"[probe2 +{now - _t[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)
    _t[0] = now


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--out", default="bench_artifacts/r04/decomp2.json")
    ap.add_argument("--variants",
                    default="full,skipattn,norope,nonorms,nocache,floor")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_bench_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from gptq_for_llama_tpu.models import common, llama
    from gptq_for_llama_tpu.runtime import ModelRunner
    from gptq_for_llama_tpu.ops.pallas import autotune as at
    from gptq_for_llama_tpu.runtime.runner import (collect_mlp_pairs,
                                                   collect_packed_linears)

    cfg = benchmod.build_cfg(tiny=False)
    params = benchmod.random_packed_llama(cfg, jnp.bfloat16)
    jax.block_until_ready(params["embed_tokens"])
    stage("weights on device")

    runner = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=256,
                         dtype=jnp.bfloat16)
    at.ensure_linears(collect_packed_linears(runner.params), 8)
    at.ensure_mlp_pairs(collect_mlp_pairs(runner.params), 8)
    cache = runner.init_cache()
    logits, cache = runner.forced_decode_scan(jnp.zeros((1, 16), jnp.int32),
                                              cache)
    np.asarray(logits[:1, :1, :1])
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    stage("cache seeded")

    orig = {"rope": llama.apply_rope, "norm": llama.rms_norm,
            "upd": common.update_kv_cache}
    rope_id = lambda q, k, cos, sin, rotary_dim=None: (q, k)
    norm_id = lambda x, w, eps: x
    upd_id = lambda ck, cv, k, v, off, write_mask=None: (ck, cv)

    PATCHES = {
        "full": {},
        "skipattn": {"env": "skip"},
        "norope": {"rope": rope_id},
        "nonorms": {"norm": norm_id},
        "nocache": {"upd": upd_id},
        "floor": {"env": "skip", "rope": rope_id, "norm": norm_id,
                  "upd": upd_id},
    }

    results = {}
    for name in args.variants.split(","):
        p = PATCHES[name]
        if p.get("env") == "skip":
            os.environ["GPTQ_TPU_ATTN_SKIP"] = "1"
        else:
            os.environ.pop("GPTQ_TPU_ATTN_SKIP", None)
        llama.apply_rope = p.get("rope", orig["rope"])
        llama.rms_norm = p.get("norm", orig["norm"])
        common.update_kv_cache = p.get("upd", orig["upd"])
        runner._decode_scan_cache.clear()
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
        delta = (f"  (full - this = {results['full'] - ms:+.3f} ms)"
                 if name != "full" and "full" in results else "")
        stage(f"{name:9s} {ms:7.3f} ms/token{delta}")

    llama.apply_rope, llama.rms_norm = orig["rope"], orig["norm"]
    common.update_kv_cache = orig["upd"]
    os.environ.pop("GPTQ_TPU_ATTN_SKIP", None)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"model": os.environ.get("BENCH_MODEL", "7b"),
                   "ms_per_token": results}, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
