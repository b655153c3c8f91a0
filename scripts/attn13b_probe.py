"""On-chip decomposition of 13B decode-attention cost (round-4).

The 13B bench sits at 13.83 ms/token vs an 11.83 ms weights roofline; the
decomp harness (scripts/decomp.py) attributed ~2.8 ms to attention but it
drives layers off SLICES of a stacked KV cache (copies before every Pallas
operand) — not what the real runner does (per-layer tuple caches). This
probe measures the REAL runner path three ways:

  default   Pallas decode-attention kernel (ops/pallas/attention.py)
  xla       GPTQ_TPU_ATTN_IMPL=xla fallback (full padded-cache einsum)
  skip      GPTQ_TPU_ATTN_SKIP=1 — attention op removed (output = q);
            the delta vs default IS the in-model attention cost

plus standalone kernel timings (live prefix 16 and 240 of a 256 cache) to
separate fixed per-call overhead from bandwidth.

Usage: python scripts/attn13b_probe.py [--steps 64] [--out PATH]
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
from gptq_for_llama_tpu.ops.pallas.autotune import measure


def stage(msg, _t=[time.perf_counter()]):
    now = time.perf_counter()
    print(f"[probe +{now - _t[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)
    _t[0] = now


def time_span(runner, tok, cache, steps, reps=3):
    toks, _ = runner.decode_greedy_scan(tok, cache, steps)  # compile
    np.asarray(toks)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        toks, _ = runner.decode_greedy_scan(tok, cache, steps)
        np.asarray(toks)
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--out", default="bench_artifacts/r04/attn13b_probe.json")
    ap.add_argument("--skip-model", action="store_true",
                    help="standalone kernel timings only")
    args = ap.parse_args()

    try:  # persistent compile cache (same dir as bench.py)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_bench_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    results = {"device": jax.devices()[0].device_kind}
    stage(f"device: {results['device']}")

    # --- standalone kernel: h=hkv=40 (13B) and 32 (7B) at short/long live ---
    from gptq_for_llama_tpu.ops.pallas.attention import decode_attention

    def dev_normal(seed, shape, dtype, scale=1.0):
        import functools

        @functools.partial(jax.jit,
                           static_argnames=("shape", "dtype", "scale"))
        def gen(key, shape, dtype, scale):
            return (jax.random.normal(key, shape, jnp.float32) * scale
                    ).astype(dtype)
        return gen(jax.random.PRNGKey(seed), shape=shape, dtype=dtype,
                   scale=scale)

    scale = 1.0 / float(np.sqrt(128.0))
    standalone = {}
    for h in (40, 32):
        for off_v in (16, 240):
            q = dev_normal(1, (1, 1, h, 128), jnp.bfloat16)
            kc = dev_normal(2, (1, 256, h, 128), jnp.bfloat16, scale=0.5)
            vc = dev_normal(3, (1, 256, h, 128), jnp.bfloat16, scale=0.5)
            off = jnp.asarray([off_v], jnp.int32)
            t = measure(lambda c, k_, v_, o_: decode_attention(
                c, k_, v_, o_, scale), q, args=(kc, vc, off),
                iters=50, reps=3)

            def xla(c, k_, v_, o_):
                from gptq_for_llama_tpu.models.common import (decode_mask,
                                                              sdpa)
                os.environ["GPTQ_TPU_ATTN_IMPL"] = "xla"
                try:
                    return sdpa(c, k_, v_, decode_mask(1, 256, o_),
                                scale, decode_offset=o_)
                finally:
                    os.environ.pop("GPTQ_TPU_ATTN_IMPL", None)
            t_x = measure(xla, q, args=(kc, vc, off), iters=50, reps=3)
            standalone[f"h{h}_off{off_v}"] = {
                "pallas_us": round(t * 1e6, 1),
                "xla_us": round(t_x * 1e6, 1)}
            stage(f"standalone h={h} off={off_v}: pallas "
                  f"{t * 1e6:.1f} us, xla {t_x * 1e6:.1f} us")
    results["standalone"] = standalone

    if args.skip_model:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(results))
        return

    # --- in-model: the real bench runner, three attention impls -------------
    from gptq_for_llama_tpu.runtime import ModelRunner

    cfg = benchmod.build_cfg(tiny=False)
    params = benchmod.random_packed_llama(cfg, jnp.bfloat16)
    jax.block_until_ready(params["embed_tokens"])
    stage("13B weights on device")

    runner = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=256,
                         dtype=jnp.bfloat16)
    from gptq_for_llama_tpu.ops.pallas import autotune as at
    from gptq_for_llama_tpu.runtime.runner import (collect_mlp_pairs,
                                                   collect_packed_linears)
    at.ensure_linears(collect_packed_linears(runner.params), 8)
    at.ensure_mlp_pairs(collect_mlp_pairs(runner.params), 8)
    stage("autotune ensured")

    cache = runner.init_cache()
    logits, cache = runner.forced_decode_scan(jnp.zeros((1, 16), jnp.int32),
                                              cache)
    np.asarray(logits[:1, :1, :1])
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    stage("cache seeded")

    in_model = {}
    for impl in ("default", "xla", "skip"):
        os.environ.pop("GPTQ_TPU_ATTN_IMPL", None)
        os.environ.pop("GPTQ_TPU_ATTN_SKIP", None)
        if impl == "skip":
            os.environ["GPTQ_TPU_ATTN_SKIP"] = "1"
        elif impl != "default":
            os.environ["GPTQ_TPU_ATTN_IMPL"] = impl
        runner._decode_scan_cache.clear()
        dt = time_span(runner, tok, cache, args.steps)
        in_model[impl] = round(dt * 1e3, 3)
        stage(f"in-model {impl}: {dt * 1e3:.3f} ms/token")
    os.environ.pop("GPTQ_TPU_ATTN_IMPL", None)
    os.environ.pop("GPTQ_TPU_ATTN_SKIP", None)
    results["in_model_ms_per_token"] = in_model
    results["attn_cost_ms"] = {
        "pallas": round(in_model["default"] - in_model["skip"], 3),
        "xla": round(in_model["xla"] - in_model["skip"], 3)}

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
