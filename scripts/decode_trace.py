"""Device-trace attribution of the 13B decode step (round-5).

Captures a jax.profiler trace of the production decode scan and aggregates
XLA op durations from the raw xplane.pb (the tensorboard converter in this
image is version-mismatched, so the proto is parsed directly via
tensorflow.tsl.profiler.protobuf.xplane_pb2). Prints the top ops by total
device time — the ground truth for what the 2.6 ms/token cache-write
attribution (decomp2_13b.json) is actually spent on.

Usage: BENCH_MODEL=13b python scripts/decode_trace.py [--variant default|xla]
"""
from __future__ import annotations

import argparse
import collections
import glob
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
    print(f"[tr +{now - _t[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)
    _t[0] = now


def parse_xplane(logdir, steps):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    agg = collections.Counter()
    total_ns = 0
    for p in paths:
        space = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            stats_meta = {k: v.name for k, v in plane.stat_metadata.items()}
            ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                if "XLA Ops" not in line.name and "Steps" not in line.name \
                        and line.name != "XLA Modules":
                    pass
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    if "XLA Ops" in line.name:
                        agg[name] += ev.duration_ps
                        total_ns += ev.duration_ps
    return agg, total_ns


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="default")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.variant == "xla":
        os.environ["GPTQ_TPU_CACHE_IMPL"] = "xla"
        os.environ["GPTQ_TPU_ATTN_IMPL"] = "xla"
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
    runner = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=256,
                         dtype=jnp.bfloat16)
    at.ensure_linears(collect_packed_linears(runner.params), 8)
    at.ensure_mlp_pairs(collect_mlp_pairs(runner.params), 8)
    cache = runner.init_cache()
    logits, cache = runner.forced_decode_scan(jnp.zeros((1, 16), jnp.int32),
                                              cache)
    np.asarray(logits[:1, :1, :1])
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    toks, _ = runner.decode_greedy_scan(tok, cache, args.steps)
    np.asarray(toks)
    stage("decode compiled + warm")

    logdir = f"/tmp/jaxtrace_{args.variant}"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    toks, _ = runner.decode_greedy_scan(tok, cache, args.steps)
    np.asarray(toks)
    jax.profiler.stop_trace()
    stage("trace captured")

    agg, total_ps = parse_xplane(logdir, args.steps)
    per_tok = {}
    print(f"total device time: {total_ps / 1e9:.3f} ms "
          f"({total_ps / 1e9 / args.steps:.3f} ms/token)")
    for name, ps in agg.most_common(args.top):
        us_tok = ps / 1e6 / args.steps
        per_tok[name] = round(us_tok, 2)
        print(f"{us_tok:9.2f} us/tok  {name[:110]}")
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"variant": args.variant, "steps": args.steps,
                       "total_ms_per_token":
                           round(total_ps / 1e9 / args.steps, 3),
                       "top_us_per_token": per_tok}, f, indent=1)


if __name__ == "__main__":
    main()
