"""Serving throughput benchmark: 7B INT4-g128, continuous batching on TPU.

Aggregate decode tok/s across 8 slots, with and without multi-step spans
(decode_span amortizes the relay's ~20-30 ms per-host-step dispatch).

Usage: python scripts/serve_bench.py [--slots 8] [--span 8] [--reqs 16]
"""
from __future__ import annotations

import argparse
import sys, os, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import bench as benchmod
from gptq_for_llama_tpu.runtime.serve import GenRequest, ServingEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--span", type=int, default=8)
    ap.add_argument("--reqs", type=int, default=16)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--prompt-len", type=int, default=16)
    ap.add_argument("--max-len", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=0,
                    help="prefill_chunk size (0 = bucketed whole-prompt)")
    args = ap.parse_args()

    def stage(msg, _t=[time.perf_counter()]):
        now = time.perf_counter()
        print(f"[serve +{now - _t[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)
        _t[0] = now

    cfg = benchmod.build_cfg(tiny=False)
    params = benchmod.random_packed_llama(cfg, jnp.bfloat16)
    stage("weights built")

    rng = np.random.default_rng(0)

    def requests(n):
        return [GenRequest(
            uid=uid,
            prompt=rng.integers(1, cfg.vocab_size,
                                size=(args.prompt_len,)).astype(np.int32),
            max_new_tokens=args.max_new, temperature=0.0)
            for uid in range(n)]

    for span in (1, args.span):
        kw = dict(prefill_chunk=args.chunk) if args.chunk else {}
        engine = ServingEngine("llama", cfg, params, batch_slots=args.slots,
                               max_seq_len=args.max_len,
                               prefill_buckets=(args.prompt_len,),
                               decode_span=span, **kw)
        for r in requests(args.slots):  # warmup: compile prefill+decode(+span)
            engine.submit(r)
        engine.run()
        stage(f"span={span}: warmed up (compiles done)")
        for r in requests(args.reqs):
            engine.submit(r)
        t0 = time.perf_counter()
        results = engine.run()
        dt = time.perf_counter() - t0
        total = sum(len(v) for v in results.values())
        stage(f"span={span}: {total} tokens in {dt:.1f}s = "
              f"{total / dt:.1f} tok/s aggregate "
              f"({args.slots} slots, incl. prefills)")


if __name__ == "__main__":
    main()
