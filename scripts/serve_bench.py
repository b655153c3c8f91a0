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

import jax

try:  # persistent compile cache: grid reruns skip each engine's big compiles
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

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
    ap.add_argument("--grid", default="",
                    help="slots:span:paged:kv rows, ';'-separated "
                         "(e.g. '8:1:0:bf16;24:32:1:fp8') — overrides "
                         "--slots/--span; one engine per row")
    ap.add_argument("--json", default="",
                    help="write aggregate rows to this JSON artifact")
    args = ap.parse_args()

    def stage(msg, _t=[time.perf_counter()]):
        now = time.perf_counter()
        print(f"[serve +{now - _t[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)
        _t[0] = now

    cfg = benchmod.build_cfg(tiny=False)
    params = benchmod.random_packed_llama(cfg, jnp.bfloat16)
    stage("weights built")

    rng = np.random.default_rng(0)

    def requests(n, plen):
        return [GenRequest(
            uid=uid,
            prompt=rng.integers(1, cfg.vocab_size,
                                size=(plen,)).astype(np.int32),
            max_new_tokens=args.max_new, temperature=0.0)
            for uid in range(n)]

    if args.grid:
        grid = []
        for row in args.grid.split(";"):
            f = row.split(":")
            slots, span, paged, kv = int(f[0]), int(f[1]), f[2] == "1", f[3]
            # optional realistic-workload fields: prompt_len and
            # prefill_chunk per row (round-5: TTFT under long prompts)
            plen = int(f[4]) if len(f) > 4 else args.prompt_len
            chunk = int(f[5]) if len(f) > 5 else args.chunk
            grid.append((slots, span, paged, kv, plen, chunk))
    else:
        grid = [(args.slots, s, False, "bf16", args.prompt_len, args.chunk)
                for s in (1, args.span)]

    rows = []
    for slots, span, paged, kv, plen, chunk in grid:
        kw = dict(prefill_chunk=chunk) if chunk else {}
        if paged:
            kw.update(paged=True, block_size=16)
        if kv == "fp8":
            kw.update(kv_dtype=jnp.float8_e4m3fn)
        max_len = max(args.max_len, -(-(plen + args.max_new + 32) // 128) * 128)
        engine = ServingEngine("llama", cfg, params, batch_slots=slots,
                               max_seq_len=max_len,
                               prefill_buckets=(plen,),
                               decode_span=span, **kw)
        for r in requests(slots, plen):  # warmup: compile prefill+decode(+span)
            engine.submit(r)
        engine.run()
        engine._meta.clear()  # warmup requests must not skew TTFT stats
        stage(f"slots={slots} span={span} paged={paged} kv={kv} plen={plen} "
              f"chunk={chunk}: warmed up (max_len {max_len})")
        nreq = max(args.reqs, 2 * slots)
        for r in requests(nreq, plen):
            engine.submit(r)
        t0 = time.perf_counter()
        results = engine.run()
        dt = time.perf_counter() - t0
        total = sum(len(v) for v in results.values())
        row = {"slots": slots, "span": span, "paged": paged, "kv": kv,
               "reqs": nreq, "max_new": args.max_new,
               "prompt_len": plen, "prefill_chunk": chunk,
               "max_len": max_len,
               "tokens": total, "seconds": round(dt, 2),
               "tok_per_s": round(total / dt, 1)}
        row.update(engine.stats())  # ttft/latency p50/p95 over timed reqs
        rows.append(row)
        if args.json:  # write incrementally: a timeout must not lose rows
            import json as _json
            os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
            with open(args.json, "w") as f:
                _json.dump({"note": "aggregate generated tok/s incl. "
                            "prefill work, greedy, 7B INT4-g128 "
                            "random-packed weights", "rows": rows}, f,
                           indent=1)
        stage(f"slots={slots} span={span} paged={paged} kv={kv} plen={plen}: "
              f"{total} tokens in {dt:.1f}s = {total / dt:.1f} tok/s "
              f"aggregate, ttft p50={row.get('ttft_p50_s')}s "
              f"p95={row.get('ttft_p95_s')}s")
        del engine

    if args.json:
        import json as _json
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            _json.dump({"note": "aggregate generated tok/s incl. prefill "
                        "work, greedy, 7B INT4-g128 random-packed weights",
                        "rows": rows}, f, indent=1)
        print(_json.dumps({"rows": len(rows), "out": args.json}))


if __name__ == "__main__":
    main()
