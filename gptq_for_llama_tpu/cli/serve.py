"""Serving front door: the continuous-batching engine as a CLI.

Beyond the reference — its inference entry decodes exactly ONE prompt per
process (reference: llama_inference.py:109-128). This subcommand stands up
`runtime.ServingEngine` (slots, decode spans, optional paged KV pool, chunked
prefill, shard_map tensor parallelism) over a packed checkpoint, feeds it a
batch of prompts, streams progress, and reports aggregate throughput.

Usage:
  # real prompts (one per line; tokenizer read from MODEL_DIR)
  python -m gptq_for_llama_tpu serve MODEL_DIR --load PACKED_DIR \
      --prompts prompts.txt --slots 16 --span 8 --paged

  # synthetic smoke/benchmark (no tokenizer needed)
  python -m gptq_for_llama_tpu serve MODEL_DIR --demo 16 --max-new-tokens 32

Output: one JSON line per finished request ({"uid", "prompt_tokens",
"new_tokens", "text"|"tokens"}) then one final stats line ({"requests",
"tokens", "tok_s", ...knobs}).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("gptq_for_llama_tpu serve")
    p.add_argument("model", type=str,
                   help="HF checkpoint directory (tokenizer + config)")
    p.add_argument("--load", type=str, default="",
                   help="packed checkpoint directory (default: MODEL_DIR)")
    # workload
    p.add_argument("--prompts", type=str, default=None,
                   help="text file, one prompt per line")
    p.add_argument("--demo", type=int, default=0,
                   help="serve N synthetic prompts instead of --prompts")
    p.add_argument("--demo-prompt-len", type=int, default=16)
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top_p", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    # engine knobs (see docs/SCALING.md and runtime/serve.py)
    p.add_argument("--slots", type=int, default=8,
                   help="concurrent decode slots (continuous batching)")
    p.add_argument("--span", type=int, default=8,
                   help="decode steps fused per host dispatch")
    p.add_argument("--paged", action="store_true",
                   help="paged KV pool instead of dense per-slot cache")
    p.add_argument("--block-size", type=int, default=16)
    p.add_argument("--num-blocks", type=int, default=None,
                   help="paged pool size (default: slots * max_len / block)")
    p.add_argument("--prefill-chunk", type=int, default=None,
                   help="chunked prefill: one fixed-size prompt chunk per "
                        "engine tick rides along with decode")
    p.add_argument("--buckets", type=str, default="32,128,512",
                   help="prefill length buckets (comma-separated)")
    p.add_argument("--max-seq-len", type=int, default=None)
    p.add_argument("--tp", type=int, default=None,
                   help="shard_map tensor-parallel degree over the device "
                        "mesh (parallel/tp_model fast path)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() before "
                        "backend use (see parallel/distributed.py)")
    p.add_argument("--quiet", action="store_true",
                   help="suppress progress lines on stderr")
    p.add_argument("--kv-dtype", type=str, default=None, dest="kv_dtype",
                   choices=["bf16", "f32", "fp8", "fp8_e5m2"],
                   help="KV STORAGE dtype (fp8 = float8_e4m3fn: 2x tokens "
                        "per pool, half the decode-attention traffic)")
    p.add_argument("--fuse-attn", action="store_true", dest="fuse_attn",
                   help="fuse q/k/v into one packed projection at load "
                        "(the reference's make_quant_attn; incompatible "
                        "with --tp)")
    return p


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.fuse_attn and args.tp and args.tp > 1:
        parser.error("--fuse-attn is incompatible with --tp: shard_map TP "
                     "shards q/k/v separately (TP_RULES)")
    if not args.prompts and not args.demo:
        parser.error("need --prompts FILE or --demo N")
    try:
        buckets = tuple(sorted(int(b) for b in
                               args.buckets.split(",") if b.strip()))
    except ValueError:
        parser.error(f"--buckets must be comma-separated ints, "
                     f"got {args.buckets!r}")
    if not buckets:
        parser.error("--buckets is empty")
    prompt_lines = None
    if args.prompts:  # validate BEFORE the (minutes-long) checkpoint load
        with open(args.prompts) as f:
            prompt_lines = [l.rstrip("\n") for l in f if l.strip()]
        if not prompt_lines:
            parser.error(f"--prompts {args.prompts}: no non-empty lines")
    if args.distributed:
        import os
        from ..parallel.distributed import initialize
        os.environ.setdefault("GPTQ_TPU_DISTRIBUTED", "1")
        initialize()
    import jax.numpy as jnp
    from ..models import hf_loader
    from ..runtime.serve import GenRequest, ServingEngine
    from .main import _kv_dtype

    t0 = time.time()
    model_dir = args.load or args.model
    cfg, params = hf_loader.load_params(model_dir, seqlen=args.max_seq_len,
                                        dtype=jnp.bfloat16)
    log = (lambda *a: None) if args.quiet else \
        (lambda *a: print(*a, file=sys.stderr, flush=True))
    log(f"loaded {cfg.arch} from {model_dir} ({time.time() - t0:.1f}s)")

    # workload
    tokenizer = None
    eos = None
    if args.prompts:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(args.model)
        eos = tokenizer.eos_token_id
        prompts = [np.asarray(tokenizer(l)["input_ids"], np.int32)
                   for l in prompt_lines]
    else:
        rng = np.random.RandomState(args.seed)
        prompts = [rng.randint(1, cfg.vocab_size,
                               size=(args.demo_prompt_len,)).astype(np.int32)
                   for _ in range(args.demo)]

    mesh = None
    if args.tp and args.tp > 1:
        from ..parallel.sharding import make_mesh
        mesh = make_mesh(tp=args.tp, dp=1)
        log(f"shard_map TP over mesh {dict(mesh.shape)}")

    max_len = args.max_seq_len or min(
        cfg.max_seq_len,
        max(len(p) for p in prompts) + args.max_new_tokens + 1)
    engine = ServingEngine(
        cfg.arch, cfg, params, batch_slots=args.slots,
        max_seq_len=max_len, paged=args.paged, block_size=args.block_size,
        num_blocks=args.num_blocks, prefill_chunk=args.prefill_chunk,
        decode_span=args.span,
        prefill_buckets=buckets,
        mesh=mesh, shard_map_tp=mesh is not None, fuse_qkv=args.fuse_attn,
        kv_dtype=_kv_dtype(args.kv_dtype))
    for uid, prompt in enumerate(prompts):
        engine.submit(GenRequest(uid=uid, prompt=prompt,
                                 max_new_tokens=args.max_new_tokens,
                                 temperature=args.temperature,
                                 top_p=args.top_p, eos_token_id=eos))

    t1 = time.time()
    results = engine.run(log=log)
    dt = time.time() - t1

    total = 0
    for uid in sorted(results):
        toks = results[uid]
        total += len(toks)
        rec = {"uid": uid, "prompt_tokens": int(len(prompts[uid])),
               "new_tokens": int(len(toks))}
        if tokenizer is not None:
            rec["text"] = tokenizer.decode(toks)
        else:
            rec["tokens"] = [int(t) for t in toks]
        print(json.dumps(rec), flush=True)
    print(json.dumps({
        "requests": len(results), "tokens": total,
        "tok_s": round(total / max(dt, 1e-9), 2),
        **engine.stats(),
        "slots": args.slots, "span": args.span, "paged": args.paged,
        "prefill_chunk": args.prefill_chunk, "tp": args.tp,
        "max_seq_len": max_len,
    }), flush=True)


if __name__ == "__main__":
    main()
