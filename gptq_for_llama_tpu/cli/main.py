"""Command-line entry point: quantize / eval / benchmark / generate.

One arch-generic CLI replacing the reference's three per-arch scripts
(reference: llama.py:441-542, opt.py:346-446, neox.py:330-430 — the arch is
read from the checkpoint's config.json instead of being baked into the script).
Flag names match the reference's argparse surface.

Usage:
  python -m gptq_for_llama_tpu MODEL_DIR DATASET --wbits 4 --groupsize 128 \
      --true-sequential --act-order --save out_dir [--eval]
  python -m gptq_for_llama_tpu MODEL_DIR DATASET --load packed_dir --eval
  python -m gptq_for_llama_tpu MODEL_DIR DATASET --load packed_dir \
      --benchmark 2048 --check
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("gptq_for_llama_tpu")
    p.add_argument("model", type=str,
                   help="HF checkpoint directory (fp16/fp32 or packed)")
    p.add_argument("dataset", type=str, nargs="?", default="wikitext2",
                   choices=["wikitext2", "ptb", "c4", "ptb-new", "c4-new",
                            "synthetic"],
                   help="calibration/eval dataset (reference llama.py:446-448)")
    # quantization (reference llama.py:449-470)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--nsamples", type=int, default=128)
    p.add_argument("--percdamp", type=float, default=0.01)
    p.add_argument("--nearest", action="store_true", help="RTN baseline")
    p.add_argument("--wbits", type=int, default=16,
                   choices=[2, 3, 4, 8, 16])
    p.add_argument("--trits", action="store_true")
    p.add_argument("--groupsize", type=int, default=-1)
    p.add_argument("--sym", action="store_true")
    p.add_argument("--act-order", action="store_true")
    p.add_argument("--true-sequential", action="store_true")
    p.add_argument("--observe", action="store_true")
    p.add_argument("--quantize-lm-head", action="store_true",
                   help="GPTQ the output head too (beyond the reference)")
    p.add_argument("--mse", action="store_true")
    p.add_argument("--chunk", type=int, default=16,
                   help="calibration microbatch (TPU memory knob)")
    # eval / io
    p.add_argument("--eval", action="store_true")
    p.add_argument("--new-eval", action="store_true")
    p.add_argument("--save", "--save_safetensors", dest="save", type=str,
                   default="",
                   help="directory to save the packed checkpoint "
                        "(safetensors; --save_safetensors is the "
                        "reference-compatible alias)")
    p.add_argument("--load", type=str, default="",
                   help="packed checkpoint directory to load")
    p.add_argument("--quant-directory", type=str, default=None,
                   help="export toml+npy quant table here")
    p.add_argument("--resume-dir", type=str, default=None,
                   help="mid-quantization checkpoint dir (resume on re-run)")
    p.add_argument("--seqlen", type=int, default=None)
    # runtime
    p.add_argument("--benchmark", type=int, default=0,
                   help="decode-benchmark over N tokens")
    p.add_argument("--check", action="store_true",
                   help="PPL check during benchmark")
    p.add_argument("--test-generation", action="store_true")
    p.add_argument("--text", type=str, default="the quick brown fox")
    p.add_argument("--max-new-tokens", type=int, default=50)
    p.add_argument("--min-new-tokens", type=int, default=0)
    p.add_argument("--top_p", type=float, default=0.95)
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--tp", type=int, default=None,
                   help="tensor-parallel degree (default: all devices)")
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel devices for the quantize phase: the "
                        "calibration batch is sharded over dp and the "
                        "Hessians all-reduced by XLA (engine/quantize "
                        "mesh mode)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() before "
                        "backend use (auto-detect on TPU pods, or "
                        "GPTQ_TPU_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID; "
                        "see parallel/distributed.py for the launch recipe)")
    p.add_argument("--fuse-attn", action="store_true", dest="fuse_attn",
                   help="fuse q/k/v into one packed projection at load "
                        "(the reference's make_quant_attn)")
    p.add_argument("--pre-layer", type=int, default=None, dest="pre_layer",
                   help="keep only the first N layers device-resident and "
                        "stream the rest from host memory (the reference's "
                        "CPU-offload --pre_layer, llama_inference_offload.py)")
    p.add_argument("--kv-dtype", type=str, default=None, dest="kv_dtype",
                   choices=["bf16", "f32", "fp8", "fp8_e5m2"],
                   help="KV-cache STORAGE dtype (fp8 = float8_e4m3fn: half "
                        "the cache memory and decode-attention traffic; "
                        "compute stays bf16)")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="capture a jax.profiler device trace of the "
                        "benchmark/eval into this directory")
    return p


def _kv_dtype(name):
    if name is None:
        return None
    import jax.numpy as jnp
    return {"bf16": jnp.bfloat16, "f32": jnp.float32,
            "fp8": jnp.float8_e4m3fn, "fp8_e5m2": jnp.float8_e5m2}[name]


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    tp_on = bool(args.tp and args.tp > 1)  # --tp 1 never builds a mesh
    if args.fuse_attn and tp_on:
        parser.error("--fuse-attn is incompatible with --tp: shard_map TP "
                     "shards q/k/v separately (TP_RULES)")
    if args.pre_layer is not None and (tp_on or args.fuse_attn):
        parser.error("--pre-layer (offloaded generation) supports neither "
                     "--tp nor --fuse-attn")
    if args.distributed:
        from ..parallel.distributed import initialize
        os.environ.setdefault("GPTQ_TPU_DISTRIBUTED", "1")
        initialize()
    import contextlib
    import jax.numpy as jnp
    from ..data import get_loaders
    from ..engine import (QuantizeSpec, export_quant_table, pack_model,
                          perplexity, quantize_model, save_packed)
    from ..models import hf_loader
    from ..utils.profiling import PhaseTimer, device_trace

    timer = PhaseTimer()
    trace = (lambda: device_trace(args.profile_dir)) if args.profile_dir \
        else contextlib.nullcontext

    t0 = time.time()
    model_dir = args.load or args.model
    with timer.phase("load"):
        cfg, params = hf_loader.load_params(model_dir, seqlen=args.seqlen,
                                            dtype=jnp.bfloat16)
    seqlen = args.seqlen or cfg.max_seq_len
    print(f"loaded {cfg.arch} from {model_dir} ({time.time() - t0:.1f}s)")

    quantizers = {}
    spec = QuantizeSpec(
        wbits=args.wbits, groupsize=args.groupsize, sym=args.sym,
        trits=args.trits, mse=args.mse, percdamp=args.percdamp,
        act_order=args.act_order, true_sequential=args.true_sequential,
        nearest=args.nearest, observe=args.observe, chunk=args.chunk,
        quantize_lm_head=args.quantize_lm_head)

    if not args.load and (args.wbits < 16 or args.nearest):
        train, _ = get_loaders(args.dataset, nsamples=args.nsamples,
                               seed=args.seed, seqlen=seqlen,
                               model=args.model if args.dataset != "synthetic" else cfg)
        tq = time.time()
        qmesh = None
        if args.dp and args.dp > 1:
            from ..parallel.sharding import make_mesh
            qmesh = make_mesh(tp=1, dp=args.dp)
            print(f"dp-calibration over mesh {dict(qmesh.shape)}")
        with timer.phase("quantize"):
            params, quantizers, _ = quantize_model(
                cfg.arch, cfg, params, train, spec,
                resume_dir=args.resume_dir, mesh=qmesh)
        print(f"quantized in {time.time() - tq:.1f}s")

    if args.quant_directory:
        if quantizers:
            export_quant_table(quantizers, args.quant_directory)
            print(f"quant table exported to {args.quant_directory}")
        else:
            print("WARNING: --quant-directory ignored — no quantization ran "
                  "this invocation (quant params are not recoverable from a "
                  "packed checkpoint alone)")

    if args.save:
        if quantizers:
            with timer.phase("pack+save"):
                params = pack_model(cfg.arch, cfg, params, quantizers)
                save_packed(args.save, cfg.arch, cfg, params, quantizers, spec)
            print(f"packed checkpoint saved to {args.save}")
        elif args.load:
            # re-export a LOADED packed checkpoint: to_wire round trips are
            # byte-exact, so this is a faithful copy/convert path. The
            # original quantize_config (not this invocation's flags)
            # describes the buffers — carry it over verbatim.
            import shutil
            with timer.phase("pack+save"):
                save_packed(args.save, cfg.arch, cfg, params, None, None)
                src_qc = os.path.join(args.load, "quantize_config.json")
                if os.path.exists(src_qc):
                    shutil.copy(src_qc, os.path.join(
                        args.save, "quantize_config.json"))
            print(f"packed checkpoint re-exported to {args.save}")
        else:
            print("WARNING: --save ignored — nothing was quantized "
                  "(use --wbits < 16, --nearest, or --load)")

    # --tp: eval (prefill-shaped) runs on jit-sharded params; the decode paths
    # (benchmark / generation) use the shard_map whole-step TP runner so the
    # Pallas kernels execute on local shards (parallel/tp_model — jit-only
    # sharding cannot partition a pallas_call and silently falls back to the
    # XLA dequant matmul)
    mesh = None
    if args.tp and args.tp > 1:
        from ..parallel.sharding import make_mesh
        mesh = make_mesh(tp=args.tp, dp=1)
        print(f"tensor-parallel over mesh {dict(mesh.shape)}")

    # --pre-layer with --eval/--benchmark: the flag exists for models that
    # do NOT fit resident, so silently loading fully resident would defeat it
    # (OOM). Route through OffloadRunner instead of ModelRunner.
    offload_runner = None
    if args.pre_layer is not None and (args.eval or args.benchmark):
        from ..runtime.offload import OffloadRunner
        offload_runner = OffloadRunner(cfg.arch, cfg, params,
                                       pre_layer=args.pre_layer,
                                       max_seq_len=seqlen,
                                       kv_dtype=_kv_dtype(args.kv_dtype))

    if args.eval:
        if offload_runner is not None:
            datasets = (["wikitext2", "ptb", "c4"]
                        if args.dataset != "synthetic" else ["synthetic"])
            if args.new_eval and args.dataset != "synthetic":
                datasets = ["wikitext2", "ptb-new", "c4-new"]
            for ds in datasets:
                _, test = get_loaders(
                    ds, seed=args.seed, seqlen=seqlen,
                    model=args.model if ds != "synthetic" else cfg)
                with timer.phase(f"eval:{ds}"), trace():
                    ppl = offload_runner.perplexity(test, seqlen=seqlen)
                print(f"{ds} perplexity: {ppl:.4f}")
    if args.eval and offload_runner is None:
        eval_params = params
        if mesh is not None:
            from ..parallel.sharding import shard_model_params
            eval_params = shard_model_params(cfg.arch, cfg, params, mesh)
        datasets = ["wikitext2", "ptb", "c4"] if args.dataset != "synthetic" \
            else ["synthetic"]
        if args.new_eval and args.dataset != "synthetic":
            datasets = ["wikitext2", "ptb-new", "c4-new"]
        for ds in datasets:
            _, test = get_loaders(
                ds, seed=args.seed, seqlen=seqlen,
                model=args.model if ds != "synthetic" else cfg)
            with timer.phase(f"eval:{ds}"), trace():
                ppl = perplexity(cfg.arch, cfg, eval_params, test,
                                 seqlen=seqlen, verbose=True)
            print(f"{ds} perplexity: {ppl:.4f}")
        del eval_params

    if args.benchmark:
        from ..runtime import ModelRunner, benchmark_decode
        # the reference benchmarks the FIRST seeded calibration window
        # (llama.py:497-499: next(iter(dataloader))), so --check ppl is
        # comparable run-to-run and against the reference pipeline
        train, _ = get_loaders(
            args.dataset, nsamples=1, seed=args.seed, seqlen=seqlen,
            model=args.model if args.dataset != "synthetic" else cfg)
        stream = np.asarray(train).reshape(-1)
        n = min(args.benchmark, len(stream))
        with timer.phase("benchmark"), trace():
            if offload_runner is not None:
                runner = offload_runner  # --pre-layer: half-resident decode
            else:
                runner = ModelRunner(cfg.arch, cfg, params, batch_size=1,
                                     max_seq_len=max(n, 32),
                                     mesh=mesh, shard_map_tp=mesh is not None,
                                     fuse_qkv=args.fuse_attn,
                                     kv_dtype=_kv_dtype(args.kv_dtype))
            res = benchmark_decode(runner, stream[:n][None],
                                   check=args.check)
        print(json.dumps(res))

    if args.test_generation:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(args.model)
        ids = np.asarray(tokenizer(args.text)["input_ids"], np.int32)
        max_len = len(ids) + args.max_new_tokens
        stream = lambda t: print(tokenizer.decode(t), end="", flush=True)
        if args.pre_layer is not None:
            from ..runtime.offload import OffloadRunner
            runner = OffloadRunner(cfg.arch, cfg, params,
                                   pre_layer=args.pre_layer,
                                   max_seq_len=max_len,
                                   kv_dtype=_kv_dtype(args.kv_dtype))
            out = runner.generate(ids, args.max_new_tokens,
                                  temperature=args.temperature,
                                  top_p=args.top_p,
                                  min_new_tokens=args.min_new_tokens,
                                  eos_token_id=tokenizer.eos_token_id,
                                  stream=stream)
        else:
            from ..runtime import ModelRunner, generate
            runner = ModelRunner(cfg.arch, cfg, params, batch_size=1,
                                 max_seq_len=max_len,
                                 mesh=mesh, shard_map_tp=mesh is not None,
                                 fuse_qkv=args.fuse_attn,
                                 kv_dtype=_kv_dtype(args.kv_dtype))
            out = generate(runner, ids, args.max_new_tokens,
                           temperature=args.temperature, top_p=args.top_p,
                           min_new_tokens=args.min_new_tokens,
                           eos_token_id=tokenizer.eos_token_id,
                           stream=stream)
        print()
        print(tokenizer.decode(out[0]))

    if timer.totals:
        print(timer.summary())
        if args.profile_dir:
            print(f"device trace written to {args.profile_dir}")


if __name__ == "__main__":
    main()
