"""Wall-clock of 7B-scale GPTQ quantization on the real TPU (round-5).

The reference quantizes LLaMA-7B in "minutes" on one RTX 3090
(reference README usage; llama.py:27-170). This harness times OUR solver at
the same workload shape — 32 layers x 128 calibration samples x seqlen 2048,
all 7 linears per layer through the REAL pipeline (Hessian einsum accumulate,
damped Cholesky, jitted fori_loop column solver) on chip — and commits the
per-phase split so "usable offline on TPU" is measured, not asserted.

Memory-capped like the reference's layer streaming (llama.py:84,125-130):
ONE host layer template is staged to the device per iteration and freed
after; the quantized output is discarded after timing (weight CONTENT is
irrelevant to the solver's compute/memory profile, exactly as in bench.py).
Activations propagate through the quantized layer each iteration, so x has
realistic magnitude drift across all 32 layers.

Usage: python scripts/quantize7b_bench.py [--layers 32] [--nsamples 128]
       [--chunk 8] [--out bench_artifacts/r05/quantize_7b.json]
"""
from __future__ import annotations

import argparse
import json
import sys, os, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gptq_for_llama_tpu.engine import QuantizeSpec
from gptq_for_llama_tpu.engine.quantize import (_make_layer_fns,
                                                _quantize_one, get_path)
from gptq_for_llama_tpu.models import registry
from gptq_for_llama_tpu.models.common import causal_mask
from gptq_for_llama_tpu.models.config import ModelConfig


def stage(msg, _t=[time.perf_counter()]):
    now = time.perf_counter()
    print(f"[q7b +{now - _t[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)
    _t[0] = now


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--nsamples", type=int, default=128)
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--act-order", action="store_true")
    ap.add_argument("--out", default="bench_artifacts/r05/quantize_7b.json")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_bench_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    cfg = ModelConfig(arch="llama", vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_layers=args.layers,
                      num_heads=32, num_kv_heads=32, head_dim=128,
                      max_seq_len=args.seqlen)
    arch = registry.get_arch("llama")
    spec = QuantizeSpec(wbits=4, groupsize=128, chunk=args.chunk,
                        act_order=args.act_order)
    ns, sl, ch = args.nsamples, args.seqlen, args.chunk
    assert ns % ch == 0
    dev = jax.devices()[0].device_kind
    stage(f"device: {dev}; {args.layers} layers x {ns} samples x {sl} seqlen")

    # host layer template (numpy; staged to device once per layer iteration)
    rng = np.random.RandomState(0)
    h, inter = cfg.hidden_size, cfg.intermediate_size

    def kern(k, n):
        return {"kernel": (rng.standard_normal((k, n)).astype(np.float32)
                           * (k ** -0.5)).astype(np.float32)}

    host_layer = {
        "input_layernorm": np.ones((h,), np.float32),
        "post_attention_layernorm": np.ones((h,), np.float32),
        "self_attn": {"q_proj": kern(h, h), "k_proj": kern(h, h),
                      "v_proj": kern(h, h), "o_proj": kern(h, h)},
        "mlp": {"gate_proj": kern(h, inter), "up_proj": kern(h, inter),
                "down_proj": kern(inter, h)},
    }
    names = list(arch.LAYER_LINEARS)
    stage("host layer template built")

    # calibration activations: random with embedding-like scale (the content
    # does not change the solver's compute/memory profile)
    x = (jax.random.normal(jax.random.PRNGKey(1), (ns, sl, h), jnp.float32)
         * 0.1)
    jax.block_until_ready(x)
    positions = jnp.arange(sl)[None, :]
    mask = causal_mask(sl, sl)
    stage(f"activations on device ({x.nbytes / 1e9:.2f} GB fp32)")

    accum, fwd = _make_layer_fns(arch, cfg, tuple(names))
    phases = {"stage": [], "hessian": [], "solver": [], "propagate": []}
    per_linear = {}
    t_all = time.perf_counter()
    for li in range(args.layers):
        t0 = time.perf_counter()
        lp = jax.device_put(host_layer)
        jax.block_until_ready(lp)
        phases["stage"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        sums = {n: jnp.zeros((get_path(lp, n)["kernel"].shape[0],) * 2,
                             jnp.float32) for n in names}
        for i in range(0, ns, ch):
            sums, _ = accum(lp, x[i:i + ch], positions, mask, sums)
        jax.block_until_ready(sums)
        phases["hessian"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        ntok_scale = 2.0 / ns
        for name in names:
            t1 = time.perf_counter()
            kernel = get_path(lp, name)["kernel"]
            w_t = kernel.T.astype(jnp.float32)
            q, rec = _quantize_one(w_t, sums[name] * ntok_scale, spec,
                                   spec.wbits, spec.groupsize)
            get_path(lp, name)["kernel"] = q.astype(jnp.float32).T
            per_linear.setdefault(name, []).append(time.perf_counter() - t1)
        phases["solver"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        x = jnp.concatenate([fwd(lp, x[i:i + ch], positions, mask)
                             for i in range(0, ns, ch)], axis=0)
        jax.block_until_ready(x)
        phases["propagate"].append(time.perf_counter() - t0)
        del lp, sums
        stage(f"layer {li:2d}: stage {phases['stage'][-1]:5.1f}s  "
              f"hessian {phases['hessian'][-1]:5.1f}s  "
              f"solver {phases['solver'][-1]:5.1f}s  "
              f"prop {phases['propagate'][-1]:5.1f}s")
    total = time.perf_counter() - t_all

    def split(v):  # layer 0 carries the jit compiles; report steady separately
        rest = v[1:] if len(v) > 1 else v
        return {"first_s": round(v[0], 1),
                "steady_mean_s": round(float(np.mean(rest)), 1),
                "total_s": round(float(np.sum(v)), 1)}

    out = {
        "device": dev,
        "workload": {"layers": args.layers, "nsamples": ns, "seqlen": sl,
                     "chunk": ch, "wbits": 4, "groupsize": 128,
                     "act_order": bool(args.act_order)},
        "total_s": round(total, 1),
        "total_min": round(total / 60, 1),
        "phases": {k: split(v) for k, v in phases.items()},
        "per_linear_steady_s": {k: round(float(np.mean(v[1:] or v)), 1)
                                for k, v in per_linear.items()},
        "note": "reference quantizes 7B in minutes on one RTX3090 "
                "(reference README); phases: stage=host->device layer "
                "upload, hessian=128-sample forward + X^T X accumulate, "
                "solver=damped-Cholesky + fori_loop GPTQ for 7 linears, "
                "propagate=re-run quantized layer for next layer's inputs",
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"total_min": out["total_min"], "out": args.out}))


if __name__ == "__main__":
    main()
