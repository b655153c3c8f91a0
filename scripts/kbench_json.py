"""Kernel throughput capture -> JSON artifact (KBENCH_r*.json).

Times the PRODUCTION fused dequant-GEMM dispatch (tuned Pallas kernel via
ops/quant_matmul) on the four 7B INT4-g128 shapes at decode and prefill row
counts, slope-timed (kbench.py) so the relay dispatch floor cancels.
Effective GB/s is packed-weight traffic / time — comparable to the pinned
ROOFLINE.json basis (597 GB/s on v5e).

Usage: python scripts/kbench_json.py [--out KBENCH_r04.json]
"""
from __future__ import annotations

import argparse
import json
import sys, os, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scripts.kbench import make_lin, timed_loop
from gptq_for_llama_tpu.ops.pallas import autotune
from gptq_for_llama_tpu.ops.pallas.matmul import quant_matmul_pallas
from gptq_for_llama_tpu.ops.quant_matmul import fused_gate_up


def stage(msg, _t=[time.perf_counter()]):
    now = time.perf_counter()
    print(f"[kbench +{now - _t[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)
    _t[0] = now


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_artifacts/r04/kbench.json")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--model", default="7b", choices=("7b", "13b"))
    args = ap.parse_args()

    if args.model == "13b":
        shapes = {"qkv": (5120, 15360), "o": (5120, 5120),
                  "gate_up_each": (5120, 13824), "down": (13824, 5120)}
    else:
        shapes = {"qkv": (4096, 12288), "o": (4096, 4096),
                  "gate_up_each": (4096, 11008), "down": (11008, 4096)}
    dev = jax.devices()[0].device_kind
    stage(f"device: {dev}")
    # resumable: reload prior rows and skip completed (shape, m) pairs, so a
    # timeout mid-sweep loses at most one row
    rows = []
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                rows = json.load(f).get("rows", [])
        except Exception:
            rows = []
    done = {(r["shape"], r["m"]) for r in rows}

    def flush():
        out = {"device": dev, "note": "production tuned dispatch, "
               "slope-timed; eff_gbps = packed weight bytes / time "
               "(ROOFLINE.json basis 597 GB/s)", "rows": rows}
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    for name, (k, n) in shapes.items():
        lin = make_lin(k, n, bits=args.bits)
        wbytes = (lin.qweight.size * 4 + lin.scales.size * 2
                  + lin.zeros.size * 2)
        for m in (1, 8, 32):
            if (name, m) in done:
                continue
            autotune.tune_qmm(lin, m, "fwd", log=None)
            x = jnp.ones((m, lin.in_features), jnp.bfloat16)
            t = timed_loop(lambda c: quant_matmul_pallas(c, lin),
                           x, args.iters, args.reps)
            rows.append({"shape": name, "k": k, "n": n, "m": m,
                         "bits": args.bits,
                         "us": round(t * 1e6, 1),
                         "eff_gbps": round(wbytes / t / 1e9, 1)})
            flush()
            stage(f"{name} m={m}: {t*1e6:.1f} us, "
                  f"{wbytes/t/1e9:.1f} GB/s")
    # fused gate/up MLP kernel at decode rows (reads both packed weights)
    km, nm = shapes["gate_up_each"]
    gate = make_lin(km, nm, bits=args.bits, seed=1)
    up = make_lin(km, nm, bits=args.bits, seed=2)
    wbytes2 = 2 * (gate.qweight.size * 4 + gate.scales.size * 2
                   + gate.zeros.size * 2)
    for m in (1, 8, 32):
        if ("fused_mlp", m) in done:
            continue
        autotune.tune_mlp(gate, up, m, log=None)
        x = jnp.ones((m, gate.in_features), jnp.bfloat16)
        t = timed_loop(lambda c: fused_gate_up(gate, up, c, "silu"), x,
                       args.iters, args.reps)
        rows.append({"shape": "fused_mlp", "k": km, "n": nm, "m": m,
                     "bits": args.bits, "us": round(t * 1e6, 1),
                     "eff_gbps": round(wbytes2 / t / 1e9, 1)})
        flush()
        stage(f"fused_mlp m={m}: {t*1e6:.1f} us, {wbytes2/t/1e9:.1f} GB/s")

    flush()
    print(json.dumps({"rows": len(rows), "out": args.out}))


if __name__ == "__main__":
    main()
