"""Decompose the ServingEngine decode step cost on TPU (batch=8, 7B).

The runner's batch-8 greedy scan runs 8.6 ms/step; the serving step appears
~10x slower. Difference candidates: per-slot VECTOR offsets (vmap'ed cache
scatter, per-row masks, per-row attention offsets), live-mask ops.
"""
from __future__ import annotations

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import bench as benchmod
from gptq_for_llama_tpu.runtime.serve import ServingEngine


def main():
    cfg = benchmod.build_cfg(tiny=False)
    params = benchmod.random_packed_llama(cfg, jnp.bfloat16)
    import os
    B, S = int(os.environ.get('DS_B', 8)), int(os.environ.get('DS_S', 256))
    eng = ServingEngine("llama", cfg, params, batch_slots=B, max_seq_len=S,
                        prefill_buckets=(16,), unroll_layers=True)
    step = eng._decode_step_fn

    lshape = (B, S, cfg.num_kv_heads, cfg.head_dim)
    k = tuple(jnp.zeros(lshape, jnp.bfloat16) for _ in range(cfg.num_layers))
    v = tuple(jnp.zeros(lshape, jnp.bfloat16) for _ in range(cfg.num_layers))
    toks = jnp.zeros((B, 1), jnp.int32)
    live = jnp.ones((B,), bool)

    def timed(offsets, iters=16, reps=3):
        @jax.jit
        def loop(sp, toks, k, v, off):
            def body(carry, _):
                toks, k, v, off = carry
                logits, k, v, off = step(sp, toks, k, v, off, live, None)
                nxt = jnp.argmax(logits.astype(jnp.float32),
                                 axis=-1).astype(jnp.int32)[:, None]
                off = off * 0 + offsets  # pin (capacity)
                return (nxt, k, v, off), nxt[:, 0]
            (_, k, v, off), ts = jax.lax.scan(
                body, (toks, k, v, offsets), None, length=iters)
            return ts
        np.asarray(loop(eng._sp, toks, k, v, offsets))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(loop(eng._sp, toks, k, v, offsets))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    uniform = jnp.full((B,), 16, jnp.int32)
    ragged = jnp.asarray(np.arange(16, 16 + B), jnp.int32)
    t_uniform = timed(uniform)
    print(f"serving step, uniform vector offsets: {t_uniform*1e3:.2f} ms/step",
          flush=True)
    t_ragged = timed(ragged)
    print(f"serving step, ragged vector offsets:  {t_ragged*1e3:.2f} ms/step",
          flush=True)


if __name__ == "__main__":
    main()
