"""On-chip decomposition of the 7B decode step (slope-method timing).

Builds the same fake-packed 7B LLaMA as bench.py, then times one decode step
with layer components toggled off one at a time. Chained steps inside a
fori_loop (scalar carry dependence) cancel the relay's per-iteration floor.

Usage: python scripts/decomp.py [--iters 30] [--reps 4] [--variants a,b,...]
"""
from __future__ import annotations

import argparse
import sys, os, time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod
from gptq_for_llama_tpu.models.common import (apply_rope, decode_mask,
                                              rms_norm, rope_cos_sin, sdpa,
                                              update_kv_cache)
from gptq_for_llama_tpu.ops.linear import linear_apply
from gptq_for_llama_tpu.ops.quant_matmul import fused_gate_up
from gptq_for_llama_tpu.runtime.runner import KVCache, stack_layers


def make_step(cfg, max_len, flags):
    """One decode step (B=1, s=1) with components toggled by `flags`."""
    f = flags
    if f.get("xla_attn"):
        os.environ["GPTQ_TPU_ATTN_IMPL"] = "xla"
    else:
        os.environ.pop("GPTQ_TPU_ATTN_IMPL", None)

    def layer_body(carry, layer_in):
        x, offset, positions, rope = carry
        lp, ck, cv = layer_in
        h = rms_norm(x, lp["input_layernorm"], cfg.norm_eps) if f["norms"] else x
        att = lp["self_attn"]
        q = linear_apply(att["q_proj"], h)
        k = linear_apply(att["k_proj"], h)
        v = linear_apply(att["v_proj"], h)
        b, s = x.shape[0], x.shape[1]
        q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        if f["rope"]:
            cos, sin = rope
            q, k = apply_rope(q, k, cos, sin)
        if f["cache"]:
            ck, cv = update_kv_cache(ck, cv, k, v, offset)
            if f.get("attn_fresh"):
                # cache WRITE kept, but attention reads only the fresh token:
                # isolates cache-READ traffic/copies from the attention op
                attn_out = sdpa(q, k, v, None)
            elif f["attn"]:
                attn_out = sdpa(q, ck, cv, None, decode_offset=offset)
            else:
                attn_out = q
        else:
            attn_out = sdpa(q, k, v, None) if f["attn"] else q
        attn_out = attn_out.reshape(b, s, -1)
        o = linear_apply(att["o_proj"], attn_out)
        x = x + o
        h2 = rms_norm(x, lp["post_attention_layernorm"], cfg.norm_eps) \
            if f["norms"] else x
        mlp = lp["mlp"]
        hd = fused_gate_up(mlp["gate_proj"], mlp["up_proj"], h2, cfg.act)
        x = x + linear_apply(mlp["down_proj"], hd)
        return (x, offset, positions, rope), (ck, cv)

    def step(sp, tok, cache):
        statics, stacked = sp["statics"], sp["stacked"]
        positions = cache.offset + jnp.arange(1)[None, :]
        rope = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta,
                            dtype=jnp.bfloat16) if f["rope"] else None
        x = jnp.take(statics["embed_tokens"], tok, axis=0) if f["embed"] \
            else jnp.zeros((1, 1, cfg.hidden_size), jnp.bfloat16)
        if f.get("unroll"):
            ks, vs = [], []
            carry = (x, cache.offset, positions, rope)
            for li in range(cfg.num_layers):
                lp = jax.tree_util.tree_map(lambda a: a[li], stacked) \
                    if not isinstance(sp.get("layers"), list) else sp["layers"][li]
                carry, (k2, v2) = layer_body(carry, (lp, cache.k[li], cache.v[li]))
                ks.append(k2); vs.append(v2)
            x = carry[0]
            knew, vnew = jnp.stack(ks), jnp.stack(vs)
        else:
            (x, *_), (knew, vnew) = jax.lax.scan(
                layer_body, (x, cache.offset, positions, rope),
                (stacked, cache.k, cache.v))
        if f["head"]:
            x = rms_norm(x, statics["norm"], cfg.norm_eps)
            logits = linear_apply(statics["lm_head"], x)
        else:
            logits = jnp.zeros((1, 1, 256), jnp.bfloat16) + jnp.sum(x) * 1e-12
        cache = KVCache(knew if f["cache"] else cache.k,
                        vnew if f["cache"] else cache.v, cache.offset + 1)
        return logits, cache

    return step


BASE = dict(norms=True, rope=True, cache=True, attn=True, embed=True, head=True)
VARIANTS = {
    "full": {},
    "no_head": {"head": False},
    "no_embed_head": {"head": False, "embed": False},
    "no_attn": {"attn": False},
    "no_cache": {"cache": False, "attn": False},
    "no_rope": {"rope": False},
    "no_norms": {"norms": False},
    "linears_only": {"norms": False, "rope": False, "cache": False,
                     "attn": False, "embed": False, "head": False},
    "full_unroll": {"unroll": True},
    "unroll_list": {"unroll": True, "list_params": True},
    "unroll_noattn": {"unroll": True, "list_params": True, "attn": False},
    "unroll_nohead": {"unroll": True, "list_params": True, "head": False},
    "unroll_xla_attn": {"unroll": True, "list_params": True, "xla_attn": True},
    "unroll_tok2": {"unroll": True, "list_params": True, "scan_unroll": 2},
    "unroll_tok4": {"unroll": True, "list_params": True, "scan_unroll": 4},
    "unroll_tok8": {"unroll": True, "list_params": True, "scan_unroll": 8},
    "unroll_nonorms": {"unroll": True, "list_params": True, "norms": False},
    "unroll_norope": {"unroll": True, "list_params": True, "rope": False},
    "unroll_tok8_noattn": {"unroll": True, "list_params": True,
                           "scan_unroll": 8, "attn": False},
    "unroll_tok8_xla_attn": {"unroll": True, "list_params": True,
                             "scan_unroll": 8, "xla_attn": True},
    "unroll_tok8_nohead": {"unroll": True, "list_params": True,
                           "scan_unroll": 8, "head": False},
    "unroll_tok8_freshattn": {"unroll": True, "list_params": True,
                              "scan_unroll": 8, "attn_fresh": True},
    "xla_attn": {"xla_attn": True},
}
BASE.update(unroll=False, list_params=False, xla_attn=False)


def timed_step(step, sp, cache, iters, reps, scan_unroll=1):
    """One lax.scan of `iters` decode steps per program (bench methodology);
    the per-scan-iteration relay floor is common to every variant and cancels
    in differences vs 'full'."""
    tok0 = jnp.zeros((1, 1), jnp.int32)

    @jax.jit
    def loop(sp, tok, cache):
        def body(carry, _):
            tok, cache = carry
            logits, cache = step(sp, tok, cache)
            tok = jnp.argmax(logits[:, -1].astype(jnp.float32),
                             axis=-1).astype(jnp.int32)[:, None]
            cache = KVCache(cache.k, cache.v, cache.offset * 0 + 16)
            return (tok, cache), tok[0, 0]
        (_, _), toks = jax.lax.scan(body, (tok, cache), None, length=iters,
                                    unroll=scan_unroll)
        return toks

    np.asarray(loop(sp, tok0, cache))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(loop(sp, tok0, cache))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--max-len", type=int, default=256)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    cfg = benchmod.build_cfg(tiny=False)
    params = benchmod.random_packed_llama(cfg, jnp.bfloat16)
    stacked = stack_layers(params["layers"])
    sp = {"statics": {k: v for k, v in params.items() if k != "layers"},
          "stacked": stacked}
    cache = KVCache.zeros(cfg, cfg.num_layers, 1, args.max_len, jnp.bfloat16)
    cache = KVCache(cache.k, cache.v, jnp.int32(16))

    results = {}
    for name in args.variants.split(","):
        flags = dict(BASE, **VARIANTS[name])
        step = make_step(cfg, args.max_len, flags)
        spv = sp
        if flags.get("list_params"):
            spv = dict(sp, layers=params["layers"])
        t = timed_step(step, spv, cache, args.iters, args.reps,
                       scan_unroll=flags.get("scan_unroll", 1))
        results[name] = t
        delta = ""
        if name != "full" and "full" in results:
            delta = f"  (full - this = {(results['full'] - t) * 1e3:+.2f} ms)"
        print(f"{name:16s} {t * 1e3:7.3f} ms/token{delta}", flush=True)


if __name__ == "__main__":
    main()
