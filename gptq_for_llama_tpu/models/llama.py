"""LLaMA architecture as pure functions over a parameter pytree.

Replaces the reference's reliance on HF transformers' LlamaForCausalLM + module
surgery (reference: llama.py:13-24, 279-325) with an owned, jit-friendly forward:
RMSNorm -> (RoPE, GQA-ready attention) -> SiLU gate/up MLP, pre-norm residuals.

Parameter layout (linear kernels stored (in, out) for `x @ w`):
  embed_tokens: (V, H)
  layers[i]:
    input_layernorm, post_attention_layernorm: (H,)
    self_attn.{q,k,v,o}_proj, mlp.{gate,up,down}_proj: dense dict or PackedLinear
  norm: (H,)
  lm_head: dense dict (kept fp16/bf16 — the reference never quantizes lm_head,
  llama.py:270 excludes it)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import (activation, apply_kv_cache, attention_block, apply_rope, causal_mask,
                     rms_norm, rope_cos_sin, row_parallel_apply, sdpa)
from .config import ModelConfig
from ..ops.linear import dense, linear_apply

NAME = "llama"

LAYER_LINEARS = ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                 "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj")


def sequential_groups(true_sequential: bool):
    """Quantization order within a layer (reference: llama.py:86-90)."""
    if true_sequential:
        return [["self_attn.k_proj", "self_attn.v_proj", "self_attn.q_proj"],
                ["self_attn.o_proj"],
                ["mlp.up_proj", "mlp.gate_proj"],
                ["mlp.down_proj"]]
    return [list(LAYER_LINEARS)]


def init_params(cfg: ModelConfig, rng, dtype=jnp.bfloat16):
    """Random small model for tests (the reference has no equivalent — it always
    loads HF checkpoints; tiny-random models are our CI vehicle, SURVEY.md §4)."""
    keys = iter(jax.random.split(rng, 4 + cfg.num_layers * 8))
    h, kvh = cfg.num_heads * cfg.head_dim, cfg.num_kv_heads * cfg.head_dim
    hid, inter = cfg.hidden_size, cfg.intermediate_size

    def lin(k, i, o):
        return dense((jax.random.normal(k, (i, o), jnp.float32) * (i ** -0.5)).astype(dtype))

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "input_layernorm": jnp.ones((hid,), dtype),
            "post_attention_layernorm": jnp.ones((hid,), dtype),
            "self_attn": {
                "q_proj": lin(next(keys), hid, h),
                "k_proj": lin(next(keys), hid, kvh),
                "v_proj": lin(next(keys), hid, kvh),
                "o_proj": lin(next(keys), h, hid),
            },
            "mlp": {
                "gate_proj": lin(next(keys), hid, inter),
                "up_proj": lin(next(keys), hid, inter),
                "down_proj": lin(next(keys), inter, hid),
            },
        })
    return {
        "embed_tokens": jax.random.normal(next(keys), (cfg.vocab_size, hid), jnp.float32).astype(dtype) * 0.02,
        "layers": layers,
        "norm": jnp.ones((hid,), dtype),
        "lm_head": lin(next(keys), hid, cfg.vocab_size),
    }


def embed(params, cfg: ModelConfig, input_ids, positions=None):
    return jnp.take(params["embed_tokens"], input_ids, axis=0)


def step_rope(cfg: ModelConfig, positions, dtype):
    """Per-step RoPE tables, computed once and shared by every layer
    (inside lax.scan the per-layer recompute cannot be hoisted by XLA)."""
    return rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, dtype=dtype)


def layer(cfg: ModelConfig, lp, x, positions, mask, past_kv=None, rope=None,
          tp_ctx=None):
    """One decoder layer. x: (B, S, H). Returns (y, taps, present_kv).

    past_kv: None (plain causal forward) or (cache_k, cache_v, offset) — a
    static-size KV cache written at offset (decode path); present_kv is then the
    updated (cache_k, cache_v). rope: optional precomputed (cos, sin) from
    step_rope. taps maps each linear's dotted name to the activation feeding
    it — the functional replacement for the reference's forward hooks
    (llama.py:98-107). tp_ctx: (axis, tp) inside shard_map tensor parallelism
    (cfg is then the LOCAL per-shard config; o_proj/down_proj psum over tp).
    """
    h_attn_in = rms_norm(x, lp["input_layernorm"], cfg.norm_eps)
    att = lp["self_attn"]
    if "qkv_proj" in att:  # load-time fused projection (see fuse_attention)
        qh = cfg.num_heads * cfg.head_dim
        kvh = cfg.num_kv_heads * cfg.head_dim
        qkv = linear_apply(att["qkv_proj"], h_attn_in)
        q, k, v = (qkv[..., :qh], qkv[..., qh:qh + kvh], qkv[..., qh + kvh:])
    else:
        q = linear_apply(att["q_proj"], h_attn_in)
        k = linear_apply(att["k_proj"], h_attn_in)
        v = linear_apply(att["v_proj"], h_attn_in)
    b, s, _ = x.shape
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    cos, sin = rope if rope is not None else rope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta, dtype=x.dtype)
    q, k = apply_rope(q, k, cos, sin)
    attn_out, present = attention_block(past_kv, q, k, v, mask)
    attn_out = attn_out.reshape(b, s, -1)
    o = row_parallel_apply(att["o_proj"], attn_out, tp_ctx)
    x = x + o

    h_mlp_in = rms_norm(x, lp["post_attention_layernorm"], cfg.norm_eps)
    mlp = lp["mlp"]
    from ..ops.quant_matmul import fused_gate_up  # fused Pallas path when packed
    h_down_in = fused_gate_up(mlp["gate_proj"], mlp["up_proj"], h_mlp_in, cfg.act)
    down = row_parallel_apply(mlp["down_proj"], h_down_in, tp_ctx)
    y = x + down

    taps = {
        "self_attn.q_proj": h_attn_in, "self_attn.k_proj": h_attn_in,
        "self_attn.v_proj": h_attn_in, "self_attn.o_proj": attn_out,
        "mlp.gate_proj": h_mlp_in, "mlp.up_proj": h_mlp_in,
        "mlp.down_proj": h_down_in,
    }
    return y, taps, present


def fuse_attention(params):
    """Fuse per-layer q/k/v PackedLinears into one qkv_proj.

    The module-surgery equivalent of the reference's make_quant_attn
    (reference: quant/fused_attn.py:164-204). No-op for layers whose q/k/v are
    dense or have incompatible layouts. Returns a tree whose edited dicts are
    COPIES — the caller's params keep their unfused q/k/v (array leaves are
    shared, so no device memory is duplicated)."""
    from ..ops.linear import PackedLinear
    out = dict(params)
    out["layers"] = []
    for lp in params["layers"]:
        att = lp["self_attn"]
        lins = [att.get(n) for n in ("q_proj", "k_proj", "v_proj")]
        if all(isinstance(l, PackedLinear) for l in lins):
            try:
                fused = PackedLinear.concat_outputs(lins)
            except ValueError:
                fused = None
        else:
            fused = None
        if fused is None:
            out["layers"].append(lp)
            continue
        att = {k: v for k, v in att.items()
               if k not in ("q_proj", "k_proj", "v_proj")}
        att["qkv_proj"] = fused
        lp = dict(lp)
        lp["self_attn"] = att
        out["layers"].append(lp)
    n_fused = sum(1 for lp in out["layers"] if "qkv_proj" in lp["self_attn"])
    if n_fused < len(out["layers"]):
        # dense layers or incompatible layouts (e.g. act-order: q/k/v carry
        # different input permutations) cannot concat — say so instead of
        # silently ignoring the fuse request
        import sys
        print(f"fuse_attention: fused {n_fused}/{len(out['layers'])} layers "
              "(rest have dense or layout-incompatible q/k/v)",
              file=sys.stderr)
    return out


def head_input(params, cfg: ModelConfig, x):
    """The activation feeding lm_head (final norm output) — the calibration
    tap for optional lm_head quantization (beyond the reference, which never
    quantizes lm_head: llama.py:270)."""
    return rms_norm(x, params["norm"], cfg.norm_eps)


def head(params, cfg: ModelConfig, x):
    """Final norm + lm_head (reference: llama.py:241-253)."""
    return linear_apply(params["lm_head"], head_input(params, cfg, x))


def forward(params, cfg: ModelConfig, input_ids, positions=None):
    """Full-model forward: (B, S) int32 -> (B, S, V) logits."""
    b, s = input_ids.shape
    if positions is None:
        positions = jnp.arange(s)[None, :]
    x = embed(params, cfg, input_ids)
    mask = causal_mask(s, s)
    for lp in params["layers"]:
        x, _, _ = layer(cfg, lp, x, positions, mask)
    return head(params, cfg, x)
