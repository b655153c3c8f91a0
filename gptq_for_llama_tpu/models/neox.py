"""GPT-NeoX architecture as pure functions (reference driver: neox.py:27-273).

Covers the NeoX family specifics: fused query_key_value projection with
per-head-interleaved [q|k|v] layout, partial rotary embeddings (rotary_pct),
parallel attention+MLP residual, LayerNorm with bias, GELU MLP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import (activation, apply_kv_cache, attention_block, apply_rope, causal_mask,
                     layer_norm, rope_cos_sin, sdpa, row_parallel_apply)
from .config import ModelConfig
from ..ops.linear import dense, linear_apply

NAME = "neox"

LAYER_LINEARS = ("attention.query_key_value", "attention.dense",
                 "mlp.dense_h_to_4h", "mlp.dense_4h_to_h")


def sequential_groups(true_sequential: bool):
    # no true-sequential grouping in the reference NeoX driver (neox.py:84)
    return [list(LAYER_LINEARS)]


def init_params(cfg: ModelConfig, rng, dtype=jnp.bfloat16):
    keys = iter(jax.random.split(rng, 4 + cfg.num_layers * 6))
    hid, inter = cfg.hidden_size, cfg.intermediate_size

    def lin(k, i, o, bias=True):
        w = (jax.random.normal(k, (i, o), jnp.float32) * (i ** -0.5)).astype(dtype)
        return dense(w, jnp.zeros((o,), dtype) if bias else None)

    def ln():
        return {"w": jnp.ones((hid,), dtype), "b": jnp.zeros((hid,), dtype)}

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "input_layernorm": ln(),
            "post_attention_layernorm": ln(),
            "attention": {
                "query_key_value": lin(next(keys), hid, 3 * hid),
                "dense": lin(next(keys), hid, hid),
            },
            "mlp": {
                "dense_h_to_4h": lin(next(keys), hid, inter),
                "dense_4h_to_h": lin(next(keys), inter, hid),
            },
        })
    return {
        "embed_in": jax.random.normal(next(keys), (cfg.vocab_size, hid), jnp.float32).astype(dtype) * 0.02,
        "layers": layers,
        "final_layer_norm": ln(),
        "embed_out": lin(next(keys), hid, cfg.vocab_size, bias=False),
    }


def embed(params, cfg: ModelConfig, input_ids, positions=None):
    return jnp.take(params["embed_in"], input_ids, axis=0)


def step_rope(cfg: ModelConfig, positions, dtype):
    """Per-step RoPE tables shared by every layer (partial rotary)."""
    rotary_dim = int(cfg.head_dim * cfg.rotary_pct)
    return rope_cos_sin(positions, rotary_dim, cfg.rope_theta, dtype=dtype)


def layer(cfg: ModelConfig, lp, x, positions, mask, past_kv=None, rope=None,
          tp_ctx=None):
    b, s, _ = x.shape
    hd = cfg.head_dim
    ln1 = layer_norm(x, lp["input_layernorm"]["w"], lp["input_layernorm"]["b"], cfg.norm_eps)
    qkv = linear_apply(lp["attention"]["query_key_value"], ln1)
    # HF GPTNeoX fused layout: (B, S, heads, 3*head_dim) -> split per head
    qkv = qkv.reshape(b, s, cfg.num_heads, 3 * hd)
    q, k, v = qkv[..., :hd], qkv[..., hd:2 * hd], qkv[..., 2 * hd:]
    rotary_dim = int(hd * cfg.rotary_pct)
    cos, sin = rope if rope is not None else rope_cos_sin(
        positions, rotary_dim, cfg.rope_theta, dtype=x.dtype)
    q, k = apply_rope(q, k, cos, sin, rotary_dim=rotary_dim)
    attn_out, present = attention_block(past_kv, q, k, v, mask)
    attn_out = attn_out.reshape(b, s, -1)
    attn_out_proj = row_parallel_apply(lp["attention"]["dense"], attn_out, tp_ctx)

    if cfg.parallel_residual:
        ln2 = layer_norm(x, lp["post_attention_layernorm"]["w"],
                         lp["post_attention_layernorm"]["b"], cfg.norm_eps)
        h4 = linear_apply(lp["mlp"]["dense_h_to_4h"], ln2)
        act_out = activation(cfg.act)(h4)
        mlp_out = row_parallel_apply(lp["mlp"]["dense_4h_to_h"], act_out, tp_ctx)
        y = x + attn_out_proj + mlp_out
    else:
        attn_res = x + attn_out_proj
        ln2 = layer_norm(attn_res, lp["post_attention_layernorm"]["w"],
                         lp["post_attention_layernorm"]["b"], cfg.norm_eps)
        h4 = linear_apply(lp["mlp"]["dense_h_to_4h"], ln2)
        act_out = activation(cfg.act)(h4)
        mlp_out = row_parallel_apply(lp["mlp"]["dense_4h_to_h"], act_out, tp_ctx)
        y = attn_res + mlp_out

    taps = {
        "attention.query_key_value": ln1,
        "attention.dense": attn_out,
        "mlp.dense_h_to_4h": ln2,
        "mlp.dense_4h_to_h": act_out,
    }
    return y, taps, present


def head_input(params, cfg: ModelConfig, x):
    """Activation feeding embed_out (final layer norm output)."""
    return layer_norm(x, params["final_layer_norm"]["w"],
                      params["final_layer_norm"]["b"], cfg.norm_eps)


def head(params, cfg: ModelConfig, x):
    return linear_apply(params["embed_out"], head_input(params, cfg, x))


def forward(params, cfg: ModelConfig, input_ids, positions=None):
    b, s = input_ids.shape
    if positions is None:
        positions = jnp.arange(s)[None, :]
    x = embed(params, cfg, input_ids)
    mask = causal_mask(s, s)
    for lp in params["layers"]:
        x, _, _ = layer(cfg, lp, x, positions, mask)
    return head(params, cfg, x)
