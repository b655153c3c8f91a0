"""OPT architecture as pure functions (reference driver: opt.py:28-285).

Covers the OPT family quirks the reference handles explicitly: offset-2 learned
position embeddings, project_in/project_out for word_embed_proj_dim != hidden
(opt.py:38-41, 143-147), do_layer_norm_before=False (350M), ReLU MLP, biased
linears, tied lm_head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import (activation, apply_kv_cache, attention_block, causal_mask, layer_norm, sdpa, row_parallel_apply)
from .config import ModelConfig
from ..ops.linear import dense, linear_apply

NAME = "opt"

LAYER_LINEARS = ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                 "self_attn.out_proj", "fc1", "fc2")

POSITION_OFFSET = 2  # OPT's learned embedding offset


def sequential_groups(true_sequential: bool):
    # the reference OPT driver has no true-sequential grouping (opt.py:86)
    return [list(LAYER_LINEARS)]


def init_params(cfg: ModelConfig, rng, dtype=jnp.bfloat16):
    keys = iter(jax.random.split(rng, 8 + cfg.num_layers * 8))
    hid, inter = cfg.hidden_size, cfg.intermediate_size
    proj = cfg.word_embed_proj_dim or hid

    def lin(k, i, o, bias=True):
        w = (jax.random.normal(k, (i, o), jnp.float32) * (i ** -0.5)).astype(dtype)
        return dense(w, jnp.zeros((o,), dtype) if bias else None)

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "self_attn_layer_norm": {"w": jnp.ones((hid,), dtype), "b": jnp.zeros((hid,), dtype)},
            "final_layer_norm": {"w": jnp.ones((hid,), dtype), "b": jnp.zeros((hid,), dtype)},
            "self_attn": {
                "q_proj": lin(next(keys), hid, hid),
                "k_proj": lin(next(keys), hid, hid),
                "v_proj": lin(next(keys), hid, hid),
                "out_proj": lin(next(keys), hid, hid),
            },
            "fc1": lin(next(keys), hid, inter),
            "fc2": lin(next(keys), inter, hid),
        })
    params = {
        "embed_tokens": jax.random.normal(next(keys), (cfg.vocab_size, proj), jnp.float32).astype(dtype) * 0.02,
        "embed_positions": jax.random.normal(next(keys), (cfg.max_seq_len + POSITION_OFFSET, hid), jnp.float32).astype(dtype) * 0.02,
        "layers": layers,
        "final_layer_norm": {"w": jnp.ones((hid,), dtype), "b": jnp.zeros((hid,), dtype)},
    }
    if cfg.word_embed_proj_dim:
        params["project_in"] = lin(next(keys), proj, hid, bias=False)
        params["project_out"] = lin(next(keys), hid, proj, bias=False)
    params["lm_head"] = dense(params["embed_tokens"].T) if cfg.tie_word_embeddings \
        else lin(next(keys), proj, cfg.vocab_size, bias=False)
    return params


def embed(params, cfg: ModelConfig, input_ids, positions=None):
    b, s = input_ids.shape
    x = jnp.take(params["embed_tokens"], input_ids, axis=0)
    if "project_in" in params:
        x = linear_apply(params["project_in"], x)
    if positions is None:
        positions = jnp.arange(s)[None, :]
    pos = jnp.take(params["embed_positions"], positions + POSITION_OFFSET, axis=0)
    return x + pos


def step_rope(cfg: ModelConfig, positions, dtype):
    return None  # OPT uses learned position embeddings (no rotary)


def layer(cfg: ModelConfig, lp, x, positions, mask, past_kv=None, rope=None,
          tp_ctx=None):
    b, s, _ = x.shape
    residual = x
    h = layer_norm(x, lp["self_attn_layer_norm"]["w"], lp["self_attn_layer_norm"]["b"],
                   cfg.norm_eps) if cfg.do_layer_norm_before else x
    att = lp["self_attn"]
    q = linear_apply(att["q_proj"], h).reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = linear_apply(att["k_proj"], h).reshape(b, s, cfg.num_heads, cfg.head_dim)
    v = linear_apply(att["v_proj"], h).reshape(b, s, cfg.num_heads, cfg.head_dim)
    attn_out, present = attention_block(past_kv, q, k, v, mask)
    attn_out = attn_out.reshape(b, s, -1)
    o = row_parallel_apply(att["out_proj"], attn_out, tp_ctx)
    x = residual + o
    if not cfg.do_layer_norm_before:
        x = layer_norm(x, lp["self_attn_layer_norm"]["w"], lp["self_attn_layer_norm"]["b"],
                       cfg.norm_eps)

    residual = x
    h2 = layer_norm(x, lp["final_layer_norm"]["w"], lp["final_layer_norm"]["b"],
                    cfg.norm_eps) if cfg.do_layer_norm_before else x
    fc1_out = linear_apply(lp["fc1"], h2)
    act_out = activation(cfg.act)(fc1_out)
    fc2_out = row_parallel_apply(lp["fc2"], act_out, tp_ctx)
    y = residual + fc2_out
    if not cfg.do_layer_norm_before:
        y = layer_norm(y, lp["final_layer_norm"]["w"], lp["final_layer_norm"]["b"],
                       cfg.norm_eps)

    taps = {
        "self_attn.q_proj": h, "self_attn.k_proj": h, "self_attn.v_proj": h,
        "self_attn.out_proj": attn_out, "fc1": h2, "fc2": act_out,
    }
    return y, taps, present


def head_input(params, cfg: ModelConfig, x):
    """Activation feeding lm_head (final norm + project_out)."""
    if cfg.do_layer_norm_before and "final_layer_norm" in params:
        x = layer_norm(x, params["final_layer_norm"]["w"], params["final_layer_norm"]["b"],
                       cfg.norm_eps)
    if "project_out" in params:
        x = linear_apply(params["project_out"], x)
    return x


def head(params, cfg: ModelConfig, x):
    """Final norm (+ project_out) + lm_head (reference: opt.py:207-220)."""
    return linear_apply(params["lm_head"], head_input(params, cfg, x))


def forward(params, cfg: ModelConfig, input_ids, positions=None):
    b, s = input_ids.shape
    if positions is None:
        positions = jnp.arange(s)[None, :]
    x = embed(params, cfg, input_ids, positions)
    mask = causal_mask(s, s)
    for lp in params["layers"]:
        x, _, _ = layer(cfg, lp, x, positions, mask)
    return head(params, cfg, x)
