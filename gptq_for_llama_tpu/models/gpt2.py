"""GPT-2 architecture as pure functions.

The reference has no GPT-2 driver script, but its generic capture machinery
explicitly supports GPT-2-class models: `find_layers` matches transformers'
`Conv1D` modules and the solver transposes their (in, out) weight storage
(reference gptq.py:62-64,89-93 — Conv1D is the one HF layer type stored
activation-major). In this framework linear kernels are (in, out) NATIVELY,
so Conv1D maps 1:1 with no transpose (models/hf_loader.py `_Mapper.conv1d`);
the arch delta is just: learned positions (offset 0), pre-LN blocks, one
fused c_attn projection in [Q|K|V] block layout, tanh-GELU MLP, tied head.

The fused c_attn uses the BLOCK layout (all Q heads, then all K, then all V)
— unlike NeoX's per-head interleave — so naive column-sharding would split
q/k/v across shards. Tensor parallelism handles this with a LOAD-TIME column
re-layout into per-shard [Q_i|K_i|V_i] groups
(parallel/tp_model._relayout_qkv_blocks): each shard_map shard then sees a
local c_attn whose split-by-thirds is exactly this file's `layer` code with
the local head count. The plain jit-sharding fallback keeps the natural
layout (XLA reshards the slices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import (activation, apply_kv_cache, attention_block, causal_mask, layer_norm,
                     row_parallel_apply, sdpa)
from .config import ModelConfig
from ..ops.linear import dense, linear_apply

NAME = "gpt2"

LAYER_LINEARS = ("attn.c_attn", "attn.c_proj", "mlp.c_fc", "mlp.c_proj")


def sequential_groups(true_sequential: bool):
    # reference parity: the generic (non-true-sequential) one-group order;
    # with --true-sequential, attention before MLP (llama.py:67-76 pattern)
    if true_sequential:
        return [["attn.c_attn"], ["attn.c_proj"], ["mlp.c_fc"], ["mlp.c_proj"]]
    return [list(LAYER_LINEARS)]


def init_params(cfg: ModelConfig, rng, dtype=jnp.bfloat16):
    keys = iter(jax.random.split(rng, 4 + cfg.num_layers * 6))
    hid, inter = cfg.hidden_size, cfg.intermediate_size

    def lin(k, i, o):
        w = (jax.random.normal(k, (i, o), jnp.float32) * (i ** -0.5)).astype(dtype)
        return dense(w, jnp.zeros((o,), dtype))

    def ln():
        return {"w": jnp.ones((hid,), dtype), "b": jnp.zeros((hid,), dtype)}

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "ln_1": ln(),
            "ln_2": ln(),
            "attn": {
                "c_attn": lin(next(keys), hid, 3 * hid),
                "c_proj": lin(next(keys), hid, hid),
            },
            "mlp": {
                "c_fc": lin(next(keys), hid, inter),
                "c_proj": lin(next(keys), inter, hid),
            },
        })
    wte = jax.random.normal(next(keys), (cfg.vocab_size, hid),
                            jnp.float32).astype(dtype) * 0.02
    return {
        "wte": wte,
        "wpe": jax.random.normal(next(keys), (cfg.max_seq_len, hid),
                                 jnp.float32).astype(dtype) * 0.01,
        "layers": layers,
        "ln_f": ln(),
        "lm_head": dense(wte.T),  # GPT-2 always ties (HF GPT2LMHeadModel)
    }


def embed(params, cfg: ModelConfig, input_ids, positions=None):
    b, s = input_ids.shape
    x = jnp.take(params["wte"], input_ids, axis=0)
    if positions is None:
        positions = jnp.arange(s)[None, :]
    return x + jnp.take(params["wpe"], positions, axis=0)


def step_rope(cfg: ModelConfig, positions, dtype):
    return None  # learned position embeddings (no rotary)


def layer(cfg: ModelConfig, lp, x, positions, mask, past_kv=None, rope=None,
          tp_ctx=None):
    b, s, _ = x.shape
    h = cfg.num_heads * cfg.head_dim
    ln1 = layer_norm(x, lp["ln_1"]["w"], lp["ln_1"]["b"], cfg.norm_eps)
    qkv = linear_apply(lp["attn"]["c_attn"], ln1)
    # HF GPT2Attention block layout: [all Q heads | all K | all V]
    q = qkv[..., :h].reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = qkv[..., h:2 * h].reshape(b, s, cfg.num_heads, cfg.head_dim)
    v = qkv[..., 2 * h:].reshape(b, s, cfg.num_heads, cfg.head_dim)
    attn_out, present = attention_block(past_kv, q, k, v, mask)
    attn_out = attn_out.reshape(b, s, -1)
    o = row_parallel_apply(lp["attn"]["c_proj"], attn_out, tp_ctx)
    x = x + o

    ln2 = layer_norm(x, lp["ln_2"]["w"], lp["ln_2"]["b"], cfg.norm_eps)
    fc_out = linear_apply(lp["mlp"]["c_fc"], ln2)
    act_out = activation(cfg.act)(fc_out)
    mlp_out = row_parallel_apply(lp["mlp"]["c_proj"], act_out, tp_ctx)
    y = x + mlp_out

    taps = {
        "attn.c_attn": ln1, "attn.c_proj": attn_out,
        "mlp.c_fc": ln2, "mlp.c_proj": act_out,
    }
    return y, taps, present


def head_input(params, cfg: ModelConfig, x):
    """Activation feeding lm_head (final layer norm output)."""
    return layer_norm(x, params["ln_f"]["w"], params["ln_f"]["b"],
                      cfg.norm_eps)


def head(params, cfg: ModelConfig, x):
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
