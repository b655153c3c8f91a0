"""Model configuration shared by all supported decoder-only architectures."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    arch: str                       # 'llama' | 'opt' | 'neox' | 'gpt2'
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    max_seq_len: int                # model.seqlen (reference: llama.py:23, opt.py:24)
    norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rotary_pct: float = 1.0         # neox partial rotary
    act: str = "silu"               # 'silu' | 'relu' | 'gelu'
    parallel_residual: bool = False  # neox use_parallel_residual
    tie_word_embeddings: bool = False
    # OPT specifics (reference: opt.py:38-41, 207-220)
    do_layer_norm_before: bool = True
    word_embed_proj_dim: Optional[int] = None   # project_in/out when != hidden
    pos_embedding: str = "rope"     # 'rope' | 'learned' (OPT: offset-2 learned)
    attn_bias: bool = False
    mlp_bias: bool = False
    final_norm: bool = True
    dtype: str = "bfloat16"

    @property
    def kv_groups(self) -> int:
        return self.num_heads // self.num_kv_heads


def _load_hf_config(model_path: str) -> dict:
    with open(os.path.join(model_path, "config.json")) as f:
        return json.load(f)


def config_from_hf(model_path: str, seqlen: Optional[int] = None) -> ModelConfig:
    """Build a ModelConfig from a HF checkpoint directory's config.json."""
    hf = _load_hf_config(model_path)
    mt = hf.get("model_type", "")
    if mt == "llama":
        hidden = hf["hidden_size"]
        heads = hf["num_attention_heads"]
        return ModelConfig(
            arch="llama", vocab_size=hf["vocab_size"], hidden_size=hidden,
            intermediate_size=hf["intermediate_size"], num_layers=hf["num_hidden_layers"],
            num_heads=heads, num_kv_heads=hf.get("num_key_value_heads", heads),
            head_dim=hf.get("head_dim", hidden // heads),
            max_seq_len=seqlen or 2048,  # reference pins llama seqlen=2048 (llama.py:23)
            norm_eps=hf.get("rms_norm_eps", 1e-6),
            rope_theta=hf.get("rope_theta", 10000.0),
            act=hf.get("hidden_act", "silu"),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
        )
    if mt == "opt":
        hidden = hf["hidden_size"]
        return ModelConfig(
            arch="opt", vocab_size=hf["vocab_size"], hidden_size=hidden,
            intermediate_size=hf["ffn_dim"], num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"], num_kv_heads=hf["num_attention_heads"],
            head_dim=hidden // hf["num_attention_heads"],
            max_seq_len=seqlen or hf.get("max_position_embeddings", 2048),
            norm_eps=1e-5, act=hf.get("activation_function", "relu"),
            do_layer_norm_before=hf.get("do_layer_norm_before", True),
            word_embed_proj_dim=(hf.get("word_embed_proj_dim")
                                 if hf.get("word_embed_proj_dim", hidden) != hidden else None),
            pos_embedding="learned", attn_bias=True, mlp_bias=True,
            tie_word_embeddings=hf.get("tie_word_embeddings", True),
        )
    if mt == "gpt_neox":
        hidden = hf["hidden_size"]
        return ModelConfig(
            arch="neox", vocab_size=hf["vocab_size"], hidden_size=hidden,
            intermediate_size=hf["intermediate_size"], num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"], num_kv_heads=hf["num_attention_heads"],
            head_dim=hidden // hf["num_attention_heads"],
            max_seq_len=seqlen or hf.get("max_position_embeddings", 2048),
            norm_eps=hf.get("layer_norm_eps", 1e-5),
            rope_theta=hf.get("rotary_emb_base", 10000.0),
            rotary_pct=hf.get("rotary_pct", 1.0),
            act=hf.get("hidden_act", "gelu"),
            parallel_residual=hf.get("use_parallel_residual", True),
            attn_bias=True, mlp_bias=True,
        )
    if mt == "gpt2":
        hidden = hf["n_embd"]
        heads = hf["n_head"]
        return ModelConfig(
            arch="gpt2", vocab_size=hf["vocab_size"], hidden_size=hidden,
            intermediate_size=hf.get("n_inner") or 4 * hidden,
            num_layers=hf["n_layer"], num_heads=heads, num_kv_heads=heads,
            head_dim=hidden // heads,
            max_seq_len=seqlen or hf.get("n_positions", 1024),
            norm_eps=hf.get("layer_norm_epsilon", 1e-5),
            act=hf.get("activation_function", "gelu_new"),
            pos_embedding="learned", attn_bias=True, mlp_bias=True,
            tie_word_embeddings=True,  # GPT2LMHeadModel always ties
        )
    raise ValueError(f"Unsupported model_type {mt!r} in {model_path}")
