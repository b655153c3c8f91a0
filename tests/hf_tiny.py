"""Helpers: build tiny random HF checkpoints on disk for loader/parity tests."""

from __future__ import annotations

import numpy as np


def tiny_llama_dir(tmpdir, vocab=128, hidden=32, inter=64, layers=2, heads=4):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
                      num_hidden_layers=layers, num_attention_heads=heads,
                      num_key_value_heads=heads, max_position_embeddings=256,
                      rms_norm_eps=1e-6, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval().float()
    model.save_pretrained(str(tmpdir), safe_serialization=True)
    return str(tmpdir), model


def tiny_opt_dir(tmpdir, vocab=128, hidden=32, inter=64, layers=2, heads=4,
                 word_embed_proj_dim=None, do_layer_norm_before=True):
    import torch
    from transformers import OPTConfig, OPTForCausalLM
    cfg = OPTConfig(vocab_size=vocab, hidden_size=hidden, ffn_dim=inter,
                    num_hidden_layers=layers, num_attention_heads=heads,
                    max_position_embeddings=64,
                    word_embed_proj_dim=word_embed_proj_dim or hidden,
                    do_layer_norm_before=do_layer_norm_before)
    torch.manual_seed(1)
    model = OPTForCausalLM(cfg).eval().float()
    model.save_pretrained(str(tmpdir), safe_serialization=True)
    return str(tmpdir), model


def tiny_gpt2_dir(tmpdir, vocab=128, hidden=32, inter=64, layers=2, heads=4):
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel
    cfg = GPT2Config(vocab_size=vocab, n_embd=hidden, n_inner=inter,
                     n_layer=layers, n_head=heads, n_positions=64,
                     activation_function="gelu_new")
    torch.manual_seed(3)
    model = GPT2LMHeadModel(cfg).eval().float()
    model.save_pretrained(str(tmpdir), safe_serialization=True)
    return str(tmpdir), model


def tiny_neox_dir(tmpdir, vocab=128, hidden=32, inter=64, layers=2, heads=4,
                  rotary_pct=0.5, parallel=True):
    import torch
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM
    cfg = GPTNeoXConfig(vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
                        num_hidden_layers=layers, num_attention_heads=heads,
                        max_position_embeddings=64, rotary_pct=rotary_pct,
                        use_parallel_residual=parallel, hidden_act="gelu")
    torch.manual_seed(2)
    model = GPTNeoXForCausalLM(cfg).eval().float()
    model.save_pretrained(str(tmpdir), safe_serialization=True)
    return str(tmpdir), model
