"""Model forward parity vs HuggingFace transformers (torch CPU) on tiny checkpoints."""

import numpy as np
import jax.numpy as jnp
import pytest

from gptq_for_llama_tpu.models import hf_loader, registry
import hf_tiny


def _logits_close(ours, theirs, atol=2e-3):
    ours = np.asarray(ours, dtype=np.float32)
    theirs = theirs.detach().float().numpy()
    np.testing.assert_allclose(ours, theirs, atol=atol, rtol=1e-3)


def _run(model_dir, hf_model, arch_name, seqlen=16):
    import torch
    cfg, params = hf_loader.load_params(model_dir, dtype=jnp.float32, seqlen=64)
    assert cfg.arch == arch_name
    arch = registry.get_arch(cfg.arch)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, seqlen))
    ours = arch.forward(params, cfg, jnp.asarray(ids, jnp.int32))
    with torch.no_grad():
        theirs = hf_model(torch.tensor(ids)).logits
    _logits_close(ours, theirs)
    return cfg, params


def test_llama_forward_matches_hf(tmp_path):
    d, m = hf_tiny.tiny_llama_dir(tmp_path)
    _run(d, m, "llama")


def test_opt_forward_matches_hf(tmp_path):
    d, m = hf_tiny.tiny_opt_dir(tmp_path)
    _run(d, m, "opt")


def test_opt_projected_forward_matches_hf(tmp_path):
    # OPT-350M style: word_embed_proj_dim != hidden -> project_in/out
    d, m = hf_tiny.tiny_opt_dir(tmp_path, word_embed_proj_dim=16,
                                do_layer_norm_before=False)
    _run(d, m, "opt")


def test_neox_forward_matches_hf(tmp_path):
    d, m = hf_tiny.tiny_neox_dir(tmp_path)
    _run(d, m, "neox")


def test_neox_sequential_residual_matches_hf(tmp_path):
    d, m = hf_tiny.tiny_neox_dir(tmp_path, parallel=False, rotary_pct=1.0)
    _run(d, m, "neox")


def test_layer_taps_shapes(tmp_path):
    d, m = hf_tiny.tiny_llama_dir(tmp_path)
    cfg, params = hf_loader.load_params(d, dtype=jnp.float32, seqlen=64)
    arch = registry.get_arch("llama")
    from gptq_for_llama_tpu.models.common import causal_mask
    x = jnp.ones((1, 8, cfg.hidden_size), jnp.float32)
    pos = jnp.arange(8)[None]
    _, taps, (k, v) = arch.layer(cfg, params["layers"][0], x, pos, causal_mask(8, 8))
    assert set(taps) == set(arch.LAYER_LINEARS)
    assert taps["mlp.down_proj"].shape == (1, 8, cfg.intermediate_size)
    assert k.shape == (1, 8, cfg.num_kv_heads, cfg.head_dim)
