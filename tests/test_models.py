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


def test_gpt2_forward_matches_hf(tmp_path):
    d, m = hf_tiny.tiny_gpt2_dir(tmp_path)
    _run(d, m, "gpt2")


def test_gpt2_quantize_pack_reload_decode(tmp_path):
    """GPT-2-class end to end: Conv1D (in,out) capture -> GPTQ -> pack ->
    save -> hf_loader reload -> KV-cached decode matches full forward.
    (The reference's Conv1D transpose capture, gptq.py:62-64,89-93.)"""
    import jax
    from gptq_for_llama_tpu.data import get_loaders
    from gptq_for_llama_tpu.engine import (QuantizeSpec, pack_model,
                                           quantize_model, save_packed)
    from gptq_for_llama_tpu.runtime import ModelRunner

    d, _ = hf_tiny.tiny_gpt2_dir(tmp_path / "model")
    cfg, params = hf_loader.load_params(d, dtype=jnp.float32, seqlen=32)
    train, _ = get_loaders("synthetic", nsamples=4, seed=0, seqlen=32, model=cfg)
    spec = QuantizeSpec(wbits=4, groupsize=16, chunk=4, true_sequential=True)
    params, quantizers, _ = quantize_model("gpt2", cfg, params, train, spec,
                                           verbose=False)
    assert len(quantizers) == cfg.num_layers * 4
    params = pack_model("gpt2", cfg, params, quantizers, dtype=jnp.float32)
    out = tmp_path / "packed"
    save_packed(str(out), "gpt2", cfg, params, quantizers, spec)
    cfg2, reloaded = hf_loader.load_params(str(out), dtype=jnp.float32,
                                           seqlen=32)
    assert cfg2.arch == "gpt2"
    arch = registry.get_arch("gpt2")
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 12)).astype(np.int32)
    want = np.asarray(arch.forward(reloaded, cfg2, jnp.asarray(ids)))
    # packed buffers byte-exact through the save/load roundtrip
    np.testing.assert_allclose(
        want, np.asarray(arch.forward(params, cfg, jnp.asarray(ids))),
        atol=2e-4, rtol=1e-3)
    # KV-cached decode parity on the reloaded packed model
    runner = ModelRunner("gpt2", cfg2, reloaded, batch_size=1, max_seq_len=16,
                         dtype=jnp.float32)
    cache = runner.init_cache()
    logits_p, cache = runner.prefill(jnp.asarray(ids[:, :8]), cache)
    got = [np.asarray(logits_p)]
    for i in range(8, 12):
        logits_d, cache = runner.decode(jnp.asarray(ids[:, i:i + 1]), cache)
        got.append(np.asarray(logits_d))
    np.testing.assert_allclose(np.concatenate(got, axis=1), want,
                               atol=2e-4, rtol=1e-3)


def test_gpt2_tp_rules_present():
    """gpt2 TP is supported via the load-time c_attn column re-layout
    (parallel/tp_model._relayout_qkv_blocks); parity on the virtual mesh is
    covered by tests/test_tp_model.py::test_shard_map_tp_matches_unsharded.
    Unknown arches still get an actionable rejection."""
    from gptq_for_llama_tpu.parallel.sharding import tp_rules
    rules = tp_rules("gpt2")
    assert rules["attn.c_attn"] == "col" and rules["attn.c_proj"] == "row"
    with pytest.raises(ValueError, match="not supported"):
        tp_rules("mamba")
