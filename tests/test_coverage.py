"""Coverage for the less-traveled configurations: GQA, heterogeneous
(--observe) checkpoints, ternary (trits) eval, per-tensor bits inference,
and the CLI end-to-end."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gptq_for_llama_tpu.data import get_loaders
from gptq_for_llama_tpu.engine import (QuantizeSpec, pack_model, perplexity,
                                       quantize_model, save_packed)
from gptq_for_llama_tpu.models import hf_loader, registry
from gptq_for_llama_tpu.models.config import ModelConfig
from gptq_for_llama_tpu.runtime import ModelRunner

import hf_tiny


def test_gqa_llama_forward_and_decode(tmp_path):
    """num_kv_heads < num_heads (llama2-70B style) through HF parity + cache."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg_hf = LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=64,
                         tie_word_embeddings=False)
    torch.manual_seed(3)
    model = LlamaForCausalLM(cfg_hf).eval().float()
    model.save_pretrained(str(tmp_path), safe_serialization=True)

    cfg, params = hf_loader.load_params(str(tmp_path), dtype=jnp.float32,
                                        seqlen=32)
    assert cfg.num_kv_heads == 2
    arch = registry.get_arch("llama")
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(1, 12)).astype(np.int32)
    ours = np.asarray(arch.forward(params, cfg, jnp.asarray(ids)))
    with torch.no_grad():
        theirs = model(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)

    # cached decode parity with GQA cache (kv heads = 2)
    runner = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=16,
                         dtype=jnp.float32)
    cache = runner.init_cache()
    assert cache.k.shape[3] == 2
    lp_, cache = runner.prefill(jnp.asarray(ids[:, :8]), cache)
    np.testing.assert_allclose(np.asarray(lp_), ours[:, :8], atol=2e-4,
                               rtol=1e-3)


def test_heterogeneous_checkpoint_roundtrip(tmp_path):
    """--observe produces mixed wbits; save/load must infer bits per tensor."""
    d, _ = hf_tiny.tiny_llama_dir(tmp_path / "m")
    cfg, params = hf_loader.load_params(d, dtype=jnp.float32, seqlen=32)
    params8 = jax.tree_util.tree_map(lambda x: x, params)
    train, _ = get_loaders("synthetic", nsamples=4, seed=0, seqlen=32, model=cfg)
    spec = QuantizeSpec(wbits=4, groupsize=16, chunk=4)
    params, quantizers, _ = quantize_model("llama", cfg, params, train, spec,
                                           verbose=False)
    # splice an 8-bit layer 0 (what a real --observe upgrade produces)
    spec8 = QuantizeSpec(wbits=8, groupsize=16, chunk=4)
    params8, quantizers8, _ = quantize_model("llama", cfg, params8, train,
                                             spec8, verbose=False)
    params["layers"][0] = params8["layers"][0]
    for key in list(quantizers):
        if key.startswith("layers.0."):
            quantizers[key] = quantizers8[key]
    bits_used = {r.wbits for r in quantizers.values()}
    assert bits_used == {4, 8}

    arch = registry.get_arch("llama")
    ids = jnp.asarray(np.arange(16, dtype=np.int32)[None] % cfg.vocab_size)
    want = np.asarray(arch.forward(params, cfg, ids))
    params = pack_model("llama", cfg, params, quantizers, dtype=jnp.float32)
    out = str(tmp_path / "packed")
    save_packed(out, "llama", cfg, params, quantizers, spec)
    cfg2, params2 = hf_loader.load_params(out, dtype=jnp.float32, seqlen=32)
    lin_bits = {params2["layers"][i]["self_attn"]["q_proj"].bits
                for i in range(cfg.num_layers)}
    got = np.asarray(arch.forward(params2, cfg2, ids))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=0)
    # heterogeneous layers cannot stack; runner must still work (unrolled)
    runner = ModelRunner("llama", cfg2, params2, batch_size=1, max_seq_len=16,
                         dtype=jnp.float32)
    if len(lin_bits) > 1:
        assert runner.stacked is None
    cache = runner.init_cache()
    logits, _ = runner.prefill(ids[:, :8], cache)
    np.testing.assert_allclose(np.asarray(logits), want[:, :8], atol=5e-3,
                               rtol=0)


def test_trits_eval(tmp_path):
    """Ternary mode (--trits): fake-quant eval path (reference opt.py:91)."""
    d, _ = hf_tiny.tiny_llama_dir(tmp_path)
    cfg, params = hf_loader.load_params(d, dtype=jnp.float32, seqlen=32)
    train, test = get_loaders("synthetic", nsamples=4, seed=0, seqlen=32,
                              model=cfg)
    spec = QuantizeSpec(wbits=2, trits=True, chunk=4)
    params, quantizers, _ = quantize_model("llama", cfg, params, train, spec,
                                           verbose=False)
    ppl = perplexity("llama", cfg, params, test[:32 * 16], seqlen=32)
    assert np.isfinite(ppl)


def test_cli_end_to_end(tmp_path, capsys):
    """The CLI surface: quantize -> save -> reload -> benchmark."""
    from gptq_for_llama_tpu.cli.main import main
    d, _ = hf_tiny.tiny_llama_dir(tmp_path / "m")
    out = str(tmp_path / "packed")
    main([str(d), "synthetic", "--wbits", "4", "--groupsize", "16",
          "--nsamples", "4", "--chunk", "4", "--seqlen", "32",
          "--save", out])
    assert os.path.exists(os.path.join(out, "model.safetensors"))
    main([str(d), "synthetic", "--load", out, "--seqlen", "32",
          "--benchmark", "8", "--check"])
    captured = capsys.readouterr().out
    line = [l for l in captured.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["tokens"] == 8 and np.isfinite(res["ppl"])


def test_cli_dp_calibration_matches_single(tmp_path, capsys):
    """--dp shards the calibration batch over the mesh; the packed result
    must match the single-device quantization bit for bit."""
    from gptq_for_llama_tpu.cli.main import main
    from safetensors.numpy import load_file
    d, _ = hf_tiny.tiny_llama_dir(tmp_path / "m")
    out1, out2 = str(tmp_path / "p1"), str(tmp_path / "p2")
    args = [str(d), "synthetic", "--wbits", "4", "--groupsize", "16",
            "--nsamples", "4", "--chunk", "4", "--seqlen", "32"]
    main(args + ["--save", out1])
    main(args + ["--save", out2, "--dp", "2"])
    a = load_file(os.path.join(out1, "model.safetensors"))
    b = load_file(os.path.join(out2, "model.safetensors"))
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_quantized_lm_head_roundtrip(tmp_path):
    """Opt-in lm_head quantization (beyond the reference, llama.py:270):
    GPTQ'd head packs, saves, reloads, and the packed model's logits equal the
    fake-quantized dense model's logits (same exactness bar as layer linears)."""
    import jax
    import jax.numpy as jnp
    from gptq_for_llama_tpu.data import get_loaders
    from gptq_for_llama_tpu.engine import (QuantizeSpec, pack_model,
                                           quantize_model)
    from gptq_for_llama_tpu.engine.checkpoint import save_packed
    from gptq_for_llama_tpu.models.hf_loader import load_params
    from gptq_for_llama_tpu.models import registry
    from gptq_for_llama_tpu.models.config import ModelConfig
    from gptq_for_llama_tpu.ops.linear import PackedLinear

    cfg = ModelConfig(arch="llama", vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_layers=2, num_heads=4,
                      num_kv_heads=4, head_dim=16, max_seq_len=64)
    arch = registry.get_arch("llama")
    params = arch.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    train, _ = get_loaders("synthetic", nsamples=4, seed=0, seqlen=32, model=cfg)
    spec = QuantizeSpec(wbits=4, groupsize=32, chunk=4, quantize_lm_head=True)
    params, quantizers, _ = quantize_model("llama", cfg, params, train, spec,
                                           verbose=False)
    assert "lm_head" in quantizers
    ids = jnp.asarray((np.arange(16) % cfg.vocab_size)[None].astype(np.int32))
    fake_logits = np.asarray(arch.forward(params, cfg, ids), np.float32)

    packed = pack_model("llama", cfg, params, quantizers, dtype=jnp.float32)
    assert isinstance(packed["lm_head"], PackedLinear)
    packed_logits = np.asarray(arch.forward(packed, cfg, ids), np.float32)
    # wire scales are fp16 (reference format): packed differs from the f32
    # fake-quant grid by scale-rounding; same-argmax + small relative error
    np.testing.assert_allclose(packed_logits, fake_logits, atol=1e-2, rtol=1e-2)
    np.testing.assert_array_equal(packed_logits.argmax(-1), fake_logits.argmax(-1))

    out = str(tmp_path / "ckpt")
    save_packed(out, "llama", cfg, packed, quantizers=quantizers, spec=spec)
    cfg2, params2 = load_params(out, dtype=jnp.float32,
                                seqlen=cfg.max_seq_len)
    assert isinstance(params2["lm_head"], PackedLinear)
    re_logits = np.asarray(arch.forward(params2, cfg2, ids), np.float32)
    np.testing.assert_allclose(re_logits, packed_logits, atol=1e-5, rtol=1e-5)
