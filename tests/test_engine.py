"""End-to-end engine tests: quantize -> eval -> pack -> save -> reload -> parity.

This is the framework's integration-test slice (SURVEY.md §7 step 3): the
reference has no tests — its 'test' is matching published ppl (SURVEY.md §4).
Here a tiny random llama quantized at 4-bit must (a) beat nothing but stay close
to the fp32 ppl, (b) produce a packed checkpoint whose forward matches the
fake-quantized forward exactly, and (c) round-trip through save/load.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gptq_for_llama_tpu.data import get_loaders
from gptq_for_llama_tpu.engine import (QuantizeSpec, pack_model, perplexity,
                                       quantize_model, save_packed,
                                       export_quant_table)
from gptq_for_llama_tpu.models import hf_loader, registry
from gptq_for_llama_tpu.models.config import ModelConfig
from gptq_for_llama_tpu.ops.linear import PackedLinear

import hf_tiny


SEQLEN = 32


def _tiny_llama(tmp_path, seqlen=SEQLEN):
    d, _ = hf_tiny.tiny_llama_dir(tmp_path)
    cfg, params = hf_loader.load_params(d, dtype=jnp.float32, seqlen=seqlen)
    return cfg, params


def _data(cfg, nsamples=8, seqlen=SEQLEN):
    train, test = get_loaders("synthetic", nsamples=nsamples, seed=0,
                              seqlen=seqlen, model=cfg)
    return train, test[: seqlen * 48]  # cap eval windows for CI speed


def test_quantize_eval_pack_roundtrip(tmp_path):
    cfg, params = _tiny_llama(tmp_path / "m")
    train, test = _data(cfg)
    fp_ppl = perplexity("llama", cfg, params, test, seqlen=SEQLEN)

    spec = QuantizeSpec(wbits=4, groupsize=16, chunk=4, true_sequential=True)
    params, quantizers, _ = quantize_model("llama", cfg, params, train, spec,
                                           verbose=False)
    assert len(quantizers) == cfg.num_layers * 7
    q_ppl = perplexity("llama", cfg, params, test, seqlen=SEQLEN)
    # random tiny models quantize loosely; just require sane degradation
    assert q_ppl < fp_ppl * 2.0 + 10

    # logits before packing (fake-quant dense forward)
    arch = registry.get_arch("llama")
    ids = jnp.asarray(np.arange(SEQLEN, dtype=np.int32)[None] % cfg.vocab_size)
    logits_fake = arch.forward(params, cfg, ids)

    params = pack_model("llama", cfg, params, quantizers, dtype=jnp.float32)
    assert isinstance(params["layers"][0]["self_attn"]["q_proj"], PackedLinear)
    logits_packed = arch.forward(params, cfg, ids)
    # pack/unpack is exact on the fake-quantized grid (fp32 path)
    np.testing.assert_allclose(np.asarray(logits_packed), np.asarray(logits_fake),
                               atol=5e-3, rtol=0)

    # save -> reload -> same logits
    out = str(tmp_path / "packed")
    save_packed(out, "llama", cfg, params, quantizers, spec)
    cfg2, params2 = hf_loader.load_params(out, dtype=jnp.float32, seqlen=SEQLEN)
    assert params2["layers"][0]["self_attn"]["q_proj"].bits == 4
    logits_reload = arch.forward(params2, cfg2, ids)
    np.testing.assert_allclose(np.asarray(logits_reload), np.asarray(logits_packed),
                               atol=5e-3, rtol=0)


def test_act_order_pack_parity(tmp_path):
    """act-order produces non-monotone g_idx; packed forward must still match."""
    cfg, params = _tiny_llama(tmp_path / "m")
    train, _ = _data(cfg)
    spec = QuantizeSpec(wbits=4, groupsize=8, chunk=4, act_order=True)
    params, quantizers, _ = quantize_model("llama", cfg, params, train, spec,
                                           verbose=False)
    g = quantizers["layers.0.self_attn.q_proj"].g_idx
    assert np.any(np.diff(g) < 0), "act-order should permute group ids"

    arch = registry.get_arch("llama")
    ids = jnp.asarray(np.arange(SEQLEN, dtype=np.int32)[None] % cfg.vocab_size)
    logits_fake = arch.forward(params, cfg, ids)
    params = pack_model("llama", cfg, params, quantizers, dtype=jnp.float32)
    lin = params["layers"][0]["self_attn"]["q_proj"]
    assert lin.perm is not None, "group-sorted layout should be active"
    logits_packed = arch.forward(params, cfg, ids)
    np.testing.assert_allclose(np.asarray(logits_packed), np.asarray(logits_fake),
                               atol=5e-3, rtol=0)


def test_rtn_baseline(tmp_path):
    cfg, params = _tiny_llama(tmp_path / "m")
    train, test = _data(cfg, nsamples=4)
    spec = QuantizeSpec(wbits=8, nearest=True, chunk=4)
    params, quantizers, _ = quantize_model("llama", cfg, params, train, spec,
                                           verbose=False)
    assert all(r.wbits == 8 for r in quantizers.values())
    ppl = perplexity("llama", cfg, params, test, seqlen=SEQLEN)
    assert np.isfinite(ppl)


def test_3bit_roundtrip(tmp_path):
    cfg, params = _tiny_llama(tmp_path / "m")
    train, _ = _data(cfg, nsamples=4)
    spec = QuantizeSpec(wbits=3, groupsize=16, chunk=4)
    params, quantizers, _ = quantize_model("llama", cfg, params, train, spec,
                                           verbose=False)
    arch = registry.get_arch("llama")
    ids = jnp.asarray(np.arange(SEQLEN, dtype=np.int32)[None] % cfg.vocab_size)
    logits_fake = arch.forward(params, cfg, ids)
    params = pack_model("llama", cfg, params, quantizers, dtype=jnp.float32)
    logits_packed = arch.forward(params, cfg, ids)
    np.testing.assert_allclose(np.asarray(logits_packed), np.asarray(logits_fake),
                               atol=5e-3, rtol=0)

    out = str(tmp_path / "packed3")
    save_packed(out, "llama", cfg, params, quantizers, spec)
    cfg2, params2 = hf_loader.load_params(out, dtype=jnp.float32, seqlen=SEQLEN)
    q = params2["layers"][0]["self_attn"]["q_proj"]
    # INT3 checkpoints land on the 4-bit nibble DEVICE layout (wire stays 3)
    assert q.wire_bits == 3 and q.bits == 4
    assert q.to_wire()["qweight"].shape[0] == cfg.hidden_size * 3 // 32


def test_observe_auto_upgrade(tmp_path):
    cfg, params = _tiny_llama(tmp_path / "m")
    train, _ = _data(cfg, nsamples=4)
    spec = QuantizeSpec(wbits=2, groupsize=16, chunk=4, observe=True)
    params, quantizers, obs = quantize_model("llama", cfg, params, train, spec,
                                             verbose=False)
    assert len(obs.items) > 0
    # at least one layer should have been upgraded past 2 bits
    assert any(r.wbits > 2 for r in quantizers.values())


def test_opt_and_neox_quantize(tmp_path):
    for builder, arch_name in ((hf_tiny.tiny_opt_dir, "opt"),
                               (hf_tiny.tiny_neox_dir, "neox")):
        d, _ = builder(tmp_path / arch_name)
        cfg, params = hf_loader.load_params(str(d), dtype=jnp.float32, seqlen=SEQLEN)
        train, test = _data(cfg, nsamples=4)
        spec = QuantizeSpec(wbits=4, groupsize=16, chunk=4)
        params, quantizers, _ = quantize_model(arch_name, cfg, params, train, spec,
                                               verbose=False)
        arch = registry.get_arch(arch_name)
        assert len(quantizers) == cfg.num_layers * len(arch.LAYER_LINEARS)
        ppl = perplexity(arch_name, cfg, params, test, seqlen=SEQLEN)
        assert np.isfinite(ppl)
        # pack + forward parity
        ids = jnp.asarray(np.arange(SEQLEN, dtype=np.int32)[None] % cfg.vocab_size)
        logits_fake = arch.forward(params, cfg, ids)
        params = pack_model(arch_name, cfg, params, quantizers, dtype=jnp.float32)
        logits_packed = arch.forward(params, cfg, ids)
        np.testing.assert_allclose(np.asarray(logits_packed),
                                   np.asarray(logits_fake), atol=5e-3, rtol=0)


def test_quantize_resume(tmp_path):
    """Interrupted quantization resumes from the per-layer checkpoint dir and
    produces identical results (no reference equivalent, SURVEY.md §5)."""
    cfg, params = _tiny_llama(tmp_path / "m")
    params2 = jax.tree_util.tree_map(lambda x: x, params)
    train, _ = _data(cfg, nsamples=4)
    spec = QuantizeSpec(wbits=4, groupsize=16, chunk=4)
    rdir = str(tmp_path / "resume")

    p_full, q_full, _ = quantize_model("llama", cfg, params, train, spec,
                                       verbose=False, resume_dir=rdir)
    # simulate a crash after layer 0: delete layer 1's checkpoint, re-run
    import os
    os.remove(os.path.join(rdir, "layer_0001.npz"))
    p_res, q_res, _ = quantize_model("llama", cfg, params2, train, spec,
                                     verbose=False, resume_dir=rdir)
    for key in q_full:
        np.testing.assert_array_equal(q_res[key].g_idx, q_full[key].g_idx)
        np.testing.assert_allclose(q_res[key].scale, q_full[key].scale,
                                   rtol=1e-6)
    k_full = p_full["layers"][1]["mlp"]["down_proj"]["kernel"]
    k_res = p_res["layers"][1]["mlp"]["down_proj"]["kernel"]
    np.testing.assert_allclose(np.asarray(k_res), np.asarray(k_full),
                               rtol=1e-6, atol=1e-7)


def test_export_quant_table(tmp_path):
    cfg, params = _tiny_llama(tmp_path / "m")
    train, _ = _data(cfg, nsamples=4)
    spec = QuantizeSpec(wbits=4, groupsize=16, chunk=4)
    _, quantizers, _ = quantize_model("llama", cfg, params, train, spec,
                                      verbose=False)
    qdir = str(tmp_path / "qtable")
    export_quant_table(quantizers, qdir)
    import os, tomllib
    with open(os.path.join(qdir, "quant.toml"), "rb") as f:
        manifest = tomllib.load(f)
    # dotted TOML table headers nest: [layers.0.self_attn.q_proj]
    entry = manifest["layers"]["0"]["self_attn"]["q_proj"]
    assert entry["wbits"] == 4
    scale = np.load(os.path.join(qdir, entry["scale"]))
    assert scale.shape[0] == cfg.num_heads * cfg.head_dim


def test_eval_batch_cap_respects_flash_gate(monkeypatch):
    """On TPU the eval batch is 8 only when the flash prefill kernel accepts
    the shape; gated-off shapes (e.g. GPT-2's head_dim 64) must keep the
    seqlen-scaled cap so the XLA fallback's logits transient stays bounded."""
    import jax
    from gptq_for_llama_tpu.engine.evaluate import _default_batch
    from gptq_for_llama_tpu.models.config import ModelConfig

    def cfg(head_dim):
        return ModelConfig(arch="llama", vocab_size=64, hidden_size=head_dim * 4,
                           intermediate_size=64, num_layers=1, num_heads=4,
                           num_kv_heads=4, head_dim=head_dim, max_seq_len=2048)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("GPTQ_TPU_ATTN_IMPL", raising=False)
    assert _default_batch(cfg(128), 2048) == 8           # flash-supported
    assert _default_batch(cfg(64), 2048) == 1            # gated off: scaled
    assert _default_batch(cfg(128), 200) == 8           # sq<=256: scaled cap, still 8
    monkeypatch.setenv("GPTQ_TPU_ATTN_IMPL", "xla")
    assert _default_batch(cfg(128), 2048) == 1           # forced XLA: scaled
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    monkeypatch.delenv("GPTQ_TPU_ATTN_IMPL", raising=False)
    assert _default_batch(cfg(128), 2048) == 1           # off-TPU: scaled
