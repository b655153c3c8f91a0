"""Runtime tests: KV-cached prefill/decode must match the plain causal forward,
generation must be deterministic when greedy, benchmark harness must report."""

import numpy as np
import jax
import jax.numpy as jnp

from gptq_for_llama_tpu.models import registry
from gptq_for_llama_tpu.models.config import ModelConfig
from gptq_for_llama_tpu.runtime import (ModelRunner, benchmark_decode, generate,
                                        sample_logits)


def _tiny_cfg(arch="llama", **kw):
    base = dict(arch=arch, vocab_size=64, hidden_size=32, intermediate_size=64,
                num_layers=2, num_heads=4, num_kv_heads=4, head_dim=8,
                max_seq_len=64)
    if arch == "opt":
        base.update(pos_embedding="learned", attn_bias=True, mlp_bias=True,
                    act="relu", norm_eps=1e-5)
    if arch == "neox":
        base.update(act="gelu", parallel_residual=True, rotary_pct=0.5,
                    attn_bias=True, mlp_bias=True, norm_eps=1e-5)
    base.update(kw)
    return ModelConfig(**base)


def _params(cfg):
    arch = registry.get_arch(cfg.arch)
    return arch.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)


def _check_cached_matches_full(arch_name, prompt_len=5, decode_len=4):
    cfg = _tiny_cfg(arch_name)
    params = _params(cfg)
    arch = registry.get_arch(arch_name)
    rng = np.random.default_rng(0)
    total = prompt_len + decode_len
    ids = rng.integers(0, cfg.vocab_size, size=(1, total)).astype(np.int32)

    full_logits = np.asarray(arch.forward(params, cfg, jnp.asarray(ids)))

    runner = ModelRunner(arch_name, cfg, params, batch_size=1, max_seq_len=16,
                         dtype=jnp.float32)
    cache = runner.init_cache()
    logits_p, cache = runner.prefill(jnp.asarray(ids[:, :prompt_len]), cache)
    got = [np.asarray(logits_p)]
    for i in range(prompt_len, total):
        logits_d, cache = runner.decode(jnp.asarray(ids[:, i:i + 1]), cache)
        got.append(np.asarray(logits_d))
    cached_logits = np.concatenate(got, axis=1)
    np.testing.assert_allclose(cached_logits, full_logits, atol=2e-4, rtol=1e-3)


def test_llama_cached_decode_matches_forward():
    _check_cached_matches_full("llama")


def test_opt_cached_decode_matches_forward():
    _check_cached_matches_full("opt")


def test_neox_cached_decode_matches_forward():
    _check_cached_matches_full("neox")


def test_greedy_generation_deterministic():
    cfg = _tiny_cfg()
    params = _params(cfg)
    runner = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                         dtype=jnp.float32)
    prompt = np.array([1, 2, 3], dtype=np.int32)
    out1 = generate(runner, prompt, max_new_tokens=8, temperature=0.0)
    out2 = generate(runner, prompt, max_new_tokens=8, temperature=0.0, seed=7)
    np.testing.assert_array_equal(out1, out2)
    assert out1.shape == (1, 11)


def test_sampling_top_p_restricts_support():
    logits = jnp.asarray(np.array([[10.0, 9.0, -50.0, -50.0]]))
    key = jax.random.PRNGKey(0)
    for i in range(8):
        tok = int(sample_logits(logits, jax.random.fold_in(key, i),
                                temperature=1.0, top_p=0.9)[0])
        assert tok in (0, 1)
    # greedy
    assert int(sample_logits(logits, key, 0.0, 1.0)[0]) == 0


def test_sampling_mode_fast_paths_match_general():
    """Static mode promises ('greedy'/'categorical') must reproduce the
    general sort+filter path exactly on inputs that satisfy them."""
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32) * 3)
    key = jax.random.PRNGKey(5)
    temps0 = jnp.zeros((4,), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(sample_logits(logits, key, temps0, 1.0, mode="greedy")),
        np.asarray(sample_logits(logits, key, temps0, 1.0)))
    temps = jnp.asarray([0.0, 0.7, 1.3, 2.0], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(sample_logits(logits, key, temps, 1.0,
                                 mode="categorical")),
        np.asarray(sample_logits(logits, key, temps, 1.0)))


def test_serving_sample_mode_selection():
    from gptq_for_llama_tpu.runtime.serve import ServingEngine
    live = np.array([True, False, True])
    state = {"live": live, "temps": np.array([0.0, 0.9, 0.0]),
             "tops": np.array([1.0, 0.5, 1.0])}
    assert ServingEngine._sample_mode(None, state) == "greedy"
    state["temps"][2] = 0.5
    assert ServingEngine._sample_mode(None, state) == "categorical"
    state["tops"][2] = 0.9
    assert ServingEngine._sample_mode(None, state) is None
    state["live"][:] = False  # nothing live: tokens are discarded anyway
    assert ServingEngine._sample_mode(None, state) == "greedy"


def test_decode_greedy_scan_matches_stepwise():
    cfg = _tiny_cfg()
    params = _params(cfg)
    runner = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                         dtype=jnp.float32)
    prompt = np.array([[1, 2, 3]], dtype=np.int32)
    # stepwise greedy
    want = generate(runner, prompt, max_new_tokens=6, temperature=0.0)[0, 3:]
    # scan greedy: prefill then 5 more steps from the first sampled token
    cache = runner.init_cache()
    logits, cache = runner.prefill(jnp.asarray(prompt), cache)
    tok0 = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    toks, _ = runner.decode_greedy_scan(tok0, cache, 5)
    got = np.concatenate([np.asarray(tok0)[0], np.asarray(toks)[0]])
    np.testing.assert_array_equal(got, want)


def test_benchmark_decode_reports():
    cfg = _tiny_cfg()
    params = _params(cfg)
    runner = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                         dtype=jnp.float32)
    ids = np.arange(12, dtype=np.int32) % cfg.vocab_size
    res = benchmark_decode(runner, ids, check=True, log=lambda *_: None)
    assert res["tokens"] == 12
    assert res["median_latency_s"] > 0
    assert np.isfinite(res["ppl"])


def test_fused_qkv_matches_unfused(tmp_path):
    """fuse_attention (make_quant_attn equivalent) must preserve logits."""
    import hf_tiny
    from gptq_for_llama_tpu.models import hf_loader
    from gptq_for_llama_tpu.data import get_loaders
    from gptq_for_llama_tpu.engine import QuantizeSpec, pack_model, quantize_model
    from gptq_for_llama_tpu.models.llama import fuse_attention
    d, _ = hf_tiny.tiny_llama_dir(tmp_path)
    cfg, params = hf_loader.load_params(d, dtype=jnp.float32, seqlen=32)
    train, _ = get_loaders("synthetic", nsamples=4, seed=0, seqlen=32, model=cfg)
    spec = QuantizeSpec(wbits=4, groupsize=16, chunk=4)
    params, quantizers, _ = quantize_model("llama", cfg, params, train, spec,
                                           verbose=False)
    params = pack_model("llama", cfg, params, quantizers, dtype=jnp.float32)
    arch = registry.get_arch("llama")
    ids = np.arange(10, dtype=np.int32)[None] % cfg.vocab_size
    want = np.asarray(arch.forward(params, cfg, jnp.asarray(ids)))
    params = fuse_attention(params)
    assert "qkv_proj" in params["layers"][0]["self_attn"]
    got = np.asarray(arch.forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    # fused model still stacks for scan decode
    runner = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=16,
                         dtype=jnp.float32)
    assert runner.stacked is not None


def test_packed_model_runner(tmp_path):
    """Runner over PackedLinear weights (scan-stacked) matches dense fake-quant."""
    import hf_tiny
    from gptq_for_llama_tpu.models import hf_loader
    from gptq_for_llama_tpu.data import get_loaders
    from gptq_for_llama_tpu.engine import QuantizeSpec, pack_model, quantize_model
    d, _ = hf_tiny.tiny_llama_dir(tmp_path)
    cfg, params = hf_loader.load_params(d, dtype=jnp.float32, seqlen=32)
    train, _ = get_loaders("synthetic", nsamples=4, seed=0, seqlen=32, model=cfg)
    spec = QuantizeSpec(wbits=4, groupsize=16, chunk=4)
    params, quantizers, _ = quantize_model("llama", cfg, params, train, spec,
                                           verbose=False)
    arch = registry.get_arch("llama")
    ids = np.arange(10, dtype=np.int32)[None] % cfg.vocab_size
    want = np.asarray(arch.forward(params, cfg, jnp.asarray(ids)))
    params = pack_model("llama", cfg, params, quantizers, dtype=jnp.float32)
    runner = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=16,
                         dtype=jnp.float32)
    assert runner.stacked is not None, "packed layers should stack for scan"
    cache = runner.init_cache()
    logits, _ = runner.prefill(jnp.asarray(ids), cache)
    np.testing.assert_allclose(np.asarray(logits), want, atol=5e-3, rtol=0)


def test_unrolled_layers_matches_scan():
    """Perf mode: layers as separate jit args + per-layer tuple KV cache
    (scripts/decomp.py: the scanned weight stack materializes per-layer
    operand copies — 12.4 -> 7.4 ms/token on 7B decode)."""
    cfg = _tiny_cfg("llama")
    params = _params(cfg)
    base = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                       dtype=jnp.float32, unroll_layers=False)
    unr = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                      dtype=jnp.float32, unroll_layers=True)
    assert unr.stacked is None and isinstance(unr.init_cache().k, tuple)
    ids = jnp.asarray(np.arange(12, dtype=np.int32)[None] % cfg.vocab_size)

    def run(r):
        cache = r.init_cache()
        logits, cache = r.prefill(ids, cache)
        tok = jnp.argmax(logits[:, -1].astype(jnp.float32), -1).astype(jnp.int32)[:, None]
        toks, _ = r.decode_greedy_scan(tok, cache, steps=6)
        return np.asarray(logits, np.float32), np.asarray(toks)

    lg_a, tk_a = run(base)
    lg_b, tk_b = run(unr)
    np.testing.assert_array_equal(tk_a, tk_b)
    np.testing.assert_allclose(lg_b, lg_a, atol=2e-4, rtol=1e-3)


def test_runner_fuse_qkv_matches_unfused():
    """ModelRunner(fuse_qkv=True) — the production make_quant_attn wiring —
    must decode the same greedy tokens as the unfused runner."""
    import jax
    import jax.numpy as jnp
    from gptq_for_llama_tpu.models import registry
    from gptq_for_llama_tpu.models.config import ModelConfig
    from gptq_for_llama_tpu.engine.quantize import get_path, set_path
    from gptq_for_llama_tpu.quant import packing
    from gptq_for_llama_tpu.ops.linear import PackedLinear
    from gptq_for_llama_tpu.runtime import ModelRunner, generate

    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=64,
                      intermediate_size=128, num_layers=2, num_heads=4,
                      num_kv_heads=4, head_dim=16, max_seq_len=64)
    arch = registry.get_arch("llama")
    params = arch.init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    rng = np.random.RandomState(5)
    for lp in params["layers"]:
        for name in arch.LAYER_LINEARS:
            lin = get_path(lp, name)
            k, n = lin["kernel"].shape
            g = k // 16
            codes = rng.randint(0, 16, size=(k, n), dtype=np.int64).astype(np.uint32)
            wire = {"qweight": packing.pack_rows(codes, 4),
                    "qzeros": packing.pack_cols(np.full((g, n), 7, np.uint32) - 1, 4),
                    "scales": (rng.rand(g, n) * 0.02 + 0.005).astype(np.float16),
                    "g_idx": (np.arange(k) // 16).astype(np.int32)}
            set_path(lp, name, PackedLinear.from_wire(
                wire["qweight"], wire["qzeros"], wire["scales"], wire["g_idx"],
                bits=4, dtype=jnp.float32))
    import copy
    p2 = jax.tree_util.tree_map(lambda x: x, params)
    p2 = {"layers": [dict(lp, self_attn=dict(lp["self_attn"])) for lp in params["layers"]],
          **{k: v for k, v in params.items() if k != "layers"}}
    prompt = np.array([1, 2, 3, 4], np.int32)
    r1 = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                     dtype=jnp.float32)
    out1 = generate(r1, prompt, 8, temperature=0.0)
    r2 = ModelRunner("llama", cfg, p2, batch_size=1, max_seq_len=32,
                     dtype=jnp.float32, fuse_qkv=True)
    assert "qkv_proj" in r2.params["layers"][0]["self_attn"]
    out2 = generate(r2, prompt, 8, temperature=0.0)
    np.testing.assert_array_equal(out1, out2)


def test_min_new_tokens_suppresses_eos():
    """HF MinLengthLogitsProcessor semantics (the reference's generate path):
    EOS cannot be SAMPLED before min_new_tokens — not merely ignored."""
    from gptq_for_llama_tpu.models import registry
    from gptq_for_llama_tpu.models.config import ModelConfig
    from gptq_for_llama_tpu.runtime import ModelRunner, generate

    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=32,
                      intermediate_size=64, num_layers=2, num_heads=4,
                      num_kv_heads=4, head_dim=8, max_seq_len=64)
    arch = registry.get_arch("llama")
    params = arch.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    runner = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                         dtype=jnp.float32)
    p = np.array([1, 2, 3], np.int32)
    # find the greedy first token, then declare IT the eos: with
    # min_new_tokens=3 it must not appear in the first 3 generated tokens
    base = generate(runner, p, max_new_tokens=1, temperature=0.0)
    eos = int(base[0, -1])
    out = generate(runner, p, max_new_tokens=6, temperature=0.0,
                   min_new_tokens=3, eos_token_id=eos)
    gen = out[0, len(p):]
    assert eos not in gen[:3].tolist()


def test_span_generate_matches_stepwise():
    """decode_sample_scan spans must be token-identical to the per-token loop
    (same PRNG key threading, same EOS/min_new semantics, EOS truncation)."""
    cfg = _tiny_cfg()
    params = _params(cfg)
    runner = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=48,
                         dtype=jnp.float32)
    prompt = np.array([1, 2, 3], np.int32)
    for temp in (0.0, 0.9):
        want = generate(runner, prompt, max_new_tokens=13, temperature=temp,
                        top_p=0.9, seed=3, span=1)
        for span in (4, 13, 32):
            got = generate(runner, prompt, max_new_tokens=13,
                           temperature=temp, top_p=0.9, seed=3, span=span)
            np.testing.assert_array_equal(got, want)


def test_span_generate_eos_truncation():
    """A row hitting EOS mid-span must truncate exactly where span=1 stops,
    and min_new_tokens suppression must hold across span boundaries."""
    cfg = _tiny_cfg()
    params = _params(cfg)
    runner = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=48,
                         dtype=jnp.float32)
    p = np.array([1, 2, 3], np.int32)
    eos = int(generate(runner, p, max_new_tokens=1, temperature=0.0)[0, -1])
    for span in (1, 4, 32):
        out = generate(runner, p, max_new_tokens=12, temperature=0.0,
                       min_new_tokens=3, eos_token_id=eos, span=span)
        gen = out[0, len(p):]
        assert eos not in gen[:3].tolist()
        if span == 1:
            want = out
        else:
            np.testing.assert_array_equal(out, want)


def _act_order_packed(k, n, bits, groupsize, seed, perm_seed):
    """Packed linear whose g_idx is scrambled by a perm drawn from perm_seed
    (layers built with different perm_seeds get different perm_sig digests)."""
    from gptq_for_llama_tpu.ops.linear import PackedLinear
    from gptq_for_llama_tpu.quant import packing
    rng = np.random.RandomState(seed)
    g = k // groupsize
    codes = rng.randint(0, 2 ** bits, size=(k, n)).astype(np.uint32)
    qweight = packing.pack_rows(codes, bits)
    zeros = rng.randint(1, 2 ** bits, size=(g, n)).astype(np.uint32)
    qzeros = packing.pack_cols(zeros - 1, bits)
    scales = rng.rand(g, n).astype(np.float32) * 0.02 + 0.005
    p = np.random.RandomState(perm_seed).permutation(k)
    g_idx = (np.arange(k) // groupsize).astype(np.int32)[np.argsort(p)]
    return PackedLinear.from_wire(qweight, qzeros, scales, g_idx, bits=bits,
                                  dtype=jnp.float32)


def test_stack_layers_act_order_scans():
    """Act-order checkpoints (unique per-layer perm_sig) must still stack:
    _normalize_perm_sigs re-keys the aux digests, fusability stays encoded
    (gate/up combined sigs equal iff equal in every layer), and the scanned
    matmul matches the per-layer loop."""
    from gptq_for_llama_tpu.ops.linear import PackedLinear, linear_apply
    from gptq_for_llama_tpu.runtime.runner import stack_layers

    k, n, bits, gs = 64, 64, 4, 16
    # gate/up share the per-layer permutation (fusable), layers differ
    layers = [{"gate": _act_order_packed(k, n, bits, gs, seed=li, perm_seed=li),
               "up": _act_order_packed(k, n, bits, gs, seed=li + 7,
                                       perm_seed=li)}
              for li in range(3)]
    assert all(lp["gate"].perm is not None for lp in layers)
    sigs = {lp["gate"].perm_sig for lp in layers}
    assert len(sigs) == 3  # unique per layer: raw treedefs would mismatch

    stacked = stack_layers(layers)
    assert stacked is not None, "act-order layers must take the scan path"
    assert stacked["gate"].perm_sig == stacked["up"].perm_sig

    # numeric: lax.scan over the stacked tree == per-layer python loop
    x = jnp.asarray(np.random.RandomState(0).standard_normal((2, k)),
                    jnp.float32)

    def body(c, lp):
        return linear_apply(lp["up"], linear_apply(lp["gate"], c)), None

    scanned, _ = jax.lax.scan(body, x, stacked)
    loop = x
    for lp in layers:
        loop = linear_apply(lp["up"], linear_apply(lp["gate"], loop))
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(loop),
                               rtol=1e-5, atol=1e-5)

    # a layer whose gate/up permutations DIFFER must break the combined
    # equality (fused-MLP decision stays derivable from the jit cache key)
    bad = [dict(lp) for lp in layers]
    bad[1] = {"gate": bad[1]["gate"],
              "up": _act_order_packed(k, n, bits, gs, seed=99, perm_seed=42)}
    stacked_bad = stack_layers(bad)
    assert stacked_bad is not None
    assert stacked_bad["gate"].perm_sig != stacked_bad["up"].perm_sig
