"""shard_map tensor parallelism (parallel/tp_model + ModelRunner shard_map_tp).

The jit-sharding path (tests/test_parallel.py) lets XLA partition the XLA
dequant matmul; this path instead runs the WHOLE step inside shard_map so the
Pallas kernels execute per-shard on TPU. Parity oracle: the unsharded runner.
All three architectures, act-order row-parallel weights (device-row index
maps), GQA, and dp x tp meshes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gptq_for_llama_tpu.data import get_loaders
from gptq_for_llama_tpu.engine import QuantizeSpec, pack_model, quantize_model
from gptq_for_llama_tpu.models import registry
from gptq_for_llama_tpu.models.config import ModelConfig
from gptq_for_llama_tpu.parallel.sharding import make_mesh
from gptq_for_llama_tpu.parallel import tp_model
from gptq_for_llama_tpu.runtime import ModelRunner


def _build(arch_name, cfg, act_order=False, seed=0):
    arch = registry.get_arch(arch_name)
    params = arch.init_params(cfg, jax.random.PRNGKey(seed), dtype=jnp.float32)
    train, _ = get_loaders("synthetic", nsamples=4, seed=0, seqlen=32, model=cfg)
    spec = QuantizeSpec(wbits=4, groupsize=32, chunk=4, act_order=act_order)
    params, quantizers, _ = quantize_model(arch_name, cfg, params, train, spec,
                                           verbose=False)
    return pack_model(arch_name, cfg, params, quantizers, dtype=jnp.float32)


CFGS = {
    "llama": ModelConfig(arch="llama", vocab_size=128, hidden_size=128,
                         intermediate_size=256, num_layers=2, num_heads=4,
                         num_kv_heads=4, head_dim=32, max_seq_len=64),
    "opt": ModelConfig(arch="opt", vocab_size=128, hidden_size=128,
                       intermediate_size=256, num_layers=2, num_heads=4,
                       num_kv_heads=4, head_dim=32, max_seq_len=64,
                       act="relu", pos_embedding="learned", norm_eps=1e-5,
                       attn_bias=True, mlp_bias=True),
    "neox": ModelConfig(arch="neox", vocab_size=128, hidden_size=128,
                        intermediate_size=256, num_layers=2, num_heads=4,
                        num_kv_heads=4, head_dim=32, max_seq_len=64,
                        act="gelu", rotary_pct=0.25, parallel_residual=True,
                        norm_eps=1e-5),
    # c_attn [Q|K|V] block layout: exercises the load-time column re-layout
    # (tp_model._relayout_qkv_blocks) that makes gpt2 col-shardable
    "gpt2": ModelConfig(arch="gpt2", vocab_size=128, hidden_size=128,
                        intermediate_size=256, num_layers=2, num_heads=4,
                        num_kv_heads=4, head_dim=32, max_seq_len=64,
                        act="gelu_new", pos_embedding="learned",
                        norm_eps=1e-5, attn_bias=True, mlp_bias=True),
}


def _run_steps(runner, ids, nsteps=3):
    """prefill + nsteps greedy decode; returns (prefill_logits, tokens)."""
    cache = runner.init_cache()
    logits, cache = runner.prefill(ids, cache)
    toks = []
    tok = jnp.argmax(logits[:, -1].astype(jnp.float32), -1).astype(jnp.int32)[:, None]
    for _ in range(nsteps):
        toks.append(np.asarray(tok)[:, 0])
        logits, cache = runner.decode(tok, cache)
        tok = jnp.argmax(logits[:, -1].astype(jnp.float32), -1).astype(jnp.int32)[:, None]
    toks.append(np.asarray(tok)[:, 0])
    return np.asarray(logits, np.float32), np.stack(toks, 1)


@pytest.mark.parametrize("arch_name", ["llama", "opt", "neox", "gpt2"])
def test_shard_map_tp_matches_unsharded(arch_name):
    cfg = CFGS[arch_name]
    params = _build(arch_name, cfg)
    ids = jnp.asarray((np.arange(2 * 16) % cfg.vocab_size)
                      .reshape(2, 16).astype(np.int32))

    base = ModelRunner(arch_name, cfg, params, batch_size=2, max_seq_len=32,
                       dtype=jnp.float32)
    want_logits, want_toks = _run_steps(base, ids)

    mesh = make_mesh(tp=4, dp=2)
    tpr = ModelRunner(arch_name, cfg, params, batch_size=2, max_seq_len=32,
                      dtype=jnp.float32, mesh=mesh, shard_map_tp=True)
    got_logits, got_toks = _run_steps(tpr, ids)

    np.testing.assert_array_equal(got_toks, want_toks)
    np.testing.assert_allclose(got_logits, want_logits, atol=3e-4, rtol=1e-3)


def test_shard_map_tp_act_order_row_parallel():
    """Act-order checkpoints carry non-trivial device-row maps on o/down."""
    cfg = CFGS["llama"]
    params = _build("llama", cfg, act_order=True)
    has_perm = any(
        lp["mlp"]["down_proj"].perm is not None for lp in params["layers"])
    assert has_perm, "act-order should produce a row permutation"
    ids = jnp.asarray((np.arange(16) % cfg.vocab_size)[None].astype(np.int32))

    base = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                       dtype=jnp.float32)
    want_logits, want_toks = _run_steps(base, ids)

    mesh = make_mesh(tp=4, dp=1)
    tpr = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                      dtype=jnp.float32, mesh=mesh, shard_map_tp=True)
    got_logits, got_toks = _run_steps(tpr, ids)
    np.testing.assert_array_equal(got_toks, want_toks)
    np.testing.assert_allclose(got_logits, want_logits, atol=3e-4, rtol=1e-3)


def test_shard_map_tp_gqa():
    cfg = ModelConfig(arch="llama", vocab_size=128, hidden_size=128,
                      intermediate_size=256, num_layers=2, num_heads=8,
                      num_kv_heads=2, head_dim=16, max_seq_len=64)
    params = _build("llama", cfg)
    ids = jnp.asarray((np.arange(16) % cfg.vocab_size)[None].astype(np.int32))
    base = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                       dtype=jnp.float32)
    want_logits, want_toks = _run_steps(base, ids)

    mesh = make_mesh(tp=2, dp=1)  # kv_heads=2 caps tp at 2
    tpr = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                      dtype=jnp.float32, mesh=mesh, shard_map_tp=True)
    got_logits, got_toks = _run_steps(tpr, ids)
    np.testing.assert_array_equal(got_toks, want_toks)
    np.testing.assert_allclose(got_logits, want_logits, atol=3e-4, rtol=1e-3)


def test_local_config_divisibility():
    cfg = CFGS["llama"]
    with pytest.raises(ValueError):
        tp_model.local_config(cfg, 3)
    lc = tp_model.local_config(cfg, 4)
    assert lc.num_heads == 1 and lc.num_kv_heads == 1


def test_decode_scan_under_shard_map():
    cfg = CFGS["llama"]
    params = _build("llama", cfg)
    ids = jnp.asarray((np.arange(16) % cfg.vocab_size)[None].astype(np.int32))
    base = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                       dtype=jnp.float32)
    mesh = make_mesh(tp=4, dp=1)
    tpr = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                      dtype=jnp.float32, mesh=mesh, shard_map_tp=True)

    def scan_toks(r):
        cache = r.init_cache()
        logits, cache = r.prefill(ids, cache)
        tok = jnp.argmax(logits[:, -1].astype(jnp.float32), -1)
        tok = tok.astype(jnp.int32)[:, None]
        toks, _ = r.decode_greedy_scan(tok, cache, steps=5)
        return np.asarray(toks)

    np.testing.assert_array_equal(scan_toks(tpr), scan_toks(base))


def test_shard_map_tp_serving_matches_unsharded():
    """ServingEngine(mesh=, shard_map_tp=True): per-shard kernels + psums for
    every jitted serving step (prefill, decode, span); greedy outputs must be
    identical, dense and paged, with multi-step spans."""
    from gptq_for_llama_tpu.runtime.serve import GenRequest, ServingEngine
    cfg = CFGS["llama"]
    params = _build("llama", cfg)
    prompts = [np.array([1, 2, 3], np.int32),
               np.array([9, 8, 7, 6, 5], np.int32),
               np.array([4], np.int32)]

    def run(**kw):
        engine = ServingEngine("llama", cfg, params, batch_slots=2,
                               max_seq_len=32, dtype=jnp.float32,
                               prefill_buckets=(8,), **kw)
        for uid, p in enumerate(prompts):
            engine.submit(GenRequest(uid=uid, prompt=p, max_new_tokens=5,
                                     temperature=0.0))
        return engine.run()

    base = run()
    mesh = make_mesh(tp=4, dp=1)
    tp = run(mesh=mesh, shard_map_tp=True)
    tp_span = run(mesh=mesh, shard_map_tp=True, decode_span=4)
    tp_paged = run(mesh=mesh, shard_map_tp=True, paged=True, block_size=8)
    tp_unrolled = run(mesh=mesh, shard_map_tp=True, unroll_layers=True)
    tp_chunked = run(mesh=mesh, shard_map_tp=True, prefill_chunk=8)
    for uid in base:
        np.testing.assert_array_equal(tp[uid], base[uid])
        np.testing.assert_array_equal(tp_span[uid], base[uid])
        np.testing.assert_array_equal(tp_paged[uid], base[uid])
        np.testing.assert_array_equal(tp_unrolled[uid], base[uid])
        np.testing.assert_array_equal(tp_chunked[uid], base[uid])


def test_shard_map_tp_unrolled_runner():
    """TP + unrolled layers (the real-pod perf mode: per-shard Pallas kernels
    AND no scanned-weight materialization) matches the unsharded runner."""
    cfg = CFGS["llama"]
    params = _build("llama", cfg)
    ids = jnp.asarray((np.arange(16) % cfg.vocab_size)[None].astype(np.int32))
    base = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                       dtype=jnp.float32)
    want_logits, want_toks = _run_steps(base, ids)

    mesh = make_mesh(tp=4, dp=1)
    tpr = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                      dtype=jnp.float32, mesh=mesh, shard_map_tp=True,
                      unroll_layers=True)
    assert tpr.unrolled and isinstance(tpr.init_cache().k, tuple)
    got_logits, got_toks = _run_steps(tpr, ids)
    np.testing.assert_array_equal(got_toks, want_toks)
    np.testing.assert_allclose(got_logits, want_logits, atol=3e-4, rtol=1e-3)


def test_shard_map_tp_k_padded_row_parallel():
    """Regression: shard_map TP on a K-PADDED row-parallel weight (the 7B
    down_proj shape class: groups not a multiple of 8, so from_wire pads K;
    save-only buffers must not take sharded specs that only the padded
    device buffers satisfy)."""
    # intermediate=480, gs=32: 15 groups -> padded to 16 (kp=512)
    cfg = ModelConfig(arch="llama", vocab_size=128, hidden_size=128,
                      intermediate_size=480, num_layers=1, num_heads=4,
                      num_kv_heads=4, head_dim=32, max_seq_len=64)
    params = _build("llama", cfg)
    down = params["layers"][0]["mlp"]["down_proj"]
    assert down.k_padded != down.in_features, "test must hit the K-pad path"
    ids = jnp.asarray((np.arange(16) % cfg.vocab_size)[None].astype(np.int32))

    base = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                       dtype=jnp.float32)
    want_logits, want_toks = _run_steps(base, ids)

    mesh = make_mesh(tp=4, dp=1)
    tpr = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                      dtype=jnp.float32, mesh=mesh, shard_map_tp=True)
    got_logits, got_toks = _run_steps(tpr, ids)
    np.testing.assert_array_equal(got_toks, want_toks)
    np.testing.assert_allclose(got_logits, want_logits, atol=3e-4, rtol=1e-3)
