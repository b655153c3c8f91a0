"""Tensor-parallel sharding tests on the 8-device virtual CPU mesh.

Validates that TP-sharded packed weights produce the same logits as the
unsharded model (XLA inserts the collectives), for both prefill and cached
decode, and that the KV cache shards over heads.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gptq_for_llama_tpu.data import get_loaders
from gptq_for_llama_tpu.engine import QuantizeSpec, pack_model, quantize_model
from gptq_for_llama_tpu.models import registry
from gptq_for_llama_tpu.models.config import ModelConfig
from gptq_for_llama_tpu.parallel.sharding import (make_mesh, shard_cache,
                                                  shard_model_params)
from gptq_for_llama_tpu.runtime import ModelRunner


def _cfg():
    # dims chosen so 4-bit TP=4 divisibility holds: col N % 32*... , row K % 128
    return ModelConfig(arch="llama", vocab_size=128, hidden_size=128,
                       intermediate_size=256, num_layers=2, num_heads=4,
                       num_kv_heads=4, head_dim=32, max_seq_len=64)


@pytest.fixture(scope="module")
def packed_model():
    cfg = _cfg()
    arch = registry.get_arch("llama")
    params = arch.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    train, _ = get_loaders("synthetic", nsamples=4, seed=0, seqlen=32, model=cfg)
    spec = QuantizeSpec(wbits=4, groupsize=32, chunk=4)
    params, quantizers, _ = quantize_model("llama", cfg, params, train, spec,
                                           verbose=False)
    params = pack_model("llama", cfg, params, quantizers, dtype=jnp.float32)
    return cfg, params


def test_mesh_shapes():
    mesh = make_mesh(tp=4, dp=2)
    assert mesh.shape == {"dp": 2, "tp": 4}


def test_tp_forward_matches_unsharded(packed_model):
    cfg, params = packed_model
    arch = registry.get_arch("llama")
    ids = jnp.asarray(np.arange(16, dtype=np.int32)[None] % cfg.vocab_size)
    want = np.asarray(arch.forward(params, cfg, ids))

    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_model_params("llama", cfg, params, mesh)
    qw = sharded["layers"][0]["self_attn"]["q_proj"].qweight
    assert len(qw.sharding.device_set) == 8  # placed across the mesh

    fwd = jax.jit(lambda p, i: arch.forward(p, cfg, i))
    got = np.asarray(fwd(sharded, ids))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_tp_cached_decode_matches(packed_model):
    cfg, params = packed_model
    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_model_params("llama", cfg, params, mesh)

    runner_ref = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                             dtype=jnp.float32)
    runner_tp = ModelRunner("llama", cfg, sharded, batch_size=1, max_seq_len=32,
                            dtype=jnp.float32)
    ids = np.arange(8, dtype=np.int32)[None] % cfg.vocab_size

    c_ref = runner_ref.init_cache()
    c_tp = shard_cache(runner_tp.init_cache(), mesh)
    l_ref, c_ref = runner_ref.prefill(jnp.asarray(ids), c_ref)
    l_tp, c_tp = runner_tp.prefill(jnp.asarray(ids), c_tp)
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               atol=2e-4, rtol=1e-3)
    tok = jnp.asarray([[5]], jnp.int32)
    d_ref, _ = runner_ref.decode(tok, c_ref)
    d_tp, _ = runner_tp.decode(tok, c_tp)
    np.testing.assert_allclose(np.asarray(d_tp), np.asarray(d_ref),
                               atol=2e-4, rtol=1e-3)


def test_dp_calibration_matches_single_device():
    """Data-parallel calibration (batch sharded over dp) == single-device."""
    from gptq_for_llama_tpu.engine import QuantizeSpec, quantize_model
    cfg = _cfg()
    arch = registry.get_arch("llama")
    params_a = arch.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    params_b = jax.tree_util.tree_map(lambda x: x, params_a)
    train, _ = get_loaders("synthetic", nsamples=8, seed=0, seqlen=32, model=cfg)
    spec = QuantizeSpec(wbits=4, groupsize=32, chunk=8)

    _, q_single, _ = quantize_model("llama", cfg, params_a, train, spec,
                                    verbose=False)
    mesh = make_mesh(tp=1, dp=8)
    _, q_dp, _ = quantize_model("llama", cfg, params_b, train, spec,
                                verbose=False, mesh=mesh)
    for key in q_single:
        np.testing.assert_allclose(q_dp[key].scale, q_single[key].scale,
                                    rtol=1e-4, atol=1e-7, err_msg=key)


def test_row_shard_divisibility_error(packed_model):
    cfg, params = packed_model
    mesh = make_mesh(tp=8, dp=1)
    # hidden=128: row K % (8*32)=256 fails -> clear error, not silent corruption
    with pytest.raises(ValueError, match="not divisible"):
        shard_model_params("llama", cfg, params, mesh)
