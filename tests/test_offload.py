"""Offload runner parity: streamed forward == resident forward."""

import numpy as np
import jax
import jax.numpy as jnp

from gptq_for_llama_tpu.models import registry
from gptq_for_llama_tpu.models.config import ModelConfig
from gptq_for_llama_tpu.runtime.offload import OffloadRunner


def test_offload_forward_matches_resident():
    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=32,
                      intermediate_size=64, num_layers=4, num_heads=4,
                      num_kv_heads=4, head_dim=8, max_seq_len=32)
    arch = registry.get_arch("llama")
    params = arch.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = np.arange(10, dtype=np.int32)[None] % cfg.vocab_size
    want = np.asarray(arch.forward(params, cfg, jnp.asarray(ids)))

    runner = OffloadRunner("llama", cfg, params, pre_layer=2, dtype=jnp.float32)
    assert len(runner.resident) == 2 and len(runner.host_layers) == 2
    got = np.asarray(runner.forward(ids))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    ppl = runner.perplexity(np.arange(64, dtype=np.int32) % cfg.vocab_size, 16)
    assert np.isfinite(ppl)
