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


def test_offload_generate_matches_resident_runner():
    """Offloaded KV-cached decode (the reference's actual offload use case,
    llama_inference_offload.py:186-235): greedy generation with half the
    layers host-resident bit-matches the fully resident ModelRunner."""
    from gptq_for_llama_tpu.runtime import ModelRunner, generate

    cfg = ModelConfig(arch="llama", vocab_size=128, hidden_size=32,
                      intermediate_size=64, num_layers=4, num_heads=4,
                      num_kv_heads=4, head_dim=8, max_seq_len=64)
    arch = registry.get_arch("llama")
    params = arch.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    prompt = np.array([3, 1, 4, 1, 5], np.int32)

    resident = ModelRunner("llama", cfg, params, batch_size=1,
                           max_seq_len=32, dtype=jnp.float32)
    want = generate(resident, prompt, max_new_tokens=10, temperature=0.0)

    off = OffloadRunner("llama", cfg, params, pre_layer=2, dtype=jnp.float32,
                        max_seq_len=32)
    assert len(off.resident) == 2 and len(off.host_layers) == 2
    got = off.generate(prompt, max_new_tokens=10, temperature=0.0)
    np.testing.assert_array_equal(got, want)

    # sampled path also runs end-to-end (same seed => same draw as runner)
    got_s = off.generate(prompt, max_new_tokens=4, temperature=0.7,
                         top_p=0.9, seed=5)
    want_s = generate(resident, prompt, max_new_tokens=4, temperature=0.7,
                      top_p=0.9, seed=5)
    np.testing.assert_array_equal(got_s, want_s)


def test_offload_generate_eos_stops():
    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=32,
                      intermediate_size=64, num_layers=2, num_heads=4,
                      num_kv_heads=4, head_dim=8, max_seq_len=32)
    arch = registry.get_arch("llama")
    params = arch.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    off = OffloadRunner("llama", cfg, params, pre_layer=1, dtype=jnp.float32,
                        max_seq_len=32)
    p = np.array([1, 2, 3], np.int32)
    full = off.generate(p, max_new_tokens=8, temperature=0.0)[0, len(p):]
    eos = int(full[2])
    stop_at = int(np.argmax(full == eos))
    got = off.generate(p, max_new_tokens=8, temperature=0.0,
                       eos_token_id=eos)[0, len(p):]
    np.testing.assert_array_equal(got, full[:stop_at + 1])
