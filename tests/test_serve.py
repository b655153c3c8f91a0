"""Continuous-batching serving engine tests (tiny model, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from gptq_for_llama_tpu.models import registry
from gptq_for_llama_tpu.models.config import ModelConfig
from gptq_for_llama_tpu.runtime import ModelRunner, generate
from gptq_for_llama_tpu.runtime.serve import GenRequest, ServingEngine


def _setup():
    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=32,
                      intermediate_size=64, num_layers=2, num_heads=4,
                      num_kv_heads=4, head_dim=8, max_seq_len=64)
    arch = registry.get_arch("llama")
    params = arch.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


def test_serving_matches_single_sequence_greedy():
    cfg, params = _setup()
    engine = ServingEngine("llama", cfg, params, batch_slots=4,
                           max_seq_len=32, dtype=jnp.float32,
                           prefill_buckets=(8, 16))
    prompts = [np.array([1, 2, 3], np.int32),
               np.array([5, 6], np.int32),
               np.array([9, 8, 7, 6, 5], np.int32),
               np.array([4], np.int32),
               np.array([2, 2, 2], np.int32)]  # 5 reqs > 4 slots: backfill
    for uid, p in enumerate(prompts):
        engine.submit(GenRequest(uid=uid, prompt=p, max_new_tokens=6,
                                 temperature=0.0))
    results = engine.run()
    assert set(results) == set(range(5))

    # each result must equal the single-sequence greedy continuation
    runner = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                         dtype=jnp.float32)
    for uid, p in enumerate(prompts):
        want = generate(runner, p, max_new_tokens=6, temperature=0.0)
        np.testing.assert_array_equal(results[uid], want[0, len(p):],
                                      err_msg=f"request {uid}")


def test_paged_serving_matches_dense():
    """paged=True engine produces identical greedy outputs to the dense one,
    with a pool smaller than slots * max_len."""
    cfg, params = _setup()
    prompts = [np.array([1, 2, 3], np.int32),
               np.array([5, 6], np.int32),
               np.array([9, 8, 7, 6, 5], np.int32),
               np.array([4], np.int32),
               np.array([2, 2, 2], np.int32)]

    def run(**kw):
        eng = ServingEngine("llama", cfg, params, batch_slots=2,
                            max_seq_len=32, dtype=jnp.float32,
                            prefill_buckets=(8,), **kw)
        for uid, p in enumerate(prompts):
            eng.submit(GenRequest(uid=uid, prompt=p, max_new_tokens=5,
                                  temperature=0.0))
        return eng.run()

    dense = run()
    # pool: 2 slots x 4 blocks would be 8; give 6 to force real block reuse
    paged = run(paged=True, block_size=8, num_blocks=6)
    for uid in dense:
        np.testing.assert_array_equal(paged[uid], dense[uid],
                                      err_msg=f"request {uid}")


def test_chunked_prefill_matches_whole_prompt():
    """prefill_chunk mode (dense and paged): identical greedy outputs."""
    cfg, params = _setup()
    prompts = [np.arange(1, 12, dtype=np.int32),      # 11 tokens: 2 chunks
               np.array([5, 6], np.int32),            # shorter than one chunk
               np.arange(3, 20, dtype=np.int32)]      # 17 tokens: 3 chunks

    def run(**kw):
        eng = ServingEngine("llama", cfg, params, batch_slots=2,
                            max_seq_len=32, dtype=jnp.float32,
                            prefill_buckets=(32,), **kw)
        for uid, p in enumerate(prompts):
            eng.submit(GenRequest(uid=uid, prompt=p, max_new_tokens=4,
                                  temperature=0.0))
        return eng.run()

    base = run()
    chunked = run(prefill_chunk=8)
    chunked_paged = run(prefill_chunk=8, paged=True, block_size=8)
    for uid in base:
        np.testing.assert_array_equal(chunked[uid], base[uid],
                                      err_msg=f"dense chunked, request {uid}")
        np.testing.assert_array_equal(chunked_paged[uid], base[uid],
                                      err_msg=f"paged chunked, request {uid}")


def test_serving_eos_frees_slot():
    cfg, params = _setup()
    engine = ServingEngine("llama", cfg, params, batch_slots=2,
                           max_seq_len=32, dtype=jnp.float32,
                           prefill_buckets=(8,))
    runner = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                         dtype=jnp.float32)
    p = np.array([1, 2, 3], np.int32)
    ref = generate(runner, p, max_new_tokens=8, temperature=0.0)[0, len(p):]
    eos = int(ref[2])  # stop at this token's FIRST occurrence in ref
    expect_len = int(np.argmax(ref == eos)) + 1
    engine.submit(GenRequest(uid=0, prompt=p, max_new_tokens=8,
                             temperature=0.0, eos_token_id=eos))
    results = engine.run()
    assert len(results[0]) == expect_len and results[0][-1] == eos
    np.testing.assert_array_equal(results[0], ref[:expect_len])


def test_unrolled_serving_matches_scan():
    """unroll_layers=True (TPU perf default: per-layer jit args + tuple
    caches) must produce identical greedy outputs, dense and paged."""
    cfg, params = _setup()
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

    base = run(unroll_layers=False)
    unr = run(unroll_layers=True)
    unr_paged = run(unroll_layers=True, paged=True, block_size=8)
    for uid in base:
        np.testing.assert_array_equal(unr[uid], base[uid])
        np.testing.assert_array_equal(unr_paged[uid], base[uid])


def test_decode_span_matches_single_step():
    """Multi-step scheduling (decode_span=4): identical greedy outputs; eos /
    max_new overshoot inside a span is trimmed host-side."""
    cfg, params = _setup()
    prompts = [np.array([1, 2, 3], np.int32),
               np.array([9, 8, 7, 6, 5], np.int32),
               np.array([4], np.int32)]

    def run(**kw):
        engine = ServingEngine("llama", cfg, params, batch_slots=2,
                               max_seq_len=32, dtype=jnp.float32,
                               prefill_buckets=(8,), **kw)
        for uid, p in enumerate(prompts):
            engine.submit(GenRequest(uid=uid, prompt=p, max_new_tokens=7,
                                     temperature=0.0))
        return engine.run()

    base = run()
    spanned = run(decode_span=4)
    spanned_paged = run(decode_span=4, paged=True, block_size=8)
    for uid in base:
        np.testing.assert_array_equal(spanned[uid], base[uid])
        np.testing.assert_array_equal(spanned_paged[uid], base[uid])


def test_paged_span_midspan_retirement_no_corruption():
    """Regression (advisor round 1): in paged mode with decode_span >
    block_size, a slot retiring mid-span keeps decoding on device with the
    stale live mask — its offset overshoots the allocated blocks and, before
    the fix, overshoot tokens were written through 0-filler table entries
    into physical block 0 (another slot's cache). The fix allocates span
    slack in _admit and reserves a dedicated scratch block for the filler."""
    # larger vocab than _setup: greedy argmax must be sensitive enough that
    # a corrupted position-0 KV actually flips tokens (verified to fail
    # against the pre-fix code)
    cfg = ModelConfig(arch="llama", vocab_size=256, hidden_size=32,
                      intermediate_size=64, num_layers=2, num_heads=4,
                      num_kv_heads=4, head_dim=8, max_seq_len=64)
    arch = registry.get_arch("llama")
    params = arch.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    # slot 0 (admitted first, owns the lowest physical blocks incl. block 0
    # pre-fix) decodes long; slot 1 retires after 3 tokens, mid-span — its
    # overshoot writes went through filler entries into slot 0's first block
    prompts = [np.array([1, 2, 3], np.int32),
               np.array([9, 8], np.int32)]
    max_new = [18, 3]

    def run(**kw):
        eng = ServingEngine("llama", cfg, params, batch_slots=2,
                            max_seq_len=32, dtype=jnp.float32,
                            prefill_buckets=(8,), **kw)
        for uid, p in enumerate(prompts):
            eng.submit(GenRequest(uid=uid, prompt=p,
                                  max_new_tokens=max_new[uid],
                                  temperature=0.0))
        return eng.run()

    base = run()
    got = run(decode_span=8, paged=True, block_size=4)
    for uid in base:
        np.testing.assert_array_equal(got[uid], base[uid],
                                      err_msg=f"request {uid}")


def test_chunked_prefill_concurrent_decode_write_mask():
    """Regression: a batched decode step must not clobber rows of a slot that
    is mid-chunked-prefill (its stale offset points into prompt rows that
    earlier chunks already wrote). Staggered lifetimes force a multi-chunk
    prefill to coexist with live decoding, in both fused and unfused modes."""
    cfg, params = _setup()
    prompts = [np.arange(1, 6, dtype=np.int32),        # slot0: decodes long
               np.array([5, 6], np.int32),             # slot1: retires fast
               np.arange(3, 20, dtype=np.int32)]       # 17 tokens: 3 chunks
    max_new = [12, 2, 4]

    def run(**kw):
        eng = ServingEngine("llama", cfg, params, batch_slots=2,
                            max_seq_len=32, dtype=jnp.float32,
                            prefill_buckets=(32,), **kw)
        for uid, p in enumerate(prompts):
            eng.submit(GenRequest(uid=uid, prompt=p,
                                  max_new_tokens=max_new[uid],
                                  temperature=0.0))
        return eng.run()

    base = run()
    for kw in (dict(prefill_chunk=8, fused_chunk_decode=False),
               dict(prefill_chunk=8),
               dict(prefill_chunk=8, paged=True, block_size=8)):
        got = run(**kw)
        for uid in base:
            np.testing.assert_array_equal(got[uid], base[uid],
                                          err_msg=f"{kw}, request {uid}")


def test_fuse_qkv_serving_matches_unfused():
    """ServingEngine(fuse_qkv=True) on a PACKED model (fusion is a no-op on
    dense layers) produces identical greedy outputs."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    cfg = bench.build_cfg(tiny=True)
    params = bench.random_packed_llama(cfg, jnp.float32)
    prompts = [np.array([1, 2, 3], np.int32),
               np.array([5, 6], np.int32),
               np.array([9, 8, 7], np.int32)]

    def run(**kw):
        eng = ServingEngine("llama", cfg, params, batch_slots=2,
                            max_seq_len=32, dtype=jnp.float32,
                            prefill_buckets=(8,), **kw)
        for uid, p in enumerate(prompts):
            eng.submit(GenRequest(uid=uid, prompt=p, max_new_tokens=5,
                                  temperature=0.0))
        return eng.run()

    base = run()
    got = run(fuse_qkv=True)
    # fusion must actually have happened (packed model) and be output-exact
    from gptq_for_llama_tpu.ops.linear import PackedLinear
    assert isinstance(params["layers"][0]["self_attn"]["q_proj"],
                      PackedLinear)  # caller tree untouched
    for uid in base:
        np.testing.assert_array_equal(got[uid], base[uid],
                                      err_msg=f"request {uid}")


def test_serving_all_arches_match_runner():
    """ServingEngine speaks all three arch layers (OPT learned positions,
    NeoX partial rotary/parallel residual) — dense AND paged greedy outputs
    match the single-sequence runner."""
    from gptq_for_llama_tpu.models.config import ModelConfig
    cfgs = {
        "opt": ModelConfig(arch="opt", vocab_size=128, hidden_size=128,
                           intermediate_size=256, num_layers=2, num_heads=4,
                           num_kv_heads=4, head_dim=32, max_seq_len=64,
                           act="relu", pos_embedding="learned", norm_eps=1e-5,
                           attn_bias=True, mlp_bias=True),
        "neox": ModelConfig(arch="neox", vocab_size=128, hidden_size=128,
                            intermediate_size=256, num_layers=2, num_heads=4,
                            num_kv_heads=4, head_dim=32, max_seq_len=64,
                            act="gelu", rotary_pct=0.25,
                            parallel_residual=True, norm_eps=1e-5),
        "gpt2": ModelConfig(arch="gpt2", vocab_size=128, hidden_size=128,
                            intermediate_size=256, num_layers=2, num_heads=4,
                            num_kv_heads=4, head_dim=32, max_seq_len=64,
                            act="gelu_new", pos_embedding="learned",
                            norm_eps=1e-5, attn_bias=True, mlp_bias=True),
    }
    prompts = [np.array([1, 2, 3], np.int32), np.array([5, 6], np.int32),
               np.array([9, 8, 7], np.int32)]
    for name, cfg in cfgs.items():
        arch = registry.get_arch(name)
        params = arch.init_params(cfg, jax.random.PRNGKey(1),
                                  dtype=jnp.float32)
        runner = ModelRunner(name, cfg, params, batch_size=1, max_seq_len=32,
                             dtype=jnp.float32)
        for kw in (dict(), dict(paged=True, block_size=8)):
            eng = ServingEngine(name, cfg, params, batch_slots=2,
                                max_seq_len=32, dtype=jnp.float32,
                                prefill_buckets=(8,), **kw)
            for uid, p in enumerate(prompts):
                eng.submit(GenRequest(uid=uid, prompt=p, max_new_tokens=5,
                                      temperature=0.0))
            results = eng.run()
            for uid, p in enumerate(prompts):
                want = generate(runner, p, max_new_tokens=5, temperature=0.0)
                np.testing.assert_array_equal(
                    results[uid], want[0, len(p):],
                    err_msg=f"{name} {kw} request {uid}")


def test_prompt_longer_than_buckets_still_serves():
    """A prompt beyond every configured prefill bucket but within the cache
    uses the implicit full-length bucket instead of raising."""
    cfg, params = _setup()
    eng = ServingEngine("llama", cfg, params, batch_slots=2, max_seq_len=32,
                        dtype=jnp.float32, prefill_buckets=(8,))
    p = np.arange(1, 13, dtype=np.int32)  # 12 > bucket 8
    eng.submit(GenRequest(uid=0, prompt=p, max_new_tokens=4, temperature=0.0))
    results = eng.run()
    runner = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=32,
                         dtype=jnp.float32)
    want = generate(runner, p, max_new_tokens=4, temperature=0.0)
    np.testing.assert_array_equal(results[0], want[0, len(p):])


def test_first_token_retirement_and_submit_validation():
    """max_new_tokens=1 returns exactly ONE token (runner.generate parity);
    over-length prompts and impossible paged requests are rejected at
    submit() instead of crashing or spinning the engine mid-run."""
    import pytest
    cfg, params = _setup()
    eng = ServingEngine("llama", cfg, params, batch_slots=2, max_seq_len=16,
                        dtype=jnp.float32, prefill_buckets=(8,))
    p = np.array([1, 2, 3], np.int32)
    eng.submit(GenRequest(uid=0, prompt=p, max_new_tokens=1, temperature=0.0))
    results = eng.run()
    runner = ModelRunner("llama", cfg, params, batch_size=1, max_seq_len=16,
                         dtype=jnp.float32)
    want = generate(runner, p, max_new_tokens=1, temperature=0.0)
    np.testing.assert_array_equal(results[0], want[0, len(p):])
    assert len(results[0]) == 1

    # eos as the very first sampled token retires immediately
    first = int(results[0][0])
    eng2 = ServingEngine("llama", cfg, params, batch_slots=2, max_seq_len=16,
                         dtype=jnp.float32, prefill_buckets=(8,))
    eng2.submit(GenRequest(uid=0, prompt=p, max_new_tokens=8,
                           temperature=0.0, eos_token_id=first))
    r2 = eng2.run()
    assert list(r2[0]) == [first]

    # prompt leaving no room to generate: rejected at submit
    with pytest.raises(ValueError, match="no room"):
        eng.submit(GenRequest(uid=9, prompt=np.arange(16, dtype=np.int32),
                              max_new_tokens=4))
    # paged request that could NEVER fit the pool: rejected at submit
    eng3 = ServingEngine("llama", cfg, params, batch_slots=2, max_seq_len=32,
                         dtype=jnp.float32, prefill_buckets=(8,), paged=True,
                         block_size=8, num_blocks=2)
    with pytest.raises(ValueError, match="KV blocks"):
        eng3.submit(GenRequest(uid=9, prompt=p, max_new_tokens=24))


def test_batched_admission_runs_and_matches_per_slot(monkeypatch):
    """A backfill wave of same-bucket admissions runs through ONE batched
    prefill program and produces the same greedy results as per-slot
    admission (GPTQ_TPU_ADMIT_BATCH_MAX=0 disables batching)."""
    cfg, params = _setup()
    prompts = [np.array([1, 2, 3], np.int32),
               np.array([5, 6], np.int32),
               np.array([9, 8, 7, 6, 5], np.int32),
               np.array([4], np.int32)]

    def run(batched: bool):
        if not batched:
            monkeypatch.setenv("GPTQ_TPU_ADMIT_BATCH_MAX", "0")
        else:
            monkeypatch.delenv("GPTQ_TPU_ADMIT_BATCH_MAX", raising=False)
        eng = ServingEngine("llama", cfg, params, batch_slots=4,
                            max_seq_len=32, dtype=jnp.float32,
                            prefill_buckets=(8,))
        calls = {"batched": 0, "single": 0}
        orig_b, orig_s = eng._admit_batched, eng._admit_one

        def count_b(*a, **k):
            calls["batched"] += 1
            return orig_b(*a, **k)

        def count_s(*a, **k):
            calls["single"] += 1
            return orig_s(*a, **k)
        monkeypatch.setattr(eng, "_admit_batched", count_b)
        monkeypatch.setattr(eng, "_admit_one", count_s)
        for uid, p in enumerate(prompts):
            eng.submit(GenRequest(uid=uid, prompt=p, max_new_tokens=5,
                                  temperature=0.0))
        return eng.run(), calls

    got_b, calls_b = run(batched=True)
    got_s, calls_s = run(batched=False)
    assert calls_b["batched"] == 1 and calls_b["single"] == 0
    assert calls_s["batched"] == 0 and calls_s["single"] == 4
    for uid in range(len(prompts)):
        np.testing.assert_array_equal(got_b[uid], got_s[uid])
