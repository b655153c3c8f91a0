"""LoRA finetuning over frozen packed weights — the downstream use case the
reference's backward kernel exists for (reference: quant/quant_linear.py:
282-301 QuantLinearFunction.backward / transpose_matmul_248_kernel)."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # random packed tiny model builder
from gptq_for_llama_tpu.engine import attach_lora, join_lora, split_lora
from gptq_for_llama_tpu.models.registry import get_arch
from gptq_for_llama_tpu.ops.linear import PackedLinear
from gptq_for_llama_tpu.ops.lora import LoraLinear


def _tiny_packed():
    cfg = bench.build_cfg(tiny=True)
    params = bench.random_packed_llama(cfg, jnp.float32)
    return cfg, params


def test_attach_preserves_forward_and_caller_tree():
    cfg, params = _tiny_packed()
    arch = get_arch("llama")
    ids = jnp.asarray(np.random.RandomState(0).randint(0, cfg.vocab_size,
                                                       (2, 16)), jnp.int32)
    base_logits = np.asarray(arch.forward(params, cfg, ids))

    adapted = attach_lora("llama", params, rank=4,
                          key=jax.random.PRNGKey(0))
    # caller's tree untouched; adapter wraps every layer linear
    assert isinstance(params["layers"][0]["self_attn"]["q_proj"], PackedLinear)
    lin = adapted["layers"][0]["self_attn"]["q_proj"]
    assert isinstance(lin, LoraLinear)
    assert lin.a.shape == (cfg.hidden_size, 4)
    # b == 0 => initial delta is exactly zero
    got = np.asarray(arch.forward(adapted, cfg, ids))
    np.testing.assert_allclose(got, base_logits, atol=1e-5, rtol=1e-5)


def test_split_join_roundtrip():
    cfg, params = _tiny_packed()
    adapted = attach_lora("llama", params, rank=2, key=jax.random.PRNGKey(1))
    adapters, skeleton = split_lora(adapted)
    n_lin = len(get_arch("llama").LAYER_LINEARS) * len(params["layers"])
    assert len(adapters) == n_lin
    # skeleton holds no trainable leaves
    for lp in skeleton["layers"]:
        lin = lp["self_attn"]["q_proj"]
        assert isinstance(lin, LoraLinear) and lin.a is None and lin.b is None
    back = join_lora(skeleton, adapters)
    # exact round trip: every leaf of the rejoined tree matches the original
    for w, g in zip(jax.tree_util.tree_leaves(adapted),
                    jax.tree_util.tree_leaves(back)):
        assert w is g or np.array_equal(np.asarray(w), np.asarray(g))


def test_lora_training_reduces_loss():
    """25 adam steps on a fixed batch: only the adapters move, loss drops,
    and grads flow through the frozen packed linears' grad-input path."""
    import optax
    cfg, params = _tiny_packed()
    arch = get_arch("llama")
    adapted = attach_lora("llama", params, rank=4, key=jax.random.PRNGKey(2))
    adapters, skeleton = split_lora(adapted)

    rng = np.random.RandomState(3)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (2, 16)), jnp.int32)
    labels = jnp.full((2, 16), 7, jnp.int32)

    def loss_fn(adapters, skeleton, ids, labels):
        p = join_lora(skeleton, adapters)
        logits = arch.forward(p, cfg, ids).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[..., None],
                                             axis=-1))

    opt = optax.adam(0.05)
    state = opt.init(adapters)
    step = jax.jit(jax.value_and_grad(loss_fn))
    losses = []
    for _ in range(25):
        loss, grads = step(adapters, skeleton, ids, labels)
        losses.append(float(loss))
        upd, state = opt.update(grads, state)
        adapters = optax.apply_updates(adapters, upd)
    assert losses[-1] < losses[0] - 0.02, losses
    # adapters actually moved; packed base untouched by construction
    assert float(max(jnp.abs(ab["b"]).max() for ab in adapters)) > 0.0
