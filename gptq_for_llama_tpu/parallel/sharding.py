"""Device-mesh sharding: tensor-parallel placement of packed quantized weights.

The reference's only parallelism is naive layer-round-robin multi-GPU placement
with implicit .to(dev) copies (reference: llama.py:328-382). The TPU-native
design replaces it with SPMD tensor parallelism over a jax.sharding.Mesh:
packed weights carry NamedShardings, jit propagates them, and XLA inserts the
all-reduce after row-parallel projections (o_proj/down_proj) — compiler-
scheduled collectives over ICI instead of hand-placed P2P copies.

Scheme (Megatron-style, per decoder layer):
  column-parallel (shard out-features N): q/k/v/gate/up (llama), q/k/v/fc1
    (opt), query_key_value/dense_h_to_4h (neox)   -> activations sharded by head
  row-parallel (shard in-features K): o_proj/down_proj, out_proj/fc2,
    dense/dense_4h_to_h                           -> psum back to replicated
  lm_head: column-parallel over vocab; embeddings/norms replicated.

PackedLinear buffer axes (see ops/linear.py; qzeros/g_idx/scales_wire live in
host-side pytree aux and are never sharded):
  qweight (K*bits/32, N): col -> shard axis 1, row -> shard axis 0
  scales/zeros (G, N):    col -> shard axis 1, row -> shard axis 0
  perm (K,):              replicated (indexes the pre-shard activation)
Divisibility: col needs N % (tp * 32/bits) == 0; row needs K % (tp * 32) == 0
(keeps 3-bit three-word packs intact at shard boundaries).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.linear import PackedLinear

# per-arch: linear tree-path suffix -> 'col' | 'row'
TP_RULES = {
    "llama": {
        "self_attn.q_proj": "col", "self_attn.k_proj": "col",
        "self_attn.v_proj": "col", "self_attn.o_proj": "row",
        "mlp.gate_proj": "col", "mlp.up_proj": "col", "mlp.down_proj": "row",
    },
    "opt": {
        "self_attn.q_proj": "col", "self_attn.k_proj": "col",
        "self_attn.v_proj": "col", "self_attn.out_proj": "row",
        "fc1": "col", "fc2": "row",
    },
    "neox": {
        # fused qkv is (heads, 3*head_dim) on N: sharding N splits whole heads
        # as long as num_heads % tp == 0
        "attention.query_key_value": "col", "attention.dense": "row",
        "mlp.dense_h_to_4h": "col", "mlp.dense_4h_to_h": "row",
    },
    "gpt2": {
        # the fused c_attn ships in [all Q | all K | all V] BLOCK layout
        # (unlike neox's per-head interleave); the shard_map path re-orders
        # its columns into per-shard [Q_i|K_i|V_i] groups at load time
        # (tp_model._relayout_qkv_blocks — the same load-time-permutation
        # trick as the act-order row sort) so contiguous col-sharding hands
        # every shard whole q/k/v head blocks. Under plain jit-sharding the
        # natural layout stays (XLA reshards the q/k/v slices; correct,
        # just extra collectives on the simple fallback path).
        "attn.c_attn": "col", "attn.c_proj": "row",
        "mlp.c_fc": "col", "mlp.c_proj": "row",
    },
}


def tp_rules(arch_name: str) -> dict:
    """TP_RULES lookup with an actionable error for unsupported arches."""
    try:
        return TP_RULES[arch_name]
    except KeyError:
        raise ValueError(
            f"tensor parallelism is not supported for {arch_name!r}; "
            "run single-chip") from None


def make_mesh(tp: Optional[int] = None, dp: int = 1,
              devices=None) -> Mesh:
    """Build a (dp, tp) mesh; tp defaults to all devices / dp.

    Multi-host: devices are ordered host-major (process_index, then id), so
    with dp = a multiple of the process count each tp row stays WITHIN one
    host — tensor-parallel collectives ride ICI, only dp traffic crosses DCN
    (see parallel/distributed.py for the launch recipe).
    """
    if devices is None:
        devices = jax.devices()
        if jax.process_count() > 1:
            devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    tp = tp or (len(devices) // dp)
    if dp * tp != len(devices):
        devices = devices[: dp * tp]
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _shard(mesh: Mesh, x, spec: P):
    if jax.process_count() > 1:
        # device_put cannot target non-addressable devices; build the global
        # array from the host-local copy instead (every host has the params)
        from .distributed import put_global
        return put_global(x, mesh, spec)
    return jax.device_put(x, NamedSharding(mesh, spec))


def _check_div(name: str, dim: int, parts: int):
    if dim % parts != 0:
        raise ValueError(
            f"{name}: dimension {dim} not divisible by tp={parts}; "
            f"pad the model dims or lower tp")


def shard_packed_linear(lin: PackedLinear, mesh: Mesh, mode: str,
                        axis: str = "tp") -> PackedLinear:
    """Place one PackedLinear's buffers with column/row TP sharding."""
    tp = mesh.shape[axis]
    if mode == "col":
        _check_div("qweight.N", lin.qweight.shape[1], tp)
        _check_div("scales.N", lin.scales.shape[1], tp)
        qweight = _shard(mesh, lin.qweight, P(None, axis))
        scales = _shard(mesh, lin.scales, P(None, axis))
        zeros = _shard(mesh, lin.zeros, P(None, axis))
        perm = None if lin.perm is None else _shard(mesh, lin.perm, P(None))
        bias = None if lin.bias is None else _shard(mesh, lin.bias, P(axis))
    elif mode == "row":
        # keep 32-value packs (and 3-bit 3-word packs) intact per shard
        _check_div("qweight.K", lin.in_features, tp * 32)
        qweight = _shard(mesh, lin.qweight, P(axis, None))
        # group dim G may be < tp (small models / groupsize=-1): replicate then
        gspec = P(axis, None) if lin.scales.shape[0] % tp == 0 else P(None, None)
        scales = _shard(mesh, lin.scales, gspec)
        zeros = _shard(mesh, lin.zeros, gspec)
        # perm indexes the K axis of x (pre-shard gather): replicate
        perm = None if lin.perm is None else _shard(mesh, lin.perm, P(None))
        bias = None if lin.bias is None else _shard(mesh, lin.bias, P(None))
    else:
        raise ValueError(mode)
    return PackedLinear(qweight, lin.qzeros, scales, zeros, lin.g_idx, perm,
                        bias, lin.bits, lin.groupsize, lin.in_features,
                        lin.out_features, lin.layout, lin.scales_wire,
                        wire_bits=lin.wire_bits)


def _shard_dense_linear(lin: dict, mesh: Mesh, mode: str, axis: str = "tp") -> dict:
    kernel = lin["kernel"]  # (K, N)
    if mode == "col":
        out = {"kernel": _shard(mesh, kernel, P(None, axis))}
        if lin.get("bias") is not None:
            out["bias"] = _shard(mesh, lin["bias"], P(axis))
    else:
        out = {"kernel": _shard(mesh, kernel, P(axis, None))}
        if lin.get("bias") is not None:
            out["bias"] = _shard(mesh, lin["bias"], P(None))
    return out


def _shard_linear(lin, mesh, mode, axis="tp"):
    if isinstance(lin, PackedLinear):
        return shard_packed_linear(lin, mesh, mode, axis)
    return _shard_dense_linear(lin, mesh, mode, axis)


def shard_model_params(arch_name: str, cfg, params, mesh: Mesh,
                       axis: str = "tp"):
    """Place every param with its TP sharding; non-linears replicated.

    Returns a new pytree whose arrays are committed to mesh devices. Under jit,
    sharding propagates from these annotations; XLA inserts the all-reduces
    after row-parallel projections (the reference's cross-GPU hidden-state
    copies, llama.py:345-358, become compiler collectives).
    """
    from ..engine.quantize import get_path, set_path  # cycle-free late import

    rules = tp_rules(arch_name)
    replicate = lambda x: _shard(mesh, x, P(*(None,) * np.ndim(x)))

    def shard_tree(node):
        return jax.tree_util.tree_map(replicate, node)

    out = {}
    for key, val in params.items():
        if key == "layers":
            continue
        if key == "lm_head" or key == "embed_out":
            out[key] = _shard_linear(val, mesh, "col", axis)
        else:
            out[key] = shard_tree(val)

    layers = []
    for lp in params["layers"]:
        if "self_attn" in lp and "qkv_proj" in lp.get("self_attn", {}):
            raise ValueError(
                "jit-sharding TP requires unfused q/k/v projections "
                "(TP_RULES shard them separately); load without fuse_qkv")
        new_lp = jax.tree_util.tree_map(lambda x: x, lp)  # shallow-ish copy
        handled = set()
        for name, mode in rules.items():
            try:
                lin = get_path(new_lp, name)
            except (KeyError, TypeError):
                continue
            set_path(new_lp, name, _shard_linear(lin, mesh, mode, axis))
            handled.add(name.split(".")[0])
        # replicate everything else (norms)
        for k, v in new_lp.items():
            if k not in handled and not isinstance(v, PackedLinear):
                if isinstance(v, dict) and ("kernel" in v or "w" in v):
                    new_lp[k] = shard_tree(v)
                elif isinstance(v, dict):
                    pass  # container already handled per-linear
                else:
                    new_lp[k] = replicate(v)
        layers.append(new_lp)
    out["layers"] = layers
    return out


def shard_cache(cache, mesh: Mesh, axis: str = "tp"):
    """KV cache sharded over heads: stacked (L, B, S, Hkv, D) arrays or the
    per-layer (B, S, Hkv, D) tuples of unrolled-layers mode (the runner's
    TPU default)."""
    from ..runtime.runner import KVCache
    tp = mesh.shape[axis]

    def place(c):
        if isinstance(c, tuple):
            return tuple(place(x) for x in c)
        hk = c.shape[-2]
        spec = P(*(None,) * (c.ndim - 2), axis, None) if hk % tp == 0 \
            else P(*(None,) * c.ndim)
        return _shard(mesh, c, spec)

    return KVCache(place(cache.k), place(cache.v),
                   _shard(mesh, cache.offset, P()))
