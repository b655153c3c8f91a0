"""shard_map-wrapped quantized matmuls: Pallas kernels on real TP shards.

Under plain jit, XLA's SPMD partitioner handles the XLA dequant path but
cannot partition a pallas_call — TP-sharded models would silently fall back.
These wrappers run the fused kernel on each device's LOCAL shard explicitly
(SURVEY.md §7 step 6: "shard_map-wrapped Pallas kernels with all-reduce after
o_proj/down_proj"):

- column-parallel: x replicated, weight sharded on out-features; local fused
  matmul; output stays sharded on N (attention heads / MLP inner dim).
- row-parallel: x sharded on in-features, weight sharded on K whole-group
  aligned; local matmul then psum over the tp axis.

The local function rebuilds the PackedLinear with local-shard aux dims (the
pytree arrives with global aux; shapes are the local shards).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.linear import PackedLinear
from ..ops.quant_matmul import quant_matmul as _quant_matmul


def _local_lin(lin: PackedLinear, n_shards: int, mode: str) -> PackedLinear:
    """Fix aux dims to match the local shard the pytree leaves now hold."""
    if mode == "col":
        return dataclasses.replace(lin, out_features=lin.out_features // n_shards)
    return dataclasses.replace(lin, in_features=lin.in_features // n_shards)


def _lin_specs(lin: PackedLinear, mode: str, axis: str):
    """PartitionSpec pytree matching PackedLinear's structure (a PackedLinear
    whose array fields hold specs — same treedef, spec leaves)."""
    if mode == "col":
        spec2, b_spec = P(None, axis), P(axis)
    else:
        spec2, b_spec = P(axis, None), P(None)
    return dataclasses.replace(
        lin, qweight=spec2, scales=spec2, zeros=spec2,
        perm=None if lin.perm is None else P(None),
        bias=None if lin.bias is None else b_spec)


def tp_quant_matmul(x, lin: PackedLinear, mesh: Mesh, mode: str,
                    axis: str = "tp"):
    """y = x @ dequant(lin) with the Pallas kernel on each local shard.

    mode 'col': x (..., K) replicated -> y (..., N) sharded on axis.
    mode 'row': x (..., K) sharded on its last dim -> y (..., N) replicated
    (psum). Weight buffers must already be placed with the matching sharding
    (parallel/sharding.shard_packed_linear).
    """
    n_shards = mesh.shape[axis]
    if mode == "row" and lin.scales.shape[0] % n_shards != 0:
        raise ValueError(
            f"row-parallel shard_map needs groups ({lin.scales.shape[0]}) "
            f"divisible by tp ({n_shards})")
    if mode == "row" and (lin.perm is not None
                          or lin.k_padded != lin.in_features):
        # act-order and K-padded rows need a device-row index map
        # (parallel/tp_model._prepare_row_linear does this for the
        # whole-step runner); the plain per-op path does not support them
        raise NotImplementedError(
            "tp_quant_matmul row mode does not support act-order or "
            "K-padded weights — use the shard_map TP runner "
            "(parallel/tp_model) instead")
    local = partial(_local_lin, n_shards=n_shards, mode=mode)

    if mode == "col":
        def f(xl, linl):
            return _quant_matmul(xl, local(linl), dtype=xl.dtype)

        return shard_map(
            f, mesh=mesh,
            in_specs=(P(), _lin_specs(lin, "col", axis)),
            out_specs=P(*(None,) * (x.ndim - 1), axis),
            check_vma=False)(x, lin)

    if mode == "row":
        def f(xl, linl):
            ll = local(linl)
            # bias (replicated) must be added once, after the psum
            ll_nobias = dataclasses.replace(ll, bias=None)
            y = _quant_matmul(xl, ll_nobias, dtype=xl.dtype)
            y = jax.lax.psum(y, axis)
            if ll.bias is not None:
                y = y + ll.bias
            return y

        return shard_map(
            f, mesh=mesh,
            in_specs=(P(*(None,) * (x.ndim - 1), axis),
                      _lin_specs(lin, "row", axis)),
            out_specs=P(),
            check_vma=False)(x, lin)

    raise ValueError(mode)
