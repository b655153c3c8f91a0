"""Whole-model shard_map tensor parallelism: Pallas kernels on local TP shards.

Under plain jit, XLA's SPMD partitioner shards the XLA dequant path but cannot
partition a `pallas_call`, so TP-sharded models silently lose the fused
kernels (PARITY.md known-gap #1).  This module runs the ENTIRE model step
(embed -> scanned layers -> head) inside ONE `shard_map` region:

- every device executes the step on its LOCAL parameter shard with a LOCAL
  ModelConfig (num_heads/tp, num_kv_heads/tp), so the fused dequant-matmul /
  attention Pallas kernels run unmodified per shard;
- the two row-parallel projections per layer (o_proj/down_proj and their
  opt/neox equivalents) psum over the tp axis — the Megatron pattern the
  reference's layer-round-robin placement (reference: llama.py:328-382) is
  replaced by (SURVEY.md §7 step 6);
- the KV cache is sharded over heads, the lm_head over vocab; batch is
  sharded over the dp axis.

Act-order / K-padded row-parallel weights: the device row order of a packed
row-parallel weight is the group-sorted (permuted, possibly K-padded) order,
which no longer matches the natural activation layout once sharded.
`prepare_tp_params` rewrites such a linear's `perm` into a device-row index
map of length k_padded; inside the shard each device all-gathers the (small)
activation and takes its own rows (pad rows read a clamped index — their
codes and zero-points are 0, so they contribute exactly nothing under
dot-then-scale).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .sharding import TP_RULES, tp_rules
from ..ops.linear import PackedLinear

__all__ = ["local_config", "prepare_tp_params", "step_specs",
           "localize_layer_aux", "tp_shardings"]


def local_config(cfg, tp: int):
    """The per-shard view of the model: heads and ffn width divided by tp."""
    if cfg.num_heads % tp or cfg.num_kv_heads % tp:
        raise ValueError(
            f"tp={tp} must divide num_heads={cfg.num_heads} and "
            f"num_kv_heads={cfg.num_kv_heads}")
    return dataclasses.replace(
        cfg, num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        intermediate_size=cfg.intermediate_size // tp)


# ---------------------------------------------------------------------------
# host-side preparation
# ---------------------------------------------------------------------------

def _prepare_row_linear(lin: PackedLinear, tp: int,
                        act_map: np.ndarray | None = None) -> PackedLinear:
    """Make a row-parallel PackedLinear shardable on its device-row axis.

    act_map: optional (in_features,) map from original activation index to
    its position in the GATHERED activation when the upstream col-parallel
    producer was shard-padded (_pad_col_shards) — the all-gathered x then has
    zero pad entries interleaved at each shard's tail."""
    k, kp = lin.in_features, lin.k_padded
    g = lin.scales.shape[0]
    if (lin.qweight.shape[0] % tp) or (g % tp):
        raise ValueError(
            f"row-parallel: packed rows {lin.qweight.shape[0]} and groups {g} "
            f"must divide tp={tp}")
    if lin.perm is None and kp == k and act_map is None:
        return lin  # natural order, no padding: direct row sharding
    base = np.asarray(lin.perm) if lin.perm is not None else np.arange(k)
    if act_map is not None:
        base = act_map[base]
    pad_idx = base[-1] if k else 0
    rowmap = np.concatenate(
        [base, np.full(kp - k, pad_idx)]).astype(np.int32)  # pad rows: clamped
    return dataclasses.replace(lin, perm=jnp.asarray(rowmap))


# per-arch MLP col producers -> row consumer: the one col->row pair whose
# col output is consumed ONLY through the row linear's gather, so its N can
# be shard-padded to the Pallas lane alignment (the attention q/k/v cols
# must NOT be padded — their widths are reshaped to local heads*head_dim)
_MLP_PAIRS = {
    "llama": (("mlp.gate_proj", "mlp.up_proj"), "mlp.down_proj"),
    "opt": (("fc1",), "fc2"),
    "neox": (("mlp.dense_h_to_4h",), "mlp.dense_4h_to_h"),
    "gpt2": (("mlp.c_fc",), "mlp.c_proj"),
}

# fused attention projections in [all Q | all K | all V] BLOCK column layout
# (NOT per-head interleaved like neox): contiguous col-sharding would split
# q/k/v across shards, so prepare_tp_params re-orders their columns into
# per-shard [Q_i|K_i|V_i] groups first (see _relayout_qkv_blocks)
_QKV_BLOCK_FUSED = {"gpt2": "attn.c_attn"}

_LANE = 128  # Pallas/Mosaic lane width: per-shard N must be a multiple


def _pad_col_shards(lin: PackedLinear, tp: int, pad: int) -> PackedLinear:
    """Zero-pad each TP shard of a col-parallel packed linear's N axis.

    The global N axis is viewed as tp chunks of n_local; each chunk grows by
    `pad` zero columns (scales=0 AND zeros=0, so dequant is exactly 0 and the
    dot-then-scale kernel contributes exactly nothing), keeping every shard's
    local N a multiple of the 128 lane width so ops/pallas/matmul.supports()
    holds on the shard. Shard-local params are not a save path: the wire aux
    is dropped to make that explicit."""
    n = lin.out_features
    n_local = n // tp

    def pad_n(a):
        rows = a.shape[0]
        if isinstance(a, jax.ShapeDtypeStruct):
            # abstract params (AOT lowering, runner abstract=True): only the
            # padded SHAPE matters — there is no data to move
            return jax.ShapeDtypeStruct((rows, tp * (n_local + pad)), a.dtype)
        a3 = a.reshape(rows, tp, n_local)
        a3 = jnp.pad(a3, ((0, 0), (0, 0), (0, pad)))
        return a3.reshape(rows, tp * (n_local + pad))

    bias = lin.bias
    if bias is not None:
        bias = jnp.pad(bias.reshape(tp, n_local), ((0, 0), (0, pad))).reshape(-1)
    return dataclasses.replace(
        lin, qweight=pad_n(lin.qweight), scales=pad_n(lin.scales),
        zeros=pad_n(lin.zeros), bias=bias,
        out_features=tp * (n_local + pad),
        qzeros=None, g_idx=None, scales_wire=None)


def _relayout_qkv_blocks(lin, tp: int):
    """[all Q | all K | all V] fused projection -> per-shard [Q_i|K_i|V_i]
    column groups, so contiguous col-sharding hands shard i its own whole
    q/k/v head blocks and the LOCAL forward's split-by-thirds stays correct
    (gpt2's c_attn; reference has no TP at all — its multi-GPU scheme is
    layer placement, llama.py:328-382). A pure output-column permutation:
    mathematically identical, applied once at load like the act-order row
    sort. Shard-local layout is not a save path: wire aux is dropped."""
    if isinstance(lin, PackedLinear):
        n = lin.out_features
    else:
        n = lin["kernel"].shape[1]
    if n % (3 * tp):
        raise ValueError(f"fused qkv out_features {n} must divide 3*tp={3*tp}")
    h = n // 3
    hl = h // tp
    perm = np.concatenate([np.arange(s * h + i * hl, s * h + (i + 1) * hl)
                           for i in range(tp) for s in range(3)])
    if isinstance(lin, PackedLinear):
        return dataclasses.replace(
            lin,
            qweight=jnp.asarray(np.asarray(lin.qweight)[:, perm]),
            scales=jnp.asarray(np.asarray(lin.scales)[:, perm]),
            zeros=jnp.asarray(np.asarray(lin.zeros)[:, perm]),
            bias=None if lin.bias is None
            else jnp.asarray(np.asarray(lin.bias)[perm]),
            qzeros=None, g_idx=None, scales_wire=None)
    out = {"kernel": jnp.asarray(np.asarray(lin["kernel"])[:, perm])}
    if lin.get("bias") is not None:
        out["bias"] = jnp.asarray(np.asarray(lin["bias"])[perm])
    return out


def _walk_linears(arch_name: str, layer_tree: dict, fn, skip=()) -> dict:
    """Apply fn(lin, mode) to every TP-ruled linear of one layer tree (copy)."""
    from ..engine.quantize import get_path, set_path  # cycle-free late import

    new = jax.tree_util.tree_map(lambda x: x, layer_tree)
    for name, mode in tp_rules(arch_name).items():
        if name in skip:
            continue
        try:
            lin = get_path(new, name)
        except (KeyError, TypeError):
            continue
        set_path(new, name, fn(lin, mode))
    return new


def prepare_tp_params(arch_name: str, params: dict, tp: int) -> dict:
    """Host-side transform before stacking/sharding for the shard_map runner.

    Returns a new params tree whose row-parallel packed linears carry a
    device-row index map (see module docstring), and whose MLP col-parallel
    packed linears are shard-padded to the 128 lane width when n/tp is not a
    multiple of it (65B g128 tp=8: intermediate 22016 -> 2752/shard, which
    ops/pallas/matmul.supports() rejects; padded to 2816/shard the Pallas
    kernels run — the padded-gather layout is composed into the downstream
    row linear's index map). Fused qkv projections are not supported here
    (their concat N layout does not split into whole heads); build the runner
    from unfused checkpoints for shard_map TP.
    """
    from ..engine.quantize import get_path, set_path

    def prep(lin, mode):
        if isinstance(lin, PackedLinear) and mode == "row":
            return _prepare_row_linear(lin, tp)
        return lin

    cols, row_name = _MLP_PAIRS.get(arch_name, ((), None))
    out = {k: v for k, v in params.items()}
    new_layers = []
    for lp in params["layers"]:
        if "self_attn" in lp and "qkv_proj" in lp.get("self_attn", {}):
            raise ValueError("shard_map TP requires unfused q/k/v projections")
        # MLP shard-padding first (its row consumer then needs an act_map,
        # so the generic row prep must skip that one name)
        act_map = None
        new = jax.tree_util.tree_map(lambda x: x, lp)
        qkv_name = _QKV_BLOCK_FUSED.get(arch_name)
        if qkv_name is not None:
            try:
                qkv_lin = get_path(new, qkv_name)
            except (KeyError, TypeError):
                qkv_lin = None
            if qkv_lin is not None:
                set_path(new, qkv_name, _relayout_qkv_blocks(qkv_lin, tp))
        try:
            col_lins = [get_path(new, c) for c in cols]
            row_lin = get_path(new, row_name) if row_name else None
        except (KeyError, TypeError):
            col_lins, row_lin = [], None
        if (col_lins and isinstance(row_lin, PackedLinear)
                and all(isinstance(c, PackedLinear) for c in col_lins)):
            n = col_lins[0].out_features
            if n % tp:
                raise ValueError(
                    f"col-parallel: out_features {n} must divide tp={tp}")
            n_local = n // tp
            pad = (-n_local) % _LANE
            if pad:
                for cname, c in zip(cols, col_lins):
                    set_path(new, cname, _pad_col_shards(c, tp, pad))
                j = np.arange(n)
                act_map = ((j // n_local) * (n_local + pad)
                           + (j % n_local)).astype(np.int32)
            set_path(new, row_name,
                     _prepare_row_linear(row_lin, tp, act_map=act_map))
            new_layers.append(_walk_linears(arch_name, new, prep,
                                            skip=(row_name,)))
        else:
            new_layers.append(_walk_linears(arch_name, new, prep))
    out["layers"] = new_layers
    return out


# ---------------------------------------------------------------------------
# PartitionSpec trees
# ---------------------------------------------------------------------------

def _lin_specs(lin, mode: str, axis: str, lead: int):
    """Spec tree for one linear (PackedLinear or dense dict); `lead` extra
    leading (stacked-layer) dims are replicated."""
    L = (None,) * lead
    if isinstance(lin, PackedLinear):
        # (qzeros/g_idx/scales_wire live in pytree aux on the host — they
        # ride along untouched and need no spec)
        if mode == "col":
            spec2 = P(*L, None, axis)
            return dataclasses.replace(
                lin, qweight=spec2, scales=spec2, zeros=spec2,
                perm=None if lin.perm is None else P(*L, None),
                bias=None if lin.bias is None else P(*L, axis))
        spec2 = P(*L, axis, None)
        return dataclasses.replace(
            lin, qweight=spec2, scales=spec2, zeros=spec2,
            perm=None if lin.perm is None else P(*L, axis),
            bias=None if lin.bias is None else P(*L, None))
    # dense dict
    out = {}
    for key in lin:
        if key == "kernel":
            out[key] = P(*L, None, axis) if mode == "col" else P(*L, axis, None)
        elif key == "bias":
            out[key] = P(*L, axis) if mode == "col" else P(*L, None)
        else:
            out[key] = P()
    return out


def _replicated(tree):
    return jax.tree_util.tree_map(lambda _: P(), tree)


def _layer_specs(arch_name: str, layer_tree: dict, axis: str, lead: int):
    from ..engine.quantize import get_path, set_path
    spec = jax.tree_util.tree_map(lambda _: P(), layer_tree)
    for name, mode in tp_rules(arch_name).items():
        try:
            lin = get_path(layer_tree, name)
        except (KeyError, TypeError):
            continue
        set_path(spec, name, _lin_specs(lin, mode, axis, lead=lead))
    return spec


def step_specs(arch_name: str, sp: dict, axis: str = "tp") -> dict:
    """PartitionSpec tree matching the runner/serving step-params dict
    ({'statics': ..., 'stacked': <stacked tree or None>, 'layers':
    <per-layer list or None>})."""
    statics_spec = {}
    for key, val in sp["statics"].items():
        if key in ("lm_head", "embed_out"):
            statics_spec[key] = _lin_specs(val, "col", axis, lead=0)
        else:
            statics_spec[key] = _replicated(val)
    if sp["stacked"] is not None:
        stacked_spec = _layer_specs(arch_name, sp["stacked"], axis, lead=1)
        return {"statics": statics_spec, "stacked": stacked_spec,
                "layers": None}
    if sp.get("layers"):  # unrolled mode: per-layer spec trees
        layers_spec = [_layer_specs(arch_name, lp, axis, lead=0)
                       for lp in sp["layers"]]
        return {"statics": statics_spec, "stacked": None,
                "layers": layers_spec}
    raise ValueError("step params carry neither stacked nor per-layer trees")


def localize_layer_aux(arch_name: str, tree: dict, tp: int) -> dict:
    """Trace-time aux fix inside shard_map: PackedLinear leaves arrive holding
    LOCAL shards but global static dims; rewrite col out_features and row
    in_features to the per-shard values (array shapes are authoritative)."""
    def fix(lin, mode):
        if not isinstance(lin, PackedLinear):
            return lin
        if mode == "col":
            return dataclasses.replace(lin,
                                       out_features=lin.out_features // tp)
        # row: local contraction = local device rows (perm/padding handled by
        # row_parallel_apply); in_features must match what the kernel sees
        kp_local = lin.qweight.shape[-2] * 32 // lin.bits
        return dataclasses.replace(lin, in_features=kp_local)

    return _walk_linears(arch_name, tree, fix)


def localize_step_params(arch_name: str, sp: dict, tp: int) -> dict:
    """Trace-time aux localization for a whole step-params dict (stacked or
    unrolled form)."""
    sp = dict(sp)
    if sp.get("stacked") is not None:
        sp["stacked"] = localize_layer_aux(arch_name, sp["stacked"], tp)
    elif sp.get("layers"):
        sp["layers"] = [localize_layer_aux(arch_name, lp, tp)
                        for lp in sp["layers"]]
    # a PACKED (quantized) lm_head/embed_out is col-sharded by step_specs:
    # its static out_features must match the local vocab shard too
    statics = dict(sp["statics"])
    for key in ("lm_head", "embed_out"):
        lin = statics.get(key)
        if isinstance(lin, PackedLinear):
            statics[key] = dataclasses.replace(
                lin, out_features=lin.out_features // tp)
    sp["statics"] = statics
    return sp


# ---------------------------------------------------------------------------
# device placement matching step_specs (so shard_map does not reshard)
# ---------------------------------------------------------------------------

def tp_shardings(mesh: Mesh, spec_tree):
    """NamedSharding tree from a PartitionSpec tree (None leaves preserved)."""
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), spec_tree,
        is_leaf=lambda x: isinstance(x, P))


def place_step_params(sp: dict, mesh: Mesh, specs: dict) -> dict:
    """device_put every leaf of the step-params dict per its spec."""
    flat_sp, treedef = jax.tree_util.tree_flatten(sp)
    flat_spec = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P))
    assert len(flat_sp) == len(flat_spec), "spec tree mismatch"
    placed = [jax.device_put(x, NamedSharding(mesh, s))
              for x, s in zip(flat_sp, flat_spec)]
    return jax.tree_util.tree_unflatten(treedef, placed)
