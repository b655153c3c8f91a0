"""Inference runner: jitted prefill/decode steps over a static KV cache.

The TPU-native replacement for the reference's HF `model.generate` decode loop
(reference: llama_inference.py:109-128) and `benchmark` harness
(llama.py:385-438):

- The growing concat KV cache + growing attention mask (reference
  llama.py:417-421) become a preallocated (L, B, max_len, Hkv, D) cache with
  `dynamic_update_slice` writes and an offset-parameterized additive mask —
  static shapes, so prefill and every decode step are each ONE compiled program.
- Layers are stacked into a single pytree and driven by `lax.scan` — one layer
  trace instead of num_layers copies (compile time and code size O(1) in depth).
- The reference's autotune warmup over the M=2^0..2^11 shape ladder
  (quant_linear.py:393-423) becomes `warmup()`: AOT compiles of the prefill
  buckets + decode step.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.registry import get_arch
from ..models.common import decode_mask


def collect_packed_linears(params) -> list:
    """Every PackedLinear node in a params tree (for warmup autotuning)."""
    from ..ops.linear import PackedLinear
    nodes = jax.tree_util.tree_flatten(
        params, is_leaf=lambda x: isinstance(x, PackedLinear))[0]
    return [n for n in nodes if isinstance(n, PackedLinear)]


def collect_mlp_pairs(params) -> list:
    """Every packed (gate_proj, up_proj) pair — the fused-MLP kernel's tuning
    unit (dispatched in ops/quant_matmul.fused_gate_up)."""
    from ..ops.linear import PackedLinear
    pairs = []
    for lp in params.get("layers", []):
        mlp = lp.get("mlp") if isinstance(lp, dict) else None
        if not isinstance(mlp, dict):
            continue
        g, u = mlp.get("gate_proj"), mlp.get("up_proj")
        if isinstance(g, PackedLinear) and isinstance(u, PackedLinear):
            pairs.append((g, u))
    return pairs


def _normalize_perm_sigs(layers: list):
    """Re-key per-layer PackedLinear.perm_sig so act-order layers stack.

    perm_sig is treedef AUX (ops/linear.py) and each act-order layer's g_idx
    digest is unique, so raw treedef equality would reject every act-order
    checkpoint from the lax.scan path. Replacing each tree position's sig
    with ONE digest over that position's per-layer sigs keeps the property
    perm_sig exists for — gate/up fusability (ops/pallas/mlp.supports_fused)
    stays derivable from the jit cache key: the gate and up positions get
    equal combined sigs iff their sigs matched in EVERY layer, which is
    exactly when fusing inside the scanned body (where perm is a per-
    iteration leaf) is valid for all layers.

    Returns re-keyed copies (or `layers` unchanged if nothing to do)."""
    import copy
    import hashlib
    from ..ops.linear import PackedLinear

    def is_pl(x):
        return isinstance(x, PackedLinear)

    flat = [jax.tree_util.tree_flatten(lp, is_leaf=is_pl) for lp in layers]
    if len({td for _, td in flat}) != 1:
        return layers  # structural mismatch: let the caller's check reject
    new_leaves = [list(lv) for lv, _ in flat]
    for pos, nodes in enumerate(zip(*[lv for lv, _ in flat])):
        if not all(is_pl(n) for n in nodes):
            continue
        sigs = [n.perm_sig for n in nodes]
        if len(set(sigs)) <= 1:
            continue  # already treedef-uniform at this position
        h = hashlib.blake2b(digest_size=8)
        for s in sigs:
            h.update(b"\x00" if s is None
                     else b"\x01" + int(s).to_bytes(8, "little"))
        combined = int.from_bytes(h.digest(), "little")
        for li, n in enumerate(nodes):
            n2 = copy.copy(n)  # shallow; skips __post_init__ re-derivation
            n2.perm_sig = combined
            new_leaves[li][pos] = n2
    return [jax.tree_util.tree_unflatten(td, lv)
            for lv, (_, td) in zip(new_leaves, flat)]


def stack_layers(layers: list):
    """Stack per-layer pytrees leaf-wise for lax.scan; None on mismatch.

    Act-order layers carry per-layer perm_sig aux; _normalize_perm_sigs
    re-keys them to a shared digest so same-shape act-order checkpoints
    still take the single-scan-program path."""
    layers = _normalize_perm_sigs(layers)
    treedefs = {jax.tree_util.tree_structure(lp) for lp in layers}
    if len(treedefs) != 1:
        return None
    shapes = [tuple(x.shape for x in jax.tree_util.tree_leaves(lp)) for lp in layers]
    if len(set(shapes)) != 1:
        return None  # heterogeneous (e.g. --observe mixed-precision) checkpoints
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


@dataclasses.dataclass
class KVCache:
    k: jax.Array  # (L, B, max_len, Hkv, D) — or a length-L tuple of
    v: jax.Array  # (B, max_len, Hkv, D) arrays in unrolled-layers mode
    offset: jax.Array  # scalar int32: number of valid tokens

    @classmethod
    def zeros(cls, cfg, num_layers: int, batch: int, max_len: int, dtype,
              unrolled: bool = False):
        shape = (batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        if unrolled:
            # per-layer leaves: layers index their cache by PYTHON tuple index
            # (no device slice/stack — slices of big arguments materialize
            # copies before Pallas operands; see scripts/decomp.py findings)
            return cls(tuple(jnp.zeros(shape, dtype) for _ in range(num_layers)),
                       tuple(jnp.zeros(shape, dtype) for _ in range(num_layers)),
                       jnp.zeros((), jnp.int32))
        full = (num_layers,) + shape
        return cls(jnp.zeros(full, dtype), jnp.zeros(full, dtype),
                   jnp.zeros((), jnp.int32))


jax.tree_util.register_pytree_node(
    KVCache,
    lambda c: ((c.k, c.v, c.offset), None),
    lambda _, ch: KVCache(*ch))


class ModelRunner:
    """Owns jitted prefill/decode for one (model, batch, max_len) configuration.

    mesh + shard_map_tp=True runs every step inside ONE shard_map region
    (parallel/tp_model): the Pallas kernels execute on each device's local
    tensor-parallel shard with explicit psums after o_proj/down_proj — the
    jit-only path would silently fall back to the XLA dequant matmul because
    SPMD cannot partition a pallas_call. Batch is sharded over the dp axis.
    """

    def __init__(self, arch_name: str, cfg, params, batch_size: int = 1,
                 max_seq_len: Optional[int] = None, dtype=jnp.bfloat16,
                 mesh=None, shard_map_tp: bool = False, tp_axis: str = "tp",
                 dp_axis: str = "dp", unroll_layers: Optional[bool] = None,
                 fuse_qkv: bool = False, kv_dtype=None,
                 abstract: bool = False):
        # abstract=True: params leaves are jax.ShapeDtypeStruct — skip device
        # placement so the step can be AOT-lowered (jit(...).lower) at model
        # scales that do not fit in memory (the 65B partition-plan proof in
        # __graft_entry__.dryrun_multichip). Such a runner can lower but
        # never execute.
        self.abstract = abstract
        self.arch = get_arch(arch_name)
        self.arch_name = arch_name
        self.cfg = cfg
        self.batch = batch_size
        self.max_len = max_seq_len or cfg.max_seq_len
        self.dtype = dtype
        # KV-cache STORAGE dtype (halve cache memory + decode-attention HBM
        # traffic with jnp.float8_e4m3fn; compute stays in self.dtype —
        # update_kv_cache casts on write, sdpa/kernels upcast on read)
        self.kv_dtype = kv_dtype or dtype
        if fuse_qkv and hasattr(self.arch, "fuse_attention"):
            # load-time q/k/v concat (make_quant_attn equivalent): one packed
            # weight stream + one kernel launch replace three per layer
            if mesh is not None and shard_map_tp:
                raise ValueError(
                    "fuse_qkv is incompatible with shard_map TP: TP_RULES "
                    "shard q/k/v separately — load unfused for TP")
            params = self.arch.fuse_attention(params)
        self._tp = None
        if mesh is not None and shard_map_tp:
            from ..parallel import tp_model
            tp = mesh.shape[tp_axis]
            dp = mesh.shape.get(dp_axis, 1)
            assert batch_size % max(dp, 1) == 0, "batch must divide dp"
            params = tp_model.prepare_tp_params(arch_name, params, tp)
            self._tp = {"mesh": mesh, "axis": tp_axis, "dp_axis": dp_axis,
                        "tp": tp, "cfg_local": tp_model.local_config(cfg, tp)}
        self.params = params
        # unrolled layers: every layer's params are separate jit ARGUMENTS and
        # every layer's KV cache is its own pytree leaf. lax.scan over the
        # stacked weight pytree makes XLA materialize each layer's packed
        # weights (a per-layer copy of the whole weight slice) before the
        # Pallas kernels can read them — measured 12.4 -> 7.4 ms/token on the
        # 7B decode step (scripts/decomp.py unroll_list). Default: unrolled on
        # TPU (perf), scanned elsewhere (compile time; CPU tests).
        if unroll_layers is None:
            unroll_layers = jax.default_backend() == "tpu"
        self.unrolled = bool(unroll_layers)
        self.stacked = None if self.unrolled else stack_layers(params["layers"])
        # everything the jitted step reads must be an ARGUMENT, not a closure
        # capture — closed-over arrays get baked into the program as constants
        # (multi-GB programs, pathological compiles)
        self._step_params = {
            "statics": {k: v for k, v in params.items() if k != "layers"},
            "stacked": self.stacked,
            "layers": None if self.stacked is not None else params["layers"],
        }
        if self._tp is not None:
            from ..parallel import tp_model
            self._sp_specs = tp_model.step_specs(arch_name, self._step_params,
                                                 tp_axis)
            if not abstract:
                self._step_params = tp_model.place_step_params(
                    self._step_params, mesh, self._sp_specs)
        self._prefill_cache: dict[int, callable] = {}
        # token-scan partial unroll: each lax.scan iteration pays a fixed
        # per-iteration cost on the dispatch path (~0.6 ms through the axon
        # relay); unrolling 8 steps per iteration amortizes it. Swept on chip
        # (round 3, bench_artifacts/r03_sweep.json): unroll 4 -> 152.2 tok/s,
        # unroll 8 -> 156.8 tok/s (0.9725 of roofline) on 7B INT4-g128
        # decode; fused QKV added nothing on top (156.4).
        # GPTQ_TPU_TOKEN_UNROLL overrides for sweeps.
        import os
        self._token_unroll = int(os.environ.get(
            "GPTQ_TPU_TOKEN_UNROLL",
            "8" if jax.default_backend() == "tpu" else "1"))
        self._decode = jax.jit(self._step_fn(1))
        self._decode_scan_cache: dict[int, callable] = {}

    # -- model step ---------------------------------------------------------

    def _scan_layers(self, sp, x, positions, mask, cache: KVCache, rope,
                     cfg=None, tp_ctx=None):
        arch = self.arch
        cfg = cfg or self.cfg
        if sp["stacked"] is not None:
            def body(carry, layer_in):
                xc = carry
                lp, ck, cv = layer_in
                y, _, (ck2, cv2) = arch.layer(cfg, lp, xc, positions, mask,
                                              (ck, cv, cache.offset), rope=rope,
                                              tp_ctx=tp_ctx)
                return y, (ck2, cv2)

            x, (k_new, v_new) = jax.lax.scan(
                body, x, (sp["stacked"], cache.k, cache.v))
            return x, KVCache(k_new, v_new, cache.offset)
        # unrolled loop (perf mode or heterogeneous layers; still one jit).
        # cache.k[li] on a tuple cache is Python indexing — zero device ops;
        # on a stacked-array cache (heterogeneous checkpoints) it is a slice.
        ks, vs = [], []
        for li, lp in enumerate(sp["layers"]):
            x, _, (k2, v2) = arch.layer(cfg, lp, x, positions, mask,
                                        (cache.k[li], cache.v[li], cache.offset),
                                        rope=rope, tp_ctx=tp_ctx)
            ks.append(k2)
            vs.append(v2)
        if isinstance(cache.k, tuple):
            return x, KVCache(tuple(ks), tuple(vs), cache.offset)
        return x, KVCache(jnp.stack(ks), jnp.stack(vs), cache.offset)

    def _cache_specs(self):
        from jax.sharding import PartitionSpec as P
        t = self._tp
        if self.unrolled:
            kv = P(t["dp_axis"], None, t["axis"], None)  # per-layer leaves
            n = len(self.params["layers"])
            return KVCache(tuple(kv for _ in range(n)),
                           tuple(kv for _ in range(n)), P())
        kv = P(None, t["dp_axis"], None, t["axis"], None)
        return KVCache(kv, kv, P())

    def _step_fn(self, s: int):
        arch, cfg = self.arch, self.cfg

        if self._tp is None:
            def step(sp, ids, cache: KVCache):
                statics = sp["statics"]
                positions = cache.offset + jnp.arange(s)[None, :]
                mask = decode_mask(s, self.max_len, cache.offset)
                rope = arch.step_rope(cfg, positions, self.dtype)
                x = arch.embed(statics, cfg, ids, positions).astype(self.dtype)
                x, cache = self._scan_layers(sp, x, positions, mask, cache, rope)
                logits = arch.head(statics, cfg, x)
                cache = KVCache(cache.k, cache.v, cache.offset + s)
                return logits, cache

            return step

        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        from ..parallel import tp_model
        t = self._tp
        cfg_l, axis, tp = t["cfg_local"], t["axis"], t["tp"]

        def step_local(sp, ids, cache: KVCache):
            sp = tp_model.localize_step_params(self.arch_name, sp, tp)
            statics = sp["statics"]
            positions = cache.offset + jnp.arange(s)[None, :]
            mask = decode_mask(s, self.max_len, cache.offset)
            rope = arch.step_rope(cfg_l, positions, self.dtype)
            x = arch.embed(statics, cfg_l, ids, positions).astype(self.dtype)
            x, cache = self._scan_layers(sp, x, positions, mask, cache, rope,
                                         cfg=cfg_l, tp_ctx=(axis, tp))
            logits = arch.head(statics, cfg_l, x)
            cache = KVCache(cache.k, cache.v, cache.offset + s)
            return logits, cache

        cache_specs = self._cache_specs()
        return shard_map(
            step_local, mesh=t["mesh"],
            in_specs=(self._sp_specs, P(t["dp_axis"], None), cache_specs),
            out_specs=(P(t["dp_axis"], None, axis), cache_specs),
            check_vma=False)

    def init_cache(self) -> KVCache:
        cache = KVCache.zeros(self.cfg, len(self.params["layers"]), self.batch,
                              self.max_len, self.kv_dtype,
                              unrolled=self.unrolled)
        if self._tp is not None:
            from jax.sharding import NamedSharding
            specs = self._cache_specs()
            put = lambda x, sp: jax.tree_util.tree_map(
                lambda a, s: jax.device_put(
                    a, NamedSharding(self._tp["mesh"], s)), x, sp)
            cache = KVCache(put(cache.k, specs.k), put(cache.v, specs.v),
                            jax.device_put(cache.offset,
                                           NamedSharding(self._tp["mesh"],
                                                         specs.offset)))
        return cache

    def prefill(self, ids, cache: KVCache):
        """ids: (B, S) — prompt pass. Compiles per distinct S (bucket ladder)."""
        s = ids.shape[1]
        if s not in self._prefill_cache:
            self._prefill_cache[s] = jax.jit(self._step_fn(s))
        return self._prefill_cache[s](self._step_params, ids, cache)

    def decode(self, ids, cache: KVCache):
        """ids: (B, 1) — one decode step under the cached-compile jit."""
        return self._decode(self._step_params, ids, cache)

    def decode_greedy_scan(self, ids, cache: KVCache, steps: int):
        """Run `steps` greedy decode iterations inside ONE compiled program.

        ids: (B, 1) first token. Returns (tokens (B, steps), cache). lax.scan
        keeps the whole token loop on device — one host dispatch for N tokens
        (the reference pays a python-loop dispatch per token, llama.py:406).
        """
        if steps not in self._decode_scan_cache:
            step = self._step_fn(1)

            @jax.jit
            def run(sp, tok0, cache):
                def body(carry, _):
                    tok, cache = carry
                    logits, cache = step(sp, tok, cache)
                    nxt = jnp.argmax(logits[:, -1].astype(jnp.float32),
                                     axis=-1).astype(jnp.int32)[:, None]
                    return (nxt, cache), nxt[:, 0]
                (_, cache), toks = jax.lax.scan(body, (tok0, cache), None,
                                                length=steps,
                                                unroll=self._token_unroll)
                return jnp.swapaxes(toks, 0, 1), cache

            self._decode_scan_cache[steps] = run
        return self._decode_scan_cache[steps](self._step_params, ids, cache)

    def decode_sample_scan(self, last_logits, cache: KVCache, steps: int,
                           key, temperature, top_p, top_k: int = 0,
                           eos_id: Optional[int] = None, min_left: int = 0):
        """`steps` sample+decode iterations inside ONE compiled program.

        The span analogue of serving's run_span (runtime/serve.py:304-324)
        for single-request generation: sampling (sample_logits) and the PRNG
        key threading run in-program, so a span of N tokens costs one host
        dispatch instead of N (each ~20-30 ms through the axon relay — the
        per-token loop was ~4x slower than the engine's own decode step).

        last_logits: (B, V) logits to sample the FIRST token from (prefill
        tail or previous span tail). min_left: EOS cannot be SAMPLED for the
        first `min_left` in-span steps (HF MinLengthLogitsProcessor
        semantics, sliced per span by the host). Returns
        (tokens (B, steps), last_logits, cache, key).
        """
        # static sampling fast path, derived from the HOST-side values (one
        # compile per mode at most): all-greedy spans skip the in-scan
        # full-vocab sort entirely; unfiltered sampling skips the sort too
        t_np, p_np = np.asarray(temperature), np.asarray(top_p)
        mode = ("greedy" if (t_np == 0).all() else
                "categorical" if top_k == 0 and (p_np >= 1).all() else None)
        cache_key = ("sample", steps, int(top_k), eos_id is not None, mode)
        if cache_key not in self._decode_scan_cache:
            step = self._step_fn(1)
            has_eos = eos_id is not None

            @jax.jit
            def run(sp, last, cache, key, temperature, top_p, min_left,
                    eos):
                def body(carry, i):
                    last, cache, key = carry
                    key, sub = jax.random.split(key)
                    lg = last.astype(jnp.float32)
                    if has_eos:
                        lg = jnp.where(
                            (jnp.arange(lg.shape[-1])[None, :] == eos)
                            & (i < min_left), -jnp.inf, lg)
                    tok = sample_logits(lg, sub, temperature, top_p,
                                        top_k, mode=mode
                                        ).astype(jnp.int32)[:, None]
                    logits, cache = step(sp, tok, cache)
                    return (logits[:, -1], cache, key), tok[:, 0]

                (last, cache, key), toks = jax.lax.scan(
                    body, (last, cache, key), jnp.arange(steps),
                    unroll=self._token_unroll)
                return jnp.swapaxes(toks, 0, 1), last, cache, key

            self._decode_scan_cache[cache_key] = run
        return self._decode_scan_cache[cache_key](
            self._step_params, last_logits, cache, key,
            jnp.asarray(temperature, jnp.float32),
            jnp.asarray(top_p, jnp.float32),
            jnp.asarray(min_left, jnp.int32),
            jnp.asarray(-1 if eos_id is None else eos_id, jnp.int32))

    def forced_decode_scan(self, ids, cache: KVCache):
        """Teacher-forced decode: feed ids (B, S) one token per step inside ONE
        compiled program; returns (last_logits (B, 1, V), cache).

        Equivalent to prefill(ids) for the resulting cache/logits, but reuses
        the (fast-compiling) s=1 decode step — bench/serving can seed a cache
        without compiling a separate prefill-length program.
        """
        s = ids.shape[1]
        key = ("forced", s)
        if key not in self._decode_scan_cache:
            step = self._step_fn(1)

            @jax.jit
            def run(sp, ids, cache):
                def body(cache, tok):
                    logits, cache = step(sp, tok[:, None], cache)
                    return cache, logits[:, -1]
                cache, logits = jax.lax.scan(body, cache,
                                             jnp.swapaxes(ids, 0, 1),
                                             unroll=self._token_unroll)
                return logits[-1][:, None], cache

            self._decode_scan_cache[key] = run
        return self._decode_scan_cache[key](self._step_params, ids, cache)

    def warmup(self, prefill_buckets=(128,), autotune: bool = True):
        """AOT compile decode + given prefill lengths (the reference's
        autotune_warmup_linear/fused equivalent, quant_linear.py:393-423).

        autotune=True additionally runs the MEASURED kernel tuner over every
        distinct packed-linear shape at the decode row bucket before the
        first trace (reference custom_autotune measures per shape and
        caches; ours persists across processes — ops/pallas/autotune.py).
        No-op off-TPU or when GPTQ_TPU_AUTOTUNE disables it."""
        if autotune and self._tp is None:
            from ..ops.pallas import autotune as at
            at.ensure_linears(collect_packed_linears(self.params),
                              max(8, self.batch))
            at.ensure_mlp_pairs(collect_mlp_pairs(self.params),
                                max(8, self.batch))
        cache = self.init_cache()
        for s in prefill_buckets:
            ids = jnp.zeros((self.batch, s), jnp.int32)
            jax.block_until_ready(self.prefill(ids, cache)[0])
        ids1 = jnp.zeros((self.batch, 1), jnp.int32)
        jax.block_until_ready(self.decode(ids1, cache)[0])


# ---------------------------------------------------------------------------
# sampling (reference llama_inference.py:119-127 flags: top_p/temperature/min len)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("top_k", "mode"))
def sample_logits(logits, key, temperature, top_p, top_k: int = 0,
                  mode: Optional[str] = None):
    """Temperature + nucleus (top-p) + optional top-k sampling; (B, V) -> (B,).

    temperature/top_p may be scalars or per-row (B,) arrays (continuous
    batching samples every slot with its own params in ONE call).

    mode is a STATIC host-side promise that skips the full-vocab descending
    sort (the dominant cost of this function on TPU — a 32k-wide sort per
    step), legal only when the host KNOWS the traced params satisfy it:
      "greedy"      every row it cares about has temperature == 0 -> argmax.
      "categorical" top_k == 0 and every top_p >= 1 -> no tail filtering;
                    temperature-scaled categorical (rows with temperature 0
                    still take the argmax, as in the general path).
      None          the general sort + top-k/top-p filter path.
    Results for the promised rows are distributionally equivalent to
    mode=None and bitwise identical under the same PRNG key EXCEPT for a
    rare float-rounding edge in the general path: its cumsum cutoff
    (cum < top_p) can clip a tail token when rounding pushes the cumulative
    sum to 1.0 before the last index, in which case the fast path (which
    never filters at top_p >= 1) is the more faithful of the two."""
    logits = logits.astype(jnp.float32)
    b = logits.shape[0]
    greedy = jnp.argmax(logits, axis=-1)
    if mode == "greedy":
        return greedy
    temperature = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (b,))
    top_p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (b,))

    t = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / t
    if mode == "categorical":
        if top_k:
            raise ValueError("mode='categorical' requires top_k == 0")
        sampled = jax.random.categorical(key, scaled, axis=-1)
        return jnp.where(temperature == 0.0, greedy, sampled)
    # one descending sort serves both the top-k threshold and the top-p scan
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    if top_k and top_k > 0:
        kth = sorted_logits[:, top_k - 1][:, None]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
        sorted_logits = jnp.where(
            jnp.arange(sorted_logits.shape[-1])[None, :] >= top_k,
            -jnp.inf, sorted_logits)
    # top-p: drop lowest-prob tail beyond cumulative p
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < top_p[:, None], axis=-1)  # keep one past boundary
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
    filtered = jnp.where(scaled < cutoff, -jnp.inf, scaled)
    sampled = jax.random.categorical(key, filtered, axis=-1)
    return jnp.where(temperature == 0.0, greedy, sampled)


def generate(runner: ModelRunner, prompt_ids, max_new_tokens: int,
             temperature: float = 0.8, top_p: float = 0.95, top_k: int = 0,
             min_new_tokens: int = 0, eos_token_id: Optional[int] = None,
             seed: int = 0, stream=None, span: int = 32):
    """Autoregressive generation (reference llama_inference.py:109-128 semantics).

    prompt_ids: (B, S) or (S,) int. Returns (B, S + new) generated ids (numpy).

    Runners with `decode_sample_scan` (ModelRunner) decode in spans of up to
    `span` tokens per host dispatch (sampling + PRNG threading in-program);
    EOS is handled host-side between spans, truncated so results are
    token-identical to span=1. Runners without it (OffloadRunner — its layer
    streaming is inherently host-driven) use the per-token loop.
    """
    ids = np.atleast_2d(np.asarray(prompt_ids, dtype=np.int32))
    b, s = ids.shape
    assert b == runner.batch, f"runner batch {runner.batch} != prompt batch {b}"
    assert s + max_new_tokens <= runner.max_len, "exceeds cache capacity"
    key = jax.random.PRNGKey(seed)

    cache = runner.init_cache()
    logits, cache = runner.prefill(jnp.asarray(ids), cache)
    out = [ids]
    last = logits[:, -1]
    done = np.zeros(b, bool)

    if hasattr(runner, "decode_sample_scan") and span > 1:
        produced = 0
        while produced < max_new_tokens and not done.all():
            n = min(span, max_new_tokens - produced)
            min_left = max(0, min_new_tokens - produced)
            toks, last, cache, key = runner.decode_sample_scan(
                last, cache, n, key, temperature, top_p, top_k,
                eos_id=eos_token_id, min_left=min_left)
            toks = np.asarray(toks, np.int32)  # (B, n)
            # host-side EOS bookkeeping, column by column — identical
            # semantics to the per-token loop (loop breaks after the column
            # where every row has hit EOS; later columns are discarded)
            keep = n
            for j in range(n):
                if eos_token_id is not None and produced + j >= min_new_tokens:
                    done |= toks[:, j] == eos_token_id
                if stream is not None:
                    stream(toks[:, j])
                if done.all():
                    keep = j + 1
                    break
            out.append(toks[:, :keep])
            produced += keep
        return np.concatenate(out, axis=1)

    for step in range(max_new_tokens):
        key, sub = jax.random.split(key)
        if eos_token_id is not None and step < min_new_tokens:
            # HF MinLengthLogitsProcessor semantics (the reference's
            # model.generate path, llama_inference.py:120-127): EOS cannot
            # be SAMPLED before min length, not merely ignored
            last = last.at[:, eos_token_id].set(-jnp.inf)
        nxt = sample_logits(last, sub, temperature, top_p, top_k)
        nxt = np.asarray(nxt, np.int32)
        if eos_token_id is not None and step >= min_new_tokens:
            done |= nxt.reshape(-1) == eos_token_id
        out.append(nxt.reshape(b, 1))
        if stream is not None:
            stream(nxt.reshape(-1))
        if done.all():
            break
        logits, cache = runner.decode(jnp.asarray(nxt.reshape(b, 1)), cache)
        last = logits[:, -1]
    return np.concatenate(out, axis=1)


# ---------------------------------------------------------------------------
# decode benchmark (reference llama.py:385-438)
# ---------------------------------------------------------------------------

def benchmark_decode(runner: ModelRunner, input_ids, check: bool = False,
                     log=print) -> dict:
    """Feed input_ids one token at a time through the decode step; report
    median per-token latency (reference prints median tok time, llama.py:435),
    max device memory, and optional next-token PPL over the driven tokens
    (--check, llama.py:404-437).
    """
    ids = np.atleast_2d(np.asarray(input_ids, dtype=np.int32))
    b, n = ids.shape
    assert n <= runner.max_len
    cache = runner.init_cache()
    # compile outside the timed region (reference syncs before timing)
    runner.warmup(prefill_buckets=())

    times = []
    nll = 0.0
    logits = None
    for i in range(n):
        tok = jnp.asarray(ids[:, i:i + 1])
        t0 = time.perf_counter()
        logits, cache = runner.decode(tok, cache)
        # host readback: block_until_ready can return early on the axon
        # relay (CLAUDE.md); a tiny slice forces true completion
        np.asarray(logits[:1, :1, :1])
        times.append(time.perf_counter() - t0)
        if check and i + 1 < n:
            lp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
            nll -= float(jnp.mean(lp[jnp.arange(b), ids[:, i + 1]]))
        if (i + 1) % 256 == 0:
            log(f"  benchmark {i + 1}/{n} median {np.median(times) * 1e3:.2f} ms")

    med = float(np.median(times))
    result = {
        "tokens": n,
        "median_latency_s": med,
        "tokens_per_s": (1.0 / med) * b,
        "max_memory_bytes": _device_peak_memory(),
    }
    if check and n > 1:
        result["ppl"] = float(np.exp(nll / (n - 1)))
    return result


def _device_peak_memory() -> int:
    """Max memory telemetry (reference torch.cuda.memory_allocated, llama.py:425)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return int(stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)))
    except Exception:
        return 0
