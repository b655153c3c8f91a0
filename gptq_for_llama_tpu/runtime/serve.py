"""Continuous-batching serving engine.

Beyond the reference (which decodes one sequence via HF generate,
llama_inference.py:109-128) — required by the north star: decode throughput on
TPU comes from keeping the weight-bandwidth-bound decode step busy with many
sequences. Design:

- a fixed pool of B cache slots over one static (L, B, max_len, Hkv, D) KV
  cache; every slot has its OWN offset (per-slot positions — vector-offset
  variant of models/common.update_kv_cache);
- ONE jitted decode step advances all live slots per iteration;
- arrivals are prefilled into free slots with length-bucketed compiled
  prefills (right-padding is safe: padded cache slots are masked until the
  real token at that position overwrites them before first attention read);
- finished sequences (eos/max_new) free their slot immediately; the scheduler
  backfills from the queue — classic continuous batching.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import PartitionSpec as P

from ..models.registry import get_arch
from ..models.common import decode_mask
from .runner import sample_logits, stack_layers


@dataclasses.dataclass
class GenRequest:
    uid: int
    prompt: np.ndarray            # (S,) int32
    max_new_tokens: int = 64
    temperature: float = 0.0
    top_p: float = 1.0
    eos_token_id: Optional[int] = None


@dataclasses.dataclass
class _Slot:
    req: Optional[GenRequest] = None
    generated: list = dataclasses.field(default_factory=list)
    done: bool = True
    # chunked-prefill progress (prefill_chunk mode)
    pending: Optional[np.ndarray] = None   # chunk-padded prompt still to feed
    ppos: int = 0                          # next chunk start
    plen: int = 0                          # true prompt length


def _slot_slice(cache, slot):
    """One slot's rows from a dense cache: (L, B, S, H, D) array (slot axis 1)
    or per-layer tuple of (B, S, H, D) (slot axis 0, unrolled mode)."""
    if isinstance(cache, tuple):
        return tuple(jax.lax.dynamic_slice_in_dim(c, slot, 1, axis=0)
                     for c in cache)
    return jax.lax.dynamic_slice_in_dim(cache, slot, 1, axis=1)


def _slot_update(cache, new, slot):
    if isinstance(cache, tuple):
        return tuple(jax.lax.dynamic_update_slice_in_dim(c, n, slot, axis=0)
                     for c, n in zip(cache, new))
    return jax.lax.dynamic_update_slice_in_dim(cache, new, slot, axis=1)


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


class ServingEngine:
    def __init__(self, arch_name: str, cfg, params, batch_slots: int = 8,
                 max_seq_len: Optional[int] = None, dtype=jnp.bfloat16,
                 prefill_buckets=(32, 128, 512), paged: bool = False,
                 block_size: int = 16, num_blocks: Optional[int] = None,
                 prefill_chunk: Optional[int] = None,
                 unroll_layers: Optional[bool] = None,
                 decode_span: int = 1, fused_chunk_decode: bool = True,
                 mesh=None, shard_map_tp: bool = False, tp_axis: str = "tp",
                 fuse_qkv: bool = False, kv_dtype=None):
        self.arch = get_arch(arch_name)
        self.arch_name = arch_name
        self.cfg = cfg
        self.dtype = dtype
        # KV STORAGE dtype (fp8 halves pool/cache memory -> 2x the tokens per
        # pool and half the decode-attention HBM traffic; compute in `dtype`)
        self.kv_dtype = kv_dtype or dtype
        self.b = batch_slots
        self.max_len = max_seq_len or cfg.max_seq_len
        self.buckets = tuple(b for b in prefill_buckets if b <= self.max_len)
        # implicit final bucket: a prompt longer than every configured bucket
        # but within the cache must still be servable (one extra compile at
        # full length instead of a ValueError)
        if not self.buckets or self.buckets[-1] < self.max_len:
            self.buckets = self.buckets + (self.max_len,)
        # paged mode: slots share a block pool sized by actual tokens instead
        # of slots * max_len (runtime/paged.py); prompts always start at a
        # block boundary (offset 0), so prefill writes whole blocks
        self.paged = paged
        self.block_size = block_size
        # chunked prefill: at most ONE fixed-size prompt chunk per engine
        # iteration — decode stalls are bounded by a chunk instead of a whole
        # prompt, and every chunk shares one compiled shape
        self.prefill_chunk = prefill_chunk
        if prefill_chunk is not None and paged:
            assert prefill_chunk % block_size == 0, \
                "prefill_chunk must be a multiple of block_size in paged mode"
        # cache capacity must cover chunk-padded prompt writes
        cap = self.max_len if prefill_chunk is None else \
            -(-self.max_len // prefill_chunk) * prefill_chunk
        self.max_blocks = -(-cap // block_size)
        self.num_blocks = num_blocks or batch_slots * self.max_blocks
        self.logical_len = self.max_blocks * block_size
        if prefill_chunk is not None and not paged:
            self.max_len = cap  # dense cache rows must fit padded writes
        # shard_map tensor parallelism (parallel/tp_model): every jitted step
        # (prefill, decode, span) runs inside one shard_map region so the
        # Pallas kernels execute on each device's local TP shard. TP-only
        # (slots are not dp-sharded); sampling all-gathers the vocab-sharded
        # logits in-program.
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
            params = tp_model.prepare_tp_params(arch_name, params, tp)
            self._tp = {"mesh": mesh, "axis": tp_axis, "tp": tp,
                        "cfg_local": tp_model.local_config(cfg, tp)}
        # unrolled layers: per-layer params as separate jit arguments and the
        # KV cache/pool as per-layer tuple leaves — lax.scan over the stacked
        # weight pytree materializes each layer's packed weights before the
        # Pallas kernels read them (12.4 -> 7.4 ms/token on the 7B decode
        # step; scripts/decomp.py). Default on TPU.
        if unroll_layers is None:
            unroll_layers = jax.default_backend() == "tpu"
        self.unrolled = bool(unroll_layers)
        if self._tp is None:
            # measured kernel autotune at this engine's decode row bucket
            # before any step traces (no-op off-TPU / on cache hits)
            from ..ops.pallas import autotune as at
            from .runner import collect_mlp_pairs, collect_packed_linears
            lins = collect_packed_linears(params)
            pairs = collect_mlp_pairs(params)
            at.ensure_linears(lins, max(8, self.b))
            at.ensure_mlp_pairs(pairs, max(8, self.b))
            if prefill_chunk is not None and fused_chunk_decode:
                # the fused chunk+decode program runs linears at B+C rows
                at.ensure_linears(lins, self.b + prefill_chunk)
                at.ensure_mlp_pairs(pairs, self.b + prefill_chunk)
        stacked = None if self.unrolled else stack_layers(params["layers"])
        self._sp = {
            "statics": {k: v for k, v in params.items() if k != "layers"},
            "stacked": stacked,
            "layers": None if stacked is not None else params["layers"],
        }
        self.num_layers = len(params["layers"])
        if self._tp is not None:
            from ..parallel import tp_model
            self._sp_specs = tp_model.step_specs(arch_name, self._sp, tp_axis)
            self._sp = tp_model.place_step_params(self._sp, mesh,
                                                  self._sp_specs)
        self._decode_step_fn = self._make_decode()
        self._decode = self._jit_tp(
            self._decode_step_fn,
            rest_in=(P(), self._cache_pspec(), self._cache_pspec(), P(), P(),
                     P()),
            out=(self._vocab_pspec(), self._cache_pspec(),
                 self._cache_pspec(), P())) if self._tp is not None \
            else jax.jit(self._decode_step_fn)
        # multi-step scheduling: `decode_span` decode+sample iterations inside
        # ONE compiled program per host round-trip — through a high-latency
        # dispatch path (the axon relay pays ~20-30 ms per host step) the
        # per-iteration host loop, not the model, bounds serving throughput.
        # Sequences may overshoot eos/max_new by up to span-1 tokens on
        # device; the host trims them (same results as span=1).
        self.decode_span = max(1, int(decode_span))
        self._decode_span_fns = {}
        # chunked prefill + decode fused into ONE program (one dispatch): the
        # pending slot's next chunk and a decode token for every live slot
        # ride the same compiled step (PARITY known-gap closed)
        self.fused_chunk_decode = bool(fused_chunk_decode)
        # batched admission: same-bucket admissions share one prefill program
        # up to this bucket size (beyond it the batched program's masked
        # attention transient (B, H, blen, blen) outweighs saved dispatches)
        self.admit_batch_max = int(os.environ.get(
            "GPTQ_TPU_ADMIT_BATCH_MAX", "128"))
        self._chunk_decode_fn = None
        self._prefills = {}
        self.slots = [_Slot() for _ in range(batch_slots)]
        self.queue: list[GenRequest] = []
        self.results: dict[int, np.ndarray] = {}
        # per-request wall-clock metrics: submit -> first token -> done
        self._meta: dict[int, dict] = {}
        self._key = jax.random.PRNGKey(0)

    # -- jitted model steps --------------------------------------------------

    def _model_cfg(self):
        return self._tp["cfg_local"] if self._tp is not None else self.cfg

    def _tp_ctx(self):
        return (self._tp["axis"], self._tp["tp"]) if self._tp is not None \
            else None

    def _cache_pspec(self):
        axis = self._tp["axis"]
        per = P(None, None, axis, None)  # (B,S,H,D) dense / (NB,BS,H,D) paged
        if self.unrolled:
            return tuple(per for _ in range(self.num_layers))
        return P(None, None, None, axis, None)

    def _vocab_pspec(self):
        return P(None, self._tp["axis"])

    def _jit_tp(self, fn, rest_in, out):
        """shard_map-wrap a step fn (sp is always the first argument)."""
        from jax import shard_map
        from ..parallel import tp_model
        t = self._tp

        def localized(sp, *rest):
            sp = tp_model.localize_step_params(self.arch_name, sp, t["tp"])
            return fn(sp, *rest)

        return jax.jit(shard_map(
            localized, mesh=t["mesh"],
            in_specs=(self._sp_specs,) + tuple(rest_in),
            out_specs=out, check_vma=False))

    def _layers(self, sp, x, positions, mask, k_cache, v_cache, offsets,
                tables=None, write_mask=None, fresh=False):
        arch, cfg = self.arch, self._model_cfg()
        tp_ctx = self._tp_ctx()
        rope = arch.step_rope(cfg, positions, self.dtype)

        def past(ck, cv):
            if fresh:  # batched admission: all rows prefill from position 0
                return ("fresh", ck, cv, write_mask) if tables is None else \
                    ("fresh_paged", ck, cv, tables, write_mask)
            if tables is None:
                return (ck, cv, offsets) if write_mask is None else \
                    (ck, cv, offsets, write_mask)
            return ("paged", ck, cv, tables, offsets) if write_mask is None \
                else ("paged", ck, cv, tables, offsets, write_mask)

        if sp["stacked"] is not None:
            def body(xc, layer_in):
                lp, ck, cv = layer_in
                y, _, (ck2, cv2) = arch.layer(cfg, lp, xc, positions, mask,
                                              past(ck, cv), rope=rope,
                                              tp_ctx=tp_ctx)
                return y, (ck2, cv2)
            x, (k2, v2) = jax.lax.scan(body, x, (sp["stacked"], k_cache, v_cache))
            return x, k2, v2
        ks, vs = [], []
        for li, lp in enumerate(sp["layers"]):
            x, _, (k2, v2) = arch.layer(cfg, lp, x, positions, mask,
                                        past(k_cache[li], v_cache[li]),
                                        rope=rope, tp_ctx=tp_ctx)
            ks.append(k2)
            vs.append(v2)
        if isinstance(k_cache, tuple):  # unrolled: per-layer leaves, no stack
            return x, tuple(ks), tuple(vs)
        return x, jnp.stack(ks), jnp.stack(vs)

    def _kv_len(self) -> int:
        return self.logical_len if self.paged else self.max_len

    def _make_decode(self):
        arch, cfg = self.arch, self._model_cfg()

        def step(sp, toks, k_cache, v_cache, offsets, live, tables):
            """toks (B,1); offsets (B,); live (B,) bool. One token for all slots."""
            positions = offsets[:, None]
            mask = decode_mask(1, self._kv_len(), offsets)
            x = arch.embed(sp["statics"], cfg, toks, positions).astype(self.dtype)
            # write-mask: a batched step decodes EVERY slot; non-live slots
            # (retired, or mid-chunked-prefill in the fused program) must not
            # clobber their cache rows
            x, k2, v2 = self._layers(sp, x, positions, mask, k_cache, v_cache,
                                     offsets, tables=tables, write_mask=live)
            logits = arch.head(sp["statics"], cfg, x)[:, -1]
            new_off = jnp.where(live, offsets + 1, offsets)
            return logits, k2, v2, new_off

        return step  # jitted once by __init__

    def _sample_mode(self, state):
        """STATIC sampling fast path for the next dispatch, from the host-side
        params of the slots whose tokens will be kept (live ones): all-greedy
        batches skip sample_logits' full-vocab sort (the 32k-wide in-program
        sort was a measurable slice of the serving step). At most one extra
        compile per mode (3 total) per step shape."""
        live = state["live"]
        if not live.any() or (state["temps"][live] == 0).all():
            return "greedy"
        if (state["tops"][live] >= 1).all():
            return "categorical"
        return None

    def _get_decode_span(self, mode=None):
        if mode in self._decode_span_fns:
            return self._decode_span_fns[mode]
        base = self._decode_step_fn
        span = self.decode_span

        tp_axis = self._tp["axis"] if self._tp is not None else None

        def run_span(sp, toks, k_cache, v_cache, offsets, live, tables,
                     temps, tops, key):
            def body(carry, sub):
                toks, k, v, off = carry
                logits, k, v, off = base(sp, toks, k, v, off, live, tables)
                if tp_axis is not None:
                    # sampling needs the full vocab row; keys are replicated,
                    # so every shard draws the SAME token
                    logits = jax.lax.all_gather(logits, tp_axis,
                                                axis=logits.ndim - 1,
                                                tiled=True)
                nxt = sample_logits(logits, sub, temps, tops,
                                    mode=mode).astype(jnp.int32)
                nxt = jnp.where(live, nxt, toks[:, 0])  # dead slots: repeat
                return (nxt[:, None], k, v, off), nxt

            subs = jax.random.split(key, span)
            # partial unroll amortizes the per-scan-iteration dispatch floor
            (toks, k, v, off), all_toks = jax.lax.scan(
                body, (toks, k_cache, v_cache, offsets), subs,
                unroll=min(4, span) if jax.default_backend() == "tpu" else 1)
            return jnp.swapaxes(all_toks, 0, 1), k, v, off  # (B, span)

        if self._tp is not None:
            cache = self._cache_pspec()
            self._decode_span_fns[mode] = self._jit_tp(
                run_span,
                rest_in=(P(), cache, cache, P(), P(), P(), P(), P(), P()),
                out=(P(), cache, cache, P()))
        else:
            self._decode_span_fns[mode] = jax.jit(run_span)
        return self._decode_span_fns[mode]

    def _get_prefill(self, blen: int):
        if blen in self._prefills:
            return self._prefills[blen]
        arch, cfg = self.arch, self._model_cfg()

        def prefill_dense(sp, ids, k_cache, v_cache, slot, true_len):
            """ids (1, blen) right-padded; writes into cache slot; returns
            last-real-token logits (1, V)."""
            kc = _slot_slice(k_cache, slot)
            vc = _slot_slice(v_cache, slot)
            offsets = jnp.zeros((1,), jnp.int32)
            positions = jnp.arange(blen)[None, :]
            mask = decode_mask(blen, self.max_len, 0)
            x = arch.embed(sp["statics"], cfg, ids, positions).astype(self.dtype)
            x, kc2, vc2 = self._layers(sp, x, positions, mask, kc, vc, offsets)
            logits = arch.head(sp["statics"], cfg, x)
            last = jnp.take_along_axis(
                logits, (true_len - 1)[None, None, None].astype(jnp.int32),
                axis=1)[:, 0]
            k_cache = _slot_update(k_cache, kc2, slot)
            v_cache = _slot_update(v_cache, vc2, slot)
            return last, k_cache, v_cache

        def prefill_paged(sp, ids, k_pool, v_pool, table_row, true_len):
            """Writes whole blocks of the slot's table (prompt starts at 0)."""
            offsets = jnp.zeros((1,), jnp.int32)
            positions = jnp.arange(blen)[None, :]
            mask = decode_mask(blen, self._kv_len(), 0)
            x = arch.embed(sp["statics"], cfg, ids, positions).astype(self.dtype)
            x, k_pool, v_pool = self._layers(sp, x, positions, mask, k_pool,
                                             v_pool, offsets,
                                             tables=table_row[None])
            logits = arch.head(sp["statics"], cfg, x)
            last = jnp.take_along_axis(
                logits, (true_len - 1)[None, None, None].astype(jnp.int32),
                axis=1)[:, 0]
            return last, k_pool, v_pool

        fn = prefill_paged if self.paged else prefill_dense
        if self._tp is not None:
            cache = self._cache_pspec()
            self._prefills[blen] = self._jit_tp(
                fn, rest_in=(P(), cache, cache, P(), P()),
                out=(self._vocab_pspec(), cache, cache))
        else:
            self._prefills[blen] = jax.jit(fn)
        return self._prefills[blen]

    def _get_admit_prefill(self, blen: int):
        """Batched admission prefill: ONE program prefills every admitted
        slot's (right-padded) prompt at cache position 0. Non-admitted rows
        are write-masked; attention sees only the fresh chunk (causal)."""
        key = ("admit", blen)
        if key in self._prefills:
            return self._prefills[key]
        arch, cfg = self.arch, self._model_cfg()
        from ..models.common import causal_mask

        def admit(sp, ids, k_cache, v_cache, tables, admit_mask, true_lens):
            positions = jnp.arange(blen)[None, :]
            mask = causal_mask(blen, blen)
            x = arch.embed(sp["statics"], cfg, ids, positions).astype(self.dtype)
            x, k2, v2 = self._layers(sp, x, positions, mask, k_cache, v_cache,
                                     None, tables=tables,
                                     write_mask=admit_mask, fresh=True)
            # head on the last REAL hidden state per row only (one (B, V)
            # GEMM instead of (B, blen, V))
            x_last = jnp.take_along_axis(
                x, (true_lens - 1)[:, None, None].astype(jnp.int32), axis=1)
            logits = arch.head(sp["statics"], cfg, x_last)[:, 0]
            return logits, k2, v2

        if self._tp is not None:
            cache = self._cache_pspec()
            self._prefills[key] = self._jit_tp(
                admit, rest_in=(P(), cache, cache, P(), P(), P()),
                out=(self._vocab_pspec(), cache, cache))
        else:
            self._prefills[key] = jax.jit(admit)
        return self._prefills[key]

    def _get_chunk_prefill(self):
        """One compiled fn for every prompt chunk: runs `prefill_chunk` tokens
        of one slot starting at cache position off0."""
        if getattr(self, "_chunk_fn", None) is not None:
            return self._chunk_fn
        arch, cfg = self.arch, self._model_cfg()
        blen = self.prefill_chunk

        def chunk_dense(sp, ids, k_cache, v_cache, slot, off0, last_idx):
            kc = _slot_slice(k_cache, slot)
            vc = _slot_slice(v_cache, slot)
            offsets = off0[None]
            positions = off0 + jnp.arange(blen)[None, :]
            mask = decode_mask(blen, self.max_len, off0)
            x = arch.embed(sp["statics"], cfg, ids, positions).astype(self.dtype)
            x, kc2, vc2 = self._layers(sp, x, positions, mask, kc, vc, offsets)
            logits = arch.head(sp["statics"], cfg, x)
            last = jnp.take_along_axis(
                logits, last_idx[None, None, None].astype(jnp.int32),
                axis=1)[:, 0]
            k_cache = _slot_update(k_cache, kc2, slot)
            v_cache = _slot_update(v_cache, vc2, slot)
            return last, k_cache, v_cache

        def chunk_paged(sp, ids, k_pool, v_pool, table_row, off0, last_idx):
            offsets = off0[None]
            positions = off0 + jnp.arange(blen)[None, :]
            mask = decode_mask(blen, self._kv_len(), off0)
            x = arch.embed(sp["statics"], cfg, ids, positions).astype(self.dtype)
            x, k_pool, v_pool = self._layers(sp, x, positions, mask, k_pool,
                                             v_pool, offsets,
                                             tables=table_row[None])
            logits = arch.head(sp["statics"], cfg, x)
            last = jnp.take_along_axis(
                logits, last_idx[None, None, None].astype(jnp.int32),
                axis=1)[:, 0]
            return last, k_pool, v_pool

        fn = chunk_paged if self.paged else chunk_dense
        if self._tp is not None:
            cache = self._cache_pspec()
            self._chunk_fn = self._jit_tp(
                fn, rest_in=(P(), cache, cache, P(), P(), P()),
                out=(self._vocab_pspec(), cache, cache))
        else:
            self._chunk_fn = jax.jit(fn)
        return self._chunk_fn

    def _get_chunk_decode(self):
        """One program: next prompt chunk for ONE slot + one decode token for
        all live slots. The chunk runs first (its slot is not live); both
        parts share the jit (single host dispatch per engine iteration)."""
        if self._chunk_decode_fn is not None:
            return self._chunk_decode_fn
        arch, cfg = self.arch, self._model_cfg()
        b_dec, blen = self.b, self.prefill_chunk

        def fused_tokens(sp, toks, k, v, off, live, tables,
                         chunk_ids, slotarg, off0, last_idx):
            """Weights-once form: the B decode tokens and the C chunk tokens
            ride ONE flat (1, B+C) token batch through the layer stack —
            every packed weight is read once for both groups. The cache
            write/attention split lives in the "grouped"/"grouped_paged"
            cache protocol (models/common.apply_kv_cache / sdpa); slotarg is
            the chunk slot INDEX in both modes."""
            ids_flat = jnp.concatenate([toks[:, 0], chunk_ids[0]])[None]
            positions = jnp.concatenate(
                [off, off0 + jnp.arange(blen)])[None]
            rope = arch.step_rope(cfg, positions, self.dtype)
            x = arch.embed(sp["statics"], cfg, ids_flat,
                           positions).astype(self.dtype)

            def past(ck, cv):
                if tables is None:
                    return ("grouped", ck, cv, off, live, slotarg, off0,
                            b_dec)
                return ("grouped_paged", ck, cv, tables, off, live, slotarg,
                        off0, b_dec)

            tp_ctx = self._tp_ctx()
            if sp["stacked"] is not None:
                def body(xc, layer_in):
                    lp, ck, cv = layer_in
                    y, _, (ck2, cv2) = arch.layer(cfg, lp, xc, positions,
                                                  None, past(ck, cv),
                                                  rope=rope, tp_ctx=tp_ctx)
                    return y, (ck2, cv2)
                x, (k, v) = jax.lax.scan(body, x, (sp["stacked"], k, v))
            else:
                ks, vs = [], []
                for li, lp in enumerate(sp["layers"]):
                    x, _, (k2, v2) = arch.layer(cfg, lp, x, positions, None,
                                                past(k[li], v[li]),
                                                rope=rope, tp_ctx=tp_ctx)
                    ks.append(k2)
                    vs.append(v2)
                k, v = (tuple(ks), tuple(vs)) if isinstance(k, tuple) \
                    else (jnp.stack(ks), jnp.stack(vs))
            logits_flat = arch.head(sp["statics"], cfg, x)[0]  # (T, V)
            logits = logits_flat[:b_dec]                       # decode rows
            clast = logits_flat[b_dec + last_idx][None]        # chunk last
            new_off = jnp.where(live, off + 1, off)
            return logits, clast, k, v, new_off

        fused = fused_tokens  # weights-once in both dense and paged modes

        if self._tp is not None:
            cache = self._cache_pspec()
            self._chunk_decode_fn = self._jit_tp(
                fused,
                rest_in=(P(), cache, cache, P(), P(), P(), P(), P(), P(),
                         P()),
                out=(self._vocab_pspec(), self._vocab_pspec(), cache, cache,
                     P()))
        else:
            self._chunk_decode_fn = jax.jit(fused)
        return self._chunk_decode_fn

    @staticmethod
    def _req_mode(req):
        """Static sampling fast path for one request's prefill-tail token."""
        return ("greedy" if req.temperature == 0 else
                "categorical" if req.top_p >= 1 else None)

    def _pick_pending(self, state):
        """Next pending chunk: (i, slot, ids, off0, last_idx)."""
        for i, slot in enumerate(self.slots):
            if slot.pending is None:
                continue
            c = self.prefill_chunk
            ids = jnp.asarray(slot.pending[slot.ppos:slot.ppos + c][None])
            off0 = jnp.int32(slot.ppos)
            last_idx = jnp.int32(max(0, min(slot.plen - 1 - slot.ppos, c - 1)))
            return i, slot, ids, off0, last_idx
        return None

    def _finish_chunk(self, state, i, slot, last):
        """Book-keeping after a chunk ran (activates the slot when done)."""
        slot.ppos += self.prefill_chunk
        if slot.ppos >= len(slot.pending):  # prompt complete: activate
            req = slot.req
            self._key, sub = jax.random.split(self._key)
            tok = int(sample_logits(last, sub, req.temperature, req.top_p,
                                    mode=self._req_mode(req))[0])
            slot.pending = None
            state["host_off"][i] = slot.plen
            state["temps"][i] = req.temperature
            state["tops"][i] = req.top_p
            state["off"] = state["off"].at[i].set(slot.plen)
            if self._activate(slot, req, tok):
                state["toks"][i] = tok
                state["live"][i] = True
            else:
                state["live"][i] = False

    def _prefill_tick(self, state) -> bool:
        """Advance ONE pending slot by one chunk; True if a chunk ran."""
        picked = self._pick_pending(state)
        if picked is None:
            return False
        i, slot, ids, off0, last_idx = picked
        # the unfused program takes the slot's table ROW in paged mode, the
        # slot index in dense mode; the fused program takes the slot index in
        # both (its paged branch reads the table row in-program)
        slotarg = state["tables"][i] if self.paged else jnp.int32(i)
        fn = self._get_chunk_prefill()
        last, state["k"], state["v"] = fn(
            self._sp, ids, state["k"], state["v"], slotarg, off0, last_idx)
        self._finish_chunk(state, i, slot, last)
        return True

    # -- scheduler -----------------------------------------------------------

    def submit(self, req: GenRequest):
        """Queue a request; rejects up front what could never be served
        (instead of raising mid-run and losing in-flight sequences, or
        spinning forever on an impossible paged allocation)."""
        plen = len(np.asarray(req.prompt).reshape(-1))
        cap = self.logical_len if self.paged else self.max_len
        if plen + 1 > cap:
            raise ValueError(
                f"prompt length {plen} leaves no room to generate in a "
                f"{cap}-row cache (max_seq_len={self.max_len})")
        if self.paged:
            if self.prefill_chunk is not None:
                blen = -(-plen // self.prefill_chunk) * self.prefill_chunk
            else:
                blen = _bucket(plen, self.buckets)
            tokens = min(max(blen, plen + req.max_new_tokens
                             + self.decode_span - 1), self.logical_len)
            need = -(-tokens // self.block_size)
            if need > self.num_blocks:
                raise ValueError(
                    f"request needs {need} KV blocks but the pool has "
                    f"{self.num_blocks}; raise num_blocks or lower "
                    f"max_new_tokens/decode_span")
        self._meta[req.uid] = {"submit": time.perf_counter()}
        self.queue.append(req)

    def _activate(self, slot, req, tok: int) -> bool:
        """Bookkeeping for the prefill-sampled FIRST token. Returns False
        when the request is already complete (eos on the first token, or
        max_new_tokens == 1) — the slot retires without ever entering the
        decode batch, matching runner.generate semantics."""
        slot.generated = [tok]
        self._mark_first(req.uid)
        ended = req.eos_token_id is not None and tok == req.eos_token_id
        if ended or req.max_new_tokens <= 1:
            self.results[req.uid] = np.asarray([tok], np.int32)
            self._meta[req.uid]["done"] = time.perf_counter()
            slot.done = True
            return False
        slot.done = False
        return True

    def _mark_first(self, uid: int):
        m = self._meta.get(uid)
        if m is not None and "first" not in m:
            m["first"] = time.perf_counter()

    def stats(self) -> dict:
        """Aggregate per-request wall-clock metrics over completed requests:
        time-to-first-token and end-to-end latency (p50/p95, seconds)."""
        done = [m for m in self._meta.values() if "done" in m]
        if not done:
            return {}
        ttft = np.asarray([m["first"] - m["submit"] for m in done
                           if "first" in m])
        lat = np.asarray([m["done"] - m["submit"] for m in done])

        def pct(a, p):
            return round(float(np.percentile(a, p)), 4) if a.size else None

        return {"completed": len(done),
                "ttft_p50_s": pct(ttft, 50), "ttft_p95_s": pct(ttft, 95),
                "latency_p50_s": pct(lat, 50), "latency_p95_s": pct(lat, 95)}

    def _admit(self, state):
        """Fill free slots from the queue. Admissions that share a prefill
        bucket run as ONE batched program (`_admit_batched`) — one host
        dispatch instead of one per slot (each costs ~20-30 ms through the
        relay, so a 24-slot backfill wave was 24 dispatches)."""
        picks = []
        for i, slot in enumerate(self.slots):
            if not slot.done or not self.queue:
                continue
            # paged: allocate only the blocks this request can actually touch
            if self.paged:
                req_peek = self.queue[0]
                plen = len(np.asarray(req_peek.prompt).reshape(-1))
                if self.prefill_chunk is not None:
                    c = self.prefill_chunk
                    blen_need = -(-plen // c) * c  # chunk-padded writes
                else:
                    blen_need = _bucket(plen, self.buckets)
                # span slack: a slot retiring mid-span keeps decoding on
                # device with the stale live mask for up to span-1 extra
                # steps — those overshoot writes must land in blocks this
                # slot OWNS (or the scratch block), never in filler-aliased
                # blocks of another slot
                tokens = min(max(blen_need, plen + req_peek.max_new_tokens
                                 + self.decode_span - 1),
                             self.logical_len)
                try:
                    self._paged_alloc.release(i)
                    blocks = self._paged_alloc.ensure_capacity(
                        i, tokens, self.block_size)
                except MemoryError:
                    continue  # pool full: request waits for a retirement
                self._tables_np[i, :] = 0
                owned = self._paged_alloc.owned[i]
                self._tables_np[i, :len(owned)] = owned
                state["tables"] = jnp.asarray(self._tables_np)
            req = self.queue.pop(0)
            prompt = np.asarray(req.prompt, np.int32).reshape(-1)
            if self.prefill_chunk is not None:
                # chunked mode: stage the prompt; _prefill_tick feeds one
                # chunk per engine iteration while other slots keep decoding
                c = self.prefill_chunk
                padlen = -(-len(prompt) // c) * c
                pending = np.zeros((padlen,), np.int32)
                pending[:len(prompt)] = prompt
                slot.req = req
                slot.pending = pending
                slot.ppos = 0
                slot.plen = len(prompt)
                slot.generated = []
                slot.done = False
                continue
            picks.append((i, req, prompt))
        if not picks:
            return
        groups: dict[int, list] = {}
        for pick in picks:
            groups.setdefault(_bucket(len(pick[2]), self.buckets),
                              []).append(pick)
        for blen in sorted(groups):
            group = groups[blen]
            if len(group) > 1 and blen <= self.admit_batch_max:
                self._admit_batched(state, blen, group)
            else:
                for pick in group:
                    self._admit_one(state, blen, *pick)

    def _finish_admit(self, state, i, slot, req, plen, tok):
        slot.req = req
        state["host_off"][i] = plen
        state["temps"][i] = req.temperature
        state["tops"][i] = req.top_p
        state["off"] = state["off"].at[i].set(plen)
        if self._activate(slot, req, tok):
            state["toks"][i] = tok
            state["live"][i] = True
        else:
            state["live"][i] = False

    def _admit_one(self, state, blen, i, req, prompt):
        padded = np.zeros((1, blen), np.int32)
        padded[0, :len(prompt)] = prompt
        fn = self._get_prefill(blen)
        slotarg = state["tables"][i] if self.paged else jnp.int32(i)
        last, state["k"], state["v"] = fn(
            self._sp, jnp.asarray(padded), state["k"], state["v"],
            slotarg, jnp.int32(len(prompt)))
        self._key, sub = jax.random.split(self._key)
        tok = int(sample_logits(last, sub, req.temperature, req.top_p,
                                mode=self._req_mode(req))[0])
        self._finish_admit(state, i, self.slots[i], req, len(prompt), tok)

    def _admit_batched(self, state, blen, group):
        """Prefill every (slot, req, prompt) in `group` in ONE program: all
        prompts start at cache position 0; non-member rows' caches are
        write-masked (dense) or scratch-redirected (paged)."""
        ids = np.zeros((self.b, blen), np.int32)
        admit = np.zeros((self.b,), bool)
        lens = np.ones((self.b,), np.int32)
        for i, req, prompt in group:
            ids[i, :len(prompt)] = prompt
            admit[i] = True
            lens[i] = len(prompt)
        fn = self._get_admit_prefill(blen)
        logits, state["k"], state["v"] = fn(
            self._sp, jnp.asarray(ids), state["k"], state["v"],
            state["tables"], jnp.asarray(admit), jnp.asarray(lens))
        temps = np.array([0.0] * self.b, np.float32)
        tops = np.ones((self.b,), np.float32)
        for i, req, _ in group:
            temps[i], tops[i] = req.temperature, req.top_p
        mode = ("greedy" if all(r.temperature == 0 for _, r, _ in group)
                else "categorical"
                if all(r.top_p >= 1 for _, r, _ in group) else None)
        self._key, sub = jax.random.split(self._key)
        toks = np.asarray(sample_logits(logits, sub, jnp.asarray(temps),
                                        jnp.asarray(tops), mode=mode))
        for i, req, prompt in group:
            self._finish_admit(state, i, self.slots[i], req, len(prompt),
                               int(toks[i]))

    def run(self, log=None) -> dict[int, np.ndarray]:
        """Drain the queue; returns {uid: generated token array}."""
        if self.paged:
            from .paged import BlockAllocator
            # +1 physical block: index 0 is a reserved scratch block (the
            # table filler value), so unowned-entry writes never alias a
            # slot's cache; the user-visible pool stays num_blocks usable
            pool_blocks = self.num_blocks + 1
            self._paged_alloc = BlockAllocator(pool_blocks, reserved=1)
            self._tables_np = np.zeros((self.b, self.max_blocks), np.int32)
            lshape = (pool_blocks, self.block_size,
                      self.cfg.num_kv_heads, self.cfg.head_dim)
        else:
            lshape = (self.b, self.max_len,
                      self.cfg.num_kv_heads, self.cfg.head_dim)

        def cache0():
            if self.unrolled:
                return tuple(jnp.zeros(lshape, self.kv_dtype)
                             for _ in range(self.num_layers))
            return jnp.zeros((self.num_layers,) + lshape, self.kv_dtype)
        state = {
            "k": cache0(),
            "v": cache0(),
            "tables": (jnp.zeros((self.b, self.max_blocks), jnp.int32)
                       if self.paged else None),
            "off": jnp.zeros((self.b,), jnp.int32),
            "host_off": np.zeros((self.b,), np.int64),
            "temps": np.zeros((self.b,), np.float32),
            "tops": np.ones((self.b,), np.float32),
            "toks": np.zeros((self.b,), np.int32),
            "live": np.zeros((self.b,), bool),
        }
        steps = 0
        t0 = time.perf_counter()
        produced = 0

        while self.queue or any(not s.done for s in self.slots):
            self._admit(state)
            fused_chunk = None
            if self.prefill_chunk is not None:
                if self.fused_chunk_decode and state["live"].any():
                    fused_chunk = self._pick_pending(state)
                else:
                    self._prefill_tick(state)  # one chunk per iteration
                    if not state["live"].any():
                        continue  # nothing decoding yet; keep prefilling
            # multi-step span only when the host has nothing to schedule and
            # capacity/limits cannot be hit mid-span
            span = self.decode_span
            if span > 1:
                # spans trade <= span-1 tokens of admission latency for
                # throughput (a slot retiring mid-span is only backfilled at
                # the next host iteration); chunked prefills and near-capacity
                # slots force single-step
                if (any(s.pending is not None for s in self.slots)
                        or not state["live"].any()
                        or state["host_off"][state["live"]].max() + span
                        >= self._kv_len()):
                    span = 1
            live_j = jnp.asarray(state["live"])
            self._key, sub = jax.random.split(self._key)
            mode = self._sample_mode(state)
            if fused_chunk is not None:
                # chunk + decode in ONE program (one dispatch); the fused
                # path takes the slot INDEX in both modes (the paged branch
                # reads the slot's table row in-program)
                i, slot, ids, off0, last_idx = fused_chunk
                logits, clast, state["k"], state["v"], state["off"] = \
                    self._get_chunk_decode()(
                        self._sp, jnp.asarray(state["toks"][:, None]),
                        state["k"], state["v"], state["off"], live_j,
                        state["tables"], ids, jnp.int32(i), off0, last_idx)
                # activation must wait until after the token loop below:
                # the fused program decoded with the PRE-activation live mask,
                # so this slot's logits from it are meaningless
                fused_done = (i, slot, clast)
                toks_np2 = np.asarray(sample_logits(
                    logits, sub, jnp.asarray(state["temps"]),
                    jnp.asarray(state["tops"]), mode=mode)).reshape(-1, 1)
            elif span > 1:
                toks_span, state["k"], state["v"], state["off"] = \
                    self._get_decode_span(mode)(
                        self._sp, jnp.asarray(state["toks"][:, None]),
                        state["k"], state["v"], state["off"], live_j,
                        state["tables"], jnp.asarray(state["temps"]),
                        jnp.asarray(state["tops"]), sub)
                toks_np2 = np.asarray(toks_span)  # (B, span)
            else:
                logits, state["k"], state["v"], state["off"] = self._decode(
                    self._sp, jnp.asarray(state["toks"][:, None]), state["k"],
                    state["v"], state["off"], live_j, state["tables"])
                toks_np2 = np.asarray(sample_logits(
                    logits, sub, jnp.asarray(state["temps"]),
                    jnp.asarray(state["tops"]), mode=mode)).reshape(-1, 1)
            for j in range(toks_np2.shape[1]):
                for i, slot in enumerate(self.slots):
                    if slot.done or not state["live"][i]:
                        continue
                    req = slot.req
                    t = int(toks_np2[i, j])
                    state["host_off"][i] += 1
                    slot.generated.append(t)
                    produced += 1
                    ended = (req.eos_token_id is not None
                             and t == req.eos_token_id)
                    full = state["host_off"][i] + 1 >= self.max_len
                    if ended or full or len(slot.generated) >= req.max_new_tokens:
                        self.results[req.uid] = np.asarray(slot.generated,
                                                           np.int32)
                        self._meta[req.uid]["done"] = time.perf_counter()
                        slot.done = True
                        state["live"][i] = False
                        # paged blocks are NOT released here: a retired slot
                        # still participates in the batched decode step and
                        # re-writes its frozen position — its blocks stay owned
                        # until the slot is re-admitted (released in _admit).
                        # Tokens this slot produced later in the span (it kept
                        # decoding on device) are dropped by the live[] check.
                    else:
                        state["toks"][i] = t
            if fused_chunk is not None:
                self._finish_chunk(state, *fused_done)
            steps += 1
            if log and steps % 32 == 0:
                dt = time.perf_counter() - t0
                log(f"  serve: {steps} steps, {produced} tokens, "
                    f"{produced / dt:.1f} tok/s")
        return self.results
