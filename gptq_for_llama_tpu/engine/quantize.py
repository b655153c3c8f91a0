"""Sequential layer-by-layer GPTQ quantization engine — one generic driver.

Replaces the reference's three ~85%-identical per-arch drivers
(reference: llama.py:27-170, opt.py:28-140, neox.py:27-130) with one engine over
the arch registry. The reference's forward-hook activation capture
(llama.py:98-107) becomes the functional ``taps`` dict returned by each arch's
``layer``; the Catcher-exception input capture (llama.py:43-62) becomes simply
running ``embed`` — the model is pure functions, nothing to intercept.

Memory model (the TPU translation of the reference's CPU-staging loop,
llama.py:84,125): all nsamples hidden states stay on device as one
(nsamples, seqlen, hidden) array; layers are quantized strictly in order;
forwards run in sample microbatches under one jit (static shapes -> one compile).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.registry import get_arch
from ..models.common import causal_mask
from ..ops.linear import PackedLinear
from ..quant.gptq import batch_hessian, gptq_quantize
from ..quant.quantizer import QuantConfig, fake_quantize, find_params_weight
from ..utils.metrics import ascii_table, gen_conditions, snr_error


@dataclasses.dataclass(frozen=True)
class QuantizeSpec:
    """All quantization knobs (the reference's argparse flags, llama.py:443-470)."""

    wbits: int = 4
    groupsize: int = -1
    sym: bool = False
    trits: bool = False
    mse: bool = False
    percdamp: float = 0.01
    blocksize: int = 128
    act_order: bool = False
    true_sequential: bool = False
    nearest: bool = False           # RTN baseline instead of GPTQ (--nearest)
    observe: bool = False           # keep worst layers for auto-upgrade (--observe)
    chunk: int = 16                 # calibration samples per forward microbatch
    quantize_lm_head: bool = False  # beyond the reference (llama.py:270 always
                                    # excludes lm_head): GPTQ the output head
                                    # too (~8x less decode HBM for the head)

    def qconfig(self, wbits: Optional[int] = None) -> QuantConfig:
        # wire_safe: the packed checkpoint must represent the fake-quant grid
        # exactly (see QuantConfig.wire_safe on the reference's zeros-1 wrap).
        return QuantConfig(bits=wbits or self.wbits, perchannel=True, sym=self.sym,
                           mse=self.mse, trits=self.trits, wire_safe=True)


class QuantRecord(NamedTuple):
    """Per-linear quantization artifact — the reference's quantizers-dict tuple
    (quantizer, scale, zero, g_idx, wbits, groupsize) at llama.py:115,158."""

    scale: np.ndarray      # (out, G)
    zero: np.ndarray       # (out, G)
    g_idx: np.ndarray      # (in,)
    wbits: int
    groupsize: int
    error: float
    sym: bool = False      # affine symmetry flag (reference export.py dump)


class ObserverEntry(NamedTuple):
    layer_idx: int
    name: str
    error: float
    hessian: Optional[np.ndarray]   # retained only when observing (gptq.py:144-145)


class Observer:
    """Top-k worst layers by quantization error (reference: gptq.py:15-53)."""

    def __init__(self, topk: int = 32):
        self.items: list[ObserverEntry] = []
        self.topk = topk

    def submit(self, entry: ObserverEntry):
        if len(self.items) < self.topk:
            self.items.append(entry)
            return
        min_idx = min(range(len(self.items)), key=lambda i: self.items[i].error)
        if self.items[min_idx].error < entry.error:
            self.items[min_idx] = entry

    def ranked(self) -> list[ObserverEntry]:
        return sorted(self.items, key=lambda e: e.error, reverse=True)

    def table(self) -> str:
        return ascii_table(["name", "error"],
                           [[f"{e.name}.{e.layer_idx}", float(e.error)]
                            for e in self.ranked()])


# ---------------------------------------------------------------------------
# pytree path helpers (the functional find_layers, reference: modelutils.py:7-13)
# ---------------------------------------------------------------------------

def get_path(tree, dotted: str):
    node = tree
    for part in dotted.split("."):
        node = node[part]
    return node


def set_path(tree, dotted: str, value):
    parts = dotted.split(".")
    node = tree
    for part in parts[:-1]:
        node = node[part]
    node[parts[-1]] = value


def layer_linears(arch, lp) -> list[str]:
    """Linear names present in this layer's params (find_layers equivalent)."""
    return [n for n in arch.LAYER_LINEARS
            if isinstance(get_path(lp, n), (dict, PackedLinear))]


# ---------------------------------------------------------------------------
# jitted building blocks (compiled once per run; shapes static across layers)
# ---------------------------------------------------------------------------

def _make_layer_fns(arch, cfg, group_names: tuple[str, ...],
                    with_taps: bool = False):
    """(hessian-accumulate, forward) jitted fns for one sequential group.

    with_taps: also return each linear's full fp32 activation matrix (the
    --observe SNR probe input) — multi-GB jit outputs at 7B scale, so the
    default path returns None there instead."""

    @partial(jax.jit, static_argnames=())
    def accum(lp, x, positions, mask, sums):
        _, taps, _ = arch.layer(cfg, lp, x, positions, mask)
        new_sums = {}
        group_taps = {} if with_taps else None
        for name in group_names:
            t = taps[name].astype(jnp.float32)
            t2 = t.reshape(-1, t.shape[-1])
            if with_taps:
                group_taps[name] = t2
            new_sums[name] = sums[name] + jnp.einsum(
                "tc,td->cd", t2, t2, precision=jax.lax.Precision.HIGHEST)
        return new_sums, group_taps

    @jax.jit
    def fwd(lp, x, positions, mask):
        y, _, _ = arch.layer(cfg, lp, x, positions, mask)
        return y

    return accum, fwd


def _quantize_one(w_t, h, spec: QuantizeSpec, wbits: int, groupsize: int):
    """GPTQ (or RTN) one weight. w_t: (out, in) fp32. Returns (q, record)."""
    cfg = spec.qconfig(wbits)
    if spec.nearest:
        # RTN: per-row params over the whole weight (reference llama.py:225-232)
        scale, zero = find_params_weight(w_t, cfg)
        q = fake_quantize(w_t, scale, zero, cfg)
        g = np.zeros(w_t.shape[1], dtype=np.int32)
        # record groupsize -1: the buffers really are ONE whole-row group —
        # recording spec.groupsize would make the checkpoint metadata
        # contradict the wire shapes (reference load_quant sizes buffers
        # from the recorded groupsize)
        rec = QuantRecord(np.asarray(scale), np.asarray(zero), g, wbits, -1,
                          float(jnp.sum((q - w_t) ** 2)), sym=spec.sym)
        return q, rec
    res = gptq_quantize(w_t, h, cfg, blocksize=spec.blocksize,
                        percdamp=spec.percdamp, groupsize=groupsize,
                        actorder=spec.act_order)
    rec = QuantRecord(np.asarray(res.scale), np.asarray(res.zero),
                      np.asarray(res.g_idx), wbits, groupsize,
                      float(res.error), sym=spec.sym)
    return res.qweight, rec


def quantize_model(arch_name: str, cfg, params, train_windows, spec: QuantizeSpec,
                   verbose: bool = True, log=print, resume_dir: str = None,
                   mesh=None):
    """Quantize all decoder layers in place-functionally.

    params: model pytree with DENSE fp weights (kernels (in, out)).
    train_windows: (nsamples, seqlen) int32 calibration windows.
    Returns (params with fake-quantized kernels, {dotted_name: QuantRecord},
    Observer). Equivalent to the reference *_sequential (llama.py:27-170).

    resume_dir: optional directory for mid-run checkpointing. After each layer
    the fake-quantized kernels + QuantRecords are written there; a re-run with
    the same directory skips completed layers (the reference has NO mid-
    quantization resume — a 65B run that dies must restart, SURVEY.md §5).

    mesh: optional jax Mesh with a 'dp' axis — calibration activations shard
    over it (data-parallel calibration; the Hessian einsum contracts the token
    dim, so XLA inserts the cross-device reduction). The reference is strictly
    single-GPU here. Each microbatch chunk must divide by the dp size.
    """
    arch = get_arch(arch_name)
    t_start = time.time()
    windows = jnp.asarray(train_windows)
    ns, seqlen = windows.shape
    chunk = min(spec.chunk, ns)
    assert ns % chunk == 0, f"nsamples {ns} must divide by chunk {chunk}"
    if resume_dir is not None and spec.observe:
        raise ValueError(
            "--observe with --resume-dir is unsupported: resumed layers "
            "carry no retained Hessian, so the auto-upgrade pass would "
            "silently exclude them from its ranking")

    shard_batch = lambda x: x
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.distributed import put_global
        dp = mesh.shape.get("dp", 1)
        assert chunk % dp == 0, f"chunk {chunk} must divide by dp {dp}"

        def shard_batch(x):
            # HOST batches (every process feeds the same full windows) go
            # through put_global; DEVICE-global outputs of the layer
            # propagation are resharded in place — put_global's np.asarray
            # would fail on non-addressable multi-host arrays
            if isinstance(x, np.ndarray):
                return put_global(x, mesh, P("dp"))
            return jax.device_put(x, NamedSharding(mesh, P("dp")))
    positions = jnp.arange(seqlen)[None, :]
    mask = causal_mask(seqlen, seqlen)

    dtype = get_path(params, "layers")[0]
    dtype = jax.tree_util.tree_leaves(dtype)[0].dtype

    # params passed as an ARGUMENT: closing over them bakes the embedding
    # table into the program as a constant (CLAUDE.md; ~262 MB at 7B)
    embed_fn = jax.jit(lambda p, ids: arch.embed(p, cfg, ids))
    statics = {k: v for k, v in params.items() if k != "layers"}
    x = jnp.concatenate([embed_fn(statics, shard_batch(windows[i:i + chunk]))
                         for i in range(0, ns, chunk)], axis=0)
    x = shard_batch(x)

    quantizers: dict[str, QuantRecord] = {}
    observer = Observer()
    fwd_cache = {}

    if verbose:
        log(ascii_table(["layer", "name", "weight_error", "time"], []).split("\n")[1])

    for li, lp in enumerate(params["layers"]):
        names_present = layer_linears(arch, lp)

        if resume_dir is not None and _load_layer_ckpt(resume_dir, li, lp,
                                                       quantizers, spec):
            # completed in a previous run: restore and propagate activations
            if verbose:
                log(f"| layer {li:3d} | resumed from checkpoint |")
            key0 = tuple([n for n in
                          arch.sequential_groups(spec.true_sequential)[0]
                          if n in names_present])
            if key0 not in fwd_cache:
                fwd_cache[key0] = _make_layer_fns(arch, cfg, key0)
            _, fwd = fwd_cache[key0]
            x = shard_batch(jnp.concatenate(
                [fwd(lp, x[i:i + chunk], positions, mask)
                 for i in range(0, ns, chunk)], axis=0))
            continue
        groups = [[n for n in g if n in names_present]
                  for g in arch.sequential_groups(spec.true_sequential)]
        groups = [g for g in groups if g]

        for group in groups:
            key = tuple(group)
            if key not in fwd_cache:
                fwd_cache[key] = _make_layer_fns(arch, cfg, key,
                                                 with_taps=spec.observe)
            accum, _ = fwd_cache[key]

            cols = {n: get_path(lp, n)["kernel"].shape[0] for n in group}
            sums = {n: jnp.zeros((c, c), jnp.float32) for n, c in cols.items()}
            last_taps = None
            for i in range(0, ns, chunk):
                sums, last_taps = accum(lp, x[i:i + chunk], positions, mask, sums)
            ntok_scale = 2.0 / ns  # H = 2/nsamples * sum x x^T (gptq.py:94-99)

            for name in group:
                t0 = time.time()
                kernel = get_path(lp, name)["kernel"]
                w_t = kernel.T.astype(jnp.float32)     # (out, in) rows=out
                h = sums[name] * ntok_scale
                q, rec = _quantize_one(w_t, h, spec, spec.wbits, spec.groupsize)
                get_path(lp, name)["kernel"] = q.T.astype(dtype)
                quantizers[f"layers.{li}.{name}"] = rec
                observer.submit(ObserverEntry(
                    li, name, rec.error,
                    np.asarray(h) if spec.observe else None))
                if verbose:
                    snr_txt = ""
                    if spec.observe:
                        # fp/q input SNR probe on the last calibration chunk
                        # (reference print_loss, gptq.py:101-126)
                        fp_snr, q_snr = snr_probe(q.T.astype(jnp.float32),
                                                  kernel.astype(jnp.float32),
                                                  last_taps[name])
                        snr_txt = (f" fp_inp_SNR {fp_snr:10.4f} |"
                                   f" q_inp_SNR {q_snr:10.4f} |")
                    log(f"| layer {li:3d} | {name:28s} | error {rec.error:12.4f} "
                        f"|{snr_txt} {time.time() - t0:6.2f}s |")

        if resume_dir is not None:
            _save_layer_ckpt(resume_dir, li, lp, names_present, quantizers)

        # propagate quantized activations to the next layer (llama.py:122-130)
        _, fwd = fwd_cache[tuple(groups[0])]
        x = shard_batch(jnp.concatenate(
            [fwd(lp, x[i:i + chunk], positions, mask)
             for i in range(0, ns, chunk)], axis=0))

    if spec.quantize_lm_head:
        _quantize_lm_head(arch, cfg, params, x, spec, ns, chunk,
                          quantizers, verbose, log)
    if spec.observe:
        _auto_upgrade(arch, params, quantizers, observer, spec, verbose, log)
    if verbose:
        log(f"quantization done in {time.time() - t_start:.1f}s")
    return params, quantizers, observer


def _quantize_lm_head(arch, cfg, params, x, spec, ns, chunk,
                      quantizers, verbose, log):
    """GPTQ the output head on the final-norm activations (opt-in; the
    reference never quantizes lm_head). Tied heads are skipped (the packed
    head could no longer share storage with the embedding)."""
    from ..quant.gptq import batch_hessian
    key = "embed_out" if "embed_out" in params else "lm_head"
    lin = params.get(key)
    if not isinstance(lin, dict) or "kernel" not in lin:
        return
    if getattr(cfg, "tie_word_embeddings", False):
        if verbose:
            log(f"| {key}: tied to embeddings — not quantized |")
        return
    t0 = time.time()
    kdim = lin["kernel"].shape[0]
    # params as jit ARGUMENT (CLAUDE.md: no baked constants); HIGHEST-precision
    # Hessian accumulation shared with every layer (quant/gptq.batch_hessian)
    statics = {k: v for k, v in params.items() if k != "layers"}
    head_in = jax.jit(lambda p, xa: arch.head_input(p, cfg, xa))
    # batch_hessian(a) = (2/chunk)*sum(x^T x); weight each chunk by chunk/ns
    # so the sum is the full-set (2/ns)-normalized Hessian
    hacc = jax.jit(lambda hh, a: hh + batch_hessian(a) * (chunk / ns))
    h = jnp.zeros((kdim, kdim), jnp.float32)
    for i in range(0, ns, chunk):
        h = hacc(h, head_in(statics, x[i:i + chunk]))
    w_t = lin["kernel"].T.astype(jnp.float32)
    q, rec = _quantize_one(w_t, h, spec, spec.wbits, spec.groupsize)
    lin["kernel"] = q.T.astype(lin["kernel"].dtype)
    quantizers[key] = rec
    if verbose:
        log(f"| head      | {key:28s} | error {rec.error:12.4f} "
            f"| {time.time() - t0:6.2f}s |")


def _auto_upgrade(arch, params, quantizers, observer: Observer, spec: QuantizeSpec,
                  verbose: bool, log):
    """Re-quantize worst layers at higher precision until error halves.

    The reference's --observe pass (llama.py:134-166): walk gen_conditions
    (groupsize/2 ... then wbits*2) until error < original/2. Uses the retained
    Hessian; operates on the ORIGINAL weight, which we reconstruct is impossible
    post-hoc — so, like the reference (which re-runs fasterquant on the already-
    assigned layer weight W=q via gptq.layer.weight), we re-quantize the current
    fake-quantized weight. The observed error ordering drives the search.
    """
    if verbose:
        log(observer.table())
    for entry in observer.ranked():
        if entry.hessian is None:
            continue
        dotted = f"layers.{entry.layer_idx}.{entry.name}"
        lp = params["layers"][entry.layer_idx]
        target = entry.error / 2.0
        conditions = gen_conditions(spec.wbits, spec.groupsize)
        for wbits, gs in conditions:
            kernel = get_path(lp, entry.name)["kernel"]
            w_t = kernel.T.astype(jnp.float32)
            q, rec = _quantize_one(w_t, jnp.asarray(entry.hessian), spec, wbits, gs)
            if verbose:
                log(f"| observe {dotted}: wbits={wbits} groupsize={gs} "
                    f"error={rec.error:.4f} (target {target:.4f}) |")
            if rec.error < target:
                get_path(lp, entry.name)["kernel"] = q.T.astype(kernel.dtype)
                quantizers[dotted] = rec
                break


# ---------------------------------------------------------------------------
# mid-quantization checkpointing (no reference equivalent; SURVEY.md §5)
# ---------------------------------------------------------------------------

def _ckpt_path(resume_dir: str, li: int) -> str:
    import os
    return os.path.join(resume_dir, f"layer_{li:04d}.npz")


def _save_layer_ckpt(resume_dir: str, li: int, lp, names, quantizers):
    import os
    os.makedirs(resume_dir, exist_ok=True)
    payload = {}
    for name in names:
        rec = quantizers[f"layers.{li}.{name}"]
        payload[f"{name}/kernel"] = np.asarray(get_path(lp, name)["kernel"])
        payload[f"{name}/scale"] = rec.scale
        payload[f"{name}/zero"] = rec.zero
        payload[f"{name}/g_idx"] = rec.g_idx
        payload[f"{name}/meta"] = np.asarray(
            [rec.wbits, rec.groupsize, rec.error, float(rec.sym)],
            np.float64)
    tmp = _ckpt_path(resume_dir, li) + ".tmp.npz"  # .npz suffix: savez keeps it
    np.savez(tmp, **payload)
    os.replace(tmp, _ckpt_path(resume_dir, li))


def _load_layer_ckpt(resume_dir: str, li: int, lp, quantizers,
                     spec=None) -> bool:
    import os
    path = _ckpt_path(resume_dir, li)
    if not os.path.exists(path):
        return False
    data = np.load(path)
    names = sorted({k.split("/")[0] for k in data.files})
    for name in names:
        kernel = get_path(lp, name)["kernel"]
        get_path(lp, name)["kernel"] = jnp.asarray(
            data[f"{name}/kernel"], dtype=kernel.dtype)
        meta = data[f"{name}/meta"]
        rec = QuantRecord(
            data[f"{name}/scale"], data[f"{name}/zero"], data[f"{name}/g_idx"],
            int(meta[0]), int(meta[1]), float(meta[2]),
            sym=bool(meta[3]) if len(meta) > 3 else False)
        if spec is not None and (
                rec.wbits != spec.wbits
                or (not spec.nearest and rec.groupsize != spec.groupsize)
                or rec.sym != spec.sym):
            raise ValueError(
                f"resume checkpoint layer {li} ({name}) was quantized with "
                f"wbits={rec.wbits} groupsize={rec.groupsize} sym={rec.sym}, "
                f"which differs from the current spec — point --resume-dir "
                f"at a matching run or remove it")
        quantizers[f"layers.{li}.{name}"] = rec
    return True


# ---------------------------------------------------------------------------
# SNR probe (reference print_loss, gptq.py:101-126) — used by tests/CLI
# ---------------------------------------------------------------------------

def snr_probe(kernel_q, kernel_fp, x):
    """fp_inp_SNR / q_inp_SNR for one linear given a probe activation x.

    Quantizes the input to int8 per-tensor symmetric like the reference
    (gptq.py:111-115) and reports SNRs of the quantized layer's outputs.
    """
    from ..quant.quantizer import find_params_activation
    cfg8 = QuantConfig(bits=8, perchannel=False, sym=True, mse=False)
    scale, zero = find_params_activation(x, cfg8)
    q_in = fake_quantize(x, scale, zero, cfg8)
    out_ref = x @ kernel_fp
    fp_snr = snr_error(x @ kernel_q, out_ref)
    q_snr = snr_error(q_in @ kernel_q, out_ref)
    return float(fp_snr), float(q_snr)
