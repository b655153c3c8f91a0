"""GPTQ one-shot weight quantization solver — TPU-native JAX implementation.

Re-designs the reference GPTQ class (reference: gptq.py:56-236) as pure jitted
functions over arrays:

- Hessian accumulation ``H = (2/nsamples) * sum_j X_j^T X_j`` with the reference's
  running renormalization semantics (gptq.py:94-99) available both one-shot (a single
  fp32 einsum — the idiomatic MXU formulation) and streaming.
- ``gptq_quantize``: dead-column handling (gptq.py:146-148), activation-order
  permutation by descending diag(H) (gptq.py:150-153), damped Cholesky-inverse upper
  factor (gptq.py:158-164), and the blockwise column loop with error feedback
  (gptq.py:171-205) expressed as ``lax.fori_loop`` over columns inside statically
  segmented group spans (group boundaries are static, so no traced control flow is
  needed for the per-group scale/zero re-estimation of gptq.py:185-192).

Everything runs in fp32 with HIGHEST matmul precision to match the reference's
fp32/no-TF32 numerics (gptq.py:11-12,136).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .quantizer import QuantConfig, find_params_weight, quantize_affine

_HI = jax.lax.Precision.HIGHEST


class GPTQResult(NamedTuple):
    qweight: jax.Array   # (rows, cols) fake-quantized fp32 weight, original col order
    scale: jax.Array     # (rows, G)
    zero: jax.Array      # (rows, G)
    g_idx: jax.Array     # (cols,) int32 group index per column (original order)
    error: jax.Array     # scalar: sum((w - q)^2 / d^2) / 2 (gptq.py:196,203,208)


# ---------------------------------------------------------------------------
# Hessian accumulation
# ---------------------------------------------------------------------------

@jax.jit
def batch_hessian(x):
    """One-shot Hessian for a whole calibration batch.

    x: (nsamples, tokens, cols) activations feeding one linear layer.
    Returns H = (2 / nsamples) * sum_j x_j^T x_j, fp32 — the closed form of the
    reference's per-sample renormalized update (gptq.py:94-99).
    """
    x = x.astype(jnp.float32)
    ns = x.shape[0]
    h = jnp.einsum("btc,btd->cd", x, x, precision=_HI)
    return (2.0 / ns) * h


@jax.jit
def update_hessian(h, nsamples, x):
    """Streaming Hessian update, one sample at a time (gptq.py:94-99 semantics).

    h: (cols, cols) fp32; nsamples: int scalar count so far; x: (tokens, cols).
    Returns (h', nsamples + 1).
    """
    x = x.astype(jnp.float32)
    n1 = nsamples + 1
    h = h * (nsamples / n1)
    h = h + (2.0 / n1) * jnp.einsum("tc,td->cd", x, x, precision=_HI)
    return h, n1


# ---------------------------------------------------------------------------
# The solver
# ---------------------------------------------------------------------------

def _segments(start: int, stop: int, groupsize: int):
    """Static split of [start, stop) at multiples of groupsize.

    Yields (seg_start, seg_stop, is_group_start). Group boundaries are data-
    independent, so the reference's in-loop modulus check (gptq.py:185-187)
    becomes static Python segmentation here.
    """
    c = start
    while c < stop:
        nxt = min(stop, ((c // groupsize) + 1) * groupsize)
        yield c, nxt, (c % groupsize == 0)
        c = nxt


def _quantize_block(w1, hinv1, scale, zero, maxq: int, seg_lo: int, seg_hi: int):
    """Per-column quantize + error feedback over columns [seg_lo, seg_hi) of a block.

    w1: (rows, count) current block; hinv1: (count, count) Cholesky-upper slice.
    Sequential-by-construction (gptq.py:181-199) — expressed as lax.fori_loop with
    masked rank-1 updates. After the update ``w1[:, i] == q`` exactly, so the block's
    quantized columns live in w1 itself; we also track err and per-column losses.
    """
    count = w1.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, count), 1)

    def body(i, carry):
        w1, err1, losses1 = carry
        w = jax.lax.dynamic_slice_in_dim(w1, i, 1, axis=1)          # (rows, 1)
        d = jax.lax.dynamic_slice(hinv1, (i, i), (1, 1))            # (1, 1)
        q = quantize_affine(w, scale, zero, maxq)
        e = (w - q) / d                                             # (rows, 1)
        hrow = jax.lax.dynamic_slice_in_dim(hinv1, i, 1, axis=0)    # (1, count)
        upd = e * jnp.where(col_ids >= i, hrow, 0.0)                # masked w1[:, i:]
        w1 = w1 - upd
        # store q VERBATIM like the reference's Q1[:, i] = q: the rank-1
        # update leaves w - ((w-q)/d)*d, which can sit 1 ulp off the grid
        w1 = jax.lax.dynamic_update_slice_in_dim(w1, q, i, axis=1)
        err1 = jax.lax.dynamic_update_slice_in_dim(err1, e, i, axis=1)
        losses1 = jax.lax.dynamic_update_slice_in_dim(losses1, e * e, i, axis=1)
        return w1, err1, losses1

    err1 = jnp.zeros_like(w1)
    losses1 = jnp.zeros_like(w1)
    return jax.lax.fori_loop(seg_lo, seg_hi, body, (w1, err1, losses1))


@partial(jax.jit, static_argnames=("cfg", "blocksize", "groupsize", "actorder"))
def gptq_quantize(w, h, cfg: QuantConfig, blocksize: int = 128,
                  percdamp: float = 0.01, groupsize: int = -1,
                  actorder: bool = False) -> GPTQResult:
    """Quantize one linear weight with GPTQ (reference fasterquant, gptq.py:128-228).

    w: (rows, cols) = (out_features, in_features) weight.
    h: (cols, cols) Hessian from batch_hessian/update_hessian.
    """
    w = w.astype(jnp.float32)
    rows, cols = w.shape
    maxq = cfg.maxq

    # Initial per-tensor/per-row params on the raw weight (gptq.py:140-141). For
    # grouped quantization these are immediately superseded at column 0.
    scale0, zero0 = find_params_weight(w, cfg)

    # Dead columns: never-activated inputs get unit curvature and zero weight
    # (gptq.py:146-148).
    diag = jnp.diagonal(h)
    dead = diag == 0
    h = jnp.where(jnp.diag(dead), 1.0, h)
    w = jnp.where(dead[None, :], 0.0, w)

    if actorder:
        perm = jnp.argsort(-jnp.diagonal(h))
        w = w[:, perm]
        h = h[perm][:, perm]

    # Damped Cholesky-inverse upper factor (gptq.py:158-164). The solves run
    # in COLUMN CHUNKS: XLA's TPU triangular_solve keeps every 128-row panel
    # temp of the RHS live at once — a full-width identity RHS at 11008 cols
    # peaked at 20 GB HLO temp and could not compile on a 16 GB chip (found
    # by scripts/quantize7b_bench.py). Each RHS column solves independently,
    # so chunking changes memory, not math.
    damp = percdamp * jnp.mean(jnp.diagonal(h))
    h = h + jnp.eye(cols, dtype=h.dtype) * damp
    chol = jax.lax.linalg.cholesky(h)

    _SOLVE_CHUNK = 512

    def _inv_from_chol(chol):
        outs = []
        for c0 in range(0, cols, _SOLVE_CHUNK):
            span = min(_SOLVE_CHUNK, cols - c0)
            rhs = jnp.eye(cols, span, k=-c0, dtype=h.dtype)
            x = jax.lax.linalg.triangular_solve(
                chol, rhs, left_side=True, lower=True)
            x = jax.lax.linalg.triangular_solve(
                chol, x, left_side=True, lower=True, transpose_a=True)
            outs.append(x)
        return jnp.concatenate(outs, axis=1)

    hinv = _inv_from_chol(chol)
    hinv = jax.lax.linalg.cholesky(hinv, symmetrize_input=True)
    hinv = hinv.T  # upper factor U with Hinv = U^T U (torch cholesky upper=True)

    gs = groupsize if groupsize != -1 else cols
    num_groups = -(-cols // gs)

    q_full = w  # processed columns of w become q in place (see _quantize_block)
    scale, zero = scale0, zero0
    scales, zeros = [], []
    if groupsize == -1:
        scales.append(scale0)
        zeros.append(zero0)
    total_loss = jnp.zeros((), jnp.float32)

    # Block loop as ONE lax.scan when the per-block segmentation is uniform
    # (the production shapes: gs == -1, or gs <= blocksize with aligned
    # boundaries). The trace-time-unrolled fallback below builds 1 full-width
    # weight update per block — XLA's liveness over cols/128 unrolled blocks
    # peaked at 20 GB HLO temp on a 4096x4096 7B layer (first observed by
    # scripts/quantize7b_bench.py), while the scan carries a single aliased
    # q_full buffer. The scan's error propagation is a full-width MASKED
    # matmul (2x the unrolled tail flops — irrelevant offline; memory rules).
    scan_ok = (cols % blocksize == 0
               and (groupsize == -1
                    or (gs <= blocksize and blocksize % gs == 0
                        and cols % gs == 0)))
    if scan_ok:
        nb = cols // blocksize
        grouped = groupsize != -1
        segs = list(_segments(0, blocksize, gs if grouped else blocksize))
        col_ids_full = jnp.arange(cols)[None, :]

        def block_body(carry, bi):
            q_full, total_loss = carry
            i1 = bi * blocksize
            w1 = jax.lax.dynamic_slice(q_full, (0, i1), (rows, blocksize))
            hinv1 = jax.lax.dynamic_slice(hinv, (i1, i1),
                                          (blocksize, blocksize))
            err1 = jnp.zeros_like(w1)
            sc_blk, ze_blk = [], []
            scale_b, zero_b = scale0, zero0
            for s_lo, s_hi, _ in segs:
                if grouped:
                    wg = jax.lax.dynamic_slice(q_full, (0, i1 + s_lo),
                                               (rows, gs))
                    scale_b, zero_b = find_params_weight(wg, cfg)
                    sc_blk.append(scale_b)
                    ze_blk.append(zero_b)
                w1, e, l = _quantize_block(w1, hinv1, scale_b, zero_b, maxq,
                                           s_lo, s_hi)
                err1 = err1 + e
                total_loss = total_loss + jnp.sum(l) / 2.0
            q_full = jax.lax.dynamic_update_slice(q_full, w1, (0, i1))
            # W[:, i2:] -= Err1 @ Hinv[i1:i2, i2:], as a full-width matmul
            # with columns < i2 masked to zero (no dynamic-length slices)
            hrow = jax.lax.dynamic_slice(hinv, (i1, 0), (blocksize, cols))
            hrow = jnp.where(col_ids_full >= i1 + blocksize, hrow, 0.0)
            q_full = q_full - jnp.matmul(err1, hrow, precision=_HI)
            ys = (jnp.concatenate(sc_blk, axis=1),
                  jnp.concatenate(ze_blk, axis=1)) if grouped else 0
            return (q_full, total_loss), ys

        (q_full, total_loss), ys = jax.lax.scan(
            block_body, (q_full, total_loss),
            jnp.arange(nb, dtype=jnp.int32))
        if grouped:
            sc_all, ze_all = ys  # (nb, rows, bs/gs) in block-major order
            scales.append(jnp.swapaxes(sc_all, 0, 1).reshape(rows, -1))
            zeros.append(jnp.swapaxes(ze_all, 0, 1).reshape(rows, -1))

        g_idx = jnp.arange(cols, dtype=jnp.int32) // gs
        if actorder:
            invperm = jnp.argsort(perm)
            q_full = q_full[:, invperm]
            g_idx = g_idx[invperm]
        scale_all = jnp.concatenate(scales, axis=1)
        zero_all = jnp.concatenate(zeros, axis=1)
        return GPTQResult(q_full, scale_all, zero_all, g_idx, total_loss)

    for i1 in range(0, cols, blocksize):
        i2 = min(i1 + blocksize, cols)
        count = i2 - i1
        w1 = jax.lax.dynamic_slice(q_full, (0, i1), (rows, count))
        hinv1 = jax.lax.dynamic_slice(hinv, (i1, i1), (count, count))
        err1 = None

        for s_lo, s_hi, is_group_start in _segments(i1, i2, gs):
            if groupsize != -1 and is_group_start:
                # Group params come from the block-stale full weight (the reference
                # reads W, which only receives error feedback at block boundaries —
                # gptq.py:187 reads W while updates accumulate in W1).
                gspan = min(gs, cols - s_lo)
                wg = jax.lax.dynamic_slice(q_full, (0, s_lo), (rows, gspan))
                scale, zero = find_params_weight(wg, cfg)
                scales.append(scale)
                zeros.append(zero)
            w1, e, l = _quantize_block(w1, hinv1, scale, zero, maxq,
                                       s_lo - i1, s_hi - i1)
            err1 = e if err1 is None else err1 + e
            total_loss = total_loss + jnp.sum(l) / 2.0

        # Write back quantized block and propagate error to the remaining columns
        # (gptq.py:202-205): W[:, i2:] -= Err1 @ Hinv[i1:i2, i2:].
        q_full = jax.lax.dynamic_update_slice(q_full, w1, (0, i1))
        if i2 < cols:
            hblk = jax.lax.dynamic_slice(hinv, (i1, i2), (count, cols - i2))
            tail = jax.lax.dynamic_slice(q_full, (0, i2), (rows, cols - i2))
            tail = tail - jnp.matmul(err1, hblk, precision=_HI)
            q_full = jax.lax.dynamic_update_slice(q_full, tail, (0, i2))

    g_idx = jnp.arange(cols, dtype=jnp.int32) // gs
    if actorder:
        invperm = jnp.argsort(perm)
        q_full = q_full[:, invperm]
        g_idx = g_idx[invperm]

    # find_params_weight already returns (rows, 1) in both perchannel and
    # per-tensor modes, so the concatenation is (rows, G) directly
    scale_all = jnp.concatenate(scales, axis=1)
    zero_all = jnp.concatenate(zeros, axis=1)
    return GPTQResult(q_full, scale_all, zero_all, g_idx, total_loss)


# ---------------------------------------------------------------------------
# RTN baseline (reference --nearest path, llama.py:225-232)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "groupsize"))
def rtn_quantize(w, cfg: QuantConfig, groupsize: int = -1):
    """Round-to-nearest fake quantization, optionally grouped along in-features.

    The reference RTN path quantizes per-row over the whole weight
    (llama.py:225-232, groupsize unused there); grouped RTN is the natural
    generalization and is used by tests as a GPTQ sanity lower bound.
    """
    w = w.astype(jnp.float32)
    rows, cols = w.shape
    if groupsize == -1:
        scale, zero = find_params_weight(w, cfg)
        return quantize_affine(w, scale, zero, cfg.maxq)
    assert cols % groupsize == 0
    wg = w.reshape(rows, cols // groupsize, groupsize)
    wg2 = jnp.swapaxes(wg, 0, 1).reshape(-1, groupsize)  # (G*rows, gs)
    scale, zero = find_params_weight(wg2, cfg)
    q = quantize_affine(wg2, scale, zero, cfg.maxq)
    q = jnp.swapaxes(q.reshape(cols // groupsize, rows, groupsize), 0, 1)
    return q.reshape(rows, cols)
