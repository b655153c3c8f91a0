"""Independent numpy oracles for the quantization math, written from the GPTQ paper
(Frantar et al., 2023) and the reference's documented behavior (see SURVEY.md §2 #1-#3).

These are deliberately plain, loop-based numpy so the JAX implementations in
gptq_for_llama_tpu can be validated against a second, independently structured
implementation of the same algorithm.
"""

from __future__ import annotations

import numpy as np


def minmax_params(x2d: np.ndarray, maxq: int, sym: bool):
    """Per-row affine quantization range -> (scale, zero), both (rows,)."""
    xmin = np.minimum(x2d.min(axis=1), 0.0)
    xmax = np.maximum(x2d.max(axis=1), 0.0)
    if sym:
        xmax = np.maximum(np.abs(xmin), xmax)
        xmin = np.where(xmin < 0, -xmax, xmin)
    both_zero = (xmin == 0) & (xmax == 0)
    xmin = np.where(both_zero, -1.0, xmin)
    xmax = np.where(both_zero, 1.0, xmax)
    if maxq < 0:  # ternary
        return xmax, xmin
    scale = (xmax - xmin) / maxq
    if sym:
        zero = np.full_like(scale, (maxq + 1) / 2)
    else:
        zero = np.rint(-xmin / scale)
    return scale, zero


def quantize_values(x, scale, zero, maxq: int):
    if maxq < 0:
        return (x > scale / 2) * scale + (x < zero / 2) * zero
    q = np.clip(np.rint(x / scale) + zero, 0, maxq)
    return scale * (q - zero)


def mse_params(x2d: np.ndarray, maxq: int, sym: bool, norm=2.4, grid=100, maxshrink=0.8):
    """Grid-shrink MSE search over quantization ranges (per row)."""
    xmin = np.minimum(x2d.min(axis=1), 0.0)
    xmax = np.maximum(x2d.max(axis=1), 0.0)
    if sym:
        xmax = np.maximum(np.abs(xmin), xmax)
        xmin = np.where(xmin < 0, -xmax, xmin)
    both_zero = (xmin == 0) & (xmax == 0)
    xmin = np.where(both_zero, -1.0, xmin)
    xmax = np.where(both_zero, 1.0, xmax)
    scale, zero = minmax_params(x2d, maxq, sym)
    best = np.full(x2d.shape[0], np.inf, dtype=np.float32)
    for i in range(int(maxshrink * grid)):
        p = 1.0 - i / grid
        lo, hi = p * xmin, p * xmax
        s1 = (hi - lo) / maxq
        z1 = zero if sym else np.rint(-lo / s1)
        q = quantize_values(x2d, s1[:, None], z1[:, None], maxq)
        err = (np.abs(q - x2d) ** norm).sum(axis=1)
        better = err < best
        best = np.where(better, err, best)
        scale = np.where(better, s1, scale)
        zero = np.where(better, z1, zero)
    return scale, zero


def gptq_reference(w: np.ndarray, h: np.ndarray, bits: int = 4, perchannel=True,
                   sym=False, blocksize=128, percdamp=0.01, groupsize=-1,
                   actorder=False, mse=False):
    """Plain-numpy GPTQ: returns (Q, scales, zeros, g_idx, error).

    w: (rows, cols); h: (cols, cols). Group scale search reads the block-stale
    weight (error feedback is applied inside the active block only, and written
    back at block boundaries) to mirror the algorithm's canonical implementation.
    """
    w = w.astype(np.float32).copy()
    h = h.astype(np.float32).copy()
    rows, cols = w.shape
    maxq = 2 ** bits - 1

    def params_for(block):
        x2d = block if perchannel else block.reshape(1, -1)
        if mse:
            s, z = mse_params(x2d, maxq, sym)
        else:
            s, z = minmax_params(x2d, maxq, sym)
        if not perchannel:
            s = np.repeat(s, rows)
            z = np.repeat(z, rows)
        return s, z

    scale_full, zero_full = params_for(w)

    dead = np.diag(h) == 0
    h[dead, dead] = 1.0
    w[:, dead] = 0.0

    perm = None
    if actorder:
        perm = np.argsort(-np.diag(h), kind="stable")
        w = w[:, perm]
        h = h[np.ix_(perm, perm)]

    h[np.arange(cols), np.arange(cols)] += percdamp * np.mean(np.diag(h))
    hinv_full = np.linalg.inv(h)
    # Upper factor U with hinv = U^T U is the transpose of the lower Cholesky factor.
    u = np.linalg.cholesky(hinv_full).T.astype(np.float32)

    gs = cols if groupsize == -1 else groupsize
    q_out = np.zeros_like(w)
    scales, zeros = [], []
    if groupsize == -1:
        scales.append(scale_full)
        zeros.append(zero_full)
        cur_s, cur_z = scale_full, zero_full
    else:
        cur_s = cur_z = None
    total = 0.0

    for b0 in range(0, cols, blocksize):
        b1 = min(b0 + blocksize, cols)
        wb = w[:, b0:b1].copy()
        ub = u[b0:b1, b0:b1]
        errb = np.zeros_like(wb)
        for i in range(b1 - b0):
            c = b0 + i
            if groupsize != -1 and c % gs == 0:
                cur_s, cur_z = params_for(w[:, c:c + gs])
                scales.append(cur_s)
                zeros.append(cur_z)
            col = wb[:, i]
            d = ub[i, i]
            q = quantize_values(col[:, None], cur_s[:, None], cur_z[:, None], maxq)[:, 0]
            q_out[:, c] = q
            e = (col - q) / d
            total += float(((col - q) ** 2 / d ** 2).sum()) / 2.0
            wb[:, i:] -= np.outer(e, ub[i, i:])
            errb[:, i] = e
        if b1 < cols:
            w[:, b1:] -= errb @ u[b0:b1, b1:]

    g_idx = np.arange(cols, dtype=np.int32) // gs
    if actorder:
        inv = np.argsort(perm, kind="stable")
        q_out = q_out[:, inv]
        g_idx = g_idx[inv]
    return (q_out, np.stack(scales, axis=1), np.stack(zeros, axis=1), g_idx,
            np.float32(total))


def upper_cholesky(a: np.ndarray) -> np.ndarray:
    """Upper-triangular U with a = U^T U (torch.linalg.cholesky(upper=True))."""
    return np.linalg.cholesky(a).T
